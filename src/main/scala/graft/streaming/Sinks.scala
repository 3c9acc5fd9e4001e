package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** S16 — knowledge-base sink: the reference POSTs one document per
  * record to a KB API (`POST {endpoint}/v1/datasets/{dataset_id}/document/
  * create_by_text` with body `{name, text, indexing_technique,
  * process_rule.mode}` and a bearer header — dify_workflow_design.md:44-57).
  * Since r5 the REQUEST CONSTRUCTION is real, tested semantics
  * ([[kbRequests]], oracle-checked by q111); only the socket remains the
  * injected seam. Distributed shape: `foreachPartition` with one client
  * per partition and bounded batch size — exactly where an HTTP client
  * plugs in; tests (and zero-egress containers) supply an in-memory
  * recorder.
  */
object Sinks {

  trait KbClient extends Serializable {
    /** POST a batch of (name, markdown) docs; returns per-doc ids. */
    def createByText(batch: Seq[(String, String)]): Seq[String]
  }

  /** The reference's documented request model, one row per document:
    * URL (dataset-scoped create_by_text route), method, and the exact
    * body fields — `indexing_technique` "high_quality", `process_rule`
    * mode "automatic" (dify_workflow_design.md:44-57). `body_json` is the
    * serialized POST body (compact to_json); the recorder-client spec
    * asserts the client receives exactly these bytes. The auth header
    * stays OUT of the dataframe deliberately: secrets don't belong in
    * shuffle files or query results — the client injects them at the
    * socket.
    */
  def kbRequests(
      df: DataFrame, nameCol: Column, contentCol: Column,
      datasetId: String, endpoint: String = "https://api.dify.ai"): DataFrame = {
    val body = struct(
      nameCol.as("name"),
      contentCol.as("text"),
      lit("high_quality").as("indexing_technique"),
      struct(lit("automatic").as("mode")).as("process_rule"))
    df.select(
      lit(s"$endpoint/v1/datasets/$datasetId/document/create_by_text").as("url"),
      lit("POST").as("method"),
      body.getField("name").as("name"),
      body.getField("text").as("text"),
      body.getField("indexing_technique").as("indexing_technique"),
      body.getField("process_rule").getField("mode").as("process_mode"),
      to_json(body).as("body_json"))
  }

  /** Push every row to the KB, `batchSize` docs per call (the reference
    * batches 10 images/POST; same shape for docs). Returns nothing — this
    * is a terminal action.
    */
  def writeToKb(
      df: DataFrame, nameCol: String, contentCol: String,
      client: KbClient, batchSize: Int = 10): Unit =
    df.select(nameCol, contentCol).foreachPartition { rows: Iterator[Row] =>
      rows.grouped(batchSize).foreach { chunk =>
        client.createByText(chunk.map(r => (r.getString(0), r.getString(1))))
      }
    }

  /** Streaming form: foreachBatch → same partition-batched sink. */
  def kbStreamWriter(
      nameCol: String, contentCol: String, client: KbClient, batchSize: Int = 10)(
      batch: DataFrame, batchId: Long): Unit =
    writeToKb(batch, nameCol, contentCol, client, batchSize)
}
