package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}

/** S16 — knowledge-base sink seam: the reference POSTs one document per
  * record to a KB API (`document/create_by_text`, batched metadata
  * updates). Distributed shape: `foreachPartition` with one client per
  * partition and bounded batch size — exactly where an HTTP client plugs
  * in; the transport is injected so tests (and zero-egress containers)
  * supply an in-memory recorder.
  */
object Sinks {

  trait KbClient extends Serializable {
    /** POST a batch of (name, markdown) docs; returns per-doc ids. */
    def createByText(batch: Seq[(String, String)]): Seq[String]
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
