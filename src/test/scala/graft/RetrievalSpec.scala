package graft

import graft.retrieval.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Task-distribution semantics (retrieve.py:335-387): segment tasks own
  * their document's chunks, full-DB tasks the rest; earliest task wins a
  * contested chunk; per-task top-k respects the global dedup.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val chunks = Seq(
    // (chunk_id, database_id, document_id, score)
    (1L, "db1", "docA", 90L), (2L, "db1", "docA", 80L), (3L, "db1", "docA", 70L),
    (4L, "db1", "docB", 95L), (5L, "db1", "docB", 60L),
    (6L, "db2", "docC", 99L), (7L, "db2", "docD", 50L))
    .toDF("chunk_id", "database_id", "document_id", "score")

  private lazy val tasks = Seq(
    // segment task for db1/docA first, then full-db tasks
    ("segA", "db1", Some("docA"), "segment_retrieval", 1, 2),
    ("fullDb1", "db1", None, "full_database_retrieval", 2, 10),
    ("fullDb2", "db2", None, "full_database_retrieval", 3, 1))
    .toDF("task_id", "database_id", "document_id", "retrieval_mode", "task_order", "top_k")

  test("segment task owns its doc's chunks; full task takes the remainder") {
    val got = Retrieval.distribute(chunks, tasks)
      .select("task_id", "chunk_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // segA owns docA chunks (earlier task_order), capped at top_k=2 by score
    assert(got("segA") == Set(1L, 2L))
    // fullDb1 gets docB chunks AND docA chunk 3 (owned by segA but... )
    // — no: chunk 3 belongs to segA (earliest requester) and is cut by its
    // top-k, so it is NOT redistributed (declared divergence, Retrieval doc)
    assert(got("fullDb1") == Set(4L, 5L))
    // fullDb2: top_k=1 keeps only the best of db2
    assert(got("fullDb2") == Set(6L))
  }

  test("enrichment precedence: api_detail beats snapshot; unmatched stay null") {
    val meta = Seq(
      ("db1", "docA", "retrieve_snapshot", "S-A"),
      ("db1", "docA", "api_detail", "D-A"),
      ("db1", "docB", "retrieve_snapshot", "S-B"))
      .toDF("database_id", "document_id", "meta_source", "title")
    val got = Retrieval.enrich(chunks, meta)
      .select("chunk_id", "title").as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("D-A"))
    assert(got(4L).contains("S-B"))
    assert(got(6L).isEmpty)
  }

  test("nested assembly orders blocks by position and docs by id") {
    val c = chunks.withColumn("position", lit(100) - col("score"))
    val got = Retrieval.assembleNested(c)
      .filter(col("database_id") === "db1")
      .select("docs").as[String].head()
    // docA blocks by position (score desc → 1,2,3), docB (4,5)
    assert(got == "docA:1,2,3;docB:4,5")
  }

  test("rerank stub is deterministic with fused-order fallback") {
    val fused = Seq((1L, "q", "content a", 0.5), (2L, "q", "content b", 0.4))
      .toDF("chunk_id", "query", "content", "score")
    val a = Retrieval.rerank(fused, col("query"), col("content"), col("score"))
      .select("chunk_id", "rerank_score").as[(Long, Double)].collect().toMap
    val b = Retrieval.rerank(fused, col("query"), col("content"), col("score"))
      .select("chunk_id", "rerank_score").as[(Long, Double)].collect().toMap
    assert(a == b)
    assert(a.values.forall(v => v >= 0.0 && v < 1.0))
  }

  test("scan sharing: segment tasks merge per DB; full-DB task subsumes (SURVEY §4)") {
    val jobs = Retrieval.buildExecutionPlan(tasks)
    val byDb = jobs.collect().map(r => r.getAs[String]("database_id") -> r).toMap
    // db1 has a full-DB task -> one unfiltered scan despite the segment task
    assert(byDb("db1").getAs[Boolean]("full_scan"))
    assert(byDb("db1").isNullAt(byDb("db1").fieldIndex("doc_ids")))
    assert(byDb("db1").getAs[scala.collection.Seq[String]]("task_ids").toSet == Set("segA", "fullDb1"))
    assert(jobs.count() == 2)   // one job per database, not one per task

    // applying the plan reproduces the union of task scans
    val scanned = Retrieval.scanWithPlan(chunks, jobs)
    assert(scanned.count() == chunks.count())   // db1 full + db2 full cover all

    // segment-only database: doc filter pushed as membership
    val segOnly = Seq(("t1", "dbX", Some("dA"), "segment_retrieval", 1, 5),
        ("t2", "dbX", Some("dB"), "segment_retrieval", 2, 5))
      .toDF("task_id", "database_id", "document_id", "retrieval_mode", "task_order", "top_k")
    val planX = Retrieval.buildExecutionPlan(segOnly)
    val rowX = planX.head()
    assert(!rowX.getAs[Boolean]("full_scan"))
    assert(rowX.getAs[scala.collection.Seq[String]]("doc_ids").toSeq == Seq("dA", "dB"))
    val chunksX = Seq((1L, "dbX", "dA", 1L), (2L, "dbX", "dC", 1L))
      .toDF("chunk_id", "database_id", "document_id", "score")
    assert(Retrieval.scanWithPlan(chunksX, planX)
      .select("chunk_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("GraftExtensions injects the SQL function surface") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new graft.core.GraftExtensions().apply(e)
    // builder-level smoke: the injected builders construct valid expressions
    val expr = graft.functions.LenientJsonClean(
      org.apache.spark.sql.catalyst.expressions.Literal("x {\"k\": 1}"))
    assert(expr.dataType == org.apache.spark.sql.types.StringType)
    // the portable signature layer is reachable from pure SQL (GraftSession
    // sessions carry the extension)
    val row = spark.sql(
      """SELECT poly_simhash('a b c') AS s,
         size(poly_shingle_hashes_2('a b c')) AS n,
         repetition_stats('a b a b a').top_frac AS t""").head()
    assert(row.getLong(0) != 0L)
    assert(row.getInt(1) == 2)
    assert(row.getDouble(2) == 0.5)
  }
}
