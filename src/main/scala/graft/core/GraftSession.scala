package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory with the engine's scale-oriented defaults.
  *
  * The reference (single-process Python asyncio, see SURVEY.md §4) has no
  * notion of partitioning or adaptive execution; here every knob is set for
  * a real cluster and merely *sized down* for local[32] testing:
  *
  *  - AQE on: runtime coalescing of small shuffle partitions, skew-join
  *    splitting — the 100 TB posture for the skewed region/education keys
  *    the reference filters on (retrieve.py:1095-1195 analog).
  *  - `spark.sql.shuffle.partitions` low for local mode; on a cluster AQE's
  *    coalescing makes the initial number mostly a ceiling.
  *  - Broadcast threshold raised: every dimension table in SURVEY.md §1.1
  *    (region/nation/education/label maps) is tiny and must never shuffle.
  */
object GraftSession {

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // The synthetic tables store naive (no-UTC-flag) parquet timestamps;
      // read them as plain TimestampType — under the UTC session the stored
      // micros ARE the UTC instant, and date_format/unix_timestamp render the
      // same wall clock DuckDB's naive TIMESTAMP does. Leaving NTZ inference
      // on would instead surface TIMESTAMP_NTZ, which half the temporal
      // surface (timestamp literals, unix_timestamp arithmetic) can't mix with
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // decode() substitutes on malformed bytes and accepts the full JVM
      // charset set (GBK et al.) — charset-fallback chains probe-and-
      // roundtrip instead of raising (TextFunctions.decodeChain)
      .config("spark.sql.legacy.codingErrorAction", "true")
      .config("spark.sql.legacy.javaCharsets", "true")
      // KV blocks with repeated keys keep the last value (dict semantics)
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      // the engine's custom expression surface (lenient_json_clean,
      // shingle_hashes_k, graft_multi_format_date) registered on every
      // session — columns built before any session exists still resolve
      .config("spark.sql.extensions", "graft.core.GraftExtensions")
      // Broadcast blocks and shuffle files release through ContextCleaner
      // only after a JVM GC collects their driver-side handles; a driver
      // with heap headroom can go the whole job without one, so a
      // long-running session (or a many-query benchmark) accumulates
      // shuffle data in spark.local.dir indefinitely. Spark's own
      // periodic-GC safety valve defaults to 30min — far too lazy for
      // that; 2min keeps the cleaner draining at negligible cost.
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false")

  def local(appName: String = "graft", threads: Int = 32): SparkSession = {
    val s = builder(appName).master(s"local[$threads]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Loaders for the driver's synthetic tables (TESTDATA.md). Plain parquet
  * scans so Catalyst's column pruning + predicate pushdown apply; never
  * cache here — callers decide reuse.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else spark.read.parquet(s"$dir/$name.parquet")

  /** The events table's `ts` column has shipped in two generations of the
    * driver testdata: TIMESTAMP(NANOS), which Spark only reads as raw longs
    * (`spark.sql.legacy.parquet.nanosAsLong`), and plain microsecond
    * timestamps (round 6+). Dispatch on the read schema so every consumer
    * sees an ordinary `ts` TimestampType column either way.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType =>
        // `div` = integral division: `ts / 1000` would go through double and
        // lose sub-µs exactness above 2^53 (≈13% of epoch-nano rows are 1µs
        // off under double division), diverging from DuckDB's nanos→micros
        // integer truncation
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // only reachable on a session without the factory's NTZ-inference-off
        // config; under the UTC session the cast is value-preserving
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
