package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * All engine queries take a `sfDir` (scale-factor directory) so the same
  * plan runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1 (bench) —
  * and, by extension, on any Parquet lake path at cluster scale. Reads are
  * plain columnar Parquet scans: column pruning and predicate pushdown
  * reach the scan via Catalyst, so the same code path works at 100 TB as
  * long as callers keep plans declarative (no collect-then-filter).
  */
object Tables {

  /** Serving-side corpus cache: (sfDir, table) → persisted DataFrame.
    * [[graft.Serving.handle]] builds each request's plan from [[table]]
    * reads; without a cache every request of a 1,000-concurrent-user
    * deployment re-scans the same parquet (the SRS latency target is
    * per-request, and the corpus is the invariant across requests). A
    * server opts in with [[cacheCorpus]] — after the first request
    * materializes the persisted scan, every later plan reads the
    * in-memory columnar copy (`InMemoryTableScan`, `ServingSpec` asserts
    * it) instead of re-opening files. Deliberately OPT-IN: batch jobs
    * (Bench/Verify/pipelines) read each table once per query, where a
    * persist would only add memory pressure — caching is a serving
    * decision, not a read-path default. MEMORY_AND_DISK, so a corpus
    * bigger than executor memory degrades to local-disk columnar blocks
    * instead of OOM (at real scale a server caches the serving-critical
    * tables only — embeddings, not the 100 TB documents). */
  private val corpusCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  /** Persist `names` tables of `sfDir` for reuse across requests.
    * Idempotent; lazy (first action materializes). */
  def cacheCorpus(s: SparkSession, sfDir: String,
      names: Seq[String] = Seq("embeddings")): Unit =
    names.foreach { n =>
      corpusCache.computeIfAbsent((sfDir, n), _ =>
        s.read.parquet(s"$sfDir/$n.parquet")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }

  /** Drop `sfDir`'s cached tables (all of them by default). */
  def uncacheCorpus(sfDir: String, names: Seq[String] = Nil): Unit = {
    val it = corpusCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == sfDir &&
          (names.isEmpty || names.contains(e.getKey._2))) {
        e.getValue.unpersist()
        it.remove()
      }
    }
  }

  /** Plan-level memo: (sfDir, table) → the resolved scan DataFrame.
    * `spark.read.parquet` is NOT free — every call re-runs parquet
    * schema inference (a footer-reading Spark job) and re-lists files,
    * and the query bindings construct table scans hundreds of times per
    * session. The tables are immutable testdata/lake paths, so the
    * resolved relation is reused: inference runs once per (JVM, sfDir,
    * table) and later constructions — including the whole deferred-view
    * registration — are job-free. (Relation reuse across queries is
    * safe: LogicalRelation is a MultiInstanceRelation, the same pattern
    * [[cacheCorpus]] already relies on.) */
  private val planCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val hit = corpusCache.get((sfDir, name))
    if (hit != null) hit
    else planCache.computeIfAbsent((sfDir, name),
      _ => spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` drifts with the testdata generator: some rounds write
    * TIMESTAMP(NANOS) (which Spark's reader rejects — read as long nanos
    * via the legacy conf and divide to micros; `DIV 1000`, not `/`,
    * because epoch-nanos ~1.7e18 exceeds double's 2^53 integer range),
    * others plain timestamp[us] (arrives as TIMESTAMP_NTZ). Normalize
    * both to a session-TZ TimestampType column — sessions run UTC
    * (`Verify`/`SparkSpec`), so the NTZ cast is value-preserving and
    * matches DuckDB's naive read of the same file. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    val f = org.apache.spark.sql.functions
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", f.timestamp_micros(f.expr("ts DIV 1000")))
      case _ =>
        // The NTZ→TimestampType cast is value-preserving ONLY under a
        // UTC session zone; a non-UTC serving session would silently
        // shift every event relative to DuckDB's naive read of the same
        // file. Fail loudly instead of shifting.
        val tz = s.conf.get("spark.sql.session.timeZone")
        val off = java.time.ZoneId.of(tz).getRules
          .getOffset(java.time.Instant.EPOCH).getTotalSeconds
        require(off == 0 && java.time.ZoneId.of(tz).getRules.isFixedOffset,
          s"Tables.events: session timeZone '$tz' is not UTC — the " +
            "TIMESTAMP_NTZ normalization would shift values; set " +
            "spark.sql.session.timeZone=UTC")
        raw.withColumn("ts",
          f.col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  // --- typed surface ------------------------------------------------------
  // Case-class Datasets for the tables the library manipulates as whole
  // records (compile-time column safety; Catalyst still prunes/pushes
  // through the typed plan). DataFrame remains the norm for dynamic-schema
  // relational work.

  case class Document(doc_id: Long, text: String, lang: String,
      n_chars: Long, source: String)
  case class EmbeddingRow(vec_id: Long, embedding: Seq[Float], label: Long)
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  def documentsDs(s: SparkSession, d: String): Dataset[Document] = {
    import s.implicits._
    documents(s, d).select("doc_id", "text", "lang", "n_chars", "source")
      .as[Document]
  }
  def embeddingsDs(s: SparkSession, d: String): Dataset[EmbeddingRow] = {
    import s.implicits._
    embeddings(s, d).select(col("vec_id"), col("embedding"),
      col("label").cast("long").as("label")).as[EmbeddingRow]
  }
  def eventsDs(s: SparkSession, d: String): Dataset[Event] = {
    import s.implicits._
    events(s, d).as[Event]
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so the whole corpus is queryable
    * from pure SQL (`spark.sql("SELECT ... FROM documents ...")`) —
    * together with [[graft.GraftExtensions]] this is the full SQL-only
    * surface of the engine. */
  def registerTables(s: SparkSession, d: String): Unit =
    names.foreach {
      case n @ "events" => events(s, d).createOrReplaceTempView(n)
      case n => table(s, d, n).createOrReplaceTempView(n)
    }
}
