package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming surface for the ingest flow the reference only
  * *specifies* (SRS §4.1-4.2: new upload → auto-tag → similarity
  * suggestions → notification digests; no code exists —
  * `/root/repo/SURVEY.md` §2.9 R4), green-field designed over the
  * `events` table shape.
  *
  * Every transformation here is a plain `DataFrame => DataFrame` so the
  * SAME logic runs in batch (where the DuckDB oracle can check it — the
  * `evt_*` entries in [[graft.operators.Analytics]]) and under
  * `readStream` (where the specs drive it through MemoryStream). That
  * unified-plan property is the point of building on Spark: watermarks
  * and output modes are execution concerns, not semantics.
  *
  * Scale notes: all stateful ops key by `user_id` (or the agg's group
  * key), so state is hash-partitioned across executors; watermarks bound
  * state size; the static dim side of [[enriched]] broadcasts.
  */
object Streams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source ingest: the SRS "upload folder" becomes a streaming
    * parquet directory scan — bounded per-trigger file count so a backlog
    * doesn't produce one giant micro-batch. */
  def fileIngest(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Hourly tumbling counts+sums per event type. In streaming, pair with
    * `withWatermark` (see [[withEventWatermark]]) for append-mode
    * finalization; in batch the same plan is the `evt_tumbling` oracle
    * query modulo window-struct vs date_trunc spelling. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("h"), col("event_type"), col("n"), col("sum_value"))

  /** 30-minute-gap session windows per user: Spark's native
    * `session_window` keeps per-key open-window state, closed by the
    * watermark — the streaming analog of the batch `evt_session`
    * lag/gap sessionization. */
  def sessionized(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), min("ts").as("first_ts"), max("ts").as("last_ts"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Exactly-once-per-event semantics over an at-least-once transport:
    * drop duplicate `event_id`s, with state bounded by the watermark. */
  def deduped(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  /** Streaming exact/near-dup suppression for a document INGEST stream:
    * first occurrence of each MinHash signature passes, later ones
    * (exact dups and token-multiset-identical docs) are dropped — the
    * streaming face of [[graft.operators.Dedup.minhashPairs]]'s collapse
    * step. State = one row per distinct signature.
    *
    * Pass `watermark = Some(tsCol -> delay)` to bound that state: the
    * stream gets `withWatermark(tsCol, delay)` and dedup switches to
    * `dropDuplicatesWithinWatermark`, so signatures older than the
    * watermark are evicted — the requirement for an unbounded ingest
    * stream to run forever. With `watermark = None` (and in batch, where
    * watermarks are no-ops) state grows with the number of distinct
    * signatures. `df` needs a string `textCol`. */
  def dedupedByContent(df: DataFrame, textCol: String, k: Int = 64,
      watermark: Option[(String, String)] = None): DataFrame = {
    val withSig = df.withColumn("_sig",
      graft.functions.TextExpressions.minhashSig(df.sparkSession,
        split(lower(col(textCol)), " "), k))
    val deduped = watermark match {
      case Some((tsCol, delay)) if df.isStreaming =>
        withSig.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark("_sig")
      case _ => withSig.dropDuplicates("_sig")
    }
    deduped.drop("_sig")
  }

  /** Per-row hygiene gate for a document ingest stream: the quality +
    * repetition + language predicates and the PII redaction the batch
    * curation chain uses ([[graft.operators.Pipelines.curateFullOn]]
    * stages 1-3, [[graft.operators.Curation.piiRedact]]), on the
    * streaming face. Every signal here is a pure per-row expression — no
    * state, no watermark, no output-mode constraint — so the gate is
    * append-mode streaming-safe BY CONSTRUCTION, and the same call on a
    * batch frame yields identical survivors/redactions (parity proven in
    * `StreamsSpec`). Chain [[dedupedByContent]] after it for the full
    * ingest flow: gate → redact → dedup; the stateful dedup is the only
    * stage that needs a watermark.
    *
    * Adds `n_tokens`, `top_tok_frac`, `dup_2gram_frac`, `lang_pred`
    * (the signals that admitted the row) and piiRedact's
    * `n_emails`/`n_ips`/`n_phones`/`redacted`. */
  def hygieneGated(df: DataFrame, textCol: String, minTokens: Long = 5,
      maxTopTokFrac: Double = 0.2, maxDup2gramFrac: Double = 0.1,
      requireLang: Boolean = true): DataFrame = {
    import graft.functions.{TextExpressions, TextFunctions}
    val s = df.sparkSession
    val nGrams = when(col("n_tokens") < 2, lit(1L)).otherwise(col("n_tokens") - 1L)
    val scored = df
      .withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("top_tok_frac",
        TextExpressions.topTokenCount(s, col("__toks")).cast("double")
          / col("n_tokens").cast("double"))
      .withColumn("dup_2gram_frac",
        (nGrams - size(TextExpressions.shingleHashes(s, col("__toks"), 2)).cast("long"))
          .cast("double") / nGrams.cast("double"))
      .withColumn("lang_pred", TextFunctions.langIdPredict(col("__toks")))
    val gated = scored.filter(
      col("n_tokens") >= minTokens &&
        col("top_tok_frac") <= maxTopTokFrac &&
        col("dup_2gram_frac") <= maxDup2gramFrac &&
        (if (requireLang) col("lang_pred") =!= "und" else lit(true)))
    graft.operators.Curation.piiRedact(gated, col(textCol)).drop("__toks")
  }

  /** Gopher-rules admission gate for a document stream — the published
    * quality/repetition rule set ([[graft.operators.TextAnalysis
    * .withGopherMetrics]]) as a STATELESS per-row filter: one fused-
    * kernel map, no state store, no watermark, row shape preserved — so
    * it composes anywhere in an ingest chain exactly like
    * [[hygieneGated]] (batch/stream parity is definitional: the same
    * Column tree evaluates per row in both modes; spec-pinned anyway). */
  def gopherGated(df: DataFrame, textCol: String,
      stopwords: Seq[String] =
        graft.functions.TextFunctions.EnglishStopwords): DataFrame =
    graft.operators.TextAnalysis
      .withGopherMetrics(df, col(textCol), stopwords)
      .filter(col("passes"))
      .drop(graft.operators.TextAnalysis.GopherMetricCols: _*)

  /** Gopher LINE-rule admission gate ([[graft.operators.TextAnalysis
    * .withGopherLineMetrics]]) as the same stateless per-row filter as
    * [[gopherGated]] — rules → line rules → model → fraction composes
    * in any order because every gate preserves row shape. */
  def gopherLineGated(df: DataFrame, textCol: String): DataFrame =
    graft.operators.TextAnalysis
      .withGopherLineMetrics(df, col(textCol))
      .filter(col("passes_lines"))
      .drop(graft.operators.TextAnalysis.GopherLineMetricCols: _*)

  /** Internal row shape for [[nearDupPairsStream]]'s band posting list.
    * `ts` keeps the WATERMARK-TAGGED timestamp column alive into the
    * grouped Dataset — event-time timeout requires it downstream. (Not
    * `private`: encoder codegen needs the class accessible.)
    *
    * `band` became Long (numeric band keys) in r8 — a state-store KEY
    * SCHEMA change: a streaming query checkpointed under the old String
    * keys cannot resume against this version (StateSchemaNotCompatible);
    * restart from a fresh checkpoint. */
  case class BandPost(band: Long, doc_id: Long, sig: Seq[Long],
      ts: java.sql.Timestamp, ts_ms: Long)

  /** One emitted near-dup candidate: `doc_a` < `doc_b`, `est` = fraction
    * of agreeing MinHash slots (≈ Jaccard). */
  case class NearDupPair(doc_a: Long, doc_b: Long, est: Double)

  /** Streaming MinHash-LSH NEAR-dup candidate pairs — the streaming face
    * of [[graft.operators.Dedup.minhashPairs]], beyond
    * [[dedupedByContent]]'s exact-signature suppression: a new document
    * is compared against the recent docs sharing any LSH band, and every
    * (older, newer) pair whose signatures agree on ≥ `minEst` of slots is
    * emitted as it happens.
    *
    * Scale/state design (the part that must survive an unbounded stream):
    *  - state is keyed by BAND (hash-partitioned across executors); a doc
    *    posts to `bands` keys, so the per-key comparison set is the
    *    band's bucket, never the corpus — same never-all-pairs discipline
    *    as the batch LSH;
    *  - per-band state stores (doc_id, k-slot signature, event-time) and
    *    is TIME-BOUNDED two ways: entries older than the watermark are
    *    evicted on every access, and fully idle bands clear via an
    *    event-time timeout — so state is O(docs inside the watermark
    *    window), independent of stream age;
    *  - a doc is admitted into a band's state once (re-deliveries are
    *    ignored), so a pair is emitted at most once per agreeing band and
    *    never re-emitted in later batches. Pairs agreeing on SEVERAL
    *    bands surface once per agreeing band within that trigger —
    *    `distinct` them per micro-batch downstream (foreachBatch), where
    *    it is a batch-local dedup, not more stream state.
    *
    * `df` needs (`idCol`: long, `textCol`: string, `tsCol`: timestamp).
    * In batch the same call degenerates to one pass with empty initial
    * state — `StreamsSpec` pins batch/stream agreement. */
  def nearDupPairsStream(df: DataFrame, idCol: String, textCol: String,
      tsCol: String, k: Int = 64, bands: Int = 16, minEst: Double = 0.8,
      delayMinutes: Int = 10): Dataset[NearDupPair] = {
    val s = df.sparkSession
    import s.implicits._
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val delayMs = delayMinutes * 60000L
    val sig = graft.functions.TextExpressions.minhashSig(s,
      split(lower(col(textCol)), " "), k)
    val posts = df
      .withWatermark(tsCol, s"$delayMinutes minutes")
      .withColumn("__sig", sig)
      // numeric band keys: the state store and its shuffle key by an
      // 8-byte hash instead of a concat'd string (same batch-side rule)
      .withColumn("__band", explode(
        graft.functions.TextExpressions.lshBandKeysLong(s, col("__sig"), bands, k / bands)))
      .select(col("__band").as("band"), col(idCol).as("doc_id"),
        col("__sig").as("sig"), col(tsCol).as("ts"),
        unix_millis(col(tsCol)).as("ts_ms"))
      .as[BandPost]
    posts
      .groupByKey(_.band)
      .flatMapGroupsWithState[List[(Long, Seq[Long], Long)], NearDupPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_, rows, state) =>
          if (state.hasTimedOut) { // idle band past the watermark: clear
            state.remove()
            Iterator.empty
          } else {
            // batch execution eliminates the watermark node, and the batch
            // GroupState then refuses watermark accessors — treat that as
            // watermark 0 / no timeout (batch state dies with the job)
            val wm = scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(0L)
            var entries = state.getOption.getOrElse(Nil)
              .filter(_._3 >= wm) // watermark eviction on every access
            val out = List.newBuilder[NearDupPair]
            // deterministic order inside the trigger
            rows.toSeq.sortBy(r => (r.ts_ms, r.doc_id)).foreach { r =>
              if (!entries.exists(_._1 == r.doc_id)) {
                entries.foreach { case (oid, osig, _) =>
                  val n = math.min(osig.length, r.sig.length)
                  var agree = 0
                  var i = 0
                  while (i < n) { if (osig(i) == r.sig(i)) agree += 1; i += 1 }
                  val est = if (n == 0) 0.0 else agree.toDouble / n
                  if (est >= minEst)
                    out += NearDupPair(math.min(oid, r.doc_id),
                      math.max(oid, r.doc_id), est)
                }
                entries = (r.doc_id, r.sig, r.ts_ms) :: entries
              }
            }
            if (entries.isEmpty) state.remove()
            else {
              state.update(entries)
              // wake once the newest entry ages past the watermark window
              scala.util.Try(
                state.setTimeoutTimestamp(entries.map(_._3).max + delayMs))
            }
            out.result().iterator
          }
      }
  }

  /** Stream-static enrichment: the dim side is a small static table →
    * broadcast hash join per micro-batch, no shuffle of the stream. */
  def enriched(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("event_type"), "left")

  /** STREAM-STREAM interval join: each left event matched to right events
    * of the same key within `[lts − lookback, lts]`. Both sides carry
    * watermarks and the join has a time BOUND, so Spark can expire state:
    * per-key buffered rows older than watermark+lookback are dropped —
    * the requirement for an unbounded two-stream join to run forever.
    * Column names on the two sides must be disjoint apart from `key`. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      lts: String, rts: String, lookback: String = "10 minutes",
      watermark: String = "10 minutes"): DataFrame =
    left.withWatermark(lts, watermark)
      .join(right.withWatermark(rts, watermark), expr(
        s"""$key = __rk AND $rts BETWEEN $lts - INTERVAL $lookback AND $lts"""))

  /** Right-side prep for [[intervalJoin]]: rename the key so the join
    * condition can reference both sides unambiguously. */
  def intervalRight(right: DataFrame, key: String): DataFrame =
    right.withColumnRenamed(key, "__rk")

  def withEventWatermark(events: DataFrame, delay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", delay)

  // --- custom state: per-user running digest (SRS §4.6 notifications) ----

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class UserDigest(user_id: Long, n_events: Long, total_value: Double,
      last_type: String)

  /** Running per-user digest via mapGroupsWithState — the custom-state
    * escape hatch for semantics windows can't express (here: a
    * monotonically updated "activity digest" per user, emitted every
    * micro-batch). State is one small case class per user key. */
  def userDigest(events: Dataset[Ev]): Dataset[UserDigest] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserDigest, UserDigest](GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[UserDigest]) =>
          val prev = state.getOption.getOrElse(UserDigest(uid, 0L, 0.0, ""))
          // fold in timestamp order for a deterministic last_type
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val next = sorted.foldLeft(prev) { (d, e) =>
            UserDigest(uid, d.n_events + 1, d.total_value + e.value, e.event_type)
          }
          state.update(next)
          next
      }
  }

  // --- sink: merge/upsert via foreachBatch (SURVEY §2.1 S10) -------------

  private def fs(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** HDFS-semantics `rename` reports failure by returning false, not by
    * throwing. A swap step that ignores that and falls through to
    * `delete(old)` would destroy the only durable copy of the state and
    * commit a batch that never merged — so every swap/heal rename in this
    * file goes through this and aborts the batch on false (Structured
    * Streaming retries it; the staging tree is intact). */
  private def renameOrDie(f: org.apache.hadoop.fs.FileSystem,
      src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Unit =
    if (!f.rename(src, dst))
      throw new java.io.IOException(s"rename failed: $src -> $dst")

  /** Delete stale `${target}__staging_*` leftovers from crashed earlier
    * batches. Batch ids move forward across retries, so a crash between
    * staging and swap would otherwise leak one orphan dir per attempt
    * forever (the swap self-heal only knows about `__old`). Runs on
    * entry, before this batch stages — never touches the current batch's
    * own staging dir. */
  private def dropStaleStaging(spark: SparkSession, target: String): Unit = {
    val f = fs(spark, target)
    val parent = new org.apache.hadoop.fs.Path(target).getParent
    val prefix = new org.apache.hadoop.fs.Path(target).getName + "__staging_"
    if (parent != null && f.exists(parent))
      f.listStatus(parent).foreach { st =>
        if (st.getPath.getName.startsWith(prefix)) f.delete(st.getPath, true)
      }
  }

  /** Upsert-by-key sink: each micro-batch is merged into a parquet target
    * (read → left-anti old rows → union new → rewrite), the plain-Spark
    * MERGE the reference performs against its index
    * (`/root/reference/SAM/update_elasticsearch_with_segments.py:165-268`).
    * Idempotent per batch; swap for a Delta/Iceberg MERGE INTO when a
    * table format is available.
    *
    * The merge reads the target and replaces it, so the merged rows are
    * written to a STAGING directory first and swapped in with a rename:
    * the write that computes from the target never writes over it.
    * (A cache()-then-overwrite would corrupt the target if an evicted
    * partition were recomputed mid-overwrite — lineage would re-read the
    * half-overwritten target.) Rewrites O(table) per trigger — SMALL
    * TABLES ONLY (a serving-side index of thousands of rows, not a lake
    * table). The production default is [[upsertByKeyPartitioned]], which
    * rewrites only the partitions a batch touches. */
  def upsertByKey(spark: SparkSession, target: String, key: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val tgt = normDir(target) // __old/__staging_ are sibling concats
    val f = fs(spark, tgt)
    val targetP = new org.apache.hadoop.fs.Path(tgt)
    val oldP = new org.apache.hadoop.fs.Path(s"${tgt}__old")
    // self-heal a crash between the swap renames of a previous batch: the
    // previous table is intact at __old — put it back first; then clear
    // any staging leftovers a pre-swap crash stranded (their batch never
    // committed, so they are rebuilt from the stream on retry)
    if (!f.exists(targetP) && f.exists(oldP)) renameOrDie(f, oldP, targetP)
    f.delete(oldP, true)
    dropStaleStaging(spark, tgt)
    val fresh = batch.dropDuplicates(key)
    if (scala.util.Try(spark.read.parquet(tgt).schema).isSuccess) {
      val old = spark.read.parquet(tgt)
      val merged = old.join(fresh, old(key) === fresh(key), "left_anti")
        .unionByName(fresh)
      val tmp = s"${tgt}__staging_$batchId"
      val tmpP = new org.apache.hadoop.fs.Path(tmp)
      merged.write.mode("overwrite").parquet(tmp) // durable before any move
      // rename-out/rename-in/delete-old: every intermediate state keeps a
      // complete durable copy (see Compact.compactParquet's swap notes)
      renameOrDie(f, targetP, oldP)
      renameOrDie(f, tmpP, targetP)
      f.delete(oldP, true)
    } else fresh.write.mode("overwrite").parquet(tgt)
  }

  /** Partition-bounded upsert: the target is laid out `partitionBy(
    * partCol)` (a date/bucket column) and a micro-batch rewrites ONLY the
    * partitions it touches — dynamic partition overwrite — instead of the
    * whole table. At lake scale this is the difference between O(batch)
    * and O(table) per trigger.
    *
    * Mechanics per batch: collect the batch's distinct `partCol` values
    * (small — partitions per trigger, not rows); read ONLY those
    * partitions of the target (`isin` → partition pruning, proven shape
    * in `IvfLayoutSpec`); anti-join + union = the merged content of the
    * touched partitions; stage it durably; then dynamic-overwrite, which
    * replaces exactly the partitions present in the staged frame and
    * leaves every other partition's files untouched (byte-asserted in
    * `StreamsSpec`). */
  def upsertByKeyPartitioned(spark: SparkSession, target: String, key: String,
      partCol: String)(batch: DataFrame, batchId: Long): Unit = {
    val tgt = normDir(target) // __staging_ is a sibling concat
    dropStaleStaging(spark, tgt)
    val fresh = batch.dropDuplicates(key)
    if (scala.util.Try(spark.read.parquet(tgt).schema).isSuccess) {
      val touched = fresh.select(partCol).distinct().collect().map(_.get(0)).toSeq
      val old = spark.read.parquet(tgt).filter(col(partCol).isin(touched: _*))
      val merged = old.join(fresh, old(key) === fresh(key), "left_anti")
        .unionByName(fresh)
      val tmp = s"${tgt}__staging_$batchId"
      merged.write.mode("overwrite").parquet(tmp) // durable before touching target
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try spark.read.parquet(tmp)
        .write.partitionBy(partCol).mode("overwrite").parquet(tgt)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      fs(spark, tgt).delete(new org.apache.hadoop.fs.Path(tmp), true)
    } else fresh.write.partitionBy(partCol).mode("overwrite").parquet(tgt)
  }

  /** The COMPLETE streaming ingest flow as one callable — the SRS
    * upload→curate→index pipeline (§4.1-4.2) assembled from this module's
    * stages, each independently parity-tested:
    *
    *   source → [[hygieneGated]] (stateless quality/repetition/language
    *   gates + PII redaction) → [[dedupedByContent]] (watermark-bounded
    *   signature dedup — the only stateful stage) → [[startUpsertStream]]
    *   via the partition-bounded upsert.
    *
    * `df` must carry (`keyCol`, `textCol`, `tsCol`, `partCol`). Returns
    * the running query; the target table holds the redacted text (the
    * `redacted` column replaces `textCol`, so raw PII never lands at
    * rest) plus the admission signals. */
  def ingestPipeline(df: DataFrame, textCol: String, keyCol: String,
      tsCol: String, partCol: String, target: String, checkpoint: String,
      dedupWatermark: String = "1 hour")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val gated = hygieneGated(df, textCol)
    val deduped = dedupedByContent(gated, textCol,
      watermark = Some(tsCol -> dedupWatermark))
    val curated = deduped
      .drop(textCol) // only the redacted form reaches the table
      .withColumnRenamed("redacted", textCol)
      .withColumnRenamed(keyCol, "event_id") // upsert sink's key contract
    startUpsertStream(curated, target, checkpoint, partCol = Some(partCol))
  }

  /** [[ingestPipeline]] with the continuously-trained quality model in
    * the admission gate — the production DCLM loop closed: a labeled
    * stream maintains the NB count store via [[nbIngest]], and THIS
    * stream scores every arriving (hygiene-passed, deduped, redacted)
    * document against whatever that store holds at its micro-batch —
    * docs the CURRENT model rejects never land. Model freshness is
    * per-batch by construction (the store is re-read inside
    * `foreachBatch`), so as the model stream learns, the gate flips —
    * without restarting this query (StreamsSpec pins exactly that flip,
    * and per-phase parity with the batch [[graft.operators.Classify.nbScore]]
    * gate under the same store state).
    *
    * Cold-start rule, stated honestly: until the store exists AND has
    * seen both classes, scoring would either crash (no state) or
    * raise_error (single class — the nbModel guard), so the gate admits
    * on the heuristic stages alone. That is the right production
    * behavior — a quality model that has not yet seen a negative example
    * has no opinion — and the moment the threshold is crossed the next
    * batch scores. The check costs one read of the 1-row docs_n table.
    *
    * Scale shape per batch: model finalize is O(vocab) over the count
    * store (AQE broadcasts it into the score join), scoring is one
    * explode + term join over the BATCH (not the lake), and the landing
    * upsert rewrites only touched partitions. */
  def modelGatedIngest(df: DataFrame, textCol: String, keyCol: String,
      tsCol: String, partCol: String, target: String, checkpoint: String,
      modelDir: String, dedupWatermark: String = "1 hour",
      benchmarkDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = df.sparkSession
    val gated = hygieneGated(df, textCol)
    val deduped = dedupedByContent(gated, textCol,
      watermark = Some(tsCol -> dedupWatermark))
    val curated = deduped
      .drop(textCol)
      .withColumnRenamed("redacted", textCol)
      .withColumnRenamed(keyCol, "event_id")
    val sink = upsertByKeyPartitioned(spark, target, "event_id", partCol) _
    curated.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          // never-train-on-eval gate FIRST (when a benchmark gram index
          // is configured): arriving docs sharing a shingle with the
          // indexed eval set are dropped before any scoring — a doc the
          // benchmark contaminates must not land even if the quality
          // model loves it
          val clean = benchmarkDir match {
            case Some(b) => graft.operators.GramIndex.decontamGateFromIndex(
              batch, col("event_id"), col(textCol), b)
            case None => batch
          }
          val admitted =
            if (nbStoreReady(s, modelDir)) {
              val (llr, scalars) = nbModelFromStore(s, modelDir)
              val scores = graft.operators.Classify.nbScore(
                clean, col("event_id"), col(textCol), llr, scalars)
              clean.join(
                scores.filter(col("pred_pos"))
                  .select(col("doc_id").as("event_id")),
                Seq("event_id"), "left_semi")
            } else clean // cold start: heuristic gates only (see above)
          sink(admitted, batchId)
        }
      }
      .start()
  }

  /** [[modelGatedIngest]] with the RANK-BASED admission rule production
    * gates actually run (the streaming face of
    * [[graft.operators.Classify.topFractionByScore]]): a document lands
    * iff its NB margin reaches the (1−frac) quantile of the margin
    * distribution seen SO FAR, estimated from a continuously-maintained
    * bottom-k quantile sample ([[applySketchBatch]] state over the
    * scored margins — this stream maintains it itself, no second query).
    * A fixed `pred_pos` threshold drifts as the corpus mix shifts; the
    * fraction rule self-calibrates. Ordering per batch is
    * GATE-THEN-LEARN: the batch is judged by the PAST distribution (its
    * own margins join the sample only after admission).
    *
    * Crash-replay contract, stated precisely: gate-then-learn alone is
    * NOT enough for replay determinism, because a crash after the
    * sketch merge but before checkpoint commit replays the batch
    * against a distribution that already absorbed its margins — the
    * `__batch` marker prevents double-LEARN, not gate drift, and the
    * landing sink is key-idempotent, not batch-skipping, so a drifted
    * threshold would upsert a DIFFERENT admitted set. The gate decision
    * is therefore made DURABLE: the computed threshold (or the seed
    * verdict) is written to a `__gate_<ckpt-tag>_<batchId>` sidecar —
    * tmp-write + atomic rename, BEFORE the sink runs — and a replayed
    * batch reuses the recorded decision instead of recomputing it
    * (tagged by checkpoint because batch ids are per-checkpoint: a bare
    * batchId key would alias across queries sharing the sketch). The sketch state
    * itself is resolved through the same `__old`-healing read the NB
    * store uses ([[resolveNbState]]'s discipline): a crash inside
    * [[applySketchBatch]]'s two-rename swap window parks the complete
    * pre-batch sample at `__old`, and a raw `exists(stateDir)` check
    * there would wrongly conclude "no history" and admit the whole
    * batch, silently bypassing the gate.
    *
    * Below k total scored docs the sample IS the full margin history and
    * the gate is the EXACT historical percentile (spec-pinned); above k
    * it is the bounded-error sample estimate, the honest 100 TB trade.
    * Cold starts admit on heuristics alone: no model store (the
    * [[modelGatedIngest]] rule) or no margin history yet (an empty
    * distribution has no quantile — the first scored batch seeds it).
    * The model-cold-start verdict is itself recorded in the sidecar —
    * "is the store ready" is part of the decision, so a replay that
    * straddles the store becoming ready still honors the wholesale
    * admission that actually landed (the sink can't retract rows).
    * A fresh checkpoint is refused when its tag still has sidecars on
    * disk (the [[requireConsistentMarkers]] rule for this family).
    *
    * Marker retention: sidecars and sketch batch markers are pruned
    * once they fall `markerRetention` batches behind (the engine
    * replays at most the last uncommitted batch per checkpoint, so
    * older markers are provably dead) — without this the gate writes
    * one tiny file per batch for the stream's lifetime.
    *
    * Unscorable docs (text that tokenizes to zero terms — possible only
    * post-redaction, since [[hygieneGated]] demands ≥5 raw tokens): once
    * the model is ready, ONLY SCORABLE DOCS LAND, uniformly in both the
    * seed and the gated branch — a quality gate has no evidence for a
    * termless doc, and admitting it in one branch but not the other
    * (the pre-r14 behavior) made admission depend on arrival order.
    * Before the model exists the stream is in the declared
    * heuristics-only regime and the rule does not apply. */
  def fractionGatedIngest(df: DataFrame, textCol: String, keyCol: String,
      tsCol: String, partCol: String, target: String, checkpoint: String,
      modelDir: String, sketchDir: String, frac: Double = 0.1,
      k: Int = 512, dedupWatermark: String = "1 hour",
      markerRetention: Long = 100L)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(frac > 0.0 && frac <= 1.0, s"frac in (0,1], got $frac")
    require(markerRetention >= 2,
      s"markerRetention must cover the replay window, got $markerRetention")
    // the sidecars below are SIBLINGS built by string concat — see normDir
    val sketch = normDir(sketchDir)
    val spark = df.sparkSession
    val gated = hygieneGated(df, textCol)
    val deduped = dedupedByContent(gated, textCol,
      watermark = Some(tsCol -> dedupWatermark))
    val curated = deduped
      .drop(textCol)
      .withColumnRenamed("redacted", textCol)
      .withColumnRenamed(keyCol, "event_id")
    val sink = upsertByKeyPartitioned(spark, target, "event_id", partCol) _
    // Gate sidecars are keyed by (checkpoint, batchId) — the true replay
    // identity. Batch ids are PER-CHECKPOINT, so a bare batchId key
    // would alias across queries sharing a sketch dir (or across a
    // checkpoint reset) and silently replay another query's verdict.
    val gateTag = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(checkpoint.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
    }
    // checkpoint-reset guard — the [[requireConsistentMarkers]]
    // discipline for the sidecar family: a FRESH checkpoint at a path
    // whose tag still has surviving sidecars would silently replay the
    // previous run's admission verdicts for new, unrelated batch ids
    // (batch ids restart at 0 on reset). Refuse loudly instead.
    locally {
      val conf = spark.sparkContext.hadoopConfiguration
      val offsets = new org.apache.hadoop.fs.Path(s"$checkpoint/offsets")
      val cf = offsets.getFileSystem(conf)
      val freshCkpt = !cf.exists(offsets) || cf.listStatus(offsets).isEmpty
      if (freshCkpt) {
        val state = new org.apache.hadoop.fs.Path(sketch)
        val sf = state.getFileSystem(conf)
        val parent = state.getParent
        val prefix = state.getName + s"__gate_${gateTag}_"
        val stale = parent != null && sf.exists(parent) &&
          sf.listStatus(parent).exists(_.getPath.getName.startsWith(prefix))
        require(!stale,
          s"sketch dir $sketch carries __gate sidecars for checkpoint " +
            s"$checkpoint but that checkpoint is fresh: restarted batch " +
            "ids would silently reuse the previous run's admission " +
            "verdicts. Resume with the original checkpoint, or pair a " +
            "fresh checkpoint with a fresh sketch dir.")
      }
    }
    curated.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val f = fs(s, sketch)
          // durable per-batch gate decision (see the replay contract in
          // the doc above): reuse the recorded verdict on replay;
          // otherwise compute it — INCLUDING the model-cold-start
          // verdict: "is the store ready" is part of the decision, and
          // a crash-replay straddling the store becoming ready must not
          // re-gate a batch that originally landed whole on heuristics
          // (the key-idempotent sink cannot retract rows). Threshold
          // resolution goes through the __old-healing read, never a
          // bare exists; Double.toString/parse round-trips exactly.
          val gateP = new org.apache.hadoop.fs.Path(
            s"${sketch}__gate_${gateTag}_$batchId")
          val decision: String =
            if (f.exists(gateP)) {
              val in = f.open(gateP)
              try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
              finally in.close()
            } else {
              val d =
                if (!nbStoreReady(s, modelDir)) "cold"
                else resolveSketchState(s, sketch) match {
                  case Some(stateP) =>
                    val thr = s.read.parquet(stateP)
                      .agg(expr(s"percentile(__v, ${1.0 - frac})").as("t"))
                      .head()
                    if (thr.isNullAt(0)) "seed" else thr.getDouble(0).toString
                  case None => "seed" // model ready, no margin history yet
                }
              val tmpP = new org.apache.hadoop.fs.Path(
                s"${sketch}__gate_tmp_${gateTag}_$batchId")
              val out = f.create(tmpP, true)
              try out.write(d.getBytes("UTF-8")) finally out.close()
              renameOrDie(f, tmpP, gateP)
              d
            }
          if (decision == "cold") {
            // heuristics-only regime: no scoring, no margin learning —
            // the model has no opinion yet (or didn't when this batch
            // FIRST ran, which replay must honor)
            sink(batch, batchId)
          } else {
            val (llr, scalars) = nbModelFromStore(s, modelDir)
            val scores = graft.operators.Classify.nbScore(
                batch, col("event_id"), col(textCol), llr, scalars)
              .select(col("doc_id").as("event_id"), col("nb_margin"))
              .localCheckpoint() // read twice: gate join + sketch merge
            // once the model scores, only scorable docs land (uniform
            // seed/gated policy — see the unscorable-doc rule above)
            val admitted = decision match {
              case "seed" => batch.join(scores.select("event_id"),
                Seq("event_id"), "left_semi")
              case t => batch.join(
                scores.filter(col("nb_margin") >= t.toDouble)
                  .select("event_id"),
                Seq("event_id"), "left_semi")
            }
            sink(admitted, batchId)
            // learn AFTER gating: this batch's margins join the sample
            // (nb_margin = mfx/1e6 is exact — mfx magnitudes sit far
            // inside double's 2^53 integer range)
            val prepared = scores
              .select(col("event_id").cast("string").as("__id"),
                col("nb_margin").as("__v"))
              .withColumn("__u",
                graft.functions.HashFunctions.md5UniformOpen(col("__id")))
              .select("__id", "__u", "__v")
            if (!prepared.isEmpty)
              applySketchBatch(prepared, sketch, batchId, k)
          }
          // bounded marker retention: gate sidecars and sketch batch
          // markers otherwise accumulate one tiny file per batch for
          // the stream's lifetime (FS-metadata bloat at 100 TB
          // horizons). Structured Streaming replays at most the last
          // uncommitted batch per checkpoint, so markers more than
          // `markerRetention` batches old are provably dead for this
          // checkpoint; only OUR tag's sidecars are pruned (another
          // checkpoint's id sequence is not ours to judge).
          pruneMarkers(f, sketch, s"__gate_${gateTag}_",
            batchId - markerRetention)
          pruneMarkers(f, sketch, "__batch_", batchId - markerRetention)
        }
      }
      .start()
  }

  /** Strip trailing slashes from a user-supplied state/target dir.
    * Sibling artifacts (`__old`, `__staging_*`, `__gate_*`, `__batch_*`)
    * are built by STRING concatenation onto these dirs, so a trailing
    * slash would silently place them INSIDE the dir — where the
    * rename-swap discards them and the `Path.getName`-based cleaners
    * and fresh-checkpoint guards (which normalize) never see them.
    * Normalizing once at every sibling-concatenating entry keeps the
    * writers and the readers of those artifacts on the same path. */
  private def normDir(dir: String): String = {
    val trimmed = dir.replaceAll("/+$", "")
    if (trimmed.isEmpty) dir else trimmed
  }

  /** Delete `<dir>/_batch_<id>` IN-DIR markers with id < `beforeId` —
    * the bounded-retention cleaner for the index-family ingests (whose
    * `_`-prefixed markers live inside the index dir, invisible to
    * parquet readers). Structured Streaming replays at most the last
    * uncommitted batch per checkpoint, so markers `markerRetention`
    * batches old are provably dead; without pruning a long-lived stream
    * writes one tiny file per batch forever (FS-metadata bloat at
    * 100 TB horizons). Recent markers always survive, so the
    * fresh-checkpoint-vs-stale-marker guard keeps firing. */
  private def pruneBatchMarkers(f: org.apache.hadoop.fs.FileSystem,
      dir: String, beforeId: Long): Unit = {
    if (beforeId <= 0) return
    val root = new org.apache.hadoop.fs.Path(dir)
    if (f.exists(root))
      f.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("_batch_")) {
          val suffix = n.substring("_batch_".length)
          if (suffix.nonEmpty && suffix.forall(_.isDigit) &&
              suffix.toLong < beforeId)
            f.delete(st.getPath, false)
        }
      }
  }

  /** Delete `<stateDir><prefix><id>` sibling files with id < `beforeId`
    * — the bounded-retention cleaner for per-batch marker families.
    * Non-numeric suffixes (tmp files, other tags) are never touched. */
  private def pruneMarkers(f: org.apache.hadoop.fs.FileSystem,
      stateDir: String, prefix: String, beforeId: Long): Unit = {
    if (beforeId <= 0) return
    val state = new org.apache.hadoop.fs.Path(stateDir)
    val parent = state.getParent
    val full = state.getName + prefix
    if (parent != null && f.exists(parent))
      f.listStatus(parent).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(full)) {
          val suffix = n.substring(full.length)
          if (suffix.nonEmpty && suffix.forall(_.isDigit) &&
              suffix.toLong < beforeId)
            f.delete(st.getPath, false)
        }
      }
  }

  /** Resolve a READABLE complete copy of a sketch state dir without
    * mutating anything — the live dir, or (mid-[[applySketchBatch]]
    * swap / after a writer crash) the vacated `__old` copy, which holds
    * the complete pre-batch sample. Same reader discipline as
    * [[resolveNbState]]: readers never heal — the swap self-repair
    * belongs to the writer ([[applySketchBatch]] itself). */
  private def resolveSketchState(s: SparkSession, stateDir: String)
      : Option[String] = {
    val dir = normDir(stateDir)
    val f = fs(s, dir)
    if (f.exists(new org.apache.hadoop.fs.Path(dir))) Some(dir)
    else if (f.exists(new org.apache.hadoop.fs.Path(s"${dir}__old")))
      Some(s"${dir}__old")
    else None
  }

  /** Resolve a READABLE complete copy of the NB state without mutating
    * anything: the live `state` dir, or — mid-[[applyNbBatch]] swap or
    * after a writer crash — the vacated `state__old` copy (which is
    * complete by the swap discipline; it holds the pre-batch model,
    * exactly what a reader scoring "against whatever the store holds"
    * should see). Readers must NEVER heal: the gate stream runs
    * concurrently with the model stream, and a reader renaming
    * `__old → state` mid-swap would both abort the writer's rename-in
    * and resurrect stale state (healing belongs to the single writer —
    * [[applyNbBatch]]). */
  private def resolveNbState(s: SparkSession, modelDir: String): Option[String] = {
    val stateDir = s"$modelDir/state"
    val f = fs(s, stateDir)
    if (f.exists(new org.apache.hadoop.fs.Path(stateDir))) Some(stateDir)
    else if (f.exists(new org.apache.hadoop.fs.Path(s"${stateDir}__old")))
      Some(s"${stateDir}__old")
    else None
  }

  /** Retry a read that can race the writer's two-rename swap window: the
    * state dir can vanish between resolve and the parquet action. The
    * window is two renames wide, so a couple of re-resolves always land
    * on a complete copy. */
  private def nbReadRetry[T](body: => T): T = {
    var last: Throwable = null
    var i = 0
    while (i < 3) {
      try return body
      catch { case scala.util.control.NonFatal(e) => last = e; Thread.sleep(50L * (i + 1)) }
      i += 1
    }
    throw last
  }

  /** True once the NB count store exists and holds BOTH classes — the
    * score-vs-heuristics switch of [[modelGatedIngest]]. Read-only (see
    * [[resolveNbState]]): a mid-swap state is read from its complete
    * `__old` copy, never healed from the reader side. */
  def nbStoreReady(s: SparkSession, modelDir: String): Boolean =
    nbReadRetry {
      resolveNbState(s, modelDir).exists { dir =>
        val r = s.read.parquet(s"$dir/docs_n").select("__np", "__nn").head()
        !r.isNullAt(0) && !r.isNullAt(1) && r.getLong(0) > 0L && r.getLong(1) > 0L
      }
    }

  /** Wire a streaming DataFrame into the upsert sink. With `partCol` set
    * (the documented default for anything table-sized) each micro-batch
    * routes through [[upsertByKeyPartitioned]] and rewrites only the
    * partitions it touches; without it, the whole-table
    * [[upsertByKey]] merge — small serving tables only. */
  def startUpsertStream(events: DataFrame, target: String, checkpoint: String,
      partCol: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val sink = partCol match {
      case Some(p) => upsertByKeyPartitioned(events.sparkSession, target, "event_id", p) _
      case None => upsertByKey(events.sparkSession, target, "event_id") _
    }
    events.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch(sink)
      .start()
  }

  /** Maintain the lexical inverted index from a document stream: the
    * first micro-batch writes the index, every later one rides
    * [[graft.operators.Lexical.appendToIndex]] (postings append into
    * their bucket dirs; df/corpus stats recombine by exact sums behind
    * crash-safe swaps). Serving from the streamed index is bit-identical
    * to a full rebuild over everything ingested (spec-pinned) — the
    * same batch/stream-parity contract as the rest of this surface.
    *
    * Batch contract: doc_ids are NEW (an ingest increment, the same
    * contract as appendToIndex). Exactly-once: the standard foreachBatch
    * idempotence pattern — after a batch's append completes, an empty
    * `_batch_<id>` marker lands in the index dir, and a replayed batchId
    * whose marker exists is SKIPPED. This closes the common replay hole
    * (append durable, streaming checkpoint commit lost → Spark re-runs
    * the batch). The residual window — a crash between append completion
    * and marker creation — still replays into a double-append; closing
    * THAT needs the data write and the commit record under one MVCC
    * commit (a table format), which the operator deliberately doesn't
    * require. */
  /** Batch ids restart at 0 under a FRESH checkpoint; if the index dir
    * still carries `_batch_*` markers from a previous run, the colliding
    * ids would silently skip every new batch (data loss with no error).
    * Clearing the markers instead would be just as wrong — a source that
    * re-delivers old data would then double-apply it. The situation is
    * genuinely ambiguous, so refuse it loudly at stream start: resume
    * with the original checkpoint, or point the stream at a fresh index
    * dir. */
  private def requireConsistentMarkers(s: SparkSession, indexDir: String,
      checkpoint: String): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val offsets = new org.apache.hadoop.fs.Path(s"$checkpoint/offsets")
    val cf = offsets.getFileSystem(conf)
    val freshCkpt = !cf.exists(offsets) || cf.listStatus(offsets).isEmpty
    if (freshCkpt) {
      val idx = new org.apache.hadoop.fs.Path(indexDir)
      val xf = idx.getFileSystem(conf)
      val stale = xf.exists(idx) &&
        xf.listStatus(idx).exists(_.getPath.getName.startsWith("_batch_"))
      require(!stale,
        s"index dir $indexDir carries _batch_* markers from a previous " +
          s"run but checkpoint $checkpoint is fresh: restarted batch ids " +
          "would collide with the old markers and new data would be " +
          "silently skipped. Resume with the original checkpoint, or " +
          "ingest into a fresh index dir.")
    }
  }

  def indexIngest(docs: DataFrame, indexDir: String, checkpoint: String,
      markerRetention: Long = 100L)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(markerRetention >= 2,
      s"markerRetention must cover the replay window, got $markerRetention")
    requireConsistentMarkers(docs.sparkSession, indexDir, checkpoint)
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // heal interrupted swaps BEFORE probing: a crash mid stats-swap
          // leaves a COMPLETE index with stats parked at __old, and an
          // unhealed probe would read that as "no index" and clobber all
          // previously ingested postings with this one batch's rebuild.
          // After healing, stats absence really does mean "never
          // completed an initial build" (stats is written last), where a
          // full (re)write of the replayed first batch is the right move.
          graft.operators.Lexical.healIndex(batch.sparkSession, indexDir)
          val statsDir = new org.apache.hadoop.fs.Path(s"$indexDir/stats")
          val marker = new org.apache.hadoop.fs.Path(s"$indexDir/_batch_$batchId")
          val f = statsDir.getFileSystem(
            batch.sparkSession.sparkContext.hadoopConfiguration)
          if (!f.exists(marker)) { // replayed-but-applied batch: skip
            if (f.exists(statsDir))
              // requireDisjoint STAYS ON: the one replay the marker can't
              // see — a crash between append completing and the marker
              // create — re-delivers doc_ids the index already holds, and
              // the disjointness probe is exactly what turns that from
              // silent df double-counting into a loud failure. The probe
              // costs one anti-join of the batch's ids against postings
              // per micro-batch; correctness over throughput here.
              graft.operators.Lexical.appendToIndex(
                batch, col("doc_id"), col("text"), indexDir)
            else
              graft.operators.Lexical.writeInvertedIndex(
                batch, col("doc_id"), col("text"), indexDir)
            f.create(marker, true).close() // applied — commit the batch id
          }
          pruneBatchMarkers(f, indexDir, batchId - markerRetention)
        }
      }
      .start()
  }

  /** Maintain the at-rest distinct-gram index
    * ([[graft.operators.GramIndex]]) from a document stream: first
    * micro-batch writes the index, later ones append into their bucket
    * dirs — so newly landed lake docs are IMMEDIATELY visible to the
    * memorization/decontam audits without any lake re-scan. Same
    * exactly-once discipline as [[indexIngest]]: `_batch_<id>` marker
    * committed after the apply, fresh-checkpoint-vs-stale-marker
    * collisions refused at start, heal-before-probe so a crash mid
    * stats-swap can't read a COMPLETE index as "absent" and clobber it. */
  def gramIngest(docs: DataFrame, indexDir: String, checkpoint: String,
      n: Int = graft.operators.GramIndex.DefaultN,
      markerRetention: Long = 100L)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(markerRetention >= 2,
      s"markerRetention must cover the replay window, got $markerRetention")
    requireConsistentMarkers(docs.sparkSession, indexDir, checkpoint)
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.GramIndex.healIndex(batch.sparkSession, indexDir)
          val statsDir = new org.apache.hadoop.fs.Path(s"$indexDir/stats")
          val marker = new org.apache.hadoop.fs.Path(s"$indexDir/_batch_$batchId")
          val f = statsDir.getFileSystem(
            batch.sparkSession.sparkContext.hadoopConfiguration)
          if (!f.exists(marker)) { // replayed-but-applied batch: skip
            if (f.exists(statsDir))
              // requireDisjoint stays on — the append-done/marker-lost
              // replay window turns into a loud failure, not silent
              // double-attribution (the indexIngest rationale)
              graft.operators.GramIndex.append(
                batch, col("doc_id"), col("text"), indexDir)
            else
              graft.operators.GramIndex.write(
                batch, col("doc_id"), col("text"), indexDir, n = n)
            f.create(marker, true).close() // applied — commit the batch id
          }
          pruneBatchMarkers(f, indexDir, batchId - markerRetention)
        }
      }
      .start()
  }

  /** Streaming maintenance of a [[graft.operators.Multimodal
    * .writePhashIndex]] layout — the image-family sibling of
    * [[gramIngest]]: every arriving micro-batch of (doc_id, payload)
    * images is decoded + perceptually hashed ONCE and its banded rows
    * appended into the bucket-partitioned parquet, so a
    * [[graft.operators.Multimodal.probePhashIndex]] serves new frames as
    * soon as their batch commits — the decode cost is paid at ingest,
    * never again at audit time (the whole point of the at-rest layout).
    * First batch writes the index (fixing grid/bands/buckets in meta);
    * later batches append under the standard `_batch_<id>` marker —
    * the one-filesystem-create replay window this leaves (append done,
    * marker lost) is BENIGN here: duplicate (band, doc) rows collapse
    * in the probe's `distinct()` and carry identical hashes, the same
    * argument as [[applyIvfBatch]]. Heal-first so a crashed compaction
    * never hides a bucket from the append's readers. */
  def phashIngest(imgs: DataFrame, indexDir: String, checkpoint: String,
      grid: Int = 4, bands: Int = 4, markerRetention: Long = 100L)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(markerRetention >= 2,
      s"markerRetention must cover the replay window, got $markerRetention")
    requireConsistentMarkers(imgs.sparkSession, indexDir, checkpoint)
    imgs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          graft.sources.Tombstones.healPartitions(s, s"$indexDir/hashes")
          val metaDir = new org.apache.hadoop.fs.Path(s"$indexDir/meta")
          val marker = new org.apache.hadoop.fs.Path(s"$indexDir/_batch_$batchId")
          val f = metaDir.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (!f.exists(marker)) { // replayed-but-applied batch: skip
            if (f.exists(metaDir))
              graft.operators.Multimodal.appendToPhashIndex(batch, indexDir)
            else
              graft.operators.Multimodal.writePhashIndex(batch, indexDir,
                grid = grid, bands = bands)
            f.create(marker, true).close() // applied — commit the batch id
          }
          pruneBatchMarkers(f, indexDir, batchId - markerRetention)
        }
      }
      .start()
  }

  /** Streaming maintenance of a [[graft.operators.TextAnalysis
    * .writeLineCountIndex]] store — arriving docs' line counts fold in
    * additively per micro-batch, so [[graft.operators.TextAnalysis
    * .exciseFromLineIndex]] serves boilerplate excision against
    * everything ever ingested. Additive counts are NOT replay-
    * idempotent, so the apply commits per bucket under per-(batch,
    * bucket) markers (see applyLineCountBatch) — the same reason
    * [[nbIngest]] is marker-guarded while the per-(band, doc) index
    * appends get away with plain files. EVERY batch — including the
    * first — folds through the stamped apply path: the bootstrap only
    * writes the (idempotent, fixed-content) meta, so a crash anywhere
    * around the first batch replays into the same per-bucket commit
    * protocol instead of double-counting through a one-shot build. */
  def lineCountIngest(docs: DataFrame, textCol: String, indexDir: String,
      checkpoint: String, buckets: Int = graft.operators.TextAnalysis.LineBuckets,
      markerRetention: Long = 100L)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(markerRetention >= 2,
      s"markerRetention must cover the replay window, got $markerRetention")
    requireConsistentMarkers(docs.sparkSession, indexDir, checkpoint)
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val metaDir = new org.apache.hadoop.fs.Path(s"$indexDir/meta")
          val f = metaDir.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (!f.exists(metaDir))
            graft.operators.TextAnalysis.initLineCountIndex(
              s, indexDir, buckets = buckets)
          graft.operators.TextAnalysis.applyLineCountBatch(
            batch, col(textCol), indexDir, batchId)
          pruneBatchMarkers(f, indexDir, batchId - markerRetention)
        }
      }
      .start()
  }

  /** Streaming maintenance of a [[graft.operators.Dedup
    * .writeHyperplaneIndex]] layout — the embedding-LSH sibling of
    * [[phashIngest]]: arriving (vec_id, embedding) batches are signed
    * once and their banded rows appended into the bucket-partitioned
    * parquet, so a [[graft.operators.Dedup.probeHyperplaneIndex]] pairs
    * against new vectors as soon as their batch commits. First batch
    * writes (fixing nbits/bands/buckets in meta); later batches append
    * under the index's own config; `_batch_<id>` markers make replays
    * skip — the append-done/marker-lost window is benign for the same
    * duplicate-row-collapse reason as [[phashIngest]]. */
  def hplIngest(vecs: DataFrame, vec: org.apache.spark.sql.Column,
      indexDir: String, checkpoint: String,
      nbits: Int = 64, bands: Int = 32, markerRetention: Long = 100L)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(markerRetention >= 2,
      s"markerRetention must cover the replay window, got $markerRetention")
    requireConsistentMarkers(vecs.sparkSession, indexDir, checkpoint)
    vecs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          graft.sources.Tombstones.healPartitions(s, s"$indexDir/bands")
          val metaDir = new org.apache.hadoop.fs.Path(s"$indexDir/meta")
          val marker = new org.apache.hadoop.fs.Path(s"$indexDir/_batch_$batchId")
          val f = metaDir.getFileSystem(s.sparkContext.hadoopConfiguration)
          if (!f.exists(marker)) {
            if (f.exists(metaDir))
              graft.operators.Dedup.appendToHyperplaneIndex(
                batch, col("vec_id"), vec, indexDir)
            else
              graft.operators.Dedup.writeHyperplaneIndex(
                batch, col("vec_id"), vec, indexDir,
                nbits = nbits, bands = bands)
            f.create(marker, true).close()
          }
          pruneBatchMarkers(f, indexDir, batchId - markerRetention)
        }
      }
      .start()
  }

  /** One micro-batch of [[ivfIngest]], exposed so replay idempotence is
    * directly testable: assign + append the batch into the IVF layout
    * unless its `_batch_<id>` marker says it already landed. The marker
    * commits AFTER the append — the same at-least-once window as
    * [[indexIngest]] (a crash exactly between append and marker replays
    * the batch), accepted here for the same reason: it is the standard
    * foreachBatch idempotence trade, and the window is one filesystem
    * create wide. `_`-prefixed marker files are invisible to parquet
    * readers, so they can live inside the index dir itself. */
  def applyIvfBatch(batch: DataFrame, vec: org.apache.spark.sql.Column,
      centroids: DataFrame, indexDir: String, batchId: Long): Unit = {
    val marker = new org.apache.hadoop.fs.Path(s"$indexDir/_batch_$batchId")
    val f = marker.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    if (!f.exists(marker)) {
      graft.operators.Search.appendToIvfIndex(batch, vec, centroids, indexDir)
      f.create(marker, true).close()
    }
  }

  /** Streaming maintenance of a [[graft.operators.Search.writeIvfIndex]]
    * layout — the vector-side sibling of [[indexIngest]]: every arriving
    * micro-batch of vectors is assigned to its nearest centroid (the
    * same fused literal-codebook argmax the batch writer uses — per-row,
    * zero shuffle) and appended into the cluster-partitioned parquet, so
    * a probe's partition pruning serves new vectors as soon as their
    * batch commits. The codebook is FROZEN for the stream's lifetime:
    * re-training is a periodic batch job whose output swaps in a new
    * index, never a per-batch mutation (the faiss add-vs-train split) —
    * which is also what keeps this simpler than the lexical ingest:
    * with no df/stats to recombine there is no swap to heal, only
    * idempotent appends guarded by batch markers. */
  def ivfIngest(vecs: DataFrame, vec: org.apache.spark.sql.Column,
      centroids: DataFrame, indexDir: String, checkpoint: String,
      markerRetention: Long = 100L)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(markerRetention >= 2,
      s"markerRetention must cover the replay window, got $markerRetention")
    requireConsistentMarkers(vecs.sparkSession, indexDir, checkpoint)
    // resolve the codebook ONCE at stream start, not per batch — `cents`
    // is a bounded index artifact and the closure would otherwise re-run
    // its plan (possibly a full centroid aggregation) every trigger
    val cents = centroids.select(col("cid").cast("long"), col("c")).collect()
    val s = vecs.sparkSession
    import scala.jdk.CollectionConverters._
    val frozen = s.createDataFrame(
      cents.toSeq.asJava, centroids.select(col("cid").cast("long"), col("c")).schema)
    vecs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          applyIvfBatch(batch, vec, frozen, indexDir, batchId)
          pruneBatchMarkers(fs(batch.sparkSession, indexDir), indexDir,
            batchId - markerRetention)
        }
      }
      .start()
  }

  /** One micro-batch of [[semanticIngest]], exposed for direct replay
    * testing: within-batch keep-first semantic dedup
    * ([[graft.operators.Dedup.semanticDedup]]), then the lake probe
    * ([[graft.operators.Dedup.semanticDedupIncrementIdx]] — partition-
    * pruned to the batch's touched clusters, tombstone-aware), and ONLY
    * the survivors append into the lake's own cluster-partitioned
    * layout. The lake the NEXT batch probes therefore already contains
    * this batch's kept rows — the self-maintaining dedup-ingest loop.
    *
    * Idempotence fine print: the `_batch` marker is written AFTER the
    * append, so a crash between append and marker replays the batch.
    * That replay is a no-op only because every replayed row SELF-MATCHES
    * in the lake it just joined (cos(v,v)=1 ≥ minCos) — which holds iff
    * `minCos ≤ 1.0`. The require below makes that safety condition
    * explicit: a caller with an exotic threshold (or a future non-cosine
    * dup rule without reflexive matching) must not inherit
    * marker-after-append silently. */
  def applySemanticBatch(batch: DataFrame, id: org.apache.spark.sql.Column,
      vec: org.apache.spark.sql.Column, centroids: DataFrame,
      indexDir: String, batchId: Long, minCos: Double): Unit = {
    require(minCos <= 1.0,
      s"applySemanticBatch: minCos=$minCos > 1 breaks crash-replay " +
        "idempotence (replayed rows must self-match: cos(v,v)=1 >= minCos)")
    val s = batch.sparkSession
    val marker = new org.apache.hadoop.fs.Path(s"$indexDir/_batch_$batchId")
    val f = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (f.exists(marker)) return // replayed-but-applied batch: skip
    val inBatch = graft.operators.Dedup.semanticDedup(
      batch, id, vec, centroids, minCos)
    val batchKept = batch.join(
      inBatch.filter(!col("is_dup")).select("__vid"),
      id === col("__vid")).drop("__vid")
    // "lake exists" = a cluster partition dir exists — markers and
    // checkpoint files may populate indexDir before any data lands, and
    // reading a data-less dir as parquet would fail, not mean "empty"
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val hasData = f.exists(root) && f.listStatus(root)
      .exists(_.getPath.getName.startsWith("cluster="))
    val clean =
      if (!hasData) batchKept
      else batchKept.join(
        graft.operators.Dedup.semanticDedupIncrementIdx(
            s, indexDir, batchKept, id, vec, centroids, minCos)
          .filter(!col("is_dup")).select("__vid"),
        id === col("__vid")).drop("__vid")
    graft.operators.Search.appendToIvfIndex(clean, vec, centroids, indexDir)
    f.create(marker, true).close() // applied — commit the batch id
  }

  /** Streaming semantic-dedup ingest — the embedding-side analog of the
    * text pipeline's gate→dedup→upsert loop: every arriving micro-batch
    * is (1) deduped within itself (keep-first), (2) probed against the
    * at-rest lake index it is about to join, and (3) appended clean into
    * that same cluster-partitioned layout, so later batches
    * automatically dedup against earlier ones. Codebook frozen for the
    * stream's lifetime (the faiss add-vs-train split; re-train is
    * [[graft.operators.Search.retrainIvfIndex]]); batch markers make
    * replays idempotent. */
  def semanticIngest(vecs: DataFrame, id: org.apache.spark.sql.Column,
      vec: org.apache.spark.sql.Column, centroids: DataFrame,
      indexDir: String, checkpoint: String, minCos: Double,
      markerRetention: Long = 100L)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(markerRetention >= 2,
      s"markerRetention must cover the replay window, got $markerRetention")
    requireConsistentMarkers(vecs.sparkSession, indexDir, checkpoint)
    val cents = centroids.select(col("cid").cast("long"), col("c")).collect()
    val s = vecs.sparkSession
    import scala.jdk.CollectionConverters._
    val frozen = s.createDataFrame(
      cents.toSeq.asJava, centroids.select(col("cid").cast("long"), col("c")).schema)
    vecs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          applySemanticBatch(batch, id, vec, frozen, indexDir, batchId, minCos)
          pruneBatchMarkers(fs(batch.sparkSession, indexDir), indexDir,
            batchId - markerRetention)
        }
      }
      .start()
  }

  /** Apply one micro-batch of graph inserts
    * ([[graft.operators.Search.appendToGraphIndex]]) unless its
    * `_batch_<id>` marker says it already landed. Same
    * marker-after-append at-least-once window as [[applyIvfBatch]] —
    * accepted for the same reason (one filesystem create wide); a replay
    * inside that window would re-append the batch's nodes/edges, which
    * the periodic rebuild dedups along with its degree re-prune. */
  def applyGraphBatch(batch: DataFrame, id: org.apache.spark.sql.Column,
      vec: org.apache.spark.sql.Column, indexDir: String, batchId: Long,
      linkK: Int, beam: Int, hops: Int, buckets: Int): Unit = {
    val marker = new org.apache.hadoop.fs.Path(s"$indexDir/_batch_$batchId")
    val f = marker.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    if (!f.exists(marker)) {
      graft.operators.Search.appendToGraphIndex(batch, id, vec, indexDir,
        linkK, beam, hops, buckets)
      f.create(marker, true).close()
    }
  }

  /** Streaming maintenance of a
    * [[graft.operators.Search.writeGraphIndex]] layout — the graph-ANN
    * sibling of [[ivfIngest]]: every arriving vector is inserted with
    * the HNSW per-row discipline (beam-search its neighbors on the
    * index as it exists NOW, append node + undirected links), so a new
    * vector is reachable by the very next query — and by the REST OF
    * ITS OWN BATCH, since inserts walk in ascending-id order over the
    * live index. The entry ring and existing k-lists stay frozen until
    * the periodic batch rebuild (add-vs-train split); batch markers
    * make replays no-ops. */
  def graphIngest(vecs: DataFrame, id: org.apache.spark.sql.Column,
      vec: org.apache.spark.sql.Column, indexDir: String, checkpoint: String,
      linkK: Int = 3, beam: Int = 8, hops: Int = 3, buckets: Int = 32,
      markerRetention: Long = 100L)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(markerRetention >= 2,
      s"markerRetention must cover the replay window, got $markerRetention")
    requireConsistentMarkers(vecs.sparkSession, indexDir, checkpoint)
    vecs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          applyGraphBatch(batch, id, vec, indexDir, batchId,
            linkK, beam, hops, buckets)
          pruneBatchMarkers(fs(batch.sparkSession, indexDir), indexDir,
            batchId - markerRetention)
        }
      }
      .start()
  }

  /** Streaming right-to-be-forgotten: takedown requests arrive as a
    * stream of ids and land in every target index's shared tombstone
    * store ([[graft.sources.Tombstones.add]] — an O(|batch|) append, no
    * index file touched), so each family's NEXT probe already excludes
    * them; compaction reclaims space on its own schedule. One stream can
    * fan a single GDPR queue out to all four index families (IVF,
    * IVFADC, lexical, MinHash, graph all read the same store format).
    * No `_batch` marker is needed: the store is read through
    * `distinct()`, so a replayed or crash-duplicated batch is naturally
    * a no-op — takedown is idempotent by definition. */
  def takedownIngest(ids: DataFrame, id: org.apache.spark.sql.Column,
      indexDirs: Seq[String], checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(indexDirs.nonEmpty, "takedownIngest needs at least one index dir")
    ids.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val b = batch.localCheckpoint() // one materialization, N stores
          indexDirs.foreach(dir => graft.sources.Tombstones.add(b, id, dir))
        }
      }
      .start()
  }

  /** Streaming quality-model maintenance: arriving labeled documents
    * fold into the Naive-Bayes SUFFICIENT STATISTICS at rest
    * (`modelDir/counts`: per-term class counts; `modelDir/docs_n`:
    * class doc counts) — [[graft.operators.Classify.nbCounts]] on the
    * batch, [[graft.operators.Classify.nbCountsMerge]] into the state,
    * the same rename-out/rename-in swap discipline as [[upsertByKey]]
    * (every intermediate state keeps a complete durable copy), `_batch`
    * marker idempotence. Because counts are additive and finalize
    * ([[graft.operators.Classify.nbModelFromCounts]]) is a
    * deterministic model-sized computation, the streamed state equals a
    * full retrain on everything ever ingested — `quality_nb_incr`'s
    * oracle-pinned composition property is exactly what licenses this
    * loop. Only each batch is ever tokenized; state size is
    * vocabulary-sized, never corpus-sized. */
  def nbIngest(docs: DataFrame, text: org.apache.spark.sql.Column,
      isPos: org.apache.spark.sql.Column, modelDir: String,
      checkpoint: String, markerRetention: Long = 100L)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(markerRetention >= 2,
      s"markerRetention must cover the replay window, got $markerRetention")
    requireConsistentMarkers(docs.sparkSession, modelDir, checkpoint)
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          applyNbBatch(batch, text, isPos, modelDir, batchId)
          pruneBatchMarkers(fs(batch.sparkSession, modelDir), modelDir,
            batchId - markerRetention)
        }
      }
      .start()
  }

  /** One micro-batch of [[nbIngest]] (also the batch-mode backfill).
    *
    * Crash-safety: counts and doc totals move in ONE `state` directory
    * swap (counts + docs_n written into the same staging tree), and the
    * APPLIED BATCH ID rides inside the state itself (`__last_batch` on
    * docs_n) — so the merge and its provenance commit atomically. The
    * `_batch` marker alone can't close the crash window between a
    * completed swap and the marker create; for a non-idempotent count
    * merge that window would silently double-count the batch, so the
    * replay check reads `__last_batch` from the healed state instead of
    * trusting the marker. */
  def applyNbBatch(batch: DataFrame, text: org.apache.spark.sql.Column,
      isPos: org.apache.spark.sql.Column, modelDir: String,
      batchId: Long): Unit = {
    if (batch.isEmpty) return // backfill callers get nbIngest's guard too
    val s = batch.sparkSession
    val f = fs(s, modelDir)
    val marker = new org.apache.hadoop.fs.Path(s"$modelDir/_batch_$batchId")
    if (f.exists(marker)) return // replayed-but-applied batch
    val stateDir = s"$modelDir/state"
    val stateP = new org.apache.hadoop.fs.Path(stateDir)
    val oldP = new org.apache.hadoop.fs.Path(s"${stateDir}__old")
    // heal an interrupted previous swap, then clear staging orphans
    if (!f.exists(stateP) && f.exists(oldP)) renameOrDie(f, oldP, stateP)
    f.delete(oldP, true)
    dropStaleStaging(s, stateDir)
    val fresh = graft.operators.Classify.nbCounts(batch, text, isPos)
    val hasState = f.exists(stateP)
    if (hasState) {
      val lb = s.read.parquet(s"$stateDir/docs_n")
        .select("__last_batch").head().getLong(0)
      if (lb == batchId) { // swap landed, marker didn't — don't re-merge
        f.create(marker, true).close()
        return
      }
    }
    val (counts, docsN) =
      if (hasState)
        graft.operators.Classify.nbCountsMerge(
          (s.read.parquet(s"$stateDir/counts"),
            s.read.parquet(s"$stateDir/docs_n").drop("__last_batch")), fresh)
      else fresh
    val tmp = s"${stateDir}__staging_$batchId"
    // both tables durable in the staging tree before any move; the
    // inputs read the CURRENT state lazily, so they must land before
    // the swap replaces it
    counts.write.mode("overwrite").parquet(s"$tmp/counts")
    docsN.withColumn("__last_batch", lit(batchId))
      .write.mode("overwrite").parquet(s"$tmp/docs_n")
    if (f.exists(stateP)) renameOrDie(f, stateP, oldP)
    renameOrDie(f, new org.apache.hadoop.fs.Path(tmp), stateP)
    f.delete(oldP, true)
    f.create(marker, true).close() // applied — commit the batch id
  }

  /** Finalize the at-rest count state into the scoring model —
    * (llr, scalars) exactly as a fresh
    * [[graft.operators.Classify.nbModel]] train would produce.
    *
    * Read-only and SNAPSHOTTED: the state resolves via
    * [[resolveNbState]] (mid-swap reads land on the complete `__old`
    * copy) and both tables are eagerly `localCheckpoint`ed — they are
    * vocabulary-sized by construction — so a concurrent
    * [[applyNbBatch]] swap deleting the old copy mid-batch cannot yank
    * files out from under the gate stream's score join. */
  def nbModelFromStore(s: SparkSession, modelDir: String)
      : (DataFrame, DataFrame) =
    nbReadRetry {
      val dir = resolveNbState(s, modelDir).getOrElse(throw new IllegalStateException(
        s"no NB count state under $modelDir (train or stream a batch first)"))
      graft.operators.Classify.nbModelFromCounts(
        s.read.parquet(s"$dir/counts").localCheckpoint(),
        s.read.parquet(s"$dir/docs_n").drop("__last_batch").localCheckpoint())
    }

  // --- streaming sketch maintenance ---------------------------------------

  /** Continuously-maintained bottom-k sketch state — the streaming face
    * of [[graft.operators.Sketches]] (the one operator family that had
    * no streaming arm). The mergeable-summary property that lets the
    * batch sketches summarize 100 TB with one ≤k-row reduce is exactly
    * what makes them streamable: bottom-k(state ∪ batch) IS the sketch
    * of everything ever seen, state stays ≤ k rows forever, and each
    * micro-batch's work is one ≤(k + batch)-row sort — independent of
    * the stream's lifetime volume.
    *
    * Unified state shape (`__id` row/value identity, `__u` md5-uniform,
    * `__v` payload): [[kmvSketchIngest]] keys `__id` by the VALUE
    * (dedup = distinct-count semantics, `__v` unused);
    * [[quantileSketchIngest]] keys it by the ROW identity (`__v` = the
    * sampled value). The `dropDuplicates("__id")` in the merge makes
    * replaying a batch a NO-OP — rows re-entering the union collapse
    * onto themselves — so unlike [[applyNbBatch]]'s non-idempotent
    * count merge, the `_batch` marker here is an optimization, not the
    * correctness boundary; any duplicate `__id` carries an identical
    * (`__u`, `__v`) by construction (both derive from the id), so which
    * copy survives is immaterial. Crash-safety is the same
    * staging-swap / heal discipline as every state dir in this file. */
  def applySketchBatch(prepared: DataFrame, stateDir: String,
      batchId: Long, k: Int): Unit = {
    require(k >= 2, s"applySketchBatch: k >= 2, got $k")
    val s = prepared.sparkSession
    val dir = normDir(stateDir) // __batch_/__old/__staging_ sibling concats
    val f = fs(s, dir)
    val marker = new org.apache.hadoop.fs.Path(s"${dir}__batch_$batchId")
    if (f.exists(marker)) return
    val stateP = new org.apache.hadoop.fs.Path(dir)
    val oldP = new org.apache.hadoop.fs.Path(s"${dir}__old")
    if (!f.exists(stateP) && f.exists(oldP)) renameOrDie(f, oldP, stateP)
    f.delete(oldP, true)
    dropStaleStaging(s, dir)
    val merged = (if (f.exists(stateP))
        s.read.parquet(dir).unionByName(prepared)
      else prepared)
      .dropDuplicates("__id")
      .orderBy("__u", "__v").limit(k)
    val tmp = s"${dir}__staging_$batchId"
    merged.write.mode("overwrite").parquet(tmp)
    if (f.exists(stateP)) renameOrDie(f, stateP, oldP)
    renameOrDie(f, new org.apache.hadoop.fs.Path(tmp), stateP)
    f.delete(oldP, true)
    f.create(marker, true).close()
  }

  /** KMV distinct-count state over a stream: `__id` = the value string,
    * so the union-dedup IS set semantics and the state converges to the
    * k minimum distinct hashes — [[kmvFromSketchStore]] then applies the
    * same (k−1)/u₍ₖ₎ estimator as the batch
    * [[graft.operators.Sketches.kmvDistinct]]. */
  def kmvSketchIngest(rows: DataFrame, key: org.apache.spark.sql.Column,
      stateDir: String, checkpoint: String, k: Int = 256)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prepared = batch.filter(key.isNotNull)
          .select(key.cast("string").as("__id"))
          .withColumn("__u", graft.functions.HashFunctions.md5UniformOpen(col("__id")))
          .withColumn("__v", lit(null).cast("double"))
        if (!prepared.isEmpty) applySketchBatch(prepared, stateDir, batchId, k)
      }
      .start()

  /** Quantile sample state over a stream: `__id` = the row identity the
    * batch [[graft.operators.Sketches.quantileSketch]] hashes, so the
    * maintained sample equals the batch sample over everything ingested
    * (batch ≡ stream parity, pinned by spec). */
  def quantileSketchIngest(rows: DataFrame,
      rowKey: org.apache.spark.sql.Column,
      value: org.apache.spark.sql.Column,
      stateDir: String, checkpoint: String, k: Int = 512)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prepared = batch.filter(rowKey.isNotNull && value.isNotNull)
          .select(rowKey.cast("string").as("__id"),
            value.cast("double").as("__v"))
          .withColumn("__u", graft.functions.HashFunctions.md5UniformOpen(col("__id")))
          .select("__id", "__u", "__v")
        if (!prepared.isEmpty) applySketchBatch(prepared, stateDir, batchId, k)
      }
      .start()

  /** Distinct-count estimate from a [[kmvSketchIngest]] state dir —
    * the serving read: k rows in, one row out. The batch estimator's
    * m<k exactness carries over (below k the state IS the distinct
    * value set). */
  def kmvFromSketchStore(s: SparkSession, stateDir: String, k: Int = 256)
      : DataFrame =
    s.read.parquet(stateDir)
      .agg(count(lit(1)).as("__m"), max("__u").as("__uk"))
      .select(lit(k).as("k"), col("__m"),
        when(col("__m") < k, col("__m").cast("double"))
          .otherwise(lit((k - 1).toDouble) / col("__uk")).as("estimate"))

  /** Quantile estimates from a [[quantileSketchIngest]] state dir:
    * interpolated quantiles over the maintained ≤k-row sample — the
    * sample leg of [[graft.operators.Sketches.quantileSketch]] with the
    * corpus-side exact companion (by design) unavailable on a stream. */
  def quantileFromSketchStore(s: SparkSession, stateDir: String,
      probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty, "quantileFromSketchStore: probs must be non-empty")
    val ps = probs.mkString("array(", ", ", ")")
    s.read.parquet(stateDir)
      .agg(expr(s"percentile(__v, $ps)").as("__qs"))
      .select(posexplode(col("__qs")).as(Seq("__i", "estimate")))
      .select(element_at(lit(probs.toArray), col("__i") + 1).as("q"),
        col("estimate"))
      .orderBy("q")
  }

  /** Weight-proportional sample state over a stream
    * (Efraimidis-Spirakis, the streaming face of
    * [[graft.operators.Etl.weightedGroupSample]]): the n rows with the
    * smallest −ln(u)/w ARE a without-replacement sample ∝ weight of
    * everything ever seen, and the key is a pure per-row function of
    * (id, weight) — so the identical bottom-k state merge carries the
    * weighted case; state stays ≤ n rows forever. The
    * [[applySketchBatch]] duplicate-`__id` contract ("the survivor's
    * (`__u`, `__v`) is the same whichever copy wins") extends here only
    * if the weight is a stable function of the id — true for replayed
    * deliveries of the same record, the case the marker-free idempotence
    * argument needs. Zero/negative weights are excluded exactly as in
    * the batch sampler (P(pick) = 0, and the key would divide by w). */
  def weightedSampleIngest(rows: DataFrame,
      key: org.apache.spark.sql.Column,
      weight: org.apache.spark.sql.Column,
      stateDir: String, checkpoint: String, n: Int = 256)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prepared = batch
          .filter(key.isNotNull && weight.isNotNull && weight > 0)
          .select(key.cast("string").as("__id"),
            weight.cast("double").as("__v"))
          .withColumn("__u",
            -log(graft.functions.HashFunctions.md5UniformOpen(col("__id")))
              / col("__v"))
          .select("__id", "__u", "__v")
        if (!prepared.isEmpty) applySketchBatch(prepared, stateDir, batchId, n)
      }
      .start()

  /** The maintained weighted sample from a [[weightedSampleIngest]]
    * state dir, rank order = ascending E-S key (rank 1 = the draw the
    * batch sampler would emit first). */
  def weightedSampleFromStore(s: SparkSession, stateDir: String): DataFrame =
    s.read.parquet(stateDir)
      .select(col("__id").as("id"), col("__v").as("weight"), col("__u").as("key"))
      .orderBy("key", "id")

  // --- streaming conversion funnel -----------------------------------------

  /** Merge one micro-batch of events into funnel state
    * ([[funnelIngest]]). State = the retained per-user EVENT set, from
    * which [[funnelFromStore]] recomputes stages with the exact batch
    * definition ([[graft.operators.Analytics.funnelStages]]) — no
    * incremental stage math to drift from it. Retention is what makes
    * that exact AND bounded: an event survives compaction iff
    *  - it is the step-1 winner (the min-ts step-1 event; later step-1
    *    events can never matter — only the min enters the definition), or
    *  - it lies in the step-1 window (t1, t1+W] — the superset of every
    *    ts the stage recompute can read for this user, since the t2 and
    *    t3 windows nest inside it, or
    *  - it is ABOVE THE WATERMARK (max seen ts − horizon): not yet
    *    final, so a late-but-allowed earlier step-1 arrival can still
    *    shift the window onto it. Below the watermark the contract says
    *    no earlier event can arrive, so out-of-window events are final
    *    junk and are dropped.
    * With horizon ≥ the stream's allowed lateness, the maintained state
    * replays the batch funnel exactly; per-user state is bounded by the
    * W-window's event count plus the not-yet-final horizon slice.
    * Replay-idempotent WITHOUT markers: events dedup on
    * (user_id, event_type, ts), so re-merging a delivered batch is a
    * no-op (the [[applySketchBatch]] argument). Crash-safety is the
    * shared staging-swap / heal discipline. */
  def applyFunnelBatch(batch: DataFrame, stateDir: String, batchId: Long,
      step1: String, step2: String, step3: String,
      winExpr: String, horizonExpr: String): Unit = {
    val s = batch.sparkSession
    val dir = normDir(stateDir) // __old/__staging_ sibling concats
    val f = fs(s, dir)
    val stateP = new org.apache.hadoop.fs.Path(dir)
    val oldP = new org.apache.hadoop.fs.Path(s"${dir}__old")
    if (!f.exists(stateP) && f.exists(oldP)) renameOrDie(f, oldP, stateP)
    f.delete(oldP, true)
    dropStaleStaging(s, dir)
    val steps = Seq(step1, step2, step3)
    val incoming = batch
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isin(steps: _*))
      .select("user_id", "event_type", "ts")
    val all = (if (f.exists(stateP))
        s.read.parquet(dir).unionByName(incoming)
      else incoming)
      .dropDuplicates("user_id", "event_type", "ts")
    val t1 = all.filter(col("event_type") === step1)
      .groupBy("user_id").agg(min("ts").as("__t1"))
    val compacted = all
      .join(t1, Seq("user_id"), "left")
      .crossJoin(broadcast(all.agg(max("ts").as("__mx"))))
      .filter(
        (col("event_type") === step1 && col("ts") === col("__t1")) ||
        (col("__t1").isNotNull && col("ts") > col("__t1") &&
          col("ts") <= col("__t1") + expr(winExpr)) ||
        col("ts") > col("__mx") - expr(horizonExpr))
      .select("user_id", "event_type", "ts")
    val tmp = s"${dir}__staging_$batchId"
    compacted.write.mode("overwrite").parquet(tmp)
    if (f.exists(stateP)) renameOrDie(f, stateP, oldP)
    renameOrDie(f, new org.apache.hadoop.fs.Path(tmp), stateP)
    f.delete(oldP, true)
  }

  /** Continuously-maintained conversion funnel over an event stream —
    * the streaming face of [[graft.operators.Analytics.evtFunnel]].
    * `horizonExpr` is the allowed lateness (events arriving more than
    * that behind the max seen ts may be dropped, the standard watermark
    * contract); within it, [[funnelFromStore]] ≡ the batch funnel over
    * everything ever ingested. */
  def funnelIngest(rows: DataFrame, stateDir: String, checkpoint: String,
      step1: String = "view", step2: String = "click",
      step3: String = "purchase",
      winExpr: String = "INTERVAL 24 HOURS",
      horizonExpr: String = "INTERVAL 7 DAYS")
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          applyFunnelBatch(batch, stateDir, batchId,
            step1, step2, step3, winExpr, horizonExpr)
      }
      .start()

  /** Serve the funnel from a [[funnelIngest]] state dir: the retained
    * events run through the BATCH stage definition, so the two faces
    * cannot disagree by construction. */
  def funnelFromStore(s: SparkSession, stateDir: String,
      step1: String = "view", step2: String = "click",
      step3: String = "purchase",
      winExpr: String = "INTERVAL 24 HOURS"): DataFrame =
    graft.operators.Analytics.funnel(
      s.read.parquet(stateDir), step1, step2, step3, winExpr)
}
