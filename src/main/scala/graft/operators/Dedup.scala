package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextExpressions
import graft.functions.TextFunctions._
import graft.functions.VectorExpressions.fusedCosine

/** Deduplication suite for training-data pipelines: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, and embedding near-dup.
  *
  * The scale discipline throughout: NEVER all-pairs over the corpus.
  * Every candidate generation is blocked — by content key (LSH band /
  * SimHash band) and/or by cheap metadata (lang, length bucket) — so the
  * quadratic step only runs inside buckets. At 100 TB the band-key
  * groupBy is one shuffle of (key, doc_id) pairs, and bucket sizes bound
  * the join fan-out (the classic MinHash-LSH layout).
  *
  * `dedup_exact`, `dedup_ngram_jaccard` and `dedup_embedding` are
  * DuckDB-oracle-checked; the MinHash/SimHash queries hash with xxhash64
  * (no DuckDB equivalent) and are declared without an oracle per the
  * driver contract (rows-only check).
  */
object Dedup {

  /** Exact dedup via content fingerprint: every doc with its md5 and the
    * size of its duplicate group (hash-groupBy — one shuffle on the 16-byte
    * digest, not the document text). */
  def exact(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("fp")
    Tables.documents(s, d)
      .select(col("doc_id"), exactFingerprint(col("text")).as("fp"))
      .withColumn("dup_count", count(lit(1)).over(w))
      .orderBy("doc_id")
  }

  /** Cheap blocking key: same language, same 100-char length bucket.
    * Near-dups almost always agree on both; the quadratic pair step then
    * runs per block instead of per corpus. */
  private def blocked(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("blk", concat_ws("_", col("lang"), expr("n_chars DIV 100")))

  /** n-gram (3-shingle) Jaccard near-dup: top-20 most similar pairs within
    * blocks, restricted to pairs sharing ≥1 shingle. Jaccard of distinct
    * shingle sets = int/int division → exact.
    *
    * Computed as an INVERTED-INDEX join, not a block-wise nested loop:
    * explode distinct shingles, self-join on (block, shingle), count
    * matches per pair → |A∩B|, then jac = inter/(|A|+|B|-inter). The
    * per-pair work is one counter bump instead of an O(|A|·|B|) array
    * intersection, and the shuffle key is the shingle — exactly the
    * layout that scales this to a 100 TB corpus. */
  def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    // Shingle identity only matters as a join key, so shingles live as
    // 64-bit hashes end to end (one native pass, no shingle strings):
    // same distinct/intersection counts w.h.p., ~3× less shuffle volume.
    val ex = blocked(s, d)
      .select(col("doc_id"), col("blk"),
        TextExpressions.shingleHashes(s, tokens(col("text")), 3).as("sh"))
      .select(col("doc_id"), col("blk"), size(col("sh")).as("n"),
        explode(col("sh")).as("g"))
    // Aliased self-join: both sides canonicalize to the same subplan, so
    // the shingle scan + (blk, g) exchange are computed once and reused.
    ex.as("x").join(ex.as("y"),
        col("x.blk") === col("y.blk") && col("x.g") === col("y.g") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double")).as("jac"))
      .orderBy(desc("jac"), asc("doc_a"), asc("doc_b")).limit(20)
  }

  /** Embedding near-dup baseline: brute-force pairwise cosine, top-20.
    * The oracle-checkable ground truth that `knn_ivf`-style blocking
    * approximates at scale. */
  def embeddingNearDup(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("vb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", fusedCosine(s, col("va"), col("vb")))
      .orderBy(desc("cos"), asc("vec_a"), asc("vec_b")).limit(20)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos"))
      .orderBy(desc("cos"), asc("vec_a"), asc("vec_b"))
  }

  /** MinHash+LSH near-dup candidates (no oracle: xxhash64-based).
    * token-set MinHash, 64 permutations, 16 bands × 4 rows:
    * shingle→minhash→band→bucket-join, estimated Jaccard = fraction of
    * agreeing signature slots. Band keys are salted with the block key so
    * bucket sizes stay bounded on skewed corpora. */
  def minhashLsh(s: SparkSession, d: String): DataFrame = {
    // Exact duplicates are collapsed FIRST (identical token set ⇒ identical
    // signature): a dup cluster of size c would otherwise share all 16
    // bands and emit 16·c²/2 candidate rows — on a duplicate-heavy corpus
    // that quadratic blow-up, not the hashing, is the bottleneck. Exact
    // dup pairs are `dedup_exact`'s output; this query reports near-dups
    // among exact-distinct documents, with the representative's cluster
    // size carried as `n_docs_a/b`. Standard production-LSH layout.
    // No array_distinct before signing: min over a multiset equals min
    // over its distinct set, so MinHash is dedup-invariant for free.
    val sigs = blocked(s, d)
      .withColumn("sig", TextExpressions.minhashSig(s, tokens(col("text")), 64))
      .groupBy(col("blk"), col("sig"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_docs"))
    // Band self-join as an ALIASED self-join: both sides canonicalize to
    // the identical (scan → sig → explode → shuffle-by-band) subplan, so
    // ReuseExchange computes the signature scan and the band shuffle ONCE
    // — re-attaching sigs to candidate pairs afterwards would instead
    // recompute the signature scan per join. Uniq'ing above bounds the
    // sig payload riding this shuffle to one row per distinct text.
    val bands = sigs
      .select(col("doc_id"), col("n_docs"), col("sig"), col("blk"),
        explode(lshBandKeys(col("sig"), 16, 4)).as("bk"))
      .select(col("doc_id"), col("n_docs"), col("sig"),
        concat_ws("_", col("blk"), col("bk")).as("band"))
    bands.as("x").join(bands.as("y"), col("x.band") === col("y.band"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      // Score per matching band-row with the codegen'd agreement kernel
      // (cheap: 64 long compares), then distinct on the narrow result —
      // a pair agreeing on m bands collapses m scored rows to one.
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        TextExpressions.minhashAgree(s, col("x.sig"), col("y.sig")).as("est_jaccard"),
        col("x.n_docs").as("n_docs_a"), col("y.n_docs").as("n_docs_b"))
      .filter(col("est_jaccard") >= 0.5)
      .distinct()
      .orderBy(desc("est_jaccard"), asc("doc_a"), asc("doc_b")).limit(50)
  }

  /** SimHash near-dup (no oracle: xxhash64-based). 64-bit token SimHash,
    * 4 × 16-bit bands as candidate buckets (a pair within Hamming ≤ 3 of
    * each other must agree on ≥1 band by pigeonhole), then exact Hamming
    * distance on candidates. */
  def simhash(s: SparkSession, d: String): DataFrame = {
    val sh = blocked(s, d)
      .withColumn("sim", TextExpressions.simhash64(s, tokens(col("text"))))
      .select(col("doc_id"), col("blk"), col("sim"))
    val bandCols = (0 until 4).map(i =>
      struct(lit(i).as("bi"),
        shiftright(col("sim"), i * 16).bitwiseAND(lit(0xFFFFL)).as("bv")))
    val bands = sh.select(col("doc_id"), col("sim"), col("blk"),
        explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id"), col("sim"),
        concat_ws("_", col("blk"), col("bs.bi"), col("bs.bv")).as("band"))
    val a = bands.select(col("doc_id").as("doc_a"), col("sim").as("sim_a"), col("band"))
    val b = bands.select(col("doc_id").as("doc_b"), col("sim").as("sim_b"), col("band"))
    a.join(b, Seq("band")).filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sim_a", "sim_b").distinct()
      .withColumn("hamming", hamming64(col("sim_a"), col("sim_b")).cast("long"))
      .filter(col("hamming") <= 16)
      .select("doc_a", "doc_b", "hamming")
      .orderBy(asc("hamming"), asc("doc_a"), asc("doc_b")).limit(30)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> exact,
    "dedup_ngram_jaccard" -> ngramJaccard,
    "dedup_embedding" -> embeddingNearDup,
    "dedup_minhash_lsh" -> minhashLsh,
    "dedup_simhash" -> simhash)

  private val shSql =
    """CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
       ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
       END"""

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT doc_id, md5(text) AS fp,
           count(*) OVER (PARTITION BY md5(text)) AS dup_count
         FROM documents ORDER BY doc_id""",
    "dedup_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, lang || '_' || (n_chars // 100) AS blk,
           string_split(lower(text), ' ') AS toks FROM documents),
         sh AS (SELECT doc_id, blk, list_distinct($shSql) AS sh FROM t),
         pair AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS inter,
             len(a.sh) AS na, len(b.sh) AS nb
           FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id)
         SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / nullif(CAST(na + nb - inter AS DOUBLE), 0.0) AS jac
         FROM pair WHERE inter > 0
         ORDER BY jac DESC, doc_a, doc_b LIMIT 20""",
    "dedup_embedding" ->
      """WITH pair AS (
           SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS cos
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
         SELECT vec_a, vec_b, round(cos, 6) AS cos
         FROM (SELECT * FROM pair ORDER BY cos DESC, vec_a, vec_b LIMIT 20)
         ORDER BY round(cos, 6) DESC, vec_a, vec_b""")
}
