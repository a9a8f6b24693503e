package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
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
    * blocks. Jaccard of distinct shingle sets = int/int division → exact. */
  def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    val sh = blocked(s, d)
      .withColumn("sh", shingles(tokens(col("text")), 3))
      .select(col("doc_id"), col("blk"), col("sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("blk"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("blk"), col("sh").as("sh_b"))
    a.join(b, Seq("blk")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jac"))
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
    val sigs = blocked(s, d)
      .withColumn("sig", minhashSignature(array_distinct(tokens(col("text"))), 64))
      .select(col("doc_id"), col("blk"), col("sig"))
    val bands = sigs
      .select(col("doc_id"), col("sig"), col("blk"),
        explode(lshBandKeys(col("sig"), 16, 4)).as("bk"))
      .select(col("doc_id"), col("sig"),
        concat_ws("_", col("blk"), col("bk")).as("band"))
    val a = bands.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"), col("band"))
    val b = bands.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"), col("band"))
    a.join(b, Seq("band")).filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sig_a", "sig_b").distinct()
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), p => p)).cast("double") / 64.0)
      .filter(col("est_jaccard") >= 0.5)
      .select("doc_a", "doc_b", "est_jaccard")
      .orderBy(desc("est_jaccard"), asc("doc_a"), asc("doc_b")).limit(50)
  }

  /** SimHash near-dup (no oracle: xxhash64-based). 64-bit token SimHash,
    * 4 × 16-bit bands as candidate buckets (a pair within Hamming ≤ 3 of
    * each other must agree on ≥1 band by pigeonhole), then exact Hamming
    * distance on candidates. */
  def simhash(s: SparkSession, d: String): DataFrame = {
    val sh = blocked(s, d)
      .withColumn("sim", simhash64(tokens(col("text"))))
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
         FROM pair ORDER BY jac DESC, doc_a, doc_b LIMIT 20""",
    "dedup_embedding" ->
      """WITH pair AS (
           SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS cos
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
         SELECT vec_a, vec_b, round(cos, 6) AS cos
         FROM (SELECT * FROM pair ORDER BY cos DESC, vec_a, vec_b LIMIT 20)
         ORDER BY round(cos, 6) DESC, vec_a, vec_b""")
}
