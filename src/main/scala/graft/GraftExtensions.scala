package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Session-extension entry point: install the graft kernel functions into
  * any SparkSession via configuration —
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   spark.sql("SELECT graft_cosine(a.embedding, b.embedding) ...")
  * }}}
  *
  * This is the library's pure-SQL surface: a cluster operator can expose
  * every kernel (vector similarity, MinHash/SimHash/shingle signatures)
  * to SQL-only users without a line of Scala. The Column-level accessors
  * in [[graft.functions.VectorExpressions]] / [[TextExpressions]] remain
  * the programmatic path; both register the same expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      /* arguments */ "", /* examples */ "", /* note */ "", /* group */ "misc_funcs",
      /* since */ "0.1.0", /* deprecated */ "", /* source */ "built-in")

  private val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", "_FUNC_(a, b) - dot product of two float/double arrays",
      es => DotProductExpr(es(0), es(1))),
    ("graft_cosine", "_FUNC_(a, b) - cosine similarity; NULL on zero norm or length mismatch",
      es => CosineSimilarityExpr(es(0), es(1))),
    ("graft_l2norm", "_FUNC_(a) - Euclidean norm of a float/double array",
      es => L2NormExpr(es.head)),
    ("graft_minhash", "_FUNC_(tokens, k) - k-slot MinHash signature of a string array",
      es => MinHashSigExpr(es(0), es(1).eval().asInstanceOf[Number].intValue())),
    ("graft_simhash", "_FUNC_(tokens) - 64-bit SimHash of a string array",
      es => SimHash64Expr(es.head)),
    ("graft_minhash_agree", "_FUNC_(sigA, sigB) - fraction of agreeing MinHash slots (Jaccard estimate)",
      es => MinHashAgreeExpr(es(0), es(1))),
    ("graft_shingle_hashes", "_FUNC_(tokens, n) - distinct word-n-gram shingle hashes",
      es => ShingleHashSetExpr(es(0), es(1).eval().asInstanceOf[Number].intValue())),
    ("graft_hyperplane_sig", "_FUNC_(vec, nbits) - sign-random-projection LSH signature",
      es => HyperplaneSigExpr(es(0), es(1).eval().asInstanceOf[Number].intValue())),
    ("graft_nearest_centroid",
      "_FUNC_(vec, ids, cents) - id of the max-cosine centroid in a literal codebook (ties -> smallest id)",
      es => NearestCentroidExpr(es(0), es(1), es(2))),
    ("graft_top_tok_count", "_FUNC_(tokens) - occurrence count of the most frequent token",
      es => TopTokenCountExpr(es.head)),
    ("graft_pq_encode",
      "_FUNC_(vec, cents, ks) - m PQ subspace codes against a flattened literal codebook",
      es => PqEncodeExpr(es(0), es(1), es(2).eval().asInstanceOf[Number].intValue())),
    ("graft_pq_adc",
      "_FUNC_(codes, lut, ks) - asymmetric-distance score of PQ codes against a query LUT",
      es => PqAdcExpr(es(0), es(1), es(2).eval().asInstanceOf[Number].intValue())),
    ("graft_minhash_hashes",
      "_FUNC_(hashes, k) - k-slot MinHash signature over pre-hashed set elements (e.g. shingle hashes)",
      es => MinHashSigFromHashesExpr(es(0), es(1).eval().asInstanceOf[Number].intValue())),
    ("graft_lsh_band_keys",
      "_FUNC_(sig, bands, rows) - 8-byte LSH band keys of a MinHash signature",
      es => LshBandKeysExpr(es(0), es(1).eval().asInstanceOf[Number].intValue(),
        es(2).eval().asInstanceOf[Number].intValue())),
    ("graft_intersect_count",
      "_FUNC_(a, b) - |A intersect B| of two bigint-array sets without materializing the intersection",
      es => ArrayLongIntersectCountExpr(es(0), es(1))),
    ("graft_pii_scrub",
      "_FUNC_(text, emailRe, ipRe, phoneRe) - struct(n_emails, n_ips, n_phones, redacted): counts on the original text, sequential replacement",
      es => PiiScrubExpr(es(0),
        es(1).eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
        es(2).eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
        es(3).eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)))

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
}
