package graft

import org.apache.spark.sql.SparkSession

/** Builds a SEPARATE SparkSession (same SparkContext) with
  * `graft.GraftExtensions` installed and exercises the pure-SQL surface.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("extensions install the kernel functions for pure-SQL use") {
    val sc = spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext =
      try SparkSession.builder().master(sc.master)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      finally {
        SparkSession.setDefaultSession(spark)
        SparkSession.setActiveSession(spark)
      }
    try {
      val r = ext.sql(
        """SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
                  graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                  graft_l2norm(array(3.0D, 4.0D)) AS n,
                  size(graft_minhash(array('a','b'), 16)) AS mh,
                  graft_simhash(array('a','b')) AS sh,
                  graft_minhash_agree(array(1L, 2L), array(1L, 3L)) AS agree,
                  size(graft_shingle_hashes(array('a','b','c','d'), 3)) AS nsh,
                  graft_hyperplane_sig(array(1.0D, -2.0D, 3.0D), 32) AS hp,
                  graft_nearest_centroid(array(0.9D, 0.1D),
                    array(4L, 7L),
                    array(array(1.0D, 0.0D), array(0.0D, 1.0D))) AS nc,
                  graft_top_tok_count(array('a','b','a','a')) AS ttc,
                  graft_pq_encode(array(1.0D, 0.0D),
                    array(array(1.0D), array(0.0D), array(0.0D), array(1.0D)), 2) AS pqc,
                  graft_pq_adc(array(0, 1), array(0.5D, 0.25D, 0.125D, 0.0625D), 2) AS adc,
                  size(graft_minhash_hashes(array(1L, 2L, 3L), 8)) AS mhh,
                  size(graft_lsh_band_keys(array(1L, 2L, 3L, 4L), 2, 2)) AS nbk,
                  graft_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS ic,
                  graft_pii_scrub('mail a@b.co now',
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                    '\\+\\d{7,15}') AS pii
        """).head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(r.getDouble(1) - 11.0) < 1e-12)
      assert(math.abs(r.getDouble(2) - 5.0) < 1e-12)
      assert(r.getInt(3) === 16)
      assert(r.getLong(4) !== 0L)
      assert(math.abs(r.getDouble(5) - 0.5) < 1e-12)
      assert(r.getInt(6) === 2)
      assert(r.getLong(8) === 4L, "nearest centroid id via pure SQL")
      assert(r.getLong(9) === 3L, "top token count via pure SQL")
      // m=2 subspaces of 1 dim, ks=2: vec [1,0] → codes (argmin-L2) = [0, 0]
      assert(r.getSeq[Int](10) === Seq(0, 0), "PQ encode via pure SQL")
      // ADC: code 0 of subspace 0 → lut(0)=0.5; code 1 of subspace 1 → lut(2+1)=0.0625
      assert(math.abs(r.getDouble(11) - 0.5625) < 1e-12, "PQ ADC via pure SQL")
      assert(r.getInt(12) === 8, "minhash-over-hashes via pure SQL")
      assert(r.getInt(13) === 2, "LSH band keys via pure SQL")
      assert(r.getLong(14) === 2L, "intersect count via pure SQL")
      val pii = r.getStruct(15)
      assert(pii.getLong(0) === 1L && pii.getString(3) === "mail <EMAIL> now",
        "PII scrub via pure SQL")
      // DESCRIBE FUNCTION surfaces the injected usage docs
      val desc = ext.sql("DESCRIBE FUNCTION graft_cosine")
        .collect().map(_.getString(0)).mkString("\n")
      assert(desc.contains("cosine"))
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
