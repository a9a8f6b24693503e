package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The hot-tier graph serve path ([[Search.graphSearchServeById]]) must
  * be ROW-FOR-ROW the distributed beam walk ([[Search.graphSearchIndexed]])
  * — same entry ring, same tiebreaks, same cosine bit pattern, same
  * tombstone semantics — because serving latency must never buy a
  * different answer. */
class GraphServeSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def distributed(idx: String, qid: Long, k: Int): Seq[(Long, Double)] =
    Search.graphSearchIndexed(spark, idx,
        Tables.embeddings(spark, d).filter(col("vec_id") === qid)
          .select(col("embedding").as("qv")),
        k = k, beam = 32, hops = 3, buckets = 32)
      .as[(Long, Double)].collect().toSeq

  private def served(idx: String, qid: Long, k: Int): Seq[(Long, Double)] =
    Search.graphSearchServeById(spark, idx, qid, k = k, beam = 32, hops = 3,
        buckets = 32)
      .as[(Long, Double)].collect().toSeq

  test("hot-tier walk ≡ distributed walk on the clean layout (several query ids)") {
    val idx = s"${Retrieval.graphIdxDir(spark, d)}/idx"
    Seq(0L, 7L, 42L, 123L).foreach { qid =>
      assert(served(idx, qid, 10) === distributed(idx, qid, 10),
        s"hot-tier/distributed divergence for query id $qid")
    }
  }

  test("hot-tier walk ≡ distributed walk on the TOMBSTONED layout (path rerouting included)") {
    val idx = s"${Retrieval.graphDelIdxDir(spark, d)}/idx"
    Seq(0L, 42L).foreach { qid =>
      val got = served(idx, qid, 10)
      assert(got === distributed(idx, qid, 10))
      assert(!got.map(_._1).exists(Retrieval.GraphDeletedIds.contains),
        "a recalled id must never be served")
    }
  }

  test("unknown query id returns the empty relation, like the distributed empty query frame") {
    val idx = s"${Retrieval.graphIdxDir(spark, d)}/idx"
    assert(served(idx, -1L, 10).isEmpty)
  }

  test("a takedown AFTER the hot image loaded is served immediately (stamp reload)") {
    // scratch copy so the shared per-JVM layouts stay pristine
    val clean = s"${Retrieval.graphIdxDir(spark, d)}/idx"
    val tmp = java.nio.file.Files.createTempDirectory("graft_serve_del").toString
    def cp(src: java.io.File, dst: java.io.File): Unit =
      if (src.isDirectory) {
        dst.mkdirs(); src.listFiles().foreach(f => cp(f, new java.io.File(dst, f.getName)))
      } else java.nio.file.Files.copy(src.toPath, dst.toPath)
    cp(new java.io.File(clean), new java.io.File(s"$tmp/idx"))
    val idx = s"$tmp/idx"
    val before = served(idx, 0L, 10) // loads (and caches) the hot image
    val victim = before.head._1
    Search.deleteFromGraphIndex(Seq(victim).toDF("id"), col("id"), idx)
    val after = served(idx, 0L, 10)
    assert(!after.map(_._1).contains(victim),
      "the hot image must reload on the layout stamp and honor the new tombstone")
    assert(after === distributed(idx, 0L, 10),
      "post-takedown hot-tier walk must still equal the distributed walk")
  }
}
