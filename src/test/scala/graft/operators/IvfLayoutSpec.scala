package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Substantiates knnIvf's scale claim (Retrieval scaladoc): when the IVF
  * cluster assignment is materialized as a WRITE-TIME PARTITION COLUMN,
  * probing is literal partition pruning — the probe's cluster filter
  * reaches the scan as a PartitionFilter and unprobed clusters' files are
  * never opened.
  */
class IvfLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("writeIvfIndex + knnIvfIndexed: at-rest index matches in-plan knnIvf, probe prunes") {
    val d = "/root/testdata/sf0.001"
    val e = graft.Tables.embeddings(spark, d)
    val cents = Retrieval.labelCentroids(spark, d)
      .select(col("label").cast("long").as("cid"), col("c"))
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_api").toString
    Search.writeIvfIndex(e, col("embedding"), cents, s"$dir/idx")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val indexed = Search.knnIvfIndexed(spark, s"$dir/idx", col("embedding"),
      cents, q, nprobe = 3, k = 10, tie = col("vec_id"))
    // the probe's cluster filter reaches the scan as a partition filter
    val planStr = indexed.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters:") && planStr.contains("cluster"),
      s"probe must prune partitions, not filter rows:\n$planStr")
    // and the at-rest path answers exactly like the in-plan path
    val a = indexed.select("vec_id", "score").as[(Long, Double)].collect().toSeq
    val b = Search.knnIvf(e, col("vec_id"), col("embedding"), cents, q,
        nprobe = 3, k = 10)
      .select("vec_id", "score").as[(Long, Double)].collect().toSeq
    assert(a === b)
  }

  test("cluster-partitioned layout: probe filter prunes partitions at the scan") {
    val d = "/root/testdata/sf0.001"
    val e = graft.Tables.embeddings(spark, d)
    // cluster assignment = the IVF write path (here: label as the cluster)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    e.withColumn("cluster", col("label").cast("long"))
      .write.partitionBy("cluster").parquet(s"$dir/emb")

    val lake = spark.read.parquet(s"$dir/emb")
    val probed = lake.filter(col("cluster").isin(1L, 2L, 3L))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("cluster"),
      s"cluster filter must be a partition filter:\n$plan")
    // pruning is real: the probed scan reads fewer files than the full scan.
    // Metrics must be read from the SAME plan instance that executed, with
    // AQE off so collect() runs the inspected plan directly.
    val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
        df.collect()
        df.queryExecution.executedPlan.collectLeaves().map(_.metrics
          .get("numFiles").map(_.value).getOrElse(0L)).sum
      }
      val probedFiles = filesRead(lake.filter(col("cluster").isin(1L, 2L, 3L)))
      val allFiles = filesRead(spark.read.parquet(s"$dir/emb"))
      assert(probedFiles > 0 && probedFiles < allFiles,
        s"pruned scan reads fewer files: $probedFiles < $allFiles")
    } finally spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
    // and the pruned corpus still answers the kNN correctly
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val top = Search.knnBrute(probed, col("embedding"), q, k = 5, tie = col("vec_id"))
    assert(top.count() === 5)
  }
}
