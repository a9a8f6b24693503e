package graft
import org.apache.spark.sql.SparkSession

/** Measurement tool (guide §1.1/§7.2): dumps `.explain("formatted")` for
  * the named queries to `plans/<round>/<query>_<suffix>.txt` so plan-shape
  * claims (Exchange counts, join strategies, PushedFilters) are committed
  * evidence, not prose. Not part of any query path; session config matches
  * [[Bench]] so the dumped plans are the benched plans.
  *
  * Usage: SPARK_GRAFT_PLAN_DIR=plans/r21 SPARK_GRAFT_PLAN_SUFFIX=before \
  *        sbt "runMain graft.PlanDump graph_ppr graph_pagerank ..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r21")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"PlanDump: not in SparkEntry.queries: ${unknown.mkString(", ")}")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // the same representation `df.explain("formatted")` prints
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val w = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt")
      try w.println(txt) finally w.close()
      val nEx = "(?m)^.*\\bExchange\\b".r.findAllIn(txt).size
      val nScan = "(?m)^.*Scan parquet".r.findAllIn(txt).size
      println(s"PLANDUMP $name exchanges=$nEx parquet_scans=$nScan " +
        s"chars=${txt.length} -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
