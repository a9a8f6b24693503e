package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proves the co-located-join story SURVEY.md §7.1 promises: two tables
  * bucketed by the join key join WITHOUT a shuffle exchange on either
  * side — at 100 TB this is the difference between a sort-merge join
  * that reshuffles both inputs and one that streams co-located buckets.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key tables join with no shuffle exchange") {
    val fact = (1 to 1000).map(i => (i.toLong % 50, i.toDouble)).toDF("k", "v")
    val dim = (0L to 49L).map(k => (k, s"n$k")).toDF("k", "name")
    spark.sql("DROP TABLE IF EXISTS b_fact")
    spark.sql("DROP TABLE IF EXISTS b_dim")
    // a previous JVM's warehouse dirs survive DROP TABLE of an unknown table
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("b_fact", "b_dim").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    fact.write.bucketBy(8, "k").sortBy("k").saveAsTable("b_fact")
    dim.write.bucketBy(8, "k").sortBy("k").saveAsTable("b_dim")
    // disable broadcast + AQE locally so the plan must rely on bucketing
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val j = spark.table("b_fact").join(spark.table("b_dim"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(j.count() === 1000)
    }
    // the same join WITHOUT bucketing does shuffle (control)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val plan = fact.join(dim, "k").queryExecution.executedPlan.toString
      assert(plan.contains("Exchange hashpartitioning"))
    }
  }

  private def withConf[T](kvs: (String, String)*)(f: => T): T = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
