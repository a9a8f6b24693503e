package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Suite-wide physical-plan audit over EVERY named query: the README's
  * "never corpus×corpus" claim, enforced mechanically. A `crossJoin`
  * whose small side isn't broadcast plans as `CartesianProductExec` —
  * n·m partition pairs, the shape that detonates at 100 TB no matter how
  * fast it looks at test scale. Broadcast forms plan as
  * `BroadcastNestedLoopJoin` and are allowed (bounded by the broadcast
  * side's size).
  *
  * AQE is disabled for the audit so the STATIC planner's full plan is
  * visible (AQE can only remove exchanges at runtime, never introduce a
  * cartesian, so auditing the static plan is the conservative check).
  * Plans are built, not executed — the audit covers all queries in
  * seconds. */
class PlanAuditSpec extends SparkSpec {

  test("no named query plans a non-broadcast cartesian product") {
    val d = "/root/testdata/sf0.001"
    val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, q) =>
          val plan = q(spark, d).queryExecution.executedPlan
          val cartesians = plan.collect { case c: CartesianProductExec => c }
          if (cartesians.isEmpty) None else Some(name)
      }
      assert(offenders.isEmpty,
        s"queries with an unbroadcast cartesian product: $offenders")
    } finally spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
  }

  test("knnLsh: no shuffle exchange carries the embedding vectors") {
    // Candidate dedup must move 8-byte ids only — the corpus vectors
    // reach scoring through a broadcast semi-join probe, never an
    // exchange (Search.knnLsh's documented scale contract).
    val d = "/root/testdata/sf0.001"
    // static plan: AQE wraps the tree in AdaptiveSparkPlanExec, hiding
    // the exchanges from a plain collect
    val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try SparkEntry.queries("knn_lsh")(spark, d).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.nonEmpty, "expected the id-dedup exchange to exist")
    shuffles.foreach { e =>
      val arrayCols = e.output.filter(
        _.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
      assert(arrayCols.isEmpty,
        s"shuffle carries array columns ${arrayCols.map(_.name)} — vectors must not cross an exchange")
    }
  }
}
