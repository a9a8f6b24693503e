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
}
