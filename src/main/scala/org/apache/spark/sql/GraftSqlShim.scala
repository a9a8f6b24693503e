package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.{InternalRow, TableIdentifier}
import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat, CatalogTable, CatalogTableType, TemporaryViewRelation}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StructType

/** The handful of `private[sql]` internals graft's deferred-view leaf
  * needs, exposed through the standard library-shim pattern (a tiny
  * object compiled into the `org.apache.spark.sql` package — the same
  * technique public Spark connectors use). Everything here is a thin
  * forwarder; all logic lives in `graft.plans.DeferredView`.
  */
object GraftSqlShim {

  private def classicSession(s: SparkSession): classic.SparkSession =
    s.asInstanceOf[classic.SparkSession]

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows`). */
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(classicSession(s), plan)

  /** The executed plan's InternalRow RDD — the physical hand-off a
    * custom leaf exec node returns from `doExecute`. */
  def toRdd(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd

  /** Runtime strategy injection point (`spark.experimental`). */
  def experimental(s: SparkSession): ExperimentalMethods =
    classicSession(s).experimental

  /** A DataFrame's analyzed logical plan — what a stored-plan temp view
    * keeps, and what the deferred-view pass-through re-registers once a
    * build has produced the concrete frame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** The logical plan currently stored for temp view `name`, if any —
    * lets a deferred view's post-build re-registration verify the
    * catalog still holds ITS node before overwriting (a newer
    * registration under the same name must win). */
  def tempViewPlan(s: SparkSession, name: String): Option[LogicalPlan] =
    classicSession(s).sessionState.catalog.getRawTempView(name).collect {
      case TemporaryViewRelation(_, Some(plan)) => plan
    }

  /** Register `plan` as a temp view WITHOUT analyzing it (the
    * `createOrReplaceTempView` path analyzes eagerly, which would force
    * a deferred leaf to resolve its schema — and so run its builds — at
    * registration time). The stored-analyzed-plan temp-view shape is
    * what `CreateViewCommand` itself produces; the catalog-table schema
    * is left empty because resolution takes the view's output from the
    * stored plan, not the metadata (the metadata schema only feeds
    * DESCRIBE cosmetics). */
  def registerTempView(s: SparkSession, name: String,
      plan: LogicalPlan): Unit = {
    val meta = CatalogTable(
      identifier = TableIdentifier(name),
      tableType = CatalogTableType.VIEW,
      storage = CatalogStorageFormat.empty,
      schema = new StructType(),
      // TemporaryViewRelation requires this marker when a plan is stored
      // — it is exactly what we are: a view serving a stored plan
      properties = Map(CatalogTable.VIEW_STORING_ANALYZED_PLAN -> "true"))
    classicSession(s).sessionState.catalog.createTempView(name,
      TemporaryViewRelation(meta, Some(plan)), overrideIfExists = true)
  }
}
