package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deduplication suite (filled in below). */
object Dedup {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracleSql: Map[String, String] = Map()
}
