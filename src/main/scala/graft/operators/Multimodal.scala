package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal binary-column plumbing (filled in below). */
object Multimodal {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracleSql: Map[String, String] = Map()
}
