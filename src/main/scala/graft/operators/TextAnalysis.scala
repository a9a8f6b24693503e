package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis queries over `documents` (filled in below). */
object TextAnalysis {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracleSql: Map[String, String] = Map()
}
