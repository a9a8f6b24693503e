package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binary media edge (SURVEY.md §2.1 S4–S5, §2.2 P8/P16–P17).
  *
  * The reference walks an image tree with an extension whitelist
  * (`/root/reference/extract_clip_features.py:68-84`) and probes
  * `os.path.exists` per CSV row
  * (`SAM/sam_segment_clip_pipeline.py:134-137`). Both become declarative:
  * one `binaryFile` scan with a glob pushdown, and a broadcast semi-join
  * against the listing instead of N driver-side filesystem calls — the
  * per-row probe is O(N·lookup) on one machine; the join is a scan-side
  * hash probe on every executor.
  */
object BinarySource {

  val DefaultGlob = "*.{jpg,jpeg,png,gif}"

  /** Recursive whitelisted scan: (path, modificationTime, length, content).
    * The glob filters at FILE LISTING time (never reads excluded bytes);
    * `dropContent=true` keeps only metadata columns — listing a 100 TB
    * tree without pulling a byte of image data. */
  def scan(spark: SparkSession, dir: String, glob: String = DefaultGlob,
      dropContent: Boolean = false): DataFrame = {
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
    if (dropContent) df.drop("content") else df
  }

  /** Basename and stem columns for path-keyed joins (the reference joins
    * metadata to files by filename-with-extension-variants,
    * `SAM/update_elasticsearch_with_segments.py:138-162` — normalizing to
    * the stem replaces the try-each-extension probe). */
  def withPathParts(df: DataFrame): DataFrame =
    df.withColumn("filename", element_at(split(col("path"), "/"), -1))
      .withColumn("stem", regexp_replace(col("filename"), "\\.[A-Za-z0-9]+$", ""))

  /** Year/month partition columns recovered from a `.../YYYY/MM/...` layout
    * (`analyze_dataset_distribution.py:56-57`) — the reference's directory
    * convention IS hive-style partitioning by another name. */
  def withDateParts(df: DataFrame): DataFrame =
    df.withColumn("year", regexp_extract(col("path"), "/(\\d{4})/", 1).try_cast("int"))
      .withColumn("month", regexp_extract(col("path"), "/\\d{4}/(\\d{2})/", 1).try_cast("int"))

  /** S5 — existence filter: keep metadata rows whose file exists in the
    * scanned tree. Broadcast the (small) listing; semi-join on the stem. */
  def existingOnly(meta: DataFrame, listing: DataFrame, metaKey: String): DataFrame =
    meta.join(broadcast(withPathParts(listing).select("stem")),
      meta(metaKey) === col("stem"), "left_semi")
}
