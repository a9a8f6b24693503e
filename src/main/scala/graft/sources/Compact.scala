package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction for parquet table directories (SURVEY.md §2.1
  * S9/S10 adjacent — table maintenance).
  *
  * The reference never needs this (its store is Elasticsearch), but any
  * lake-backed deployment of the engine does: per-trigger streaming
  * upserts ([[graft.streaming.Streams.upsertByKey]]) and fine-grained
  * batch writes accumulate files far smaller than a parquet row group,
  * and at 100 TB a scan's task count — and the NameNode/listing load —
  * is driven by FILE COUNT, not bytes. Compaction is the standard
  * OPTIMIZE/rewrite maintenance pass (Delta OPTIMIZE, Iceberg
  * rewrite_data_files) expressed with plain Spark + an atomic swap.
  *
  * Sizing comes from real file metadata (one driver-side listing —
  * metadata-scale, not data-scale): output file count =
  * ceil(total bytes / targetBytes). The rewrite is a round-robin
  * `repartition(n)` — one shuffle that both balances output sizes and
  * restores scan parallelism; `coalesce` would be shuffle-free but chains
  * the read parallelism to the (tiny-file) input splits and skews output
  * sizes. Durability follows the staging discipline of
  * [[graft.streaming.Streams.upsertByKey]]: the compacted copy is fully
  * written to a sibling staging directory before the target is replaced,
  * so a crash mid-compact never leaves a half-table.
  */
object Compact {

  /** Result of one compaction run. */
  final case class CompactStats(
      filesBefore: Long, bytesBefore: Long, filesAfter: Long, bytesAfter: Long)

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** HDFS-semantics rename reports failure by returning false; an
    * unchecked swap rename would fall through to `delete(old)` and
    * destroy the only durable table copy — abort instead (the staging
    * tree survives; the next run self-heals). */
  private def renameOrDie(f: org.apache.hadoop.fs.FileSystem,
      src: Path, dst: Path): Unit =
    if (!f.rename(src, dst))
      throw new java.io.IOException(s"rename failed: $src -> $dst")

  /** Data files under `path` (non-recursive; parquet leaf dir), ignoring
    * _SUCCESS/._* bookkeeping. */
  private def dataFiles(spark: SparkSession, path: String): Seq[(String, Long)] = {
    val f = fs(spark, path)
    f.listStatus(new Path(path)).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(s => (s.getPath.getName, s.getLen))
  }

  /** Rewrite the parquet directory at `path` into ≈`targetBytes` files.
    * No-op (returns current stats, touches nothing) when the directory
    * already has ≤ the target file count — an idempotent maintenance
    * pass, safe on a schedule. Returns before/after stats.
    *
    * Swap discipline: the compacted copy is fully durable in a sibling
    * staging dir, then the swap is rename(path → __old) · rename(staging
    * → path) · delete(__old). Compared to delete-then-rename, the
    * table-path-missing window shrinks from a recursive delete (O(files)
    * on HDFS/local, and worse on object stores) to two O(1) metadata
    * renames, and EVERY intermediate state keeps a complete durable copy
    * — a crash between the renames strands readers but loses nothing,
    * and the next compact (or any caller) self-heals by renaming __old
    * back. `onStep` is a test seam for injecting crashes between steps. */
  def compactParquet(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024,
      onStep: String => Unit = _ => ()): CompactStats = {
    val f = fs(spark, path)
    val pathP = new Path(path)
    val oldP = new Path(s"${path}__compact_old")
    val tmpP = new Path(s"${path}__compact_staging")
    // self-heal a crash between the swap renames: the previous table is
    // intact at __old — put it back before touching anything else
    if (!f.exists(pathP) && f.exists(oldP)) renameOrDie(f, oldP, pathP)
    f.delete(tmpP, true) // leftover staging from an interrupted run
    f.delete(oldP, true) // leftover __old from a crash after the swap
    val before = dataFiles(spark, path)
    val bytes = before.map(_._2).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    if (before.size <= nOut)
      return CompactStats(before.size, bytes, before.size, bytes)
    spark.read.parquet(path).repartition(nOut)
      .write.mode("overwrite").parquet(tmpP.toString) // durable before any move
    onStep("staged")
    renameOrDie(f, pathP, oldP)
    onStep("vacated")
    renameOrDie(f, tmpP, pathP)
    onStep("swapped")
    f.delete(oldP, true)
    val after = dataFiles(spark, path)
    CompactStats(before.size, bytes, after.size, after.map(_._2).sum)
  }

  /** Partition-wise compaction for a `partitionBy(partCol)` layout: each
    * partition directory compacts independently (and only when over its
    * file-count target), so a table with one hot partition does not
    * rewrite its cold ones — the O(touched)-not-O(table) principle of
    * [[graft.streaming.Streams.upsertByKeyPartitioned]] applied to
    * maintenance. Returns (partitionDir → stats) for partitions visited. */
  def compactPartitioned(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Map[String, CompactStats] = {
    val f = fs(spark, path)
    f.listStatus(new Path(path)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map { s =>
        s.getPath.getName -> compactParquet(spark, s.getPath.toString, targetBytes)
      }.toMap
  }
}
