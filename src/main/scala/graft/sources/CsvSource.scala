package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV edge: the reference's metadata ingest re-expressed as one
  * declarative scan (SURVEY.md §2.1 S1–S3, §2.2 P3–P5).
  *
  * The reference reads `utf-8-sig` CSVs (BOM-aware DictReader,
  * `/root/reference/upload_features_to_elasticsearch.py:78-79`), probes
  * diacritic headers (`:83-86`), fills sentinels
  * (`clean_and_fill_na.py:4-17`) and null-safe-casts every field
  * (`:95-114`) row by row in Python. Here all of that happens inside the
  * CSV scan's projection: header normalization is a rename map, sentinel
  * and cast handling are Column expressions, so the whole edge is a
  * single codegen'd pass that parallelizes per input split at any scale.
  */
object CsvSource {

  /** `'NA'`, empty and the reference's location sentinels become real SQL
    * NULL at the edge (the engine keeps NULL, not sentinel strings). */
  val DefaultSentinels: Seq[String] = Seq("NA", "", "Konum Yok", "Konum İşaretlenmedi")

  /** Normalize a raw header to the engine's snake_case ASCII form —
    * the Turkish-diacritic headers of the reference's CSV
    * (`İdari Bölgeler` → `idari_bolgeler`). */
  def normalizeHeader(h: String): String = {
    val folded = java.text.Normalizer.normalize(
        h.replace("ı", "i").replace("İ", "I"), java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}", "")
    folded.trim.toLowerCase.replaceAll("[^a-z0-9]+", "_").replaceAll("^_|_$", "")
  }

  /** Read a header CSV with BOM tolerance and normalized column names.
    * Multiline/quoted cells on; schema inferred unless given (at lake
    * scale always pass a schema — inference is an extra full read). */
  def read(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val base = spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("encoding", "UTF-8") // Spark's CSV reader strips a UTF-8 BOM itself
    val df = schema.fold(base.option("inferSchema", "true"))(s => base.schema(s)).csv(path)
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, normalizeHeader(c)))
  }

  /** Sentinel strings → NULL for the given (or all string) columns. */
  def nullifySentinels(df: DataFrame, cols: Seq[String] = Nil,
      sentinels: Seq[String] = DefaultSentinels): DataFrame = {
    val targets = if (cols.nonEmpty) cols
      else df.schema.fields.filter(_.dataType.typeName == "string").map(_.name).toSeq
    targets.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(trim(col(c)).isin(sentinels: _*), lit(null)).otherwise(col(c)))
    }
  }

  /** The reference's `safe_int`: empty/'NA' → NULL, else int-via-float
    * (so "12.0" parses) — ANSI-safe via try_cast. */
  def safeInt(c: Column): Column = safeFloat(c).cast("long")
  def safeFloat(c: Column): Column = nullif(trim(c), lit("NA")).try_cast("double")

  /** Multi-format date fallback chain — the reference's Elasticsearch
    * mapping `yyyy-MM-dd HH:mm:ss||yyyy-MM-dd||epoch_millis` for
    * `yayinlanma_tarihi` (`upload_features_to_elasticsearch.py:40`): try
    * the full datetime, then the bare date, then an epoch-millis integer;
    * anything else is NULL, never an error. Each format is gated by a
    * shape regex so a non-matching string short-circuits to NULL instead
    * of paying `try_to_timestamp`'s exception-driven failure path — on a
    * mixed-format column most rows fail most formats, so the guard is
    * the difference between regex-speed and exception-speed per miss
    * (the guards accept exactly what the strict CORRECTED parser would:
    * zero-padded, full-width fields). The millis branch caps at 15
    * digits: beyond ~9.2·10¹⁵ ms `timestamp_millis` overflows the micros
    * range with an ArithmeticException rather than NULL, which would
    * break the never-an-error contract on e.g. an epoch-NANOS string. */
  def parseDate(c: Column): Column = coalesce(
    try_to_timestamp(when(c.rlike("^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}$"), c),
      lit("yyyy-MM-dd HH:mm:ss")),
    try_to_timestamp(when(c.rlike("^\\d{4}-\\d{2}-\\d{2}$"), c), lit("yyyy-MM-dd")),
    timestamp_millis(when(c.rlike("^-?[0-9]{1,15}$"), c).try_cast("long")))

  /** CSV sink with header, one directory per table (S3). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
