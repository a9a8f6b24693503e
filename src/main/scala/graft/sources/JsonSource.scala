package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** JSON feature-file edge (SURVEY.md §2.1 S6–S7).
  *
  * The reference hands off between pipeline stages via one JSON file per
  * image (`/root/reference/extract_clip_features.py:116-127`,
  * `SAM/sam_segment_clip_pipeline.py:444-475`) and re-globs them later
  * (`upload_features_to_elasticsearch.py:142-158`). In the engine, JSON
  * exists only at the edge: reads take an EXPLICIT schema (schemaless JSON
  * inference is a second full pass over 100 TB and types drift per file),
  * writes go through `df.write.json`. Internal hand-offs stay Parquet.
  */
object JsonSource {

  /** Schema of the reference's per-image feature JSON
    * (`extract_clip_features.py:116-127`: path, filename, 512-float
    * features, dimension). */
  val featureSchema: StructType = StructType(Seq(
    StructField("image_path", StringType),
    StructField("filename", StringType),
    StructField("features", ArrayType(FloatType, containsNull = false)),
    StructField("feature_dimension", IntegerType)))

  /** Schema of the per-image segment+tags JSON
    * (`SAM/sam_segment_clip_pipeline.py:444-475`). */
  val segmentSchema: StructType = StructType(Seq(
    StructField("filename", StringType),
    StructField("segments", ArrayType(StructType(Seq(
      StructField("segment_id", IntegerType),
      StructField("area", IntegerType),
      StructField("bbox", ArrayType(FloatType, containsNull = false)),
      StructField("stability_score", FloatType),
      StructField("features", ArrayType(FloatType, containsNull = false)),
      StructField("tags", ArrayType(StructType(Seq(
        StructField("tag", StringType),
        StructField("confidence", FloatType)))))))))))

  /** Read a directory of JSON records with a declared schema; corrupt
    * records are quarantined into `_corrupt_record` instead of failing
    * the job (PERMISSIVE — at scale a bad file must not kill the scan). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
