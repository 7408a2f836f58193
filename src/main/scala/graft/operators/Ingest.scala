package graft.operators

import graft.Exprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch raw-zone sources (SURVEY.md §2 A2/A3 batch form, B1-B4, D10):
  * the reference's bucket scans (`backfill/api_to_gcs-backfill.py:128-136`,
  * `data_validation/api_to_gcs-checker.py:20-25`) as parquet/JSON directory
  * scans with file-provenance columns.
  *
  * Scale notes: one `spark.read.json` over the zone directory — listing is
  * distributed, schema is explicit (no inference pass), and
  * `input_file_name()` gives per-row provenance without a second scan.
  */
object Ingest {

  /** A2 — batch scan of a JSON raw zone with blob-name provenance. */
  def readRawZone(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .withColumn("blob_name", input_file_name())

  /** D10 — derive the work-set keys from the blob-name convention. */
  def withFilenameKeys(df: DataFrame): DataFrame =
    df.withColumn("dados_id", Exprs.fileDadosId(col("blob_name")))
      .withColumn("data_type", Exprs.fileDataType(col("blob_name")))
      .withColumn("file_ts", Exprs.fileTimestamp(col("blob_name")))
      .withColumn("file_uuid", Exprs.fileUuid(col("blob_name")))

  /** A2+E2 — the backfill's processed-id set: distinct ids parsed from the
    * zone listing (`backfill/api_to_gcs-backfill.py:128-136`). */
  def processedIdSet(df: DataFrame): DataFrame =
    withFilenameKeys(df).select("dados_id").where(col("dados_id") =!= "").distinct()
}
