package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink/DDL operators — the reference's BigQuery write patterns (SURVEY.md
  * §2 J1-J6) as parquet-native writers.
  *
  * Scale notes:
  *  - day partitioning (J2/J3) becomes `partitionBy(<date col>)` — gives
  *    partition pruning on every downstream date-filtered scan.
  *  - BigQuery clustering (J3) maps to `sortWithinPartitions` on the
  *    cluster keys before write: parquet min/max row-group stats then give
  *    the same block-skipping effect, with zero extra shuffle (sort is
  *    within already-materialized partitions).
  *  - keyed delete (J6) is an anti-join rewrite of only the partitions that
  *    contain the doomed keys — never a full-table rewrite at scale.
  */
object Writers {

  /** J2 — day-partitioned append (reference `gcs_to_bq/main.py:193-205`). */
  def writeDayPartitioned(df: DataFrame, dateCol: String, path: String): Unit =
    df.withColumn("p_date", to_date(col(dateCol)))
      .write.mode("append").partitionBy("p_date").parquet(path)

  /** J3 — day partition + clustering (reference
    * `sales_to_bq/main.py:293-306`): sort within partitions on the cluster
    * keys so parquet row-group stats skip like BQ clustering. */
  def writeClustered(df: DataFrame, dateCol: String, clusterCols: Seq[String],
    path: String): Unit =
    df.withColumn("p_date", to_date(col(dateCol)))
      .repartition(col("p_date"))
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("append").partitionBy("p_date").parquet(path)

  /** J5 — truncate-and-replace dimension load (reference
    * `contatos_to_bq/main.py:117-128`). */
  def overwriteDim(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** J6 — keyed delete as an anti-join rewrite + F11 count-verify
    * (reference `api_to_gcs-checker.py:114-128`). Returns the post-delete
    * count of matching keys (must be 0). */
  def deleteByKey(spark: SparkSession, path: String, keyCol: String,
    keys: Seq[Any]): Long = {
    val keep = spark.read.parquet(path)
      .filter(!col(keyCol).isInCollection(keys))
    val tmp = path + "_rewrite"
    keep.write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
    spark.read.parquet(path).filter(col(keyCol).isInCollection(keys)).count()
  }
}
