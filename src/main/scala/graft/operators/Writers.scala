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

  /** J6 + B5 — keyed delete as a PARTITION-SCOPED anti-join rewrite with
    * count-verify (reference `api_to_gcs-checker.py:114-128`), plus the
    * checker's dry-run mode (`webhook_payload-checker.py:8,20-37`: report
    * the doomed set, touch nothing).
    *
    * Scale shape: deleting k keys from a day-partitioned 100 TB table must
    * not rewrite 100 TB. The doomed keys' partitions are located with a
    * two-column scan (keyCol + partition value — column-pruned, so parquet
    * reads only those columns and row-group stats/dictionaries skip most
    * blocks); then ONLY the affected `p_date=` directories are rewritten.
    * Swap order is write-tmp → rename-old-aside → rename-tmp-in →
    * delete-old, so at no point is a partition (or, in the unpartitioned
    * fallback, the table) absent: a crash leaves either the original or
    * both copies on disk, never neither.
    *
    * Unpartitioned tables (the dimension sinks of [[overwriteDim]]) fall
    * back to a whole-table rewrite with the same safe swap — for a dim
    * that IS the minimal rewrite.
    *
    * Returns the post-delete count of matching keys (must be 0); with
    * `dryRun=true`, returns the count of rows that WOULD be deleted and
    * performs no writes. */
  def deleteByKey(spark: SparkSession, path: String, keyCol: String,
    keys: Seq[Any], partitionCol: String = "p_date",
    dryRun: Boolean = false): Long = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val df = spark.read.parquet(path)
    val doomed = df.filter(col(keyCol).isInCollection(keys))
    if (dryRun) return doomed.count()

    // tmp/old live OUTSIDE the table root: a crash must never leave a
    // directory inside it that partition discovery would pick up
    val tableRoot = new Path(path)
    def swapIn(target: Path, tag: String, writeKeep: String => Unit): Unit = {
      val scratch = new Path(tableRoot.getParent,
        tableRoot.getName + "._rewrite_" + tag)
      val old = new Path(tableRoot.getParent, tableRoot.getName + "._old_" + tag)
      fs.delete(scratch, true); fs.delete(old, true)
      writeKeep(scratch.toString)
      fs.rename(target, old)
      fs.rename(scratch, target)
      fs.delete(old, true)
    }

    if (df.columns.contains(partitionCol)) {
      // locate: column-pruned scan → the small set of affected partitions
      val affected = doomed.select(col(partitionCol).cast("string"))
        .distinct().collect().map(_.getString(0))
      affected.foreach { pv =>
        val dir = new Path(path, s"$partitionCol=$pv")
        swapIn(dir, pv, tmp =>
          spark.read.parquet(dir.toString)
            .filter(!col(keyCol).isInCollection(keys))
            .write.parquet(tmp))
      }
    } else {
      swapIn(tableRoot, "full", tmp =>
        df.filter(!col(keyCol).isInCollection(keys)).write.parquet(tmp))
    }
    spark.read.parquet(path).filter(col(keyCol).isInCollection(keys)).count()
  }
}
