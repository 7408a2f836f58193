package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet tables (TESTDATA.md).
  *
  * Domain mapping (SURVEY.md §7.2): `orders` ≈ pedidos header, `lineitem` ≈
  * itens, `part` ≈ produto, `customer` ≈ contatos, `supplier/nation/region`
  * for join depth, `events` for streaming, `documents`/`embeddings` for the
  * LLM-pipeline extension operators.
  *
  * Scale notes: these are plain `spark.read.parquet` scans — Catalyst pushes
  * filters + prunes columns into the parquet reader, so every query that
  * composes on top of these inherits pushdown for free. At cluster scale the
  * same code reads a partitioned table directory; nothing here assumes a
  * single file.
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "orders")
  def part(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "part")
  def customer(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. Sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (SparkEntry.tune and every
    * session builder do) so the nanos read as raw long; this loader truncates
    * to micros — identical to DuckDB's `CAST(ts AS TIMESTAMP)` ns→µs
    * truncation, which every events oracle mirrors. The conf lives at session
    * build, not here: a table loader mutating global session state would
    * silently retype every later nanos-parquet read in the session.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  def documents(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "embeddings")
}
