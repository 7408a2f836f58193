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
  /** `events.ts` has shipped in two physical layouts: parquet
    * TIMESTAMP(NANOS) — which Spark's vectorized reader rejects unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` (SparkEntry.tune and every
    * session builder set it), surfacing the column as a raw nanos long — and
    * plain TIMESTAMP(MICROS), which reads as a native timestamp. This loader
    * dispatches on the read schema: a long gets truncated ns→µs (identical to
    * DuckDB's `CAST(ts AS TIMESTAMP)`, which every events oracle mirrors); a
    * timestamp passes through untouched. Type-dispatching here rather than
    * pinning one layout means a data regeneration can't break every
    * events-derived query at analysis time.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = t(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // No-zone micros: the session TZ is pinned UTC (SparkEntry.tune), so
        // the NTZ→LTZ cast is value-identical to the nanos path's
        // timestamp_micros and keeps unix_micros/window() working unchanged.
        df.withColumn("ts",
          df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "embeddings")
}
