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
  def events(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = t(spark, sfDir, "embeddings")
}
