package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is an operator from SURVEY.md §2 (or a
  * BASELINE.json extension); every SQL-expressible one has a DuckDB oracle in
  * [[oracleSql]] with IDENTICAL column names and row ordering.
  */
object SparkEntry {

  /** Session knobs the engine expects. ANSI off = the reference's lenient
    * `try: float(x) except: fallback` cast semantics (and DuckDB TRY_CAST
    * parity); AQE on for runtime re-planning at scale.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Facts.itensFact(tune(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "itens_fact" -> ((s, dir) => Facts.itensFact(tune(s), dir)),
    "pedidos_fact" -> ((s, dir) => Facts.pedidosFact(tune(s), dir)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "itens_fact" -> Facts.itensFactSql,
    "pedidos_fact" -> Facts.pedidosFactSql,
  )
}
