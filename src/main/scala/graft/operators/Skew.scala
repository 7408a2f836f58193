package graft.operators

import graft.{Exprs, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for 100 TB shapes. A handful of hot keys (here:
  * 5 event types over the whole stream) would funnel entire partitions to
  * single reducers; salting splits each hot key across `nSalts` reducers
  * with a map-side-combinable partial aggregate, then merges. AQE's skew
  * handling covers joins automatically; explicit salting covers
  * aggregations and is deterministic/plan-stable.
  */
object Skew {

  /** Two-stage salted aggregation: stage 1 groups by (key, salt) — salt
    * derived deterministically from a high-cardinality column so rows of a
    * hot key spread evenly; stage 2 merges partials by key. */
  def saltedCountSum(df: DataFrame, key: Column, saltSource: Column,
    value: Column, nSalts: Int): DataFrame =
    df.select(key.as("k"), pmod(hash(saltSource), lit(nSalts)).as("salt"),
      value.as("v"))
      .groupBy("k", "salt")
      .agg(count(lit(1)).as("pn"),
        sum(floor(col("v") * 1e4 + 0.5).cast("long")).as("ps")) // integer grid
      .groupBy("k")
      .agg(sum(col("pn")).cast("long").as("n"),
        (sum(col("ps")).cast("double") / 1e4).as("sum_value"))

  /** Salted aggregation over the event stream by (skewed) event type. */
  def eventsSaltedAgg(spark: SparkSession, sfDir: String): DataFrame =
    saltedCountSum(Tables.events(spark, sfDir),
      col("event_type"), col("event_id"), col("value"), nSalts = 16)
      .select(col("k").as("event_type"), col("n"), col("sum_value"))
      .orderBy("event_type")

  /** The oracle is the UNsalted aggregate — proving the two-stage plan is
    * semantics-preserving. */
  val eventsSaltedAggSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000 AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
}
