package graft.operators

import graft.{Exprs, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over the event stream and the order history —
  * the cohort/segmentation family a sales pipeline's consumers ask of the
  * warehouse (BASELINE.json extension surface): weekly retention cohorts and
  * RFM (recency/frequency/monetary) customer segmentation.
  *
  * Scale notes: both are two-aggregate plans. [[retentionCohorts]] shuffles
  * (user, week) pairs — already deduplicated map-side — then the cohort
  * matrix (weeks² cells) is tiny at any corpus size. [[rfmSegments]]
  * aggregates orders per customer (map-side combined), and the quintile
  * windows rank the CUSTOMER-grain table; at 100 TB the exact ntile over a
  * global sort becomes the two-stage form every top-k here uses, or an
  * approx-quantile cut (`approx_percentile` on the three metrics) — same
  * segments up to boundary ties, constant memory.
  */
object Analytics {

  /** Weekly retention cohorts: users grouped by first-active week, each
    * cell = how many of them were active again n weeks later. Two
    * aggregates and a broadcast-back join of the per-user cohort; the
    * week arithmetic is integer days-since-epoch division so both engines
    * bucket identically (Monday weeks, matching `date_trunc('week')`). */
  def retentionCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    // Monday-start week index: epoch day 0 (1970-01-01) was a Thursday,
    // so shift by 3 before dividing into 7-day buckets
    def weekIdx(d: org.apache.spark.sql.Column) =
      floor((datediff(d, lit("1970-01-01").cast("date")) + 3) / 7).cast("long")
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), weekIdx(to_date(col("ts"))).as("week"))
      .distinct()
    val cohort = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
    ev.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_n"))
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort_week", "week_n")
  }

  val retentionCohortsSql: String =
    """WITH ev AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor((datediff('day', DATE '1970-01-01',
      |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) + 3) / 7) AS BIGINT) AS week
      |  FROM events),
      |c AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1)
      |SELECT c.cohort_week, ev.week - c.cohort_week AS week_n,
      |  count(DISTINCT ev.user_id) AS n_active
      |FROM ev JOIN c ON ev.user_id = c.user_id
      |GROUP BY 1, 2 ORDER BY cohort_week, week_n""".stripMargin

  /** RFM segmentation: per customer, days since last order (R), order
    * count (F), grid-summed lifetime value (M); quintile scores by exact
    * `ntile(5)` under a TOTAL order (metric, then customer key — ties can
    * never make the buckets engine-dependent), and the standard composite
    * segment label. Recency anchors on the dataset's max order date so the
    * query is deterministic (no wall clock). */
  def rfmSegments(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val base = o
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max("o_orderdate").as("last_order"),
        count(lit(1)).as("frequency"),
        Exprs.gsum(col("o_totalprice")).as("monetary"))
      .join(broadcast(o.agg(max("o_orderdate").as("anchor"))))
      .select(col("custkey"),
        datediff(col("anchor"), col("last_order")).cast("long").as("recency_days"),
        col("frequency"), col("monetary"))
    val scored = base
      // R: smaller is better → rank ascending so bucket 1 = most recent
      .withColumn("r_score", ntile(5).over(
        Window.orderBy(col("recency_days"), col("custkey"))).cast("long"))
      .withColumn("f_score", ntile(5).over(
        Window.orderBy(col("frequency").desc, col("custkey"))).cast("long"))
      .withColumn("m_score", ntile(5).over(
        Window.orderBy(col("monetary").desc, col("custkey"))).cast("long"))
    scored.select(col("custkey"), col("recency_days"), col("frequency"),
      col("monetary"), col("r_score"), col("f_score"), col("m_score"),
      when(col("r_score") <= 2 && col("f_score") <= 2 && col("m_score") <= 2,
        "champion")
        .when(col("r_score") >= 4 && col("f_score") <= 2, "at_risk")
        .when(col("r_score") <= 2 && col("f_score") >= 4, "new")
        .otherwise("regular").as("segment"))
      .orderBy("custkey")
  }

  /** The 100 TB form of [[rfmSegments]]'s scoring: quintile CUTS from one
    * `approx_percentile` aggregate (t-digest — mergeable, constant memory,
    * one map-side-combined pass) broadcast back to the customer table, each
    * score a per-row comparison against 4 cut values. No global sort, no
    * single-partition window — the exact/approx pair is the same
    * trade ScaleSpec pins for count-distinct and quantiles, and the
    * agreement bound is asserted in OperatorsSpec. */
  def rfmSegmentsApprox(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val base = o
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max("o_orderdate").as("last_order"),
        count(lit(1)).as("frequency"),
        Exprs.gsum(col("o_totalprice")).as("monetary"))
      .join(broadcast(o.agg(max("o_orderdate").as("anchor"))))
      .select(col("custkey"),
        datediff(col("anchor"), col("last_order")).cast("long").as("recency_days"),
        col("frequency"), col("monetary"))
    val qs = array(Seq(0.2, 0.4, 0.6, 0.8).map(lit): _*)
    val cuts = base.agg(
      percentile_approx(col("recency_days"), qs, lit(10000)).as("rc"),
      percentile_approx(col("frequency"), qs, lit(10000)).as("fc"),
      percentile_approx(col("monetary"), qs, lit(10000)).as("mc"))
    // ascending metric (recency: smaller = better) → score 1 + #cuts below
    // the value; descending metrics (frequency/monetary: bigger = better)
    // → 1 + #cuts above the value
    def asc(v: org.apache.spark.sql.Column, c: String) =
      (lit(1) + size(filter(col(c), x => x < v))).cast("long")
    def desc(v: org.apache.spark.sql.Column, c: String) =
      (lit(1) + size(filter(col(c), x => x > v))).cast("long")
    base.crossJoin(broadcast(cuts))
      .select(col("custkey"), col("recency_days"), col("frequency"),
        col("monetary"),
        asc(col("recency_days"), "rc").as("r_score"),
        desc(col("frequency"), "fc").as("f_score"),
        desc(col("monetary"), "mc").as("m_score"))
      .orderBy("custkey")
  }

  val rfmSegmentsSql: String =
    """WITH base AS (
      |  SELECT o_custkey AS custkey,
      |    datediff('day', max(o_orderdate),
      |      (SELECT max(o_orderdate) FROM orders)) AS recency_days,
      |    count(*) AS frequency,
      |    CAST(SUM(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
      |      / 10000 AS monetary
      |  FROM orders GROUP BY 1),
      |s AS (
      |  SELECT *,
      |    CAST(ntile(5) OVER (ORDER BY recency_days, custkey) AS BIGINT) AS r_score,
      |    CAST(ntile(5) OVER (ORDER BY frequency DESC, custkey) AS BIGINT) AS f_score,
      |    CAST(ntile(5) OVER (ORDER BY monetary DESC, custkey) AS BIGINT) AS m_score
      |  FROM base)
      |SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days,
      |  frequency, monetary, r_score, f_score, m_score,
      |  CASE WHEN r_score <= 2 AND f_score <= 2 AND m_score <= 2 THEN 'champion'
      |       WHEN r_score >= 4 AND f_score <= 2 THEN 'at_risk'
      |       WHEN r_score <= 2 AND f_score >= 4 THEN 'new'
      |       ELSE 'regular' END AS segment
      |FROM s ORDER BY custkey""".stripMargin
}
