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
  * aggregates orders per customer (map-side combined), then ranks the
  * CUSTOMER-grain table with the distributed [[rangedRunningSum]] form
  * (range partitions + broadcast offsets — no single-partition window);
  * [[rfmSegmentsApprox]] trades exact quintiles for one `approx_percentile`
  * pass when even three range shuffles are too dear — same segments up to
  * boundary ties, constant memory.
  */
object Analytics {

  /** Distributed running sum over a TOTAL order — the scale-safe replacement
    * for `Window.orderBy(...)` with no `partitionBy` (which moves every row
    * to one partition; AQE never rewrites that shape). Standard two-stage
    * form: range-partition on the order (so range i holds globally-ordered
    * rows before range i+1), running-sum locally per range, then add the
    * broadcast sum of all earlier ranges. The per-range totals are
    * #shuffle-partitions rows, so the offset self-join is trivially tiny at
    * any data size. Result is boundary-invariant: wherever the sampled range
    * splits fall, local-cum + earlier-range-offset is the global running
    * sum — PROVIDED every consumer sees the SAME boundaries. That proviso
    * is load-bearing: the window and the per-range totals are separate
    * consumers of the ranged exchange, and Spark plans each branch its own
    * exchange whose `RangePartitioner` samples boundaries independently
    * (exchange reuse does NOT deduplicate them — observed three live range
    * exchanges in one plan, and at 16 shuffle partitions the branches
    * genuinely diverged: rid labels disagreed and row numbers overran n).
    * The lazy `localCheckpoint` pins the diamond to ONE RDD, so the range
    * sampling runs exactly once and every consumer reads identical rid
    * labels; lineage above the grain table is truncated as a side effect.
    * The checkpoint materializes the GRAIN table (part/customer — orders
    * of magnitude under the fact), the same trade the PQ codebook chain
    * makes.
    *
    * With `value = lit(1L)` this is a distributed `row_number`, from which
    * `ntile` is pure arithmetic — see [[rfmSegments]].
    */
  private[graft] def rangedRunningSum(df: DataFrame, out: String,
      value: org.apache.spark.sql.Column,
      order: org.apache.spark.sql.Column*): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.repartitionByRange(n, order: _*)
      .withColumn("__rid", spark_partition_id())
      .localCheckpoint(false) // lazy: one RDD, boundaries sampled ONCE
    val local = ranged.withColumn("__cum",
      sum(value).over(Window.partitionBy("__rid").orderBy(order: _*)))
    val totals = ranged.groupBy("__rid").agg(sum(value).as("__rtot"))
    val offsets = totals.as("a")
      .join(totals.as("b"), col("b.__rid") < col("a.__rid"), "left_outer")
      .groupBy(col("a.__rid").as("__rid"))
      .agg(coalesce(sum(col("b.__rtot")), lit(0L)).as("__off"))
    local.join(broadcast(offsets), "__rid")
      .withColumn(out, col("__off") + col("__cum"))
      .drop("__rid", "__cum", "__off")
  }

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
    * `ntile(5)` semantics under a TOTAL order (metric, then customer key —
    * ties can never make the buckets engine-dependent), and the standard
    * composite segment label. Recency anchors on the dataset's max order
    * date so the query is deterministic (no wall clock).
    *
    * The scoring never runs a single-partition window: each rank is a
    * distributed row_number ([[rangedRunningSum]] of 1s over the metric
    * order), and the bucket is the SQL NTILE arithmetic applied to
    * (row_number, total count) — the first n%5 buckets take ceil(n/5)
    * rows — which is bit-identical to `ntile(5) OVER (ORDER BY …)` in
    * both engines, so the oracle keeps the window form. */
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
    // NTILE(k) from a 1-based global row number rn and total n:
    // q = n div k, r = n mod k; buckets 1..r hold q+1 rows, the rest q.
    // All-long operands; the one `/` runs on doubles exact to 2^53 rows.
    def ntile5(rn: org.apache.spark.sql.Column,
               n: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val q = floor(n / lit(5))
      val r = pmod(n, lit(5)).cast("long")
      val qq = greatest(q, lit(1L)) // n<5: else-branch unreachable; keep its divisor nonzero
      when(rn <= r * (q + 1), floor((rn - 1) / (q + 1)) + 1)
        .otherwise(r + floor((rn - 1 - r * (q + 1)) / qq) + 1)
        .cast("long")
    }
    val cnt = broadcast(base.agg(count(lit(1)).as("__n")))
    val ranked = Seq[(String, Seq[org.apache.spark.sql.Column])](
      // R: smaller is better → rank ascending so bucket 1 = most recent
      ("__r_rn", Seq(col("recency_days"), col("custkey"))),
      ("__f_rn", Seq(col("frequency").desc, col("custkey"))),
      ("__m_rn", Seq(col("monetary").desc, col("custkey")))
    ).foldLeft(base) { case (df, (out, ord)) =>
      rangedRunningSum(df, out, lit(1L), ord: _*)
    }
    val scored = ranked.crossJoin(cnt)
      .withColumn("r_score", ntile5(col("__r_rn"), col("__n")))
      .withColumn("f_score", ntile5(col("__f_rn"), col("__n")))
      .withColumn("m_score", ntile5(col("__m_rn"), col("__n")))
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
    // cuts are exactly rank-⌈p·n⌉ (= the oracle's quantile_disc) only while
    // the GK sketch retains every sample, i.e. n ≤ accuracy. 1e6 covers the
    // engine's verify/bench scales AND the sf1 soak (149,990 customers —
    // the r10 sweep tripped the old 1e5 bound exactly as designed) at
    // ~1 MB/metric of retained samples; past it the guard fails loudly
    // and the caller raises the knob. The point of the guard is that the
    // sketch must never compress SILENTLY — drifted cuts with no signal.
    val accuracy = 1000000
    val cuts = base.agg(
      percentile_approx(col("recency_days"), qs, lit(accuracy)).as("rc"),
      percentile_approx(col("frequency"), qs, lit(accuracy)).as("fc"),
      percentile_approx(col("monetary"), qs, lit(accuracy)).as("mc"),
      count(lit(1)).as("__n"))
    // ascending metric (recency: smaller = better) → score 1 + #cuts below
    // the value; descending metrics (frequency/monetary: bigger = better)
    // → 1 + #cuts above the value
    def asc(v: org.apache.spark.sql.Column, c: String) =
      (lit(1) + size(filter(col(c), x => x < v))).cast("long")
    def desc(v: org.apache.spark.sql.Column, c: String) =
      (lit(1) + size(filter(col(c), x => x > v))).cast("long")
    base.crossJoin(broadcast(cuts))
      // The oracle equivalence relies on the Greenwald–Khanna sketch
      // retaining EVERY sample (n ≤ accuracy ⇒ cuts are exactly
      // rank-⌈p·n⌉, matching quantile_disc). Past that the sketch
      // compresses and the cuts can drift with no signal — fail loudly at
      // the boundary instead; the caller's fix is raising `accuracy`.
      .where(assert_true(col("__n") <= lit(accuracy),
        lit(s"rfm_segments_approx: customer count exceeds " +
          s"percentile_approx accuracy=$accuracy; the quantile cuts would " +
          "no longer be exact — raise the accuracy parameter")).isNull)
      .select(col("custkey"), col("recency_days"), col("frequency"),
        col("monetary"),
        asc(col("recency_days"), "rc").as("r_score"),
        desc(col("frequency"), "fc").as("f_score"),
        desc(col("monetary"), "mc").as("m_score"))
      .orderBy("custkey")
  }

  /** ABC (Pareto) classification of parts by revenue: rank parts by
    * lifetime extended-price revenue, take the running share of the total,
    * and bucket A (first 80%), B (to 95%), C (tail) — the stock-control
    * view every sales warehouse derives from its item fact.
    *
    * Determinism: revenue lives on the 1e-4 grid as a LONG, the running
    * total is LONG arithmetic (exact, order-fixed by the total
    * (revenue desc, part) sort), and the single double division happens
    * once at the end — both engines see identical operands. Scale: the
    * running sum is [[rangedRunningSum]] — range-partitioned local sums
    * plus broadcast per-range offsets, never a single-partition window —
    * so the part-grain table (billions of rows at a 100 TB catalog)
    * stays distributed end to end. */
  def abcParts(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey").as("part"))
      .agg(sum(floor(col("l_extendedprice") * lit(1e4) + lit(0.5d))
        .cast("long")).as("rev_grid"))
    val tot = rev.agg(sum("rev_grid").as("tot"))
    val cum = rangedRunningSum(rev, "cum",
        col("rev_grid"), col("rev_grid").desc, col("part"))
      .crossJoin(broadcast(tot))
      .withColumn("cum_share", Exprs.r4(col("cum").cast("double") / col("tot")))
    cum.select(col("part"),
      (col("rev_grid").cast("double") / lit(1e4)).as("revenue"),
      col("cum_share"),
      when(col("cum_share") <= 0.80d, "A")
        .when(col("cum_share") <= 0.95d, "B")
        .otherwise("C").as("abc_class"))
      .orderBy("part")
  }

  val abcPartsSql: String =
    """WITH rev AS (
      |  SELECT l_partkey AS part,
      |    SUM(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS rev_grid
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT SUM(rev_grid) AS tot FROM rev),
      |c AS (
      |  SELECT part, rev_grid,
      |    floor(CAST(SUM(rev_grid) OVER (ORDER BY rev_grid DESC, part
      |      ROWS UNBOUNDED PRECEDING) AS DOUBLE) / tot.tot * 10000 + 0.5) / 10000
      |      AS cum_share
      |  FROM rev, tot)
      |SELECT part, CAST(rev_grid AS DOUBLE) / 10000 AS revenue, cum_share,
      |  CASE WHEN cum_share <= 0.80 THEN 'A'
      |       WHEN cum_share <= 0.95 THEN 'B'
      |       ELSE 'C' END AS abc_class
      |FROM c ORDER BY part""".stripMargin

  /** Trailing-window z-score anomaly detection on the daily revenue
    * series: each day scored against the mean/std of the `win` days
    * before it (the day itself excluded, so a spike can't mask itself).
    *
    * Determinism: daily revenue is floored onto whole currency units as a
    * LONG; rolling Σx and Σx² are LONG window sums (exact, and Σx² stays
    * well under 2⁶³ at warehouse scale — ~9e6-unit days square to 8e13);
    * the mean/variance/z arithmetic then runs the textually identical
    * double formula in both engines. At petabyte scale the unit grid for
    * Σx² coarsens (or variance moves to Welford-in-double — anomaly
    * thresholds tolerate approximate variance; the oracle grid does not,
    * which is why the exact-LONG form is the checked one). Scale: the
    * series is day-grain — thousands of rows from any corpus size; all
    * the heavy lifting is the one map-side-combined daily aggregate. */
  def revenueAnomaly(spark: SparkSession, sfDir: String, win: Int = 7): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(floor(col("o_totalprice") + lit(0.5d)).cast("long")).as("units"),
        Exprs.gsum(col("o_totalprice")).as("revenue"))
    val w = Window.orderBy("day").rowsBetween(-win, -1)
    val stats = daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum("units").over(w))
      .withColumn("s2", sum(col("units") * col("units")).over(w))
      .filter(col("n") === win)
    val mean = col("s").cast("double") / col("n")
    val variance =
      (col("s2").cast("double") - col("s").cast("double") * col("s") / col("n")) / col("n")
    stats.select(col("day"), col("revenue"),
      Exprs.r4(mean).as("trail_mean"),
      when(variance > 0d,
        Exprs.r4((col("units").cast("double") - mean) / sqrt(variance)))
        .as("z"),
      when(variance > 0d,
        when(abs((col("units").cast("double") - mean) / sqrt(variance)) > 2d,
          lit(1L)).otherwise(lit(0L)))
        .as("is_anomaly"))
      .orderBy("day")
  }

  val revenueAnomalySql: String =
    """WITH daily AS (
      |  SELECT o_orderdate AS day,
      |    SUM(CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS units,
      |    CAST(SUM(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
      |      / 10000 AS revenue
      |  FROM orders GROUP BY 1),
      |st AS (
      |  SELECT day, units, revenue,
      |    count(*) OVER w AS n, SUM(units) OVER w AS s,
      |    SUM(units * units) OVER w AS s2
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      |z AS (
      |  SELECT day, revenue,
      |    CAST(s AS DOUBLE) / n AS mean,
      |    (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n AS variance,
      |    CAST(units AS DOUBLE) AS x
      |  FROM st WHERE n = 7)
      |SELECT day, revenue,
      |  floor(mean * 10000 + 0.5) / 10000 AS trail_mean,
      |  CASE WHEN variance > 0
      |    THEN floor((x - mean) / sqrt(variance) * 10000 + 0.5) / 10000 END AS z,
      |  CASE WHEN variance > 0 THEN
      |    CASE WHEN abs((x - mean) / sqrt(variance)) > 2 THEN 1 ELSE 0 END
      |  END AS is_anomaly
      |FROM z ORDER BY day""".stripMargin

  /** Time-series gap filling — densify the daily revenue series onto a
    * complete calendar axis (every day between the first and last order,
    * missing days explicit zero rows). Downstream window math
    * ([[revenueAnomaly]]'s trailing stats, any moving average) silently
    * mis-windows on a sparse series: "7 preceding ROWS" is only "7 days"
    * when every day has a row. The axis is generated FROM the data
    * (min/max aggregate → `sequence` → explode), not a table.
    *
    * Scale shape: the fact collapses to day grain map-side first; the
    * generated axis is calendar-sized (thousands of rows from any corpus),
    * so the left join broadcasts. Nothing corpus-sized ever shuffles. */
  def gapFill(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n_orders"),
        Exprs.gsum(col("o_totalprice")).as("revenue"))
    val axis = Tables.orders(spark, sfDir)
      .agg(min("o_orderdate").as("lo"), max("o_orderdate").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    axis.join(broadcast(daily), Seq("day"), "left")
      .select(col("day"), coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("revenue"), lit(0d)).as("revenue"),
        col("n_orders").isNull.as("is_gap"))
      .orderBy("day")
  }

  val gapFillSql: String =
    """WITH daily AS (
      |  SELECT o_orderdate AS day, count(*) AS n_orders,
      |    CAST(SUM(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
      |      / 10000 AS revenue
      |  FROM orders GROUP BY 1),
      |axis AS (
      |  SELECT CAST(unnest(generate_series(
      |    (SELECT min(o_orderdate) FROM orders),
      |    (SELECT max(o_orderdate) FROM orders),
      |    INTERVAL 1 DAY)) AS DATE) AS day)
      |SELECT a.day, coalesce(d.n_orders, 0) AS n_orders,
      |  coalesce(d.revenue, 0) AS revenue,
      |  d.n_orders IS NULL AS is_gap
      |FROM axis a LEFT JOIN daily d USING (day)
      |ORDER BY day""".stripMargin

  /** Market-basket association rules from co-purchase pair counts:
    * support, confidence and lift for every ordered rule A→B whose pair
    * count clears `minPairs`, top-k by lift. The directed form of
    * [[Facts.copurchaseTopk]] — counts come from the same
    * distinct-(order, part) self-join, item counts and the basket total
    * are broadcast back, so the only large shuffle is the pair count
    * itself (bounded by the same Σ basket² analysis as the pair miner).
    *
    * Determinism: all counts are LONGs; each ratio is one double division
    * (identical operands both sides) rounded onto the 1e-4 grid; the
    * top-k order is total (lift grid desc, then rule key). */
  def basketRules(spark: SparkSession, sfDir: String,
                  minPairs: Long = 5, k: Int = 50): DataFrame = {
    val it = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("okey"), col("l_partkey")).distinct()
    val nOrders = it.agg(countDistinct("okey").as("n_orders"))
    val itemN = it.groupBy(col("l_partkey").as("part"))
      .agg(count(lit(1)).as("n_item"))
    val pairs = it.select(col("okey"), col("l_partkey").as("a"))
      .join(it.select(col("okey"), col("l_partkey").as("b")), "okey")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairs)
    val rules = pairs.select(col("a").as("antecedent"), col("b").as("consequent"), col("n_pair"))
      .unionAll(pairs.select(col("b").as("antecedent"), col("a").as("consequent"), col("n_pair")))
    rules
      .join(broadcast(itemN.select(col("part").as("antecedent"), col("n_item").as("n_ant"))), "antecedent")
      .join(broadcast(itemN.select(col("part").as("consequent"), col("n_item").as("n_con"))), "consequent")
      .crossJoin(broadcast(nOrders))
      .select(col("antecedent"), col("consequent"), col("n_pair"),
        Exprs.r4(col("n_pair").cast("double") / col("n_orders")).as("support"),
        Exprs.r4(col("n_pair").cast("double") / col("n_ant")).as("confidence"),
        Exprs.r4(col("n_pair").cast("double") * col("n_orders")
          / (col("n_ant").cast("double") * col("n_con"))).as("lift"))
      .orderBy(col("lift").desc, col("antecedent"), col("consequent"))
      .limit(k)
  }

  val basketRulesSql: String =
    """WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |no AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM it),
      |itn AS (SELECT l_partkey AS part, count(*) AS n_item FROM it GROUP BY 1),
      |p AS (
      |  SELECT a.l_partkey AS a, b.l_partkey AS b, count(*) AS n_pair
      |  FROM it a JOIN it b ON a.l_orderkey = b.l_orderkey
      |   AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 5),
      |r AS (SELECT a AS antecedent, b AS consequent, n_pair FROM p
      |      UNION ALL SELECT b, a, n_pair FROM p)
      |SELECT r.antecedent, r.consequent, r.n_pair,
      |  floor(CAST(r.n_pair AS DOUBLE) / no.n_orders * 10000 + 0.5) / 10000
      |    AS support,
      |  floor(CAST(r.n_pair AS DOUBLE) / ia.n_item * 10000 + 0.5) / 10000
      |    AS confidence,
      |  floor(CAST(r.n_pair AS DOUBLE) * no.n_orders
      |    / (CAST(ia.n_item AS DOUBLE) * ic.n_item) * 10000 + 0.5) / 10000
      |    AS lift
      |FROM r
      |JOIN itn ia ON ia.part = r.antecedent
      |JOIN itn ic ON ic.part = r.consequent, no
      |ORDER BY lift DESC, antecedent, consequent LIMIT 50""".stripMargin

  /** Item-item collaborative-filtering neighbors: for every part, the k
    * most-similar parts by cosine over binary order-co-occurrence vectors —
    * sim(a,b) = n_ab / √(n_a·n_b) — the "customers also bought" view that
    * turns [[basketRules]]'s co-purchase counts into a per-item
    * recommendation list.
    *
    * Scale shape: same order-local pair self-join as the pair miner
    * (intermediate bounded by Σ basket², never corpus²), `minPairs` prunes
    * the singleton-pair noise tail BEFORE the per-item ranking, and the
    * top-k is a part-partitioned row_number window (WindowGroupLimit pushes
    * the cut map-side). Item counts join the pair table at part grain —
    * broadcast here, shuffle equi-join when a 100 TB catalog outgrows the
    * threshold.
    *
    * Determinism: counts are exact LONGs; each similarity is one double
    * division of a LONG by a correctly-rounded `sqrt` of a LONG product
    * (identical operands both engines) snapped onto a 1e-6 grid, and the
    * rank order (grid desc, neighbor) is total. */
  def itemNeighbors(spark: SparkSession, sfDir: String,
                    k: Int = 5, minPairs: Long = 2): DataFrame = {
    val it = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("okey"), col("l_partkey")).distinct()
    val itemN = it.groupBy(col("l_partkey").as("part"))
      .agg(count(lit(1)).as("n_item"))
    val pairs = it.select(col("okey"), col("l_partkey").as("a"))
      .join(it.select(col("okey"), col("l_partkey").as("b")), "okey")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairs)
    val directed = pairs
      .select(col("a").as("part"), col("b").as("neighbor"), col("n_pair"))
      .unionAll(pairs
        .select(col("b").as("part"), col("a").as("neighbor"), col("n_pair")))
    val sim = directed
      .join(broadcast(itemN.select(col("part"), col("n_item").as("n_a"))), "part")
      .join(broadcast(itemN.select(col("part").as("neighbor"),
        col("n_item").as("n_b"))), "neighbor")
      .withColumn("sim_grid", floor(col("n_pair").cast("double")
        / sqrt(col("n_a").cast("double") * col("n_b")) * lit(1e6) + lit(0.5d))
        .cast("long"))
    val w = Window.partitionBy("part")
      .orderBy(col("sim_grid").desc, col("neighbor"))
    sim.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("part"), col("rank"), col("neighbor"),
        (col("sim_grid").cast("double") / lit(1e6)).as("cosine"))
      .orderBy("part", "rank")
  }

  val itemNeighborsSql: String =
    """WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |itn AS (SELECT l_partkey AS part, count(*) AS n_item FROM it GROUP BY 1),
      |p AS (
      |  SELECT a.l_partkey AS a, b.l_partkey AS b, count(*) AS n_pair
      |  FROM it a JOIN it b ON a.l_orderkey = b.l_orderkey
      |   AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |d AS (SELECT a AS part, b AS neighbor, n_pair FROM p
      |      UNION ALL SELECT b, a, n_pair FROM p),
      |s AS (
      |  SELECT d.part, d.neighbor,
      |    CAST(floor(CAST(d.n_pair AS DOUBLE)
      |      / sqrt(CAST(ia.n_item AS DOUBLE) * ib.n_item) * 1000000 + 0.5)
      |      AS BIGINT) AS sim_grid
      |  FROM d
      |  JOIN itn ia ON ia.part = d.part
      |  JOIN itn ib ON ib.part = d.neighbor),
      |r AS (
      |  SELECT part, neighbor, sim_grid,
      |    CAST(row_number() OVER (PARTITION BY part
      |      ORDER BY sim_grid DESC, neighbor) AS BIGINT) AS rank
      |  FROM s)
      |SELECT part, rank, neighbor, CAST(sim_grid AS DOUBLE) / 1000000 AS cosine
      |FROM r WHERE rank <= 5 ORDER BY part, rank""".stripMargin

  /** Revenue rollup by (year, month) with subtotal rows — `ROLLUP`
    * grouping sets, the drill-down cube slice every sales dashboard reads.
    * Spark expands rollup into grouping sets over ONE scan with partial
    * aggregation per set (an Expand node — rows ×3 here, the standard
    * cost); null grouping keys mark subtotals identically in both engines,
    * and the sort pins NULLS FIRST explicitly because the engines' default
    * null order differs. */
  def salesRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        col("o_totalprice"))
    o.rollup("yr", "mo")
      .agg(count(lit(1)).as("n_orders"), Exprs.gsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("yr").asc_nulls_first, col("mo").asc_nulls_first)
  }

  val salesRollupSql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  CAST(month(o_orderdate) AS BIGINT) AS mo,
      |  count(*) AS n_orders,
      |  CAST(SUM(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
      |    / 10000 AS revenue
      |FROM orders
      |GROUP BY ROLLUP (yr, mo)
      |ORDER BY yr ASC NULLS FIRST, mo ASC NULLS FIRST""".stripMargin

  /** Revenue CUBE over (supplier-region, year): all four grouping sets —
    * cells, both one-dimension margins, and the grand total — from one
    * scan (Expand ×4). The rollup's drill-down ladder answers "break
    * yearly down by month"; the cube answers margin questions in BOTH
    * directions, which is what a region-by-year dashboard slices. Same
    * determinism story as [[salesRollup]]: grid LONG sums, pinned null
    * order. */
  def salesCube(spark: SparkSession, sfDir: String): DataFrame = {
    val j = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)
        .select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)
        .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("region"),
        year(col("o_orderdate")).cast("long").as("yr"), col("o_totalprice"))
    // Two resolution traps here (Spark 4.1.2), both tripped only because the
    // cube input is a multi-Dataset join: `cube("region", "yr")`'s string
    // overload resolves through Dataset.col and attaches plan-id metadata
    // that DetectAmbiguousSelfJoin later rejects as ambiguous — the
    // `functions.col` overload resolves lazily by name and is safe; and the
    // post-cube sort must reference the aggregate's own outputs (select,
    // then name-based sort), not `col(...)` captured from the input. The
    // rollup sibling never hits either because its input is a plain scan.
    j.cube(col("region"), col("yr"))
      .agg(count(lit(1)).as("n_orders"), Exprs.gsum(col("o_totalprice")).as("revenue"))
      .select("region", "yr", "n_orders", "revenue")
      .orderBy(asc_nulls_first("region"), asc_nulls_first("yr"))
  }

  val salesCubeSql: String =
    """WITH j AS (
      |  SELECT r.r_name AS region, CAST(year(o_orderdate) AS BIGINT) AS yr,
      |    o.o_totalprice
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey)
      |SELECT region, yr, count(*) AS n_orders,
      |  CAST(SUM(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
      |    / 10000 AS revenue
      |FROM j
      |GROUP BY CUBE (region, yr)
      |ORDER BY region ASC NULLS FIRST, yr ASC NULLS FIRST""".stripMargin

  /** Region × year revenue matrix — `pivot` with a FIXED value list (the
    * five TPC-H regions). A pivot with explicit values never scans to
    * discover columns (the dynamic form collects distinct values to the
    * driver first — a scale anti-pattern) and compiles to one aggregate
    * with a conditional-sum per column, which is exactly how the oracle
    * states it (`FILTER (WHERE ...)`) — same shape, same grid. Dims
    * broadcast; the fact never shuffles before the aggregate. */
  def salesPivot(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"))
    val nat = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_regionkey"))
    val reg = Tables.region(spark, sfDir)
      .select(col("r_regionkey"), col("r_name"))
    val joined = o
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(year(col("o_orderdate")).cast("long").as("yr"),
        col("r_name"), col("o_totalprice"))
    joined.groupBy("yr")
      .pivot("r_name", Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"))
      .agg(Exprs.gsum(col("o_totalprice")))
      .select(col("yr"), col("AFRICA").as("africa"), col("AMERICA").as("america"),
        col("ASIA").as("asia"), col("EUROPE").as("europe"),
        col("MIDDLE EAST").as("middle_east"))
      .orderBy("yr")
  }

  val salesPivotSql: String =
    """WITH j AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, r.r_name,
      |    o.o_totalprice
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey)
      |SELECT yr,
      |  CAST(SUM(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
      |    FILTER (WHERE r_name = 'AFRICA') AS DOUBLE) / 10000 AS africa,
      |  CAST(SUM(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
      |    FILTER (WHERE r_name = 'AMERICA') AS DOUBLE) / 10000 AS america,
      |  CAST(SUM(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
      |    FILTER (WHERE r_name = 'ASIA') AS DOUBLE) / 10000 AS asia,
      |  CAST(SUM(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
      |    FILTER (WHERE r_name = 'EUROPE') AS DOUBLE) / 10000 AS europe,
      |  CAST(SUM(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
      |    FILTER (WHERE r_name = 'MIDDLE EAST') AS DOUBLE) / 10000 AS middle_east
      |FROM j GROUP BY yr ORDER BY yr""".stripMargin

  /** Brand × supplier-nation revenue/margin matrix — the procurement view
    * joining the item fact to BOTH catalog dimensions (part for brand and
    * retail price, supplier→nation for origin). Margin proxy = discounted
    * revenue − retail-price base. Dims: nation broadcasts (hinted,
    * genuinely tiny); part and supplier are catalog-sized — left to
    * statistics/AQE exactly like the customer dim in the enrichment
    * chain, so the plan degrades to a shuffle join when they outgrow the
    * threshold instead of OOMing a forced broadcast. */
  def brandNationMargin(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1d) - col("l_discount"))).as("net"))
    val p = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
    val s = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("p_brand").as("brand"), col("n_name").as("supp_nation"))
      .agg(count(lit(1)).as("n_items"),
        Exprs.gsum(col("net")).as("net_revenue"),
        Exprs.gsum(col("net") - col("p_retailprice") * col("l_quantity"))
          .as("margin_vs_retail"))
      .orderBy("brand", "supp_nation")
  }

  val brandNationMarginSql: String =
    """SELECT p.p_brand AS brand, n.n_name AS supp_nation,
      |  count(*) AS n_items,
      |  CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5)
      |    AS BIGINT)) AS DOUBLE) / 10000 AS net_revenue,
      |  CAST(SUM(CAST(floor((l.l_extendedprice * (1 - l.l_discount)
      |      - p.p_retailprice * l.l_quantity) * 10000 + 0.5)
      |    AS BIGINT)) AS DOUBLE) / 10000 AS margin_vs_retail
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |GROUP BY 1, 2 ORDER BY brand, supp_nation""".stripMargin

  /** Trailing-7-day order count and revenue per customer — the RANGE-frame
    * interval window (each order row sees the sum over its customer's
    * orders dated within the preceding 6 days, calendar-gapped data
    * included: RANGE, not ROWS, so missing days shrink the frame and
    * same-day peer orders are always in it together). Revenue is
    * grid-snapped to exact integer cents×100 INSIDE the window sum (the
    * [[rfmSegments]] trick), so the result is independent of the engines'
    * float summation order.
    *
    * Scale: one hash exchange on `o_custkey`, then a per-partition sort —
    * the standard distributed window; frames never cross customers, so
    * 1000 executors each window their own customers. */
  def rollingRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("day"))
      .rangeBetween(-6, 0)
    Tables.orders(spark, sfDir)
      .withColumn("day", expr("datediff(o_orderdate, DATE '1970-01-01')"))
      .withColumn("cents4", floor(col("o_totalprice") * 10000 + 0.5).cast("long"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        count(lit(1)).over(w).as("n_7d"),
        (sum(col("cents4")).over(w).cast("double") / 10000).as("rev_7d"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  val rollingRevenueSql: String =
    """SELECT o_orderkey, o_custkey, o_orderdate,
      |  count(*) OVER w AS n_7d,
      |  CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) OVER w
      |    AS DOUBLE) / 10000 AS rev_7d
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |  ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

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

  /** Oracle for [[rfmSegmentsApprox]]. Spark's `percentile_approx` with
    * `accuracy` ≥ n retains every sample (Greenwald–Khanna compresses
    * nothing below the accuracy count), so at verify scale each cut is
    * EXACTLY the rank-⌈p·n⌉ smallest value; DuckDB's `quantile_disc` uses
    * the SAME max(1, ⌈p·n⌉) rank (probed empirically against sorted
    * replays — NOT the lower-interpolation ⌊p·(n−1)⌋+1), so the cuts
    * coincide at ANY group size, and OperatorsSpec pins the exact/approx
    * agreement independently of the oracle. The scoring (1 + #cuts
    * strictly beaten) is then identical per-row arithmetic on identical
    * cut values. */
  val rfmSegmentsApproxSql: String =
    """WITH base AS (
      |  SELECT o_custkey AS custkey,
      |    CAST(datediff('day', max(o_orderdate),
      |      (SELECT max(o_orderdate) FROM orders)) AS BIGINT) AS recency_days,
      |    count(*) AS frequency,
      |    CAST(SUM(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
      |      / 10000 AS monetary
      |  FROM orders GROUP BY 1),
      |c AS (
      |  SELECT quantile_disc(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rc,
      |    quantile_disc(frequency, [0.2, 0.4, 0.6, 0.8]) AS fc,
      |    quantile_disc(monetary, [0.2, 0.4, 0.6, 0.8]) AS mc
      |  FROM base)
      |SELECT custkey, recency_days, frequency, monetary,
      |  CAST(1 + len(list_filter(c.rc, x -> x < recency_days)) AS BIGINT) AS r_score,
      |  CAST(1 + len(list_filter(c.fc, x -> x > frequency)) AS BIGINT) AS f_score,
      |  CAST(1 + len(list_filter(c.mc, x -> x > monetary)) AS BIGINT) AS m_score
      |FROM base, c ORDER BY custkey""".stripMargin
}
