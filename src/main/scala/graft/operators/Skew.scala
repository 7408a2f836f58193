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

  /** Salted equi-join — the join-side companion of [[saltedCountSum]]:
    * when one probe key is hot enough to funnel a reducer (a celebrity
    * user, a default/placeholder id), the probe side salts each row into
    * one of `nSalts` sub-keys and the build side REPLICATES each row
    * `nSalts` times, so the join runs on (key, salt) and the hot key's
    * rows spread across `nSalts` reducers. Cost model: build-side shuffle
    * volume × nSalts buys probe-side balance — the right trade exactly
    * when the build side is much smaller than the hot key's row count
    * (yet too big to broadcast outright).
    *
    * AQE's `OptimizeSkewedJoin` does this adaptively but only for
    * sort-merge joins with runtime stats, and it re-plans mid-query;
    * explicit salting is deterministic, plan-stable, works under
    * shuffle-hash joins, and composes with the downstream aggregate
    * (which re-merges per key exactly like the salted aggregate's stage
    * 2). Returns the joined frame with the salt columns dropped —
    * row-identical to the plain equi-join. */
  def saltedJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      saltSource: Column, nSalts: Int): DataFrame = {
    val p = probe.withColumn("__salt_p", pmod(hash(saltSource), lit(nSalts)))
    val b = build.withColumn("__salt_b",
      explode(sequence(lit(0), lit(nSalts - 1))))
    p.join(b, p(probeKey) === b(buildKey) && p("__salt_p") === b("__salt_b"))
      .drop("__salt_p", "__salt_b")
  }

  /** Lineitem ⋈ orders through the salted join, folded to the per-priority
    * revenue rollup — the oracle is the PLAIN join + aggregate, proving
    * the salt/replicate mechanics change the physical distribution and
    * nothing else. */
  def skewJoinAgg(spark: SparkSession, sfDir: String): DataFrame =
    saltedJoin(
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice")),
      "l_orderkey",
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderpriority")),
      "o_orderkey",
      saltSource = col("l_partkey"), nSalts = 16)
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_items"),
        sum(floor(col("l_extendedprice") * lit(1e4) + lit(0.5d))
          .cast("long")).as("rev_grid"))
      .orderBy("priority")

  val skewJoinAggSql: String =
    """SELECT o.o_orderpriority AS priority, count(*) AS n_items,
      |  CAST(SUM(CAST(floor(l.l_extendedprice * 10000 + 0.5) AS BIGINT))
      |    AS BIGINT) AS rev_grid
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1 ORDER BY priority""".stripMargin
}
