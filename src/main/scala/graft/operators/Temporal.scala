package graft.operators

import graft.{Exprs, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join/state operators over the event stream — the time-dimension
  * counterparts of the reference's enrichment joins (`api_to_gcs/main.py`
  * joins each order to per-order lookups; an event-time engine additionally
  * needs "join to the state AS OF this row's time"). Three operators:
  *
  *  - [[eventsAsof]] — as-of join (attribution): each `purchase` matched to
  *    the same user's most recent `click` at-or-before it.
  *  - [[eventsRangeJoin]] — bounded range join: clicks within the hour
  *    preceding each purchase.
  *  - [[scd2Build]] — slowly-changing-dimension (type 2) intervals from an
  *    event log: per-user state runs with `valid_from`/`valid_to`.
  *
  * Scale notes (the whole point of these implementations):
  *
  * **As-of via union + one window pass, not a theta join.** The naive
  * `p JOIN c ON p.user = c.user AND c.ts <= p.ts` explodes to every
  * (purchase × earlier click) pair before the per-purchase max — O(n·m) per
  * user — and Spark plans inequality joins without an equality residue
  * poorly at scale. Instead both sides are union-tagged and sorted once per
  * user; a running `last(click, ignoreNulls)` carries the newest click into
  * each purchase row. ONE shuffle on user_id, linear work, and the sort is
  * the shuffle's own sort-within-partition at cluster scale. Skewed users
  * are bounded by per-user event counts, not their square.
  *
  * **Range join via time-bucket replication.** A window of width W joined
  * naively is the same O(n·m) blowup. Bucketing clicks to `floor(ts/W)` and
  * replicating each PROBE row to its two candidate buckets turns it into an
  * equi-join on (user, bucket) — hash-partitionable, AQE-skew-splittable —
  * with the exact range predicate as a cheap post-filter. Replication factor
  * is exactly 2 (probe side only), independent of data size.
  *
  * **SCD2 as two window passes** (change detection, then interval close) —
  * both windows share the (user_id) partitioning, so Catalyst plans a single
  * shuffle and the second window reuses the first's sort order.
  */
object Temporal {

  private val HourUs = 3600L * 1000000L

  /** Events projected to the micros epoch — ties in `ts` are broken by the
    * globally-unique event_id everywhere ordering matters, so every window
    * is deterministic and engine-portable. */
  private def ev(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"), col("props"))

  /** Generic as-of join — the library surface behind [[eventsAsof]].
    * Attaches `carry` columns from the latest `state` row with
    * `state.ts <= probe.ts` per `key`; probes with no prior state carry
    * nulls. Both frames must expose `key` and `ts` under those names, and
    * (key, ts) must be UNIQUE on the state side (pre-aggregate otherwise —
    * equal-timestamp state rows would make the match nondeterministic).
    *
    * Implementation: union-tag + one running `last(ignoreNulls)` window —
    * one shuffle on `key`, zero join operators (see object doc). State
    * sorts before probe at equal ts (tag 0 < 1) ⇒ `<=` inclusivity. */
  def asofJoin(probe: DataFrame, state: DataFrame, key: String, ts: String,
      carry: Seq[String]): DataFrame = {
    val probeStruct = struct(probe.columns.toIndexedSeq.map(col): _*)
    val carryStruct = struct(carry.map(col): _*)
    val probeType = probe.select(probeStruct.as("_p")).schema("_p").dataType
    val carryType = state.select(carryStruct.as("_s")).schema("_s").dataType
    val p2 = probe.select(col(key).as("_k"), col(ts).as("_ts"),
      lit(1).as("_tag"), probeStruct.as("_p"),
      lit(null).cast(carryType).as("_s"))
    val s2 = state.select(col(key).as("_k"), col(ts).as("_ts"),
      lit(0).as("_tag"), lit(null).cast(probeType).as("_p"),
      carryStruct.as("_s"))
    val w = Window.partitionBy("_k").orderBy("_ts", "_tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p2.unionByName(s2)
      .withColumn("_m", last(col("_s"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(probe.columns.toIndexedSeq.map(c => col("_p." + c).as(c))
        ++ carry.map(c => col("_m." + c).as(c)): _*)
  }

  /** As-of join query: each purchase ← the user's latest click with
    * `click.ts <= purchase.ts` (marketing attribution / "state as of").
    * Clicks are first collapsed to one per (user, ts) keeping max event_id,
    * so equal-timestamp clicks cannot make the match nondeterministic.
    * Purchases with no prior click keep nulls. */
  def eventsAsof(spark: SparkSession, sfDir: String): DataFrame = {
    val e = ev(spark, sfDir)
    val clicks = e.filter(col("event_type") === "click")
      .groupBy("user_id", "ts_us")
      .agg(max("event_id").as("click_event_id"))
      .withColumn("click_ts_us", col("ts_us"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us")
    asofJoin(purchases, clicks, key = "user_id", ts = "ts_us",
      carry = Seq("click_event_id", "click_ts_us"))
      .withColumn("gap_us", col("ts_us") - col("click_ts_us"))
      .orderBy("event_id")
  }

  val eventsAsofSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      |c AS (SELECT user_id, ts_us, max(event_id) AS click_event_id
      |      FROM e WHERE event_type = 'click' GROUP BY 1, 2),
      |p AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, p.ts_us,
      |  c.click_event_id, c.ts_us AS click_ts_us, p.ts_us - c.ts_us AS gap_us
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
      |ORDER BY event_id""".stripMargin

  /** Range join: per purchase, the same user's clicks in the preceding hour
    * `[ts - 1h, ts)` — count and Σ of the clicks' `props.k`. Probe rows are
    * replicated to the (at most 2) hour buckets the window can touch; the
    * equi-join on (user, bucket) carries the exact predicate as a residual
    * filter inside the join, and the final groupBy(event_id) folds the two
    * bucket copies back to one row (count/sum ignore the unmatched copy's
    * nulls), so zero-click purchases surface with n_clicks = 0. */
  def eventsRangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = ev(spark, sfDir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_us").as("c_ts"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .withColumn("bin", floor(col("c_ts") / HourUs))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
      .withColumn("bin", explode(array_distinct(array(
        floor((col("ts_us") - HourUs) / HourUs), floor(col("ts_us") / HourUs)))))
    purchases.join(clicks,
        purchases("user_id") === clicks("c_user")
          && purchases("bin") === clicks("bin")
          && clicks("c_ts") >= purchases("ts_us") - HourUs
          && clicks("c_ts") < purchases("ts_us"),
        "left_outer")
      .groupBy("event_id", "user_id", "ts_us")
      .agg(count(col("c_ts")).as("n_clicks"),
        sum(col("k")).cast("long").as("sum_k"))
      .orderBy("event_id")
  }

  val eventsRangeJoinSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events),
      |p AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'),
      |c AS (SELECT user_id AS c_user, ts_us AS c_ts, k FROM e WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, p.ts_us,
      |  count(c.c_ts) AS n_clicks, CAST(sum(c.k) AS BIGINT) AS sum_k
      |FROM p LEFT JOIN c
      |  ON p.user_id = c.c_user
      | AND c.c_ts >= p.ts_us - 3600000000 AND c.c_ts < p.ts_us
      |GROUP BY 1, 2, 3 ORDER BY event_id""".stripMargin

  /** SCD2 build: compress each user's event-type sequence into state runs —
    * a row per change with `valid_from` = change time, `valid_to` = next
    * change (null ⇒ current). The I5 "prefer live" dimension-history shape
    * (`api_to_gcs-checker.py` resolves to the newest state; SCD2 keeps the
    * full history a warehouse dimension needs). */
  def scd2Build(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev(spark, sfDir)
      .select(col("user_id"), col("event_type").as("state"),
        col("ts_us"), col("event_id"))
      .withColumn("prev", lag("state", 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("state"))
      .withColumn("valid_to_us", lead("ts_us", 1).over(w))
      .select(col("user_id"), col("state"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
      .orderBy("user_id", "valid_from_us", "state")
  }

  /** Point-in-time dimension lookup — each purchase enriched with the SCD2
    * state interval active AT ITS EVENT TIME (the "historically correct
    * attribute" join every warehouse needs once a dimension keeps history;
    * joining on `is_current` instead is the classic time-travel bug).
    *
    * Composition, not a new join: [[scd2Build]] → drop zero-length runs
    * (two changes at one instant leave a `[t, t)` interval that can never
    * contain a probe; removing them ALSO makes (user, valid_from) unique,
    * which [[asofJoin]] requires for determinism) → [[asofJoin]] on
    * `valid_from <= ts`. Interval containment needs no upper-bound check:
    * consecutive runs partition the timeline, so the latest start ≤ ts IS
    * the containing interval. Same one-shuffle linear cost as every as-of
    * here — never an inequality theta join against the interval table.
    *
    * The oracle states the semantics the natural way — containment join
    * `valid_from <= ts < coalesce(valid_to, ∞)` — proving the as-of
    * rewrite equivalent on real data. */
  def scd2Lookup(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = scd2Build(spark, sfDir)
      .filter(col("valid_to_us").isNull || col("valid_to_us") =!= col("valid_from_us"))
      .select(col("user_id"), col("valid_from_us").as("ts_us"),
        col("state"), col("valid_from_us"), col("valid_to_us"))
    val purchases = ev(spark, sfDir).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    asofJoin(purchases, dim, key = "user_id", ts = "ts_us",
      carry = Seq("state", "valid_from_us", "valid_to_us"))
      .orderBy("event_id")
  }

  val scd2LookupSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      |m AS (SELECT user_id, event_type AS state, ts_us, event_id,
      |    LAG(event_type) OVER
      |      (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev FROM e),
      |chg AS (SELECT * FROM m WHERE prev IS NULL OR prev <> state),
      |v AS (SELECT *, LEAD(ts_us) OVER
      |    (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us FROM chg),
      |d AS (SELECT user_id, state, ts_us AS valid_from_us, valid_to_us FROM v
      |      WHERE valid_to_us IS NULL OR valid_to_us <> ts_us),
      |p AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, p.ts_us,
      |  d.state, d.valid_from_us, d.valid_to_us
      |FROM p LEFT JOIN d
      |  ON p.user_id = d.user_id AND p.ts_us >= d.valid_from_us
      | AND (d.valid_to_us IS NULL OR p.ts_us < d.valid_to_us)
      |ORDER BY event_id""".stripMargin

  val scd2BuildSql: String =
    """WITH e AS (SELECT user_id, event_type AS state,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id FROM events),
      |m AS (SELECT *, LAG(state) OVER
      |    (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev FROM e),
      |chg AS (SELECT * FROM m WHERE prev IS NULL OR prev <> state),
      |v AS (SELECT *, LEAD(ts_us) OVER
      |    (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us FROM chg)
      |SELECT user_id, state, ts_us AS valid_from_us, valid_to_us,
      |  valid_to_us IS NULL AS is_current
      |FROM v ORDER BY user_id, valid_from_us, state""".stripMargin

  /** CDC changelog compaction — the batch MERGE semantics of a warehouse
    * upsert feed (BigQuery `MERGE`, Delta `MERGE INTO`): a log of keyed
    * upserts and tombstones collapses to current state — per key, the
    * latest event wins, and a key whose latest event is a delete leaves NO
    * row. This is the query-shaped sibling of the reference's
    * delete-then-verify maintenance (`data_validation/api_to_gcs-checker
    * .py:114-128` deletes superseded rows; `contatos_to_bq/main.py:117-128`
    * replaces wholesale) and of the engine's streaming upsert sink
    * (`Writers.upsertByKey` applies the same last-writer-wins rule per
    * micro-batch).
    *
    * The changelog is synthesized deterministically from `orders`: each
    * order is an upsert for its customer keyed by (date, orderkey), and a
    * salted hash marks ~5% of orders as tombstones — so the fixture is
    * re-derivable and the oracle replays it. Scale: one hash shuffle on
    * the key; the rank-1 cut is a WindowGroupLimit pushed map-side, so
    * the shuffle carries per-partition survivors, not the full log —
    * exactly how a 100 TB CDC log compacts. */
  def cdcMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val log = Tables.orders(spark, sfDir).select(
      col("o_custkey").as("key"), col("o_orderdate").as("ts"),
      col("o_orderkey").as("seq"),
      when(pmod(Exprs.md5num(concat(lit("cdc_"),
        col("o_orderkey").cast("string"))), lit(20L)) === 0, "D")
        .otherwise("U").as("op"),
      col("o_totalprice"))
    val w = Window.partitionBy("key").orderBy(col("ts").desc, col("seq").desc)
    log.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") === "U")
      .select(col("key").as("custkey"), col("seq").as("last_orderkey"),
        col("ts").as("last_orderdate"), col("o_totalprice").as("last_totalprice"))
      .orderBy("custkey")
  }

  val cdcMergeSql: String =
    """WITH log AS (
      |  SELECT o_custkey AS key, o_orderdate AS ts, o_orderkey AS seq,
      |    CASE WHEN CAST(('0x' || substr(md5('cdc_' || CAST(o_orderkey AS VARCHAR)), 1, 8))
      |        AS BIGINT) % 20 = 0
      |      THEN 'D' ELSE 'U' END AS op,
      |    o_totalprice
      |  FROM orders),
      |r AS (SELECT *, row_number() OVER (PARTITION BY key
      |        ORDER BY ts DESC, seq DESC) AS rn
      |      FROM log)
      |SELECT key AS custkey, seq AS last_orderkey, ts AS last_orderdate,
      |  o_totalprice AS last_totalprice
      |FROM r WHERE rn = 1 AND op = 'U' ORDER BY custkey""".stripMargin
}
