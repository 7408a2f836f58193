package graft.operators

import graft.{Exprs, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics in their batch form — tumbling windows, session
  * windows, and exactly-once dedupe (SURVEY.md §2 I4/I6, G2). The same
  * transformations run under Structured Streaming in
  * [[graft.streaming.Streaming]]; keeping them here as batch queries gives
  * them a DuckDB oracle (batch/streaming unification — one code path).
  *
  * Scale notes: windowed aggregation shuffles once on (window, key);
  * `session_window` uses Spark's native session-merge aggregation (one
  * shuffle on user_id) rather than a driver-side gaps-and-islands pass.
  */
object EventsOps {

  /** I6 — tumbling 1-hour window aggregate over the event stream. */
  def eventsWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Exprs.gsum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("window_start", "event_type")

  val eventsWindowSql: String =
    """SELECT CAST(floor(epoch(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)))) AS BIGINT) AS window_start,
      |  event_type, count(*) AS n,
      |  CAST(SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000 AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** I6 — session windows (30-minute inactivity gap) per user. Session end =
    * last event + gap, matching Spark `session_window` semantics. */
  def eventsSession(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Exprs.gsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("sw.start")).as("session_start"),
        unix_timestamp(col("sw.end")).as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  /** I6 — hopping (sliding) windows: 1-hour windows every 30 minutes, so
    * each event lands in exactly 2 overlapping windows. Spark's `window`
    * with a slide generates the per-row window copies itself (an internal
    * explode — rows duplicate ×(size/slide), the unavoidable cost of
    * overlap) and the aggregate stays map-side combined per (window,
    * type); the oracle replicates each row to its two epoch-aligned
    * starts explicitly. Completes the window-type matrix next to the
    * tumbling [[eventsWindow]] and gap-based [[eventsSession]]. */
  def eventsHopping(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Exprs.gsum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("window_start", "event_type")

  val eventsHoppingSql: String =
    """WITH e AS (
      |  SELECT event_type, value,
      |    CAST(floor(epoch(time_bucket(INTERVAL '30 minutes',
      |      CAST(ts AS TIMESTAMP)))) AS BIGINT) AS tb
      |  FROM events),
      |x AS (
      |  SELECT event_type, value, unnest([tb, tb - 1800]) AS window_start
      |  FROM e)
      |SELECT window_start, event_type, count(*) AS n,
      |  CAST(SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000
      |    AS sum_value
      |FROM x GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** Top session journeys — the ordered event-type path (first `maxLen`
    * steps) of every 30-minute-gap session, counted corpus-wide: the
    * path-analysis complement of the funnel (which checks ONE fixed
    * sequence; this surfaces which sequences actually happen).
    *
    * Determinism: the per-session sequence is an `array_sort` over
    * (ts, event_id, type) structs — event_id is globally unique, so the
    * order is total and both engines assemble the identical string.
    * Scale: sessionization is the same one-(user)-shuffle window pair as
    * [[eventsSession]]; the journey string is bounded by `maxLen` (a
    * runaway session can't blow up row width); the final count is a
    * map-side-combined aggregate over session-grain rows. */
  def journeyTopk(spark: SparkSession, sfDir: String,
                  maxLen: Int = 5, k: Int = 20): DataFrame = {
    val gapUs = 1800L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val e = Tables.events(spark, sfDir).select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))
    val s = e
      .withColumn("new_s",
        when(col("ts_us") - lag("ts_us", 1).over(w) >= gapUs, 1).otherwise(0))
      .withColumn("sid", sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    s.groupBy("user_id", "sid")
      .agg(array_join(
        slice(transform(
          array_sort(collect_list(struct(col("ts_us"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")), 1, maxLen), ">").as("journey"))
      .groupBy("journey").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("journey"))
      .limit(k)
  }

  def journeyTopkSql(maxLen: Int = 5, k: Int = 20): String =
    s"""WITH e AS (SELECT user_id, event_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      |m AS (SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER
      |    (PARTITION BY user_id ORDER BY ts_us, event_id) >= 1800000000
      |    THEN 1 ELSE 0 END AS new_s FROM e),
      |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM m),
      |j AS (SELECT user_id, sid,
      |    array_to_string(list_slice(
      |      list(event_type ORDER BY ts_us, event_id), 1, $maxLen), '>') AS journey
      |  FROM s GROUP BY 1, 2)
      |SELECT journey, count(*) AS n_sessions
      |FROM j GROUP BY 1 ORDER BY n_sessions DESC, journey LIMIT $k""".stripMargin

  val eventsSessionSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      |m AS (
      |  SELECT *, CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |                      >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM e),
      |s AS (
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM m)
      |SELECT user_id,
      |  CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
      |  CAST(floor(epoch(max(ts) + INTERVAL 30 MINUTE)) AS BIGINT) AS session_end,
      |  count(*) AS n_events,
      |  CAST(SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000 AS sum_value
      |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  /** H (json decode) — per-event JSON field extraction from the `props`
    * column (`get_json_object`, codegen'd) aggregated by event type; the
    * reference decodes payload JSON at every stage boundary
    * (`gcs_to_bq/main.py:354-355`). */
  def eventsProps(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  val eventsPropsSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** I4/G2 — exactly-once dedupe on the event id after a double-delivery
    * (`dropDuplicates` is what the streaming path uses with a watermark).
    *
    * Oracle-parity precondition: `dropDuplicates(event_id)` keeps ONE
    * arbitrary row per id while the oracle's `SELECT DISTINCT` keeps every
    * distinct (id, type, user) tuple — identical only while `event_id`
    * functionally determines the other columns. True here by construction
    * (the doubled delivery is byte-identical, and the fixture's event_id is
    * unique — asserted in OperatorsSpec so a fixture change fails loudly
    * instead of flapping the hash gate). A redelivery-with-mutated-payload
    * scenario is the streaming path's job (watermarked dropDuplicates =
    * first delivery wins), not this batch oracle's. */
  def eventsDedupe(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.unionByName(ev) // simulate at-least-once double delivery
      .dropDuplicates(Seq("event_id"))
      .select(col("event_id"), col("event_type"), col("user_id"))
      .orderBy("event_id")
  }

  val eventsDedupeSql: String =
    """SELECT DISTINCT event_id, event_type, user_id FROM events ORDER BY event_id""".stripMargin

  /** Ordered-sequence (funnel) matching — per user, how far through
    * view → click → purchase did they get, each stage STRICTLY after the
    * previous one (the sequential-pattern analytics shape:
    * MATCH_RECOGNIZE-lite).
    *
    * Spark-first: ONE scan and ONE shuffle — events sort into a per-user
    * array and a single left-to-right `aggregate` fold advances the stage
    * state machine (first view; first click after it; first purchase after
    * that). The fold is provably equal to the nested min-chain
    * (`t_click = min click-ts > t_view`, …) because each stage takes the
    * MINIMUM qualifying timestamp — which is exactly the first qualifying
    * element in time order — so the DuckDB oracle can replay it as plain
    * hierarchical aggregates. Per-user state is 3 longs regardless of
    * event count; at 100 TB the same fold runs under
    * `flatMapGroupsWithState` on a stream with event-time ordering per
    * micro-batch. Tie semantics are pinned: a click at the exact first-view
    * timestamp does NOT count (strict `>`), independent of sort order.
    * Each stage must land within `windowSec` of the previous one (the
    * conversion window — without a bound, any long-lived user trivially
    * completes every funnel; 24 h splits the fixture 150/60/25 across the
    * stages). */
  def eventsFunnel(spark: SparkSession, sfDir: String,
      windowSec: Long = 86400): DataFrame = {
    val nil = lit(null).cast("long")
    val wUs = lit(windowSec * 1000000L)
    val seq0 = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("t"), col("event_type"))))
        .as("es"))
    val folded = aggregate(
      col("es"),
      struct(nil.as("v"), nil.as("c"), nil.as("p")),
      (s, e) => {
        val (t, ty) = (e.getField("t"), e.getField("event_type"))
        def within(prev: Column) = t > prev && t <= prev + wUs
        struct(
          when(s.getField("v").isNull && ty === "view", t)
            .otherwise(s.getField("v")).as("v"),
          when(s.getField("c").isNull && s.getField("v").isNotNull
            && ty === "click" && within(s.getField("v")), t)
            .otherwise(s.getField("c")).as("c"),
          when(s.getField("p").isNull && s.getField("c").isNotNull
            && ty === "purchase" && within(s.getField("c")), t)
            .otherwise(s.getField("p")).as("p"))
      })
    seq0.select(col("user_id"), folded.as("f"))
      .select(col("user_id"),
        col("f.v").as("t_view"), col("f.c").as("t_click"),
        col("f.p").as("t_purchase"),
        when(col("f.p").isNotNull, "purchase")
          .when(col("f.c").isNotNull, "click")
          .when(col("f.v").isNotNull, "view")
          .otherwise("none").as("stage"))
      .orderBy("user_id")
  }

  val eventsFunnelSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS t
      |  FROM events),
      |u AS (SELECT DISTINCT user_id FROM ev),
      |v AS (SELECT user_id, min(t) AS t_view FROM ev
      |      WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.t) AS t_click
      |      FROM ev e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.t > v.t_view
      |        AND e.t <= v.t_view + 86400000000 GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.t) AS t_purchase
      |      FROM ev e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.t > c.t_click
      |        AND e.t <= c.t_click + 86400000000 GROUP BY 1)
      |SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
      |  CASE WHEN p.t_purchase IS NOT NULL THEN 'purchase'
      |       WHEN c.t_click IS NOT NULL THEN 'click'
      |       WHEN v.t_view IS NOT NULL THEN 'view'
      |       ELSE 'none' END AS stage
      |FROM u
      |LEFT JOIN v ON u.user_id = v.user_id
      |LEFT JOIN c ON u.user_id = c.user_id
      |LEFT JOIN p ON u.user_id = p.user_id
      |ORDER BY u.user_id""".stripMargin

  /** Watermark-delay sweep — the tuning table behind every
    * `withWatermark` setting ([[graft.streaming.Streaming]]'s windowed
    * sinks): for each candidate delay, how many events would arrive
    * BEHIND the watermark and be dropped. Arrival order is the
    * deterministically jittered ingest sequence; the watermark before event i is
    * `max(ts of all prior arrivals) − delay`, so an event is late at
    * delay d iff `ts < prior_max − d`. Streaming teams read the smallest
    * delay whose drop fraction is acceptable — state size scales with the
    * delay, so this table IS the cost/completeness dial.
    *
    * Scale: the prior-arrival running max uses the same two-stage ranged
    * form as [[Analytics.rangedRunningSum]] — range-partition on
    * `event_id`, per-range running max over PRIOR rows only, plus the max
    * of all earlier ranges (a #partitions² triangular join on the tiny
    * per-range totals) — never a single-partition global window. All
    * comparisons are exact LONG micros; the sweep itself is one
    * conditional aggregate emitting `delays.length` rows. */
  /** Funnel conversion-latency distribution — the timing companion to the
    * stage-count funnel ([[eventsFunnel]]): per step pair (view→click,
    * click→purchase, view→purchase), the exact p25/p50/p90 of the
    * conversion delay over converting users. The strict chain (first
    * view; first click AFTER it; first purchase after THAT click) makes
    * each user's latencies well-defined; the report is what an
    * experimentation/alerting pipeline tracks per release ("p90 time to
    * purchase regressed 40%").
    *
    * Shape: three user-grain aggregates chained by broadcastable joins
    * (the user table is events-distinct-users-sized), then the
    * [[Sketches.quantilesOf]] histogram selection per latency column —
    * exact at any count, never a global sort, 4096-bin bounded driver
    * state. Latencies are exact long micros; the quantile VALUE is an
    * actual data point (quantile_disc semantics), so the only double op
    * is the final seconds divide on the r4 grid. */
  def funnelLatency(spark: SparkSession, sfDir: String,
      ps: Seq[Double] = Seq(0.25, 0.5, 0.9)): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("t").as("tv"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("t") > col("tv"))
      .groupBy("user_id", "tv").agg(min("t").as("tc"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("t") > col("tc"))
      .groupBy("user_id", "tv", "tc").agg(min("t").as("tp"))
    val arms = Seq(
      ("view_to_click", c.select((col("tc") - col("tv")).as("lat"))),
      ("click_to_purchase", p.select((col("tp") - col("tc")).as("lat"))),
      ("view_to_purchase", p.select((col("tp") - col("tv")).as("lat"))))
    arms.map { case (step, lats) =>
      Sketches.quantilesOf(lats, "lat", ps)
        .select(lit(step).as("step"), col("q"),
          Exprs.r4(col("value") / lit(1e6)).as("seconds"))
    }.reduce(_ unionByName _).orderBy("step", "q")
  }

  def funnelLatencySql(ps: Seq[Double] = Seq(0.25, 0.5, 0.9)): String = {
    val steps = Seq(
      ("view_to_click", "c", "tc - tv"),
      ("click_to_purchase", "p", "tp - tc"),
      ("view_to_purchase", "p", "tp - tv"))
    val arms = for { (step, tbl, lat) <- steps; q <- ps } yield
      s"""SELECT '$step' AS step, CAST($q AS DOUBLE) AS q,
         |  floor(CAST(quantile_disc($lat, $q) AS DOUBLE) / 1000000
         |    * 10000 + 0.5) / 10000 AS seconds
         |FROM $tbl HAVING count(*) > 0""".stripMargin
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t
       |  FROM events),
       |v AS (SELECT user_id, min(t) AS tv FROM e
       |      WHERE event_type = 'view' GROUP BY 1),
       |c AS (SELECT e.user_id, v.tv, min(e.t) AS tc
       |      FROM e JOIN v ON e.user_id = v.user_id
       |      WHERE e.event_type = 'click' AND e.t > v.tv GROUP BY 1, 2),
       |p AS (SELECT e.user_id, c.tv, c.tc, min(e.t) AS tp
       |      FROM e JOIN c ON e.user_id = c.user_id
       |      WHERE e.event_type = 'purchase' AND e.t > c.tc GROUP BY 1, 2, 3)
       |${arms.mkString("\nUNION ALL\n")}
       |ORDER BY step, q""".stripMargin
  }

  def watermarkSweep(spark: SparkSession, sfDir: String,
      delays: Seq[Long] = Seq(0L, 60L, 300L, 900L, 3600L)): DataFrame = {
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // The fixture stream arrives exactly in timestamp order, which would
    // leave the sweep all-zero and the operator unexercised — so (as
    // eventsDedupe synthesizes its double delivery) a DETERMINISTIC
    // arrival jitter is injected first: each event's arrival slot shifts
    // by up to ±15 positions via the shared md5num contract, which both
    // engines replay identically. The operator under test is the
    // watermark accounting over the (jittered) arrival order.
    val jitter = (pmod(Exprs.md5num(col("event_id").cast("string")), lit(7))
      - lit(3)) * lit(5)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), unix_micros(col("ts")).as("t"))
      .withColumn("arr", col("event_id") + jitter)
    val ranged = ev.repartitionByRange(n, col("arr"), col("event_id"))
      .withColumn("__rid", spark_partition_id())
      .localCheckpoint(false) // one RDD: range boundaries sampled ONCE
    val localPrior = ranged.withColumn("__pm",
      max(col("t")).over(Window.partitionBy("__rid")
        .orderBy("arr", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)))
    val totals = ranged.groupBy("__rid").agg(max("t").as("__rmax"))
    val offsets = totals.as("a")
      .join(totals.as("b"), col("b.__rid") < col("a.__rid"), "left_outer")
      .groupBy(col("a.__rid").as("__rid"))
      .agg(max(col("b.__rmax")).as("__off"))
    val withWm = localPrior.join(broadcast(offsets), "__rid")
      // max over ALL prior arrivals = max(earlier ranges, prior in-range);
      // greatest() skips nulls, and a no-prior NULL propagates through the
      // lateness comparison to false — NOT a MinValue sentinel, whose
      // `MinValue − delay` subtraction would wrap (and DuckDB would throw)
      .withColumn("__wmbase", greatest(col("__pm"), col("__off")))
    val aggs = delays.flatMap { d =>
      Seq(sum(when(col("__wmbase") - lit(d * 1000000L) > col("t"), 1L)
        .otherwise(0L)).as(s"late_$d"))
    }
    val counted = withWm.agg(count(lit(1)).as("n_events"), aggs: _*)
    val rows = delays.map { d =>
      counted.select(lit(d).as("delay_s"), col(s"late_$d").as("n_late"),
        col("n_events"),
        Exprs.r4(col(s"late_$d").cast("double") / col("n_events"))
          .as("late_frac"))
    }
    rows.reduce(_ unionByName _).orderBy("delay_s")
  }

  def watermarkSweepSql(delays: Seq[Long] = Seq(0L, 60L, 300L, 900L, 3600L)): String = {
    val arms = delays.map { d =>
      s"""SELECT CAST($d AS BIGINT) AS delay_s,
         |  CAST(SUM(CASE WHEN pm - ${d}000000 > t THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_late,
         |  count(*) AS n_events,
         |  floor(CAST(SUM(CASE WHEN pm - ${d}000000 > t THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS late_frac
         |FROM wm""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ev AS (
       |  SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
       |    event_id + (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
       |      AS BIGINT) % 7 - 3) * 5 AS arr
       |  FROM events),
       |wm AS (
       |  SELECT t, MAX(t) OVER (ORDER BY arr, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
       |  FROM ev)
       |$arms
       |ORDER BY delay_s""".stripMargin
  }
}
