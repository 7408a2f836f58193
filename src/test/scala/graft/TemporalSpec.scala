package graft

import graft.operators.{CorpusOps, Temporal}
import org.apache.spark.sql.functions._

/** Invariants + plan-shape guards for the temporal joins and corpus-prep
  * operators (sf0.001). The oracle gate proves value equality; these pin the
  * SEMANTIC contracts (as-of match is the latest prior click; range counts
  * equal the naive theta join; SCD2 intervals tile each user's timeline) and
  * the SCALE contracts (shuffle counts — the union-window as-of must not
  * plan a theta join; the binned range join must stay an equi-join). */
class TemporalSpec extends SparkSuite {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("as-of: every matched click is the user's latest at-or-before the purchase") {
    val res = Temporal.eventsAsof(spark, sfDir)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts_us").as("cts"))
    // no click strictly between the matched one and the purchase
    val later = res.filter(col("click_ts_us").isNotNull)
      .join(clicks, col("user_id") === col("cu")
        && col("cts") > col("click_ts_us") && col("cts") <= col("ts_us"))
    assert(later.count() == 0)
    // unmatched purchases truly have no prior click
    val unmatched = res.filter(col("click_ts_us").isNull)
      .join(clicks, col("user_id") === col("cu") && col("cts") <= col("ts_us"))
    assert(unmatched.count() == 0)
    // grain: one output row per purchase event
    assert(res.count() ==
      ev.filter(col("event_type") === "purchase").count())
  }

  test("as-of plans one shuffle per input + window — no nested-loop theta join") {
    val p = plan(Temporal.eventsAsof(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "as-of must not degrade to a theta join")
    assert(p.contains("Window"), "as-of is the union+window design")
  }

  test("range join matches the naive theta-join counts exactly") {
    val res = Temporal.eventsRangeJoin(spark, sfDir)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val naive = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("pu"), col("ts_us").as("pts"))
      .join(ev.filter(col("event_type") === "click")
          .select(col("user_id").as("cu"), col("ts_us").as("cts")),
        col("pu") === col("cu")
          && col("cts") >= col("pts") - 3600000000L && col("cts") < col("pts"),
        "left_outer")
      .groupBy("event_id").agg(count(col("cts")).as("n_naive"))
    val diff = res.join(naive, Seq("event_id"))
      .filter(col("n_clicks") =!= col("n_naive")).count()
    assert(diff == 0)
  }

  test("range join stays an equi-join (hash/sort-merge), never a cross product") {
    val p = plan(Temporal.eventsRangeJoin(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "bucketed range join must plan as an equi-join with residual filter")
  }

  test("SCD2 intervals tile each user's timeline with no gaps or overlaps") {
    val res = Temporal.scd2Build(spark, sfDir)
    // adjacency: each interval's valid_to equals the next valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from_us")
    val bad = res.withColumn("next_from", lead("valid_from_us", 1).over(w))
      .filter(col("valid_to_us").isNotNull && col("valid_to_us") =!= col("next_from"))
    assert(bad.count() == 0)
    // exactly one open (current) interval per user
    val open = res.filter(col("is_current"))
      .groupBy("user_id").count().filter(col("count") =!= 1)
    assert(open.count() == 0)
    // consecutive states really differ (run-length compression worked)
    val rep = res.withColumn("next_state", lead("state", 1).over(w))
      .filter(col("next_state").isNotNull && col("next_state") === col("state"))
    assert(rep.count() == 0)
  }

  test("quality filter: keep == conjunction of rules; reason iff rejected") {
    val res = CorpusOps.qualityFilter(spark, sfDir)
    assert(res.filter(col("keep") =!=
      (col("r_len") && col("r_word_len") && col("r_stopword") && col("r_repetition")))
      .count() == 0)
    assert(res.filter(col("keep") && col("reject_reason").isNotNull).count() == 0)
    assert(res.filter(!col("keep") && col("reject_reason").isNull).count() == 0)
    // the fixture corpus exercises both outcomes
    assert(res.filter(col("keep")).count() > 0)
    assert(res.filter(!col("keep")).count() > 0)
  }

  test("pii scrub: no email/phone pattern survives, hits were counted") {
    val res = CorpusOps.piiScrub(spark, sfDir)
    assert(res.filter(col("scrubbed").rlike("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"))
      .count() == 0)
    assert(res.filter(col("scrubbed").rlike("\\+[0-9][0-9\\-]{6,}[0-9]")).count() == 0)
    assert(res.filter(col("n_emails") < 1 || col("n_phones") < 1).count() == 0)
  }

  test("generic asofJoin: multi-column carry against a different state table") {
    // orders as state (all predate every 2024 event): each event must
    // carry the user's LATEST order — exercises the library surface with
    // a state table and carry set unlike the canned query's
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("user_id"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"),
        col("o_orderkey"), col("o_totalprice"))
      .groupBy("user_id", "ts_us")
      .agg(max(struct(col("o_orderkey"), col("o_totalprice"))).as("m"))
      .select(col("user_id"), col("ts_us"),
        col("m.o_orderkey").as("o_orderkey"),
        col("m.o_totalprice").as("o_totalprice"))
    val res = Temporal.asofJoin(ev, orders, "user_id", "ts_us",
      Seq("o_orderkey", "o_totalprice"))
    assert(res.count() == ev.count(), "as-of keeps probe grain")
    assert(res.columns.toSeq ==
      Seq("event_id", "user_id", "ts_us", "o_orderkey", "o_totalprice"))
    // expected match = the user's max-ts order (dates all < events)
    val expect = orders.groupBy("user_id")
      .agg(max(struct(col("ts_us"), col("o_orderkey"))).as("x"))
      .select(col("user_id").as("eu"), col("x.o_orderkey").as("want"))
    val bad = res.join(expect, col("user_id") === col("eu"), "left")
      .filter(coalesce(col("o_orderkey"), lit(-1L)) =!=
        coalesce(col("want"), lit(-1L)))
    assert(bad.count() == 0)
  }

  test("bm25: zero-tf docs score 0, tf-only variation is monotone") {
    val res = CorpusOps.bm25Score(spark, sfDir)
    assert(res.filter(col("tf_spark") === 0 && col("tf_table") === 0
      && col("tf_row") === 0 && col("bm25") =!= 0d).count() == 0)
    assert(res.filter(col("bm25") < 0d).count() == 0, "BM25+ idf stays positive")
    // same dl, strictly more of one term, others equal → higher score
    val a = res.select(col("dl"), col("tf_spark"), col("tf_table"),
      col("tf_row"), col("bm25"))
    val b = a.toDF("dl2", "s2", "t2", "r2", "bm2")
    val viol = a.join(b, col("dl") === col("dl2")
      && col("tf_table") === col("t2") && col("tf_row") === col("r2")
      && col("tf_spark") > col("s2") && col("bm25") < col("bm2"))
    assert(viol.count() == 0)
  }

  test("rep ngrams: fractions in [0,1], trigram count implies bigram count") {
    val res = CorpusOps.repNgrams(spark, sfDir)
    assert(res.filter(col("dup_bigram_frac") < 0 || col("dup_bigram_frac") > 1
      || col("dup_trigram_frac") < 0 || col("dup_trigram_frac") > 1).count() == 0)
    assert(res.filter(col("n_bigrams") <= 0).count() == 0,
      "fixture docs all long enough for bigrams")
  }

  test("seq pack: offsets stay inside the budget and packs fill in doc order") {
    val res = CorpusOps.seqPack(spark, sfDir)
    assert(res.filter(col("pack_offset") < 0 || col("pack_offset") >= 512).count() == 0)
    // within a source, pack_id is nondecreasing in doc_id
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val bad = res.withColumn("prev_pack", lag("pack_id", 1).over(w))
      .filter(col("prev_pack").isNotNull && col("pack_id") < col("prev_pack"))
    assert(bad.count() == 0)
    // token accounting: every doc's tokens land exactly once
    val tok = Tables.documents(spark, sfDir)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(res.agg(sum("n_tokens")).head.getLong(0) == tok)
  }
}
