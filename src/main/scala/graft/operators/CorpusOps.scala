package graft.operators

import graft.{Exprs, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for a training-data pipeline (the
  * BASELINE.json extension surface): rule-based quality filtering, PII
  * redaction, and sequence packing — the steps between "deduplicated text"
  * ([[Dedup]]) and "tokenizer-ready shards".
  *
  * Scale notes: [[qualityFilter]] and [[piiScrub]] are narrow per-row maps
  * over codegen'd built-ins (split/filter/regexp) — scan-speed at 100 TB
  * with full column pruning, no shuffle but the presentation sort.
  * [[seqPack]] shuffles once on its partition key; see its doc for why the
  * key must be (source, shard) at scale.
  */
object CorpusOps {

  /** Turns per conversation in the chat fixture (doc_id div/mod this) —
    * the width every conversation-grain operator derives turns from. */
  private[operators] val TurnsPerConv = 4

  /** Stride of the packed integer DPO lane key (`score·stride + (stride−1)
    * − turn`): MAX decodes to highest-score-then-LOWEST-turn, MIN to
    * lowest-score-then-HIGHEST-turn — [[dpoPairs]]' tiebreak semantics in
    * one window key. Correct ONLY while 0 ≤ turn < stride and score ≥ 0;
    * turn < stride is guarded below against the fixture width (a wider
    * fixture now fails at class-load instead of decoding garbage), and
    * score ≥ 0 holds structurally — it is floor(10000·letters/len) of
    * non-negative lengths with len > 0 (the empty-text filter). */
  private[operators] val DpoKeyStride = 16L
  require(TurnsPerConv <= DpoKeyStride,
    s"DpoKeyStride ($DpoKeyStride) must cover the fixture's turn width " +
      s"($TurnsPerConv) or the packed DPO key decodes wrong turns")

  /** Quality filtering — a Gopher-style rule chain (length band, mean word
    * length band, must-contain-a-stopword, repetition cap), each rule a
    * boolean column plus a combined `keep` and the FIRST violated rule as
    * `reject_reason` (the standard corpus-curation audit shape: never drop
    * rows silently — emit the decision and let the sink filter).
    *
    * Threshold comparisons are on exact integer ratios (IEEE division of
    * two integers is correctly rounded, so both engines compute the
    * identical double) — no epsilon games needed for oracle parity. */
  def qualityFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val w = split(col("text"), " ")
    val nWords = size(w).cast("long")
    val nDistinct = size(array_distinct(w)).cast("long")
    val stop = array(Seq("the", "a", "of", "and", "is").map(lit): _*)
    val nStop = size(filter(w, x => array_contains(stop, x))).cast("long")
    val awl = length(regexp_replace(col("text"), " ", "")).cast("double") / nWords
    val dupFrac = lit(1d) - nDistinct.cast("double") / nWords
    val rLen = nWords >= 30 && nWords <= 2000
    val rAwl = awl >= 2d && awl <= 4.8d
    val rStop = nStop > 0
    val rDup = dupFrac <= 0.6d
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      nWords.as("n_words"),
      Exprs.r4(awl).as("avg_word_len"),
      Exprs.r4(dupFrac).as("dup_frac"),
      rLen.as("r_len"), rAwl.as("r_word_len"), rStop.as("r_stopword"),
      rDup.as("r_repetition"),
      (rLen && rAwl && rStop && rDup).as("keep"),
      when(!rLen, "len").when(!rAwl, "word_len").when(!rStop, "stopword")
        .when(!rDup, "repetition").as("reject_reason"))
      .orderBy("doc_id")
  }

  val qualityFilterSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS w,
      |    CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS awl
      |  FROM documents),
      |s AS (
      |  SELECT doc_id,
      |    CAST(len(w) AS BIGINT) AS n_words, awl,
      |    1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS dup_frac,
      |    len(w) BETWEEN 30 AND 2000 AS r_len,
      |    awl BETWEEN 2.0 AND 4.8 AS r_word_len,
      |    len(list_filter(w, x -> list_contains(['the','a','of','and','is'], x))) > 0 AS r_stopword,
      |    1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) <= 0.6 AS r_repetition
      |  FROM t)
      |SELECT doc_id, n_words,
      |  floor(awl * 10000 + 0.5) / 10000 AS avg_word_len,
      |  floor(dup_frac * 10000 + 0.5) / 10000 AS dup_frac,
      |  r_len, r_word_len, r_stopword, r_repetition,
      |  r_len AND r_word_len AND r_stopword AND r_repetition AS keep,
      |  CASE WHEN NOT r_len THEN 'len' WHEN NOT r_word_len THEN 'word_len'
      |       WHEN NOT r_stopword THEN 'stopword'
      |       WHEN NOT r_repetition THEN 'repetition' END AS reject_reason
      |FROM s ORDER BY doc_id""".stripMargin

  /** The curation funnel — per-source survival through the pipeline's
    * gates, the one-page report a corpus owner reads to see WHERE each
    * source loses mass: raw → quality rules ([[qualityFilter]]'s keep
    * conjunction) → exact dedup (first doc per content hash) → benchmark
    * decontamination (trigram-shingle overlap ≥ 0.2 against the held-aside
    * benchmark slice, [[graft.operators.Dedup.contaminationCheck]]'s
    * contract). A skewed funnel (one source bleeding at the dedup stage,
    * another at decontamination) is the standard trigger for re-weighting
    * or dropping a source before training.
    *
    * Scale: per-doc stage flags compose in one pass over the corpus —
    * the only shuffles are the content-hash window (hash-partitioned),
    * the shingle→benchmark broadcast semi-join for stage-2 survivors
    * only, and the final source-grain aggregate. Counts are exact LONGs;
    * the survival fraction divides once per source row.
    *
    * The fixture corpus has no exact duplicates (its dup families are
    * near-dups), so — as [[graft.operators.EventsOps.eventsDedupe]]
    * synthesizes its double delivery — every 17th non-benchmark doc is
    * re-sent under a shifted id, deterministically in both engines, so
    * the dedup stage is genuinely exercised; the decontamination stage
    * is exercised on constructed data in spec (the fixture's contaminated
    * docs happen to fail the quality gate first). */
  def curationFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    val resend = docs
      .filter(col("doc_id") % 17 === 0 && col("doc_id") % 50 =!= 0)
      // high-bit re-send flag: 2^40 rounded up to a multiple of 50, so an
      // injected id (a) can never collide with a real doc_id below ~1.1e12
      // rows — a collision would break doc_id uniqueness and make the
      // dedup window's ORDER BY doc_id tie-break partition-dependent —
      // and (b) preserves doc_id % 50 (the benchmark-slice predicate
      // downstream), exactly as the old +1e6 offset did
      .withColumn("doc_id", col("doc_id") + lit(1099511627800L))
    curationFunnelOf(docs.unionByName(resend))
  }

  /** [[curationFunnel]] over any (doc_id, source, text) frame. */
  def curationFunnelOf(docsIn: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    val nWords = size(w).cast("long")
    val stop = array(Seq("the", "a", "of", "and", "is").map(lit): _*)
    val awl = length(regexp_replace(col("text"), " ", "")).cast("double") / nWords
    val keep = nWords >= 30 && nWords <= 2000 &&
      awl >= 2d && awl <= 4.8d &&
      size(filter(w, x => array_contains(stop, x))) > 0 &&
      lit(1d) - size(array_distinct(w)).cast("double") / nWords <= 0.6d
    // the benchmark slice (doc_id % 50 == 0) is held aside, never curated
    val corpus = docsIn.filter(col("doc_id") % 50 =!= 0)
    // stages 0-1 fold into ONE conditional aggregate — the quality HOFs run
    // exactly once per row (a per-stage cnt() would rescan the corpus and
    // re-evaluate the split/distinct chain; measured 22 s → 4 s at sf0.1)
    val stage01 = corpus.groupBy("source").agg(
      count(lit(1)).as("n_raw"),
      sum(when(keep, 1L).otherwise(0L)).as("n_quality"))
    val u = corpus.filter(keep)
      .select(col("doc_id"), col("source"), col("text"),
        md5(col("text")).as("h"))
      .withColumn("rn",
        row_number().over(Window.partitionBy("h").orderBy("doc_id")))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("source"), col("text"))
    // shingle over a MATERIALIZED words column ([[Dedup.shinglesExpr]]'s
    // contract) — slicing a re-split inside the position lambda is
    // O(words²) per doc and measured 20 s of the original 22 s
    def shingled(df: DataFrame): DataFrame = df
      .withColumn("words", split(col("text"), " "))
      .withColumn("shingles", array_distinct(expr(Dedup.shinglesExpr)))
    val bench = shingled(docsIn.filter(col("doc_id") % 50 === 0))
      .select(explode(col("shingles")).as("s")).distinct()
    // contaminated-survivor ids are a tiny set; the lineage cut stops the
    // final aggregate from replaying the whole u chain a second time
    // (released by the session owner's Hygiene.releaseAll)
    val hits = shingled(u)
      .select(col("doc_id"),
        size(col("shingles")).cast("long").as("n_shingles"),
        explode(col("shingles")).as("s"))
      .join(broadcast(bench), "s")
      .groupBy("doc_id", "n_shingles").agg(count(lit(1)).as("n_shared"))
      .filter(Exprs.r4(col("n_shared").cast("double") / col("n_shingles"))
        >= 0.2d)
      .select(col("doc_id"), lit(true).as("hit"))
      .localCheckpoint()
    // stages 2-3 fold the survivor table once: unique count + clean count
    val stage23 = u.join(broadcast(hits), Seq("doc_id"), "left")
      .groupBy("source").agg(
        count(lit(1)).as("n_unique"),
        sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_clean"))
    stage01.join(stage23, Seq("source"), "left")
      .select(col("source"),
        col("n_raw"),
        col("n_quality"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        coalesce(col("n_clean"), lit(0L)).as("n_clean"))
      .withColumn("survival",
        Exprs.r4(col("n_clean").cast("double") / col("n_raw")))
      .orderBy("source")
  }

  def curationFunnelSql: String =
    """WITH alldocs AS (
      |  SELECT doc_id, source, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1099511627800 AS doc_id, source, text FROM documents
      |  WHERE doc_id % 17 = 0 AND doc_id % 50 <> 0),
      |corpus AS (
      |  SELECT doc_id, source, text FROM alldocs WHERE doc_id % 50 <> 0),
      |qf AS (
      |  SELECT doc_id, source, text, md5(text) AS h
      |  FROM (
      |    SELECT doc_id, source, text, string_split(text, ' ') AS w,
      |      CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
      |        / len(string_split(text, ' ')) AS awl
      |    FROM corpus)
      |  WHERE len(w) BETWEEN 30 AND 2000 AND awl BETWEEN 2.0 AND 4.8
      |    AND len(list_filter(w, x ->
      |          list_contains(['the','a','of','and','is'], x))) > 0
      |    AND 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) <= 0.6),
      |u AS (
      |  SELECT doc_id, source, text FROM (
      |    SELECT doc_id, source, text,
      |      row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      |    FROM qf) WHERE rn = 1),
      |bench AS (
      |  SELECT DISTINCT unnest(list_distinct(list_transform(
      |    generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
      |    i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2),
      |           ' ')))) AS s
      |  FROM alldocs WHERE doc_id % 50 = 0),
      |ush AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
      |      i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2),
      |             ' '))) AS shingles
      |  FROM u),
      |hits AS (
      |  SELECT e.doc_id FROM (
      |    SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_shingles,
      |      unnest(shingles) AS s
      |    FROM ush) e JOIN bench USING (s)
      |  GROUP BY e.doc_id, e.n_shingles
      |  HAVING floor(CAST(count(*) AS DOUBLE) / n_shingles * 10000 + 0.5)
      |    / 10000 >= 0.2),
      |clean AS (SELECT u.* FROM u ANTI JOIN hits ON u.doc_id = hits.doc_id),
      |r0 AS (SELECT source, count(*) AS n_raw FROM corpus GROUP BY 1),
      |r1 AS (SELECT source, count(*) AS n_quality FROM qf GROUP BY 1),
      |r2 AS (SELECT source, count(*) AS n_unique FROM u GROUP BY 1),
      |r3 AS (SELECT source, count(*) AS n_clean FROM clean GROUP BY 1)
      |SELECT r0.source, r0.n_raw,
      |  coalesce(r1.n_quality, 0) AS n_quality,
      |  coalesce(r2.n_unique, 0) AS n_unique,
      |  coalesce(r3.n_clean, 0) AS n_clean,
      |  floor(CAST(coalesce(r3.n_clean, 0) AS DOUBLE) / r0.n_raw * 10000
      |    + 0.5) / 10000 AS survival
      |FROM r0 LEFT JOIN r1 USING (source) LEFT JOIN r2 USING (source)
      |  LEFT JOIN r3 USING (source)
      |ORDER BY r0.source""".stripMargin

  /** Quality-threshold sweep — the calibration table a curation run reads
    * BEFORE fixing a classifier cutoff: how many documents and tokens
    * survive at every score threshold. The continuous score here is the
    * engine's heuristic quality signal — vocabulary richness × saturated
    * stopword density, `(n_distinct/n_words) · min(10·n_stop/n_words, 1)`
    * in [0, 1] — but the sweep shape is classifier-agnostic: swap the
    * score column, keep the table.
    *
    * Scale: one corpus scan folds docs to 101 score buckets (map-side
    * combined); the survival curve is a cumulative window over the
    * BUCKET table — ≤101 rows, so the unpartitioned window is bounded by
    * construction, never corpus-sized. Every ratio divides the same two
    * exact LONGs in both engines, and bucketing happens on an identically
    * computed double product. */
  def qualityThresholdSweep(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = split(col("text"), " ")
    val nWords = size(w).cast("long")
    val nDistinct = size(array_distinct(w)).cast("long")
    val stop = array(Seq("the", "a", "of", "and", "is").map(lit): _*)
    val nStop = size(filter(w, x => array_contains(stop, x))).cast("long")
    val score = nDistinct.cast("double") / nWords *
      least(nStop.cast("double") / nWords * lit(10d), lit(1d))
    val perBucket = Tables.documents(spark, sfDir)
      .select(floor(score * lit(100d)).cast("long").as("bucket"),
        nWords.as("toks"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
    val desc101 = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perBucket
      .select(
        (col("bucket").cast("double") / lit(100d)).as("threshold"),
        col("n_docs"), col("n_tokens"),
        sum("n_docs").over(desc101).as("docs_kept"),
        sum("n_tokens").over(desc101).as("tokens_kept"),
        Exprs.r4(sum("n_docs").over(desc101).cast("double")
          / sum("n_docs").over(all)).as("doc_frac"),
        Exprs.r4(sum("n_tokens").over(desc101).cast("double")
          / sum("n_tokens").over(all)).as("token_frac"))
      .orderBy("threshold")
  }

  val qualityThresholdSweepSql: String =
    """WITH t AS (
      |  SELECT string_split(text, ' ') AS w FROM documents),
      |s AS (
      |  SELECT CAST(len(w) AS BIGINT) AS nw,
      |    CAST(len(list_distinct(w)) AS BIGINT) AS nd,
      |    CAST(len(list_filter(w,
      |      x -> list_contains(['the','a','of','and','is'], x))) AS BIGINT) AS ns
      |  FROM t),
      |b AS (
      |  SELECT CAST(floor(CAST(nd AS DOUBLE) / nw *
      |      least(CAST(ns AS DOUBLE) / nw * CAST(10 AS DOUBLE),
      |        CAST(1 AS DOUBLE)) * 100) AS BIGINT) AS bucket,
      |    nw FROM s),
      |p AS (
      |  SELECT bucket, count(*) AS n_docs, CAST(SUM(nw) AS BIGINT) AS n_tokens
      |  FROM b GROUP BY 1)
      |SELECT CAST(bucket AS DOUBLE) / 100 AS threshold, n_docs, n_tokens,
      |  CAST(SUM(n_docs) OVER (ORDER BY bucket DESC
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS docs_kept,
      |  CAST(SUM(n_tokens) OVER (ORDER BY bucket DESC
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tokens_kept,
      |  floor(CAST(SUM(n_docs) OVER (ORDER BY bucket DESC
      |      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
      |    / SUM(n_docs) OVER () * 10000 + 0.5) / 10000 AS doc_frac,
      |  floor(CAST(SUM(n_tokens) OVER (ORDER BY bucket DESC
      |      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
      |    / SUM(n_tokens) OVER () * 10000 + 0.5) / 10000 AS token_frac
      |FROM p ORDER BY threshold""".stripMargin

  /** PII redaction — scrub emails and phone-shaped tokens to placeholder
    * tags, reporting per-doc hit counts. The fixture corpus carries no PII,
    * so (as [[EventsOps.eventsDedupe]] synthesizes its double delivery) a
    * deterministic PII suffix is injected FIRST — the operator under test is
    * the scrub, and the injection makes it provably exercised on every row.
    * Patterns stay within the regex intersection both Java and RE2 compile
    * identically (char classes + bounded repetition, no lookaround). */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phone = "\\+[0-9][0-9\\-]{6,}[0-9]"
    val injected = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
      lit(" today"))
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      regexp_count(injected, lit(email)).cast("long").as("n_emails"),
      regexp_count(injected, lit(phone)).cast("long").as("n_phones"),
      regexp_replace(regexp_replace(injected, email, "<EMAIL>"),
        phone, "<PHONE>").as("scrubbed"))
      .orderBy("doc_id")
  }

  val piiScrubSql: String =
    """WITH t AS (
      |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
      |    || '@example.com or +1-555-'
      |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today' AS injected
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(injected, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(injected, '\+[0-9][0-9\-]{6,}[0-9]')) AS BIGINT) AS n_phones,
      |  regexp_replace(regexp_replace(injected,
      |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |    '\+[0-9][0-9\-]{6,}[0-9]', '<PHONE>', 'g') AS scrubbed
      |FROM t ORDER BY doc_id""".stripMargin

  /** URL canonicalization + dedup — the C4/CCNet curation stage that runs
    * BEFORE any text is fetched: collapse crawl-frontier URL variants
    * (scheme/host case, `www.` prefix, default ports, duplicate slashes,
    * trailing slash, fragments, tracking parameters, query-parameter
    * order) to one canonical form and keep one document per canonical URL.
    * The fixture corpus carries no URL column, so (the [[piiScrub]]
    * injected-fixture pattern) a deterministic raw URL is synthesized per
    * document, exercising every rule: mixed-case scheme/host, optional
    * `WWW.`, explicit default vs non-default ports, `//` runs, optional
    * trailing slash, tracking params in two different orders, fragments.
    *
    * Spark-first shape: the whole normalization is one narrow codegen'd
    * expression chain (regexp_extract / split / filter / array_sort /
    * array_join) — no explode; the dedup is a hash groupBy on the
    * canonical string (map-side combine, slim rows — at 100 TB this is
    * the cheapest shuffle in the pipeline because only URLs move, never
    * text). Keeper = min doc_id, the deterministic first-crawled rule.
    * Every regex stays in the Java∩RE2 intersection so the DuckDB oracle
    * replays the identical chain. */
  def urlDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val d = col("doc_id")
    val raw = concat(
      when(d % 2 === 0, lit("HTTPS")).otherwise(lit("http")), lit("://"),
      when(d % 3 === 0, lit("WWW.")).otherwise(lit("")),
      col("source"),
      when(d % 3 === 0, lit(".Example.COM")).otherwise(lit(".example.com")),
      when(d % 4 === 0,
        when(d % 2 === 0, lit(":443")).otherwise(lit(":80")))
        .otherwise(when(d % 4 === 1, lit(":8080")).otherwise(lit(""))),
      lit("/Articles//item-"), (d % 50).cast("string"),
      when(d % 5 === 0, lit("/")).otherwise(lit("")),
      when(d % 2 === 0,
        concat(lit("?utm_source=feed&page=2&id="), (d % 25).cast("string")))
        .otherwise(concat(lit("?id="), (d % 25).cast("string"),
          lit("&utm_campaign=x&page=2"))),
      lit("#sec"), (d % 3).cast("string"))
    val u = col("raw_url")
    val scheme = lower(regexp_extract(u, "^([A-Za-z]+)://", 1))
    val hostport = regexp_extract(u, "^[A-Za-z]+://([^/?#]+)", 1)
    val host =
      regexp_replace(lower(split_part(hostport, lit(":"), lit(1))),
        "^www\\.", "")
    val port = split_part(hostport, lit(":"), lit(2))
    val portN = when(port === "" ||
        (scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path0 = regexp_replace(regexp_replace(
      regexp_extract(u, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1),
      "/{2,}", "/"), "/$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val kept = array_sort(filter(split(
      regexp_extract(u, "\\?([^#]*)", 1), "&"),
      p => p =!= "" &&
        !regexp_like(p, lit("^(utm_[a-z]+|ref|fbclid|gclid)="))))
    val qpart = when(size(kept) > 0,
      concat(lit("?"), array_join(kept, "&"))).otherwise(lit(""))
    Tables.documents(spark, sfDir)
      .select(d, raw.as("raw_url"))
      .select(col("doc_id"), u,
        concat(scheme, lit("://"), host, portN, path, qpart)
          .as("canonical_url"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("keeper_doc_id"),
        min("raw_url").as("sample_raw"))
      .orderBy("canonical_url")
  }

  val urlDedupSql: String =
    """WITH u AS (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END) || '://'
      |    || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
      |    || source
      |    || (CASE WHEN doc_id % 3 = 0 THEN '.Example.COM' ELSE '.example.com' END)
      |    || (CASE WHEN doc_id % 4 = 0 THEN
      |          (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END)
      |        WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END)
      |    || '/Articles//item-' || CAST(doc_id % 50 AS VARCHAR)
      |    || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
      |    || (CASE WHEN doc_id % 2 = 0
      |        THEN '?utm_source=feed&page=2&id=' || CAST(doc_id % 25 AS VARCHAR)
      |        ELSE '?id=' || CAST(doc_id % 25 AS VARCHAR) || '&utm_campaign=x&page=2' END)
      |    || '#sec' || CAST(doc_id % 3 AS VARCHAR) AS raw_url
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, raw_url,
      |    lower(regexp_extract(raw_url, '^([A-Za-z]+)://', 1)) AS scheme,
      |    regexp_replace(lower(split_part(
      |      regexp_extract(raw_url, '^[A-Za-z]+://([^/?#]+)', 1), ':', 1)),
      |      '^www\.', '') AS host,
      |    split_part(regexp_extract(raw_url, '^[A-Za-z]+://([^/?#]+)', 1),
      |      ':', 2) AS port,
      |    regexp_replace(regexp_replace(
      |      regexp_extract(raw_url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
      |      '/{2,}', '/', 'g'), '/$', '') AS path0,
      |    list_sort(list_filter(string_split(
      |      regexp_extract(raw_url, '\?([^#]*)', 1), '&'),
      |      x -> x <> '' AND NOT regexp_matches(x,
      |        '^(utm_[a-z]+|ref|fbclid|gclid)='))) AS kept
      |  FROM u),
      |c AS (
      |  SELECT doc_id, raw_url,
      |    scheme || '://' || host
      |    || (CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
      |          OR (scheme = 'http' AND port = '80')
      |        THEN '' ELSE ':' || port END)
      |    || (CASE WHEN path0 = '' THEN '/' ELSE path0 END)
      |    || (CASE WHEN len(kept) > 0
      |        THEN '?' || array_to_string(kept, '&') ELSE '' END)
      |      AS canonical_url
      |  FROM p)
      |SELECT canonical_url, count(*) AS n_docs,
      |  min(doc_id) AS keeper_doc_id, min(raw_url) AS sample_raw
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** HTML boilerplate extraction — the jusText/trafilatura curation stage
    * (tag-strip + main-content-by-text-density), the one common LLM
    * corpus-prep step with no representative until now. Each document is
    * wrapped in a deterministic HTML page (head/style/title, a link-heavy
    * nav, a short promo div, the text as two paragraph blocks, a footer
    * with a link — the [[piiScrub]] injected-fixture pattern), then the
    * extractor recovers the main content with a pure expression chain:
    * drop `<style>`/`<title>` subtrees, split on block-level tags, strip
    * inline tags per block, and classify a block GOOD iff its text is
    * long (≥ 40 chars) and link-free — the jusText rule with length
    * standing in for stopword density (the fixture corpus has no natural
    * stopword list). Emits per doc: block counts, extracted length,
    * dropped-boilerplate length, and the extracted text itself.
    *
    * Spark-first shape: the whole pipeline is codegen'd array lambdas
    * (`split` → `filter` → `transform` → `array_join`) — one narrow
    * doc-grain map, NO explode/shuffle; block order is array order so the
    * extraction is deterministic and the DuckDB oracle replays the same
    * list pipeline (Java∩RE2-portable regexes only). */
  def htmlExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val html = concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit("</title><style>.m{color:#333}</style></head><body>"),
      lit("""<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>"""),
      lit("""<div class="promo">Subscribe now! Limited offer!</div>"""),
      lit("<p>"), expr("substring(text, 1, cast(length(text) div 2 as int))"),
      lit("</p><p>"), expr("substring(text, cast(length(text) div 2 as int) + 1)"),
      lit("</p>"),
      lit("""<footer>Copyright 2024 Example Corp - <a href="/tos">Terms</a></footer></body></html>"""))
    val noHead = regexp_replace(
      regexp_replace(html, "<title[^>]*>[^<]*</title>", " "),
      "<style[^>]*>[^<]*</style>", " ")
    val blockRe = "</?(?:html|head|body|nav|p|div|footer)[^>]*>"
    def stripped(b: Column): Column =
      trim(regexp_replace(b, "<[^>]*>", ""))
    val nonEmpty = filter(split(noHead, blockRe),
      b => length(stripped(b)) > 0)
    val good = filter(nonEmpty, b =>
      length(stripped(b)) >= 40 && !b.contains("<a "))
    val boiler = filter(nonEmpty, b =>
      length(stripped(b)) < 40 || b.contains("<a "))
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      size(nonEmpty).cast("long").as("n_blocks"),
      size(good).cast("long").as("n_good"),
      array_join(transform(good, stripped _), " ").as("extracted"),
      length(array_join(transform(good, stripped _), " ")).cast("long")
        .as("extracted_len"),
      aggregate(transform(boiler, b => length(stripped(b)).cast("long")),
        lit(0L), (a, x) => a + x).as("boiler_len"))
      .orderBy("doc_id")
  }

  val htmlExtractSql: String =
    """WITH page AS (
      |  SELECT doc_id,
      |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
      |    || '</title><style>.m{color:#333}</style></head><body>'
      |    || '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>'
      |    || '<div class="promo">Subscribe now! Limited offer!</div>'
      |    || '<p>' || substr(text, 1, CAST(length(text) // 2 AS INT))
      |    || '</p><p>' || substr(text, CAST(length(text) // 2 AS INT) + 1)
      |    || '</p>'
      |    || '<footer>Copyright 2024 Example Corp - <a href="/tos">Terms</a></footer></body></html>'
      |      AS html
      |  FROM documents),
      |cleaned AS (
      |  SELECT doc_id, regexp_replace(
      |    regexp_replace(html, '<title[^>]*>[^<]*</title>', ' ', 'g'),
      |    '<style[^>]*>[^<]*</style>', ' ', 'g') AS html
      |  FROM page),
      |blk AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(html,
      |      '</?(?:html|head|body|nav|p|div|footer)[^>]*>'),
      |      b -> length(trim(regexp_replace(b, '<[^>]*>', '', 'g'))) > 0)
      |      AS blocks
      |  FROM cleaned),
      |cls AS (
      |  SELECT doc_id, blocks,
      |    list_filter(blocks, b ->
      |      length(trim(regexp_replace(b, '<[^>]*>', '', 'g'))) >= 40
      |      AND NOT contains(b, '<a ')) AS good,
      |    list_filter(blocks, b ->
      |      length(trim(regexp_replace(b, '<[^>]*>', '', 'g'))) < 40
      |      OR contains(b, '<a ')) AS boiler
      |  FROM blk)
      |SELECT doc_id,
      |  CAST(len(blocks) AS BIGINT) AS n_blocks,
      |  CAST(len(good) AS BIGINT) AS n_good,
      |  -- DuckDB array_to_string of an EMPTY list is NULL where Spark's
      |  -- array_join is '' — coalesce both derived columns
      |  coalesce(array_to_string(list_transform(good,
      |    b -> trim(regexp_replace(b, '<[^>]*>', '', 'g'))), ' '), '') AS extracted,
      |  CAST(coalesce(length(array_to_string(list_transform(good,
      |    b -> trim(regexp_replace(b, '<[^>]*>', '', 'g'))), ' ')), 0) AS BIGINT)
      |    AS extracted_len,
      |  CAST(coalesce(list_sum(list_transform(boiler,
      |    b -> length(trim(regexp_replace(b, '<[^>]*>', '', 'g'))))), 0)
      |    AS BIGINT) AS boiler_len
      |FROM cls ORDER BY doc_id""".stripMargin

  /** Sequence packing — assign documents to fixed token-budget packs
    * (concat-and-chunk: a running token total per source; a document's pack
    * is the budget-chunk its first token lands in). The final corpus-prep
    * step before tokenization: packs become training sequences.
    *
    * Scale shape: a running sum is inherently serial per partition key, so
    * the key must bound partition size. Per (source) is fine when sources
    * are balanced (the fixture); at 100 TB the same code runs per
    * (source, shard = pmod(hash(doc_id), k)) — packing quality is
    * unaffected (packs never span shards by construction) and the window
    * parallelizes k-fold. One shuffle on the partition key. */
  def seqPack(spark: SparkSession, sfDir: String, budget: Int = 512): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / lit(budget.toLong)).cast("long")
          .as("pack_id"),
        (col("cum") - col("n_tokens") - lit(budget.toLong)
          * floor((col("cum") - col("n_tokens")) / lit(budget.toLong)))
          .cast("long").as("pack_offset"))
      .orderBy("doc_id")
  }

  /** Within-document repetition signals — the other half of the Gopher
    * quality family ([[qualityFilter]] covers word-level): duplicate
    * bigram/trigram fractions (1 − distinct/total n-grams). High values
    * mark boilerplate/spam long before corpus-level dedup sees a pair.
    * N-grams are per-row array transforms over 1-based `element_at`
    * indices — narrow, codegen'd, no shuffle. */
  def repNgrams(spark: SparkSession, sfDir: String): DataFrame = {
    val w = split(col("text"), " ")
    // n-grams as zipped offset slices, NOT a lambda over indices: a lambda
    // body referencing the outer `w` re-evaluates the split PER ELEMENT in
    // interpreted HOF eval (measured 21 s for 5k docs — O(words²) splits);
    // slice+arrays_zip builds each array once, and struct equality inside
    // array_distinct spares the per-gram string concat entirely (a word
    // pair and its space-joined string dedupe identically — words cannot
    // contain the separator they were split on). `greatest(len,0)` keeps
    // slice lengths legal on docs shorter than the n-gram (empty arrays).
    def ngrams(n: Int): Column = {
      val len = greatest(size(w) - (n - 1), lit(0))
      arrays_zip((0 until n).map(o => slice(w, lit(o + 1), len)): _*)
    }
    def dupFrac(g: Column): Column =
      lit(1d) - size(array_distinct(g)).cast("double") / size(g)
    val bg = ngrams(2)
    val tg = ngrams(3)
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      size(bg).cast("long").as("n_bigrams"),
      Exprs.r4(dupFrac(bg)).as("dup_bigram_frac"),
      Exprs.r4(dupFrac(tg)).as("dup_trigram_frac"))
      .orderBy("doc_id")
  }

  val repNgramsSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    list_transform(range(1, len(w) - 1 + 1),
      |      i -> w[i] || ' ' || w[i + 1]) AS bg,
      |    list_transform(range(1, len(w) - 2 + 1),
      |      i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]) AS tg
      |  FROM t)
      |SELECT doc_id,
      |  CAST(len(bg) AS BIGINT) AS n_bigrams,
      |  floor((1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)) * 10000 + 0.5) / 10000 AS dup_bigram_frac,
      |  floor((1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg)) * 10000 + 0.5) / 10000 AS dup_trigram_frac
      |FROM g ORDER BY doc_id""".stripMargin

  /** BM25 relevance scoring of every document against a fixed query — the
    * retrieval-side primitive (corpus search / data selection by query
    * relevance). Corpus statistics (N, avgdl, per-term df) are one
    * scalar aggregate broadcast to the scan; term frequencies are per-row
    * array filters — so the whole query is ONE pass over the corpus plus
    * a 1-row broadcast, at any corpus size.
    *
    * Oracle-parity note: every input to the arithmetic is an exact double
    * (integer counts, halves, 0.75), so products/quotients are identical
    * across engines; `ln` can differ by 1 ulp in theory — the 1e-4 output
    * grid absorbs it. */
  def bm25Score(spark: SparkSession, sfDir: String,
      terms: Seq[String] = Seq("spark", "table", "row"),
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val w = split(col("text"), " ")
    def tf(t: String): Column =
      size(filter(w, x => x === lit(t))).cast("long")
    val docs = Tables.documents(spark, sfDir).select(
      col("doc_id") +: size(w).cast("long").as("dl") +:
        terms.map(t => tf(t).as(s"tf_$t")): _*)
    val aggCols = count(lit(1)).as("n_docs") +:
      avg(col("dl")).as("avgdl") +:
      terms.map(t =>
        sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = docs.agg(aggCols.head, aggCols.tail: _*)
    val scored = docs.crossJoin(broadcast(stats))
    val score = terms.map { t =>
      val tfc = col(s"tf_$t").cast("double")
      val idf = log(lit(1d) + (col("n_docs").cast("double") - col(s"df_$t") + 0.5)
        / (col(s"df_$t") + 0.5))
      idf * (tfc * (k1 + 1)) /
        (tfc + lit(k1) * (lit(1d) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    scored.select(
      col("doc_id") +: col("dl") +: terms.map(t => col(s"tf_$t")) :+
        Exprs.r4(score).as("bm25"): _*)
      .orderBy("doc_id")
  }

  val bm25ScoreSql: String = {
    val terms = Seq("spark", "table", "row")
    val tfs = terms.map(t =>
      s"CAST(len(list_filter(w, x -> x = '$t')) AS BIGINT) AS tf_$t").mkString(",\n      |    ")
    val dfs = terms.map(t =>
      s"SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(", ")
    val score = terms.map(t =>
      s"ln(1.0 + (CAST(n_docs AS DOUBLE) - df_$t + 0.5) / (df_$t + 0.5))" +
        s" * (CAST(tf_$t AS DOUBLE) * (1.2 + 1)) / (CAST(tf_$t AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))")
      .mkString("\n      |    + ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |d AS (
      |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
      |    $tfs
      |  FROM t),
      |s AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl, $dfs FROM d)
      |SELECT doc_id, dl, ${terms.map(t => s"tf_$t").mkString(", ")},
      |  floor(($score) * 10000 + 0.5) / 10000 AS bm25
      |FROM d, s ORDER BY doc_id""".stripMargin
  }

  /** Cross-document boilerplate detection — the corpus-level complement of
    * [[repNgrams]] (within-doc): a document's boilerplate fraction is the
    * share of its distinct word 5-grams whose document frequency across the
    * whole corpus (including this document) reaches `minDf` — i.e. grams
    * shared with at least `minDf - 1` OTHER documents (nav bars, license
    * headers, spam
    * templates — the stuff line-dedup removes in newline-structured
    * corpora; this fixture corpus is single-line, so grams are the unit).
    *
    * Scale shape: grams leave the row as 64-bit [[Exprs.md5num]] hashes,
    * never strings — the two shuffles (df count, df join-back) carry
    * (hash, doc_id) pairs only. Hash collisions inflate df identically on
    * both engines (same hash function in the oracle), and at a 100 TB gram
    * cardinality the same code widens to the full md5 (one-site edit,
    * [[Exprs.md5num]]'s contract). The gram hash set is built per-row with
    * slice+zip (ONE pass over the words — a lambda over indices would
    * re-evaluate upstream expressions per element in interpreted HOF eval,
    * see [[repNgrams]]), and `slice` with a 0 clamp keeps short docs legal:
    * a doc with < 5 words contributes no grams and drops from the output on
    * both sides. */
  def boilerplateNgrams(spark: SparkSession, sfDir: String,
      n: Int = 5, minDf: Int = 2): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val len = greatest(size(col("w")) - (n - 1), lit(0))
    val zipped = arrays_zip(
      (0 until n).map(o => slice(col("w"), lit(o + 1), len).as(s"g$o")): _*)
    val grams = docs.select(col("doc_id"),
      explode(array_distinct(transform(zipped, s =>
        Exprs.md5num(concat_ws(" ",
          (0 until n).map(o => s.getField(s"g$o")): _*))))).as("gram"))
    // rows are (doc, gram) distinct-within-doc, so count(*) per gram = df
    val df = grams.groupBy("gram").agg(count(lit(1)).as("df"))
    grams.join(df, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_common"))
      .select(col("doc_id"), col("n_grams"), col("n_common"),
        Exprs.r4(col("n_common").cast("double") / col("n_grams"))
          .as("boilerplate_frac"))
      .orderBy("doc_id")
  }

  val boilerplateNgramsSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, len(w) - 4 + 1),
      |    i -> CAST(('0x' || substr(md5(
      |      w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]),
      |      1, 8)) AS BIGINT)))) AS gram
      |  FROM t),
      |df AS (SELECT gram, count(*) AS df FROM g GROUP BY 1)
      |SELECT doc_id, count(*) AS n_grams,
      |  CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
      |  floor(CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*) * 10000 + 0.5) / 10000 AS boilerplate_frac
      |FROM g JOIN df USING (gram)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** The corpus-prep operators composed END TO END as one plan — the shape
    * an actual curation run has: quality-rule gate → PII scrub → exact
    * dedup (first doc per content hash survives) → train/val/test split →
    * sequence packing of the survivors, per (split, source).
    *
    * The point is the composition: one scan of the corpus, per-row stages
    * fused into the same codegen span, and exactly TWO shuffles for the
    * whole pipeline — the dedup window (content-hash key) and the pack
    * window (split × source key) — plus the presentation sort. Filters run
    * BEFORE both shuffles, so the exchanges carry only surviving docs. The
    * same deterministic PII injection as [[piiScrub]] keeps the scrub stage
    * observable (the fixture corpus carries no real PII), and the dedup
    * hash is computed on the ORIGINAL text so injection can't mask a
    * duplicate. */
  def corpusPipeline(spark: SparkSession, sfDir: String,
      budget: Int = 512): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = split(col("text"), " ")
    val nWords = size(w).cast("long")
    val stop = array(Seq("the", "a", "of", "and", "is").map(lit): _*)
    val awl = length(regexp_replace(col("text"), " ", "")).cast("double") / nWords
    val keep = nWords >= 30 && nWords <= 2000 &&
      awl >= 2d && awl <= 4.8d &&
      size(filter(w, x => array_contains(stop, x))) > 0 &&
      lit(1d) - size(array_distinct(w)).cast("double") / nWords <= 0.6d
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phone = "\\+[0-9][0-9\\-]{6,}[0-9]"
    val injected = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
      lit(" today"))
    val scrubbed = regexp_replace(regexp_replace(injected, email, "<EMAIL>"),
      phone, "<PHONE>")
    val u = Exprs.md5num(concat(lit("split1_"), col("doc_id").cast("string")))
      .cast("double") / lit(4294967296.0)
    val dedupW = Window.partitionBy("content_hash").orderBy("doc_id")
    val packW = Window.partitionBy("split", "source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir)
      .filter(keep)                                             // quality gate
      .select(col("doc_id"), col("lang"), col("source"),
        md5(col("text")).as("content_hash"),                    // pre-scrub
        size(split(scrubbed, " ")).cast("long").as("n_tokens"), // post-scrub
        when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test")
          .as("split"))
      .withColumn("rn", row_number().over(dedupW))
      .filter(col("rn") === 1)                                  // exact dedup
      .withColumn("cum", sum("n_tokens").over(packW))           // packing
      .select(col("doc_id"), col("lang"), col("source"), col("split"),
        col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / lit(budget.toLong)).cast("long")
          .as("pack_id"))
      .orderBy("doc_id")
  }

  val corpusPipelineSql: String =
    """WITH kept AS (
      |  SELECT doc_id, lang, source, text,
      |    string_split(text, ' ') AS w,
      |    CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS awl
      |  FROM documents),
      |gated AS (
      |  SELECT doc_id, lang, source, text FROM kept
      |  WHERE len(w) BETWEEN 30 AND 2000 AND awl BETWEEN 2.0 AND 4.8
      |    AND len(list_filter(w, x -> list_contains(['the','a','of','and','is'], x))) > 0
      |    AND 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) <= 0.6),
      |scrubbed AS (
      |  SELECT doc_id, lang, source, md5(text) AS content_hash,
      |    CAST(len(string_split(regexp_replace(regexp_replace(
      |      text || ' contact user' || CAST(doc_id AS VARCHAR)
      |        || '@example.com or +1-555-'
      |        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today',
      |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |      '\+[0-9][0-9\-]{6,}[0-9]', '<PHONE>', 'g'), ' ')) AS BIGINT) AS n_tokens,
      |    CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM (SELECT *,
      |    CAST(('0x' || substr(md5('split1_' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |      / 4294967296.0 AS u
      |    FROM gated)),
      |deduped AS (
      |  SELECT * FROM (SELECT *,
      |    row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
      |    FROM scrubbed) WHERE rn = 1),
      |packed AS (
      |  SELECT *, SUM(n_tokens) OVER (PARTITION BY split, source ORDER BY doc_id
      |    ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM deduped)
      |SELECT doc_id, lang, source, split, n_tokens,
      |  CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS pack_id
      |FROM packed ORDER BY doc_id""".stripMargin

  def seqPackSql(budget: Int = 512): String =
    s"""WITH t AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT *, SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |    ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM t)
      |SELECT doc_id, source, n_tokens,
      |  CAST(floor((cum - n_tokens) / $budget.0) AS BIGINT) AS pack_id,
      |  CAST(cum - n_tokens - $budget * floor((cum - n_tokens) / $budget.0) AS BIGINT) AS pack_offset
      |FROM c ORDER BY doc_id""".stripMargin

  /** Sliding-window document chunking — split each document into
    * fixed-size token windows with overlap (`size`=64 tokens, `stride`=48,
    * so consecutive chunks share 16 tokens): the retrieval/embedding prep
    * step that turns documents into context-window-sized passages while
    * the overlap keeps sentences that straddle a boundary findable.
    * Output: one row per chunk with its token count and an md5 content
    * signature (what an embedding job would key its cache on), provenance
    * preserved via (doc_id, chunk_id).
    *
    * Chunk starts are `sequence(0, n_tokens-1, stride)` — every token is
    * covered, the final chunks shorten at the tail. Purely map-side
    * (tokenize → per-row start list → explode → slice/hash); the ONLY
    * exchange in the plan is the presentation sort's range partition, so
    * at 100 TB chunking runs at scan speed and the output partitions by
    * whatever the downstream embed/index step needs. */
  def docChunks(spark: SparkSession, sfDir: String,
      size: Int = 64, stride: Int = 48): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(expr(s"sequence(0, greatest(size(toks) - 1, 0), $stride)"))
          .as(Seq("chunk_id", "start")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        expr(s"slice(toks, start + 1, $size)").as("chunk"))
      .select(col("doc_id"), col("chunk_id"),
        org.apache.spark.sql.functions.size(col("chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")

  def docChunksSql(size: Int = 64, stride: Int = 48): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |s AS (
       |  SELECT doc_id, toks,
       |    unnest(generate_series(0,
       |      CAST(floor(greatest(len(toks) - 1, 0) / $stride.0) AS BIGINT))) AS chunk_id
       |  FROM t)
       |SELECT doc_id, chunk_id,
       |  CAST(len(list_slice(toks, chunk_id * $stride + 1,
       |    chunk_id * $stride + $size)) AS BIGINT) AS n_tokens,
       |  md5(array_to_string(list_slice(toks, chunk_id * $stride + 1,
       |    chunk_id * $stride + $size), ' ')) AS chunk_md5
       |FROM s ORDER BY doc_id, chunk_id""".stripMargin

  /** Content-defined chunking at token grain — the variable-length
    * counterpart of [[docChunks]]'s fixed stride windows, the CDC family
    * of LBFS (Muthitacharoen et al., SOSP '01) and FastCDC (Xia et al.,
    * FAST '16) applied to token streams: a chunk boundary falls AFTER
    * every token whose md5-derived hash ≡ 0 (mod `m`), so the expected
    * chunk length is `m` tokens and — the property fixed windows lack —
    * boundaries are SHIFT-ROBUST: inserting or deleting one token
    * re-chunks only its own neighborhood, leaving every other chunk's
    * content hash intact, which is what makes sub-document dedup
    * ([[cdcDedup]]) stable across near-identical document revisions.
    *
    * Scale shape: the boundary scan, chunk slicing, and content hashing
    * are ALL per-row array kernels (`transform`/`filter`/`slice` +
    * `posexplode` — whole-stage codegen, no UDF); unlike the oracle's
    * window formulation there is no per-document window and no shuffle —
    * the ONLY exchange in the plan is the presentation sort, so at 100 TB
    * chunking runs at scan speed (plan-audited). Output: one row per
    * chunk, `(doc_id, chunk_id, tok_start, n_toks, chunk_md5)`,
    * provenance-keyed like [[docChunks]]. */
  def cdcChunks(spark: SparkSession, sfDir: String, m: Int = 8): DataFrame =
    cdcChunkRows(spark, sfDir, m).orderBy("doc_id", "chunk_id")

  /** [[cdcChunks]] before the presentation sort — shared with
    * [[cdcDedup]] so the dedup plan pays no intermediate order. */
  private def cdcChunkRows(spark: SparkSession, sfDir: String,
      m: Int): DataFrame =
    cdcChunksOf(Tables.documents(spark, sfDir), m)

  /** The CDC chunk kernel over ANY `(doc_id, text)` frame — exposed for
    * the shift-robustness property spec. */
  private[graft] def cdcChunksOf(docs: DataFrame, m: Int): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      // 0-based positions whose token CLOSES a chunk; a boundary on the
      // final token would open an empty phantom chunk — filtered with
      // `s < size(toks)` on the start list
      .withColumn("bpos", expr(s"""filter(transform(toks, (t, p) ->
          CASE WHEN CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT)
            % $m = 0 THEN p END), x -> x IS NOT NULL)"""))
      .withColumn("starts", expr(
        "filter(concat(array(0), transform(bpos, p -> p + 1)), s -> s < size(toks))"))
      .select(col("doc_id"), col("toks"),
        posexplode(expr("""transform(sequence(0, size(starts) - 1), j ->
            named_struct('s', starts[j],
              'n', (CASE WHEN j = size(starts) - 1 THEN size(toks)
                    ELSE starts[j + 1] END) - starts[j]))"""))
          .as(Seq("chunk_id", "c")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        (col("c.s") + 1).cast("long").as("tok_start"),
        col("c.n").cast("long").as("n_toks"),
        md5(concat_ws(" ", expr("slice(toks, c.s + 1, c.n)")))
          .as("chunk_md5"))

  def cdcChunksSql(m: Int = 8): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |tok AS (SELECT doc_id, unnest(w) AS tk,
       |          generate_subscripts(w, 1) AS i FROM t),
       |flg AS (SELECT doc_id, tk, i,
       |  CASE WHEN CAST(('0x' || substr(md5(tk), 1, 8)) AS BIGINT) % $m = 0
       |    THEN 1 ELSE 0 END AS b FROM tok),
       |cid AS (SELECT doc_id, tk, i,
       |  CAST(COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY i
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS chunk_id
       |  FROM flg)
       |SELECT doc_id, chunk_id, CAST(min(i) AS BIGINT) AS tok_start,
       |  CAST(count(*) AS BIGINT) AS n_toks,
       |  md5(string_agg(tk, ' ' ORDER BY i)) AS chunk_md5
       |FROM cid GROUP BY 1, 2 ORDER BY doc_id, chunk_id""".stripMargin

  /** Sub-document duplication via CDC chunks — boilerplate paragraphs,
    * license headers, and templated passages surface as the SAME
    * content-defined chunk hash across different documents, at whatever
    * length the content dictates (vs [[boilerplateNgrams]]' fixed n).
    * Output: every chunk hash seen in more than one document, with its
    * occurrence count, document reach, length, and first carrier.
    *
    * Scale shape: chunking is map-side ([[cdcChunks]]); the dedup is ONE
    * hash-grain map-side-combined aggregate (never all-pairs — the
    * [[graft.operators.Dedup.dedupExact]] shape at chunk grain), and the
    * output is bounded by the duplicated-chunk vocabulary, not the
    * corpus. */
  def cdcDedup(spark: SparkSession, sfDir: String, m: Int = 8): DataFrame =
    cdcChunkRows(spark, sfDir, m)
      .groupBy("chunk_md5")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        max("n_toks").as("n_toks"),
        min("doc_id").as("first_doc"))
      .filter(col("n_docs") > 1)
      .orderBy(desc("n_occurrences"), col("chunk_md5"))

  def cdcDedupSql(m: Int = 8): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |tok AS (SELECT doc_id, unnest(w) AS tk,
       |          generate_subscripts(w, 1) AS i FROM t),
       |flg AS (SELECT doc_id, tk, i,
       |  CASE WHEN CAST(('0x' || substr(md5(tk), 1, 8)) AS BIGINT) % $m = 0
       |    THEN 1 ELSE 0 END AS b FROM tok),
       |cid AS (SELECT doc_id, tk, i,
       |  CAST(COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY i
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS chunk_id
       |  FROM flg),
       |ch AS (SELECT doc_id, chunk_id, CAST(count(*) AS BIGINT) AS n_toks,
       |  md5(string_agg(tk, ' ' ORDER BY i)) AS chunk_md5
       |  FROM cid GROUP BY 1, 2)
       |SELECT chunk_md5, count(DISTINCT doc_id) AS n_docs,
       |  count(*) AS n_occurrences, max(n_toks) AS n_toks,
       |  min(doc_id) AS first_doc
       |FROM ch GROUP BY 1 HAVING count(DISTINCT doc_id) > 1
       |ORDER BY n_occurrences DESC, chunk_md5""".stripMargin

  // ---- trained quality classifier (GPT-3-style LR over hashed features) --

  /** The squashing function for [[lrQuality]], built ONLY from IEEE
    * `+ − × ÷` so both engines compute bit-identical doubles:
    * σ̃(z) = 1 / (1 + ê(−z̄)) with z̄ = clamp(z, ±30) and
    * ê(u) = (1 + u/1024)^1024 evaluated as TEN EXPLICIT SQUARINGS.
    * libm `exp` is NOT cross-engine-deterministic on this box (measured:
    * 192 of 200k sigmoid evaluations differ by 1–2 ulp between
    * `Math.exp` and DuckDB `exp`), while every elementary IEEE operation
    * is correctly rounded and therefore identical given identical
    * evaluation order — the scaling-and-squaring form keeps the whole
    * training loop inside that guarantee. ê tracks exp within ~z²/2048
    * relative error on the clamped range: a smooth monotone sigmoid,
    * which is all gradient training needs.
    *
    * NOTE the squarings must be MATERIALIZED columns, not one folded
    * expression: `c * c` references its operand twice, so a folded tree
    * holds 2¹⁰ copies of the logit subexpression — measured ~3.5 s of
    * pure analysis/codegen per use. This chains `withColumn` steps (the
    * Spark mirror of the oracle's CTE chain), keeping the tree linear;
    * the arithmetic ORDER is identical either way, so the oracle is
    * unaffected. Adds `outCol` = σ̃(zi/10⁶). */
  private[graft] def withSigmoid(df: DataFrame, ziCol: String,
      outCol: String): DataFrame = {
    val zc = least(greatest(col(ziCol).cast("double") / lit(1000000.0),
      lit(-30.0)), lit(30.0))
    var cur = df.withColumn("_t", lit(1.0) + (-zc) / lit(1024.0))
    for (_ <- 1 to 10) cur = cur.withColumn("_t", col("_t") * col("_t"))
    cur.withColumn(outCol, lit(1.0) / (lit(1.0) + col("_t"))).drop("_t")
  }

  /** The deterministic label both engines replay: [[qualityFilter]]'s
    * rule verdict as a 0/1 long — the production shape for a trained
    * quality classifier is exactly this (label a stratum by a cheap
    * rule / curated source, train LR to generalize it; GPT-3's filter
    * labeled WebText-vs-CommonCrawl the same way). */
  private[graft] def lrLabeled(spark: SparkSession, sfDir: String): DataFrame = {
    val w = split(col("text"), " ")
    val nWords = size(w).cast("long")
    val nDistinct = size(array_distinct(w)).cast("long")
    val stop = array(Seq("the", "a", "of", "and", "is").map(lit): _*)
    val nStop = size(filter(w, x => array_contains(stop, x))).cast("long")
    val awl = length(regexp_replace(col("text"), " ", "")).cast("double") / nWords
    val dupFrac = lit(1d) - nDistinct.cast("double") / nWords
    val keep = nWords >= 30 && nWords <= 2000 &&
      awl >= 2d && awl <= 4.8d && nStop > 0 && dupFrac <= 0.6d
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), keep.cast("long").as("y"))
  }

  /** Hashed bag-of-words features at a FIXED `buckets` width (the
    * [[graft.operators.TextOps]] `dsir_weights` model-size contract:
    * corpus-size-free), bias as bucket −1 with x = 1. */
  private def lrFeatures(labeled: DataFrame, buckets: Int): DataFrame =
    labeled
      .select(col("doc_id"), col("y"),
        explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), col("y"),
        pmod(Exprs.md5num(col("tok")), lit(buckets.toLong)).as("b"))
      .groupBy("doc_id", "y", "b").agg(count(lit(1)).as("x"))
      .unionByName(labeled.select(col("doc_id"), col("y"),
        lit(-1L).as("b"), lit(1L).as("x")))

  /** `steps` deterministic full-batch gradient descent steps, lr = 1/2.
    * Weights live on a 1e-6 LONG grid (`wq`), so every per-doc logit
    * zᵢ = Σ wq·x and every per-bucket gradient Σ(s̃ − 10⁶y)·x is EXACT
    * integer arithmetic; the only floating point per step is the
    * [[withSigmoid]] evaluation (bit-identical cross-engine) and the
    * update rounding floor(g/2N + 0.5) on doubles that are exact
    * integer conversions (all < 2^53). Returns the trained bucket →
    * wq map — model size is `buckets`+1 regardless of corpus size
    * (the WordPiece-vocab-sized driver collect precedent). */
  /** Features partitioned by doc and materialized ONCE: every gradient
    * step runs a doc-grain aggregate and a doc-keyed join against this
    * frame, so pre-partitioning makes all of them exchange-free per step
    * — only the bucket-grain gradient (model-sized after map-side
    * combine) crosses the wire each iteration. */
  private def lrFeatFrame(labeled: DataFrame, buckets: Int): DataFrame =
    lrFeatures(labeled, buckets).repartition(col("doc_id")).localCheckpoint()

  private[graft] def lrTrain(labeled: DataFrame, steps: Int = 3,
      buckets: Int = 4096): Map[Long, Long] =
    lrTrainOnFeat(lrFeatFrame(labeled, buckets), steps, buckets)

  /** Training core over a MATERIALIZED feature frame, so [[lrQuality]]
    * can share one checkpoint between the gradient steps and the final
    * scoring pass instead of recomputing the corpus features. */
  private def lrTrainOnFeat(feat: DataFrame, steps: Int,
      buckets: Int): Map[Long, Long] = {
    val spark = feat.sparkSession
    import spark.implicits._
    val n = feat.filter(col("b") === -1L).count() // one bias row per doc
    var w: Map[Long, Long] =
      ((-1L) +: (0L until buckets.toLong)).map(_ -> 0L).toMap
    for (_ <- 1 to steps) {
      val wDf = broadcast(w.toSeq.toDF("b", "wq"))
      val sg = withSigmoid(feat.join(wDf, "b")
          .groupBy("doc_id")
          .agg(sum(col("x") * col("wq")).as("zi")), "zi", "sig")
        .select(col("doc_id"),
          floor(col("sig") * lit(1000000.0) + lit(0.5)).cast("long").as("s"))
      val grad = feat.join(sg, "doc_id")
        .groupBy("b")
        .agg(sum((col("s") - col("y") * lit(1000000L)) * col("x")).as("g"))
        .collect()
      w = grad.foldLeft(w) { case (acc, r) =>
        val delta = math.floor(r.getLong(1).toDouble / (2.0 * n) + 0.5).toLong
        acc.updated(r.getLong(0), acc(r.getLong(0)) - delta)
      }
    }
    w
  }

  /** Score a labeled corpus against broadcast trained weights: one
    * feature pass, one doc-grain sum, the σ̃ squash — per-row work, no
    * model-side shuffle. */
  private[graft] def lrScore(labeled: DataFrame,
      w: Map[Long, Long], buckets: Int = 4096): DataFrame =
    lrScoreOnFeat(lrFeatures(labeled, buckets), w)

  private def lrScoreOnFeat(feat: DataFrame,
      w: Map[Long, Long]): DataFrame = {
    val spark = feat.sparkSession
    import spark.implicits._
    val wDf = broadcast(w.toSeq.toDF("b", "wq"))
    withSigmoid(feat.join(wDf, "b")
        .groupBy("doc_id", "y")
        .agg(sum(col("x") * col("wq")).as("zi")), "zi", "sig")
      .select(col("doc_id"), col("y"), Exprs.r4(col("sig")).as("score"),
        (floor(col("sig") * lit(1000000.0) + lit(0.5)).cast("long") >=
          lit(500000L)).as("pred"))
      .orderBy("doc_id")
  }

  /** Row-wise scoring against broadcast trained weights — the STREAMING
    * shape of [[lrScore]]: the logit folds per row over the token list
    * (Σ over occurrences ≡ Σ over bucket counts, exact integer sums, so
    * it equals the grouped path bit-for-bit), with the model as a
    * foldable map literal. Zero shuffle, zero state — safe in a
    * Structured Streaming select, which is exactly the production
    * "train offline, quality-filter the firehose online" deployment.
    * Input needs (doc_id, text); emits (doc_id, score, pred). */
  def lrScoreRowwise(docs: DataFrame, w: Map[Long, Long],
      buckets: Int = 4096): DataFrame = {
    val wmap = typedlit(w)
    val zi = aggregate(
      transform(split(col("text"), " "),
        tok => coalesce(element_at(wmap,
          pmod(Exprs.md5num(tok), lit(buckets.toLong))), lit(0L))),
      lit(w.getOrElse(-1L, 0L)), (acc, x) => acc + x)
    withSigmoid(docs.select(col("doc_id"), zi.as("zi")), "zi", "sig")
      .select(col("doc_id"), Exprs.r4(col("sig")).as("score"),
        (floor(col("sig") * lit(1000000.0) + lit(0.5)).cast("long") >=
          lit(500000L)).as("pred"))
  }

  /** Trained quality classifier — the missing step between the rule
    * filter ([[qualityFilter]]) and the importance samplers
    * (`dsir_weights` / `moore_lewis`): logistic regression over hashed
    * bag-of-words features (fixed 4096-bucket model, bias term), trained
    * with 3 deterministic full-batch gradient steps on the rule verdict
    * as label, then scoring every document against the broadcast
    * weights. Output: doc grain (doc_id, y, score, pred).
    *
    * Scale: the MODEL is corpus-size-free (4097 longs — driver-collected
    * per step like the WordPiece vocab literal); the corpus does 3+1
    * linear passes (full-batch gradient is one doc-grain and one
    * bucket-grain aggregate per step), every join's small side
    * broadcast. Oracle: the steps unroll as CTEs ([[lrQualitySql]] —
    * the `pca_project` unrolled-iteration precedent), bit-exact because
    * weights are integer-grid and the squash is libm-free. */
  def lrQuality(spark: SparkSession, sfDir: String): DataFrame = {
    val feat = lrFeatFrame(lrLabeled(spark, sfDir), 4096)
    lrScoreOnFeat(feat, lrTrainOnFeat(feat, 3, 4096))
  }

  /** The K training steps + final scoring, unrolled relationally. */
  def lrQualitySql(steps: Int = 3, buckets: Int = 4096): String = {
    // the ten explicit squarings of σ̃'s scaling-and-squaring exponential,
    // carried per tagged step over (doc_id[, extra], t)
    def sigChain(tag: String, src: String, extra: String): String = {
      val t0 = s"c${tag}0 AS (SELECT doc_id, ${extra}1.0 + " +
        s"(-least(greatest(zi / 1000000.0, -30.0), 30.0)) / 1024.0 AS t FROM $src)"
      val sq = (1 to 10).map(i =>
        s"c$tag$i AS (SELECT doc_id, ${extra}t * t AS t FROM c$tag${i - 1})")
      (t0 +: sq).mkString(",\n")
    }
    val upd = s"CAST(floor(CAST(g AS DOUBLE) / (2 * (SELECT n FROM nn)) + 0.5) AS BIGINT)"
    val later = (2 to steps).map { k =>
      s"""z$k AS (SELECT f.doc_id, SUM(f.x * w.wq) AS zi
         |  FROM fl f JOIN w${k - 1} w USING(b) GROUP BY 1),
         |${sigChain(s"s$k", s"z$k", "")},
         |s$k AS (SELECT doc_id,
         |  CAST(floor((1.0 / (1.0 + t)) * 1000000 + 0.5) AS BIGINT) AS s
         |  FROM cs${k}10),
         |g$k AS (SELECT f.b, SUM((s.s - 1000000 * f.y) * f.x) AS g
         |  FROM fl f JOIN s$k s USING(doc_id) GROUP BY 1),
         |w$k AS (SELECT w.b, w.wq - $upd AS wq
         |  FROM w${k - 1} w JOIN g$k g USING(b))""".stripMargin
    }.map(_ + ",").mkString("\n")
    s"""WITH t AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS w,
       |    CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS awl
       |  FROM documents),
       |lbl AS (
       |  SELECT doc_id, text, CAST(CASE WHEN len(w) BETWEEN 30 AND 2000
       |    AND awl BETWEEN 2.0 AND 4.8
       |    AND len(list_filter(w, x -> list_contains(['the','a','of','and','is'], x))) > 0
       |    AND 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) <= 0.6
       |    THEN 1 ELSE 0 END AS BIGINT) AS y
       |  FROM t),
       |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM lbl),
       |feat AS (
       |  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)
       |    % $buckets AS b, count(*) AS x
       |  FROM tok GROUP BY 1, 2
       |  UNION ALL
       |  SELECT doc_id, -1, 1 FROM lbl),
       |fl AS (SELECT f.doc_id, l.y, f.b, f.x FROM feat f JOIN lbl l USING(doc_id)),
       |nn AS (SELECT count(*) AS n FROM lbl),
       |-- step 1: w = 0 ⇒ σ̃ = 1/2 exactly ⇒ s̃ = 500000 for every doc
       |g1 AS (SELECT b, SUM((500000 - 1000000 * y) * x) AS g FROM fl GROUP BY 1),
       |w1 AS (SELECT b, -$upd AS wq FROM g1),
       |$later
       |zf AS (SELECT f.doc_id, f.y, SUM(f.x * w.wq) AS zi
       |  FROM fl f JOIN w$steps w USING(b) GROUP BY 1, 2),
       |${sigChain("f", "zf", "y, ")}
       |SELECT doc_id, y,
       |  floor((1.0 / (1.0 + t)) * 10000 + 0.5) / 10000 AS score,
       |  CAST(floor((1.0 / (1.0 + t)) * 1000000 + 0.5) AS BIGINT) >= 500000 AS pred
       |FROM cf10 ORDER BY doc_id""".stripMargin
  }

  /** SFT chat-template rendering with loss-mask spans — the
    * instruction-tuning prep stage: multi-turn conversations are rendered
    * into one training string per conversation (`<|user|>\n…\n<|assistant|>
    * \n…\n` role headers, the ChatML/Alpaca shape), and each ASSISTANT turn
    * emits its loss-mask span — the 1-based [span_start, span_end) char
    * range of the turn's raw text inside the rendered string, i.e. exactly
    * the tokens a supervised fine-tune computes loss on (user turns and
    * role headers are masked out).
    *
    * Fixture: conversation = doc_id/4, turn = doc_id%4, roles alternate
    * user/assistant by turn parity; null-text AND empty-text turns are
    * dropped (a real SFT prep drops empty messages — and a zero-length
    * assistant span would make [[packStats]]'s span→packs `sequence()`
    * run DESCENDING, emitting phantom rows the oracle's generate_series
    * doesn't) with surviving turns keeping their indices. Each emitted
    * row carries the conv-level stats (n_turns,
    * conv_chars = rendered length) and `span_text` — the rendered string
    * SLICED at the computed offsets, so the oracle hash only matches if
    * the offset arithmetic is consistent with the actual rendering
    * (ASCII fixture: char offsets are byte offsets on both engines).
    *
    * Scale: one shuffle total. The ordered window (running offset), the
    * whole-partition window (conv stats + the fold-concatenated rendering
    * over the turn-sorted piece list), and nothing else — conversations
    * are few-turn, so per-group state is bounded; no join, the final sort
    * is the only other exchange. At 100 TB the conversation key
    * partitions the corpus evenly (family grain, no skew). */
  def sftRender(spark: SparkSession, sfDir: String): DataFrame = {
    val turns = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(expr("doc_id div 4").as("conv_id"),
        (col("doc_id") % 4).as("turn"), col("text"))
      .withColumn("role",
        when(col("turn") % 2 === 0, lit("user")).otherwise(lit("assistant")))
      .withColumn("piece",
        concat(lit("<|"), col("role"), lit("|>\n"), col("text"), lit("\n")))
    val wOrd = Window.partitionBy("conv_id").orderBy("turn")
    val wAll = Window.partitionBy("conv_id")
    turns
      .withColumn("off",
        sum(length(col("piece"))).over(wOrd) - length(col("piece")))
      .withColumn("n_turns", count(lit(1)).over(wAll))
      .withColumn("conv_chars", sum(length(col("piece"))).over(wAll))
      .withColumn("rendered", aggregate(
        array_sort(collect_list(struct(col("turn"), col("piece"))).over(wAll)),
        lit(""), (acc, x) => concat(acc, x.getField("piece"))))
      .filter(col("role") === "assistant")
      // span start derived from the piece itself (piece = header + text +
      // '\n', so the text begins at off + len(piece) - len(text) - 1 in
      // 0-based, +1 for SQL's 1-based substr) — no header-width constant
      // to keep in sync with the template; spans are 1-based, end-exclusive
      .withColumn("span_start",
        col("off") + length(col("piece")) - length(col("text")))
      .select(col("conv_id"), col("turn"),
        col("span_start"),
        (col("span_start") + length(col("text"))).as("span_end"),
        col("n_turns"), col("conv_chars"),
        col("rendered").substr(col("span_start"), length(col("text")))
          .as("span_text"))
      .orderBy("conv_id", "turn")
  }

  /** DPO/RLHF preference-pair construction — the stage after [[sftRender]]
    * in an alignment data pipeline: for each prompt, pick the best and
    * worst candidate completion by a quality score, emitting the
    * (chosen, rejected) pair plus its score margin. Fixture mapping:
    * prompt group = doc_id/4, the group's docs with turn = doc_id%4 ≥ 1
    * are its candidate completions; the score is a replayable quality
    * heuristic — the letter ratio on a fixed 1e-4 grid,
    * floor(10000·letters/chars) (both engines share the regex class and
    * exact integer floor). Selection is fully deterministic: chosen =
    * highest score, ties to the LOWEST turn; rejected = lowest score,
    * ties to the HIGHEST turn — so a group of ≥ 2 candidates always
    * yields a well-defined pair (all-tie groups pair first against last
    * at margin 0, the degenerate case a real pipeline filters on margin).
    *
    * Scale: one prompt-grain shuffle. Both row_number lanes and the
    * group count ride the same window exchange ([[sftRender]]'s shape),
    * and the pair pivot is a same-key groupBy — no join, no second
    * exchange; candidate text never moves — the score is computed before
    * the shuffle, so only slim (prompt_id, turn, score) rows shuffle.
    * The final prompt-grain sort is the only other exchange. */
  def dpoPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val cands = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull && length(col("text")) > 0 &&
        col("doc_id") % 4 =!= 0)
      .select(expr("doc_id div 4").as("prompt_id"),
        (col("doc_id") % 4).as("turn"),
        // 10000.0 as a DOUBLE literal, exactly like the oracle: an Int
        // literal would multiply in 32-bit and silently wrap past ~214k
        // letters; double*int is exact to 2^53 and the one division is
        // correctly rounded identically on both engines
        floor(lit(10000.0) *
          length(regexp_replace(col("text"), "[^A-Za-z]", "")) /
          length(col("text"))).as("score"))
    val part = Window.partitionBy("prompt_id")
    val chosenLane = part.orderBy(col("score").desc, col("turn").asc)
    val rejectedLane = part.orderBy(col("score").asc, col("turn").desc)
    cands
      .withColumn("rn_c", row_number().over(chosenLane))
      .withColumn("rn_r", row_number().over(rejectedLane))
      .withColumn("n_candidates", count(lit(1)).over(part))
      .filter(col("n_candidates") >= 2)
      .groupBy("prompt_id")
      .agg(
        max(when(col("rn_c") === 1, struct(col("turn"), col("score"))))
          .as("c"),
        max(when(col("rn_r") === 1, struct(col("turn"), col("score"))))
          .as("r"),
        max(col("n_candidates")).as("n_candidates"))
      .select(col("prompt_id"),
        col("c.turn").as("chosen_turn"), col("r.turn").as("rejected_turn"),
        col("c.score").as("chosen_score"), col("r.score").as("rejected_score"),
        (col("c.score") - col("r.score")).as("margin"),
        col("n_candidates"))
      .orderBy("prompt_id")
  }

  /** The pair selection replayed relationally — same score grid, same
    * two deterministic rank lanes. */
  val dpoPairsSql: String =
    """WITH cands AS (
      |  SELECT doc_id // 4 AS prompt_id, doc_id % 4 AS turn,
      |    CAST(floor(10000.0 *
      |      length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
      |      / length(text)) AS BIGINT) AS score
      |  FROM documents
      |  WHERE text IS NOT NULL AND length(text) > 0 AND doc_id % 4 <> 0),
      |ranked AS (
      |  SELECT prompt_id, turn, score,
      |    row_number() OVER (PARTITION BY prompt_id
      |      ORDER BY score DESC, turn ASC) AS rn_c,
      |    row_number() OVER (PARTITION BY prompt_id
      |      ORDER BY score ASC, turn DESC) AS rn_r,
      |    COUNT(*) OVER (PARTITION BY prompt_id) AS n_candidates
      |  FROM cands)
      |SELECT prompt_id,
      |  MAX(CASE WHEN rn_c = 1 THEN turn END) AS chosen_turn,
      |  MAX(CASE WHEN rn_r = 1 THEN turn END) AS rejected_turn,
      |  MAX(CASE WHEN rn_c = 1 THEN score END) AS chosen_score,
      |  MAX(CASE WHEN rn_r = 1 THEN score END) AS rejected_score,
      |  MAX(CASE WHEN rn_c = 1 THEN score END)
      |    - MAX(CASE WHEN rn_r = 1 THEN score END) AS margin,
      |  CAST(MAX(n_candidates) AS BIGINT) AS n_candidates
      |FROM ranked WHERE n_candidates >= 2
      |GROUP BY prompt_id ORDER BY prompt_id""".stripMargin

  /** SFT packing with loss-mask re-basing — the stage after [[sftRender]]:
    * rendered conversations are packed concat-and-chunk into fixed
    * `budget`-char training windows (the [[seqPack]] shape at conversation
    * grain: a running length total per shard, a conversation's pack is the
    * chunk its first char lands in), and every assistant loss-mask span is
    * RE-BASED into pack coordinates — pack_id of its first char, 1-based
    * `packed_start` within that pack, and a `straddles_pack` flag for
    * spans crossing a chunk boundary (a trainer splits or boundary-masks
    * those). Conversations with no assistant turn contribute no gradient
    * and are dropped by [[sftRender]] upstream — the packed stream is the
    * SFT example stream.
    *
    * Scale shape ([[seqPack]]'s note): the running total is serial per
    * key, so conversations shard by conv_id mod `shards` — packs never
    * span shards by construction and the window parallelizes shards-fold.
    * The conv-grain length table derives from the span rows WITHOUT a new
    * aggregate exchange (hash-partitioning on conv_id already clusters
    * the distinct), and spans join back on the same key. */
  def sftPack(spark: SparkSession, sfDir: String, budget: Int = 2048,
      shards: Int = 8): DataFrame = {
    val L = lit(budget.toLong)
    val spans = sftRender(spark, sfDir)
      .select(col("conv_id"), col("turn"), col("span_start"),
        col("span_end"), col("conv_chars"))
    val w = Window.partitionBy("shard").orderBy("conv_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val convs = spans.select(col("conv_id"), col("conv_chars")).distinct()
      .withColumn("shard", pmod(col("conv_id"), lit(shards.toLong)))
      .withColumn("base", sum("conv_chars").over(w) - col("conv_chars"))
    spans.join(convs.select("conv_id", "shard", "base"), Seq("conv_id"))
      // 0-based position of the span's first char in the shard stream
      .withColumn("gstart", col("base") + col("span_start") - 1)
      .select(col("conv_id"), col("turn"), col("shard"),
        floor(col("gstart") / L).cast("long").as("pack_id"),
        (pmod(col("gstart"), L) + 1).as("packed_start"),
        (col("span_end") - col("span_start")).as("span_len"),
        (pmod(col("gstart"), L) + col("span_end") - col("span_start") > L)
          .as("straddles_pack"))
      .orderBy("conv_id", "turn")
  }

  /** The packing + re-basing replayed over the SAME render pipeline (the
    * full [[sftRenderSql]] as a subquery). */
  def sftPackSql(budget: Int = 2048, shards: Int = 8): String =
    s"""WITH spans AS (SELECT * FROM ($sftRenderSql) s),
      |convs AS (
      |  SELECT conv_id, conv_chars, conv_id % $shards AS shard
      |  FROM (SELECT DISTINCT conv_id, conv_chars FROM spans)),
      |based AS (
      |  SELECT conv_id, shard,
      |    SUM(conv_chars) OVER (PARTITION BY shard ORDER BY conv_id)
      |      - conv_chars AS base
      |  FROM convs)
      |SELECT s.conv_id, s.turn, CAST(b.shard AS BIGINT) AS shard,
      |  CAST((b.base + s.span_start - 1) // $budget AS BIGINT) AS pack_id,
      |  CAST((b.base + s.span_start - 1) % $budget + 1 AS BIGINT)
      |    AS packed_start,
      |  CAST(s.span_end - s.span_start AS BIGINT) AS span_len,
      |  (b.base + s.span_start - 1) % $budget
      |    + s.span_end - s.span_start > $budget AS straddles_pack
      |FROM spans s JOIN based b USING (conv_id)
      |ORDER BY conv_id, turn""".stripMargin

  /** Packed-window statistics — the budget-tuning dashboard over
    * [[sftPack]]'s stream: per (shard, pack) the filled chars (the last
    * pack per shard is the only partial one — utilization), the number of
    * loss spans touching the pack, and the pack's LOSS DENSITY — the
    * fraction of the training window that actually contributes gradient
    * (role headers and user turns are masked, so density < 1 even in full
    * packs; straddling spans are SPLIT and each pack gets its true
    * overlap). This is the number packing budgets are tuned by.
    *
    * Scale: both explosions (conversation→packs for fill, span→packs for
    * loss) fan out by ≤ ceil(len/budget) + 1 rows each — bounded by the
    * conversation length, not the corpus — and aggregate map-side onto
    * (shard, pack) grain; the final join is pack-grain on both sides. */
  def packStats(spark: SparkSession, sfDir: String, budget: Int = 2048,
      shards: Int = 8): DataFrame = {
    val L = lit(budget.toLong)
    val spans = sftRender(spark, sfDir)
      .select(col("conv_id"), col("span_start"), col("span_end"),
        col("conv_chars"))
    val w = Window.partitionBy("shard").orderBy("conv_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val convs = spans.select(col("conv_id"), col("conv_chars")).distinct()
      .withColumn("shard", pmod(col("conv_id"), lit(shards.toLong)))
      .withColumn("base", sum("conv_chars").over(w) - col("conv_chars"))
    val fill = convs
      .withColumn("pack_id", explode(sequence(
        floor(col("base") / L).cast("long"),
        floor((col("base") + col("conv_chars") - 1) / L).cast("long"))))
      .groupBy("shard", "pack_id")
      .agg(sum(least(col("base") + col("conv_chars"), (col("pack_id") + 1) * L)
        - greatest(col("base"), col("pack_id") * L)).as("fill_chars"))
    val loss = spans
      .join(convs.select("conv_id", "shard", "base"), Seq("conv_id"))
      .withColumn("gstart", col("base") + col("span_start") - 1)
      .withColumn("gend", col("base") + col("span_end") - 1)
      .withColumn("pack_id", explode(sequence(
        floor(col("gstart") / L).cast("long"),
        floor((col("gend") - 1) / L).cast("long"))))
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(least(col("gend"), (col("pack_id") + 1) * L)
          - greatest(col("gstart"), col("pack_id") * L)).as("loss_chars"))
    fill.join(loss, Seq("shard", "pack_id"), "left")
      .select(col("shard"), col("pack_id"), col("fill_chars"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("loss_chars"), lit(0L)).as("loss_chars"),
        floor(lit(10000.0) * coalesce(col("loss_chars"), lit(0L)) / L)
          .cast("long").as("loss_density_e4"))
      .orderBy("shard", "pack_id")
  }

  /** The pack accounting replayed over the SAME render pipeline, spans
    * split across packs by the identical overlap arithmetic. */
  def packStatsSql(budget: Int = 2048, shards: Int = 8): String =
    s"""WITH spans AS (SELECT * FROM ($sftRenderSql) s),
      |convs AS (SELECT DISTINCT conv_id, conv_chars FROM spans),
      |based AS (
      |  -- window SUM is HUGEINT in DuckDB; generate_series needs BIGINT
      |  SELECT conv_id, conv_chars, conv_id % $shards AS shard,
      |    CAST(SUM(conv_chars) OVER (PARTITION BY conv_id % $shards
      |      ORDER BY conv_id) - conv_chars AS BIGINT) AS base
      |  FROM convs),
      |fill AS (
      |  SELECT shard, p AS pack_id,
      |    SUM(least(base + conv_chars, (p + 1) * $budget)
      |      - greatest(base, p * $budget)) AS fill_chars
      |  FROM based, LATERAL (SELECT unnest(generate_series(
      |    base // $budget, (base + conv_chars - 1) // $budget)) AS p)
      |  GROUP BY 1, 2),
      |loss AS (
      |  SELECT b.shard, p AS pack_id, COUNT(*) AS n_spans,
      |    SUM(least(b.base + s.span_end - 1, (p + 1) * $budget)
      |      - greatest(b.base + s.span_start - 1, p * $budget)) AS loss_chars
      |  FROM spans s JOIN based b USING (conv_id),
      |    LATERAL (SELECT unnest(generate_series(
      |      (b.base + s.span_start - 1) // $budget,
      |      (b.base + s.span_end - 2) // $budget)) AS p)
      |  GROUP BY 1, 2)
      |SELECT CAST(f.shard AS BIGINT) AS shard,
      |  CAST(f.pack_id AS BIGINT) AS pack_id,
      |  CAST(f.fill_chars AS BIGINT) AS fill_chars,
      |  CAST(coalesce(l.n_spans, 0) AS BIGINT) AS n_spans,
      |  CAST(coalesce(l.loss_chars, 0) AS BIGINT) AS loss_chars,
      |  CAST(floor(10000.0 * coalesce(l.loss_chars, 0) / $budget) AS BIGINT)
      |    AS loss_density_e4
      |FROM fill f LEFT JOIN loss l USING (shard, pack_id)
      |ORDER BY shard, pack_id""".stripMargin

  /** The render + offset arithmetic replayed relationally (string_agg in
    * turn order = the fold-concatenated rendering; substr at the computed
    * offsets must recover the raw text). */
  val sftRenderSql: String =
    """WITH t AS (
      |  SELECT doc_id // 4 AS conv_id, doc_id % 4 AS turn,
      |    CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
      |    text
      |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      |p AS (
      |  SELECT conv_id, turn, role, text,
      |    '<|' || role || '|>' || chr(10) || text || chr(10) AS piece
      |  FROM t),
      |o AS (
      |  SELECT conv_id, turn, role, text, piece,
      |    SUM(length(piece)) OVER (PARTITION BY conv_id ORDER BY turn)
      |      - length(piece) AS off
      |  FROM p),
      |c AS (
      |  SELECT conv_id, string_agg(piece, '' ORDER BY turn) AS rendered,
      |    COUNT(*) AS n_turns, SUM(length(piece)) AS conv_chars
      |  FROM p GROUP BY conv_id)
      |SELECT o.conv_id, CAST(o.turn AS BIGINT) AS turn,
      |  CAST(o.off + length(o.piece) - length(o.text) AS BIGINT)
      |    AS span_start,
      |  CAST(o.off + length(o.piece) AS BIGINT) AS span_end,
      |  CAST(c.n_turns AS BIGINT) AS n_turns,
      |  CAST(c.conv_chars AS BIGINT) AS conv_chars,
      |  substr(c.rendered,
      |    CAST(o.off + length(o.piece) - length(o.text) AS BIGINT),
      |    length(o.text)) AS span_text
      |FROM o JOIN c USING (conv_id)
      |WHERE o.role = 'assistant'
      |ORDER BY conv_id, turn""".stripMargin

  /** TOKEN-budget SFT packing — [[sftPack]] with the budget in the unit a
    * trainer actually bills: tokens under the TRAINED unigram-LM tokenizer
    * ([[TextOps.unigramLm]]'s SentencePiece-style model, Viterbi-segmented
    * on the `viterbi_best` codegen kernel). This is the composition seam
    * between the repo's tokenizer family and its packing family: per-turn
    * token counts come from the trained model, conversations pack into
    * fixed `budget`-TOKEN windows, and every assistant loss-mask span is
    * re-based into TOKEN coordinates (pack_id, 1-based `packed_start`,
    * `span_tokens`, straddle flag). `span_chars` rides along so consumers
    * (and the spec) can check char↔token consistency — a span can never
    * cost more tokens than characters under a ≥1-char-per-piece model.
    *
    * Token accounting (the ChatML shape): each turn costs its text tokens
    * (Σ over whitespace words of the word's trained piece count; words
    * over the trainer's maxLen escape to one '[UNK]' token, the
    * [[TextOps.unigramLm]] contract) plus 2 specials — the `<|role|>`
    * header token and the end-of-turn newline. The assistant span covers
    * exactly the turn's TEXT tokens (specials are masked, like the char
    * form masks the rendered header).
    *
    * Scale shape: tokenization runs at VOCABULARY grain — the trained
    * (word → n_pieces) table comes out of [[TextOps.unigramLm]]'s
    * model-sized pipeline, and the corpus side only moves slim
    * (conv, turn, word, cnt) rows through one word-grain hash join; the
    * conversation TEXT never shuffles at all (the char form at least
    * moves pieces through its render window — the token form beats it).
    * After the per-turn aggregate the plan is [[sftPack]]'s verbatim:
    * conv-grain windows, the sharded running total, a same-key join.
    *
    * Oracle: [[TextOps.unigramLmSql]] — the full trained-tokenizer EM
    * replay — embedded as the segmentation CTE, feeding the [[sftPackSql]]
    * packing arithmetic re-derived in token coordinates. */
  def sftPackTokens(spark: SparkSession, sfDir: String, budget: Int = 512,
      shards: Int = 8): DataFrame = {
    val L = lit(budget.toLong)
    val seg = TextOps.stagedUnigramSeg(spark, sfDir) // trained tokenizer: staged artifact, oracle replays the EM
    val turns = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(expr("doc_id div 4").as("conv_id"),
        (col("doc_id") % 4).as("turn"), col("text"))
    // slim (conv, turn, word, cnt) rows through the shared tokenization
    // helper — text itself never crosses the word-grain join
    val turnToks = TextOps.trainedPieceCounts(turns, seg,
        Seq("conv_id", "turn"))
      .select(col("conv_id"), col("turn"),
        col("n_pieces").as("text_tokens"))
    val toks = turns
      .select(col("conv_id"), col("turn"),
        when(col("turn") % 2 === 0, lit("user")).otherwise(lit("assistant"))
          .as("role"),
        length(col("text")).cast("long").as("span_chars"))
      // left join: a non-empty text of only separators has zero words →
      // zero text tokens, but the turn still costs its 2 specials
      .join(turnToks, Seq("conv_id", "turn"), "left")
      .withColumn("text_tokens", coalesce(col("text_tokens"), lit(0L)))
      .withColumn("turn_tokens", col("text_tokens") + 2)
    val wOrd = Window.partitionBy("conv_id").orderBy("turn")
    val wAll = Window.partitionBy("conv_id")
    val spans = toks
      .withColumn("off",
        sum(col("turn_tokens")).over(wOrd) - col("turn_tokens"))
      .withColumn("conv_tokens", sum(col("turn_tokens")).over(wAll))
      .filter(col("role") === "assistant")
      // text tokens start right after the role token: 0-based off + 1,
      // +1 again for 1-based coordinates (the sftPack convention)
      .select(col("conv_id"), col("turn"), (col("off") + 2).as("span_start"),
        col("text_tokens").as("span_tokens"), col("span_chars"),
        col("conv_tokens"))
    val w = Window.partitionBy("shard").orderBy("conv_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val convs = spans.select(col("conv_id"), col("conv_tokens")).distinct()
      .withColumn("shard", pmod(col("conv_id"), lit(shards.toLong)))
      .withColumn("base", sum("conv_tokens").over(w) - col("conv_tokens"))
    spans.join(convs.select("conv_id", "shard", "base"), Seq("conv_id"))
      .withColumn("gstart", col("base") + col("span_start") - 1)
      .select(col("conv_id"), col("turn"), col("shard"),
        floor(col("gstart") / L).cast("long").as("pack_id"),
        (pmod(col("gstart"), L) + 1).as("packed_start"),
        col("span_tokens"), col("span_chars"),
        (pmod(col("gstart"), L) + col("span_tokens") > L).as("straddles_pack"))
      .orderBy("conv_id", "turn")
  }

  /** The trained tokenizer (the full [[TextOps.unigramLmSql]] EM replay)
    * composed with the packing arithmetic in token coordinates. */
  def sftPackTokensSql(budget: Int = 512, shards: Int = 8): String =
    s"""WITH seg AS (
      |${TextOps.unigramLmSql()}
      |),
      |t AS (
      |  SELECT doc_id // 4 AS conv_id, doc_id % 4 AS turn,
      |    CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
      |    text
      |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      |tw AS (
      |  SELECT conv_id, turn, word, count(*) AS cnt
      |  FROM (SELECT conv_id, turn, unnest(string_split(text, ' ')) AS word
      |        FROM t)
      |  WHERE length(word) >= 1 GROUP BY 1, 2, 3),
      |tt AS (
      |  SELECT conv_id, turn, CAST(SUM(cnt * s.n_pieces) AS BIGINT)
      |    AS text_tokens
      |  FROM tw JOIN seg s USING (word) GROUP BY 1, 2),
      |tok AS (
      |  SELECT t.conv_id, t.turn, t.role,
      |    CAST(length(t.text) AS BIGINT) AS span_chars,
      |    coalesce(tt.text_tokens, 0) AS text_tokens,
      |    coalesce(tt.text_tokens, 0) + 2 AS turn_tokens
      |  FROM t LEFT JOIN tt USING (conv_id, turn)),
      |o AS (
      |  SELECT *,
      |    CAST(SUM(turn_tokens) OVER (PARTITION BY conv_id ORDER BY turn)
      |      - turn_tokens AS BIGINT) AS off,
      |    CAST(SUM(turn_tokens) OVER (PARTITION BY conv_id) AS BIGINT)
      |      AS conv_tokens
      |  FROM tok),
      |spans AS (
      |  SELECT conv_id, turn, off + 2 AS span_start,
      |    text_tokens AS span_tokens, span_chars, conv_tokens
      |  FROM o WHERE role = 'assistant'),
      |convs AS (SELECT DISTINCT conv_id, conv_tokens FROM spans),
      |based AS (
      |  SELECT conv_id, conv_id % $shards AS shard,
      |    CAST(SUM(conv_tokens) OVER (PARTITION BY conv_id % $shards
      |      ORDER BY conv_id) - conv_tokens AS BIGINT) AS base
      |  FROM convs)
      |SELECT s.conv_id, CAST(s.turn AS BIGINT) AS turn,
      |  CAST(b.shard AS BIGINT) AS shard,
      |  CAST((b.base + s.span_start - 1) // $budget AS BIGINT) AS pack_id,
      |  CAST((b.base + s.span_start - 1) % $budget + 1 AS BIGINT)
      |    AS packed_start,
      |  s.span_tokens, s.span_chars,
      |  (b.base + s.span_start - 1) % $budget + s.span_tokens > $budget
      |    AS straddles_pack
      |FROM spans s JOIN based b USING (conv_id)
      |ORDER BY s.conv_id, s.turn""".stripMargin

  /** TOKEN-budget sequence packing — [[seqPack]] with document cost in
    * TRAINED-tokenizer tokens instead of whitespace words, completing the
    * tokens-not-chars upgrade across both packers ([[sftPackTokens]] is
    * the conversation-grain form). Per-document token counts are
    * [[TextOps.unigramEncode]]'s composition (vocabulary-grain trained
    * piece table, one word-grain hash join of slim (doc, word, cnt) rows —
    * document text never shuffles), driven through [[seqPack]]'s greedy
    * per-source running pack. Null/wordless docs cost 0 tokens and still
    * pack (one row per document, the [[seqPack]] contract).
    *
    * Oracle: the full [[TextOps.unigramLmSql]] EM replay as the
    * segmentation CTE feeding [[seqPackSql]]'s window arithmetic. */
  def tokenPack(spark: SparkSession, sfDir: String,
      budget: Int = 512): DataFrame = {
    val L = lit(budget.toLong)
    val seg = TextOps.stagedUnigramSeg(spark, sfDir) // trained tokenizer: staged artifact, oracle replays the EM
    val perDoc = TextOps.trainedPieceCounts(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
        seg, Seq("doc_id"))
      .select(col("doc_id"), col("n_pieces").as("n_tokens"))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir).select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / L).cast("long").as("pack_id"),
        (col("cum") - col("n_tokens")
          - L * floor((col("cum") - col("n_tokens")) / L))
          .cast("long").as("pack_offset"))
      .orderBy("doc_id")
  }

  /** The trained tokenizer composed with the greedy source-stream packing
    * arithmetic. */
  def tokenPackSql(budget: Int = 512): String =
    s"""WITH seg AS (
      |${TextOps.unigramLmSql()}
      |),
      |dw AS (
      |  SELECT doc_id, word, count(*) AS cnt
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |        FROM documents)
      |  WHERE length(word) >= 1 GROUP BY 1, 2),
      |agg AS (
      |  SELECT doc_id, CAST(SUM(cnt * s.n_pieces) AS BIGINT) AS n_tokens
      |  FROM dw JOIN seg s USING (word) GROUP BY 1),
      |t AS (
      |  SELECT d.doc_id, d.source, coalesce(a.n_tokens, 0) AS n_tokens
      |  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
      |c AS (
      |  SELECT doc_id, source, n_tokens,
      |    CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM t)
      |SELECT doc_id, source, n_tokens,
      |  CAST((cum - n_tokens) // $budget AS BIGINT) AS pack_id,
      |  CAST((cum - n_tokens) % $budget AS BIGINT) AS pack_offset
      |FROM c ORDER BY doc_id""".stripMargin

  /** The alignment-prep pipeline composed END TO END as ONE plan — the
    * [[corpusPipeline]] precedent at conversation grain: chat-template
    * render offsets ([[sftRender]]) → concat-and-chunk packing with span
    * re-basing ([[sftPack]]) → per-pack loss accounting ([[packStats]]'s
    * home-pack form) → preference-pair verdicts ([[dpoPairs]]), one row
    * per packed loss span carrying all four stages' columns.
    *
    * The point is the composition: ONE scan of the conversation table and
    * exactly THREE keyed window exchanges, no join anywhere —
    *  1. conv_id: render offsets, conv stats, AND the DPO chosen/rejected
    *     lanes all ride the same exchange (dpoPairs' prompt grain IS the
    *     conversation grain, so its rank lanes fold into the render
    *     window; the lanes collapse to one integer key
    *     `score·16 + 15 − turn` whose MAX/MIN decode to exactly
    *     [[dpoPairs]]' chosen-/rejected-with-tiebreak semantics);
    *  2. shard: the packing running total — the [[sftPack]] conv-grain
    *     DISTINCT + join-back is replaced by a first-span-per-conv flag
    *     (`rn = 1`) so each conversation's length counts once in the
    *     running sum and the spans never leave the linear chain;
    *  3. (shard, pack_id): per-pack span count and loss chars as a
    *     window over the packed spans themselves.
    * Plus the presentation sort. [[packStats]] semantics note: stats here
    * are HOME-pack grain — a straddling span contributes its in-pack
    * prefix (`least(span_len, budget − packed_start + 1)`) to the pack it
    * starts in, and its tail is exactly what the `straddles_pack` flag
    * hands to the trainer; the standalone [[packStats]] keeps the
    * split-across-packs accounting.
    *
    * Conversations with < 2 DPO candidates emit NULL verdict columns (the
    * standalone operator drops them; the composed row keeps the span —
    * packing needs it — and nulls the pair). */
  def sftPipeline(spark: SparkSession, sfDir: String, budget: Int = 2048,
      shards: Int = 8): DataFrame = {
    val L = lit(budget.toLong)
    val turns = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(expr("doc_id div 4").as("conv_id"),
        (col("doc_id") % 4).as("turn"), col("text"))
      .withColumn("role",
        when(col("turn") % 2 === 0, lit("user")).otherwise(lit("assistant")))
      .withColumn("piece",
        concat(lit("<|"), col("role"), lit("|>\n"), col("text"), lit("\n")))
      // score only the DPO candidates (turn ≥ 1): the turn-0 prompt's
      // score is never consumed, and the regexp pass over its text is the
      // one per-row cost worth skipping at corpus scale
      .withColumn("score", when(col("turn") >= 1, floor(lit(10000.0) *
        length(regexp_replace(col("text"), "[^A-Za-z]", "")) /
        length(col("text")))))
    val wOrd = Window.partitionBy("conv_id").orderBy("turn")
    val wAll = Window.partitionBy("conv_id")
    val cand = col("turn") >= 1
    // one integer key encodes (score, turn-tiebreak): max ⇒ highest score
    // then LOWEST turn; min ⇒ lowest score then HIGHEST turn — validity
    // guarded by the DpoKeyStride/TurnsPerConv class-load require
    val key = col("score") * DpoKeyStride + lit(DpoKeyStride - 1) - col("turn")
    val spans = turns
      .withColumn("off",
        sum(length(col("piece"))).over(wOrd) - length(col("piece")))
      .withColumn("conv_chars", sum(length(col("piece"))).over(wAll))
      .withColumn("n_candidates",
        sum(when(cand, lit(1L)).otherwise(lit(0L))).over(wAll))
      .withColumn("kc", max(when(cand, key)).over(wAll))
      .withColumn("kr", min(when(cand, key)).over(wAll))
      .filter(col("role") === "assistant")
      .withColumn("span_start",
        col("off") + length(col("piece")) - length(col("text")))
      .withColumn("span_len", length(col("text")).cast("long"))
      // first assistant span per conv — carries the conv's length into the
      // shard running total exactly once (same exchange, rows now sorted)
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("shard", pmod(col("conv_id"), lit(shards.toLong)))
    val wShard = Window.partitionBy("shard").orderBy("conv_id", "turn")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPack = Window.partitionBy("shard", "pack_id")
    spans
      .withColumn("base",
        sum(when(col("rn") === 1, col("conv_chars")).otherwise(lit(0L)))
          .over(wShard) - col("conv_chars"))
      .withColumn("gstart", col("base") + col("span_start") - 1)
      .withColumn("pack_id", floor(col("gstart") / L).cast("long"))
      .withColumn("packed_start", pmod(col("gstart"), L) + 1)
      .withColumn("straddles_pack",
        pmod(col("gstart"), L) + col("span_len") > L)
      .withColumn("in_pack", least(col("span_len"), L - pmod(col("gstart"), L)))
      .withColumn("pack_spans", count(lit(1)).over(wPack))
      .withColumn("pack_loss_chars", sum(col("in_pack")).over(wPack))
      .select(col("conv_id"), col("turn"), col("shard"), col("pack_id"),
        col("packed_start"), col("span_len"), col("straddles_pack"),
        col("n_candidates"),
        when(col("n_candidates") >= 2,
          lit(DpoKeyStride - 1) - pmod(col("kc"), lit(DpoKeyStride)))
          .as("chosen_turn"),
        when(col("n_candidates") >= 2,
          lit(DpoKeyStride - 1) - pmod(col("kr"), lit(DpoKeyStride)))
          .as("rejected_turn"),
        when(col("n_candidates") >= 2,
          floor(col("kc") / DpoKeyStride).cast("long")
            - floor(col("kr") / DpoKeyStride).cast("long"))
          .as("margin"),
        col("pack_spans"), col("pack_loss_chars"),
        floor(lit(10000.0) * col("pack_loss_chars") / L).cast("long")
          .as("loss_density_e4"))
      .orderBy("conv_id", "turn")
  }

  /** The four stages replayed relationally over ONE turn CTE — the same
    * integer-key DPO lanes, the same first-span running total, the same
    * home-pack window stats. */
  def sftPipelineSql(budget: Int = 2048, shards: Int = 8): String =
    s"""WITH t AS (
      |  SELECT doc_id // 4 AS conv_id, doc_id % 4 AS turn,
      |    CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
      |    text,
      |    '<|' || CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END
      |      || '|>' || chr(10) || text || chr(10) AS piece,
      |    CASE WHEN doc_id % 4 >= 1 THEN CAST(floor(10000.0 *
      |      length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
      |      / length(text)) AS BIGINT) END AS score
      |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      |o AS (
      |  SELECT conv_id, turn, role, text, piece,
      |    SUM(length(piece)) OVER (PARTITION BY conv_id ORDER BY turn)
      |      - length(piece) AS off,
      |    SUM(length(piece)) OVER (PARTITION BY conv_id) AS conv_chars,
      |    SUM(CASE WHEN turn >= 1 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY conv_id) AS n_candidates,
      |    MAX(CASE WHEN turn >= 1 THEN score * $DpoKeyStride
      |      + ${DpoKeyStride - 1} - turn END)
      |      OVER (PARTITION BY conv_id) AS kc,
      |    MIN(CASE WHEN turn >= 1 THEN score * $DpoKeyStride
      |      + ${DpoKeyStride - 1} - turn END)
      |      OVER (PARTITION BY conv_id) AS kr
      |  FROM t),
      |s AS (
      |  SELECT conv_id, turn, n_candidates, kc, kr,
      |    CAST(off + length(piece) - length(text) AS BIGINT) AS span_start,
      |    CAST(length(text) AS BIGINT) AS span_len,
      |    CAST(conv_chars AS BIGINT) AS conv_chars,
      |    row_number() OVER (PARTITION BY conv_id ORDER BY turn) AS rn,
      |    conv_id % $shards AS shard
      |  FROM o WHERE role = 'assistant'),
      |b AS (
      |  SELECT *,
      |    CAST(SUM(CASE WHEN rn = 1 THEN conv_chars ELSE 0 END)
      |      OVER (PARTITION BY shard ORDER BY conv_id, turn)
      |      - conv_chars AS BIGINT) AS base
      |  FROM s),
      |p AS (
      |  SELECT conv_id, turn, shard, n_candidates, kc, kr, span_len,
      |    (base + span_start - 1) // $budget AS pack_id,
      |    (base + span_start - 1) % $budget + 1 AS packed_start,
      |    (base + span_start - 1) % $budget + span_len > $budget
      |      AS straddles_pack,
      |    least(span_len, $budget - (base + span_start - 1) % $budget)
      |      AS in_pack
      |  FROM b)
      |SELECT conv_id, CAST(turn AS BIGINT) AS turn,
      |  CAST(shard AS BIGINT) AS shard,
      |  CAST(pack_id AS BIGINT) AS pack_id,
      |  CAST(packed_start AS BIGINT) AS packed_start,
      |  span_len, straddles_pack,
      |  CAST(n_candidates AS BIGINT) AS n_candidates,
      |  CAST(CASE WHEN n_candidates >= 2
      |    THEN ${DpoKeyStride - 1} - kc % $DpoKeyStride END AS BIGINT)
      |    AS chosen_turn,
      |  CAST(CASE WHEN n_candidates >= 2
      |    THEN ${DpoKeyStride - 1} - kr % $DpoKeyStride END AS BIGINT)
      |    AS rejected_turn,
      |  CAST(CASE WHEN n_candidates >= 2
      |    THEN kc // $DpoKeyStride - kr // $DpoKeyStride END
      |    AS BIGINT) AS margin,
      |  CAST(COUNT(*) OVER (PARTITION BY shard, pack_id) AS BIGINT)
      |    AS pack_spans,
      |  CAST(SUM(in_pack) OVER (PARTITION BY shard, pack_id) AS BIGINT)
      |    AS pack_loss_chars,
      |  CAST(floor(10000.0 * SUM(in_pack) OVER (PARTITION BY shard, pack_id)
      |    / $budget) AS BIGINT) AS loss_density_e4
      |FROM p ORDER BY conv_id, turn""".stripMargin

  /** The composed alignment pipeline in TOKEN budgets — [[sftPipeline]]'s
    * four-stage one-plan composition (render offsets → packing → pack
    * stats → DPO verdicts) with every budget, offset and span in units of
    * the TRAINED unigram tokenizer ([[sftPackTokens]]' accounting: text
    * tokens Σ trained piece counts, +2 specials per turn, assistant spans
    * covering exactly the text tokens). This is the production shape the
    * r12 components proved separately: ONE conversation scan, token
    * coordinates, DPO lanes riding the render window.
    *
    * The composition seam is the tokenizer join, and it costs exactly ONE
    * corpus-side exchange: the turn row projects its slim per-turn
    * columns (role, score, span_chars) BEFORE the word explode, every
    * word occurrence rides them through the word-grain hash join against
    * the trained (word, n_pieces) table, and ONE conv_id repartition then
    * serves ALL downstream windows — the (conv, turn) re-aggregation
    * windows (hash by conv_id satisfies the (conv, turn) clustering),
    * the render/DPO windows, and the turn-grain collapse (`wrn = 1`)
    * replacing [[sftPackTokens]]' aggregate-and-join-back (which costs a
    * second scan of the conversation table — this form needs only one).
    * Corpus-side plan: 1 scan, 3 exchanges (word join, conv_id, shard),
    * 1 slim join; document text never crosses ANY exchange (it dies in
    * the scan-stage projection) — both plan-audited.
    *
    * Semantics notes: stats are HOME-pack grain in tokens
    * (`pack_loss_tokens`); `span_chars` rides along for char↔token
    * consistency checks; conversations with < 2 DPO candidates emit NULL
    * verdicts, like [[sftPipeline]]. Oracle: the full
    * [[TextOps.unigramLmSql]] EM replay as the segmentation CTE feeding
    * the pipeline CTE chain. */
  def sftPipelineTokens(spark: SparkSession, sfDir: String,
      budget: Int = 512, shards: Int = 8): DataFrame = {
    val L = lit(budget.toLong)
    val seg = TextOps.stagedUnigramSeg(spark, sfDir) // trained tokenizer: staged artifact, oracle replays the EM
    val cand = col("turn") >= 1
    // ONE scan: slim per-turn columns projected before the word explode —
    // text dies here, only (conv, turn, role, score, span_chars, word)
    // occurrence rows reach the tokenizer join
    val words = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(expr(s"doc_id div $TurnsPerConv").as("conv_id"),
        (col("doc_id") % TurnsPerConv).as("turn"),
        when(col("doc_id") % 2 === 0, lit("user")).otherwise(lit("assistant"))
          .as("role"),
        length(col("text")).cast("long").as("span_chars"),
        when(col("doc_id") % TurnsPerConv >= 1, floor(lit(10000.0) *
          length(regexp_replace(col("text"), "[^A-Za-z]", "")) /
          length(col("text")))).as("score"),
        // explode_outer keeps a (word = null) row for wordless turns —
        // they still cost their 2 specials and still pack
        explode_outer(filter(split(col("text"), " "),
          w => length(w) >= 1)).as("word"))
    val wTurn = Window.partitionBy("conv_id", "turn")
    val wTurnRn = Window.partitionBy("conv_id", "turn").orderBy("word")
    val wOrd = Window.partitionBy("conv_id").orderBy("turn")
    val wAll = Window.partitionBy("conv_id")
    val key = col("score") * DpoKeyStride + lit(DpoKeyStride - 1) - col("turn")
    val spans = words
      .join(seg, Seq("word"), "left") // the ONE slim tokenizer join
      // one conv_id exchange serves every window below: hashpartitioning
      // by conv_id satisfies the (conv, turn) clustering too
      .repartition(col("conv_id"))
      .withColumn("text_tokens",
        coalesce(sum(col("n_pieces")).over(wTurn), lit(0L)))
      .withColumn("wrn", row_number().over(wTurnRn))
      .filter(col("wrn") === 1) // turn grain again — no join-back needed
      .withColumn("turn_tokens", col("text_tokens") + 2)
      .withColumn("off",
        sum(col("turn_tokens")).over(wOrd) - col("turn_tokens"))
      .withColumn("conv_tokens", sum(col("turn_tokens")).over(wAll))
      .withColumn("n_candidates",
        sum(when(cand, lit(1L)).otherwise(lit(0L))).over(wAll))
      .withColumn("kc", max(when(cand, key)).over(wAll))
      .withColumn("kr", min(when(cand, key)).over(wAll))
      .filter(col("role") === "assistant")
      // text tokens start after the role token: 0-based off + 1, +1 for
      // 1-based coordinates (the sftPackTokens convention)
      .withColumn("span_start", col("off") + 2)
      .withColumn("span_tokens", col("text_tokens"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("shard", pmod(col("conv_id"), lit(shards.toLong)))
    val wShard = Window.partitionBy("shard").orderBy("conv_id", "turn")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPack = Window.partitionBy("shard", "pack_id")
    spans
      .withColumn("base",
        sum(when(col("rn") === 1, col("conv_tokens")).otherwise(lit(0L)))
          .over(wShard) - col("conv_tokens"))
      .withColumn("gstart", col("base") + col("span_start") - 1)
      .withColumn("pack_id", floor(col("gstart") / L).cast("long"))
      .withColumn("packed_start", pmod(col("gstart"), L) + 1)
      .withColumn("straddles_pack",
        pmod(col("gstart"), L) + col("span_tokens") > L)
      .withColumn("in_pack",
        least(col("span_tokens"), L - pmod(col("gstart"), L)))
      .withColumn("pack_spans", count(lit(1)).over(wPack))
      .withColumn("pack_loss_tokens", sum(col("in_pack")).over(wPack))
      .select(col("conv_id"), col("turn"), col("shard"), col("pack_id"),
        col("packed_start"), col("span_tokens"), col("span_chars"),
        col("straddles_pack"), col("n_candidates"),
        when(col("n_candidates") >= 2,
          lit(DpoKeyStride - 1) - pmod(col("kc"), lit(DpoKeyStride)))
          .as("chosen_turn"),
        when(col("n_candidates") >= 2,
          lit(DpoKeyStride - 1) - pmod(col("kr"), lit(DpoKeyStride)))
          .as("rejected_turn"),
        when(col("n_candidates") >= 2,
          floor(col("kc") / DpoKeyStride).cast("long")
            - floor(col("kr") / DpoKeyStride).cast("long"))
          .as("margin"),
        col("pack_spans"), col("pack_loss_tokens"),
        floor(lit(10000.0) * col("pack_loss_tokens") / L).cast("long")
          .as("loss_density_e4"))
      .orderBy("conv_id", "turn")
  }

  /** The trained-tokenizer EM replay composed with the four pipeline
    * stages in token coordinates — [[sftPackTokensSql]]'s segmentation
    * CTEs feeding [[sftPipelineSql]]'s window chain. */
  def sftPipelineTokensSql(budget: Int = 512, shards: Int = 8): String =
    s"""WITH seg AS (
      |${TextOps.unigramLmSql()}
      |),
      |t AS (
      |  SELECT doc_id // $TurnsPerConv AS conv_id,
      |    doc_id % $TurnsPerConv AS turn,
      |    CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
      |    CAST(length(text) AS BIGINT) AS span_chars,
      |    CASE WHEN doc_id % $TurnsPerConv >= 1 THEN CAST(floor(10000.0 *
      |      length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
      |      / length(text)) AS BIGINT) END AS score,
      |    text
      |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      |tw AS (
      |  SELECT conv_id, turn, word, count(*) AS cnt
      |  FROM (SELECT conv_id, turn, unnest(string_split(text, ' ')) AS word
      |        FROM t)
      |  WHERE length(word) >= 1 GROUP BY 1, 2, 3),
      |tt AS (
      |  SELECT conv_id, turn, CAST(SUM(cnt * s.n_pieces) AS BIGINT)
      |    AS text_tokens
      |  FROM tw JOIN seg s USING (word) GROUP BY 1, 2),
      |tok AS (
      |  SELECT t.conv_id, t.turn, t.role, t.span_chars, t.score,
      |    coalesce(tt.text_tokens, 0) AS text_tokens,
      |    coalesce(tt.text_tokens, 0) + 2 AS turn_tokens
      |  FROM t LEFT JOIN tt USING (conv_id, turn)),
      |o AS (
      |  SELECT *,
      |    CAST(SUM(turn_tokens) OVER (PARTITION BY conv_id ORDER BY turn)
      |      - turn_tokens AS BIGINT) AS off,
      |    CAST(SUM(turn_tokens) OVER (PARTITION BY conv_id) AS BIGINT)
      |      AS conv_tokens,
      |    SUM(CASE WHEN turn >= 1 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY conv_id) AS n_candidates,
      |    MAX(CASE WHEN turn >= 1 THEN score * $DpoKeyStride
      |      + ${DpoKeyStride - 1} - turn END)
      |      OVER (PARTITION BY conv_id) AS kc,
      |    MIN(CASE WHEN turn >= 1 THEN score * $DpoKeyStride
      |      + ${DpoKeyStride - 1} - turn END)
      |      OVER (PARTITION BY conv_id) AS kr
      |  FROM tok),
      |s AS (
      |  SELECT conv_id, turn, n_candidates, kc, kr, span_chars,
      |    off + 2 AS span_start, text_tokens AS span_tokens, conv_tokens,
      |    row_number() OVER (PARTITION BY conv_id ORDER BY turn) AS rn,
      |    conv_id % $shards AS shard
      |  FROM o WHERE role = 'assistant'),
      |b AS (
      |  SELECT *,
      |    CAST(SUM(CASE WHEN rn = 1 THEN conv_tokens ELSE 0 END)
      |      OVER (PARTITION BY shard ORDER BY conv_id, turn)
      |      - conv_tokens AS BIGINT) AS base
      |  FROM s),
      |p AS (
      |  SELECT conv_id, turn, shard, n_candidates, kc, kr, span_tokens,
      |    span_chars,
      |    (base + span_start - 1) // $budget AS pack_id,
      |    (base + span_start - 1) % $budget + 1 AS packed_start,
      |    (base + span_start - 1) % $budget + span_tokens > $budget
      |      AS straddles_pack,
      |    least(span_tokens, $budget - (base + span_start - 1) % $budget)
      |      AS in_pack
      |  FROM b)
      |SELECT conv_id, CAST(turn AS BIGINT) AS turn,
      |  CAST(shard AS BIGINT) AS shard,
      |  CAST(pack_id AS BIGINT) AS pack_id,
      |  CAST(packed_start AS BIGINT) AS packed_start,
      |  span_tokens, span_chars, straddles_pack,
      |  CAST(n_candidates AS BIGINT) AS n_candidates,
      |  CAST(CASE WHEN n_candidates >= 2
      |    THEN ${DpoKeyStride - 1} - kc % $DpoKeyStride END AS BIGINT)
      |    AS chosen_turn,
      |  CAST(CASE WHEN n_candidates >= 2
      |    THEN ${DpoKeyStride - 1} - kr % $DpoKeyStride END AS BIGINT)
      |    AS rejected_turn,
      |  CAST(CASE WHEN n_candidates >= 2
      |    THEN kc // $DpoKeyStride - kr // $DpoKeyStride END
      |    AS BIGINT) AS margin,
      |  CAST(COUNT(*) OVER (PARTITION BY shard, pack_id) AS BIGINT)
      |    AS pack_spans,
      |  CAST(SUM(in_pack) OVER (PARTITION BY shard, pack_id) AS BIGINT)
      |    AS pack_loss_tokens,
      |  CAST(floor(10000.0 * SUM(in_pack) OVER (PARTITION BY shard, pack_id)
      |    / $budget) AS BIGINT) AS loss_density_e4
      |FROM p ORDER BY conv_id, turn""".stripMargin
}
