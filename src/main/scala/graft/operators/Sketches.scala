package graft.operators

import graft.{Exprs, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable Misra–Gries heavy-hitters summary: at most `cap` counters;
  * any item with true frequency > n/(cap+1) is GUARANTEED present in the
  * buffer (no false negatives), and every kept count undercounts by at
  * most n/(cap+1). `merge` is the Agarwal et al. mergeable-summaries
  * combine (add counts, then decrement all by the (cap+1)-th largest and
  * drop non-positives), so Spark's partial-aggregation tree — per-partition
  * reduce, then treewise merge — preserves the guarantee exactly.
  *
  * This is the scale path for "which tokens dominate the corpus": a full
  * `groupBy(token)` shuffles EVERY distinct token (billions of keys on a
  * 100 TB corpus); the sketch shuffles ≤ cap counters per partition, and a
  * candidate-restricted exact recount (see [[Sketches.heavyHitters]])
  * shuffles ≤ cap keys — generate-then-verify, the same shape as the LSH
  * dedup family. */
class MisraGries(cap: Int)
  extends org.apache.spark.sql.expressions.Aggregator[String, Map[String, Long], Seq[String]] {
  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], t: String): Map[String, Long] =
    b.get(t) match {
      case Some(c) => b.updated(t, c + 1)
      case None if b.size < cap => b.updated(t, 1L)
      case None =>
        // decrement-all step; dropping zeros keeps the buffer ≤ cap
        b.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
    }

  def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val sum = y.foldLeft(x) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (sum.size <= cap) sum
    else {
      val d = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(cap)
      sum.flatMap { case (k, c) => if (c > d) Some(k -> (c - d)) else None }
    }
  }

  def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted
  def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: org.apache.spark.sql.Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

/** Mergeable Bloom filter over pre-hashed keys: `mBits` bits as a long-word
  * array, `k` probe positions per key by Kirsch–Mitzenmacher double hashing
  * (`idx_i = h1 + i·h2 mod m`). The two base hashes arrive ALREADY COMPUTED
  * (Catalyst `xxhash64` columns) so the probe-side bit test — built from the
  * same `xxhash64` plus `pmod`/`shiftright` built-ins — lands on identical
  * indices; this class only places bits. `merge` is word-wise OR: the
  * partial-aggregation tree is exactly multi-shard filter union, and the
  * buffer is a fixed `mBits/64`-word array regardless of key count. */
class BloomAgg(mBits: Int, k: Int)
  extends org.apache.spark.sql.expressions.Aggregator[(Long, Long), Array[Long], Seq[Long]] {
  require(mBits > 0 && k > 0, s"BloomAgg needs positive mBits/k, got $mBits/$k")
  // round UP: a non-multiple-of-64 mBits must still cover bit mBits−1
  // (a truncating mBits/64 word count made reduce() index past the array)
  def zero: Array[Long] = new Array[Long]((mBits + 63) / 64)

  def reduce(b: Array[Long], t: (Long, Long)): Array[Long] = {
    val (h1, h2) = t
    var i = 0
    while (i < k) {
      // identical wrap-then-pmod as the probe test's `pmod(h1 + iL*h2, mL)`
      val x = h1 + i.toLong * h2
      val idx = ((x % mBits) + mBits) % mBits
      b((idx >> 6).toInt) |= 1L << (idx & 63)
      i += 1
    }
    b
  }

  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) |= y(i); i += 1 }
    x
  }

  def finish(b: Array[Long]): Seq[Long] = b.toSeq
  def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Sketch-based operators — bounded-memory summaries with an exact verify
  * pass, for aggregates whose naive form shuffles the full key universe. */
object Sketches {

  /** EXACT heavy hitters (tokens with frequency > total/`k`) computed the
    * scale-correct way: a [[MisraGries]] sketch pass nominates ≤ `cap`
    * candidates (its no-false-negative guarantee — cap = 4k, well above
    * the k-1 bound, holds a fortiori at threshold total/k), then a second
    * pass recounts ONLY the candidates and applies the exact threshold.
    * Both passes shuffle O(cap) keys regardless of vocabulary size; the
    * result is IDENTICAL to the full `groupBy(token) HAVING n > total/k`
    * the oracle runs — approximate machinery, exact answer. */
  def heavyHitters(spark: SparkSession, sfDir: String, k: Int = 200): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
    val candidates = toks.as[String]
      .select(new MisraGries(4 * k).toColumn.name("cand"))
    val counts = toks
      .join(broadcast(candidates.select(explode(col("cand")).as("token"))), "token")
      .groupBy("token").agg(count(lit(1)).as("n"))
    counts.crossJoin(broadcast(toks.agg(count(lit(1)).as("total"))))
      .filter(col("n").cast("double") > col("total") / lit(k.toDouble))
      .select(col("token"), col("n"))
      .orderBy("token")
  }

  def heavyHittersSql(k: Int = 200): String =
    s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
      |tot AS (SELECT count(*) AS total FROM t)
      |SELECT token, count(*) AS n
      |FROM t, tot GROUP BY token, tot.total
      |HAVING CAST(count(*) AS DOUBLE) > tot.total / $k
      |ORDER BY token""".stripMargin

  /** Count–Min sketch (Cormode & Muthukrishnan 2005) — the mergeable
    * COUNTING sketch beside the Misra–Gries CANDIDATE sketch
    * ([[heavyHitters]]): `d` independent hash rows × `w` buckets of sums.
    * Relationally the sketch is one map-side-combinable aggregate over
    * (row, bucket) cells — d·w longs total regardless of vocabulary, so
    * the shuffle after partial aggregation is sketch-sized at any corpus
    * size, and summing cells across partitions IS the sketch's merge
    * operation (multi-shard union for free, like [[hllDistinct]]'s
    * registers). A token's estimate is min over rows of its cell — an
    * overestimate by exactly the colliding mass, NEVER an undercount
    * (ε ≈ e/w of total mass at confidence 1−e^(−d)); the spec pins
    * n_cms ≥ n_true pointwise and the oracle replays every bucket.
    * Output: the top tokens by exact count with their CMS estimate and
    * overcount — the exact recount is the verification pass a production
    * run would sample, not part of the sketch cost. */
  def cmsCounts(spark: SparkSession, sfDir: String, d: Int = 4,
      w: Int = 1024, topK: Int = 200): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
    def buckets(tok: Column) = array((0 until d).map { r =>
      struct(lit(r).as("r"),
        pmod(Exprs.md5num(concat(lit(s"cms${r}_"), tok)), lit(w.toLong))
          .as("bkt"))
    }: _*)
    val cells = toks.select(explode(buckets(col("token"))).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bkt").as("bkt"))
      .agg(count(lit(1)).as("cell"))
    val top = toks.groupBy("token").agg(count(lit(1)).as("n_true"))
      .orderBy(col("n_true").desc, col("token")).limit(topK)
    top.select(col("token"), col("n_true"),
        explode(buckets(col("token"))).as("rb"))
      .select(col("token"), col("n_true"), col("rb.r").as("r"),
        col("rb.bkt").as("bkt"))
      .join(broadcast(cells), Seq("r", "bkt"))
      .groupBy("token", "n_true")
      .agg(min("cell").as("n_cms"))
      .select(col("token"), col("n_true"), col("n_cms"),
        (col("n_cms") - col("n_true")).as("overcount"))
      .orderBy(col("n_true").desc, col("token"))
  }

  def cmsCountsSql(d: Int = 4, w: Int = 1024, topK: Int = 200): String =
    s"""WITH t AS (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
      |rk AS (SELECT unnest(generate_series(0, ${d - 1})) AS r),
      |keyed AS (
      |  SELECT t.token, rk.r,
      |    CAST(('0x' || substr(md5('cms' || CAST(rk.r AS VARCHAR) || '_'
      |      || t.token), 1, 8)) AS BIGINT) % $w AS bkt
      |  FROM t CROSS JOIN rk),
      |cells AS (SELECT r, bkt, count(*) AS cell FROM keyed GROUP BY 1, 2),
      |top AS (
      |  SELECT token, count(*) AS n_true FROM t GROUP BY 1
      |  ORDER BY n_true DESC, token LIMIT $topK),
      |est AS (
      |  SELECT tp.token, tp.n_true, min(c.cell) AS n_cms
      |  FROM top tp
      |  JOIN keyed k ON k.token = tp.token
      |  JOIN cells c ON c.r = k.r AND c.bkt = k.bkt
      |  GROUP BY 1, 2)
      |SELECT token, n_true, CAST(n_cms AS BIGINT) AS n_cms,
      |  CAST(n_cms - n_true AS BIGINT) AS overcount
      |FROM est ORDER BY n_true DESC, token""".stripMargin

  /** HyperLogLog distinct-shingle count per document source (Flajolet et
    * al. 2007), built fully relationally and DETERMINISTICALLY so the
    * DuckDB oracle replays the sketch bit-for-bit:
    *
    *  - item hash = md5 of the 3-word shingle; register index = first 8
    *    bits (`m` = 256 registers), rank ρ = 1 + leading-zero count of
    *    the next 48 bits (computed by STRING inspection of the hex — no
    *    float log2, so both engines agree exactly);
    *  - register state = `max(ρ)` per (source, register) — a map-side-
    *    combinable aggregate, and the sketch's merge operation, so
    *    Spark's partial+final tree IS multi-shard sketch union;
    *  - the harmonic mean Σ 2^-ρ is kept EXACT by scaling to integers:
    *    Σ 2^(49-ρ) ≤ m·2^49 fits a long, immune to float summation
    *    order (Spark sums partitions in nondeterministic order);
    *  - the only doubles are the final estimate formula (one fixed
    *    expression evaluated identically in both engines) and its
    *    small-range linear-counting branch `m·ln(m/V)` (Flajolet's
    *    correction for E ≤ 2.5m with empty registers).
    *
    * Scale: the shuffle after partial aggregation is ≤ sources × m rows
    * of (key, byte) REGARDLESS of corpus size — the whole point vs
    * `count(distinct shingle)`, which shuffles every distinct shingle
    * (TBs at corpus scale). `n_exact` is a demonstration verify pass
    * (one distinct-shingle aggregate) that a 100 TB run would drop;
    * standard error is 1.04/√m ≈ 6.5 % at m = 256. */
  def hllDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val m = 256 // 8 register-index bits; 48 rank bits
    val shingles = Tables.documents(spark, sfDir)
      .withColumn("words", split(col("text"), " "))
      .withColumn("sh", expr(Dedup.shinglesExpr))
      .select(col("source"), explode(col("sh")).as("s"))
    val hashed = shingles
      .withColumn("hx", md5(col("s")))
      .withColumn("bucket", conv(substring(col("hx"), 1, 2), 16, 10).cast("int"))
      .withColumn("stripped", regexp_replace(substring(col("hx"), 3, 12), "^0+", ""))
      .withColumn("d", conv(substring(col("stripped"), 1, 1), 16, 10).cast("int"))
      .withColumn("rho", when(length(col("stripped")) === 0, 49).otherwise(
        (lit(12) - length(col("stripped"))) * 4 + lit(1) +
          when(col("d") >= 8, 0).when(col("d") >= 4, 1)
            .when(col("d") >= 2, 2).otherwise(3)))
    val regs = hashed.groupBy("source", "bucket").agg(max(col("rho")).as("r"))
    val agg = regs.groupBy("source").agg(
      count(lit(1)).as("filled"),
      sum(expr("shiftleft(cast(1 as bigint), 49 - r)")).as("s_filled"))
    val exact = shingles.groupBy("source")
      .agg(count_distinct(col("s")).as("n_exact"))
    // E = α_m · m² / Σ 2^-ρ, with the Σ carried as the exact integer
    // Σ 2^(49-ρ); empty registers contribute ρ=0 → 2^49 each. The same
    // literal arithmetic (same operation order) runs in the oracle, so
    // the IEEE doubles agree exactly.
    val sScaled = col("s_filled") + (lit(m.toLong) - col("filled")) * lit(1L << 49)
    val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
      lit(65536.0) * lit(562949953421312.0) / sScaled.cast("double")
    val vEmpty = lit(m.toLong) - col("filled")
    val est = when(raw <= lit(2.5 * m) && vEmpty > 0,
      lit(256.0) * log(lit(256.0) / vEmpty.cast("double"))).otherwise(raw)
    agg.join(exact, Seq("source"))
      .select(col("source"), col("n_exact"), vEmpty.as("v_empty"),
        sScaled.as("s_scaled"), round(est, 3).as("hll_est"))
      .orderBy("source")
  }

  /** EXACT quantiles without a global sort — the 100 TB path for the
    * quantile fields that [[graft.operators.Quality.numericProfile]] and
    * `len_quantiles` compute with Spark's exact `percentile` aggregate
    * (whose buffer is a per-group value→count map: fine at catalog grain,
    * a memory wall when the value universe is large). Classic two-pass
    * selection (Munro–Paterson style):
    *
    *  1. one scan → (min, max, n) — three map-side-combined aggregates;
    *  2. one scan → a `bins`-bucket equi-width histogram (≤ `bins` rows
    *     shuffle, regardless of data size);
    *  3. the histogram (bounded at `bins` rows — O(4k), same justified
    *     driver-side bound as the dedup union-find) locates, for each
    *     target rank, its bucket and within-bucket rank;
    *  4. one scan FILTERED to just the hit buckets ranks values inside
    *     each bucket — `row_number` partitioned BY BUCKET, never a global
    *     or single-partition window — and keeps the row at the target
    *     rank. Membership is decided by BUCKET EQUALITY on the same
    *     computed bucket expression as pass 2 (self-consistent by
    *     construction); a ±1-bucket RANGE guard on the raw value — wide
    *     enough that float boundary rounding can never disagree with the
    *     floor-bucket by a whole bucket — is what reaches the parquet
    *     scan as a pushed filter, so row-group pruning still skips the
    *     ~(1 − hits/bins) of the file no target lands in.
    *
    * Rank convention is DuckDB's `quantile_disc`: 1-based rank
    * `max(1, ⌈p·n⌉)` (probed empirically — the lower-interpolation
    * `⌊p·(n−1)⌋+1` disagrees whenever frac(p·n) < p), computed with the
    * identical IEEE double multiply on both sides. Ties: `row_number` may
    * pick any row of an equal-value run, but every such row carries the
    * same value, so the answer is deterministic. */
  def quantiles2pass(spark: SparkSession, sfDir: String,
      ps: Seq[Double] = Seq(0.01, 0.25, 0.5, 0.75, 0.99),
      bins: Int = 4096): DataFrame =
    quantilesOf(
      Tables.lineitem(spark, sfDir).select(col("l_extendedprice")),
      "l_extendedprice", ps, bins)

  /** [[quantiles2pass]] over ANY numeric column: the library form. `df`
    * may be any frame; only `valueCol` is read (select it first for a
    * pruned scan). */
  def quantilesOf(df: DataFrame, valueCol: String,
      ps: Seq[Double], bins: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    // NULL-excluding like quantile_disc: n must be the non-null count or
    // every rank silently shifts
    val v = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val statsRow = v.agg(min("v"), max("v"), count(lit(1))).collect()(0)
    if (statsRow.isNullAt(0)) {
      // empty (or all-null) input: no ranks exist — empty result, same
      // shape as quantile_disc over zero rows
      import spark.implicits._
      return Seq.empty[(Double, Double)].toDF("q", "value")
    }
    val (dLo, dHi, cnt) =
      (statsRow.getDouble(0), statsRow.getDouble(1), statsRow.getLong(2))
    val width = (dHi - dLo) / bins
    def bucketOf(c: org.apache.spark.sql.Column) =
      if (width == 0d) lit(0) else
        least(lit(bins - 1), floor((c - lit(dLo)) / lit(width)).cast("int"))
    val hist = v.groupBy(bucketOf(col("v")).as("b"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cumBefore = (0 until bins).scanLeft(0L)((acc, b) => acc + hist.getOrElse(b, 0L))
    // DuckDB quantile_disc rank: identical double multiply → identical ceil
    val targets = ps.map { p =>
      val rank = math.ceil(p * cnt).toLong.max(1L)
      val b = (0 until bins).find(b => cumBefore(b + 1) >= rank).getOrElse(bins - 1)
      (p, b, rank - cumBefore(b))
    }
    import spark.implicits._
    val tdf = targets.toDF("q", "b", "wrank")
    val hit = targets.map(_._2).distinct
    // pushable guard: ±1 bucket of slack around each hit bucket — floor
    // rounding moves a value at most one ulp across a boundary, never a
    // whole bucket, so no bucket-b row can fall outside [b−1, b+2)
    val guard =
      if (width == 0d) lit(true)
      else hit.map(b => col("v").between(
        lit(dLo + (b - 1).toDouble * width),
        lit(dLo + (b + 2).toDouble * width))).reduce(_ || _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("b").orderBy("v")
    v.filter(guard)
      .withColumn("b", bucketOf(col("v")))
      .filter(col("b").isin(hit: _*))
      .withColumn("wrank", row_number().over(w).cast("long"))
      .join(broadcast(tdf), Seq("b", "wrank"))
      .select(col("q"), col("v").as("value"))
      .orderBy("q")
  }

  def quantiles2passSql(ps: Seq[Double] = Seq(0.01, 0.25, 0.5, 0.75, 0.99)): String =
    ps.map(p =>
      s"SELECT CAST($p AS DOUBLE) AS q, quantile_disc(l_extendedprice, $p) AS value FROM lineitem")
      .mkString("", "\nUNION ALL\n", "\nORDER BY q")

  /** Per-GROUP exact quantiles, fully relationally — the scale path for
    * `len_quantiles`-shaped queries when the per-group value universe
    * outgrows the exact `percentile` aggregate's counts-map buffer. Same
    * two-pass selection as [[quantilesOf]], but nothing ever reaches the
    * driver, so the GROUP COUNT is unbounded too:
    *
    *  1. per-group (lo, hi, n) — one hash aggregate;
    *  2. per-(group, bucket) histogram — one hash aggregate, ≤ G·bins
    *     rows; cumulative counts via a window PARTITIONED BY GROUP over
    *     those G·bins rows (never the data);
    *  3. each (group, p) target picks its bucket by an equi-join on group
    *     with the cum-range residual (exactly one histogram row matches);
    *  4. rows inner-join the deduplicated hit-bucket list on (group,
    *     bucket) — dedup BEFORE the join so two quantiles sharing a
    *     bucket cannot duplicate rows under the window — then
    *     `row_number` partitioned by (group, bucket) meets the
    *     within-bucket rank.
    *
    * Rank convention is `quantile_disc` per group, computed with the
    * same IEEE `max(1, ⌈p·n⌉)` in Spark SQL as the oracle. */
  def groupQuantiles2pass(spark: SparkSession, sfDir: String,
      ps: Seq[Double] = Seq(0.25, 0.5, 0.75),
      bins: Int = 1024): DataFrame =
    groupQuantilesOf(Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars")), "lang", "n_chars", ps, bins)

  def groupQuantilesOf(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double], bins: Int = 1024): DataFrame = {
    val g = col(groupCol)
    val v = col(valueCol)
    // NULL-excluding like quantile_disc (see quantilesOf)
    val df2 = df.filter(v.isNotNull)
    val stats = df2.groupBy(g.as("g"))
      .agg(min(v.cast("double")).as("lo"), max(v.cast("double")).as("hi"),
        count(lit(1)).as("n"))
      .withColumn("w", (col("hi") - col("lo")) / lit(bins))
    def bucketOf(value: org.apache.spark.sql.Column) =
      when(col("w") === 0d, lit(0)).otherwise(
        least(lit(bins - 1),
          floor((value.cast("double") - col("lo")) / col("w")).cast("int")))
    // join strategies deliberately UNhinted: per-group stats and the
    // hit-bucket list are G-sized and G·P-sized — statistics/AQE broadcast
    // them when they fit (the common case, leaving the data unshuffled)
    // and fall back to shuffle joins at genuinely unbounded G
    val rows = df2.select(g.as("g"), v.as("v"))
      .join(stats, "g")
      .withColumn("b", bucketOf(col("v")))
    // default running frame; b is unique per (g, b) row so RANGE == ROWS
    val hist = rows.groupBy(col("g"), col("b")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(
        org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("b")))
      .withColumn("cum_before", col("cum") - col("c"))
    val targets = stats
      .withColumn("q", explode(array(ps.map(lit): _*)))
      .withColumn("rank",
        greatest(lit(1L), ceil(col("q") * col("n").cast("double")).cast("long")))
      .select(col("g"), col("q"), col("rank"))
    val hit = targets.join(hist, Seq("g"))
      .filter(col("cum_before") < col("rank") && col("cum") >= col("rank"))
      .select(col("g"), col("q"), col("b"),
        (col("rank") - col("cum_before")).as("wrank"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g", "b").orderBy("v")
    val hit2 = hit.select(col("g").as("hg"), col("q"),
      col("b").as("hb"), col("wrank"))
    rows.select(col("g"), col("v"), col("b"))
      .join(hit.select("g", "b").distinct(), Seq("g", "b"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .join(hit2,
        col("g") === col("hg") && col("b") === col("hb")
          && col("rn") === col("wrank"))
      .select(col("g").as(groupCol), col("q"), col("v").as("value"))
      .orderBy(groupCol, "q")
  }

  def groupQuantiles2passSql(ps: Seq[Double] = Seq(0.25, 0.5, 0.75)): String =
    ps.map(p =>
      s"""SELECT lang, CAST($p AS DOUBLE) AS q,
         |  quantile_disc(n_chars, $p) AS value
         |FROM documents GROUP BY lang""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY lang, q")

  /** Per-group IQR (Tukey-fence) outlier detection — a COMPOSITION of
    * [[groupQuantilesOf]]: the per-language q1/q3 come from the relational
    * two-pass selection (exact at any group count, no percentile
    * counts-map), pivot to one row per group, broadcast back, and the
    * fence test `v < q1 − 1.5·IQR ∨ v > q3 + 1.5·IQR` is a per-row
    * comparison. Doubles appear only in the fence arithmetic — one fixed
    * expression on exact integer quantiles, evaluated identically in the
    * oracle. */
  def iqrOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val qs = groupQuantilesOf(docs.select(col("lang"), col("n_chars")),
        "lang", "n_chars", Seq(0.25, 0.75))
      .groupBy("lang").pivot("q", Seq(0.25, 0.75)).agg(first("value"))
      .select(col("lang"), col("`0.25`").as("q1"), col("`0.75`").as("q3"))
      .withColumn("lo", col("q1").cast("double")
        - lit(1.5d) * (col("q3") - col("q1")).cast("double"))
      .withColumn("hi", col("q3").cast("double")
        + lit(1.5d) * (col("q3") - col("q1")).cast("double"))
    docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .join(broadcast(qs.select("lang", "lo", "hi")), "lang")
      .filter(col("n_chars").cast("double") < col("lo")
        || col("n_chars").cast("double") > col("hi"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("lo").as("lo_fence"), col("hi").as("hi_fence"))
      .orderBy("doc_id")
  }

  val iqrOutliersSql: String =
    """WITH q AS (
      |  SELECT lang, quantile_disc(n_chars, 0.25) AS q1,
      |    quantile_disc(n_chars, 0.75) AS q3
      |  FROM documents GROUP BY lang),
      |f AS (
      |  SELECT lang, CAST(q1 AS DOUBLE) - 1.5 * CAST(q3 - q1 AS DOUBLE) AS lo,
      |    CAST(q3 AS DOUBLE) + 1.5 * CAST(q3 - q1 AS DOUBLE) AS hi
      |  FROM q)
      |SELECT d.doc_id, d.lang, d.n_chars, f.lo AS lo_fence, f.hi AS hi_fence
      |FROM documents d JOIN f ON d.lang = f.lang
      |WHERE CAST(d.n_chars AS DOUBLE) < f.lo OR CAST(d.n_chars AS DOUBLE) > f.hi
      |ORDER BY d.doc_id""".stripMargin

  /** Per-group winsorized mean — the robust-estimation composition on the
    * same relational quantile machinery as [[iqrOutliers]]: the exact
    * per-group p05/p95 cuts come from [[groupQuantilesOf]] (actual data
    * values, quantile_disc parity), every value clamps into [q05, q95],
    * and both the raw and winsorized means reduce as grid-LONG sums.
    * Reporting both means plus the clamp counts is the standard audit
    * shape: the raw−winsorized gap is the outlier influence a downstream
    * consumer (pricing model, anomaly baseline) would otherwise absorb.
    *
    * Scale: the G×2 cut table broadcasts back; the corpus is touched by
    * the two histogram passes and one final aggregate — no global sort,
    * no per-group collect. */
  def winsorizedStats(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"))
    val cuts = groupQuantilesOf(li, "l_returnflag", "l_extendedprice",
        Seq(0.05, 0.95))
      .groupBy("l_returnflag").pivot("q", Seq(0.05, 0.95)).agg(first("value"))
      .select(col("l_returnflag"), col("`0.05`").as("q05"),
        col("`0.95`").as("q95"))
    val v = col("l_extendedprice").cast("double")
    val w = least(greatest(v, col("q05")), col("q95"))
    li.join(broadcast(cuts), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        Exprs.r4(Exprs.gsum(v) / count(lit(1))).as("mean_raw"),
        Exprs.r4(Exprs.gsum(w) / count(lit(1))).as("mean_winsorized"),
        sum(when(v < col("q05"), 1L).otherwise(0L)).as("n_clamped_lo"),
        sum(when(v > col("q95"), 1L).otherwise(0L)).as("n_clamped_hi"))
      .orderBy("l_returnflag")
  }

  val winsorizedStatsSql: String =
    """WITH q AS (
      |  SELECT l_returnflag AS g,
      |    CAST(quantile_disc(l_extendedprice, 0.05) AS DOUBLE) AS q05,
      |    CAST(quantile_disc(l_extendedprice, 0.95) AS DOUBLE) AS q95
      |  FROM lineitem GROUP BY 1)
      |SELECT l.l_returnflag, count(*) AS n,
      |  floor((CAST(SUM(CAST(floor(l.l_extendedprice * 10000 + 0.5) AS BIGINT))
      |    AS DOUBLE) / 10000 / count(*)) * 10000 + 0.5) / 10000 AS mean_raw,
      |  floor((CAST(SUM(CAST(floor(
      |      least(greatest(CAST(l.l_extendedprice AS DOUBLE), q.q05), q.q95)
      |      * 10000 + 0.5) AS BIGINT))
      |    AS DOUBLE) / 10000 / count(*)) * 10000 + 0.5) / 10000
      |    AS mean_winsorized,
      |  CAST(SUM(CASE WHEN CAST(l.l_extendedprice AS DOUBLE) < q.q05
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
      |  CAST(SUM(CASE WHEN CAST(l.l_extendedprice AS DOUBLE) > q.q95
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi
      |FROM lineitem l JOIN q ON l.l_returnflag = q.g
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Bloom-pruned semi-join — the explicit form of runtime row-level
    * filtering, for the join shape where the build-side KEY SET is too big
    * to broadcast exactly but a bitset summary of it is not (at 10⁸ urgent
    * orders an exact long set is ~1.6 GB; a 10-bits/key Bloom filter is
    * ~125 MB and still catches ~99 % of non-matching probe rows). One
    * aggregate folds the build keys into an m-bit filter (per-partition
    * word-array buffers OR-merged map-side — the canonical mergeable
    * sketch); the probe side tests k double-hashed bits with pure codegen
    * built-ins BEFORE its shuffle, so the exchange moves only true matches
    * plus the ~(1−e^(−kn/m))^k false-positive sliver; the exact semi-join
    * afterwards removes that sliver, making the result IDENTICAL to the
    * unfiltered semi-join the oracle runs. Both sides derive the two base
    * hashes with the same Catalyst `xxhash64`, so the Scala bit-setter and
    * the Column bit-tester see the same indices by construction. */
  def bloomSemiJoin(spark: SparkSession, sfDir: String,
      mBits: Int = 1 << 17, k: Int = 5): DataFrame = {
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    bloomPrune(Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice")),
        "l_orderkey", urgent, "o_orderkey", mBits, k)
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(floor(col("l_extendedprice") * lit(1e4) + lit(0.5d))
          .cast("long")).as("rev_grid"))
      .orderBy("suppkey")
  }

  /** The library form: semi-join `probe` to `build`'s key set, with the
    * probe side Bloom-pruned before its shuffle. Returns probe rows whose
    * `probeKey` appears in `build(buildKey)` — exactly the plain semi-join,
    * computed with the probe exchange shrunk to matches + FP sliver. */
  def bloomPrune(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      mBits: Int = 1 << 17, k: Int = 5): DataFrame = {
    val spark = probe.sparkSession
    import spark.implicits._
    require(mBits > 0 && k > 0, s"bloomPrune needs positive mBits/k, got $mBits/$k")
    // xxhash64 is TYPE-sensitive: the same value hashes differently as INT
    // vs BIGINT, and a silent physical-type drift between the two tables
    // (exactly the parquet regeneration events.ts absorbed) would fail
    // every true match's bit test — a false NEGATIVE the trailing exact
    // semi-join can never restore. Hash both sides through ONE unified
    // type: equal dtypes pass through, differing integral dtypes widen to
    // long (lossless), anything else is a caller error — refuse loudly
    // rather than return a silently-empty join.
    import org.apache.spark.sql.types._
    val (pt, bt) = (probe.schema(probeKey).dataType, build.schema(buildKey).dataType)
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    val hashKey: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (pt == bt) identity
      else if (integral(pt) && integral(bt)) _.cast("long")
      else throw new IllegalArgumentException(
        s"bloomPrune key dtypes differ and are not both integral: $pt vs $bt")
    val keys = build.select(col(buildKey))
    val bloom = keys.select(xxhash64(hashKey(col(buildKey))).as("h1"),
        xxhash64(hashKey(col(buildKey)), lit("bloom2")).as("h2")).as[(Long, Long)]
      .select(new BloomAgg(mBits, k).toColumn.name("bits"))
    val probeCols = probe.columns
    // internal working columns use a reserved prefix: a probe frame that
    // already carries h1/h2/bits must come through unscathed
    val (h1c, h2c, bitsC) = ("__bloom_h1", "__bloom_h2", "__bloom_bits")
    require(!probeCols.exists(Set(h1c, h2c, bitsC)),
      s"probe frame already has a ${Set(h1c, h2c, bitsC).mkString("/")} column")
    val withBits = probe
      .withColumn(h1c, xxhash64(hashKey(col(probeKey))))
      .withColumn(h2c, xxhash64(hashKey(col(probeKey)), lit("bloom2")))
      .crossJoin(broadcast(bloom.select(col("bits").as(bitsC))))
    // bit i test, all codegen built-ins; `h1 + i·h2` wraps in two's
    // complement exactly as the Scala setter does, and pmod folds the
    // wrap into [0, m)
    val mayMatch = (0 until k).map { i =>
      s"""((shiftright(element_at($bitsC,
         |   cast(shiftright(pmod($h1c + ${i}L * $h2c, ${mBits}L), 6) as int) + 1),
         |   cast(pmod($h1c + ${i}L * $h2c, ${mBits}L) % 64 as int)) & 1) = 1)"""
        .stripMargin.replace("\n", " ")
    }.mkString(" AND ")
    withBits.filter(expr(mayMatch))
      .select(probeCols.map(col): _*)
      .join(keys.select(hashKey(col(buildKey)).as(probeKey)),
        Seq(probeKey), "left_semi")
  }

  val bloomSemiJoinSql: String =
    """SELECT l_suppkey AS suppkey, count(*) AS n_items,
      |  CAST(SUM(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS rev_grid
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
      |                     WHERE o_orderpriority = '1-URGENT')
      |GROUP BY 1 ORDER BY suppkey""".stripMargin

  val hllDistinctSql: String =
    """WITH w AS (SELECT source, string_split(text, ' ') AS words FROM documents),
      |sh AS (SELECT source, unnest(list_transform(generate_series(1, greatest(len(words) - 2, 1)),
      |         i -> array_to_string(list_slice(words, i, i + 2), ' '))) AS s FROM w),
      |h AS (SELECT source,
      |        CAST(('0x' || substr(md5(s), 1, 2)) AS BIGINT) AS bucket,
      |        regexp_replace(substr(md5(s), 3, 12), '^0+', '') AS stripped
      |      FROM sh),
      |rho AS (SELECT source, bucket,
      |         CASE WHEN stripped = '' THEN 49
      |              ELSE (12 - length(stripped)) * 4 + 1 +
      |                CASE WHEN d >= 8 THEN 0 WHEN d >= 4 THEN 1
      |                     WHEN d >= 2 THEN 2 ELSE 3 END END AS rho
      |        FROM (SELECT source, bucket, stripped,
      |                CASE WHEN stripped = '' THEN 0
      |                     ELSE CAST(('0x' || substr(stripped, 1, 1)) AS BIGINT) END AS d
      |              FROM h)),
      |reg AS (SELECT source, bucket, max(rho) AS r FROM rho GROUP BY 1, 2),
      |agg AS (SELECT source, count(*) AS filled,
      |          CAST(sum(CAST(1 AS BIGINT) << (49 - r)) AS BIGINT) AS s_filled
      |        FROM reg GROUP BY 1),
      |ex AS (SELECT source, count(DISTINCT s) AS n_exact FROM sh GROUP BY 1),
      |est AS (SELECT a.source, n_exact, 256 - filled AS v_empty,
      |          s_filled + (256 - filled) * (CAST(1 AS BIGINT) << 49) AS s_scaled,
      |          0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 562949953421312.0
      |            / CAST(s_filled + (256 - filled) * (CAST(1 AS BIGINT) << 49) AS DOUBLE) AS raw
      |        FROM agg a JOIN ex ON a.source = ex.source)
      |SELECT source, n_exact, v_empty, s_scaled,
      |  round(CASE WHEN raw <= 640.0 AND v_empty > 0
      |             THEN 256.0 * ln(256.0 / CAST(v_empty AS DOUBLE)) ELSE raw END, 3) AS hll_est
      |FROM est ORDER BY source""".stripMargin
}
