package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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
