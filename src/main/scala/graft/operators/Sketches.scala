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
}
