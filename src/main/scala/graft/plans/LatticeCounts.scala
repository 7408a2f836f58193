package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `lattice_counts(word, pieces, scores)` — forward-backward EXPECTED
  * piece counts over one word's segmentation lattice under a unigram
  * piece model (Kudo 2018 §3.2; the soft-EM E-step SentencePiece proper
  * runs, where [[ViterbiBest]] is the hard-EM variant). Returns the
  * word's per-piece expected counts as `"grid:piece grid:piece …"`
  * entries sorted by piece, each grid value `floor(e·10⁶ + 0.5)` of that
  * piece's summed occurrence posteriors — integers, so the caller's
  * corpus aggregation is order-free exact arithmetic. (The number leads
  * because a corpus piece may itself contain ':'; pieces never contain
  * spaces — they are whitespace-split word substrings.)
  *
  * Determinism contract (the cross-engine rules every graft trainer
  * rides):
  *  - piece probabilities use the libm-free exp surrogate
  *    ê(u) = (1 + u/2²⁰)^(2²⁰) — twenty explicit IEEE squarings on
  *    u = score/10⁶ (relative error ≤ ~u²/2²¹, ≈ 6·10⁻⁴ at the deepest
  *    score the character floor allows), the `lr_quality` sigmoid
  *    precedent;
  *  - forward cell α(j) folds candidate terms `α(i)·p̂` in ascending-i
  *    order; backward β(i) folds `p̂·β(j)` in ascending-j order; an
  *    occurrence's posterior is `((α(i)·p̂)·β(j))/α(n)` with exactly that
  *    association — elementary IEEE ops are correctly rounded, so the
  *    DuckDB oracle replaying the same folds as unrolled CTE chains
  *    ([[graft.operators.TextOps.unigramSoftSql]]) reproduces every bit;
  *  - per-piece occurrence sums happen on the 10⁶ grid AFTER rounding,
  *    so they commute (the relational GROUP BY needs no order).
  *
  * Contract: `pieces`/`scores` must be FOLDABLE parallel literal arrays
  * (driver-bounded model); scores are 1e-6-grid log-prob LONGs (≤ 0).
  * The model must cover every character (coverage prune) — a word whose
  * lattice has no path throws loudly. Null word → null. */
case class LatticeCounts(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(LongType, _))
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "lattice_counts requires foldable (literal) pieces/scores arrays")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"lattice_counts requires (string, array<string>, array<bigint>), " +
          s"got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "lattice_counts"

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): LatticeCounts =
    copy(first = newFirst, second = newSecond, third = newThird)

  /** piece → p̂ (the ê surrogate of its grid score), plus max piece len —
    * built once per executor from the foldable literals. */
  @transient private lazy val model: (java.util.HashMap[String, java.lang.Double], Int) = {
    val ps = second.eval(null).asInstanceOf[ArrayData]
    val ss = third.eval(null).asInstanceOf[ArrayData]
    require(ps.numElements() == ss.numElements(),
      "lattice_counts: pieces/scores must be parallel arrays")
    val m = new java.util.HashMap[String, java.lang.Double](ps.numElements() * 2)
    var maxLen = 1
    var i = 0
    while (i < ps.numElements()) {
      val p = ps.getUTF8String(i).toString
      require(p.nonEmpty, "lattice_counts: empty piece in model")
      m.put(p, LatticeCounts.ehat(ss.getLong(i)))
      if (p.length > maxLen) maxLen = p.length
      i += 1
    }
    (m, maxLen)
  }

  /** Shared by eval and the codegen reference object. */
  def counts(word: String): String = {
    val (m, maxPiece) = model
    val n = word.length
    // forward: α(0)=1; α(j) = Σ_{i asc} α(i)·p̂(w[i,j))
    val fwd = new Array[Double](n + 1)
    fwd(0) = 1.0d
    var j = 1
    while (j <= n) {
      var acc = 0.0d
      var i = math.max(0, j - maxPiece)
      while (i < j) {
        val p = m.get(word.substring(i, j))
        if (p != null) acc += fwd(i) * p.doubleValue()
        i += 1
      }
      fwd(j) = acc
      j += 1
    }
    require(fwd(n) > 0d,
      s"lattice_counts: no segmentation for '$word' — the model must " +
        "cover every character (character-coverage prune)")
    // backward: β(n)=1; β(i) = Σ_{j asc} p̂(w[i,j))·β(j)
    val bwd = new Array[Double](n + 1)
    bwd(n) = 1.0d
    var i = n - 1
    while (i >= 0) {
      var acc = 0.0d
      var k = i + 1
      val kMax = math.min(n, i + maxPiece)
      while (k <= kMax) {
        val p = m.get(word.substring(i, k))
        if (p != null) acc += p.doubleValue() * bwd(k)
        k += 1
      }
      bwd(i) = acc
      i -= 1
    }
    // occurrence posteriors, grid-rounded THEN summed per piece (exact)
    val acc = new java.util.TreeMap[String, java.lang.Long]()
    i = 0
    while (i < n) {
      var k = i + 1
      val kMax = math.min(n, i + maxPiece)
      while (k <= kMax) {
        val piece = word.substring(i, k)
        val p = m.get(piece)
        if (p != null) {
          val e = ((fwd(i) * p.doubleValue()) * bwd(k)) / fwd(n)
          val eg = math.floor(e * 1e6 + 0.5).toLong
          val prev = acc.get(piece)
          acc.put(piece, if (prev == null) eg else prev.longValue() + eg)
        }
        k += 1
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder()
    val it = acc.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (sb.length() > 0) sb.append(' ')
      sb.append(e.getValue.longValue()).append(':').append(e.getKey)
    }
    sb.toString
  }

  override def nullSafeEval(w: Any, ps: Any, ss: Any): Any =
    UTF8String.fromString(counts(w.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("latticeCounts", this, classOf[LatticeCounts].getName)
    nullSafeCodeGen(ctx, ev, (w, _, _) =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$self.counts($w.toString()));")
  }
}

object LatticeCounts {
  /** The libm-free exp surrogate: ê(s/10⁶) = (1 + (s/10⁶)/2²⁰)^(2²⁰) as
    * twenty explicit squarings — elementary IEEE ops only, so the DuckDB
    * oracle's CTE chain reproduces it bit-for-bit. */
  def ehat(scoreGrid: Long): Double = {
    val u = scoreGrid.toDouble / 1e6
    var x = 1.0d + u / 1048576.0d
    var r = 0
    while (r < 20) { x = x * x; r += 1 }
    x
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[LatticeCounts].getName, "lattice_counts")
}
