package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `viterbi_best(word, pieces, scores)` — exact Viterbi segmentation of
  * one word under a unigram piece model (Kudo 2018; SentencePiece's
  * inference rule), as a native codegen'd expression. Returns the
  * STRING-ENCODED optimal DP cell `lpad(10⁹ + Σ(−score), 10, '0') ‖ '|' ‖
  * piece-path` — byte-for-byte the cell the relational DP
  * ([[graft.operators.TextOps.unigramLmSql]]) computes, so the caller's
  * `substring` parsing and the DuckDB oracle are untouched: the kernel is
  * hash-checked against the unrolled relational form from first
  * principles on every run.
  *
  * Why a custom expression (the [[GreedyPieces]] precedent): the DP is a
  * data-dependent loop the relational form can only express as `maxLen`
  * derived columns of 4-way score lookups — measured ~3 s of pure
  * plan/codegen overhead at ANY data size for a vocabulary-grain result.
  * Here the model — driver-bounded by construction (multiCap + alphabet)
  * — becomes one referenced HashMap and the loop is a loop.
  *
  * Semantics replicated EXACTLY from the relational DP:
  *  - candidate (i, j) exists iff `word[i, j)` is in the model;
  *  - cell comparison is lexicographic on the encoded string, i.e.
  *    minimal total negated score first, then the lexicographically
  *    smallest piece path (Java String compare — identical to the
  *    engines' byte compare on the ASCII corpus contract);
  *  - the model must cover every character of `word` (the caller's
  *    character-coverage prune guarantees it) — a gap throws loudly.
  *
  * Contract: `pieces`/`scores` must be FOLDABLE parallel literal arrays
  * (the trained model, collected and passed as `typedlit`); scores are
  * the 1e-6-grid negated-log-prob LONGs (≤ 0). Null word → null. */
case class ViterbiBest(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(LongType, _))
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "viterbi_best requires foldable (literal) pieces/scores arrays")
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"viterbi_best requires (string, array<string>, array<bigint>), " +
          s"got (${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "viterbi_best"

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): ViterbiBest =
    copy(first = newFirst, second = newSecond, third = newThird)

  /** The model as (piece → score map, max piece length) — built once per
    * executor from the foldable literals. */
  @transient private lazy val model: (java.util.HashMap[String, java.lang.Long], Int) = {
    val ps = second.eval(null).asInstanceOf[ArrayData]
    val ss = third.eval(null).asInstanceOf[ArrayData]
    require(ps.numElements() == ss.numElements(),
      "viterbi_best: pieces/scores must be parallel arrays")
    val m = new java.util.HashMap[String, java.lang.Long](ps.numElements() * 2)
    var maxLen = 1
    var i = 0
    while (i < ps.numElements()) {
      val p = ps.getUTF8String(i).toString
      require(p.nonEmpty, "viterbi_best: empty piece in model")
      m.put(p, ss.getLong(i))
      if (p.length > maxLen) maxLen = p.length
      i += 1
    }
    (m, maxLen)
  }

  /** Shared by eval and the codegen reference object (public: the
    * generated class lives outside this package and calls it directly). */
  def best(word: String): String = {
    val (m, maxPiece) = model
    val n = word.length
    val ns = new Array[Long](n + 1)
    val path = new Array[String](n + 1)
    path(0) = ""
    var j = 1
    while (j <= n) {
      var bNs = Long.MaxValue
      var bPath: String = null
      var i = math.max(0, j - maxPiece)
      while (i < j) {
        if (path(i) != null) {
          val sc = m.get(word.substring(i, j))
          if (sc != null) {
            val cNs = ns(i) - sc.longValue()
            val piece = word.substring(i, j)
            val cPath =
              if (path(i).isEmpty) piece else path(i) + " " + piece
            if (bPath == null || cNs < bNs ||
                (cNs == bNs && cPath.compareTo(bPath) < 0)) {
              bNs = cNs; bPath = cPath
            }
          }
        }
        i += 1
      }
      ns(j) = bNs
      path(j) = bPath
      j += 1
    }
    require(path(n) != null,
      s"viterbi_best: no segmentation for '$word' — the model must cover " +
        "every character (character-coverage prune)")
    // the 10-digit cell encoding holds only while 1e9 + Σ(−score) stays
    // below 1e10; past 8 999 999 999 the manual pad would silently emit an
    // 11-char prefix (diverging from the oracle's truncating lpad). Fail
    // loudly instead — unreachable at the 1e-6 grid / maxLen 16, but a
    // future grid change must not corrupt the encoding.
    require(ns(n) < 9000000000L,
      s"viterbi_best: total negated score ${ns(n)} overflows the 10-digit " +
        "cell encoding — widen the pad alongside the oracle's lpad")
    val padded = (1000000000L + ns(n)).toString
    "0" * (10 - padded.length) + padded + "|" + path(n)
  }

  override def nullSafeEval(w: Any, ps: Any, ss: Any): Any =
    UTF8String.fromString(best(w.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // data-dependent loop: call into this referenced instance (model map
    // lives in the reference), staying inside whole-stage codegen
    val self = ctx.addReferenceObj("viterbiBest", this, classOf[ViterbiBest].getName)
    nullSafeCodeGen(ctx, ev, (w, _, _) =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$self.best($w.toString()));")
  }
}

object ViterbiBest {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ViterbiBest].getName, "viterbi_best")
}
