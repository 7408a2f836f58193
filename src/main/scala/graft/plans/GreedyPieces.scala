package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `greedy_pieces(word, pieces)` — WordPiece greedy longest-match-first
  * segmentation (Wu et al. 2016; the BERT tokenizer's inference rule) as a
  * native codegen'd expression: at each position, emit the LONGEST piece
  * in the vocabulary that prefixes the remainder and advance past it.
  *
  * Why a custom expression (SURVEY.md §7.4 decision ladder, the
  * [[AdjacentGrams]] precedent): greedy matching is a data-dependent loop,
  * which relational form can only express as `maxLen` unrolled
  * 4-way-left-join steps — measured 4.6 s of pure plan/codegen overhead at
  * sf0.1 for a vocabulary-grain result (the 65-join plan, not the data).
  * Here the vocabulary — driver-bounded by construction (topPieces + the
  * alphabet) — becomes one referenced HashSet and the loop is a loop.
  *
  * Contract: `pieces` must be FOLDABLE (a literal array — the vocabulary
  * is collected and passed as `typedlit`), non-null, with piece lengths
  * ≥ 1; matching is by Java character (same unit as Spark's `substring`).
  * If no piece matches at a position, the single character there is
  * emitted as its own piece — identical semantics to a vocabulary that
  * contains the alphabet, which [[graft.operators.TextOps.wordpieceEncode]]
  * guarantees (and the DuckDB oracle replays relationally, so a divergence
  * would hash-fail). Null word → null; empty word → []. */
case class GreedyPieces(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "greedy_pieces requires a foldable (literal) piece vocabulary")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"greedy_pieces requires (string, array<string>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "greedy_pieces"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GreedyPieces =
    copy(left = newLeft, right = newRight)

  /** The vocabulary as (set, max piece length) — built once per executor
    * from the foldable literal. String keys (not UTF8String) so hashing is
    * by character, matching the per-position substring probe. */
  @transient private lazy val vocab: (java.util.HashSet[String], Int) = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val set = new java.util.HashSet[String](arr.numElements() * 2)
    var maxLen = 1
    var i = 0
    while (i < arr.numElements()) {
      val p = arr.getUTF8String(i).toString
      require(p.nonEmpty, "greedy_pieces: empty piece in vocabulary")
      set.add(p)
      if (p.length > maxLen) maxLen = p.length
      i += 1
    }
    (set, maxLen)
  }

  /** Shared by eval and the codegen reference object (public: the
    * generated class lives outside this package and calls it directly). */
  def segment(word: String): Array[String] = {
    val (set, maxLen) = vocab
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = word.length
    var pos = 0
    while (pos < n) {
      var l = math.min(maxLen, n - pos)
      var hit: String = null
      while (hit == null && l > 1) {
        val cand = word.substring(pos, pos + l)
        if (set.contains(cand)) hit = cand else l -= 1
      }
      if (hit == null) hit = word.substring(pos, pos + 1) // char fallback
      out += hit
      pos += hit.length
    }
    out.toArray
  }

  override def nullSafeEval(w: Any, ps: Any): Any = {
    val segs = segment(w.asInstanceOf[UTF8String].toString)
    val out = new Array[Any](segs.length)
    var i = 0
    while (i < segs.length) { out(i) = UTF8String.fromString(segs(i)); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the loop is data-dependent; generate a call into this expression
    // instance (referenced once per task) rather than inlining it — the
    // hot state (HashSet) lives in the reference, and the call stays
    // inside whole-stage codegen like any other referenced kernel
    val self = ctx.addReferenceObj("greedyPieces", this, classOf[GreedyPieces].getName)
    nullSafeCodeGen(ctx, ev, (w, _) => {
      val segs = ctx.freshName("segs")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |final String[] $segs = $self.segment($w.toString());
         |final Object[] $out = new Object[$segs.length];
         |for (int $i = 0; $i < $segs.length; $i++) {
         |  $out[$i] = org.apache.spark.unsafe.types.UTF8String.fromString($segs[$i]);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }
}

object GreedyPieces {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[GreedyPieces].getName, "greedy_pieces")
}
