package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `adjacent_grams(words, k)` — the space-joined sliding k-grams of a
  * token array, as a native codegen'd Catalyst expression: the engine's
  * n-gram assembly kernel behind the bigram-LM family
  * (`TextOps.bigramCounts`, `docLmScore`) and the 3-gram shingle sites
  * (`Dedup.shinglesExpr`: contamination checks, MinHash shingling, the
  * curation funnel).
  *
  * Why a custom expression (SURVEY.md §7.4 decision ladder, the
  * [[ArrayDot]] precedent): the higher-order
  * `transform(sequence(1, n-1), i -> concat(element_at(w,i), ...))` form
  * runs interpreted with per-position boxing AND per-element bounds-checked
  * `element_at` dereferences — measured ~3.3 s of `bigram_lm`'s sf0.1 time
  * against 0.14 s for the same corpus's plain-explode `vocab_topk`. This
  * expression emits one bounded loop, stays inside whole-stage codegen,
  * and serves any gram width.
  *
  * Semantics (the HOF contract it replaces on every REACHABLE input, so
  * every oracle is unchanged): n = |words|; otherwise max(n − k + 1, 1)
  * grams, gram i = words[i..min(i+k−1, n−1)] joined by one space — i.e.
  * the trailing gram CLAMPS when n < k (a 1-token doc yields its lone
  * token as the single "gram"), which is
  * `concat_ws(' ', slice(words, i, k))`'s behavior. Null array → null.
  * Two deliberate divergences on inputs `split` can never produce:
  * n = 0 returns [] where the `transform(sequence(1, greatest(n−k+1,1)))`
  * HOF (and its DuckDB `generate_series` mirror) would return [''] — an
  * empty token array has no grams, and the HOF's [''] is an artifact of
  * `sequence`'s 1-element floor; and a NULL token element THROWS (below)
  * rather than silently emitting a null gram, because `dataType` promises
  * containsNull = false and a null landing in a no-null array is
  * undefined behavior for downstream codegen. */
case class AdjacentGrams(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"adjacent_grams requires (array<string>, int), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "adjacent_grams"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdjacentGrams =
    copy(left = newLeft, right = newRight)

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(a: Any, kv: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val k = kv.asInstanceOf[Int]
    val n = arr.numElements()
    val m = if (n <= 0) 0 else math.max(n - k + 1, 1)
    // containsNull = false is a promise, not an assumption: a null token
    // would make UTF8String.concat yield a null gram inside a no-null
    // array (UB downstream), so refuse loudly instead
    var c = 0
    while (c < n) {
      if (arr.isNullAt(c)) throw new IllegalArgumentException(
        s"adjacent_grams: null token at position $c (tokens must be non-null)")
      c += 1
    }
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val end = math.min(i + k, n)
      var s = arr.getUTF8String(i)
      var j = i + 1
      while (j < end) { s = UTF8String.concat(s, space, arr.getUTF8String(j)); j += 1 }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val spaceRef = ctx.addReferenceObj("space", space,
      classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, (a, k) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val end = ctx.freshName("end")
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $n <= 0 ? 0 : java.lang.Math.max($n - $k + 1, 1);
         |for (int $c = 0; $c < $n; $c++) {
         |  if ($a.isNullAt($c)) throw new IllegalArgumentException(
         |    "adjacent_grams: null token at position " + $c +
         |    " (tokens must be non-null)");
         |}
         |final Object[] $out = new Object[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  final int $end = java.lang.Math.min($i + $k, $n);
         |  org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |  for (int $j = $i + 1; $j < $end; $j++) {
         |    $s = org.apache.spark.unsafe.types.UTF8String.concat(
         |      $s, $spaceRef, $a.getUTF8String($j));
         |  }
         |  $out[$i] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }
}

object AdjacentGrams {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[AdjacentGrams].getName, "adjacent_grams")
}
