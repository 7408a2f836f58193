package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `array_dot(a, b)` — dot product of two `array<double>` columns as a native
  * codegen'd Catalyst expression (the engine's vector-math kernel, used by
  * every ANN / embedding-dedup operator in `operators/Similarity.scala` and
  * `operators/Dedup.scala`; norms are `sqrt(array_dot(v, v))`).
  *
  * Why a custom expression (SURVEY.md §7.4 decision ladder):
  *  - the higher-order `aggregate`/`zip_with` forms run interpreted with
  *    per-element boxing (measured ~4× slower at 64 dims);
  *  - an unrolled 64-term `element_at` chain is codegen'd but Catalyst's
  *    constraint inference duplicates it into filters, and the generated
  *    method then exceeds the JVM's 64 KB limit — whole-stage codegen
  *    falls back to interpreted mode for the entire stage (observed in the
  *    round-1 bench: `InternalCompilerException: Code grows beyond 64 KB`);
  *  - this expression emits one bounded loop (~10 lines of generated code
  *    regardless of dimensionality), stays inside whole-stage codegen, and
  *    works for any vector width — nothing hardcodes 64.
  *
  * Semantics: Σ a[i]·b[i] over the common prefix, accumulated left-to-right
  * (i = 0,1,2,…) — the exact FP fold order the DuckDB oracle replays via
  * `list_reduce(list_prepend(0.0, list_transform(...)))`. Null if either
  * array is null; elements are assumed non-null (embedding vectors).
  */
case class ArrayDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

object ArrayDot {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ArrayDot].getName, "array_dot")
}
