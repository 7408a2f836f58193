package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `array_dist2i(a, b)` — squared euclidean distance of two `array<double>`
  * columns on the engine's 1e-6 integer grid:
  * `Σ floor((a[i]−b[i])²·1e6 + 0.5)` as a LONG, over the common prefix.
  *
  * This is the k-means kernel (`operators/Clustering.scala`): assignment
  * evaluates it k times per corpus row, so like [[ArrayDot]] it must live
  * inside whole-stage codegen — the higher-order `zip_with`+`aggregate`
  * form it replaces runs interpreted with per-element boxing (the same ~4×
  * penalty measured for the dot product), and an unrolled chain breaks the
  * 64 KB generated-method limit.
  *
  * Unlike the dot product, the SUM here needs no fold-order contract: every
  * term is an integer, so any summation order — this loop, the oracle's
  * grouped SUM over exploded rows — produces identical bits. (That is the
  * point of the grid: argmin comparisons can never flip on a last-ulp
  * difference between engines.) Null if either array is null; elements are
  * assumed non-null (embedding vectors).
  */
case class ArrayDist2I(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dist2i requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "array_dist2i"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDist2I =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += math.floor(d * d * 1e6 + 0.5).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += (long) java.lang.Math.floor($d * $d * 1.0E6 + 0.5);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

object ArrayDist2I {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ArrayDist2I].getName, "array_dist2i")
}
