package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** `opaque(e)` — identity passthrough that REPORTS itself nondeterministic,
  * used as a zero-cost optimizer barrier around expensive projections
  * (`from_json` of a full payload envelope).
  *
  * Why: filtering on a field of a parsed struct makes Catalyst push the
  * predicate through the parse projection, substituting the alias — the
  * WHOLE `from_json` gets duplicated into the pushed-down filter and every
  * payload string is tokenized twice (measured in round 1; the prior
  * workaround was a second minimal-schema parse, which still scans the full
  * JSON text once more). `PushPredicateThroughNonJoin` only substitutes
  * deterministic aliases and `CollapseProject` refuses to inline a
  * nondeterministic alias referenced more than once, so wrapping the parse
  * in `opaque` pins it to exactly one evaluation per row: the filter and
  * the star-expansion above both read the materialized struct.
  *
  * Runtime cost is nothing — eval and codegen delegate straight to the
  * child. Semantically the child IS deterministic; the flag is a planning
  * hint only, same trick as Spark's own `AssertTrue`-style fences but
  * scoped to this engine. Safe wherever nondeterministic expressions are
  * legal (Project/Filter); do not use in join keys or aggregates.
  */
case class Opaque(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "opaque"

  override protected def withNewChildInternal(newChild: Expression): Opaque =
    copy(child = newChild)

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childCode = child.genCode(ctx)
    ev.copy(code = childCode.code, isNull = childCode.isNull, value = childCode.value)
  }
}

object Opaque {
  val info: ExpressionInfo = new ExpressionInfo(classOf[Opaque].getName, "opaque")
}
