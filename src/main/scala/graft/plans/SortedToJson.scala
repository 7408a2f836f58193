package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** D12 — canonical sorted-key JSON rendering as a native Catalyst
  * expression. The reference checksums `json.dumps(data, sort_keys=True)`
  * (`api_to_gcs/main.py:234-236`); Spark's `to_json` preserves declared
  * struct field order, so key-order canonicalisation needs either sorted
  * schema declarations everywhere or this expression (SURVEY.md §2 K, §7.4
  * — the one custom-expression candidate in the whole surface).
  *
  * Output format is compact JSON (`{"a":1,"b":"x"}`), struct keys sorted
  * alphabetically at every nesting level — byte-identical to DuckDB's
  * `to_json` over a struct packed in sorted field order, which is what the
  * oracle uses. Integers/strings/bools/arrays/structs are supported;
  * doubles render via `Double.toString` (keep them out of checksummed
  * structs for cross-engine parity).
  *
  * Eval-mode only (`CodegenFallback`): checksum computation is not a hot
  * inner loop — it runs once per landed object (J1), not per fact row.
  */
case class SortedToJson(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "sorted_to_json"

  override protected def withNewChildInternal(newChild: Expression): SortedToJson =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(render(input, child.dataType))

  private def escape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def render(v: Any, dt: DataType): String = dt match {
    case s: StructType =>
      val row = v.asInstanceOf[InternalRow]
      s.fields.zipWithIndex.sortBy(_._1.name).map { case (f, i) =>
        val fv = if (row.isNullAt(i)) "null" else render(row.get(i, f.dataType), f.dataType)
        "\"" + escape(f.name) + "\":" + fv
      }.mkString("{", ",", "}")
    case ArrayType(et, _) =>
      val arr = v.asInstanceOf[ArrayData]
      (0 until arr.numElements()).map { i =>
        if (arr.isNullAt(i)) "null" else render(arr.get(i, et), et)
      }.mkString("[", ",", "]")
    case StringType => "\"" + escape(v.toString) + "\""
    case LongType | IntegerType | ShortType | ByteType | BooleanType => v.toString
    case DoubleType | FloatType => v.toString
    case DateType => "\"" + v.toString + "\""
    case _ => "\"" + escape(v.toString) + "\""
  }
}

object SortedToJson {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SortedToJson].getName, "sorted_to_json")
}
