package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Engine extension point, wired via
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  * Registers the engine's custom expressions with the function registry so
  * they are usable from both the Column API and SQL text. Everything else
  * in the engine is stock Catalyst on purpose (SURVEY.md §4: no custom
  * Rule/Strategy is warranted by the reference's semantics).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("sorted_to_json"),
      SortedToJson.info,
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedToJson(args.head)))
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      ArrayDot.info,
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("array_dist2i"),
      ArrayDist2I.info,
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayDist2I(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("adjacent_grams"),
      AdjacentGrams.info,
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        AdjacentGrams(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("greedy_pieces"),
      GreedyPieces.info,
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GreedyPieces(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("viterbi_best"),
      ViterbiBest.info,
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ViterbiBest(args(0), args(1), args(2))))
    ext.injectFunction((
      FunctionIdentifier("lattice_counts"),
      LatticeCounts.info,
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LatticeCounts(args(0), args(1), args(2))))
    ext.injectFunction((
      FunctionIdentifier("opaque"),
      Opaque.info,
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Opaque(args.head)))
  }
}
