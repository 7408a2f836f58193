package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D12 — canonical-JSON checksum via the engine's custom `sorted_to_json`
  * expression (registered by [[graft.plans.GraftExtensions]]): field order
  * in the declaration is deliberately NOT alphabetical; the expression
  * canonicalises, matching the reference's `json.dumps(sort_keys=True)`
  * then md5 (`api_to_gcs/main.py:234-236`). */
object Checksums {

  def checksumSorted(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).select(
      col("o_orderkey"),
      expr("""sorted_to_json(named_struct(
              |  'zeta', o_orderkey,
              |  'alpha', cast(o_custkey as string),
              |  'meta', named_struct('y', o_orderpriority, 'b', o_orderstatus)
              |))""".stripMargin).as("canonical_json"))
      .withColumn("checksum", md5(col("canonical_json")))
      .orderBy("o_orderkey")

  /** DuckDB packs the struct in already-sorted key order — to_json then
    * emits byte-identical compact JSON. */
  val checksumSortedSql: String =
    """SELECT o_orderkey,
      |  to_json(struct_pack(
      |    alpha := CAST(o_custkey AS VARCHAR),
      |    meta := struct_pack(b := o_orderstatus, y := o_orderpriority),
      |    zeta := o_orderkey))::VARCHAR AS canonical_json,
      |  md5(to_json(struct_pack(
      |    alpha := CAST(o_custkey AS VARCHAR),
      |    meta := struct_pack(b := o_orderstatus, y := o_orderpriority),
      |    zeta := o_orderkey))::VARCHAR) AS checksum
      |FROM orders ORDER BY o_orderkey""".stripMargin
}
