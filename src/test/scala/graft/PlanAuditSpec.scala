package graft

import graft.operators._

/** Plan-shape regression tests — the scale properties the engine promises
  * must be visible in the physical plan, not just hoped for: dims broadcast,
  * aggregates partial+final, scans column-pruned, shuffle counts bounded.
  * A refactor that silently degrades any of these fails here, not at 100 TB.
  */
class PlanAuditSpec extends SparkSuite {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("itens fact: both dims broadcast, one hash shuffle (window) + one range (sort)") {
    val p = plan(Facts.itensFact(spark, sfDir))
    assert(p.split("BroadcastHashJoin").length - 1 == 2, p.take(500))
    assert(p.split("Exchange hashpartitioning").length - 1 == 1)
    assert(p.split("Exchange rangepartitioning").length - 1 == 1)
  }

  test("pedidos fact: partial+final hash aggregation below the header join") {
    val p = plan(Facts.pedidosFact(spark, sfDir))
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "expected map-side partial aggregation")
    assert(p.split("Exchange hashpartitioning").length - 1 <= 2)
  }

  test("token count: parquet scan pruned to exactly (doc_id, text)") {
    val p = plan(TextOps.tokenCount(spark, sfDir))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p.take(800))
  }

  test("anti-join dedupe: scan pushes the key filter down") {
    val p = plan(Quality.antiJoinDedupe(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderkey)]")
      || p.contains("PushedFilters: [IsNotNull(o_orderkey)"), p.take(800))
  }

  test("enrichment join chain: all three dims broadcast, fact side never shuffles for the join") {
    val p = plan(Dimensions.enrichJoin(spark, sfDir))
    assert(p.split("BroadcastHashJoin").length - 1 == 3)
    assert(p.split("Exchange hashpartitioning").length - 1 == 0,
      "fact side must not hash-shuffle for broadcast enrichment")
  }

  test("minhash candidates: LSH band join, not a cross join") {
    val p = plan(Dedup.dedupMinhash(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation must be an equi-join on band signatures")
  }
}
