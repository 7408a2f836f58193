package graft.operators

import graft.{Exprs, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics expressed relationally — PageRank over the
  * co-purchase graph (parts are nodes, "bought in the same order" the
  * edges; the importance ranking a recommender seeds from). Complements
  * the label-propagation connected components in [[Dedup.dedupComponents]].
  *
  * Spark-first shape, per iteration: contributions = edges ⋈ ranks on the
  * source (both sides hash-partitioned on the join key; the edge table
  * re-uses its partitioning across iterations), then one
  * map-side-combined aggregate per destination. Unrolled a fixed number of
  * iterations in ONE plan — no driver loop, no collect; at 100 TB each
  * iteration is the standard edge-partitioned power-iteration step
  * (shuffle ∝ |E|), and a converging run would `localCheckpoint` per
  * round like the components operator to keep lineage flat.
  *
  * Oracle determinism: per-edge contributions are rounded onto a 1e-12
  * grid and summed as LONGs (order-independent, exact in both engines —
  * ranks are ~1/N ≈ 1e-3, so scaled terms are ~1e9, far under 2⁶³ even
  * summed over millions of edges), and the damping arithmetic uses the
  * same literal constants on both sides in the same evaluation order.
  * Undirected edges mean every node has in-degree ≥ 1 — no dangling-mass
  * term is needed. */
object Graph {
  private val ContribScale = 1e12

  /** One power-iteration step over ranks (node, deg, r, n) → same shape.
    * The damping expression is `0.15 / n + 0.85 * (s / scale)` — the same
    * literals in the same evaluation order as the oracle (NOT algebraic
    * variants like `0.15 * (1/n)`, which differ in the last ulp). */
  private def step(edges: DataFrame, ranks: DataFrame): DataFrame = {
    val contrib = edges
      .join(ranks.select(col("node"), col("deg"), col("r")),
        col("src") === col("node"))
      .select(col("dst"),
        floor(col("r") / col("deg") * lit(ContribScale) + lit(0.5d))
          .cast("long").as("t"))
      .groupBy("dst").agg(sum("t").as("s"))
    ranks.select(col("node").as("nd"), col("deg").as("dg"), col("n").as("nn"))
      .join(contrib, col("nd") === col("dst"))
      .select(col("nd").as("node"), col("dg").as("deg"),
        (lit(0.15d) / col("nn")
          + lit(0.85d) * (col("s").cast("double") / lit(ContribScale))).as("r"),
        col("nn").as("n"))
  }

  /** PageRank over co-purchased parts, `iters` unrolled iterations from a
    * uniform start. Output grain: one row per part with its degree and
    * rank in parts-per-million (the 1e-4 output grid is too coarse for raw
    * ~1/N ranks). */
  def pagerankParts(spark: SparkSession, sfDir: String, iters: Int = 2): DataFrame = {
    require(iters >= 1)
    val it = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("okey"), col("l_partkey")).distinct()
    val pairs = it.select(col("okey"), col("l_partkey").as("a"))
      .join(it.select(col("okey"), col("l_partkey").as("b")), "okey")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    val deg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val n1 = deg.agg(count(lit(1)).as("n"))
    val r0 = deg.crossJoin(broadcast(n1)).select(col("node"), col("deg"),
      (lit(1.0d) / col("n")).as("r"), col("n"))
    val ranks = (1 to iters).foldLeft(r0)((r, _) => step(edges, r))
    ranks.select(col("node").as("part"), col("deg"),
      Exprs.r4(col("r") * lit(1e6)).as("rank_ppm"))
      .orderBy("part")
  }

  val pagerankPartsSql: String =
    """WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pr AS (
      |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
      |  FROM it a JOIN it b ON a.l_orderkey = b.l_orderkey
      |   AND a.l_partkey < b.l_partkey),
      |e AS (SELECT a AS src, b AS dst FROM pr
      |      UNION ALL SELECT b, a FROM pr),
      |d AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1),
      |nn AS (SELECT count(*) AS n FROM d),
      |r0 AS (SELECT node, deg, 1.0 / nn.n AS r FROM d, nn),
      |c1 AS (SELECT e.dst, SUM(CAST(floor(r.r / r.deg * 1000000000000 + 0.5)
      |         AS BIGINT)) AS s
      |       FROM e JOIN r0 r ON e.src = r.node GROUP BY 1),
      |r1 AS (SELECT d.node, d.deg,
      |         0.15 / nn.n + 0.85 * (CAST(c1.s AS DOUBLE) / 1000000000000) AS r
      |       FROM d JOIN c1 ON d.node = c1.dst, nn),
      |c2 AS (SELECT e.dst, SUM(CAST(floor(r.r / r.deg * 1000000000000 + 0.5)
      |         AS BIGINT)) AS s
      |       FROM e JOIN r1 r ON e.src = r.node GROUP BY 1),
      |r2 AS (SELECT d.node, d.deg,
      |         0.15 / nn.n + 0.85 * (CAST(c2.s AS DOUBLE) / 1000000000000) AS r
      |       FROM d JOIN c2 ON d.node = c2.dst, nn)
      |SELECT node AS part, deg, floor(r * 1000000 * 10000 + 0.5) / 10000 AS rank_ppm
      |FROM r2 ORDER BY part""".stripMargin
}
