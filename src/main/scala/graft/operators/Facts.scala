package graft.operators

import graft.{Exprs, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The analytical core — the reference's derived fact builds re-expressed as
  * declarative Spark plans (reference `data_transformation/sales_to_bq/
  * main.py`; SURVEY.md §2 F1-F10, §3.1 step 3b).
  *
  * Domain mapping (SURVEY.md §7.2): `lineitem` plays the exploded `itens[]`
  * array, `part` plays `produto` (with `p_retailprice` as the unit-cost
  * basis), `orders` plays the pedido header. The dual-format pt-BR discount
  * strings (`"10%"` vs `"15,50"` vs garbage → 0.0) are synthesized
  * deterministically from integer key columns — integer-only synthesis so the
  * DuckDB oracle formats the identical string (no double→string formatting,
  * which is engine-specific).
  *
  * Scale notes:
  *  - `part` (produto dim) is broadcast — the reference does a per-item
  *    point lookup (C2, `sales_to_bq/main.py:93-98`); broadcast hash join is
  *    its distributed equivalent and avoids shuffling the 100 TB fact side.
  *  - lineitem⋈orders shuffles both sides on the order key once; the F7
  *    pro-rata window reuses that same hash partitioning (Catalyst's
  *    EnsureRequirements inserts no second exchange).
  *  - the header build aggregates lineitem BEFORE joining orders
  *    (partial+final hash agg, map-side combine), so the join input is one
  *    row per order, not one per line.
  */
object Facts {

  /** Dual-format item discount string (F6 input). Branches: percent /
    * comma-decimal / unparseable→0. Integer-derived only.
    */
  def descontoItemStr: Column =
    when(col("l_linenumber") % 3 === 0,
      concat(((col("l_partkey") % 30) + 1).cast("string"), lit("%")))
      .when(col("l_linenumber") % 3 === 1,
        concat((col("l_suppkey") % 20).cast("string"), lit(","),
          (col("l_orderkey") % 10).cast("string")))
      .otherwise(lit("n/a"))

  /** Dual-format header discount string (F6 input at order grain). */
  def descontoPedidoStr: Column =
    when(col("o_orderkey") % 3 === 0,
      concat(((col("o_orderkey") % 7) + 1).cast("string"), lit("%")))
      .when(col("o_orderkey") % 3 === 1,
        concat((col("o_orderkey") % 50).cast("string"), lit(","),
          (col("o_orderkey") % 10).cast("string")))
      .otherwise(lit("xx"))

  /** itens_pedido fact — line-item grain metric block (C1/C2 join + F6 parse
    * + F7 pro-rata allocation + F8/F9 arithmetic; reference
    * `sales_to_bq/main.py:157-221,347-354`).
    */
  def itensFact(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val pt = Tables.part(spark, sfDir).select("p_partkey", "p_retailprice")
    val hdr = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"), descontoPedidoStr.as("desconto_pedido_str"))

    val items = li
      .withColumn("desconto_str", descontoItemStr)
      .withColumn("valor_unitario", col("l_extendedprice") / col("l_quantity"))
      .withColumn("valor_total", col("l_extendedprice"))
      // C2: produto point-lookup → broadcast hash join on the dim key
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(hdr, col("l_orderkey") === col("o_orderkey"))

    val wOrder = Window.partitionBy(col("l_orderkey"))
    val descontoItem = Exprs.parseDesconto(col("desconto_str"), col("valor_total"))
    val descontoPedido = Exprs.parseDesconto(col("desconto_pedido_str"), col("o_totalprice"))
    // F7: pro-rata share of the header discount by pre-discount value.
    // Denominator is an order-independent integer-grid sum (Exprs.gsum
    // rationale): plain windowed sum(double) drifts in the last ulp vs the
    // oracle's summation order.
    val share = col("valor_total") /
      (sum(floor(col("valor_total") * 1e4 + 0.5).cast("long")).over(wOrder)
        .cast("double") / 1e4)

    items
      .withColumn("desconto_item", descontoItem)
      .withColumn("desconto_alocado", descontoPedido * share)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_partkey").as("produto_id"),
        col("l_quantity").as("quantidade"),
        col("desconto_str"),
        Exprs.r4(col("valor_unitario")).as("valor_unitario"),
        Exprs.r4(col("valor_total")).as("valor_total"),
        Exprs.r4(col("desconto_item")).as("desconto_item"),
        Exprs.r4(col("desconto_alocado")).as("desconto_alocado"),
        Exprs.r4(col("valor_total") - col("desconto_item") - col("desconto_alocado"))
          .as("valor_liquido"),
        Exprs.r4(col("p_retailprice")).as("preco_custo"),
        Exprs.r4(col("p_retailprice") * col("l_quantity")).as("custo_total"),
        Exprs.r4(col("valor_total") - col("desconto_item") - col("desconto_alocado")
          - col("p_retailprice") * col("l_quantity")).as("lucro_item"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** DuckDB oracle for [[itensFact]] — identical arithmetic, identical
    * integer-derived string synthesis, identical `floor(x*1e4+0.5)/1e4`
    * rounding.
    */
  val itensFactSql: String =
    """WITH it AS (
      |  SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice,
      |    l_extendedprice / l_quantity AS valor_unitario,
      |    l_extendedprice AS valor_total,
      |    CASE WHEN l_linenumber % 3 = 0 THEN CAST((l_partkey % 30) + 1 AS VARCHAR) || '%'
      |         WHEN l_linenumber % 3 = 1 THEN CAST(l_suppkey % 20 AS VARCHAR) || ',' || CAST(l_orderkey % 10 AS VARCHAR)
      |         ELSE 'n/a' END AS desconto_str
      |  FROM lineitem),
      |hdr AS (
      |  SELECT o_orderkey, o_totalprice,
      |    CASE WHEN o_orderkey % 3 = 0 THEN CAST((o_orderkey % 7) + 1 AS VARCHAR) || '%'
      |         WHEN o_orderkey % 3 = 1 THEN CAST(o_orderkey % 50 AS VARCHAR) || ',' || CAST(o_orderkey % 10 AS VARCHAR)
      |         ELSE 'xx' END AS desconto_pedido_str
      |  FROM orders),
      |joined AS (
      |  SELECT it.*, p.p_retailprice, hdr.o_totalprice, hdr.desconto_pedido_str,
      |    GREATEST(0, COALESCE(CASE WHEN contains(desconto_str, '%')
      |        THEN TRY_CAST(replace(desconto_str, '%', '') AS DOUBLE) / 100 * valor_total
      |        ELSE TRY_CAST(replace(desconto_str, ',', '.') AS DOUBLE) END, 0)) AS desconto_item,
      |    GREATEST(0, COALESCE(CASE WHEN contains(desconto_pedido_str, '%')
      |        THEN TRY_CAST(replace(desconto_pedido_str, '%', '') AS DOUBLE) / 100 * o_totalprice
      |        ELSE TRY_CAST(replace(desconto_pedido_str, ',', '.') AS DOUBLE) END, 0))
      |      * (valor_total / (CAST(SUM(CAST(floor(valor_total * 10000 + 0.5) AS BIGINT))
      |          OVER (PARTITION BY it.l_orderkey) AS DOUBLE) / 10000)) AS desconto_alocado
      |  FROM it JOIN part p ON it.l_partkey = p.p_partkey
      |          JOIN hdr ON it.l_orderkey = hdr.o_orderkey)
      |SELECT l_orderkey, l_linenumber,
      |  l_partkey AS produto_id,
      |  l_quantity AS quantidade,
      |  desconto_str,
      |  floor(valor_unitario * 10000 + 0.5) / 10000 AS valor_unitario,
      |  floor(valor_total * 10000 + 0.5) / 10000 AS valor_total,
      |  floor(desconto_item * 10000 + 0.5) / 10000 AS desconto_item,
      |  floor(desconto_alocado * 10000 + 0.5) / 10000 AS desconto_alocado,
      |  floor((valor_total - desconto_item - desconto_alocado) * 10000 + 0.5) / 10000 AS valor_liquido,
      |  floor(p_retailprice * 10000 + 0.5) / 10000 AS preco_custo,
      |  floor(p_retailprice * l_quantity * 10000 + 0.5) / 10000 AS custo_total,
      |  floor((valor_total - desconto_item - desconto_alocado - p_retailprice * l_quantity) * 10000 + 0.5) / 10000 AS lucro_item
      |FROM joined
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** pedidos fact — order-grain header build (F1-F5 aggregates + F10 header
    * arithmetic; reference `sales_to_bq/main.py:89-139,336-359`). F2 keeps
    * the reference quirk: per-unit value, NOT × quantidade.
    */
  def pedidosFact(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val pt = Tables.part(spark, sfDir).select("p_partkey", "p_retailprice")
    val hdr = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        descontoPedidoStr.as("desconto_pedido_str"))

    val items = li
      .withColumn("desconto_str", descontoItemStr)
      .withColumn("valor_unitario", col("l_extendedprice") / col("l_quantity"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .withColumn("desconto_item", Exprs.parseDesconto(col("desconto_str"), col("l_extendedprice")))

    // F1-F5: one hash aggregation, partial map-side combine for free.
    // Float sums go through the integer grid (Exprs.gsum) so partial-sum
    // order can never flip an r4 rounding boundary vs the oracle.
    val aggs = items.groupBy(col("l_orderkey")).agg(
      Exprs.gsum(col("p_retailprice") * col("l_quantity")).as("custo_total"),
      Exprs.gsum(col("valor_unitario") / (lit(1d) - col("l_discount"))).as("valor_sem_desconto"),
      Exprs.gsum(col("valor_unitario")).as("valor_com_desconto"),
      Exprs.gsum(col("l_extendedprice")).as("base_pre_desconto"),
      Exprs.gsum(col("desconto_item")).as("total_desconto_produtos"),
      count(lit(1)).as("n_itens"))

    hdr.join(aggs, col("o_orderkey") === col("l_orderkey"))
      .withColumn("desconto_pedido",
        Exprs.parseDesconto(col("desconto_pedido_str"), col("o_totalprice")))
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        col("n_itens"),
        Exprs.r4(col("o_totalprice")).as("valor_faturado"),
        Exprs.r4(col("custo_total")).as("custo_total"),
        Exprs.r4(col("valor_sem_desconto")).as("valor_sem_desconto"),
        Exprs.r4(col("valor_com_desconto")).as("valor_com_desconto"),
        Exprs.r4(col("base_pre_desconto")).as("base_pre_desconto"),
        Exprs.r4(col("total_desconto_produtos") + col("desconto_pedido")).as("desconto_total"),
        Exprs.r4(col("o_totalprice") - col("custo_total")).as("valor_lucro"))
      .orderBy("o_orderkey")
  }

  /** DuckDB oracle for [[pedidosFact]]. */
  val pedidosFactSql: String =
    """WITH it AS (
      |  SELECT l_orderkey, l_quantity, l_extendedprice, l_discount,
      |    l_extendedprice / l_quantity AS valor_unitario,
      |    CASE WHEN l_linenumber % 3 = 0 THEN CAST((l_partkey % 30) + 1 AS VARCHAR) || '%'
      |         WHEN l_linenumber % 3 = 1 THEN CAST(l_suppkey % 20 AS VARCHAR) || ',' || CAST(l_orderkey % 10 AS VARCHAR)
      |         ELSE 'n/a' END AS desconto_str,
      |    p.p_retailprice
      |  FROM lineitem JOIN part p ON l_partkey = p.p_partkey),
      |ag AS (
      |  SELECT l_orderkey,
      |    CAST(SUM(CAST(floor(p_retailprice * l_quantity * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000 AS custo_total,
      |    CAST(SUM(CAST(floor(valor_unitario / (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000 AS valor_sem_desconto,
      |    CAST(SUM(CAST(floor(valor_unitario * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000 AS valor_com_desconto,
      |    CAST(SUM(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000 AS base_pre_desconto,
      |    CAST(SUM(CAST(floor(GREATEST(0, COALESCE(CASE WHEN contains(desconto_str, '%')
      |        THEN TRY_CAST(replace(desconto_str, '%', '') AS DOUBLE) / 100 * l_extendedprice
      |        ELSE TRY_CAST(replace(desconto_str, ',', '.') AS DOUBLE) END, 0)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000 AS total_desconto_produtos,
      |    COUNT(*) AS n_itens
      |  FROM it GROUP BY l_orderkey),
      |hdr0 AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice,
      |    CASE WHEN o_orderkey % 3 = 0 THEN CAST((o_orderkey % 7) + 1 AS VARCHAR) || '%'
      |         WHEN o_orderkey % 3 = 1 THEN CAST(o_orderkey % 50 AS VARCHAR) || ',' || CAST(o_orderkey % 10 AS VARCHAR)
      |         ELSE 'xx' END AS desconto_pedido_str
      |  FROM orders),
      |hdr AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice,
      |    GREATEST(0, COALESCE(CASE WHEN contains(desconto_pedido_str, '%')
      |        THEN TRY_CAST(replace(desconto_pedido_str, '%', '') AS DOUBLE) / 100 * o_totalprice
      |        ELSE TRY_CAST(replace(desconto_pedido_str, ',', '.') AS DOUBLE) END, 0)) AS desconto_pedido
      |  FROM hdr0)
      |SELECT o_orderkey, o_custkey, n_itens,
      |  floor(o_totalprice * 10000 + 0.5) / 10000 AS valor_faturado,
      |  floor(custo_total * 10000 + 0.5) / 10000 AS custo_total,
      |  floor(valor_sem_desconto * 10000 + 0.5) / 10000 AS valor_sem_desconto,
      |  floor(valor_com_desconto * 10000 + 0.5) / 10000 AS valor_com_desconto,
      |  floor(base_pre_desconto * 10000 + 0.5) / 10000 AS base_pre_desconto,
      |  floor((total_desconto_produtos + desconto_pedido) * 10000 + 0.5) / 10000 AS desconto_total,
      |  floor((o_totalprice - custo_total) * 10000 + 0.5) / 10000 AS valor_lucro
      |FROM hdr JOIN ag ON o_orderkey = l_orderkey
      |ORDER BY o_orderkey""".stripMargin

  /** Co-purchase mining — the top product pairs bought together in one
    * order (market-basket association, the sales-domain analytics none of
    * the grain-preserving facts cover): distinct products per order,
    * self-equi-joined on the order key under `part_a < part_b`, counted,
    * top-k by support.
    *
    * Scale shape: the self-join co-partitions both sides on the order key
    * (one exchange, reused — an order's pairs materialize in one task, no
    * cross-order traffic), and the pair count is a map-side-combined hash
    * agg. The intermediate is Σ m·(m−1)/2 over per-order basket sizes m —
    * bounded by the basket, not the catalog (TPC-H m ≤ 7; a retail basket
    * ~30 ⇒ ~450 pairs/order), which is why order-local pair generation
    * scales where catalog-wide pair enumeration (|parts|²) never could.
    * The final top-k is a total order (support desc, then both keys) over
    * the pair-count table — k rows survive to the driver. */
  def copurchaseTopk(spark: SparkSession, sfDir: String, k: Int = 25): DataFrame = {
    val it = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("okey"), col("l_partkey"))
      .distinct()
    val pairs = it.select(col("okey"), col("l_partkey").as("part_a"))
      .join(it.select(col("okey"), col("l_partkey").as("part_b")), "okey")
      .filter(col("part_a") < col("part_b"))
    pairs.groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(k)
  }

  val copurchaseTopkSql: String =
    """WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |p AS (
      |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      |  FROM it a JOIN it b ON a.l_orderkey = b.l_orderkey
      |   AND a.l_partkey < b.l_partkey)
      |SELECT part_a, part_b, count(*) AS n_orders
      |FROM p GROUP BY part_a, part_b
      |ORDER BY n_orders DESC, part_a, part_b LIMIT 25""".stripMargin
}
