package graft.operators

import graft.{Exprs, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-gated wrappers over the typed-nested path: fixture-shaped pdv /
  * produto / pesquisa JSON payloads are synthesized from the TPC-H tables
  * IN the query, pushed through the real `RawTables` loads (explicit-schema
  * `from_json`) and `FactsFromRaw` fact builds, and the result is
  * hash-checked against a DuckDB oracle computing the same arithmetic
  * directly from the base tables. Every Spark double→string→double
  * round-trip is lossless (shortest-roundtrip rendering), so the JSON
  * detour changes nothing numerically.
  */
object Typed {

  /** pdv envelopes: one per order, `itens[]` from lineitem (numbers as
    * strings, per-item percent discount from `l_partkey % 30`), header
    * dual-format discount reused from [[Facts.descontoPedidoStr]]. */
  private def pdvRaw(spark: SparkSession, sfDir: String): DataFrame = {
    val itens = Tables.lineitem(spark, sfDir).select(
      col("l_orderkey"),
      struct(
        col("l_linenumber").cast("long").as("id"),
        col("l_partkey").as("idProduto"),
        concat(lit("item "), col("l_partkey").cast("string")).as("descricao"),
        (col("l_extendedprice") / col("l_quantity")).cast("string").as("valor"),
        col("l_quantity").cast("string").as("quantidade"),
        (col("l_partkey") % 30).cast("string").as("desconto")).as("item"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("item"))).as("itens"))
    Tables.orders(spark, sfDir)
      .join(itens, col("o_orderkey") === col("l_orderkey"))
      .select(to_json(struct(struct(
        lit("3").as("status_processamento"),
        struct(
          col("o_orderkey").as("id"),
          date_format(col("o_orderdate"), "dd/MM/yyyy").as("data"),
          Facts.descontoPedidoStr.as("desconto"),
          col("o_totalprice").as("totalVenda"),
          struct(col("o_custkey").cast("string").as("cpfCnpj")).as("contato"),
          col("itens")).as("pedido")).as("retorno"))).as("json"),
        md5(col("o_orderkey").cast("string")).as("uuid"),
        lit("20240305T141000").as("file_ts"))
  }

  private def produtoRaw(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir).select(to_json(struct(struct(
      lit("3").as("status_processamento"),
      struct(
        col("p_partkey").as("id"),
        col("p_name").as("nome"),
        col("p_retailprice").cast("string").as("preco_custo"),
        concat(col("p_brand"), lit(" >> "), col("p_type")).as("categoria")
      ).as("produto")).as("retorno"))).as("json"),
      md5(col("p_partkey").cast("string")).as("uuid"),
      lit("20240305T141000").as("file_ts"))

  /** Stage the synthesized payloads as a JSON-lines raw zone (one payload
    * per line) — the backfill replay input (`graft.BackfillDemo`). */
  def stagePdvZone(spark: SparkSession, sfDir: String, out: String): Unit =
    pdvRaw(spark, sfDir).select("json").write.mode("overwrite").text(out)
  def stageProdutoZone(spark: SparkSession, sfDir: String, out: String): Unit =
    produtoRaw(spark, sfDir).select("json").write.mode("overwrite").text(out)

  /** Envelope schema pruned to the fields this fact build touches — the
    * parser skips the other ~70 subtrees (measured ~2× parse time). */
  private val prunedPdvEnvelope: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField("retorno", StructType(Seq(
      StructField("status_processamento", StringType),
      StructField("pedido", StructType(Seq(
        StructField("id", LongType),
        StructField("data", StringType),
        StructField("desconto", StringType),
        StructField("totalVenda", DoubleType),
        StructField("contato", StructType(Seq(
          StructField("cpfCnpj", StringType)))),
        StructField("itens", ArrayType(StructType(Seq(
          StructField("id", LongType),
          StructField("idProduto", LongType),
          StructField("descricao", StringType),
          StructField("valor", StringType),
          StructField("quantidade", StringType),
          StructField("desconto", StringType)))))))))))))
  }

  /** Line-item fact through the full typed path. */
  def typedItensFact(spark: SparkSession, sfDir: String): DataFrame = {
    // Exchange barrier after the parse: projection collapse would otherwise
    // inline the full-envelope from_json into every downstream consumer
    // (join keys included — measured 3× the JSON cost). The shuffle
    // materializes parsed rows once, both fact branches read the SAME
    // reused exchange, and it co-partitions the header⋈items join.
    val pdv = RawTables.pdv(pdvRaw(spark, sfDir), prunedPdvEnvelope)
      .repartition(col("id"))
    val produto = RawTables.produto(produtoRaw(spark, sfDir))
    FactsFromRaw.itensPedido(pdv, produto)
      .select(
        col("pedido_id"), col("item_id"), col("produto_id"),
        col("pedido_dia"), col("cliente_cpf"),
        col("categoria_principal"), col("categoria_secundaria"),
        col("quantidade"),
        Exprs.r4(col("valor_unitario")).as("valor_unitario"),
        Exprs.r4(col("valor_total")).as("valor_total"),
        Exprs.r4(col("desconto_unitario")).as("desconto_unitario"),
        Exprs.r4(col("desconto_produto")).as("desconto_produto"),
        Exprs.r4(col("desconto_alocado")).as("desconto_alocado"),
        Exprs.r4(col("preco_custo")).as("preco_custo"),
        Exprs.r4(col("custo_total")).as("custo_total"),
        Exprs.r4(col("lucro_item")).as("lucro_item"))
      .orderBy("pedido_id", "item_id", "produto_id", "quantidade", "valor_total")
  }

  val typedItensFactSql: String =
    """WITH it AS (
      |  SELECT l_orderkey AS pedido_id, CAST(l_linenumber AS BIGINT) AS item_id,
      |    l_partkey AS produto_id,
      |    l_quantity AS quantidade,
      |    l_extendedprice / l_quantity AS valor_unitario,
      |    (l_extendedprice / l_quantity) * l_quantity AS valor_total,
      |    CAST(l_partkey % 30 AS DOUBLE) AS d_pct
      |  FROM lineitem),
      |hdr AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice,
      |    strftime(o_orderdate, '%Y-%m-%d') AS pedido_dia,
      |    GREATEST(0, COALESCE(CASE WHEN contains(ds, '%')
      |      THEN TRY_CAST(replace(ds, '%', '') AS DOUBLE) / 100 * o_totalprice
      |      ELSE TRY_CAST(replace(ds, ',', '.') AS DOUBLE) END, 0)) AS desconto_pedido
      |  FROM (SELECT *,
      |    CASE WHEN o_orderkey % 3 = 0 THEN CAST((o_orderkey % 7) + 1 AS VARCHAR) || '%'
      |         WHEN o_orderkey % 3 = 1 THEN CAST(o_orderkey % 50 AS VARCHAR) || ',' || CAST(o_orderkey % 10 AS VARCHAR)
      |         ELSE 'xx' END AS ds FROM orders)),
      |tot AS (SELECT pedido_id,
      |  CAST(SUM(CAST(floor(valor_total * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000 AS total_pre
      |  FROM it GROUP BY pedido_id),
      |j AS (
      |  SELECT it.*, hdr.pedido_dia, CAST(hdr.o_custkey AS VARCHAR) AS cliente_cpf,
      |    trim(split_part(p.p_brand || ' >> ' || p.p_type, ' >> ', 1)) AS categoria_principal,
      |    trim(split_part(p.p_brand || ' >> ' || p.p_type, ' >> ', 2)) AS categoria_secundaria,
      |    valor_unitario / (1 - d_pct / 100) - valor_unitario AS desconto_unitario,
      |    hdr.desconto_pedido * (valor_total / tot.total_pre) AS desconto_alocado,
      |    p.p_retailprice AS preco_custo
      |  FROM it
      |  JOIN hdr ON it.pedido_id = hdr.o_orderkey
      |  JOIN tot USING (pedido_id)
      |  JOIN part p ON it.produto_id = p.p_partkey)
      |SELECT pedido_id, item_id, produto_id, pedido_dia, cliente_cpf,
      |  categoria_principal, categoria_secundaria, quantidade,
      |  floor(valor_unitario * 10000 + 0.5) / 10000 AS valor_unitario,
      |  floor(valor_total * 10000 + 0.5) / 10000 AS valor_total,
      |  floor(desconto_unitario * 10000 + 0.5) / 10000 AS desconto_unitario,
      |  floor(desconto_unitario * quantidade * 10000 + 0.5) / 10000 AS desconto_produto,
      |  floor(desconto_alocado * 10000 + 0.5) / 10000 AS desconto_alocado,
      |  floor(preco_custo * 10000 + 0.5) / 10000 AS preco_custo,
      |  floor(preco_custo * quantidade * 10000 + 0.5) / 10000 AS custo_total,
      |  floor((valor_total - desconto_unitario * quantidade - desconto_alocado
      |         - preco_custo * quantidade) * 10000 + 0.5) / 10000 AS lucro_item
      |FROM j ORDER BY pedido_id, item_id, produto_id, quantidade, valor_total""".stripMargin
}
