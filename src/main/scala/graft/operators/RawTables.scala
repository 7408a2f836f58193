package graft.operators

import graft.{Exprs, Schemas}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The typed-nested raw-table loads — the reference's `gcs_to_bq/main.py`
  * per-type transforms over the faithful payload schemas (SURVEY.md §2
  * D1-D8, §1.1-2; shapes in FIXTURES.md §3-6). Inputs are DataFrames with a
  * `json` string column plus lineage columns (`uuid`, `file_ts`) threaded
  * from the message/filename (D5).
  *
  * Scale notes: all three loads are narrow per-row maps (`from_json` with
  * explicit schemas — no inference scan) plus one `explode` for pesquisa;
  * nothing shuffles.
  */
object RawTables {

  private def lineage(df: DataFrame, sourceSuffix: String): DataFrame =
    df.withColumn("source_id", concat(lit("z316-tiny-"), lit(sourceSuffix), lit("_v2")))
      .withColumn("update_timestamp", date_format(current_timestamp(),
        "yyyy-MM-dd'T'HH:mm:ss"))

  /** Parse ONCE behind the [[graft.plans.Opaque]] barrier, then gate (B3) on
    * the materialized struct. Without the barrier, filtering on a field of
    * the parsed struct gets the WHOLE `from_json` duplicated into the
    * pushed-down filter condition (measured 2× JSON cost in round 1; the
    * round-1 workaround — a second minimal-schema parse just for the gate —
    * still tokenized the full payload text twice). `opaque` reports the
    * parse nondeterministic, so the predicate stays above the projection
    * and every payload string is parsed exactly once. */
  private def parsed(raw: DataFrame,
      envelope: org.apache.spark.sql.types.StructType): DataFrame =
    raw.select(col("uuid"), col("file_ts"),
      call_function("opaque", from_json(col("json"), envelope)).as("r"))

  private def gated(parsed: DataFrame): DataFrame =
    parsed.filter(col("r.retorno.status_processamento") === "3")

  /** `pdv` load: envelope unwrap (D1), top-level date normalize (D6),
    * nested `parcelas[].dataVencimento` normalize via `transform` (D7),
    * lineage (D5). Reference `gcs_to_bq/main.py:258-290`. */
  def pdv(raw: DataFrame): DataFrame = pdv(raw, Schemas.pdvEnvelope)

  /** Overload with a caller-pruned envelope schema: consumers that need a
    * handful of fields pass a sub-schema so the parser skips the rest —
    * column pruning pushed into `from_json` by hand (Catalyst's automatic
    * json pruning can't see through the star-expansion this load does). */
  def pdv(raw: DataFrame, envelope: org.apache.spark.sql.types.StructType): DataFrame =
    pdvFromParsed(parsed(raw, envelope))

  /** Struct-input variant: the Pub/Sub consumer dispatches an
    * already-decoded envelope subtree (`gcs_to_bq/main.py:361-363` passes
    * the message's dict straight into the transform — in Spark terms the
    * decoded struct IS the parsed form, so no re-serialize/re-parse).
    * Expects columns (`uuid`, `file_ts`, `r` = envelope struct). */
  def pdvFromParsed(parsedEnv: DataFrame): DataFrame = {
    val p = gated(parsedEnv)
      .select(col("uuid"), col("file_ts"), col("r.retorno.pedido.*"))
    val normalized = lineage(p, "pdv")
      .withColumn("data", Exprs.brDate(col("data")))
    if (normalized.columns.contains("parcelas"))
      normalized.withColumn("parcelas", transform(col("parcelas"),
        pc => pc.withField("dataVencimento", Exprs.brDate(pc.getField("dataVencimento")))))
    else normalized
  }

  /** `pesquisa` load: explode `retorno.pedidos[]` (D2), date normalize,
    * empty `data_prevista` dropped to null (D8). Reference
    * `gcs_to_bq/main.py:294-316`. */
  def pesquisa(raw: DataFrame): DataFrame =
    pesquisaFromParsed(parsed(raw, Schemas.pesquisaEnvelope))

  /** Struct-input variant for the Pub/Sub consumer (see [[pdvFromParsed]]). */
  def pesquisaFromParsed(parsedEnv: DataFrame): DataFrame = {
    val p = gated(parsedEnv)
      .select(col("uuid"), col("file_ts"),
        explode(col("r.retorno.pedidos")).as("p"))
      .select(col("uuid"), col("file_ts"), col("p.pedido.*"))
    lineage(p, "pesquisa")
      .withColumn("data_pedido", Exprs.brDate(col("data_pedido")))
      .withColumn("data_prevista",
        when(length(col("data_prevista")) > 0, Exprs.brDate(col("data_prevista"))))
  }

  /** `produto` load: envelope unwrap + lineage; empty payloads skipped (B4 —
    * the extra `produto.id` null guard on the same materialized parse).
    * Reference `gcs_to_bq/main.py:320-348`. */
  def produto(raw: DataFrame): DataFrame =
    produtoFromParsed(parsed(raw, Schemas.produtoEnvelope))

  /** Struct-input variant for the Pub/Sub consumer (see [[pdvFromParsed]]);
    * the message channel delivers one produto envelope per order item, so
    * the same B4 guard drops the empty ones. */
  def produtoFromParsed(parsedEnv: DataFrame): DataFrame = {
    val p = gated(parsedEnv)
      .filter(col("r.retorno.produto.id").isNotNull)
      .select(col("uuid"), col("file_ts"), col("r.retorno.produto.*"))
    lineage(p, "produto")
  }
}

/** The derived fact build FROM the typed-nested payloads — the reference's
  * `data_transformation/sales_to_bq/main.py` semantics end to end,
  * including its quirks (SURVEY.md §2 F1-F10, §7.5):
  *
  *  - F2-F4 header sums are computed over ALL items BEFORE the product
  *    lookup, while F1 (cost) and the item fact rows silently drop items
  *    whose produto is missing (C2 inner join; `main.py:221,348-349`) —
  *    the asymmetry is preserved here by aggregating pre-join and
  *    joining produto only where cost/fact rows need it.
  *  - F2 is per-unit (`valor / (1 - d/100)`), NOT × quantidade.
  *  - item `desconto` is a percent-as-number string (F8); header
  *    `desconto` is dual-format (F6).
  */
object FactsFromRaw {

  private val qtd = col("item.quantidade").cast("double")
  private val valorUnit = col("item.valor").cast("double")
  private val dPct = coalesce(col("item.desconto").cast("double"), lit(0d))
  // F8: valor/(1−d/100) − valor, per unit
  private val descontoUnit = valorUnit / (lit(1d) - dPct / 100) - valorUnit

  private def explodedItems(pdv: DataFrame): DataFrame =
    pdv.select(col("id").as("pedido_id"), col("data").as("pedido_dia"),
      col("contato.cpfCnpj").as("cliente_cpf"),
      posexplode(col("itens")).as(Seq("pos", "item")))

  /** itens_pedido: one row per matched line item with the unit/total metric
    * block (F8/F9) and pro-rata header-discount allocation (F7). */
  def itensPedido(pdv: DataFrame, produto: DataFrame): DataFrame = {
    val prod = produto.select(col("id").as("idProduto"),
      col("preco_custo").cast("double").as("preco_custo"),
      col("categoria"))
      .dropDuplicates("idProduto") // C2 first-match
    val it = explodedItems(pdv)
    // F7 denominator = F4 total over ALL items (computed header-side, BEFORE
    // the produto join — reference threads total_pre from the header, so
    // dropped items still count in the denominator). An array-aggregate over
    // `itens` needs no shuffle at all.
    val headerDiscount = pdv.select(col("id").as("pedido_id"),
      Exprs.parseDesconto(col("desconto"), col("totalVenda")).as("desconto_pedido"),
      // integer-grid fold: order-independent, matches the oracle's grouped
      // grid sum regardless of array vs row ordering
      (aggregate(transform(col("itens"),
        i => floor(i.getField("valor").cast("double")
          * i.getField("quantidade").cast("double") * 1e4 + 0.5).cast("long")),
        lit(0L), (acc, x) => acc + x).cast("double") / 1e4).as("total_pre"))
    it.join(prod, col("item.idProduto") === col("idProduto"))         // inner: unmatched dropped
      .join(headerDiscount, "pedido_id")
      .withColumn("valor_total", valorUnit * qtd)
      .withColumn("share", col("valor_total") / col("total_pre"))
      .select(
        col("pedido_id"), col("pedido_dia"), col("cliente_cpf"),
        col("item.id").as("item_id"),
        col("idProduto").as("produto_id"),
        col("item.descricao").as("descricao"),
        Exprs.categoriaPrincipal(col("categoria")).as("categoria_principal"),
        Exprs.categoriaSecundaria(col("categoria")).as("categoria_secundaria"),
        qtd.as("quantidade"),
        valorUnit.as("valor_unitario"),
        col("valor_total"),
        descontoUnit.as("desconto_unitario"),
        (descontoUnit * qtd).as("desconto_produto"),
        (col("desconto_pedido") * col("share")).as("desconto_alocado"),
        col("preco_custo"),
        (col("preco_custo") * qtd).as("custo_total"),
        (col("valor_total") - descontoUnit * qtd
          - col("desconto_pedido") * col("share")
          - col("preco_custo") * qtd).as("lucro_item"))
  }

  /** pedidos: header grain. F2-F4 aggregate ALL items (pre-join); F1 cost
    * and F5 item-discount totals aggregate MATCHED items only — the
    * reference accumulates `total_desconto_produtos` inside the
    * `if item_data:` branch, so items whose produto is missing contribute
    * to F2-F4 but not F1/F5 (`sales_to_bq/main.py:346-350`). C3 attaches
    * the vendedor from the FIRST pesquisa row (G3).
    *
    * Float sums go through the integer grid (`Exprs.gsum`) so partial-sum
    * order can't flip a rounding boundary — the oracle replays the same
    * grid sums. */
  def pedidos(pdv: DataFrame, pesquisa: DataFrame, produto: DataFrame): DataFrame = {
    val it = explodedItems(pdv)
    // pre-join sums over every item (F2, F3, F4)
    val allItemAggs = it.groupBy("pedido_id").agg(
      Exprs.gsum(valorUnit / (lit(1d) - dPct / 100)).as("valor_sem_desconto"), // per-unit quirk
      Exprs.gsum(valorUnit).as("valor_com_desconto"),
      Exprs.gsum(valorUnit * qtd).as("base_pre_desconto"))
    // post-join aggregates (F1 cost, F5 item-discount total) — unmatched
    // items contribute nothing to either
    val prod = produto.select(col("id").as("idProduto"),
      col("preco_custo").cast("double").as("preco_custo"))
      .dropDuplicates("idProduto")
    val costAggs = it.join(prod, col("item.idProduto") === col("idProduto"))
      .groupBy("pedido_id")
      .agg(Exprs.gsum(col("preco_custo") * qtd).as("custo_total"),
        Exprs.gsum(descontoUnit * qtd).as("total_desconto_produtos"))
    // C3/G3: first pesquisa row carries the vendedor
    val vendedor = pesquisa
      .groupBy(col("id").cast("long").as("pedido_id"))
      .agg(min(struct(col("id_vendedor"), col("nome_vendedor"))).as("v"))
      .select(col("pedido_id"), col("v.id_vendedor").as("vendedor_id"),
        col("v.nome_vendedor").as("nome_vendedor"))
    pdv.select(col("id").as("pedido_id"), col("data").as("pedido_dia"),
      col("contato.cpfCnpj").as("cliente_cpf"),
      col("formaPagamento").as("forma_pagamento"),
      col("totalVenda").as("valor_faturado"),
      Exprs.parseDesconto(col("desconto"), col("totalVenda")).as("desconto_pedido"))
      .join(allItemAggs, Seq("pedido_id"), "left")
      .join(costAggs, Seq("pedido_id"), "left")
      .join(vendedor, Seq("pedido_id"), "left")
      .withColumn("custo_total", coalesce(col("custo_total"), lit(0d)))
      .withColumn("total_desconto_produtos",
        coalesce(col("total_desconto_produtos"), lit(0d)))
      .withColumn("desconto_total",
        col("total_desconto_produtos") + col("desconto_pedido"))
      .withColumn("valor_lucro", col("valor_faturado") - col("custo_total")) // F10
  }
}
