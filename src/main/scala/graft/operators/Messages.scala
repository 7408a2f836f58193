package graft.operators

import graft.{Exprs, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A6/D4/J7 — the composite Pub/Sub notification channel.
  *
  * The reference's enricher publishes ONE serialized JSON message per order
  * carrying every enriched payload (`api_to_gcs/main.py:276-292`):
  * `{pdv_pedido_data, produto_data[], pedidos_pesquisa_data,
  * nota_fiscal_link_data, timestamp, uuid}`. Pub/Sub delivers the bytes
  * base64-encoded, and two independent subscribers decode and dispatch the
  * subtrees (`gcs_to_bq/main.py:351-372` routes each payload into its raw
  * table; `data_transformation/sales_to_bq/main.py:318-330` builds the fact
  * rows), including one-produto-payload-per-item fan-out
  * (`gcs_to_bq/main.py:364-367` — D4's `explode(produto_data)`).
  *
  * Spark-first shape: the message is a typed struct column. Produce =
  * `to_json` + `base64` (J7); consume = `unbase64` + `from_json` with the
  * EXPLICIT message schema (A6 — never inferred); dispatch = one narrow
  * projection per subscriber with `explode(produto_data)` for the per-item
  * payloads (D4), feeding the SAME [[RawTables]] loads the file zone uses
  * via their `*FromParsed` entry points — the decoded struct is already the
  * parsed form, so nothing is re-serialized.
  *
  * Scale notes: encode/decode/dispatch are narrow per-row maps. The consumer
  * parses each message exactly ONCE (the `from_json` sits behind the same
  * `opaque` barrier the raw loads use), and because the message is
  * self-contained per order, [[messageRoundtrip]] reconciles all payloads in
  * a single pass — one explode, one uuid aggregate, one shuffle total (see
  * the method doc for why sibling subscriber branches would instead
  * re-materialize the producer once per branch).
  */
object Messages {

  /** Consumer-side message schema. Sub-payload schemas are caller-supplied
    * so each subscriber parses only the subtrees it touches (the same hand
    * pruning the raw loads use — Catalyst can't prune through the
    * star-expansion downstream). */
  def messageSchema(pdvEnv: StructType, produtoEnv: StructType,
      pesquisaEnv: StructType): StructType = StructType(Seq(
    StructField("pdv_pedido_data", pdvEnv),
    StructField("produto_data", ArrayType(produtoEnv)),
    StructField("pedidos_pesquisa_data", pesquisaEnv),
    StructField("nota_fiscal_link_data", StructType(Seq(
      StructField("link_nfce", StringType)))),
    StructField("timestamp", StringType),
    StructField("uuid", StringType)))

  /** Full-fidelity message schema over the faithful payload schemas —
    * what a subscriber that loads every field parses with. */
  def fullMessageSchema: StructType = messageSchema(graft.Schemas.pdvEnvelope,
    graft.Schemas.produtoEnvelope, graft.Schemas.pesquisaEnvelope)

  /** J7 — produce: serialize the composite struct and base64 the bytes (the
    * wire form a Pub/Sub push delivery carries in `message.data`;
    * `api_to_gcs/main.py:286-288` json.dumps + utf-8 encode). Spark's
    * `base64` may emit MIME-chunked output (a newline every 76 chars,
    * `spark.sql.legacy.chunkBase64String.enabled`); the wire contract is a
    * SINGLE line — a line-oriented stage (`.text` zone, one message per
    * line) would otherwise split every message — so strip CR/LF with a
    * plain char-map (`translate`, no regex). `unbase64` accepts both forms. */
  def encode(message: Column): Column =
    translate(base64(to_json(message).cast("binary")), "\r\n", "")

  /** A6 — consume: base64-decode and parse with the explicit schema, behind
    * the `opaque` planning barrier so downstream predicates never duplicate
    * the message parse (`gcs_to_bq/main.py:354-355`). */
  def decode(data: Column, schema: StructType): Column =
    call_function("opaque", from_json(unbase64(data).cast("string"), schema))

  /** Dispatch the decoded message to the three subscriber inputs — each a
    * narrow projection shaped for the matching [[RawTables]] `*FromParsed`
    * load (`uuid`, `file_ts`, `r` = envelope struct), with the message's
    * lineage threaded through exactly as the consumer passes (uuid,
    * timestamp) into every transform (`gcs_to_bq/main.py:356-372`). */
  def pdvDispatch(msg: DataFrame): DataFrame =
    msg.select(col("uuid"), col("file_ts"), col("pdv_pedido_data").as("r"))

  /** D4 — one produto envelope per order item, exploded from the message
    * array (`gcs_to_bq/main.py:364-367`). */
  def produtoDispatch(msg: DataFrame): DataFrame =
    msg.select(col("uuid"), col("file_ts"),
      explode(col("produto_data")).as("r"))

  def pesquisaDispatch(msg: DataFrame): DataFrame =
    msg.select(col("uuid"), col("file_ts"), col("pedidos_pesquisa_data").as("r"))

  // ---------------------------------------------------------------- fixtures

  /** Producer-side synthesis: one composite message per order, with the
    * payload structs shared with the typed path ([[Typed]]) so the channel
    * and the file zone carry byte-identical payloads:
    *  - `produto_data` holds one envelope per line item (D4's array);
    *  - pesquisa is this order's search result: absent for
    *    `o_orderkey % 7 == 0` (empty `pedidos[]`), duplicated with a second
    *    vendedor for `% 5 == 0` (G3 first-match downstream);
    *  - `uuid`/`timestamp` are the message lineage the consumers thread. */
  def syntheticMessages(spark: SparkSession, sfDir: String): DataFrame = {
    // Slim assembly: the collect_list shuffle carries RAW fields only; the
    // envelope wrappers (constant subtrees, concat'd labels) are applied
    // post-aggregation with a per-row `transform` — measured ~2× cheaper
    // than aggregating pre-built envelope structs (fewer bytes shuffled,
    // fewer objects through the agg buffers). Item order inside `itens` is
    // unchanged (sort key still leads with the per-order-unique line
    // number); `produto_data` order shifts but every consumer aggregates
    // it order-independently.
    val perOrder = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(struct(
        col("l_linenumber").cast("long").as("id"),
        col("l_partkey").as("idProduto"),
        (col("l_extendedprice") / col("l_quantity")).cast("string").as("valor"),
        col("l_quantity").cast("string").as("quantidade"),
        col("p_name").as("nome"),
        col("p_retailprice").cast("string").as("preco_custo"),
        col("p_brand").as("brand"), col("p_type").as("ptype")))).as("rows"))
      .select(col("l_orderkey"),
        transform(col("rows"), Typed.itemStructFromRow _).as("itens"),
        transform(col("rows"), Typed.produtoEnvelopeFromRow _).as("produto_data"))
    val e1 = Typed.pesquisaEntry(col("o_custkey") % 100)
    val e2 = Typed.pesquisaEntry(col("o_custkey") % 100 + 1)
    val pesquisaPedidos =
      when(col("o_orderkey") % 7 === 0, slice(array(e1), 1, 0)) // searched, empty
        .when(col("o_orderkey") % 5 === 0, array(e1, e2))
        .otherwise(array(e1))
    Tables.orders(spark, sfDir)
      .join(perOrder, col("o_orderkey") === col("l_orderkey"))
      .select(encode(struct(
        Typed.pdvEnvelope(col("itens")).as("pdv_pedido_data"),
        col("produto_data"),
        struct(struct(
          lit("3").as("status_processamento"),
          lit(1L).as("numero_paginas"),
          pesquisaPedidos.as("pedidos")).as("retorno")).as("pedidos_pesquisa_data"),
        struct(concat(lit("nfce-"), md5(col("o_orderkey").cast("string")))
          .as("link_nfce")).as("nota_fiscal_link_data"),
        lit("20240305T141000").as("timestamp"),
        md5(col("o_orderkey").cast("string")).as("uuid"))).as("data"))
  }

  /** Consumer-side pruned pdv envelope: this query touches only the order
    * key, date, client and item ids, so the parser skips everything else. */
  private val prunedPdvEnvelope: StructType = StructType(Seq(
    StructField("retorno", StructType(Seq(
      StructField("status_processamento", StringType),
      StructField("pedido", StructType(Seq(
        StructField("id", LongType),
        StructField("data", StringType),
        StructField("formaPagamento", StringType),
        StructField("contato", StructType(Seq(
          StructField("cpfCnpj", StringType)))),
        StructField("itens", ArrayType(StructType(Seq(
          StructField("id", LongType)))))))))))))

  /** The synthesized produto envelope carries 4 fields; parsing with the
    * matching pruned schema is equivalent to the full 59-field
    * [[graft.Schemas.produtoEnvelope]] (absent fields parse to null). */
  private val prunedProdutoEnvelope: StructType = StructType(Seq(
    StructField("retorno", StructType(Seq(
      StructField("status_processamento", StringType),
      StructField("produto", StructType(Seq(
        StructField("id", LongType),
        StructField("nome", StringType),
        StructField("preco_custo", StringType),
        StructField("categoria", StringType)))))))))

  /** The full channel, produce → wire → consume → dispatch → raw loads →
    * order-grain reconciliation, as one oracle-checked batch query.
    *
    * One-pass shape: the message is SELF-CONTAINED per order, so the
    * reconciliation never needs to join independent subscriber outputs back
    * together — doing so as sibling plan branches would re-materialize the
    * whole producer pipeline once per branch (Spark plans are trees; only
    * identical exchange subtrees are reused, and per-branch column pruning
    * below any shared exchange defeats that). Instead: decode ONCE, run the
    * one genuinely item-grain load (D4 `explode(produto_data)` →
    * [[RawTables.produtoFromParsed]]) with the message-grain payloads
    * CARRIED through it, and recover them in the same aggregate that folds
    * the produto payloads. The pdv/pesquisa payloads reconcile as per-row
    * struct/array algebra — zero extra passes, one shuffle (the uuid
    * aggregate) for the whole channel. The per-payload dispatch path
    * ([[pdvDispatch]]/[[pesquisaDispatch]] → the matching raw loads) is the
    * streaming subscriber form, exercised by `graft.StreamDemo`. */
  def messageRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = messageSchema(prunedPdvEnvelope, prunedProdutoEnvelope,
      graft.Schemas.pesquisaEnvelope)
    // G3 first-match over the pesquisa entries as an array fold (lexicographic
    // struct min = the min(struct(...)) a grouped form computes); empty
    // pedidos[] → element_at out of bounds → null, the left-join semantics.
    val vend = when(
      col("m.pedidos_pesquisa_data.retorno.status_processamento") === "3",
      element_at(sort_array(transform(col("m.pedidos_pesquisa_data.retorno.pedidos"),
        p => struct(p.getField("pedido").getField("id_vendedor").as("id_vendedor"),
          p.getField("pedido").getField("nome_vendedor").as("nome_vendedor")))), 1))
    // Message-grain fields reconcile as per-row struct/array algebra BEFORE
    // the explode, so only slim scalars (not the payload structs) ride the
    // item-grain pass and its shuffle.
    val msg = syntheticMessages(spark, sfDir)
      .select(decode(col("data"), schema).as("m"))
      .filter(col("m.pdv_pedido_data.retorno.status_processamento") === "3")
      .select(col("m.uuid").as("uuid"), col("m.timestamp").as("file_ts"),
        col("m.pdv_pedido_data.retorno.pedido.id").as("pedido_id"),
        Exprs.brDate(col("m.pdv_pedido_data.retorno.pedido.data")).as("pedido_dia"),
        col("m.pdv_pedido_data.retorno.pedido.contato.cpfCnpj").as("cliente_cpf"),
        col("m.pdv_pedido_data.retorno.pedido.formaPagamento").as("forma_pagamento"),
        size(col("m.pdv_pedido_data.retorno.pedido.itens")).cast("long").as("n_itens"),
        vend.getField("id_vendedor").as("vendedor_id"),
        vend.getField("nome_vendedor").as("nome_vendedor"),
        col("m.nota_fiscal_link_data.link_nfce").as("nota_link"),
        explode(col("m.produto_data")).as("r"))
    val hdr = Seq("pedido_id", "pedido_dia", "cliente_cpf", "forma_pagamento",
      "n_itens", "vendedor_id", "nome_vendedor", "nota_link")
    val produto = RawTables.produtoFromParsed(msg, carry = hdr)
    // Group-constant header columns go into the GROUP KEY, not through
    // `first()`: a string-buffered aggregate forces SortAggregate (full
    // sort of the item-grain rows), while string group keys hash fine —
    // same groups, same output (see FactsFromRaw.pedidos for the same
    // pattern and measurements).
    val aggs = Seq(count(lit(1)).as("n_produto_payloads"),
      countDistinct(col("id")).as("n_produtos"),
      Exprs.gsum(col("preco_custo").cast("double")).as("custo_catalogo"))
    produto.groupBy(col("uuid") +: hdr.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("uuid", "msg_uuid")
      .orderBy("pedido_id")
  }

  val messageRoundtripSql: String =
    """WITH li AS (
      |  SELECT l_orderkey,
      |    count(*) AS n_itens,
      |    count(*) AS n_produto_payloads,
      |    count(DISTINCT l_partkey) AS n_produtos,
      |    CAST(SUM(CAST(floor(p.p_retailprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000
      |      AS custo_catalogo
      |  FROM lineitem JOIN part p ON l_partkey = p_partkey
      |  GROUP BY l_orderkey),
      |vend AS (
      |  SELECT pedido_id, min(idv) AS vendedor_id,
      |    'vend ' || min(idv) AS nome_vendedor
      |  FROM (
      |    SELECT o_orderkey AS pedido_id, CAST(o_custkey % 100 AS VARCHAR) AS idv
      |    FROM orders WHERE o_orderkey % 7 <> 0
      |    UNION ALL
      |    SELECT o_orderkey, CAST(o_custkey % 100 + 1 AS VARCHAR)
      |    FROM orders WHERE o_orderkey % 7 <> 0 AND o_orderkey % 5 = 0)
      |  GROUP BY pedido_id)
      |SELECT md5(CAST(o_orderkey AS VARCHAR)) AS msg_uuid,
      |  o_orderkey AS pedido_id,
      |  strftime(o_orderdate, '%Y-%m-%d') AS pedido_dia,
      |  CAST(o_custkey AS VARCHAR) AS cliente_cpf,
      |  ['credito', 'boleto', 'pix'][CAST(o_orderkey % 3 AS INT) + 1] AS forma_pagamento,
      |  li.n_itens, li.n_produto_payloads, li.n_produtos, li.custo_catalogo,
      |  v.vendedor_id, v.nome_vendedor,
      |  'nfce-' || md5(CAST(o_orderkey AS VARCHAR)) AS nota_link
      |FROM orders o
      |JOIN li ON o.o_orderkey = li.l_orderkey
      |LEFT JOIN vend v ON o.o_orderkey = v.pedido_id
      |ORDER BY pedido_id""".stripMargin
}
