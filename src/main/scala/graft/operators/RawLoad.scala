package graft.operators

import graft.{Exprs, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw-zone load transforms — the reference's `gcs_to_bq/main.py` per-type
  * JSON shaping (SURVEY.md §2 D1-D13, B1-B3) as declarative Spark plans.
  *
  * The JSON envelope round-trip (`to_json` → `from_json` with an explicit
  * `StructType`) is executed for real inside each query so the engine's JSON
  * machinery is what the oracle checks; the DuckDB side computes the
  * equivalent result directly from the base tables.
  *
  * Scale notes: every operator here is a narrow per-row map — no shuffle at
  * all except the final presentation `orderBy`. `from_json` with an explicit
  * schema (not inference) keeps the scan single-pass and codegen-friendly.
  */
object RawLoad {

  /** Envelope schema for the unwrap path (cf. the `pdv` table declaration,
    * reference `gcs_to_bq/main.py:24-100`). */
  private val envelopeSchema = StructType(Seq(
    StructField("retorno", StructType(Seq(
      StructField("status_processamento", StringType),
      StructField("pedido", StructType(Seq(
        StructField("id", LongType),
        StructField("totalVenda", DoubleType),
        StructField("data_pedido", StringType)))))))))

  /** D1+D5+D12 — envelope unwrap + lineage columns + canonical checksum
    * (`gcs_to_bq/main.py:262,272-277`; `api_to_gcs/main.py:234-264`). */
  def rawUnwrap(spark: SparkSession, sfDir: String): DataFrame = {
    val payload = Tables.orders(spark, sfDir).select(to_json(struct(
      struct(
        lit("3").as("status_processamento"),
        struct(
          col("o_orderkey").as("id"),
          col("o_totalprice").as("totalVenda"),
          date_format(col("o_orderdate"), "dd/MM/yyyy").as("data_pedido")
        ).as("pedido")
      ).as("retorno"))).as("json"))
    payload
      .select(from_json(col("json"), envelopeSchema).as("r"))
      .select(col("r.retorno.pedido.*"))
      .withColumn("data_pedido", Exprs.brDate(col("data_pedido")))
      .withColumn("source_id", lit("z316-tiny-pdv_v1"))
      .withColumn("checksum",
        Exprs.canonicalChecksum(col("id").cast("string"), col("data_pedido")))
      .orderBy("id")
  }

  val rawUnwrapSql: String =
    """SELECT o_orderkey AS id, o_totalprice AS totalVenda,
      |  strftime(o_orderdate, '%Y-%m-%d') AS data_pedido,
      |  'z316-tiny-pdv_v1' AS source_id,
      |  md5(CAST(o_orderkey AS VARCHAR) || '|' || strftime(o_orderdate, '%Y-%m-%d')) AS checksum
      |FROM orders ORDER BY id""".stripMargin

  /** D2/D3/D4 — nested-array build + positional explode: line items are
    * packed into a per-order `itens[]` array (sorted by line number) and
    * exploded back to one row per element with its position
    * (`gcs_to_bq/main.py:294-316`; `sales_to_bq/main.py:347-354`). */
  def rawExplode(spark: SparkSession, sfDir: String): DataFrame = {
    val items = Tables.lineitem(spark, sfDir).select(
      col("l_orderkey"),
      struct(col("l_linenumber"), col("l_partkey"), col("l_quantity"),
        col("l_extendedprice")).as("item"))
    items.groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("item"))).as("itens"))
      .select(col("l_orderkey"), posexplode(col("itens")).as(Seq("pos", "item")))
      .select(
        col("l_orderkey").as("pedido_id"),
        col("pos").cast("long").as("pos"),
        col("item.l_linenumber").cast("long").as("linha"),
        col("item.l_partkey").as("produto_id"),
        col("item.l_quantity").as("quantidade"),
        col("item.l_extendedprice").as("valor"))
      .orderBy("pedido_id", "pos")
  }

  val rawExplodeSql: String =
    """SELECT l_orderkey AS pedido_id,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |    ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice) - 1 AS BIGINT) AS pos,
      |  CAST(l_linenumber AS BIGINT) AS linha,
      |  l_partkey AS produto_id, l_quantity AS quantidade, l_extendedprice AS valor
      |FROM lineitem ORDER BY pedido_id, pos""".stripMargin

  /** D6/D7/D8 — Brazilian date normalization with pass-through-on-failure,
    * nested-array variant, and empty-string→null conditional drop
    * (`gcs_to_bq/main.py:213-221,267-270,299-303`). */
  def brDates(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).select(
      col("o_orderkey"),
      when(col("o_orderkey") % 10 === 0, lit("not-a-date"))
        .when(col("o_orderkey") % 10 === 5, lit(""))
        .otherwise(date_format(col("o_orderdate"), "dd/MM/yyyy")).as("d_str"))
      .withColumn("d_norm", Exprs.brDate(col("d_str")))
      .withColumn("d_opt", when(length(col("d_str")) > 0, col("d_norm")))
      .withColumn("parcelas_str", concat_ws(";",
        transform(array(col("d_str"), lit("01/02/2023")), c => Exprs.brDate(c))))
      .select("o_orderkey", "d_str", "d_norm", "d_opt", "parcelas_str")
      .orderBy("o_orderkey")

  val brDatesSql: String =
    """WITH t AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 10 = 0 THEN 'not-a-date'
      |         WHEN o_orderkey % 10 = 5 THEN ''
      |         ELSE strftime(o_orderdate, '%d/%m/%Y') END AS d_str
      |  FROM orders),
      |n AS (
      |  SELECT o_orderkey, d_str,
      |    COALESCE(strftime(try_strptime(d_str, '%d/%m/%Y'), '%Y-%m-%d'), d_str) AS d_norm
      |  FROM t)
      |SELECT o_orderkey, d_str, d_norm,
      |  CASE WHEN length(d_str) > 0 THEN d_norm END AS d_opt,
      |  d_norm || ';' || '2023-02-01' AS parcelas_str
      |FROM n ORDER BY o_orderkey""".stripMargin

  /** D10/D11 — blob-name synthesis (uuid-shaped key from md5, timestamped
    * template) and key extraction back out via the filename regex
    * (`api_to_gcs/main.py:141-142`; `backfill/gcs_to_pupsub.py:10,19-31`). */
  def filenameKeys(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.orders(spark, sfDir).select(
      col("o_orderkey"),
      md5(col("o_orderkey").cast("string")).as("h"),
      when(col("o_orderkey") % 3 === 0, lit("pdv"))
        .when(col("o_orderkey") % 3 === 1, lit("pesquisa"))
        .otherwise(lit("produto")).as("dtype"),
      col("o_custkey"),
      concat(date_format(col("o_orderdate"), "yyyyMMdd"), lit("T"),
        lpad((col("o_orderkey") % 86400).cast("string"), 6, "0")).as("ts"))
    val uuid = concat(
      substring(col("h"), 1, 8), lit("-"), substring(col("h"), 9, 4), lit("-"),
      substring(col("h"), 13, 4), lit("-"), substring(col("h"), 17, 4), lit("-"),
      substring(col("h"), 21, 12))
    val fname = concat(
      lit("z316-tiny-api-"), col("o_orderkey").cast("string"),
      lit("-"), col("dtype"),
      when(col("dtype") === "produto", concat(lit("-"), col("o_custkey").cast("string")))
        .otherwise(lit("")),
      lit("-"), col("ts"), lit("-"), uuid, lit(".json"))
    base.select(col("o_orderkey"), fname.as("filename"))
      .select(
        col("o_orderkey"),
        col("filename"),
        Exprs.fileDadosId(col("filename")).as("dados_id"),
        Exprs.fileDataType(col("filename")).as("data_type"),
        Exprs.fileProdutoId(col("filename")).as("produto_id"),
        Exprs.fileTimestamp(col("filename")).as("file_ts"),
        Exprs.fileUuid(col("filename")).as("file_uuid"))
      .orderBy("o_orderkey")
  }

  val filenameKeysSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS h,
      |    CASE WHEN o_orderkey % 3 = 0 THEN 'pdv'
      |         WHEN o_orderkey % 3 = 1 THEN 'pesquisa' ELSE 'produto' END AS dtype,
      |    o_custkey,
      |    strftime(o_orderdate, '%Y%m%d') || 'T' ||
      |      lpad(CAST(o_orderkey % 86400 AS VARCHAR), 6, '0') AS ts
      |  FROM orders),
      |f AS (
      |  SELECT o_orderkey,
      |    'z316-tiny-api-' || CAST(o_orderkey AS VARCHAR) || '-' || dtype ||
      |    CASE WHEN dtype = 'produto' THEN '-' || CAST(o_custkey AS VARCHAR) ELSE '' END ||
      |    '-' || ts || '-' ||
      |    substr(h,1,8) || '-' || substr(h,9,4) || '-' || substr(h,13,4) || '-' ||
      |    substr(h,17,4) || '-' || substr(h,21,12) || '.json' AS filename
      |  FROM base)
      |SELECT o_orderkey, filename,
      |  regexp_extract(filename, 'z316-tiny-api-(\d+)-(pdv|pesquisa|produto)(?:-(\d+))?-(\d{8}T\d{6})-([0-9a-f-]{36})\.json$', 1) AS dados_id,
      |  regexp_extract(filename, 'z316-tiny-api-(\d+)-(pdv|pesquisa|produto)(?:-(\d+))?-(\d{8}T\d{6})-([0-9a-f-]{36})\.json$', 2) AS data_type,
      |  regexp_extract(filename, 'z316-tiny-api-(\d+)-(pdv|pesquisa|produto)(?:-(\d+))?-(\d{8}T\d{6})-([0-9a-f-]{36})\.json$', 3) AS produto_id,
      |  regexp_extract(filename, 'z316-tiny-api-(\d+)-(pdv|pesquisa|produto)(?:-(\d+))?-(\d{8}T\d{6})-([0-9a-f-]{36})\.json$', 4) AS file_ts,
      |  regexp_extract(filename, 'z316-tiny-api-(\d+)-(pdv|pesquisa|produto)(?:-(\d+))?-(\d{8}T\d{6})-([0-9a-f-]{36})\.json$', 5) AS file_uuid
      |FROM f ORDER BY o_orderkey""".stripMargin

  /** D13 — category split on `' >> '` (`sales_to_bq/main.py:177-184`). */
  def categoria(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir).select(
      col("p_partkey"),
      when(col("p_partkey") % 3 === 0, concat(col("p_brand"), lit(" >> "), col("p_type")))
        .when(col("p_partkey") % 3 === 1, col("p_brand"))
        .otherwise(lit("")).as("categoria"))
      .withColumn("categoria_principal", Exprs.categoriaPrincipal(col("categoria")))
      .withColumn("categoria_secundaria", Exprs.categoriaSecundaria(col("categoria")))
      .orderBy("p_partkey")

  val categoriaSql: String =
    """WITH t AS (
      |  SELECT p_partkey,
      |    CASE WHEN p_partkey % 3 = 0 THEN p_brand || ' >> ' || p_type
      |         WHEN p_partkey % 3 = 1 THEN p_brand ELSE '' END AS categoria
      |  FROM part)
      |SELECT p_partkey, categoria,
      |  trim(CASE WHEN contains(categoria, ' >> ') THEN split_part(categoria, ' >> ', 1)
      |            ELSE categoria END) AS categoria_principal,
      |  CASE WHEN contains(categoria, ' >> ') THEN trim(split_part(categoria, ' >> ', 2))
      |       ELSE '' END AS categoria_secundaria
      |FROM t ORDER BY p_partkey""".stripMargin

  /** B1-B3 — webhook validation + envelope status dispatch as a routing
    * column (`webhook_handler/main.py:29-33`; `api_to_gcs/main.py:76-90`):
    * missing fields → 400-reject; wrong tipo → acked-ignore; status '3' ok,
    * '2' dead-letter, '1'+codigo '1' auth-fail, '1' otherwise retry. */
  def validateRoute(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).select(
      col("event_id"),
      when(col("event_id") % 11 === 0, lit(null: String)).otherwise(lit("1.0")).as("versao"),
      when(col("event_id") % 5 === 0, lit("outro")).otherwise(lit("inclusao_pedido")).as("tipo"),
      when(col("event_id") % 4 === 0, lit("3"))
        .when(col("event_id") % 4 === 1, lit("2"))
        .otherwise(lit("1")).as("status"),
      when(col("event_id") % 4 === 2, lit("1")).otherwise(lit("0")).as("codigo_erro"))
      .withColumn("route",
        when(col("versao").isNull, lit("rejected_400"))
          .when(col("tipo") =!= "inclusao_pedido", lit("ignored"))
          .when(col("status") === "3", lit("ok"))
          .when(col("status") === "2", lit("dead_letter"))
          .when(col("status") === "1" && col("codigo_erro") === "1", lit("auth_fail"))
          .otherwise(lit("retry")))
      .select("event_id", "tipo", "status", "route")
      .orderBy("event_id")

  val validateRouteSql: String =
    """WITH t AS (
      |  SELECT event_id,
      |    CASE WHEN event_id % 11 = 0 THEN NULL ELSE '1.0' END AS versao,
      |    CASE WHEN event_id % 5 = 0 THEN 'outro' ELSE 'inclusao_pedido' END AS tipo,
      |    CASE WHEN event_id % 4 = 0 THEN '3'
      |         WHEN event_id % 4 = 1 THEN '2' ELSE '1' END AS status,
      |    CASE WHEN event_id % 4 = 2 THEN '1' ELSE '0' END AS codigo_erro
      |  FROM events)
      |SELECT event_id, tipo, status,
      |  CASE WHEN versao IS NULL THEN 'rejected_400'
      |       WHEN tipo <> 'inclusao_pedido' THEN 'ignored'
      |       WHEN status = '3' THEN 'ok'
      |       WHEN status = '2' THEN 'dead_letter'
      |       WHEN status = '1' AND codigo_erro = '1' THEN 'auth_fail'
      |       ELSE 'retry' END AS route
      |FROM t ORDER BY event_id""".stripMargin
}
