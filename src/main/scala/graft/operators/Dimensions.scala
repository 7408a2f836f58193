package graft.operators

import graft.{Exprs, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dimension-path operators — the reference's `contatos_to_bq` full-refresh
  * job and the enrichment join chain (SURVEY.md §2 A4/E1/J5, C1-C3/G3).
  *
  * Scale notes:
  *  - the paginated union is a driver-side `reduce(_ unionByName _)` of
  *    page scans — Catalyst collapses it into one multi-child Union (no
  *    per-page shuffle); at cluster scale each page is just a partition of
  *    the snapshot table.
  *  - the customer→nation→region chain broadcasts both tiny dims, so the
  *    100 TB fact side never shuffles for enrichment.
  *  - C2 first-match lookup = `dropDuplicates(key)` on the build side BEFORE
  *    the join — dedupe happens on the small side, not the fact side.
  */
object Dimensions {

  /** A4/E1/J5 — paginated dimension refresh: page scans unioned, per-row
    * flatten + pt-BR timestamp parse, full-replace semantics
    * (`contatos_to_bq/main.py:83-145`). Pages synthesized by key mod.
    *
    * Schema note: the reference loads this dim with BigQuery `autodetect`
    * (`contatos_to_bq/main.py:105-106`); here columns are DECLARED — at
    * 100 TB schema inference is an extra full pass and a drift hazard, so
    * explicit schemas are the deliberate divergence (inference remains
    * available via `spark.read.option("inferSchema", true)` for parity). */
  def contatosDim(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = Tables.customer(spark, sfDir)
    val pages = (0 until 4).map { p =>
      customer.filter(pmod(col("c_custkey"), lit(4)) === p).select(
        col("c_custkey").as("contato_id"),
        col("c_name").as("nome"),
        col("c_nationkey").cast("long").as("nation_id"),
        // dd/MM/yyyy HH:mm:ss source string (contatos_to_bq/main.py:90-92)
        concat(lit("15/06/2023 "),
          lpad((col("c_custkey") % 24).cast("string"), 2, "0"), lit(":"),
          lpad((col("c_custkey") % 60).cast("string"), 2, "0"), lit(":00")).as("data_criacao_str"))
    }
    pages.reduce(_ unionByName _)
      .withColumn("data_criacao", date_format(
        to_timestamp(col("data_criacao_str"), "dd/MM/yyyy HH:mm:ss"),
        "yyyy-MM-dd HH:mm:ss"))
      .drop("data_criacao_str")
      .orderBy("contato_id")
  }

  /** A4/J8 schema-autodetect parity (`contatos_to_bq/main.py:105-106`):
    * the reference lands contatos with BigQuery `autodetect = True` — the
    * table schema is INFERRED from the staged JSON payload, never
    * declared. The Spark equivalent is a schema-less `spark.read.json`
    * over the staged page files: column names and types come from the
    * data (long for the ids, string for nome/data_criacao), exactly the
    * sample-based inference BQ runs. [[contatosDim]] stays the declared
    * query (the oracle needs stable names either way); this loader stages
    * the paginated payload and proves the inferred frame is
    * schema-and-value identical to the declared one (DimensionsSpec).
    * Inference reorders columns alphabetically, so the SELECT pins the
    * projection order — the one thing autodetect cannot know. */
  def contatosDimInferred(spark: SparkSession, sfDir: String,
      stageDir: String): DataFrame = {
    contatosDim(spark, sfDir).write.mode("overwrite").json(stageDir)
    spark.read.json(stageDir) // no .schema(...): BQ-autodetect equivalent
      .select(col("contato_id"), col("nome"), col("nation_id"),
        col("data_criacao"))
      .orderBy("contato_id")
  }

  val contatosDimSql: String =
    """SELECT c_custkey AS contato_id, c_name AS nome,
      |  CAST(c_nationkey AS BIGINT) AS nation_id,
      |  strftime(strptime('15/06/2023 ' || lpad(CAST(c_custkey % 24 AS VARCHAR), 2, '0') ||
      |    ':' || lpad(CAST(c_custkey % 60 AS VARCHAR), 2, '0') || ':00',
      |    '%d/%m/%Y %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS data_criacao
      |FROM customer ORDER BY contato_id""".stripMargin

  /** C1/C3 — multi-dim enrichment: orders ⋈ customer ⋈ nation ⋈ region,
    * small dims broadcast (`api_to_gcs/main.py:156-179` models this as N+1
    * point lookups; the distributed equivalent is broadcast hash join).
    *
    * Only nation/region carry a broadcast HINT — they are fixed-cardinality
    * (25/5 rows) at any corpus size. `customer` GROWS with the corpus
    * (~150k rows × sf), so its join strategy is left to size statistics +
    * AQE: broadcast while it fits `autoBroadcastJoinThreshold`, shuffle
    * join beyond — a forced broadcast would OOM the driver at 100× scale. */
  def enrichJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("n_name"), col("r_name"))
    Tables.orders(spark, sfDir)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        col("c_name").as("cliente"),
        col("c_mktsegment").as("segmento"),
        col("n_name").as("nacao"),
        col("r_name").as("regiao"),
        Exprs.r4(col("o_totalprice")).as("valor"))
      .orderBy("o_orderkey")
  }

  val enrichJoinSql: String =
    """SELECT o_orderkey, o_custkey, c_name AS cliente, c_mktsegment AS segmento,
      |  n_name AS nacao, r_name AS regiao,
      |  floor(o_totalprice * 10000 + 0.5) / 10000 AS valor
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |ORDER BY o_orderkey""".stripMargin

  /** C2/G3 — first-match lookup semantics: the build side is deduplicated on
    * its key BEFORE the join so each probe row matches at most once
    * (`sales_to_bq/main.py:93-98` `next(...)`; `api_to_gcs-checker.py:28`). */
  def firstMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val part = Tables.part(spark, sfDir).select("p_partkey", "p_retailprice")
    val dupDim = part.unionByName(part) // duplicated dim, as after a double-load
    val firstMatch = dupDim.dropDuplicates("p_partkey")
    Tables.lineitem(spark, sfDir)
      .join(broadcast(firstMatch), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        Exprs.r4(col("p_retailprice")).as("preco"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val firstMatchSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey,
      |  floor(p_retailprice * 10000 + 0.5) / 10000 AS preco
      |FROM lineitem JOIN (SELECT DISTINCT p_partkey, p_retailprice FROM part) p
      |  ON l_partkey = p_partkey
      |ORDER BY l_orderkey, l_linenumber""".stripMargin
}
