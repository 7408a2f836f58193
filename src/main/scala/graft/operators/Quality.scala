package graft.operators

import graft.{Exprs, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality / reconciliation operators — the reference's
  * `data_validation/` + `backfill/` set-algebra semantics (SURVEY.md §2
  * E2-E4, G1-G2, C4-C6, F11) as declarative Spark plans.
  *
  * Scale notes:
  *  - `except`/`left_anti` compile to shuffle-partitioned hash anti-joins;
  *    both sides are pre-projected to the single key column so the shuffle
  *    moves keys only (bytes ∝ |keys|, not row width).
  *  - G1's duplicate resolution is a single `row_number` window — one hash
  *    shuffle on `dados_id`, no driver-side grouping (the reference loops
  *    over folder lists in Python; `api_to_gcs-checker.py:130-173`).
  *  - C5's file-group assembly is a conditional-aggregation pivot: one
  *    map-side-combinable hash aggregate instead of a per-folder list scan
  *    (`backfill/gcs_to_pupsub.py:64-83`).
  */
object Quality {

  /** E2 — distinct key-set extraction (`backfill/api_to_gcs-backfill.py:128-136`). */
  def idsDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("cust_id")).distinct().orderBy("cust_id")

  val idsDistinctSql: String =
    "SELECT DISTINCT o_custkey AS cust_id FROM orders ORDER BY cust_id"

  /** E3/C6 — cross-store set reconciliation: ids present on only one side,
    * tagged (`data_validation/gcs_to_bq-checker.py:37-60`). */
  def reconSets(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).select(col("c_custkey").as("id"))
    val o = Tables.orders(spark, sfDir).select(col("o_custkey").as("id"))
    c.except(o).withColumn("side", lit("customer_only"))
      .unionByName(o.except(c).withColumn("side", lit("orders_only")))
      .orderBy("side", "id")
  }

  val reconSetsSql: String =
    """SELECT id, side FROM (
      |  SELECT id, 'customer_only' AS side FROM
      |    (SELECT c_custkey AS id FROM customer EXCEPT SELECT o_custkey AS id FROM orders)
      |  UNION ALL
      |  SELECT id, 'orders_only' AS side FROM
      |    (SELECT o_custkey AS id FROM orders EXCEPT SELECT c_custkey AS id FROM customer))
      |ORDER BY side, id""".stripMargin

  /** E4 — set-equality summary between two key sets
    * (`data_validation/api_to_gcs-checker.py:73-79`): one row with the size
    * of each one-sided difference and the equality verdict. */
  def setEquality(spark: SparkSession, sfDir: String): DataFrame = {
    val a = Tables.orders(spark, sfDir).select(col("o_orderkey").as("id"))
      .distinct().withColumn("in_a", lit(1))
    val b = Tables.lineitem(spark, sfDir).select(col("l_orderkey").as("id"))
      .distinct().withColumn("in_b", lit(1))
    a.join(b, Seq("id"), "full_outer").agg(
      sum(when(col("in_b").isNull, 1L).otherwise(0L)).cast("long").as("only_orders"),
      sum(when(col("in_a").isNull, 1L).otherwise(0L)).cast("long").as("only_lineitem"))
      .withColumn("sets_equal", col("only_orders") === 0 && col("only_lineitem") === 0)
  }

  val setEqualitySql: String =
    """SELECT
      |  CAST(SUM(CASE WHEN b.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_orders,
      |  CAST(SUM(CASE WHEN a.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_lineitem,
      |  (SUM(CASE WHEN b.id IS NULL THEN 1 ELSE 0 END) = 0
      |   AND SUM(CASE WHEN a.id IS NULL THEN 1 ELSE 0 END) = 0) AS sets_equal
      |FROM (SELECT DISTINCT o_orderkey AS id FROM orders) a
      |FULL OUTER JOIN (SELECT DISTINCT l_orderkey AS id FROM lineitem) b ON a.id = b.id""".stripMargin

  /** G1 — duplicate-group resolution: one survivor per `dados_id`, preferring
    * live captures over synthetic-`T000000` backfills, then earliest
    * timestamp (`data_validation/api_to_gcs-checker.py:130-173`). Folder set
    * synthesized from `orders` with forced key collisions. */
  def dupResolution(spark: SparkSession, sfDir: String): DataFrame = {
    val folders = Tables.orders(spark, sfDir).select(
      (col("o_orderkey") % 2000).as("dados_id"),
      col("o_orderkey").as("folder_id"),
      concat(date_format(col("o_orderdate"), "yyyyMMdd"),
        when(col("o_orderkey") % 4 === 0, lit("T000000"))
          .otherwise(concat(lit("T"),
            lpad((col("o_orderkey") % 86400).cast("string"), 6, "0")))).as("ts"))
    val w = Window.partitionBy("dados_id")
      .orderBy(col("is_synth").asc, col("ts").asc, col("folder_id").asc)
    folders
      .withColumn("is_synth", Exprs.isSyntheticTs(col("ts")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("dados_id", "folder_id", "ts")
      .orderBy("dados_id")
  }

  val dupResolutionSql: String =
    """WITH folders AS (
      |  SELECT o_orderkey % 2000 AS dados_id, o_orderkey AS folder_id,
      |    strftime(o_orderdate, '%Y%m%d') ||
      |      CASE WHEN o_orderkey % 4 = 0 THEN 'T000000'
      |           ELSE 'T' || lpad(CAST(o_orderkey % 86400 AS VARCHAR), 6, '0') END AS ts
      |  FROM orders),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY dados_id
      |    ORDER BY (ts LIKE '%T000000') ASC, ts ASC, folder_id ASC) AS rn
      |  FROM folders)
      |SELECT dados_id, folder_id, ts FROM r WHERE rn = 1 ORDER BY dados_id""".stripMargin

  /** C4/G2 — anti-join against an already-processed key set
    * (`backfill/api_to_gcs-backfill.py:217-240`). */
  def antiJoinDedupe(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val processed = orders.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey").as("dados_id"))
    orders.select(col("o_orderkey").as("dados_id"), col("o_totalprice"))
      .join(processed, Seq("dados_id"), "left_anti")
      .orderBy("dados_id")
  }

  val antiJoinDedupeSql: String =
    """SELECT o_orderkey AS dados_id, o_totalprice FROM orders
      |WHERE o_orderkey % 7 <> 0 ORDER BY dados_id""".stripMargin

  /** C5 — per-folder file-group assembly as a conditional-agg pivot
    * (`backfill/gcs_to_pupsub.py:64-83`): one pdv + one pesquisa file, a
    * sorted produto file list, per folder. */
  def fileGroups(spark: SparkSession, sfDir: String): DataFrame = {
    val files = Tables.lineitem(spark, sfDir).select(
      col("l_orderkey").as("folder"),
      when(col("l_linenumber") % 3 === 0, lit("pdv"))
        .when(col("l_linenumber") % 3 === 1, lit("pesquisa"))
        .otherwise(lit("produto")).as("dtype"),
      concat(lit("f"), col("l_linenumber").cast("string")).as("content"))
    files.groupBy("folder").agg(
      max(when(col("dtype") === "pdv", col("content"))).as("pdv_file"),
      max(when(col("dtype") === "pesquisa", col("content"))).as("pesquisa_file"),
      concat_ws(",", sort_array(collect_list(
        when(col("dtype") === "produto", col("content"))))).as("produto_files"),
      count(lit(1)).as("n_files"))
      .orderBy("folder")
  }

  val fileGroupsSql: String =
    """WITH files AS (
      |  SELECT l_orderkey AS folder,
      |    CASE WHEN l_linenumber % 3 = 0 THEN 'pdv'
      |         WHEN l_linenumber % 3 = 1 THEN 'pesquisa'
      |         ELSE 'produto' END AS dtype,
      |    'f' || CAST(l_linenumber AS VARCHAR) AS content
      |  FROM lineitem)
      |SELECT folder,
      |  max(CASE WHEN dtype = 'pdv' THEN content END) AS pdv_file,
      |  max(CASE WHEN dtype = 'pesquisa' THEN content END) AS pesquisa_file,
      |  COALESCE(array_to_string(list_sort(list(content) FILTER (WHERE dtype = 'produto')), ','), '') AS produto_files,
      |  count(*) AS n_files
      |FROM files GROUP BY folder ORDER BY folder""".stripMargin

  /** Folder-completeness audit (`data_validation/api_to_gcs-checker.py:
    * 59-89`): per folder, a pdv file and a pesquisa file must exist plus at
    * least one produto file; flags incomplete folders. */
  def folderCompleteness(spark: SparkSession, sfDir: String): DataFrame = {
    val files = Tables.lineitem(spark, sfDir).select(
      col("l_orderkey").as("folder"),
      when(col("l_linenumber") % 3 === 0, lit("pdv"))
        .when(col("l_linenumber") % 3 === 1, lit("pesquisa"))
        .otherwise(lit("produto")).as("dtype"),
      concat(lit("f"), col("l_linenumber").cast("string")).as("content"))
    files.groupBy("folder").agg(
      (sum(when(col("dtype") === "pdv", 1).otherwise(0)) > 0).as("has_pdv"),
      (sum(when(col("dtype") === "pesquisa", 1).otherwise(0)) > 0).as("has_pesquisa"),
      countDistinct(when(col("dtype") === "produto", col("content"))).as("n_produto"))
      .withColumn("complete",
        col("has_pdv") && col("has_pesquisa") && col("n_produto") > 0)
      .orderBy("folder")
  }

  val folderCompletenessSql: String =
    """WITH files AS (
      |  SELECT l_orderkey AS folder,
      |    CASE WHEN l_linenumber % 3 = 0 THEN 'pdv'
      |         WHEN l_linenumber % 3 = 1 THEN 'pesquisa'
      |         ELSE 'produto' END AS dtype,
      |    'f' || CAST(l_linenumber AS VARCHAR) AS content
      |  FROM lineitem)
      |SELECT folder,
      |  SUM(CASE WHEN dtype = 'pdv' THEN 1 ELSE 0 END) > 0 AS has_pdv,
      |  SUM(CASE WHEN dtype = 'pesquisa' THEN 1 ELSE 0 END) > 0 AS has_pesquisa,
      |  COUNT(DISTINCT CASE WHEN dtype = 'produto' THEN content END) AS n_produto,
      |  (SUM(CASE WHEN dtype = 'pdv' THEN 1 ELSE 0 END) > 0
      |   AND SUM(CASE WHEN dtype = 'pesquisa' THEN 1 ELSE 0 END) > 0
      |   AND COUNT(DISTINCT CASE WHEN dtype = 'produto' THEN content END) > 0) AS complete
      |FROM files GROUP BY folder ORDER BY folder""".stripMargin

  /** F11 — post-action count verification (`api_to_gcs-checker.py:121-128`). */
  def countVerify(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).filter(col("value") > 100)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type")

  val countVerifySql: String =
    """SELECT event_type, count(*) AS n FROM events
      |WHERE value > 100 GROUP BY event_type ORDER BY event_type""".stripMargin

  private val profileCols =
    Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")

  /** Data profiling — per-column quality stats (row count, nulls, distinct,
    * min/max), two fully-parallel scans:
    *
    *  1. count/min/max for every column in ONE map-side-combined aggregate
    *     row (no shuffle of data, just partial-agg merge);
    *  2. EXACT distinct counts via explode to (col_name, value) pairs →
    *     keyed two-level dedupe. `k × countDistinct` in one aggregate — the
    *     obvious single-scan form — plans as a (k+1)× Expand whose final
    *     distinct-set merge lands on ONE ungrouped reducer (measured 7-8 s
    *     at sf0.1 vs ~1.5 s for this plan); grouping the dedupe by
    *     (col_name, value) keeps every stage 32-way parallel, and the shape
    *     survives 100 TB because no task ever holds a full distinct set.
    *     Values dedupe via their canonical string form (injective per
    *     column type), so one pair stream serves every column type.
    *
    * At 100 TB the same two scans hold; if exactness can be traded,
    * `approx_count_distinct` collapses scan 2 back into scan 1's aggregate
    * row with constant-memory sketches. */
  def tableProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val lt = Tables.lineitem(spark, sfDir)
    val basicAggs = profileCols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_nonnull"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max"))
    } :+ count(lit(1)).as("n_rows")
    val one = lt.agg(basicAggs.head, basicAggs.tail: _*)
    // dedupe on the canonical string form — injective per column type,
    // EXCEPT floating -0.0 vs 0.0 (distinct strings, but countDistinct and
    // the DuckDB oracle count them as one value): adding 0 first maps
    // -0.0 → 0.0 in IEEE arithmetic and is the identity everywhere else
    def canon(c: String): org.apache.spark.sql.Column =
      lt.schema(c).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType => (col(c) + lit(0)).cast("string")
        case _ => col(c).cast("string")
      }
    val distincts = lt.select(explode(array(profileCols.map(c =>
        struct(lit(c).as("c"), canon(c).as("v"))): _*)).as("p"))
      .select(col("p.c").as("col_name"), col("p.v").as("v"))
      .filter(col("v").isNotNull)
      .distinct()
      .groupBy("col_name").agg(count(lit(1)).as("n_distinct"))
    val entries = profileCols.map { c =>
      struct(lit(c).as("col_name"), col("n_rows"),
        (col("n_rows") - col(s"${c}_nonnull")).as("n_nulls"),
        col(s"${c}_min").as("min_value"), col(s"${c}_max").as("max_value"))
    }
    one.select(explode(array(entries: _*)).as("p"))
      .select("p.*")
      // left join: an all-null column produces no pairs → 0 distinct,
      // matching countDistinct. The 5-row distincts side broadcasts.
      .join(broadcast(distincts), Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_value"), col("max_value"))
      .orderBy("col_name")
  }

  /** Numeric distribution profile — EXACT quantiles per group (count, min,
    * max, grid mean, p25/p50/p90/p99), the histogram-shaped half of data
    * profiling ([[tableProfile]] covers nulls/distincts/ranges).
    *
    * Exact `percentile` buffers a group's values and interpolates on the
    * sorted run — correct here because the grouping key (event_type, 5
    * values) bounds each group to ~n/5 doubles. At 100 TB per-key exact
    * quantiles flip to `approx_percentile` (t-digest: mergeable,
    * constant-memory — ScaleSpec's approx-vs-exact test shows the
    * tolerance); the exact form stays the oracle of the approximation.
    *
    * Oracle parity: both engines interpolate `lower + frac·(higher−lower)`
    * over identically-sorted doubles with `frac` from `p·(n−1)` — every
    * step is the same IEEE arithmetic on the same operands (products and
    * sums commute bit-exactly), so the raw quantiles match before the r4
    * grid even touches them. The mean goes through [[Exprs.gsum]] (plain
    * `avg` is summation-order-dependent). */
  /** Pearson correlation matrix over the fact table's numeric measures —
    * the multivariate step after [[numericProfile]]'s marginals, and the
    * standard screen for redundant features / derived-column leaks before
    * a modeling pass. ONE corpus scan computes every sufficient statistic
    * (Σx, Σx², Σxy for all pairs) as EXACT integer sums: measures land on
    * a 1e-2 grid as LONGs (exact for quantities, prices in cents, 2-dp
    * rates), pairwise products stay below 2⁶³ per term, and the sums
    * accumulate as DECIMAL(38,0) (DuckDB: HUGEINT). Exactness bound: the
    * corr numerator n·Σxy is a decimal(38,0) product in Spark, so with
    * this table's ~1e7-grid price terms the 38-digit cap holds to roughly
    * 1e12 rows — beyond that Spark (non-ANSI) overflows the product to
    * NULL while DuckDB's HUGEINT carries on to 2¹²⁷, so the engines fail
    * DIFFERENTLY, not wrongly-but-identically; past that scale, coarsen
    * the grid or widen to a two-word accumulator. corr = (n·Σxy − Σx·Σy) /
    * (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)) evaluates the exact integers in one
    * pinned double chain — both engines cast the same exact integer and
    * round once. Zero-variance columns yield NULL, not ±∞.
    *
    * Scale: map-side-combined single aggregate to ONE row of d(d+3)/2
    * cells (d=4 here — broadcast-trivial at any corpus size), then a
    * literal d² explode. The [[graft.operators.Clustering.embeddingGram]]
    * shape, applied to relational measures. */
  def numericCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def g(c: String) = floor(col(c) * lit(100d) + lit(0.5d)).cast("long")
    def dsum(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
    val aggs =
      cols.map(c => dsum(g(c)).as(s"s_$c")) ++
      cols.map(c => dsum(g(c) * g(c)).as(s"ss_$c")) ++
      (for { i <- cols.indices; j <- cols.indices if i < j }
        yield dsum(g(cols(i)) * g(cols(j))).as(s"sp_${cols(i)}_${cols(j)}"))
    val m = Tables.lineitem(spark, sfDir)
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"), aggs: _*)
    def dvar(c: String) = col("n") * col(s"ss_$c") - col(s"s_$c") * col(s"s_$c")
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j } yield {
      val (a, b) = (cols(i), cols(j))
      val num = col("n") * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b")
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        when(dvar(a) === 0 || dvar(b) === 0, lit(null).cast("double"))
          .otherwise(Exprs.r4(num.cast("double")
            / (sqrt(dvar(a).cast("double")) * sqrt(dvar(b).cast("double")))))
          .as("corr"))
    }
    m.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.col_x"), col("p.col_y"), col("p.corr"))
      .orderBy("col_x", "col_y")
  }

  def numericCorrSql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def g(c: String) = s"CAST(floor($c * 100 + 0.5) AS BIGINT)"
    val sums =
      cols.map(c => s"SUM(CAST(${g(c)} AS HUGEINT)) AS s_$c") ++
      cols.map(c => s"SUM(CAST(${g(c)} * ${g(c)} AS HUGEINT)) AS ss_$c") ++
      (for { i <- cols.indices; j <- cols.indices if i < j }
        yield s"SUM(CAST(${g(cols(i))} * ${g(cols(j))} AS HUGEINT)) AS sp_${cols(i)}_${cols(j)}")
    def dvar(c: String) = s"(n * ss_$c - s_$c * s_$c)"
    val arms = (for { i <- cols.indices; j <- cols.indices if i < j } yield {
      val (a, b) = (cols(i), cols(j))
      s"""SELECT '$a' AS col_x, '$b' AS col_y,
         |  CASE WHEN ${dvar(a)} = 0 OR ${dvar(b)} = 0 THEN NULL
         |       ELSE floor(CAST(n * sp_${a}_$b - s_$a * s_$b AS DOUBLE)
         |         / (sqrt(CAST(${dvar(a)} AS DOUBLE))
         |            * sqrt(CAST(${dvar(b)} AS DOUBLE))) * 10000 + 0.5) / 10000
         |  END AS corr
         |FROM m""".stripMargin
    }).mkString("\nUNION ALL\n")
    s"""WITH m AS (
       |  SELECT CAST(count(*) AS HUGEINT) AS n, ${sums.mkString(",\n    ")}
       |  FROM lineitem)
       |SELECT col_x, col_y, corr FROM ($arms)
       |ORDER BY col_x, col_y""".stripMargin
  }

  def numericProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    val pct = percentile(col("value"), array(qs.map(lit): _*))
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(
        count(col("value")).as("n"),
        Exprs.r4(min(col("value"))).as("v_min"),
        Exprs.r4(max(col("value"))).as("v_max"),
        Exprs.r4(Exprs.gsum(col("value")) / count(col("value"))).as("v_mean"),
        pct.as("pct"))
      .select(
        col("event_type") +: col("n") +: col("v_min") +: col("v_max") +:
          col("v_mean") +: qs.zipWithIndex.map { case (q, i) =>
            Exprs.r4(element_at(col("pct"), i + 1))
              .as(s"p${(q * 100).toInt}")
          }: _*)
      .orderBy("event_type")
  }

  val numericProfileSql: String =
    """WITH q AS (
      |  SELECT event_type, count(value) AS n,
      |    min(value) AS v_min, max(value) AS v_max,
      |    CAST(SUM(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
      |      / 10000 / count(value) AS v_mean,
      |    quantile_cont(value, [0.25, 0.5, 0.9, 0.99]) AS pct
      |  FROM events GROUP BY event_type)
      |SELECT event_type, n,
      |  floor(v_min * 10000 + 0.5) / 10000 AS v_min,
      |  floor(v_max * 10000 + 0.5) / 10000 AS v_max,
      |  floor(v_mean * 10000 + 0.5) / 10000 AS v_mean,
      |  floor(pct[1] * 10000 + 0.5) / 10000 AS p25,
      |  floor(pct[2] * 10000 + 0.5) / 10000 AS p50,
      |  floor(pct[3] * 10000 + 0.5) / 10000 AS p90,
      |  floor(pct[4] * 10000 + 0.5) / 10000 AS p99
      |FROM q ORDER BY event_type""".stripMargin

  val tableProfileSql: String = {
    val branches = profileCols.map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_value,
         |  CAST(max($c) AS VARCHAR) AS max_value FROM lineitem""".stripMargin
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Record linkage with blocking — the classic dirty-dimension problem
    * (near-identical catalog entries under one brand, e.g. a re-listed
    * produto): candidate pairs come from an EQUI-join on a blocking key
    * (brand + first name token), and only blocked pairs pay the
    * `levenshtein` compare; pairs within edit distance ≤ `maxDist` are
    * linked. Edit distance 0 = exact re-list, 1-2 = typo-grade variants.
    *
    * Scale: the O(n²) all-pairs compare never happens — cost is
    * Σ block², bounded by the blocking key's fan-in (the standard
    * record-linkage design; multiple passes with different blocking keys
    * union'd raise recall). The blocked self-join is one hash exchange of
    * (key, name) — names stay short; a skewed block (generic brand) is
    * AQE skew-join territory, same as the LSH band joins. `levenshtein`
    * is integer unit-cost edit distance in BOTH engines, so the oracle
    * matches exactly with no float anywhere. */
  def fuzzyMatch(spark: SparkSession, sfDir: String, maxDist: Int = 2): DataFrame = {
    val parts = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"), col("p_name"),
        split(col("p_name"), " ").getItem(0).as("blk"))
    // |len(a) − len(b)| ≤ maxDist is NECESSARY for edit distance ≤ maxDist:
    // as a join residual it skips the O(len²) levenshtein DP for the bulk
    // of each block's pairs without changing the result
    parts.as("a").join(parts.as("b"),
      col("a.p_brand") === col("b.p_brand") && col("a.blk") === col("b.blk")
        && col("a.p_partkey") < col("b.p_partkey")
        && abs(length(col("a.p_name")) - length(col("b.p_name"))) <= maxDist)
      .withColumn("dist", levenshtein(col("a.p_name"), col("b.p_name")))
      .filter(col("dist") <= maxDist)
      .select(col("a.p_partkey").as("part_a"), col("b.p_partkey").as("part_b"),
        col("a.p_brand").as("brand"), col("a.p_name").as("name_a"),
        col("b.p_name").as("name_b"), col("dist").cast("long").as("dist"))
      .orderBy("part_a", "part_b")
  }

  def fuzzyMatchSql(maxDist: Int = 2): String =
    s"""WITH p AS (
      |  SELECT p_partkey, p_brand, p_name, string_split(p_name, ' ')[1] AS blk
      |  FROM part)
      |SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
      |  a.p_brand AS brand, a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      |FROM p a JOIN p b
      |  ON a.p_brand = b.p_brand AND a.blk = b.blk
      |  AND a.p_partkey < b.p_partkey
      |WHERE levenshtein(a.p_name, b.p_name) <= $maxDist
      |ORDER BY part_a, part_b""".stripMargin

  /** Declarative data-quality expectations — the Great-Expectations-style
    * audit the reference's checkers run imperatively
    * (`data_validation/api_to_gcs-checker.py`,
    * `data_validation/gcs_to_bq-checker.py`): a fixed rule table (null
    * rate, value range, date range, key uniqueness, referential coverage)
    * evaluated as ONE conditional aggregate over the fact plus one
    * anti-join probe of the dimension — two passes over the fact and one
    * dimension scan for ANY number of column rules (asserted), emitted as
    * a (rule, observed, threshold, pass) report.
    *
    * Scale: every column rule folds into the same map-side-combined
    * aggregate row (adding a rule adds a column, not a pass); the
    * referential rule is a broadcast-able anti-join. Ratios divide exact
    * LONG counts in a pinned order onto a 1e-6 grid, so the report is
    * bit-deterministic cross-engine. */
  /** K-anonymity report with a generalization ladder — the structured-data
    * privacy gate next to the free-text scrub
    * ([[CorpusOps.piiScrub]]): rows whose QUASI-IDENTIFIER combination
    * (nation × market segment × account-balance band) is shared by fewer
    * than `k` records are re-identifiable by joining released data against
    * public attributes, so a release pass generalizes the finest QI first
    * (band → `*`), then the next (segment → `*`), and suppresses whatever
    * still sits under `k` — the standard coarsen-until-anonymous ladder
    * (Sweeney's k-anonymity, Mondrian-style bottom-up). Output: the final
    * equivalence classes with their size, the generalization level that
    * produced them, and the suppression flag.
    *
    * Scale: ONE corpus-grain aggregate (map-side combined) builds the
    * class table; every ladder round re-aggregates only the still-small
    * CLASSES — QI-cardinality-sized, never row-sized. Pure integer
    * counts; bit-deterministic. */
  def kAnonymity(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val base = Tables.customer(spark, sfDir).select(
      col("c_nationkey").cast("long").as("nation"),
      col("c_mktsegment").as("segment"),
      floor(col("c_acctbal") / lit(2000d)).cast("int").cast("string")
        .as("bal_band"))
    val l0 = base.groupBy("nation", "segment", "bal_band")
      .agg(count(lit(1)).as("n"))
    val ok0 = l0.filter(col("n") >= k)
      .select(col("nation"), col("segment"), col("bal_band"), col("n"),
        lit(0L).as("gen_level"))
    val l1 = l0.filter(col("n") < k)
      .groupBy("nation", "segment").agg(sum("n").as("n"))
    val ok1 = l1.filter(col("n") >= k)
      .select(col("nation"), col("segment"), lit("*").as("bal_band"),
        col("n"), lit(1L).as("gen_level"))
    val l2 = l1.filter(col("n") < k).groupBy("nation").agg(sum("n").as("n"))
    val f2 = l2.select(col("nation"), lit("*").as("segment"),
      lit("*").as("bal_band"), col("n"), lit(2L).as("gen_level"))
    ok0.unionByName(ok1).unionByName(f2)
      .withColumn("suppressed", col("n") < k)
      .orderBy("nation", "segment", "bal_band", "gen_level")
  }

  def kAnonymitySql(k: Int = 10): String =
    s"""WITH b AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
       |    CAST(CAST(floor(c_acctbal / 2000) AS INT) AS VARCHAR) AS bal_band
       |  FROM customer),
       |l0 AS (SELECT nation, segment, bal_band, count(*) AS n
       |       FROM b GROUP BY 1, 2, 3),
       |ok0 AS (SELECT nation, segment, bal_band, n, CAST(0 AS BIGINT) AS gen_level
       |        FROM l0 WHERE n >= $k),
       |l1 AS (SELECT nation, segment, CAST(SUM(n) AS BIGINT) AS n
       |       FROM l0 WHERE n < $k GROUP BY 1, 2),
       |ok1 AS (SELECT nation, segment, '*' AS bal_band, n,
       |          CAST(1 AS BIGINT) AS gen_level
       |        FROM l1 WHERE n >= $k),
       |l2 AS (SELECT nation, CAST(SUM(n) AS BIGINT) AS n
       |       FROM l1 WHERE n < $k GROUP BY 1),
       |f2 AS (SELECT nation, '*' AS segment, '*' AS bal_band, n,
       |         CAST(2 AS BIGINT) AS gen_level FROM l2)
       |SELECT nation, segment, bal_band, n, gen_level, n < $k AS suppressed
       |FROM (SELECT * FROM ok0 UNION ALL SELECT * FROM ok1
       |      UNION ALL SELECT * FROM f2)
       |ORDER BY nation, segment, bal_band, gen_level""".stripMargin

  /** Differentially-private count release (ε-DP Laplace mechanism, Dwork
    * et al. 2006) — the OTHER half of the structured-data privacy surface:
    * [[kAnonymity]] decides WHICH classes are safe to release; this
    * operator releases counts with calibrated noise so that no single
    * record's presence is inferable. Counts have sensitivity 1, so noise ~
    * Laplace(1/ε) drawn by inverse-CDF: u ∈ (−½,½) uniform,
    * noise = −(1/ε)·sign(u)·ln(1−2|u|). The release is post-processed the
    * standard way (clamp at 0, round to integer) — post-processing never
    * spends privacy budget. Two ε arms (0.25 and 1.0) make the
    * utility/privacy trade visible in one table.
    *
    * The uniform draw is the engine's shared [[Exprs.md5num]] contract
    * keyed on (ε, group) — DETERMINISTIC so the oracle replays it exactly
    * (and a rerun releases the same table, not a second noisy draw, which
    * would leak budget). A production deployment holding a privacy
    * guarantee against an adversary who knows the pipeline would swap the
    * key for a secret salt — one expression, noted here; the mechanism,
    * sensitivity math, and post-processing are unchanged. (u+½ never hits
    * 0 or 1: the +0.5 offset keeps ln's argument in (2⁻³³, 1].)
    *
    * Scale: one map-side-combined count aggregate over the corpus; the
    * noise arms touch only the GROUP table (QI-cardinality rows), scalar
    * codegen'd math, no extra shuffle. */
  def dpNoisyCounts(spark: SparkSession, sfDir: String,
      epsilons: Seq[(String, Double)] = Seq(("0.25", 0.25), ("1.0", 1.0)),
      // PUBLIC PLACEHOLDER, not a privacy guarantee: the noise draw is
      // keyed on (salt, ε, group) and this default salt is printed right
      // here, so anyone who knows the pipeline can subtract the noise. A
      // real ε-DP release MUST pass a secret salt (and keep it secret) —
      // with the default, the operator demonstrates the mechanism and
      // stays oracle-replayable, nothing more. README/SURVEY carry the
      // same warning at the call surface.
      salt: String = "dp"): DataFrame = {
    val groups = Tables.customer(spark, sfDir)
      .groupBy(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_true"))
    val arms = epsilons.map { case (lbl, eps) =>
      val u32 = Exprs.md5num(concat_ws("|", lit(salt), lit(lbl),
        col("nation").cast("string"), col("segment")))
      val u = (u32.cast("double") + lit(0.5d)) / lit(4294967296d) - lit(0.5d)
      val noise = lit(-1d / eps) * signum(u) * log(lit(1d) - lit(2d) * abs(u))
      groups.select(lit(eps).as("epsilon"), col("nation"), col("segment"),
        col("n_true"),
        Exprs.r4(greatest(lit(0d), col("n_true") + noise)).as("noisy_n"))
        .withColumn("released", floor(col("noisy_n") + lit(0.5d)).cast("long"))
    }
    arms.reduce(_ unionByName _).orderBy("epsilon", "nation", "segment")
  }

  def dpNoisyCountsSql(
      epsilons: Seq[(String, Double)] = Seq(("0.25", 0.25), ("1.0", 1.0))): String = {
    val arms = epsilons.map { case (lbl, eps) =>
      s"""SELECT CAST($eps AS DOUBLE) AS epsilon, nation, segment, n_true,
         |  greatest(0.0, floor((n_true + (-1.0/$eps) * sign(u) * ln(1 - 2*abs(u)))
         |    * 10000 + 0.5) / 10000) AS noisy_n
         |FROM (SELECT nation, segment, n_true,
         |        (CAST(('0x' || substr(md5('dp|$lbl|' ||
         |           CAST(nation AS VARCHAR) || '|' || segment), 1, 8))
         |          AS BIGINT) + 0.5) / 4294967296.0 - 0.5 AS u
         |      FROM g)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH g AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
       |    count(*) AS n_true
       |  FROM customer GROUP BY 1, 2)
       |SELECT epsilon, nation, segment, n_true, noisy_n,
       |  CAST(floor(noisy_n + 0.5) AS BIGINT) AS released
       |FROM ($arms)
       |ORDER BY epsilon, nation, segment""".stripMargin
  }

  def dqExpectations(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val m = o.agg(
      count(lit(1)).as("n"),
      sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("null_price"),
      sum(when(col("o_totalprice") < 0d || col("o_totalprice") > 1e6, 1L)
        .otherwise(0L)).as("range_price"),
      sum(when(col("o_orderdate") < "1995-01-01"
        || col("o_orderdate") > "2001-12-31", 1L).otherwise(0L)).as("range_date"),
      (count(lit(1)) - count_distinct(col("o_orderkey"))).as("dup_keys"))
    val orphans = o.join(Tables.customer(spark, sfDir)
        .select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("orphans"))
    def g6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5d)) / lit(1e6)
    m.crossJoin(orphans)
      .select(explode(array(
        struct(lit("null_rate_totalprice").as("rule"),
          g6(col("null_price").cast("double") / col("n")).as("observed"),
          lit(0.001d).as("threshold")),
        struct(lit("out_of_range_totalprice").as("rule"),
          g6(col("range_price").cast("double") / col("n")).as("observed"),
          lit(0.0d).as("threshold")),
        struct(lit("out_of_range_orderdate").as("rule"),
          g6(col("range_date").cast("double") / col("n")).as("observed"),
          lit(0.0d).as("threshold")),
        struct(lit("duplicate_orderkeys").as("rule"),
          col("dup_keys").cast("double").as("observed"),
          lit(0.0d).as("threshold")),
        struct(lit("orphan_custkeys").as("rule"),
          g6(col("orphans").cast("double") / col("n")).as("observed"),
          lit(0.01d).as("threshold")))).as("r"))
      .select(col("r.rule"), col("r.observed"), col("r.threshold"),
        (col("r.observed") <= col("r.threshold")).as("pass"))
      .orderBy("rule")
  }

  val dqExpectationsSql: String =
    """WITH m AS (
      |  SELECT count(*) AS n,
      |    SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS null_price,
      |    SUM(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000 THEN 1
      |        ELSE 0 END) AS range_price,
      |    SUM(CASE WHEN o_orderdate < DATE '1995-01-01'
      |        OR o_orderdate > DATE '2001-12-31' THEN 1 ELSE 0 END) AS range_date,
      |    count(*) - count(DISTINCT o_orderkey) AS dup_keys
      |  FROM orders),
      |r AS (SELECT count(*) AS orphans FROM orders o
      |      WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                        WHERE c.c_custkey = o.o_custkey)),
      |rules AS (
      |  SELECT 'null_rate_totalprice' AS rule,
      |    floor(CAST(null_price AS DOUBLE) / n * 1000000 + 0.5) / 1000000
      |      AS observed, CAST(0.001 AS DOUBLE) AS threshold FROM m
      |  UNION ALL
      |  SELECT 'out_of_range_totalprice',
      |    floor(CAST(range_price AS DOUBLE) / n * 1000000 + 0.5) / 1000000,
      |    CAST(0.0 AS DOUBLE) FROM m
      |  UNION ALL
      |  SELECT 'out_of_range_orderdate',
      |    floor(CAST(range_date AS DOUBLE) / n * 1000000 + 0.5) / 1000000,
      |    CAST(0.0 AS DOUBLE) FROM m
      |  UNION ALL
      |  SELECT 'duplicate_orderkeys', CAST(dup_keys AS DOUBLE),
      |    CAST(0.0 AS DOUBLE) FROM m
      |  UNION ALL
      |  SELECT 'orphan_custkeys',
      |    floor(CAST(r.orphans AS DOUBLE) / m.n * 1000000 + 0.5) / 1000000,
      |    CAST(0.01 AS DOUBLE) FROM m, r)
      |SELECT rule, observed, threshold, observed <= threshold AS pass
      |FROM rules ORDER BY rule""".stripMargin
}
