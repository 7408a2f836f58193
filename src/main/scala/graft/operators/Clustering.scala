package graft.operators

import graft.{Exprs, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K-means centroid training over the embedding corpus (Lloyd's algorithm,
  * fixed iteration count) — the training half of IVF-style ANN
  * ([[Similarity.annIvf]] routes queries through centroids; this operator is
  * where those centroids come from). BASELINE.json extension surface.
  *
  * Spark-first shape, per iteration:
  *  - ASSIGN: the k centroids collapse to ONE row (`collect_list` of k
  *    structs) that broadcast-joins the corpus; each vector picks its
  *    cluster with a per-row fold over the k candidates (`transform` +
  *    `array_min`) — no n×k row blow-up, no shuffle of the corpus.
  *  - UPDATE: `posexplode` to (cluster, dim, x) and one hash aggregate —
  *    the only shuffle, carrying (cid, pos, partial sums), map-side
  *    combined. Centroid arrays reassemble from the k×d aggregate rows.
  * At 100 TB: k×d is driver-trivial (MLlib collects the same thing
  * per iteration), the corpus never shuffles for assignment, and the
  * update shuffle is k×d×partitions after partial aggregation.
  *
  * Oracle determinism — float reductions must not depend on row order:
  *  - distances: per-dimension terms are rounded onto a 1e-6 grid as LONGs,
  *    so the sum commutes and both engines compare identical integers;
  *    ties (equal grid distance) break lexicographically by
  *    (distance, cluster id) via struct min on BOTH sides.
  *  - means: [[Exprs.gsum]]-style grid sums divided in a pinned order
  *    (`sum / count / scale`).
  *  - initial centroids are the `vec_id < k` vectors (deterministic seed —
  *    k-means++ at scale would sample by the same md5-draw trick
  *    [[Sampling]] uses).
  */
object Clustering {
  // distance grid (1e-6) lives in the ArrayDist2I kernel; means use the same
  private val MeanScale = 1e6

  /** Squared-euclidean distance between two double arrays on the LONG grid:
    * Σ floor((x−c)²·1e6 + 0.5), via the native codegen'd
    * [[graft.plans.ArrayDist2I]] kernel (assignment runs it k times per
    * corpus row; the higher-order `zip_with`+`aggregate` form pays the ~4×
    * interpreted-eval penalty [[graft.plans.ArrayDot]] documents). The
    * terms are integers, so ANY summation order — the kernel's loop or the
    * oracle's grouped SUM over exploded rows — yields the same value. */
  private[operators] def distInt(v: Column, c: Column): Column =
    call_function("array_dist2i", v, c)

  /** One Lloyd iteration: assign every vector to its nearest centroid, then
    * recompute each cluster's grid-mean. `cent` columns: cid, c (array),
    * and the returned frame adds n (cluster size this iteration). */
  private[operators] def step(emb: DataFrame, cent: DataFrame): DataFrame = {
    val cents = cent.agg(collect_list(struct(col("cid"), col("c"))).as("cs"))
    val assigned = emb.crossJoin(broadcast(cents))
      .select(col("v"), nearest(col("v"), col("cs")).as("cid"))
    assigned
      .select(col("cid"), posexplode(col("v")))
      .groupBy("cid", "pos")
      .agg(
        (sum(floor(col("col") * lit(MeanScale) + lit(0.5d)).cast("long"))
          .cast("double") / count(lit(1)) / lit(MeanScale)).as("m"),
        count(lit(1)).as("n"))
      .groupBy("cid")
      .agg(
        transform(sort_array(collect_list(struct(col("pos"), col("m")))),
          p => p.getField("m")).as("c"),
        max(col("n")).as("n"))
  }

  /** The corpus as (vec_id, v: array<double>). */
  private[operators] def embDouble(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))

  /** Trained centroids in array form (cid, c, n) — the coarse quantizer a
    * downstream IVF index routes through ([[Similarity.annIvfTrained]]). */
  private[operators] def trainedCentroids(spark: SparkSession, sfDir: String,
      k: Int = 8, iters: Int = 2): DataFrame = {
    require(iters >= 1, "at least one Lloyd iteration (the init frame has no sizes)")
    val emb = embDouble(spark, sfDir)
    val init = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("v").as("c"))
    (1 to iters).foldLeft(init)((c, _) => step(emb, c))
  }

  /** Nearest-centroid id for vector `v` against a 1-row collected centroid
    * list (`cs`: array of (cid, c) structs) — the same grid-distance
    * lexicographic argmin the trainer uses, exposed for routing/assignment
    * at query time. */
  private[operators] def nearest(v: Column, cs: Column): Column =
    array_min(transform(cs, ct =>
      struct(distInt(v, ct.getField("c")).as("d"),
        ct.getField("cid").as("c")))).getField("c")

  /** Train k centroids for `iters` iterations; emit the result long-form
    * (cluster_id, dim, centroid, n_members) — k×d scalar rows, the shape a
    * downstream IVF index loads and the oracle hash-compares (array columns
    * would hash through their rendering, not their values). */
  def kmeansTrain(spark: SparkSession, sfDir: String,
      k: Int = 8, iters: Int = 2): DataFrame =
    trainedCentroids(spark, sfDir, k, iters)
      .select(col("cid").as("cluster_id"), col("n").as("n_members"),
        posexplode(col("c")))
      .select(col("cluster_id"), (col("pos") + 1).cast("long").as("dim"),
        Exprs.r4(col("col")).as("centroid"), col("n_members"))
      .orderBy("cluster_id", "dim")

  val kmeansTrainSql: String =
    """WITH emb AS (
      |  SELECT vec_id, unnest(range(1, len(embedding)+1)) AS pos,
      |         CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |c0 AS (SELECT vec_id AS cid, pos, x AS c FROM emb WHERE vec_id < 8),
      |d1 AS (SELECT e.vec_id, c.cid,
      |         SUM(CAST(floor((e.x-c.c)*(e.x-c.c)*1000000 + 0.5) AS BIGINT)) AS d
      |       FROM emb e JOIN c0 c ON e.pos = c.pos GROUP BY 1, 2),
      |a1 AS (SELECT vec_id, min({'d': d, 'c': cid}).c AS cid FROM d1 GROUP BY 1),
      |m1 AS (SELECT a.cid, e.pos,
      |         CAST(SUM(CAST(floor(e.x*1000000+0.5) AS BIGINT)) AS DOUBLE)
      |           / count(*) / 1000000.0 AS c
      |       FROM emb e JOIN a1 a ON e.vec_id = a.vec_id GROUP BY 1, 2),
      |d2 AS (SELECT e.vec_id, c.cid,
      |         SUM(CAST(floor((e.x-c.c)*(e.x-c.c)*1000000 + 0.5) AS BIGINT)) AS d
      |       FROM emb e JOIN m1 c ON e.pos = c.pos GROUP BY 1, 2),
      |a2 AS (SELECT vec_id, min({'d': d, 'c': cid}).c AS cid FROM d2 GROUP BY 1),
      |m2 AS (SELECT a.cid, e.pos,
      |         CAST(SUM(CAST(floor(e.x*1000000+0.5) AS BIGINT)) AS DOUBLE)
      |           / count(*) / 1000000.0 AS c,
      |         count(*) AS n
      |       FROM emb e JOIN a2 a ON e.vec_id = a.vec_id GROUP BY 1, 2)
      |SELECT cid AS cluster_id, CAST(pos AS BIGINT) AS dim,
      |  floor(c*10000+0.5)/10000 AS centroid, CAST(n AS BIGINT) AS n_members
      |FROM m2 ORDER BY cluster_id, dim""".stripMargin

  /** Cluster-quality report for the trained coarse quantizer — the
    * SIMPLIFIED silhouette (Hruschka et al. 2004): per vector,
    * a = grid-distance to its own (nearest) centroid, b = distance to the
    * second-nearest centroid, s = (b−a)/max(a,b); reported as the
    * per-cluster mean with the cluster size. The pairwise silhouette is
    * O(n²) and dies at scale; the centroid form is the standard k-picker /
    * index-health metric an IVF deployment tracks per retrain ([[kmeansTrain]]
    * trains; this grades).
    *
    * Determinism: distances are the [[graft.plans.ArrayDist2I]] integer
    * grid, so (b−a) and max(a,b) are exact LONGs and s is ONE correctly-
    * rounded division both engines repeat; means go through 1e-6 grid sums
    * ([[Exprs.gsum]]). The per-row second-best scan sorts the k-element
    * (d, cid) struct array inside codegen — no shuffle beyond the final
    * k-row aggregate; the corpus never moves. */
  def kmeansSilhouette(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = trainedCentroids(spark, sfDir)
      .agg(collect_list(struct(col("cid"), col("c"))).as("cs"))
    val ranked = embDouble(spark, sfDir)
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), array_sort(transform(col("cs"), ct =>
        struct(distInt(col("v"), ct.getField("c")).as("d"),
          ct.getField("cid").as("c")))).as("ds"))
      .select(col("vec_id"),
        element_at(col("ds"), 1).getField("c").as("cluster_id"),
        element_at(col("ds"), 1).getField("d").as("a"),
        element_at(col("ds"), 2).getField("d").as("b"))
    val s = when(greatest(col("a"), col("b")) === 0L, lit(0d))
      .otherwise((col("b") - col("a")).cast("double")
        / greatest(col("a"), col("b")).cast("double"))
    ranked.select(col("cluster_id"), s.as("s"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n"),
        Exprs.r4(Exprs.gsum(col("s"), 1e6) / count(lit(1)))
          .as("mean_silhouette"))
      .orderBy("cluster_id")
  }

  /** Oracle: the kmeansTrain CTE chain + a distance pass against the
    * trained centroids, ranked per vector by (d, cid) — the same
    * lexicographic order the struct sort uses. */
  def kmeansSilhouetteSql(): String =
    """WITH emb AS (
      |  SELECT vec_id, unnest(range(1, len(embedding)+1)) AS pos,
      |         CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |c0 AS (SELECT vec_id AS cid, pos, x AS c FROM emb WHERE vec_id < 8),
      |d1 AS (SELECT e.vec_id, c.cid,
      |         SUM(CAST(floor((e.x-c.c)*(e.x-c.c)*1000000 + 0.5) AS BIGINT)) AS d
      |       FROM emb e JOIN c0 c ON e.pos = c.pos GROUP BY 1, 2),
      |a1 AS (SELECT vec_id, min({'d': d, 'c': cid}).c AS cid FROM d1 GROUP BY 1),
      |m1 AS (SELECT a.cid, e.pos,
      |         CAST(SUM(CAST(floor(e.x*1000000+0.5) AS BIGINT)) AS DOUBLE)
      |           / count(*) / 1000000.0 AS c
      |       FROM emb e JOIN a1 a ON e.vec_id = a.vec_id GROUP BY 1, 2),
      |d2 AS (SELECT e.vec_id, c.cid,
      |         SUM(CAST(floor((e.x-c.c)*(e.x-c.c)*1000000 + 0.5) AS BIGINT)) AS d
      |       FROM emb e JOIN m1 c ON e.pos = c.pos GROUP BY 1, 2),
      |a2 AS (SELECT vec_id, min({'d': d, 'c': cid}).c AS cid FROM d2 GROUP BY 1),
      |m2 AS (SELECT a.cid, e.pos,
      |         CAST(SUM(CAST(floor(e.x*1000000+0.5) AS BIGINT)) AS DOUBLE)
      |           / count(*) / 1000000.0 AS c
      |       FROM emb e JOIN a2 a ON e.vec_id = a.vec_id GROUP BY 1, 2),
      |d3 AS (SELECT e.vec_id, c.cid,
      |         SUM(CAST(floor((e.x-c.c)*(e.x-c.c)*1000000 + 0.5) AS BIGINT)) AS d
      |       FROM emb e JOIN m2 c ON e.pos = c.pos GROUP BY 1, 2),
      |rk AS (SELECT vec_id, cid, d,
      |         row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      |       FROM d3),
      |ab AS (SELECT r1.vec_id, r1.cid AS cluster_id, r1.d AS a, r2.d AS b
      |       FROM rk r1 JOIN rk r2
      |         ON r1.vec_id = r2.vec_id AND r1.rn = 1 AND r2.rn = 2),
      |sv AS (SELECT cluster_id,
      |         CASE WHEN greatest(a, b) = 0 THEN 0.0
      |              ELSE CAST(b - a AS DOUBLE) / CAST(greatest(a, b) AS DOUBLE)
      |         END AS s
      |       FROM ab)
      |SELECT cluster_id, count(*) AS n,
      |  floor((CAST(SUM(CAST(floor(s * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
      |    / 1000000 / count(*)) * 10000 + 0.5) / 10000 AS mean_silhouette
      |FROM sv GROUP BY cluster_id ORDER BY cluster_id""".stripMargin

  /** Diversity (cluster-balanced) corpus sampling — the curation stage
    * between clustering and mixing: assign every vector to the trained
    * coarse centroids ([[trainedCentroids]] — the same quantizer the IVF
    * index routes through), then keep a fixed QUOTA per cluster by
    * deterministic md5-draw rank (the [[Sampling]] hash-draw, never an
    * RNG). This is the "sample evenly across semantic space" primitive
    * modern corpus builds use to stop one dense region (boilerplate,
    * one domain) from dominating the training mix — the selection
    * counterpart of SemDeDup's dedup-within-cells.
    *
    * Scale shape: assignment is the k-centroid broadcast fold (corpus
    * never shuffles); the per-cluster quota draw reuses
    * [[TopKAggregator]] with score = −u, so partial quota-buffers
    * combine MAP-SIDE and the one shuffle carries ≤ quota rows per
    * (partition, cluster) — never the corpus, and never a k-partition
    * global window sort (k is small; a window would funnel the whole
    * corpus through k reducers). Determinism: u = md5("cs1_"‖vec_id)
    * first-8-hex ∈ [0,2³²) is exact in a double, ties break by vec_id —
    * the aggregator's (cos desc, id asc) order IS (u asc, vec_id asc). */
  /** (vec_id, cluster_id) under the trained (un-rounded) centroids — the
    * assignment half of [[clusterSample]], exposed for specs and any
    * downstream per-cluster operator. */
  private[graft] def clusterAssignments(spark: SparkSession, sfDir: String,
      k: Int = 8, iters: Int = 2): DataFrame = {
    val cents = trainedCentroids(spark, sfDir, k, iters)
      .agg(collect_list(struct(col("cid"), col("c"))).as("cs"))
    embDouble(spark, sfDir)
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), nearest(col("v"), col("cs")).as("cluster_id"))
  }

  def clusterSample(spark: SparkSession, sfDir: String, k: Int = 8,
      iters: Int = 2, quota: Int = 24): DataFrame = {
    import spark.implicits._
    val assigned = clusterAssignments(spark, sfDir, k, iters)
    val drawn = assigned.select(
        col("cluster_id").as("query_id"), col("vec_id").as("target_id"),
        (-Exprs.md5num(concat(lit("cs1_"), col("vec_id").cast("string")))
          .cast("double")).as("cos"))
      .as[Scored]
    drawn.groupByKey(_.query_id)
      .agg(new TopKAggregator(quota).toColumn.name("top"))
      .toDF("cluster_id", "top")
      .select(col("cluster_id"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("cluster_id"), (col("i") + 1).cast("long").as("draw_rank"),
        col("t._1").as("vec_id"), (-col("t._2")).cast("long").as("u"))
      .orderBy("cluster_id", "draw_rank")
  }

  /** Oracle: the kmeansTrain CTE chain + the d3 assignment pass (the
    * silhouette oracle's prefix), then the quota draw as a per-cluster
    * row_number over (u, vec_id). */
  def clusterSampleSql(quota: Int = 24): String =
    s"""WITH emb AS (
      |  SELECT vec_id, unnest(range(1, len(embedding)+1)) AS pos,
      |         CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |c0 AS (SELECT vec_id AS cid, pos, x AS c FROM emb WHERE vec_id < 8),
      |d1 AS (SELECT e.vec_id, c.cid,
      |         SUM(CAST(floor((e.x-c.c)*(e.x-c.c)*1000000 + 0.5) AS BIGINT)) AS d
      |       FROM emb e JOIN c0 c ON e.pos = c.pos GROUP BY 1, 2),
      |a1 AS (SELECT vec_id, min({'d': d, 'c': cid}).c AS cid FROM d1 GROUP BY 1),
      |m1 AS (SELECT a.cid, e.pos,
      |         CAST(SUM(CAST(floor(e.x*1000000+0.5) AS BIGINT)) AS DOUBLE)
      |           / count(*) / 1000000.0 AS c
      |       FROM emb e JOIN a1 a ON e.vec_id = a.vec_id GROUP BY 1, 2),
      |d2 AS (SELECT e.vec_id, c.cid,
      |         SUM(CAST(floor((e.x-c.c)*(e.x-c.c)*1000000 + 0.5) AS BIGINT)) AS d
      |       FROM emb e JOIN m1 c ON e.pos = c.pos GROUP BY 1, 2),
      |a2 AS (SELECT vec_id, min({'d': d, 'c': cid}).c AS cid FROM d2 GROUP BY 1),
      |m2 AS (SELECT a.cid, e.pos,
      |         CAST(SUM(CAST(floor(e.x*1000000+0.5) AS BIGINT)) AS DOUBLE)
      |           / count(*) / 1000000.0 AS c
      |       FROM emb e JOIN a2 a ON e.vec_id = a.vec_id GROUP BY 1, 2),
      |d3 AS (SELECT e.vec_id, c.cid,
      |         SUM(CAST(floor((e.x-c.c)*(e.x-c.c)*1000000 + 0.5) AS BIGINT)) AS d
      |       FROM emb e JOIN m2 c ON e.pos = c.pos GROUP BY 1, 2),
      |a3 AS (SELECT vec_id, min({'d': d, 'c': cid}).c AS cluster_id
      |       FROM d3 GROUP BY 1),
      |u AS (SELECT vec_id, cluster_id,
      |        CAST(('0x' || substr(md5('cs1_' || CAST(vec_id AS VARCHAR)), 1, 8))
      |          AS BIGINT) AS u
      |      FROM a3),
      |r AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
      |        ORDER BY u, vec_id) AS draw_rank FROM u)
      |SELECT cluster_id, CAST(draw_rank AS BIGINT) AS draw_rank, vec_id, u
      |FROM r WHERE draw_rank <= $quota
      |ORDER BY cluster_id, draw_rank""".stripMargin

  /** Embedding drift monitor — per label, the cosine between the centroids
    * of two deterministic halves of the corpus (vec_id parity stands in
    * for the before/after snapshots a production pipeline compares:
    * yesterday's embedding batch vs today's, or model v1 re-embeds vs v2).
    * A healthy stable embedding space keeps per-label centroids nearly
    * parallel (cos → 1); drift below a threshold is the standard trigger
    * for re-indexing the ANN structure and re-validating downstream
    * classifiers.
    *
    * Fully relational — no array assembly: posexplode to (label, half,
    * dim, x), grid-LONG mean per cell, halves self-joined on (label, dim),
    * and the dot/norm reduced as 1e-8-grid LONG sums (order-free), with
    * the final divide-by-norms on identical double operands in both
    * engines. One shuffle of (label, half, dim) cells; the drift table is
    * labels-sized from any corpus.
    *
    * NOTE the fixture's labels are isotropic (unit vectors with no
    * directional clustering), so on the test data the monitor correctly
    * reports LOW alignment — the cos→1 invariant is asserted on a
    * constructed clustered frame in OperatorsSpec, not on the fixture. */
  def embeddingDrift(spark: SparkSession, sfDir: String): DataFrame =
    embeddingDriftOf(Tables.embeddings(spark, sfDir))

  /** [[embeddingDrift]] over any (vec_id, label, embedding) frame. */
  def embeddingDriftOf(emb: DataFrame): DataFrame = {
    val cells = emb
      .select(col("label").cast("long").as("label"),
        pmod(col("vec_id"), lit(2L)).as("half"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
      .groupBy("label", "half", "dim")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("x") * lit(1e6) + lit(0.5d)).cast("long")).as("s"))
      .withColumn("c", Exprs.r4(col("s").cast("double") / lit(1e6) / col("n")))
    val a = cells.filter(col("half") === 0)
      .select(col("label"), col("dim"), col("c").as("c0"), col("n").as("n0"))
    val b = cells.filter(col("half") === 1)
      .select(col("label"), col("dim"), col("c").as("c1"), col("n").as("n1"))
    a.join(b, Seq("label", "dim"))
      .groupBy("label")
      .agg(max("n0").as("n_a"), max("n1").as("n_b"),
        sum(floor(col("c0") * col("c1") * lit(1e8) + lit(0.5d)).cast("long")).as("dot_g"),
        sum(floor(col("c0") * col("c0") * lit(1e8) + lit(0.5d)).cast("long")).as("a2_g"),
        sum(floor(col("c1") * col("c1") * lit(1e8) + lit(0.5d)).cast("long")).as("b2_g"))
      .select(col("label"), col("n_a"), col("n_b"),
        Exprs.r4(col("dot_g").cast("double")
          / (sqrt(col("a2_g").cast("double")) * sqrt(col("b2_g").cast("double"))))
          .as("cos_drift"))
      .orderBy("label")
  }

  /** Mislabel / outlier detection by centroid distance — the `k` vectors
    * FARTHEST from their own label's centroid, per label: the standard
    * curation probe for label noise (a point far from its class center is
    * either mislabeled or genuinely hard; both go to review before
    * training). Complements [[embeddingDrift]]: drift watches the centroid
    * move, this ranks the points against it.
    *
    * Shape: centroids come from one (label, dim) cell aggregate (grid-LONG
    * means, same arithmetic as [[kmeansTrain]]'s update step), reassemble
    * to arrays, and BROADCAST — labels × dims is always tiny. Each vector
    * then scores with the codegen'd `array_dist2i` kernel (no explode, no
    * corpus shuffle), and the per-label top-k runs as a rank window with
    * WindowGroupLimit pushing the cut map-side. At 100 TB the corpus is
    * read once and shuffles only k rows per label per partition.
    *
    * Distances are integer-grid LONGs (Σ floor((x−c)²·1e6 + 0.5)) — exact
    * cross-engine ties, broken by vec_id. */
  def embeddingOutliers(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        transform(col("embedding"), _.cast("double")).as("v"))
    val cents = emb
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg((sum(floor(col("x") * lit(MeanScale) + lit(0.5d)).cast("long"))
        .cast("double") / count(lit(1)) / lit(MeanScale)).as("m"))
      .groupBy("label")
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
        p => p.getField("m")).as("c"))
    val scored = emb.join(broadcast(cents), "label")
      .select(col("label"), col("vec_id"), distInt(col("v"), col("c")).as("dist2_g"))
    val w = Window.partitionBy("label").orderBy(col("dist2_g").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("label"), col("rk"), col("vec_id"), col("dist2_g"))
      .orderBy("label", "rk")
  }

  def embeddingOutliersSql(k: Int = 5): String =
    s"""WITH emb AS (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label,
       |    unnest(range(1, len(embedding)+1)) AS pos,
       |    CAST(unnest(embedding) AS DOUBLE) AS x
       |  FROM embeddings),
       |m AS (
       |  SELECT label, pos,
       |    CAST(SUM(CAST(floor(x*1000000+0.5) AS BIGINT)) AS DOUBLE)
       |      / count(*) / 1000000.0 AS c
       |  FROM emb GROUP BY 1, 2),
       |d AS (
       |  SELECT e.label, e.vec_id,
       |    CAST(SUM(CAST(floor((e.x-m.c)*(e.x-m.c)*1000000 + 0.5) AS BIGINT))
       |      AS BIGINT) AS dist2_g
       |  FROM emb e JOIN m ON e.label = m.label AND e.pos = m.pos
       |  GROUP BY 1, 2),
       |r AS (
       |  SELECT label, vec_id, dist2_g,
       |    row_number() OVER (PARTITION BY label ORDER BY dist2_g DESC, vec_id) AS rk
       |  FROM d)
       |SELECT label, CAST(rk AS BIGINT) AS rk, vec_id, dist2_g
       |FROM r WHERE rk <= $k ORDER BY label, rk""".stripMargin

  val embeddingDriftSql: String =
    """WITH x AS (
      |  SELECT CAST(label AS BIGINT) AS label, vec_id % 2 AS half, u.i AS dim,
      |    CAST(embedding[u.i] AS DOUBLE) AS x
      |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) u),
      |cells AS (
      |  SELECT label, half, dim, count(*) AS n,
      |    CAST(SUM(CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS s
      |  FROM x GROUP BY 1, 2, 3),
      |cc AS (
      |  SELECT label, half, dim, n,
      |    floor(CAST(s AS DOUBLE) / 1000000 / n * 10000 + 0.5) / 10000 AS c
      |  FROM cells),
      |j AS (
      |  SELECT a.label, a.dim, a.c AS c0, b.c AS c1, a.n AS n0, b.n AS n1
      |  FROM cc a JOIN cc b ON a.label = b.label AND a.dim = b.dim
      |   AND a.half = 0 AND b.half = 1),
      |g AS (
      |  SELECT label, CAST(max(n0) AS BIGINT) AS n_a, CAST(max(n1) AS BIGINT) AS n_b,
      |    CAST(SUM(CAST(floor(c0 * c1 * 100000000 + 0.5) AS BIGINT)) AS BIGINT) AS dot_g,
      |    CAST(SUM(CAST(floor(c0 * c0 * 100000000 + 0.5) AS BIGINT)) AS BIGINT) AS a2_g,
      |    CAST(SUM(CAST(floor(c1 * c1 * 100000000 + 0.5) AS BIGINT)) AS BIGINT) AS b2_g
      |  FROM j GROUP BY 1)
      |SELECT label, n_a, n_b,
      |  floor(CAST(dot_g AS DOUBLE)
      |    / (sqrt(CAST(a2_g AS DOUBLE)) * sqrt(CAST(b2_g AS DOUBLE)))
      |    * 10000 + 0.5) / 10000 AS cos_drift
      |FROM g ORDER BY label""".stripMargin

  /** Upper-triangle Gram matrix Σᵥ vᵢ·vⱼ of the embedding corpus — the
    * single-pass building block for PCA / whitening / covariance statistics
    * over training embeddings. The relational alternative (posexplode ×2 →
    * self-join on vec_id → groupBy (i,j)) shuffles n·d² exploded rows; the
    * typed [[GramAgg]] keeps the d(d+1)/2 running sums in a per-partition
    * buffer and shuffles ONE buffer per partition (the classic mergeable
    * outer-product accumulator — communication O(d²·partitions), corpus
    * never moves). Components land on a 1e-5 LONG grid first, so the
    * accumulation is exact integer math: order-free (Spark merges
    * partitions nondeterministically) and bit-identical to the oracle's
    * grouped SUM over an unnest self-join. Grid headroom: |v| ≤ 1 means
    * per-row products ≤ 1e10, ~9×10⁸ rows before long overflow at this
    * grid; a 100 TB corpus coarsens the grid (1e-3 → 9×10¹² rows), the
    * same precision/scale dial [[graft.operators.Analytics.revenueAnomaly]]
    * documents. */
  def embeddingGram(spark: SparkSession, sfDir: String): DataFrame =
    gramOf(Tables.embeddings(spark, sfDir), "embedding", 64)

  /** The library form of [[embeddingGram]]: upper-triangle Gram of ANY
    * `array<float>` column of fixed dimension `d`. */
  def gramOf(df: DataFrame, embCol: String, d: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // null or ragged vectors would NPE/overrun the fixed-d buffer loop —
    // exclude them, the same row-validity gate every embedding op applies
    val cells = df
      .select(col(embCol))
      .filter(col(embCol).isNotNull && size(col(embCol)) === d)
      .as[Array[Float]]
      .select(new GramAgg(d).toColumn.name("cells"))
    cells.select(explode(col("cells")).as("c"))
      .select(col("c.i"), col("c.j"),
        col("c.g").as("gram_grid"),
        (col("c.g").cast("double") / lit(1e10)).as("gram"))
      .orderBy("i", "j")
  }

  val embeddingGramSql: String =
    """WITH u AS (
      |  SELECT vec_id, t.i AS i,
      |    CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 100000 + 0.5) AS BIGINT) AS g
      |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) t),
      |p AS (
      |  SELECT a.i AS i, b.i AS j, CAST(SUM(a.g * b.g) AS BIGINT) AS gram_grid
      |  FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY 1, 2)
      |SELECT i, j, gram_grid, CAST(gram_grid AS DOUBLE) / 10000000000 AS gram
      |FROM p ORDER BY i, j""".stripMargin

  /** Top principal direction from [[embeddingGram]] by driver-side power
    * iteration (the Gram is d×d = bounded, the same justified collect as
    * the k×d centroid table), then a single broadcast projection pass —
    * each row's PC1 coordinate via the codegen'd `array_dot` kernel. The
    * corpus is scanned once for the Gram and once for the projection;
    * nothing else moves. Spec-tested (OperatorsSpec): the returned
    * direction's Rayleigh quotient dominates every coordinate axis. */
  def pcaProject(spark: SparkSession, sfDir: String, iters: Int = 50): DataFrame = {
    val d = 64
    val g = Array.ofDim[Double](d, d)
    embeddingGram(spark, sfDir).select("i", "j", "gram").collect().foreach { r =>
      val (i, j, v) = (r.getInt(0) - 1, r.getInt(1) - 1, r.getDouble(2))
      g(i)(j) = v; g(j)(i) = v
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d))
    (1 to iters).foreach { _ =>
      val w = Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * v(j)).sum)
      val n = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / n)
    }
    val pc = lit(v.map(x => math.floor(x * 1e6 + 0.5) / 1e6))
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        Exprs.r4(call_function("array_dot",
          transform(col("embedding"), _.cast("double")), pc)).as("pc1"))
      .orderBy("vec_id")
  }

  /** Full DuckDB oracle for [[pcaProject]] — the power iteration unrolled
    * as `iters` (matvec, normalize) CTE pairs over the 64×64 Gram, the same
    * unroll pattern as `Graph.kcorePartsSql`. Bit-exactness rests on three
    * pins, each mirrored from the Scala driver loop:
    *  - the Gram enters both engines as the SAME integer (`gram_grid`,
    *    1e-5-gridded LONG products) divided by 1e10 — one IEEE division;
    *  - every double SUM is an ORDERED aggregate (`SUM(x ORDER BY j)`),
    *    which DuckDB evaluates as a strict left-to-right fold — identical
    *    to the driver's `Seq.sum`/`ArrayDot` accumulation order (verified:
    *    ordered SUM == `list_reduce` fold, != reversed order);
    *  - `0.125` start and all grid constants are CAST to DOUBLE so DuckDB
    *    cannot route arithmetic through DECIMAL.
    * Each `w`/`v` CTE is MATERIALIZED: `w_t` is read twice (norm +
    * divide) and `v_t` feeds `w_{t+1}`, so an inlined chain would re-expand
    * the whole iteration tree exponentially. */
  def pcaProjectSql(iters: Int = 50): String = {
    val head =
      """WITH u AS MATERIALIZED (
        |  SELECT vec_id, t.i AS i,
        |    CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 100000 + 0.5) AS BIGINT) AS gg
        |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) t),
        |p AS MATERIALIZED (
        |  SELECT a.i AS i, b.i AS j, CAST(SUM(a.gg * b.gg) AS BIGINT) AS gram_grid
        |  FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2),
        |g AS MATERIALIZED (
        |  SELECT i, j, CAST(gram_grid AS DOUBLE) / 10000000000 AS g FROM p
        |  UNION ALL
        |  SELECT j, i, CAST(gram_grid AS DOUBLE) / 10000000000 FROM p WHERE i <> j),
        |v0 AS MATERIALIZED (
        |  SELECT i, CAST(0.125 AS DOUBLE) AS v
        |  FROM (SELECT unnest(generate_series(1, 64)) AS i))""".stripMargin
    val steps = (1 to iters).map { t =>
      s""",
         |w$t AS MATERIALIZED (
         |  SELECT g.i, SUM(g.g * v.v ORDER BY g.j) AS w
         |  FROM g JOIN v${t - 1} v ON g.j = v.i GROUP BY g.i),
         |v$t AS MATERIALIZED (
         |  SELECT i, w / (SELECT sqrt(SUM(w * w ORDER BY i)) FROM w$t) AS v
         |  FROM w$t)""".stripMargin
    }.mkString
    s"""$head$steps,
       |pc AS MATERIALIZED (
       |  SELECT i, floor(v * 1000000 + 0.5) / 1000000 AS p FROM v$iters),
       |e AS (
       |  SELECT vec_id, t.i AS i, CAST(embedding[t.i] AS DOUBLE) AS x
       |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) t),
       |pj AS (
       |  SELECT e.vec_id, SUM(e.x * pc.p ORDER BY e.i) AS dot
       |  FROM e JOIN pc USING (i) GROUP BY e.vec_id)
       |SELECT em.vec_id, em.label,
       |  floor(pj.dot * 10000 + 0.5) / 10000 AS pc1
       |FROM embeddings em JOIN pj USING (vec_id)
       |ORDER BY vec_id""".stripMargin
  }
}

/** Mergeable upper-triangle Gram accumulator: buffer = d(d+1)/2 longs of
  * grid-exact Σ vᵢvⱼ partial sums; `merge` is element-wise add, so Spark's
  * partial-aggregation tree IS the distributed outer-product sum. Output
  * rows are 1-based (i ≤ j) to match SQL array subscripts. */
class GramAgg(d: Int) extends org.apache.spark.sql.expressions.Aggregator[
    Array[Float], Array[Long], Seq[GramCell]] {
  private val len = d * (d + 1) / 2
  def zero: Array[Long] = new Array[Long](len)

  def reduce(b: Array[Long], v: Array[Float]): Array[Long] = {
    // identical grid as the probe/oracle: floor(x·1e5 + 0.5) on the DOUBLE
    // widening of the float (exact in IEEE)
    val g = new Array[Long](d)
    var i = 0
    while (i < d) { g(i) = math.floor(v(i).toDouble * 1e5 + 0.5).toLong; i += 1 }
    var t = 0
    i = 0
    while (i < d) {
      var j = i
      while (j < d) { b(t) += g(i) * g(j); t += 1; j += 1 }
      i += 1
    }
    b
  }

  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { x(i) += y(i); i += 1 }
    x
  }

  def finish(b: Array[Long]): Seq[GramCell] = {
    val out = Seq.newBuilder[GramCell]
    var t = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) { out += GramCell(i + 1, j + 1, b(t)); t += 1; j += 1 }
      i += 1
    }
    out.result()
  }
  def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: org.apache.spark.sql.Encoder[Seq[GramCell]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[GramCell]]()
}

case class GramCell(i: Int, j: Int, g: Long)
