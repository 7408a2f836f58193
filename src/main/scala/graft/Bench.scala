package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  /** Execute the query's REAL plan. A plain `df.count()` wraps the plan in
    * Aggregate(count(1)) before optimization, so ColumnPruning deletes the
    * projected expression work and EliminateSorts the final orderBy — a
    * map-heavy query would be timed as little more than a parquet row count.
    * `queryExecution.toRdd` runs the physical plan as written (every output
    * column materialized, sorts included); counting the InternalRows adds
    * nothing measurable.
    */
  private def run(df: DataFrame): Long = df.queryExecution.toRdd.count()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up whole-stage-codegen + JIT per query on the smallest SF so the
    // timed run measures engine throughput, not first-run compilation (which
    // amortizes to zero at scale). Falls back to the flagship query when no
    // smaller SF directory exists. Uses the same action as the timed run so
    // the codegen units that get JIT'd are the ones that get timed.
    val warmDir = sfDir.replaceAll("sf[0-9.]+$", "sf0.001")
    if (warmDir != sfDir && new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.foreach { case (_, fn) =>
        try run(fn(spark, warmDir)) catch { case _: Throwable => () }
        finally Hygiene.releaseAll(spark)
      }
    else
      try run(SparkEntry.entry(spark)) catch { case _: Throwable => () }
      finally Hygiene.releaseAll(spark)
    // Each query is timed twice and the MIN is reported: a single pass is
    // vulnerable to one-off JIT/codegen-compile stalls under load (observed:
    // a 1 s query recorded at 14 s once), and steady-state throughput is
    // what the engine contract is about. A query that throws is reported as
    // -1 and fails the whole run (nonzero exit) — a broken query must never
    // make the total look better.
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        val t = try { run(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None
          }
        // Between-run reset (OUTSIDE the timed window, blocking so removal
        // completes before the next measurement): checkpointing operators
        // leave their final lineage-cut blocks pinned, and 135 queries × 2
        // runs of accumulation was measured to inflate later shuffle-hash
        // queries 10× (triangle_parts 8.5 s fresh vs 103.9 s leaked).
        Hygiene.releaseAll(spark, blocking = true)
        t
      }
      if (times.isEmpty) failed ::= name
      name -> (if (times.isEmpty) -1.0 else times.min)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[bench] FAILED queries: ${failed.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
