package graft.operators
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once parquet staging for derived tables whose construction cost
  * should amortize across queries and runs — the production "persist the
  * index" pattern the ANN-graph and BM25 docstrings prescribed by hand
  * (reference: the staged-zone fixture protocol in
  * [[graft.operators.Ingest]], generalized to DERIVED data).
  *
  * The key encodes everything the content depends on: a generation
  * version (bump it when the builder's logic changes), every builder
  * parameter, and the source dir identity — so a stale table can only be
  * read by a caller asking for exactly the inputs that built it, and any
  * logic drift lands in a fresh directory. Completeness is Spark's own
  * `_SUCCESS` marker: a killed mid-write build leaves no marker and the
  * next caller rebuilds. Correctness stays oracle-guarded: the DuckDB
  * twin replays the BUILD from the base tables, so a corrupt staged
  * table fails the gate loudly instead of silently serving.
  *
  * At 100 TB the same shape holds with the staging root on shared
  * storage: the index build is a scheduled job, the query path reads the
  * parquet — here both live behind one call so every query stays
  * self-contained. */
object Staged {
  private val Root = "/tmp/graft_staged"

  /** `key` path-safe segments, e.g. "ann_graph_v1/sf0.01_q7_k5_b100_r2".
    * `build` runs at most once per key per filesystem lifetime. */
  def parquet(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    require(!key.contains(".."), s"staging key escapes the root: $key")
    val dir = new java.io.File(s"$Root/$key")
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      System.err.println(s"[graft] staging $key (first use — later reads are free)")
      build.write.mode("overwrite").parquet(dir.toString)
    }
    spark.read.parquet(dir.toString)
  }

  /** Two tables built by ONE computation (e.g. PQ codebooks + the codes
    * encoded with them): if either staged dir is incomplete the pair is
    * rebuilt and both are written — staging them independently would run
    * the shared training twice on a cold start, and a crash between the
    * two writes must not leave a mismatched pair (the build re-runs until
    * both carry `_SUCCESS`). */
  def parquetPair(spark: SparkSession, keyA: String, keyB: String)(
      build: => (DataFrame, DataFrame)): (DataFrame, DataFrame) = {
    require(!keyA.contains("..") && !keyB.contains(".."),
      s"staging key escapes the root: $keyA / $keyB")
    val dirA = new java.io.File(s"$Root/$keyA")
    val dirB = new java.io.File(s"$Root/$keyB")
    def ok(d: java.io.File) = new java.io.File(d, "_SUCCESS").exists()
    if (!ok(dirA) || !ok(dirB)) {
      System.err.println(s"[graft] staging pair $keyA + $keyB (first use)")
      val (a, b) = build
      a.write.mode("overwrite").parquet(dirA.toString)
      b.write.mode("overwrite").parquet(dirB.toString)
    }
    (spark.read.parquet(dirA.toString), spark.read.parquet(dirB.toString))
  }

  /** A source dir as a key segment: path separators flattened so
    * /root/testdata/sf0.01 and tmpdata/sf1 stage apart. */
  def dirKey(sfDir: String): String =
    sfDir.replaceAll("^/", "").replaceAll("[/\\\\]", "_")
}
