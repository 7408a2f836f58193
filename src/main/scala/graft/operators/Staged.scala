package graft.operators
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.io.File
import java.nio.file.{Files, StandardCopyOption}

/** Build-once parquet staging for derived tables whose construction cost
  * should amortize across queries and runs — the production "persist the
  * index" pattern the ANN-graph and BM25 docstrings prescribed by hand
  * (reference: the staged-zone fixture protocol in
  * [[graft.operators.Ingest]], generalized to DERIVED data).
  *
  * The key encodes everything the content depends on: a generation
  * version (bump it when the builder's logic changes), every builder
  * parameter, and the source dir identity INCLUDING a content
  * fingerprint ([[dirKey]] — file count + total bytes + max mtime + the
  * canonical path), so regenerating a fixture in place (exactly what
  * `ScaleUp` does to `tmpdata/sf1` between replication factors) MISSES
  * the old stage instead of silently serving the previous corpus's
  * index, and any logic drift lands in a fresh directory.
  *
  * Visibility is ATOMIC: a build writes to a scratch dir under the same
  * root and renames into place (one `ATOMIC_MOVE` per table), so a
  * staged dir either doesn't exist or is complete-with-`_SUCCESS` — a
  * reader can never observe a half-overwritten table, a crashed build
  * leaves only scratch garbage, and when two sessions race the first
  * rename wins and the loser discards its scratch and reads the winner.
  * Correctness stays oracle-guarded on top of all this: the DuckDB twin
  * replays the BUILD from the base tables, so a corrupt staged table
  * fails the gate loudly instead of silently serving.
  *
  * The root lives UNDER THE REPO (`tmpdata/graft_staged`, gitignored) —
  * not world-writable /tmp where another user or branch could poison a
  * key — with `GRAFT_STAGED_ROOT` as the override for pointing serving
  * at shared storage. At 100 TB the same shape holds with the root on
  * an object store: the index build is a scheduled job, the query path
  * reads the parquet — here both live behind one call so every query
  * stays self-contained. */
object Staged {
  private[operators] def root: String =
    sys.env.getOrElse("GRAFT_STAGED_ROOT", "tmpdata/graft_staged")

  private def complete(d: File) = new File(d, "_SUCCESS").exists()

  /** Atomically publish a freshly-built scratch dir at `target`. Returns
    * normally if `target` is complete afterwards, whether this session's
    * rename won or a concurrent builder's did. */
  private def publish(tmp: File, target: File): Unit = {
    require(complete(tmp), s"build left no _SUCCESS in $tmp")
    // a legacy/corrupt target (exists but incomplete) blocks the rename —
    // clear it; completeness can only be observed through `complete`
    if (target.exists() && !complete(target)) rmTree(target)
    target.getParentFile.mkdirs()
    try Files.move(tmp.toPath, target.toPath, StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileSystemException if complete(target) =>
      rmTree(tmp) // lost the race to a concurrent builder — theirs is whole
    }
    require(complete(target), s"staged publish failed for $target")
  }

  private def rmTree(d: File): Unit =
    if (d.exists()) {
      val walk = Files.walk(d.toPath)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally walk.close()
    }

  private def scratch(): File = {
    val t = new File(s"$root/_tmp/${java.util.UUID.randomUUID()}")
    t.getParentFile.mkdirs()
    t
  }

  /** `key` path-safe segments, e.g. "ann_graph_v1/sf0.01_q7_k5_b100_r2".
    * `build` runs at most once per (key, source-content) per filesystem
    * lifetime. */
  def parquet(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    require(!key.contains(".."), s"staging key escapes the root: $key")
    val dir = new File(s"$root/$key")
    if (!complete(dir)) {
      System.err.println(s"[graft] staging $key (first use — later reads are free)")
      val tmp = scratch()
      build.write.mode("overwrite").parquet(tmp.toString)
      publish(tmp, dir)
    }
    spark.read.parquet(dir.toString)
  }

  /** Two tables built by ONE computation (e.g. PQ codebooks + the codes
    * encoded with them): if either staged dir is incomplete the pair is
    * rebuilt and both are written — staging them independently would run
    * the shared training twice on a cold start. Both tables land in
    * scratch FIRST, then two back-to-back atomic renames publish them,
    * so no reader can pair a new A with an old-or-absent B: a stale B at
    * publish time is cleared before A appears (the pair's dirs are
    * re-keyed together, so "A fresh, B one-generation stale" cannot
    * arise from key drift either — only from a crash BETWEEN the two
    * renames, and that window leaves B absent, which re-runs the build,
    * never a mismatched read). */
  def parquetPair(spark: SparkSession, keyA: String, keyB: String)(
      build: => (DataFrame, DataFrame)): (DataFrame, DataFrame) = {
    require(!keyA.contains("..") && !keyB.contains(".."),
      s"staging key escapes the root: $keyA / $keyB")
    val dirA = new File(s"$root/$keyA")
    val dirB = new File(s"$root/$keyB")
    if (!complete(dirA) || !complete(dirB)) {
      System.err.println(s"[graft] staging pair $keyA + $keyB (first use)")
      val (a, b) = build
      val (tmpA, tmpB) = (scratch(), scratch())
      a.write.mode("overwrite").parquet(tmpA.toString)
      b.write.mode("overwrite").parquet(tmpB.toString)
      // clear BOTH stale halves BEFORE either rename. B first is the
      // reader-visibility argument (between the two moves a reader may see
      // A-complete + B-absent, which rebuilds — never A-new + B-old). A
      // must ALSO be cleared: entering this branch with A complete means a
      // previous build crashed between its two renames, and publish()'s
      // race-loser path would otherwise KEEP that old A (rename fails,
      // tmp discarded) while publishing the rebuild's B — a mismatched
      // pair unless the builder is bit-deterministic, which the Lloyd
      // chain's double-accumulation order does not guarantee.
      if (complete(dirB)) rmTree(dirB)
      if (complete(dirA)) rmTree(dirA)
      publish(tmpA, dirA)
      publish(tmpB, dirB)
    }
    (spark.read.parquet(dirA.toString), spark.read.parquet(dirB.toString))
  }

  /** A source dir as a key segment: a human-readable flattened prefix
    * plus a fingerprint hash of (canonical path, max mtime, and every
    * file's relative path + size, sorted). The hash makes three things
    * impossible by construction: distinct paths colliding onto one key
    * ('a/b' vs 'a_b' — the canonical path feeds the hash even though the
    * readable prefix flattens separators); a REGENERATED source dir
    * silently serving the previous content's stage (the fingerprint
    * moves, the old key misses, the stage rebuilds); and — because every
    * parquet writer stamps a fresh UUID into each part-file NAME — a
    * same-millisecond equal-byte-count in-place parquet regeneration
    * slipping through the old (count, bytes, mtime)-only fingerprint's
    * mtime-granularity blind spot (the r15 ScaleSpec needed a
    * setLastModified workaround for exactly that; the per-file names
    * close it, and the spec now passes without touching the clock).
    *
    * Deliberately NOT cached per session: the walk is pure filesystem
    * metadata, measured 1.5 ms on the largest fixture here (tmpdata/sf1,
    * 186 files) and 0.2 ms on a driver sf dir — the generation chains'
    * one-walk-per-generation adds single-digit milliseconds to a
    * multi-second query, while a session-lifetime cache would reintroduce
    * the stale-stage-after-in-place-regeneration hazard the fingerprint
    * exists to kill (a tested contract: ScaleSpec "Staged rebuilds when
    * the source dir is regenerated in place"). At object-store scale the
    * equivalent is one LIST call — also the cost floor any consistent
    * cache-validity probe would pay anyway. */
  def dirKey(sfDir: String): String = {
    val f = new File(sfDir)
    val canon = f.getCanonicalPath
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(canon.getBytes("UTF-8"))
    var mtime = 0L
    if (f.exists()) {
      // walk the CANONICAL path so the per-file relative segment below is
      // spelling-independent ('tmpdata/sf1' and its absolute form hash
      // identically)
      val walk = Files.walk(new File(canon).toPath)
      val files = try {
        val buf = scala.collection.mutable.ArrayBuffer.empty[File]
        walk.forEach { p =>
          val file = p.toFile
          if (file.isFile) buf += file
        }
        buf.sortBy(_.getPath)
      } finally walk.close()
      files.foreach { file =>
        mtime = math.max(mtime, file.lastModified())
        val rel = file.getPath.stripPrefix(canon)
        md.update(s"|$rel:${file.length()}".getBytes("UTF-8"))
      }
    }
    md.update(s"|$mtime".getBytes("UTF-8"))
    val hash = md.digest().take(5).map(b => f"$b%02x").mkString
    sfDir.replaceAll("^/", "").replaceAll("[/\\\\]", "_") + "-" + hash
  }
}
