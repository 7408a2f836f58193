package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink/DDL operators — the reference's BigQuery write patterns (SURVEY.md
  * §2 J1-J6) as parquet-native writers.
  *
  * Scale notes:
  *  - day partitioning (J2/J3) becomes `partitionBy(<date col>)` — gives
  *    partition pruning on every downstream date-filtered scan.
  *  - BigQuery clustering (J3) maps to `sortWithinPartitions` on the
  *    cluster keys before write: parquet min/max row-group stats then give
  *    the same block-skipping effect, with zero extra shuffle (sort is
  *    within already-materialized partitions).
  *  - keyed delete (J6) is an anti-join rewrite of only the partitions that
  *    contain the doomed keys — never a full-table rewrite at scale.
  *  - compaction ([[Writers.compact]]) keeps streaming-fragmented partitions
  *    at scan-optimal file sizes, rewriting only what is fragmented.
  */
object Writers {

  import org.apache.hadoop.fs.{FileSystem, Path}

  /** Atomic-ish directory replacement: write-tmp → rename-old-aside →
    * rename-tmp-in → delete-old. While the process lives, `target` is
    * absent only between the two renames; a crash ANYWHERE leaves the
    * original either in place or intact under the `._old` backup tree,
    * never destroyed, and [[recoverAll]] (run on entry of EVERY mutator,
    * before the table is even read) renames backups home again — so a
    * crashed delete/upsert/compact is fully healed by the next call, even
    * when the lost directory is the table root itself or a partition the
    * next operation would not otherwise visit. Every rename's boolean
    * result is CHECKED: Hadoop FileSystems report quota/permission
    * failures as `false`, not exceptions, and an unchecked false followed
    * by delete(old) would destroy the only copy. Scratch/backup trees
    * MIRROR the table's relative layout under sibling `._rewrite` /
    * `._old` roots — outside the table, so partition discovery never sees
    * them, and structure-preserving, so recovery needs no tag decoding. */
  /** Table-relative path of a swap target, robust to scheme differences
    * (paths from `listStatus` carry `file:`/`hdfs:` URIs, constructed ones
    * may not — URI.relativize across schemes silently returns an ABSOLUTE
    * path, which once resolved a scratch dir onto the target itself). */
  private def relOf(tableRoot: Path, target: Path): String = {
    val root = Path.getPathWithoutSchemeAndAuthority(tableRoot).toString
    val tgt = Path.getPathWithoutSchemeAndAuthority(target).toString
    if (tgt == root) "__root__"
    else {
      require(tgt.startsWith(root + "/"), s"$target is not under $tableRoot")
      tgt.substring(root.length + 1)
    }
  }

  private def swapIn(fs: FileSystem, tableRoot: Path, target: Path)(
    write: String => Unit): Unit = {
    val rel = relOf(tableRoot, target)
    val scratch = new Path(new Path(tableRoot.getParent,
      tableRoot.getName + "._rewrite"), rel)
    val old = new Path(new Path(tableRoot.getParent,
      tableRoot.getName + "._old"), rel)
    require(Path.getPathWithoutSchemeAndAuthority(scratch).toString !=
      Path.getPathWithoutSchemeAndAuthority(target).toString,
      s"scratch resolved onto target: $target")
    fs.delete(scratch, true); fs.delete(old, true)
    fs.mkdirs(scratch.getParent); fs.mkdirs(old.getParent)
    write(scratch.toString)
    def renameOrDie(src: Path, dst: Path): Unit =
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"rename $src -> $dst failed; " +
          s"original data retained at ${if (fs.exists(old)) old else target}")
    // brand-new target (e.g. an upsert creating a partition): nothing to
    // back up — the scratch-then-rename still guarantees the target is
    // either absent or complete, never half-written
    if (fs.exists(target)) renameOrDie(target, old)
    fs.mkdirs(target.getParent)
    renameOrDie(scratch, target)
    fs.delete(old, true)
    ()
  }

  /** Drop the sibling scaffolding roots once a mutator completes: after a
    * successful swap the `._old` leaf is already deleted and the `._rewrite`
    * leaf renamed away, so only empty intermediate directories remain — but
    * left in place they read as a crashed run to an operator (and to tests
    * asserting a clean table sibling). If any FILE survives under either
    * root, a swap did NOT complete — the tree is left intact for
    * [[recoverAll]] to heal on the next mutator call. */
  private def clearScaffolding(fs: FileSystem, tableRoot: Path): Unit =
    Seq("._rewrite", "._old").foreach { suf =>
      val root = new Path(tableRoot.getParent, tableRoot.getName + suf)
      if (fs.exists(root) && !fs.listFiles(root, true).hasNext)
        fs.delete(root, true)
    }

  /** Filesystem directory name Spark uses for a null partition value, and
    * the null-aware filter to go with it: `cast === pv` silently drops
    * every row when pv is null, and a constructed `p_date=null` dir never
    * matches Spark's layout — so null partition values get explicit
    * handling everywhere a partition value round-trips through a string. */
  private val NullPartName = "__HIVE_DEFAULT_PARTITION__"
  private def partDirName(pv: String): String =
    if (pv == null) NullPartName else pv
  private def partEq(partitionCol: String, pv: String) =
    if (pv == null) col(partitionCol).isNull
    else col(partitionCol).cast("string") === pv

  /** Heal every swap a previous crashed run left half-done, then clear
    * scratch space. The `._old` tree mirrors the table layout, so for each
    * backed-up swap target (a directory with data files, or `__root__`):
    * target missing → the backup IS the original, rename it home; target
    * present → the swap completed and only the cleanup was lost, drop the
    * stale backup (leaving it would nest live data inside it on the next
    * rename-aside). Runs BEFORE the mutator reads the table, so even a
    * partition the current operation would never visit — or the table
    * root itself — comes back. */
  private def recoverAll(fs: FileSystem, tableRoot: Path): Unit = {
    val oldRoot = new Path(tableRoot.getParent, tableRoot.getName + "._old")
    def heal(backup: Path, rel: String): Unit = {
      val isRootBackup = rel == "__root__"
      val isSwapLeaf = isRootBackup || fs.listStatus(backup).exists(_.isFile)
      if (isSwapLeaf) {
        val target = if (isRootBackup) tableRoot else new Path(tableRoot, rel)
        if (!fs.exists(target)) {
          fs.mkdirs(target.getParent)
          if (!fs.rename(backup, target))
            throw new java.io.IOException(s"recovery $backup -> $target failed")
        } else fs.delete(backup, true)
      } else fs.listStatus(backup).filter(_.isDirectory).foreach(d =>
        heal(d.getPath, if (rel.isEmpty) d.getPath.getName
        else rel + "/" + d.getPath.getName))
    }
    if (fs.exists(oldRoot)) {
      heal(oldRoot, "")
      fs.delete(oldRoot, true) // only empty scaffolding remains
    }
    fs.delete(new Path(tableRoot.getParent, tableRoot.getName + "._rewrite"), true)
    ()
  }

  /** J2 — day-partitioned append (reference `gcs_to_bq/main.py:193-205`). */
  def writeDayPartitioned(df: DataFrame, dateCol: String, path: String): Unit =
    df.withColumn("p_date", to_date(col(dateCol)))
      .write.mode("append").partitionBy("p_date").parquet(path)

  /** J3 — day partition + clustering (reference
    * `sales_to_bq/main.py:293-306`): sort within partitions on the cluster
    * keys so parquet row-group stats skip like BQ clustering. */
  def writeClustered(df: DataFrame, dateCol: String, clusterCols: Seq[String],
    path: String): Unit =
    df.withColumn("p_date", to_date(col(dateCol)))
      .repartition(col("p_date"))
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("append").partitionBy("p_date").parquet(path)

  /** Z-ordered layout — two-dimensional clustering for tables queried by
    * range on EITHER of two columns (the Databricks Z-ORDER / multi-column
    * clustering technique; single-column `sortWithinPartitions` bounds one
    * column's per-file span and lets the other span every file). Both
    * columns are min/max-scaled to 16 bits, interleaved into a Morton key
    * ([[graft.Exprs.zOrder2]] — pure codegen'd bit arithmetic), then
    * range-partitioned AND sorted by that key, so every output file covers
    * a compact square-ish region of (c1, c2) space and parquet row-group
    * min/max stats can skip files for predicates on either column.
    *
    * Scale notes: the min/max scaling aggregate is one broadcast row; the
    * sort is the same range shuffle any ordered write pays. At 100 TB this
    * nests inside day partitioning exactly like [[writeClustered]] —
    * z-order WITHIN each partition. */
  def writeZOrdered(df: DataFrame, c1: String, c2: String, path: String,
      files: Int = 8): Unit = {
    val mm = df.agg(min(col(c1)).as("x0"), max(col(c1)).as("x1"),
      min(col(c2)).as("y0"), max(col(c2)).as("y1"))
    def scale16(c: org.apache.spark.sql.Column, lo: org.apache.spark.sql.Column,
        hi: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      least(lit(65535L), floor((c.cast("double") - lo)
        / greatest(hi.cast("double") - lo, lit(1e-12)) * 65536d).cast("long"))
    df.crossJoin(broadcast(mm))
      .withColumn("__z", graft.Exprs.zOrder2(
        scale16(col(c1), col("x0"), col("x1")),
        scale16(col(c2), col("y0"), col("y1"))))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "x0", "x1", "y0", "y1")
      .write.mode("overwrite").parquet(path)
  }

  /** Bucketed layout — hash the table into `buckets` files on the join
    * key at WRITE time (`bucketBy` + in-bucket `sortBy`), registered as a
    * catalog table so the scan reports its `HashPartitioning` to the
    * planner. The payoff is the co-located join: two tables bucketed on
    * the same key with the same bucket count equi-join and aggregate on
    * that key with ZERO exchanges — the shuffle was paid once at ingest
    * and is reused by every downstream join, which is the difference
    * between re-shuffling a 100 TB fact for each of N consumers and
    * reading it in place N times. Asserted exchange-free in PlansSpec.
    *
    * `path` makes it an external table (data outlives the session
    * catalog); bucket files stay one-per-bucket-per-task, so pick
    * `buckets` ≈ target file count at the expected table size. */
  def writeBucketed(df: DataFrame, key: String, buckets: Int,
      table: String, path: String): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  /** J5 — truncate-and-replace dimension load (reference
    * `contatos_to_bq/main.py:117-128`). */
  def overwriteDim(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** J6 + B5 — keyed delete as a PARTITION-SCOPED anti-join rewrite with
    * count-verify (reference `api_to_gcs-checker.py:114-128`), plus the
    * checker's dry-run mode (`webhook_payload-checker.py:8,20-37`: report
    * the doomed set, touch nothing).
    *
    * Scale shape: deleting k keys from a day-partitioned 100 TB table must
    * not rewrite 100 TB. The doomed keys' partitions are located with a
    * two-column scan (keyCol + partition value — column-pruned, so parquet
    * reads only those columns and row-group stats/dictionaries skip most
    * blocks); then ONLY the affected `p_date=` directories are rewritten.
    * Swap order is write-tmp → rename-old-aside → rename-tmp-in →
    * delete-old, so at no point is a partition (or, in the unpartitioned
    * fallback, the table) absent: a crash leaves either the original or
    * both copies on disk, never neither.
    *
    * Unpartitioned tables (the dimension sinks of [[overwriteDim]]) fall
    * back to a whole-table rewrite with the same safe swap — for a dim
    * that IS the minimal rewrite.
    *
    * Returns the post-delete count of matching keys (must be 0); with
    * `dryRun=true`, returns the count of rows that WOULD be deleted and
    * performs no writes. */
  def deleteByKey(spark: SparkSession, path: String, keyCol: String,
    keys: Seq[Any], partitionCol: String = "p_date",
    dryRun: Boolean = false): Long = {
    val tableRoot = new Path(path)
    val fs = tableRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverAll(fs, tableRoot) // heal any crashed previous swap first
    val df = spark.read.parquet(path)
    val doomed = df.filter(col(keyCol).isInCollection(keys))
    if (dryRun) return doomed.count()

    if (df.columns.contains(partitionCol)) {
      // locate: column-pruned scan → the small set of affected partitions
      val affected = doomed.select(col(partitionCol).cast("string"))
        .distinct().collect().map(_.getString(0))
      affected.foreach { pv =>
        val dir = new Path(path, s"$partitionCol=${partDirName(pv)}")
        swapIn(fs, tableRoot, dir)(tmp =>
          spark.read.parquet(dir.toString)
            .filter(!col(keyCol).isInCollection(keys))
            .write.parquet(tmp))
      }
    } else {
      swapIn(fs, tableRoot, tableRoot)(tmp =>
        df.filter(!col(keyCol).isInCollection(keys)).write.parquet(tmp))
    }
    clearScaffolding(fs, tableRoot)
    spark.read.parquet(path).filter(col(keyCol).isInCollection(keys)).count()
  }

  /** Partition-scoped upsert — G2's idempotence at the SINK: re-delivered
    * or corrected rows replace same-key rows instead of accumulating
    * (the reference re-inserts and resolves duplicates downstream,
    * `api_to_gcs-checker.py:131-150`; an engine-native sink does it on
    * write). Affected partitions come from the UPDATES' partition values —
    * no table scan at all; each is rewritten as (old rows minus updated
    * keys) ∪ updates with the same never-absent swap. Keys whose partition
    * value CHANGES in an update must be deleted from their old partition
    * first ([[deleteByKey]]) — documented contract, same as Hive/BigQuery
    * partition-key updates. Unpartitioned dims fall back to a whole-table
    * rewrite (for a dim that IS the minimal rewrite). */
  def upsertByKey(spark: SparkSession, path: String, keyCol: String,
    updatesIn: DataFrame, partitionCol: String = "p_date"): Unit = {
    val tableRoot = new Path(path)
    val fs = tableRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverAll(fs, tableRoot) // heal any crashed previous swap first
    val table = spark.read.parquet(path)
    // materialize updates BEFORE any rewrite: a lazy `updates` derived from
    // the target table would otherwise re-read partially-rewritten state
    // mid-loop (updates are output-sized, so this is cheap)
    val updates = updatesIn.localCheckpoint()
    if (table.columns.contains(partitionCol)) {
      val parts = updates.select(col(partitionCol).cast("string"))
        .distinct().collect().map(_.getString(0))
      parts.foreach { pv =>
        val dir = new Path(path, s"$partitionCol=${partDirName(pv)}")
        val partUpdates = updates.filter(partEq(partitionCol, pv))
          .drop(partitionCol)
        if (fs.exists(dir))
          swapIn(fs, tableRoot, dir)(tmp =>
            spark.read.parquet(dir.toString)
              .join(partUpdates.select(keyCol), Seq(keyCol), "left_anti")
              .unionByName(partUpdates)
              .write.parquet(tmp))
        else // brand-new partition: same scratch-then-rename (no backup
          // needed) so a crash leaves either nothing or a complete dir
          swapIn(fs, tableRoot, dir)(tmp => partUpdates.write.parquet(tmp))
      }
    } else {
      swapIn(fs, tableRoot, tableRoot)(tmp =>
        table.join(updates.select(keyCol), Seq(keyCol), "left_anti")
          .unionByName(updates).write.parquet(tmp))
    }
    clearScaffolding(fs, tableRoot)
  }

  /** Small-file compaction — the maintenance counterpart of the streaming
    * sinks: micro-batch writes (`ingest_batch=N/event_date=D/`,
    * [[writeDayPartitioned]] appends) fragment partitions into files far
    * below the scan-optimal size, and at 100 TB the per-file open/footer
    * overhead dominates reads. Operates on LEAF directories (directories
    * whose direct children include parquet files), so any partition
    * nesting depth works — including the streaming sinks' two-level
    * `ingest_batch=N/event_date=D` layout and unpartitioned dims (the
    * table root itself is the leaf). Rewrites ONLY leaves whose file
    * count exceeds what `targetBytes` warrants, each coalesced (narrow —
    * no shuffle) to ⌈bytes/target⌉ files and swapped in with the same
    * never-absent rename sequence as [[deleteByKey]]. Reading a single
    * leaf sees only the data files' own columns, so nested partition
    * values are never baked into rewritten files.
    *
    * Returns (leavesCompacted, filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String,
    targetBytes: Long = 128L << 20): (Int, Int, Int) = {
    val tableRoot = new Path(path)
    val fs = tableRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverAll(fs, tableRoot) // heal any crashed previous swap first
    def dataFiles(dir: Path) = fs.listStatus(dir)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    def leaves(dir: Path): Seq[Path] = {
      val children = fs.listStatus(dir)
      val subdirs = children.filter(_.isDirectory).map(_.getPath)
      val own = if (children.exists(f => f.isFile &&
        f.getPath.getName.endsWith(".parquet"))) Seq(dir) else Nil
      own ++ subdirs.flatMap(leaves)
    }
    var (compacted, before, after) = (0, 0, 0)
    leaves(tableRoot).foreach { leaf =>
      val files = dataFiles(leaf)
      val want = math.max(1L,
        math.ceil(files.map(_.getLen).sum.toDouble / targetBytes).toLong).toInt
      before += files.length
      if (files.length > want) {
        compacted += 1
        swapIn(fs, tableRoot, leaf)(tmp =>
          spark.read.parquet(leaf.toString)
            .coalesce(want).write.parquet(tmp))
      }
      after += dataFiles(leaf).length
    }
    clearScaffolding(fs, tableRoot)
    (compacted, before, after)
  }
}
