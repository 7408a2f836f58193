package graft.operators
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.io.File
import java.nio.file.{Files, StandardCopyOption}

/** ONE code path for every write-back generation chain in the engine —
  * the batch impact-index chain (`TextOps.stagedImpactGen`), the batch
  * graph chain (`Similarity.stagedGraphGen`), and the streaming index
  * ingest (`Streaming.indexApplyBatch`) previously kept generations
  * under two conventions (content-keyed [[Staged]] dirs vs raw
  * mode-overwrite `gen=<id>` dirs), which meant retention and the
  * drift→compaction policy would each have been implemented twice.
  *
  * A chain lives under one `root` directory and holds immutable
  * generations `gen=<id>/{table…}`. The contract:
  *
  *  - '''Whole-generation atomicity.''' Every table of a generation is
  *    written to one scratch dir first, then a SINGLE `ATOMIC_MOVE`
  *    publishes the whole generation — strictly stronger than the
  *    per-table rename pair it replaces (a crash can no longer land
  *    between two renames; a generation either does not exist or is
  *    complete with every table's `_SUCCESS`). A reader doing the
  *    latest-complete scan can never observe a generation deleted or
  *    half-written mid-publish (the r15 streaming chain's mode-overwrite
  *    writes could be caught mid-rewrite by a concurrent reader).
  *  - '''Immutability + redelivery.''' [[getOrPublish]] short-circuits
  *    when the generation is already complete — a redelivered streaming
  *    micro-batch re-acks and returns instead of re-overwriting a
  *    generation a reader may be serving from.
  *  - '''Retention.''' [[retire]] deletes all but the newest `keepLast`
  *    complete generations. The newest generation is never retired, and
  *    engine batches are sequential, so any redelivered or future batch
  *    id still finds its predecessor ([[latestBelow]] = the newest
  *    complete generation, which retention preserves) — without
  *    retention the streaming chain kept a vocabulary-sized parquet pair
  *    per micro-batch forever (~1,440/day at one batch a minute).
  *  - '''Bounded discovery.''' [[list]] is one directory listing, not
  *    the O(batches) `batchId-1 .. 0` existence probe the stream ran
  *    per batch.
  *
  * Races follow [[Staged]]'s discipline: when two builders publish the
  * same generation, the first rename wins and the loser discards its
  * scratch and reads the winner; a complete-but-corrupt generation is
  * impossible to publish (the move requires every table's `_SUCCESS` in
  * scratch) and a legacy incomplete target is cleared before the move. */
final class GenerationChain(val root: String, val tables: Seq[String]) {
  require(tables.nonEmpty, "a generation chain needs at least one table")

  private def genDir(id: Long) = new File(s"$root/gen=$id")

  private def completeIn(d: File): Boolean =
    tables.forall(t => new File(d, s"$t/_SUCCESS").exists())

  def complete(id: Long): Boolean = completeIn(genDir(id))

  def tablePath(id: Long, table: String): String = {
    require(tables.contains(table), s"unknown chain table $table")
    s"$root/gen=$id/$table"
  }

  def read(spark: SparkSession, id: Long, table: String): DataFrame =
    spark.read.parquet(tablePath(id, table))

  /** Ids of COMPLETE generations, ascending — one readdir of `root`. */
  def list(): Seq[Long] = {
    val names = Option(new File(root).list()).getOrElse(Array.empty[String])
    names.iterator
      .flatMap("""^gen=(\d+)$""".r.findFirstMatchIn(_))
      .map(_.group(1).toLong)
      .filter(complete)
      .toSeq.sorted
  }

  def latest(): Option[Long] = list().lastOption

  /** The newest complete generation strictly below `id` — the
    * predecessor a (re)delivered batch `id` folds onto. Deterministic
    * under redelivery: own-id and later generations are excluded, and
    * earlier generations are immutable. */
  def latestBelow(id: Long): Option[Long] = list().filter(_ < id).lastOption

  /** Build-if-absent: when generation `id` is already complete this is
    * a no-op returning false (the redelivery short-circuit); otherwise
    * `build` must yield one DataFrame per [[tables]] entry (same order),
    * all land in scratch, and one atomic rename publishes the whole
    * generation. Returns true when THIS call published. */
  def getOrPublish(id: Long)(build: => Seq[DataFrame]): Boolean = {
    val target = genDir(id)
    if (completeIn(target)) return false
    System.err.println(s"[graft] publishing $root gen=$id (first use)")
    val frames = build
    require(frames.size == tables.size,
      s"chain $root: build yielded ${frames.size} frames for ${tables.size} tables")
    val tmp = new File(s"$root/_tmp/${java.util.UUID.randomUUID()}")
    tmp.mkdirs()
    tables.zip(frames).foreach { case (t, df) =>
      df.write.mode("overwrite").parquet(s"$tmp/$t")
    }
    require(completeIn(tmp), s"chain build left an incomplete scratch in $tmp")
    // a legacy/corrupt target (exists but incomplete) blocks the rename
    if (target.exists() && !completeIn(target)) rmTree(target)
    try Files.move(tmp.toPath, target.toPath, StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileSystemException if completeIn(target) =>
      rmTree(tmp) // lost the publish race — the winner's generation is whole
    }
    require(completeIn(target), s"generation publish failed for $target")
    true
  }

  /** Delete all but the newest `keepLast` complete generations (plus any
    * ids in `pin` — e.g. a compaction marker). Returns the retired ids.
    * Incomplete stragglers (crashed scratch never reaches the root, so
    * these are only pre-chain legacy dirs) are left for their own
    * builder's clear-before-move. */
  def retire(keepLast: Int, pin: Set[Long] = Set.empty): Seq[Long] = {
    require(keepLast >= 1, "retention must keep at least the newest generation")
    val ids = list()
    val retired = ids.dropRight(keepLast).filterNot(pin)
    retired.foreach(id => rmTree(genDir(id)))
    retired
  }

  private def rmTree(d: File): Unit =
    if (d.exists()) {
      val walk = Files.walk(d.toPath)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally walk.close()
    }
}

object GenerationChain {
  /** A content-keyed chain under the [[Staged]] root — the batch chains'
    * convention: the key carries the generation version, builder params,
    * and the source fingerprint ([[Staged.dirKey]]), so logic drift or a
    * regenerated corpus lands in a fresh chain instead of serving stale
    * generations. */
  def staged(key: String, tables: Seq[String]): GenerationChain = {
    require(!key.contains(".."), s"chain key escapes the root: $key")
    new GenerationChain(s"${Staged.root}/$key", tables)
  }
}
