package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** A6/J7 integration closure — a file-backed single-broker append log with
  * the Kafka-shaped semantics the reference's Pub/Sub channel rides on
  * (`api_to_gcs/main.py:276-292` publish; `gcs_to_bq/main.py:351-356`
  * subscribe), so [[graft.operators.Messages]]' encode/decode can be
  * exercised over a REAL pub/sub handoff in-sandbox (no broker exists
  * here; the wire/envelope semantics were already oracle-checked, this
  * supplies the transport).
  *
  * Layout: `<root>/<topic>/p<partition>/<base%020d>.seg` — one
  * atomically-renamed segment per append batch, each a text file of
  * `offset<TAB>key<TAB>data` lines where `data` is the single-line wire
  * form ([[graft.operators.Messages.encode]]'s base64 — the log never
  * interprets payloads, exactly like the broker it models; base64 and
  * uuid keys are tab-free by construction). Consumer-group positions:
  * `<root>/_groups/<group>/<topic>-p<partition>` holding the next offset,
  * written temp + atomic rename (the [[Streaming.applyRollupEpoch]]
  * durability precedent).
  *
  * Semantics contract (StreamingSpec-asserted):
  *  - append is atomic per batch: the segment appears fully or not at all
  *    (temp file + `ATOMIC_MOVE`), so a reader never sees partial writes;
  *  - offsets are dense per partition and assigned at append time;
  *  - `poll(from)` returns records in offset order across segments;
  *  - `commit` is the CONSUMER's act, after apply: a crash between apply
  *    and commit redelivers from the last committed offset
  *    (at-least-once), and exactly-once is the consumer's idempotent
  *    apply (the engine's G2 anti-join guard) — the same split Kafka
  *    itself ships.
  *
  * Single-writer per partition (a "single-broker" log): producers
  * serialize externally, as the reference's one enricher function does.
  * Scale shape: partitions are the parallelism unit, segments are
  * append-batch-sized, and a consumer's read amplification is bounded by
  * segment granularity — the standard log-compaction-free Kafka core.
  *
  * The ENGINE consumes this log end to end: [[Streaming.logStream]] tails
  * the segment files as a Structured Streaming source (atomic rename is
  * exactly the file-source contract) and [[Streaming.logApplyBatch]] runs
  * the subscriber's apply-then-ack shape with [[commit]] as the durable
  * group ack — kill-and-restart over the log is spec-proven loss- and
  * duplicate-free (StreamingSpec "under the ENGINE"). */
object EmbeddedLog {

  /** One delivered record. */
  case class Rec(offset: Long, key: String, data: String)

  private def partDir(root: String, topic: String, partition: Int): Path =
    Paths.get(root, topic, s"p$partition")

  private def segments(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Nil
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.filter(_.getFileName.toString.endsWith(".seg"))
        .toSeq.sortBy(_.getFileName.toString)
      finally s.close()
    }

  /** Next offset to be assigned in the partition (0 on an empty log). */
  def end(root: String, topic: String, partition: Int): Long =
    segments(partDir(root, topic, partition)).lastOption.map { seg =>
      val base = seg.getFileName.toString.stripSuffix(".seg").toLong
      base + Files.readAllLines(seg).size
    }.getOrElse(0L)

  /** Append one batch atomically; returns (baseOffset, nextOffset). */
  def append(root: String, topic: String, partition: Int,
      records: Seq[(String, String)]): (Long, Long) = {
    require(records.nonEmpty, "empty append")
    records.foreach { case (k, v) =>
      require(!k.contains('\t') && !v.contains('\t') && !v.contains('\n'),
        "keys/data must be single-line, tab-free (wire form)")
    }
    val dir = partDir(root, topic, partition)
    Files.createDirectories(dir)
    val base = end(root, topic, partition)
    val lines = records.zipWithIndex.map { case ((k, v), i) =>
      s"${base + i}\t$k\t$v"
    }
    val tmp = Files.createTempFile(dir, ".tmp-", "")
    Files.write(tmp, lines.asJava)
    Files.move(tmp, dir.resolve(f"$base%020d.seg"),
      StandardCopyOption.ATOMIC_MOVE)
    (base, base + records.size)
  }

  /** Records with offset ≥ `from`, in offset order, at most `max`.
    * Segment names carry the base offset, so a segment entirely below
    * `from` is skipped WITHOUT reading it when its successor's base
    * proves its extent (dense offsets: a segment ends where the next
    * begins); only the boundary segment and later ones are read, once
    * each. */
  def poll(root: String, topic: String, partition: Int, from: Long,
      max: Int = Int.MaxValue): Seq[Rec] = {
    val segs = segments(partDir(root, topic, partition))
    val bases = segs.map(_.getFileName.toString.stripSuffix(".seg").toLong)
    segs.zip(bases).zipWithIndex.flatMap { case ((seg, base), i) =>
      // Known end without I/O when the next segment's base bounds this one.
      val knownEnd = bases.lift(i + 1)
      if (knownEnd.exists(_ <= from)) Nil
      else {
        val lines = Files.readAllLines(seg).asScala
        if (base + lines.size <= from) Nil
        else lines.map { l =>
          val Array(o, k, d) = l.split("\t", 3)
          Rec(o.toLong, k, d)
        }.filter(_.offset >= from)
      }
    }.sortBy(_.offset).take(max)
  }

  private def groupFile(root: String, group: String, topic: String,
      partition: Int): Path =
    Paths.get(root, "_groups", group, s"$topic-p$partition")

  /** Durably record the group's NEXT offset (atomic temp + rename). */
  def commit(root: String, group: String, topic: String, partition: Int,
      next: Long): Unit = {
    val f = groupFile(root, group, topic, partition)
    Files.createDirectories(f.getParent)
    val tmp = Files.createTempFile(f.getParent, ".tmp-", "")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, f, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The group's committed next offset (0 = from the beginning). */
  def committed(root: String, group: String, topic: String,
      partition: Int): Long = {
    val f = groupFile(root, group, topic, partition)
    if (Files.isRegularFile(f)) Files.readString(f).trim.toLong else 0L
  }
}
