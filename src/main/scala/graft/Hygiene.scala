package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Block-manager hygiene for long-lived sessions.
  *
  * `Dataset.localCheckpoint` is the engine's standard lineage cut for
  * iterative operators (graph peels, star contraction, shared LM base
  * tables), but every checkpoint PINS its blocks in the block manager until
  * someone unpersists them — Spark's ContextCleaner only reclaims a
  * checkpoint when its RDD is garbage-collected on the driver, which plan
  * objects held by a REPL/notebook/benchmark harness prevent indefinitely.
  * A session that chains many such operators therefore accumulates dead
  * blocks monotonically: storage fills, shuffle-hash builds spill, and a
  * 9-second query degrades to minutes (observed: `triangle_parts` 8.5 s in
  * a fresh JVM vs 103.9 s after 130 leaked queries in one session).
  *
  * Two release points fix it:
  *  - operators that checkpoint PER ROUND release each round's blocks as
  *    soon as the next round is materialized ([[release]] inside the loop —
  *    peak pinned storage becomes one round, not `rounds`);
  *  - session owners (benchmarks, verify dumps, tests, notebooks) call
  *    [[releaseAll]] between queries to drop the FINAL checkpoint that the
  *    returned plan still references, plus any cached plans.
  */
object Hygiene {

  /** Unpersist the block-manager blocks behind a `localCheckpoint`'ed
    * frame. Safe only once no live plan will read the frame again — a local
    * checkpoint truncates lineage, so the blocks are unrecoverable after
    * release. Intended for iterative loops: release round N after round
    * N+1's EAGER checkpoint has materialized. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _             => ()
    }

  /** Drop every persistent RDD and cached plan in the session — the
    * between-queries reset that keeps a long-lived session at steady-state
    * memory. `blocking = true` waits for the block manager to confirm
    * removal (benchmarks want the storage actually empty before the next
    * measurement starts). */
  def releaseAll(spark: SparkSession, blocking: Boolean = false): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking))
    spark.catalog.clearCache()
  }
}
