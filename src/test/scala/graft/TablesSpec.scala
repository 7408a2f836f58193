package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import java.nio.file.Files

/** Loader regression guard for the `events.ts` physical-layout drift that
  * broke 16 queries in one round: the driver's parquet has shipped as
  * TIMESTAMP(NANOS) — which, under the session-wide
  * `spark.sql.legacy.parquet.nanosAsLong=true`, surfaces as a raw LONG of
  * nanoseconds — as TIMESTAMP(MICROS) (native timestamp), and could ship
  * NTZ. `Tables.events` dispatches on the read schema; this spec stages all
  * three layouts and asserts they produce the SAME timestamps, so a data
  * regeneration cannot take the events family down at analysis time again.
  * (Spark cannot write TIMESTAMP(NANOS) parquet itself, so the nanos
  * fixture is staged exactly as the legacy flag surfaces it: a LONG `ts`.)
  */
class TablesSpec extends SparkSuite {

  test("Tables.events reads every shipped ts layout to identical timestamps") {
    import spark.implicits._
    val base = Files.createTempDirectory("events_layouts").toString
    val micros = Seq(1700000000123456L, 1700000360654321L, 1700003600000000L)
    val m = micros.toDF("us")
      .select(timestamp_micros(col("us")).as("ts"), lit(1L).as("event_id"))
    m.write.parquet(s"$base/micros/events.parquet")
    micros.map(_ * 1000L).toDF("ts").withColumn("event_id", lit(1L))
      .write.parquet(s"$base/nanos/events.parquet")
    m.select(col("ts").cast(TimestampNTZType).as("ts"), col("event_id"))
      .write.parquet(s"$base/ntz/events.parquet")
    val read = Seq("micros", "nanos", "ntz").map { layout =>
      val df = Tables.events(spark, s"$base/$layout")
      assert(df.schema("ts").dataType == TimestampType,
        s"$layout layout must normalize ts to TIMESTAMP, " +
          s"got ${df.schema("ts").dataType}")
      layout -> df.select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted
    }
    read.foreach { case (layout, got) =>
      assert(got == micros.sorted, s"$layout layout drifted: $got")
    }
  }
}
