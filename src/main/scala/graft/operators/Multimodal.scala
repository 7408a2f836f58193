package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A media item: opaque binary payload + typed metadata. */
case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)

/** Deterministic stand-in for decoded media features. */
case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
  width: Long, height: Long, sum_bytes: Long)

/** Multimodal-column plumbing (BASELINE.json extension surface): treat
  * image/audio/video as opaque `binary` columns with typed metadata, and run
  * decode / feature-extraction as a typed per-partition pass.
  *
  * The actual codec step is STUBBED — image/audio libraries are not in this
  * container — with a deterministic fake (byte length + byte sum stand in
  * for decoded dimensions/content). The Spark-side plumbing is real: binary
  * column, typed `Dataset[MediaRow]`, `mapPartitions` batch shape (the Scala
  * analogue of `mapInPandas` — one iterator per partition, so a real decoder
  * would amortize codec init per-partition, not per-row).
  *
  * Scale notes: payloads never shuffle — the per-partition map runs where
  * the bytes were read; only the tiny feature rows move afterwards.
  */
object Multimodal {

  def multimodalFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, sfDir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit("image/png"))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit("audio/wav"))
        .otherwise(lit("video/mp4")).as("mime"))
      .as[MediaRow]
    media.mapPartitions { rows =>
      // STUB: a real implementation would init a codec here (once per
      // partition) and decode each payload; this container has no media
      // libs, so features are a deterministic function of the raw bytes.
      rows.map { r =>
        val n = r.payload.length.toLong
        val sum = r.payload.foldLeft(0L)((a, b) => a + (b & 0xff))
        MediaFeatures(r.doc_id, r.mime, n, n % 640, (n * 7) % 480, sum)
      }
    }.toDF().orderBy("doc_id")
  }

  /** Oracle parity note: Spark computes over UTF-8 BYTES (binary length,
    * byte-wise sum); the DuckDB mirror uses `strlen` (byte length — exact
    * for any input) and a per-character codepoint sum with the `s` regex
    * flag (so newlines count). Codepoint == byte only for ASCII, so
    * `sum_bytes` assumes the ASCII `documents` fixture — a non-ASCII
    * corpus would need a byte-level oracle (e.g. unnesting the blob). */
  val multimodalFeaturesSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |       ELSE 'video/mp4' END AS mime,
      |  CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  CAST(strlen(text) % 640 AS BIGINT) AS width,
      |  CAST((strlen(text) * 7) % 480 AS BIGINT) AS height,
      |  CAST(list_sum(list_transform(regexp_extract_all(text, '.', 0, 's'), c -> ascii(c))) AS BIGINT) AS sum_bytes
      |FROM documents ORDER BY doc_id""".stripMargin
}
