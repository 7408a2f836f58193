package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media item: opaque binary payload + typed metadata. */
case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)

/** One sampled unit out of a payload: a strided thumbnail ('thumb') or a
  * fixed-size frame ('frame'). */
case class MediaSample(doc_id: Long, kind: String, idx: Long, off: Long,
  len: Long, byte_sum: Long)

/** Unified decoded-media feature row out of the mime dispatcher: image
  * fills width/height (n_frames=1), audio fills n_frames/sample_rate,
  * video fills width/height/n_frames; content_sum/content_mean are the
  * decoded-content statistics in each modality's native unit (channel
  * sum, signed amplitude sum, sampled-frame gray sum). */
case class MediaFeatures(doc_id: Long, mime: String, width: Long,
  height: Long, n_frames: Long, sample_rate: Long, content_sum: Long,
  content_mean: Double)

/** Multimodal-column plumbing (BASELINE.json extension surface): treat
  * image/audio/video as opaque `binary` columns with typed metadata, and run
  * decode / feature-extraction as a typed per-partition pass.
  *
  * ALL THREE modalities run REAL codecs end-to-end: [[multimodalDecode]]
  * (the JDK's `javax.imageio` PNG reader/writer), [[multimodalAudio]]
  * (`javax.sound.sampled` PCM WAV), and [[multimodalVideo]] (the JDK's
  * multi-frame animated-GIF reader/writer — genuine sequence encode +
  * frame-sampled decode), and [[multimodalFeatures]] dispatches one mixed
  * binary column BY MIME to all three decoders in a single
  * `mapPartitions`. Only [[mediaFrames]] keeps a deterministic byte-stat
  * pass — it exercises sampling GEOMETRY (thumb stride, frame offsets)
  * over a generic opaque payload, not decode claims. The Spark-side
  * plumbing is real everywhere: binary column, typed `Dataset[MediaRow]`,
  * `mapPartitions` batch shape (the Scala analogue of `mapInPandas` — one
  * iterator per partition, so decoders amortize codec init per-partition,
  * not per-row).
  *
  * Scale notes: payloads never shuffle — the per-partition map runs where
  * the bytes were read; only the tiny feature rows move afterwards.
  */
object Multimodal {

  /** The MIXED-modality ingest shape — a single binary column whose rows
    * are images, audio clips, and video clips, dispatched BY MIME to the
    * three real JDK codecs ([[multimodalDecode]]'s PNG,
    * [[multimodalAudio]]'s RIFF/WAVE, [[multimodalVideo]]'s animated GIF).
    * Each doc id derives its modality (id%3) and the same deterministic
    * content formula as the dedicated operator for that modality; ONE
    * `mapPartitions` pass resolves all three writers per partition and
    * encodes each row's real payload, a second resolves the two ImageIO
    * readers (WAV decodes via the chunk-walk [[parseWav]]) and emits one
    * unified [[MediaFeatures]] row per payload. No byte-stat branches
    * remain — every content statistic comes out of a decoded payload.
    *
    * Verification: the oracle is a 3-way CASE over the three formula
    * replays, so the hash matches iff every per-mime roundtrip is
    * bit-exact. Scale: payloads are born and die inside one scan
    * partition (encode and decode fuse, no shuffle before the final
    * doc-grain sort); all codec instances amortize per partition. */
  def multimodalFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, sfDir)
      .select(col("doc_id")).as[Long]
    val media = ids.mapPartitions { it =>
      import scala.jdk.CollectionConverters._
      val png = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      val gif = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
      val wav = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
        .iterator().asScala
        .find(_.isFileTypeSupported(wave))
        .getOrElse(sys.error("no WAVE AudioFileWriter provider"))
      it.map { id =>
        (id % 3) match {
          case 0 => MediaRow(id, pngPayload(png, id), "image/png")
          case 1 => MediaRow(id, wavPayload(wav, id), "audio/wav")
          case _ => MediaRow(id, gifPayload(gif, id), "video/gif")
        }
      }
    }
    dispatchDecode(media).orderBy("doc_id")
  }

  /** Mime-dispatched decode of a mixed binary column: every row runs the
    * REAL decoder for its mime and lands in the unified feature shape. */
  private[graft] def dispatchDecode(
      media: org.apache.spark.sql.Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val pngR = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
      val gifR = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      def r4(v: Double) = math.floor(v * 10000 + 0.5) / 10000
      rows.map { r =>
        r.mime match {
          case "image/png" =>
            pngR.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(r.payload)))
            val img = pngR.read(0)
            val (w, h) = (img.getWidth, img.getHeight)
            var s = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                s += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                x += 1
              }
              y += 1
            }
            MediaFeatures(r.doc_id, r.mime, w.toLong, h.toLong, 1L, 0L,
              s, r4(s.toDouble / (3L * w * h)))
          case "audio/wav" =>
            val wavPcm = parseWav(r.payload)
            val nSamples = wavPcm.data.length / 2
            var s = 0L
            var i = 0
            while (i < nSamples) {
              s += (((wavPcm.data(2 * i + 1) & 0xff) << 8) |
                (wavPcm.data(2 * i) & 0xff)).toShort.toLong
              i += 1
            }
            MediaFeatures(r.doc_id, r.mime, 0L, 0L,
              (nSamples / wavPcm.channels).toLong, wavPcm.sampleRate,
              s, r4(s.toDouble / nSamples))
          case _ => // video/gif: container frame count + SAMPLED frames only
            gifR.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(r.payload)))
            val n = gifR.getNumImages(true)
            val sampled = Seq(0, n / 2, n - 1).distinct
            var s = 0L
            var wh = (0, 0)
            sampled.foreach { idx =>
              val img = gifR.read(idx)
              wh = (img.getWidth, img.getHeight)
              var y = 0
              while (y < wh._2) {
                var x = 0
                while (x < wh._1) { s += img.getRGB(x, y) & 0xff; x += 1 }
                y += 1
              }
            }
            MediaFeatures(r.doc_id, r.mime, wh._1.toLong, wh._2.toLong,
              n.toLong, 0L, s,
              r4(s.toDouble / (sampled.length.toLong * wh._1 * wh._2)))
        }
      }
    }.toDF()
  }

  /** Resize + frame-sample plumbing — the remaining two media verbs (the
    * one operator here that deliberately keeps a byte-stat payload: the
    * sampling GEOMETRY is the operator under test, and the real-codec
    * decode claims live in [[multimodalDecode]]/[[multimodalAudio]]/
    * [[multimodalVideo]]/[[multimodalFeatures]]):
    *  - 'thumb' = a strided downsample to ≤64 bytes (resize: pick every
    *    ceil(n/64)-th byte), emitted as its sample count + byte sum;
    *  - 'frame' = the payload as fixed 256-byte frames, sampling first /
    *    middle / last (video frame-sampling's shape), each emitted with its
    *    offset, true length, and byte sum.
    * Same typed `mapPartitions` batch shape — payload bytes never shuffle;
    * only (doc, kind, idx, off, len, sum) rows leave the scan partition.
    * Every quantity is integer arithmetic over bytes, so the DuckDB oracle
    * replays it exactly on the ASCII fixture (see parity note below). */
  def mediaFrames(spark: SparkSession, sfDir: String,
      thumbBytes: Int = 64, frameSize: Int = 256): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, sfDir).select(
      col("doc_id"), col("text").cast("binary").as("payload"),
      lit("video/mp4").as("mime")).as[MediaRow]
    mediaFramesOf(media, thumbBytes, frameSize)
  }

  /** Payload-level core of [[mediaFrames]] — separable so edge shapes
    * (e.g. a zero-byte payload, which has a thumb but no frames) are
    * testable without a fixture table. */
  private[graft] def mediaFramesOf(media: org.apache.spark.sql.Dataset[MediaRow],
      thumbBytes: Int = 64, frameSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val n = r.payload.length
        def sumRange(off: Int, len: Int): Long = {
          var s = 0L; var i = off
          while (i < off + len) { s += r.payload(i) & 0xff; i += 1 }
          s
        }
        val stride = math.max(1, (n + thumbBytes - 1) / thumbBytes)
        val nSamp = (n + stride - 1) / stride
        var ts = 0L
        var i = 0
        while (i < n) { ts += r.payload(i) & 0xff; i += stride }
        val thumb = MediaSample(r.doc_id, "thumb", 0L, 0L, nSamp.toLong, ts)
        val nFrames = (n + frameSize - 1) / frameSize
        // empty payload → nFrames=0 → candidate indices {0, -1}; only real
        // frames [0, nFrames) may be emitted — idx -1 would read off=-256
        // and crash sumRange, and an empty video simply has no frames
        val frames = Seq(0, nFrames / 2, nFrames - 1)
          .filter(f => f >= 0 && f < nFrames).distinct.map { f =>
          val off = f * frameSize
          val len = math.min(frameSize, n - off)
          MediaSample(r.doc_id, "frame", f.toLong, off.toLong, len.toLong,
            sumRange(off, len))
        }
        thumb +: frames
      }
    }.toDF().orderBy("doc_id", "kind", "idx")
  }

  /** Decoded per-image pixel statistics. */
  case class PixelStats(doc_id: Long, width: Long, height: Long,
    sum_r: Long, sum_g: Long, sum_b: Long,
    mean_r: Double, mean_g: Double, mean_b: Double)

  /** Image decode with a REAL codec in the loop — the single-modality
    * form of [[multimodalFeatures]]'s PNG branch, with full RGB channel
    * statistics instead of the unified row. Each document id derives a
    * small deterministic RGB grid (pixel (x,y,c) value =
    * (doc_id·7 + (y·w + x)·3 + c·11) mod 256, w = 4 + id%5, h = 3 + id%4),
    * which one `mapPartitions` pass ENCODES to real PNG bytes
    * (`javax.imageio.ImageIO` — the JDK's built-in lossless codec, no
    * external library) into the same opaque-binary [[MediaRow]] column the
    * other media verbs use, and a second `mapPartitions` pass DECODES with
    * `ImageIO.read`, emitting per-image width/height/channel sums and
    * grid-rounded channel means.
    *
    * Verification logic: DuckDB cannot run a PNG codec, but it can replay
    * the pixel FORMULA exactly — so the oracle recomputes the statistics
    * from the formula, and the hash can only match if the encode→PNG→decode
    * roundtrip reproduced every pixel bit-for-bit. A codec in the loop that
    * dropped, reordered, or quantized anything fails the gate. (PNG byte
    * LENGTH is codec-implementation detail and deliberately not emitted —
    * only decoded content is.)
    *
    * Scale: payload bytes are born and die inside one scan partition —
    * encode and decode fuse into a single stage with no shuffle before the
    * final doc-grain sort; codec instances amortize per partition exactly
    * as a production decoder (mapInPandas-style batch shape) would. */
  def multimodalDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Natural scan splits, no repartition. History: r9 measured fanning
    // this across 32 threads SLOWER than one partition and blamed the
    // imageio registry lock — the r10 root cause was the `ImageIO.write/
    // read` convenience path itself (a synchronized registry scan AND a
    // temp-FILE cache stream per image). With the codec resolved per
    // partition and memory-backed streams, multi-split decode scales
    // cleanly (sf1: 7.4 s → 1.1 s across 10 splits).
    val ids = Tables.documents(spark, sfDir)
      .select(col("doc_id")).as[Long]
    decodePixelStats(encodePng(ids)).orderBy("doc_id")
  }

  /** Formula grid → real PNG bytes, one codec instance per partition
    * (writer resolved once via the registry, memory-backed streams — the
    * `ImageIO.write` convenience path registry-scans AND spools a
    * temp-file cache per image; see [[encodeGif]]). */
  private[graft] def encodePng(
      ids: org.apache.spark.sql.Dataset[Long]): org.apache.spark.sql.Dataset[MediaRow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions { it =>
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("png").next()
      it.map(id => MediaRow(id, pngPayload(writer, id), "image/png"))
    }
  }

  /** One id's formula grid as real PNG bytes (writer reused across rows —
    * resolved once per partition by every caller). */
  private[graft] def pngPayload(writer: javax.imageio.ImageWriter,
      id: Long): Array[Byte] = {
    val w = 4 + (id % 5).toInt
    val h = 3 + (id % 4).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = id * 7 + (y.toLong * w + x) * 3
        val r = ((base) % 256).toInt
        val g = ((base + 11) % 256).toInt
        val b = ((base + 22) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    // direct memory-backed stream: the ImageIO.create*Stream factories
    // registry-scan per call AND default to a TEMP-FILE cache per image
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(img)
    ios.close()
    bos.toByteArray
  }

  /** Real PNG decode of an opaque binary payload column — reader per
    * partition, memory-backed stream (the `ImageIO.read` convenience
    * path pays the registry scan + temp-file cache per call). */
  private[graft] def decodePixelStats(
      encoded: org.apache.spark.sql.Dataset[MediaRow]): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    encoded.mapPartitions { rows =>
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("png").next()
      rows.map { r =>
        reader.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(r.payload)))
        val img = reader.read(0)
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = (w * h).toDouble
        def r4(v: Double) = math.floor(v * 10000 + 0.5) / 10000
        PixelStats(r.doc_id, w.toLong, h.toLong, sr, sg, sb,
          r4(sr / n), r4(sg / n), r4(sb / n))
      }
    }.toDF()
  }

  /** The pixel formula replayed relationally — matches iff the PNG
    * roundtrip above is bit-exact. */
  val multimodalDecodeSql: String =
    """WITH d AS (
      |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, unnest(range(0, w * h)) AS p FROM d),
      |v AS (
      |  SELECT doc_id, w, h,
      |    (doc_id * 7 + p * 3) % 256 AS r,
      |    (doc_id * 7 + p * 3 + 11) % 256 AS g,
      |    (doc_id * 7 + p * 3 + 22) % 256 AS b
      |  FROM px)
      |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(SUM(r) AS BIGINT) AS sum_r,
      |  CAST(SUM(g) AS BIGINT) AS sum_g,
      |  CAST(SUM(b) AS BIGINT) AS sum_b,
      |  floor(CAST(SUM(r) AS DOUBLE) / (w * h) * 10000 + 0.5) / 10000 AS mean_r,
      |  floor(CAST(SUM(g) AS DOUBLE) / (w * h) * 10000 + 0.5) / 10000 AS mean_g,
      |  floor(CAST(SUM(b) AS DOUBLE) / (w * h) * 10000 + 0.5) / 10000 AS mean_b
      |FROM v GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin

  /** Decoded per-clip audio statistics. */
  case class AudioStats(doc_id: Long, sample_rate: Long, channels: Long,
    n_frames: Long, duration_us: Long, sum_amp: Long, sum_sq: Long,
    rms: Double)

  /** Audio decode with a REAL codec in the loop — the last stubbed
    * modality closed the same way [[multimodalDecode]] closed image.
    * Each document id derives a small deterministic PCM clip — channels =
    * 1 + id%2 (mono/stereo), frames = 50 + id%64 at 8 kHz, sample value
    * for (frame f, channel c) = ((id·31 + f·7 + c·13) mod 65536) − 32768,
    * a signed 16-bit integer formula — which one `mapPartitions` pass
    * ENCODES to a real RIFF/WAVE payload (`javax.sound.sampled
    * .AudioSystem.write`, the JDK's built-in codec, no external library;
    * little-endian 16-bit PCM, interleaved) into the same opaque-binary
    * [[MediaRow]] column, and a second pass DECODES with
    * `AudioSystem.getAudioInputStream`, emitting per-clip format fields
    * (sample rate, channels, frame count, microsecond duration) and
    * content statistics (signed amplitude sum, energy sum, grid-rounded
    * RMS) computed from the DECODED bytes only.
    *
    * Verification logic (the [[multimodalDecodeSql]] precedent): DuckDB
    * cannot parse WAV, but it replays the sample FORMULA exactly — every
    * emitted quantity is integer arithmetic (or one sqrt of an exact
    * integer ratio, grid-rounded; IEEE sqrt/divide are correctly rounded
    * on both engines), so the hash matches iff the encode→WAV→decode
    * roundtrip reproduced every sample bit-for-bit, header fields
    * included. WAV byte length is deliberately not emitted (header
    * padding is codec detail; decoded content is the contract).
    *
    * Scale: payloads are born and die inside one scan partition — encode
    * and decode fuse into one no-shuffle stage before the final doc-grain
    * sort; like the PNG path, the clip table is NOT fanned out at fixture
    * scale (javax.sound's provider registry is also a global structure),
    * and real corpora arrive in many splits anyway. */
  def multimodalAudio(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, sfDir)
      .select(col("doc_id")).as[Long]
    decodeAudioStats(encodeWav(ids)).orderBy("doc_id")
  }

  /** Formula samples → real RIFF/WAVE bytes, per-partition codec.
    *
    * The writer is resolved ONCE per partition through the public
    * `javax.sound.sampled.spi.AudioFileWriter` service interface (the
    * JDK's WAVE writer provider): `AudioSystem.write` re-runs
    * synchronized provider discovery on EVERY call, which at sf1
    * (10 splits × 50k clips) measured as a lock convoy — amortizing
    * codec init per partition is the whole point of the mapPartitions
    * batch shape, so do it for the lookup too. */
  private[graft] def encodeWav(
      ids: org.apache.spark.sql.Dataset[Long]): org.apache.spark.sql.Dataset[MediaRow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions { it =>
      import scala.jdk.CollectionConverters._
      val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
      val writer = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
        .iterator().asScala
        .find(_.isFileTypeSupported(wave))
        .getOrElse(sys.error("no WAVE AudioFileWriter provider"))
      it.map(id => MediaRow(id, wavPayload(writer, id), "audio/wav"))
    }
  }

  /** One id's formula clip as real RIFF/WAVE bytes (writer resolved once
    * per partition by every caller — the SPI-discovery lesson). */
  private[graft] def wavPayload(
      writer: javax.sound.sampled.spi.AudioFileWriter,
      id: Long): Array[Byte] = {
    val channels = 1 + (id % 2).toInt
    val nFrames = 50 + (id % 64).toInt
    val pcm = new Array[Byte](nFrames * channels * 2)
    var f = 0
    var j = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        val v = ((id * 31 + f.toLong * 7 + c.toLong * 13) % 65536 - 32768).toInt
        pcm(j) = (v & 0xff).toByte          // little-endian 16-bit PCM
        pcm(j + 1) = ((v >> 8) & 0xff).toByte
        j += 2
        c += 1
      }
      f += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f, 16, channels, /*signed=*/ true, /*bigEndian=*/ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    writer.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Parsed RIFF/WAVE container: PCM format fields + raw sample bytes. */
  private[graft] case class WavPcm(sampleRate: Long, channels: Int,
    data: Array[Byte])

  /** Explicit RIFF/WAVE chunk walk (the "44-byte PCM header parse" —
    * robust to extra chunks): validates the container magic, reads the
    * `fmt ` chunk (must be PCM, 16-bit, little-endian — the only format
    * [[encodeWav]] produces) and returns the `data` chunk bytes.
    *
    * Why not `AudioSystem.getAudioInputStream` here: every AudioSystem
    * entry point re-runs synchronized service-provider discovery, and at
    * sf1 (10 parquet splits × 50k clips) that lock convoy measured 21 s
    * where this parser + the spec's AudioSystem cross-check costs ~2 s —
    * the `javax.imageio` global-registry lesson repeated. The spec keeps
    * the REAL `javax.sound` reader in the verification loop by asserting
    * it decodes [[encodeWav]] payloads to the same stats this parser
    * reports. */
  private[graft] def parseWav(b: Array[Byte]): WavPcm = {
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    def tag(o: Int): String = new String(b.slice(o, o + 4), "US-ASCII")
    require(b.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a RIFF/WAVE container")
    var off = 12
    var fmt: Option[(Int, Long)] = None // (channels, sampleRate)
    var data: Array[Byte] = null
    while (off + 8 <= b.length && (fmt.isEmpty || data == null)) {
      val (id, sz) = (tag(off), u32(off + 4).toInt)
      if (id == "fmt ") {
        require(u16(off + 8) == 1 && u16(off + 22) == 16,
          "expected 16-bit PCM")
        fmt = Some((u16(off + 10), u32(off + 12)))
      } else if (id == "data") {
        data = b.slice(off + 8, off + 8 + sz)
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    require(fmt.nonEmpty && data != null, "missing fmt/data chunk")
    WavPcm(fmt.get._2, fmt.get._1, data)
  }

  /** Decode an opaque WAV payload column: format fields from the parsed
    * container header, content statistics from the decoded samples. */
  private[graft] def decodeAudioStats(
      encoded: org.apache.spark.sql.Dataset[MediaRow]): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    encoded.mapPartitions { rows =>
      rows.map { r =>
        val wav = parseWav(r.payload)
        val (bytes, channels, rate) = (wav.data, wav.channels, wav.sampleRate)
        val nSamples = bytes.length / 2
        val nFrames = nSamples / channels
        var sumAmp = 0L
        var sumSq = 0L
        var i = 0
        while (i < nSamples) {
          val v = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff))
            .toShort.toLong
          sumAmp += v
          sumSq += v * v
          i += 1
        }
        def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
        AudioStats(r.doc_id, rate, channels.toLong, nFrames.toLong,
          nFrames.toLong * 1000000L / rate, sumAmp, sumSq,
          r4(math.sqrt(sumSq.toDouble / nSamples)))
      }
    }.toDF()
  }

  /** The sample formula replayed relationally — matches iff the WAV
    * roundtrip above is bit-exact (header fields AND every sample). */
  val multimodalAudioSql: String =
    """WITH d AS (
      |  SELECT doc_id, 1 + doc_id % 2 AS ch, 50 + doc_id % 64 AS nf
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, ch, nf, unnest(range(0, nf * ch)) AS i FROM d),
      |v AS (
      |  SELECT doc_id, ch, nf,
      |    (doc_id * 31 + (i // ch) * 7 + (i % ch) * 13) % 65536 - 32768 AS a
      |  FROM s)
      |SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
      |  CAST(ch AS BIGINT) AS channels, CAST(nf AS BIGINT) AS n_frames,
      |  CAST(nf * 125 AS BIGINT) AS duration_us,
      |  CAST(SUM(a) AS BIGINT) AS sum_amp,
      |  CAST(SUM(a * a) AS BIGINT) AS sum_sq,
      |  floor(sqrt(CAST(SUM(a * a) AS DOUBLE) / (nf * ch)) * 10000 + 0.5)
      |    / 10000 AS rms
      |FROM v GROUP BY doc_id, ch, nf ORDER BY doc_id""".stripMargin

  /** Per-sampled-frame statistics out of a decoded video container. */
  case class VideoFrameStats(doc_id: Long, n_frames: Long, width: Long,
    height: Long, frame_idx: Long, pix_sum: Long, pix_mean: Double)

  /** VIDEO decode with a REAL codec in the loop — the JDK's multi-frame
    * (animated) GIF reader/writer (`GIF89a`), closing the last modality
    * that had only a byte-stat stand-in. Each document id derives a short
    * deterministic clip — frames = 3 + id%6, width = 8 + id%5, height =
    * 6 + id%4, gray value of pixel p in frame f =
    * (id·13 + f·17 + p·5) mod 256 — which one `mapPartitions` pass
    * ENCODES as a genuine animated GIF (`prepareWriteSequence` /
    * `writeToSequence`; 256-level grayscale maps onto GIF's 8-bit
    * palette losslessly), and a second pass DECODES, emitting the frame
    * count from the parsed container and per-frame pixel stats for the
    * SAMPLED frames only — first / middle / last, [[mediaFrames]]'s
    * sampling geometry, decoding nothing else (the point of
    * frame-sampling: a 2-hour clip costs three frame decodes, not ten
    * thousand).
    *
    * Codec plumbing follows the measured SPI lesson
    * ([[encodeWav]]/[[parseWav]]): `ImageIO.getImageWriters...` rescans
    * a synchronized registry per call, so the GIF writer/reader are
    * resolved ONCE per partition and reused across rows.
    *
    * Verification: the oracle replays the pixel formula, so the hash
    * matches iff the GIF roundtrip reproduced every sampled pixel AND
    * the container's frame count bit-exactly. */
  def multimodalVideo(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, sfDir)
      .select(col("doc_id")).as[Long]
    decodeFrameStats(encodeGif(ids)).orderBy("doc_id", "frame_idx")
  }

  /** Formula frames → one real animated GIF per id, per-partition codec. */
  private[graft] def encodeGif(
      ids: org.apache.spark.sql.Dataset[Long]): org.apache.spark.sql.Dataset[MediaRow] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions { it =>
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      it.map(id => MediaRow(id, gifPayload(writer, id), "video/gif"))
    }
  }

  /** One id's formula frames as one real animated GIF (writer reused
    * across rows — resolved once per partition by every caller). */
  private[graft] def gifPayload(writer: javax.imageio.ImageWriter,
      id: Long): Array[Byte] = {
    val w = 8 + (id % 5).toInt
    val h = 6 + (id % 4).toInt
    val nFrames = 3 + (id % 6).toInt
    val bos = new java.io.ByteArrayOutputStream()
    // direct memory-backed stream: the ImageIO.create*Stream factories
    // registry-scan per call AND default to a TEMP-FILE cache per image
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = ((id * 13 + f.toLong * 17 +
            (y.toLong * w + x) * 5) % 256).toInt
          img.getRaster.setSample(x, y, 0, g)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    bos.toByteArray
  }

  /** Real multi-frame decode: container-reported frame count + stats for
    * the first/middle/last frames ONLY (random-access `read(idx)`). */
  private[graft] def decodeFrameStats(
      encoded: org.apache.spark.sql.Dataset[MediaRow]): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    encoded.mapPartitions { rows =>
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("gif").next()
      rows.flatMap { r =>
        reader.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(r.payload)))
        val n = reader.getNumImages(true)
        Seq(0, n / 2, n - 1).distinct.map { idx =>
          val img = reader.read(idx)
          val (w, h) = (img.getWidth, img.getHeight)
          var s = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              s += img.getRGB(x, y) & 0xff // gray: any channel
              x += 1
            }
            y += 1
          }
          def r4(v: Double) = math.floor(v * 10000 + 0.5) / 10000
          VideoFrameStats(r.doc_id, n.toLong, w.toLong, h.toLong,
            idx.toLong, s, r4(s.toDouble / (w * h)))
        }
      }
    }.toDF()
  }

  /** The frame formula replayed relationally — matches iff the animated
    * GIF roundtrip above is bit-exact on every sampled frame. */
  val multimodalVideoSql: String =
    """WITH d AS (
      |  SELECT doc_id, 3 + doc_id % 6 AS f, 8 + doc_id % 5 AS w,
      |    6 + doc_id % 4 AS h
      |  FROM documents),
      |fr AS (
      |  SELECT doc_id, f, w, h,
      |    unnest(list_distinct([0, f // 2, f - 1])) AS idx
      |  FROM d),
      |px AS (
      |  SELECT doc_id, f, w, h, idx, unnest(range(0, w * h)) AS p FROM fr),
      |v AS (
      |  SELECT doc_id, f, w, h, idx,
      |    (doc_id * 13 + idx * 17 + p * 5) % 256 AS g
      |  FROM px)
      |SELECT doc_id, CAST(f AS BIGINT) AS n_frames,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(idx AS BIGINT) AS frame_idx,
      |  CAST(SUM(g) AS BIGINT) AS pix_sum,
      |  floor(CAST(SUM(g) AS DOUBLE) / (w * h) * 10000 + 0.5) / 10000
      |    AS pix_mean
      |FROM v GROUP BY doc_id, f, w, h, idx
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Shares [[multimodalFeaturesSql]]'s ASCII parity contract (byte ==
    * codepoint on this fixture). */
  val mediaFramesSql: String = {
    val chunkSum = (off: String, len: String) =>
      s"CAST(list_sum(list_transform(regexp_extract_all(substr(text, $off, $len), '.', 0, 's'), c -> ascii(c))) AS BIGINT)"
    s"""WITH d AS (
      |  SELECT doc_id, text, strlen(text) AS n,
      |    greatest(1, CAST(ceil(strlen(text) / 64.0) AS BIGINT)) AS stride,
      |    CAST(ceil(strlen(text) / 256.0) AS BIGINT) AS n_frames
      |  FROM documents),
      |thumb AS (
      |  SELECT doc_id, 'thumb' AS kind, CAST(0 AS BIGINT) AS idx,
      |    CAST(0 AS BIGINT) AS off,
      |    CAST(ceil(CAST(n AS DOUBLE) / stride) AS BIGINT) AS len,
      |    CAST(COALESCE(list_sum(list_transform(
      |      range(0, CAST(ceil(CAST(n AS DOUBLE) / stride) AS BIGINT)),
      |      i -> ascii(substr(text, CAST(1 + i * stride AS INT), 1)))), 0)
      |      AS BIGINT) AS byte_sum
      |  FROM d),
      |fidx AS (
      |  SELECT doc_id, text, n, n_frames, unnest(list_distinct(
      |    [0, n_frames // 2, n_frames - 1])) AS f
      |  FROM d),
      |frames AS (
      |  SELECT doc_id, 'frame' AS kind, CAST(f AS BIGINT) AS idx,
      |    CAST(f * 256 AS BIGINT) AS off,
      |    CAST(least(256, n - f * 256) AS BIGINT) AS len,
      |    ${chunkSum("CAST(f * 256 + 1 AS INT)", "CAST(least(256, n - f * 256) AS INT)")} AS byte_sum
      |  FROM fidx
      |  -- an empty payload has no frames: drop the {0, -1} candidates
      |  WHERE f >= 0 AND f < n_frames)
      |SELECT * FROM thumb
      |UNION ALL
      |SELECT * FROM frames
      |ORDER BY doc_id, kind, idx""".stripMargin
  }

  /** The mixed-mime dispatcher's oracle: a 3-way CASE over the three
    * formula replays ([[multimodalDecodeSql]] / [[multimodalAudioSql]] /
    * [[multimodalVideoSql]]'s pixel/sample/frame formulas), each branch
    * filtered to its doc_id%3 slice and projected into the unified
    * feature shape — the hash matches iff every per-mime real-codec
    * roundtrip is bit-exact. */
  val multimodalFeaturesSql: String =
    """WITH png_d AS (
      |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |png_v AS (
      |  SELECT doc_id, w, h,
      |    (doc_id * 7 + p * 3) % 256 + (doc_id * 7 + p * 3 + 11) % 256
      |      + (doc_id * 7 + p * 3 + 22) % 256 AS rgb
      |  FROM (SELECT doc_id, w, h, unnest(range(0, w * h)) AS p FROM png_d)),
      |png AS (
      |  SELECT doc_id, 'image/png' AS mime, CAST(w AS BIGINT) AS width,
      |    CAST(h AS BIGINT) AS height, CAST(1 AS BIGINT) AS n_frames,
      |    CAST(0 AS BIGINT) AS sample_rate,
      |    CAST(SUM(rgb) AS BIGINT) AS content_sum,
      |    floor(CAST(SUM(rgb) AS DOUBLE) / (3 * w * h) * 10000 + 0.5) / 10000
      |      AS content_mean
      |  FROM png_v GROUP BY doc_id, w, h),
      |wav_d AS (
      |  SELECT doc_id, 1 + doc_id % 2 AS ch, 50 + doc_id % 64 AS nf
      |  FROM documents WHERE doc_id % 3 = 1),
      |wav_v AS (
      |  SELECT doc_id, ch, nf,
      |    (doc_id * 31 + (i // ch) * 7 + (i % ch) * 13) % 65536 - 32768 AS a
      |  FROM (SELECT doc_id, ch, nf, unnest(range(0, nf * ch)) AS i FROM wav_d)),
      |wav AS (
      |  SELECT doc_id, 'audio/wav' AS mime, CAST(0 AS BIGINT) AS width,
      |    CAST(0 AS BIGINT) AS height, CAST(nf AS BIGINT) AS n_frames,
      |    CAST(8000 AS BIGINT) AS sample_rate,
      |    CAST(SUM(a) AS BIGINT) AS content_sum,
      |    floor(CAST(SUM(a) AS DOUBLE) / (nf * ch) * 10000 + 0.5) / 10000
      |      AS content_mean
      |  FROM wav_v GROUP BY doc_id, ch, nf),
      |gif_d AS (
      |  SELECT doc_id, 3 + doc_id % 6 AS f, 8 + doc_id % 5 AS w,
      |    6 + doc_id % 4 AS h,
      |    len(list_distinct([0, (3 + doc_id % 6) // 2, 2 + doc_id % 6]))
      |      AS n_sampled
      |  FROM documents WHERE doc_id % 3 = 2),
      |gif_v AS (
      |  SELECT doc_id, f, w, h, n_sampled,
      |    (doc_id * 13 + idx * 17 + p * 5) % 256 AS g
      |  FROM (SELECT doc_id, f, w, h, n_sampled,
      |          unnest(list_distinct([0, f // 2, f - 1])) AS idx
      |        FROM gif_d),
      |    LATERAL (SELECT unnest(range(0, w * h)) AS p)),
      |gif AS (
      |  SELECT doc_id, 'video/gif' AS mime, CAST(w AS BIGINT) AS width,
      |    CAST(h AS BIGINT) AS height, CAST(f AS BIGINT) AS n_frames,
      |    CAST(0 AS BIGINT) AS sample_rate,
      |    CAST(SUM(g) AS BIGINT) AS content_sum,
      |    floor(CAST(SUM(g) AS DOUBLE) / (n_sampled * w * h) * 10000 + 0.5)
      |      / 10000 AS content_mean
      |  FROM gif_v GROUP BY doc_id, f, w, h, n_sampled)
      |SELECT * FROM png UNION ALL SELECT * FROM wav UNION ALL
      |SELECT * FROM gif ORDER BY doc_id""".stripMargin

  /** A 64-bit perceptual-hash signature split into four 16-bit LSH bands
    * (dHash for images, envelope-gradient hash for audio). */
  case class HashBands(doc_id: Long, b0: Long, b1: Long, b2: Long, b3: Long)

  /** Default hamming threshold for the perceptual-hash near-dup pair —
    * one constant shared by the Scala defaults (batch AND the streaming
    * ingest-edge form) and every oracle string, so no side can silently
    * diverge.
    *
    * RECALL CONTRACT (read before passing a custom `maxHamming`): the
    * four 16-bit bands guarantee a shared band — and therefore candidate
    * generation — only for pairs with hamming ≤ bands−1 = 3 (pigeonhole).
    * Pairs at hamming 4..maxHamming are emitted ONLY if their differing
    * bits happen to leave some band intact; a pair whose 4+ flipped bits
    * spread across all four bands is silently missed. So the output is
    * "all pairs ≤ 3, plus the ≤ maxHamming pairs that collide in a band",
    * not an exhaustive ≤ maxHamming enumeration — the standard LSH trade.
    * For exhaustive recall at a higher radius, raise the band count so
    * bands−1 ≥ the target (at matching Σ bucket² join cost). The fixtures'
    * planted edits flip ≤ 4 bits inside ONE band, so family recall is
    * total here; the threshold 6 exists to also admit the genuinely-near
    * cross-family tail that the eval queries measure precision against. */
  private[graft] val DefaultMaxHamming = 6

  /** The dHash banding arithmetic shared by every 18×16 grid hash
    * ([[imageSignature]]'s r+g+b intensity, [[videoDedup]]'s gray
    * channel): 2×2 block sums under `gray`, gradient-sign bits, four
    * 16-bit bands. One copy so a band-width or bit-order change cannot
    * diverge the modalities from their shared [[bandPairs]] verify. */
  private def gridBands(id: Long, img: java.awt.image.BufferedImage,
      gray: Int => Long): HashBands = {
    val bsum = Array.ofDim[Long](8, 9) // [by][bx]
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 18) {
        bsum(y / 2)(x / 2) += gray(img.getRGB(x, y))
        x += 1
      }
      y += 1
    }
    val bands = Array.fill(4)(0L)
    var k = 0
    while (k < 64) {
      val by = k / 8
      val bx = k % 8
      if (bsum(by)(bx + 1) > bsum(by)(bx)) bands(k / 16) |= 1L << (k % 16)
      k += 1
    }
    HashBands(id, bands(0), bands(1), bands(2), bands(3))
  }

  /** The [[bandPairs]] relational tail in oracle SQL — band pivot →
    * signature pivot → band-equality candidates → exact hamming verify —
    * shared verbatim by [[imageDedupSql]] and [[audioDedupSql]]; expects
    * an upstream CTE `bit(doc_id, k, bit)`. */
  private def bandPairsSqlTail(maxHamming: Int): String =
    s"""bands AS (
      |  SELECT doc_id, k // 16 AS band_idx,
      |    CAST(SUM(bit * CAST(pow(2, k % 16) AS BIGINT)) AS BIGINT)
      |      AS band_val
      |  FROM bit GROUP BY 1, 2),
      |sig AS (
      |  SELECT doc_id,
      |    MAX(CASE WHEN band_idx = 0 THEN band_val END) AS b0,
      |    MAX(CASE WHEN band_idx = 1 THEN band_val END) AS b1,
      |    MAX(CASE WHEN band_idx = 2 THEN band_val END) AS b2,
      |    MAX(CASE WHEN band_idx = 3 THEN band_val END) AS b3
      |  FROM bands GROUP BY doc_id),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
      |   AND a.doc_id < b.doc_id),
      |ham AS (
      |  SELECT c.doc_a, c.doc_b,
      |    CAST(bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
      |       + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
      |      AS BIGINT) AS hamming
      |  FROM cand c
      |  JOIN sig sa ON sa.doc_id = c.doc_a
      |  JOIN sig sb ON sb.doc_id = c.doc_b)
      |SELECT doc_a, doc_b, hamming FROM ham
      |WHERE hamming <= $maxHamming ORDER BY doc_a, doc_b""".stripMargin

  /** The shared banded-LSH near-dup tail: explode the four (band_idx,
    * band_val) keys, equi-join (candidates ∝ Σ bucket², never all-pairs),
    * verify exactly via hamming = Σ bit_count(xor(band_i)) on the carried
    * signatures. Any pair within hamming 3 of 64 always shares a band
    * (pigeonhole), so single-block-edit families are found with total
    * recall. */
  private def bandPairs(sig: DataFrame, maxHamming: Int): DataFrame = {
    val bands = sig.select(col("doc_id"),
      col("b0"), col("b1"), col("b2"), col("b3"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band_idx", "band_val")))
    val hamming = (0 until 4).map(i =>
        call_function("bit_count",
          col(s"a.b$i").bitwiseXOR(col(s"b.b$i"))).cast("long"))
      .reduce(_ + _)
    bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming.as("hamming"))
      .where(col("hamming") <= maxHamming)
      // a pair sharing several bands appears once per shared band; the
      // hamming is the same on every copy, so min() is pure dedup
      .groupBy("doc_a", "doc_b").agg(min("hamming").as("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  /** Perceptual-hash near-duplicate detection over REAL PNG payloads —
    * the image-modality member of the near-dup family ([[graft.operators
    * .Dedup]] covers text MinHash/SimHash/Jaccard and embedding cosine;
    * a multimodal corpus needs the same verb on its image column).
    *
    * Pipeline (the standard dHash shape): each doc id derives an 18×16
    * grayscale image — value(p) = 10 + (((fam % 1000003)·(p²+17) + 11p +
    * pert) % 1000003) % 231 with fam = doc_id/4, and variants v = doc_id%4 > 0
    * perturbing the single pixel p = 96+v by +115 (a small localized edit:
    * the near-duplicate fixture) — which one `mapPartitions` pass ENCODES
    * to a real PNG ([[pngPayload]]'s writer discipline: codec resolved
    * once per partition, memory-backed streams) and immediately DECODES
    * with the real reader; the perceptual hash is computed from DECODED
    * pixels only: 2×2 block sums of gray = r+g+b on the 9×8 grid, then
    * dHash bit k = [blocksum(bx+1,by) > blocksum(bx,by)] (brightness- and
    * contrast-shift invariant), packed into FOUR 16-bit bands.
    *
    * Candidate generation is banded LSH, never all-pairs: explode the 4
    * (band_idx, band_val) keys, equi-join on them (hamming ≤ 3·bits-per-
    * band guarantees a shared band by pigeonhole — here any pair within
    * hamming 3 of 64 is always found, and the fixture's single-pixel edits
    * stay ≤ 4 bits all inside one band, so family recall is total), then
    * verify candidates exactly: hamming = Σ bit_count(xor(band_i)) over
    * the carried signatures, threshold `maxHamming`.
    *
    * Scale: payloads are born and die inside the scan partition (encode +
    * decode + hash fuse into one no-shuffle stage); only 5-long signature
    * rows shuffle. Join cost ∝ Σ bucket² per band — at larger corpora
    * widen the bands (more bits ⇒ smaller buckets, the
    * [[graft.operators.Dedup.dedupEmbeddingLsh]] sizing rule) and recover
    * recall with more bands. Verification: the oracle replays pixel
    * formula → block sums → bit packing → the SAME band join relationally,
    * so the hash matches iff the PNG roundtrip is bit-exact AND the LSH
    * candidate set and hamming arithmetic agree. */
  def imageDedup(spark: SparkSession, sfDir: String,
      maxHamming: Int = DefaultMaxHamming): DataFrame =
    bandPairs(imageSigs(spark, sfDir), maxHamming)

  /** Every doc's image signature — the one encode→decode→hash scan stage,
    * shared by the batch self-dedup ([[imageDedup]]) and the incremental
    * batch-vs-base form ([[imageDedupIncremental]]). */
  private def imageSigs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    imageSigsOf(Tables.documents(spark, sfDir).select(col("doc_id")).as[Long])
  }

  /** The image signature scan over an arbitrary id set — lets the
    * incremental form decode ONLY its batch stripe while the base
    * arrives as the staged signature table. */
  private def imageSigsOf(ids: Dataset[Long]): DataFrame = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("png").next()
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("png").next()
        it.map(id => imageSignature(writer, reader, id))
      }.toDF()
  }

  /** One id's dHash signature: fixture PNG encode, REAL decode, 2×2 block
    * sums of gray (r+g+b) on the 9×8 grid, gradient-sign bits in four
    * 16-bit bands. Shared by the batch [[imageDedup]] and the streaming
    * ingest-edge form ([[graft.streaming.Streaming.mediaDedupStream]]) so
    * both sides run the identical arithmetic. */
  private[graft] def imageSignature(writer: javax.imageio.ImageWriter,
      reader: javax.imageio.ImageReader, id: Long): HashBands = {
    val payload = dhashPayload(writer, id)
    reader.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload)))
    val img = reader.read(0)
    // decoded gray = r+g+b per pixel over the shared banding arithmetic
    gridBands(id, img,
      p => ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff))
  }

  /** One id's dHash fixture grid as real PNG bytes (18×16, r=g=b). */
  private[graft] def dhashPayload(writer: javax.imageio.ImageWriter,
      id: Long): Array[Byte] = {
    val fam = id / 4
    val v = id % 4
    val img = new java.awt.image.BufferedImage(
      18, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < 288) {
      val base = (fam % 1000003L) * (p.toLong * p + 17) + 11L * p
      val pert = if (v > 0 && p == 96 + v) 115L else 0L
      // the intermediate mod 1000003 (prime > any family count) keeps the
      // pattern a function of the FULL family id: reducing straight to 231
      // would collapse fam to fam mod 231 — families 231 apart would emit
      // IDENTICAL images, an unintended exact-dup class whose pair count
      // grows quadratically (measured: 52k pairs at sf0.1 vs 7.5k real)
      val value = (10L + ((base + pert) % 1000003L) % 231).toInt
      img.setRGB(p % 18, p / 18, (value << 16) | (value << 8) | value)
      p += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(img)
    ios.close()
    bos.toByteArray
  }

  /** The dHash pipeline replayed relationally — pixel formula → block
    * sums → bit packing → the SAME banded-LSH candidate join → exact
    * hamming verify. Matches iff the PNG roundtrip is bit-exact and the
    * LSH semantics agree. */
  // lazy: the bit-CTE prefix is declared below (an eager val would null-init)
  lazy val imageDedupSql: String = imageBitCte + bandPairsSqlTail(DefaultMaxHamming)

  /** The image dHash bit pipeline as a WITH prefix (ends at the `bit`
    * CTE) — shared by the self-dedup and incremental oracles. */
  private val imageBitCte: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id // 4 AS fam, doc_id % 4 AS v FROM documents),
      |px AS (
      |  SELECT doc_id, fam, v, unnest(range(0, 288)) AS p FROM d),
      |val AS (
      |  SELECT doc_id, p,
      |    10 + (((fam % 1000003) * (p * p + 17) + 11 * p
      |          + CASE WHEN v > 0 AND p = 96 + v THEN 115 ELSE 0 END)
      |          % 1000003) % 231 AS val
      |  FROM px),
      |blk AS (
      |  SELECT doc_id, (p % 18) // 2 AS bx, (p // 18) // 2 AS by,
      |    SUM(3 * val) AS bsum
      |  FROM val GROUP BY 1, 2, 3),
      |bit AS (
      |  SELECT l.doc_id, l.by * 8 + l.bx AS k,
      |    CASE WHEN r.bsum > l.bsum THEN 1 ELSE 0 END AS bit
      |  FROM blk l JOIN blk r
      |    ON r.doc_id = l.doc_id AND r.by = l.by AND r.bx = l.bx + 1
      |  WHERE l.bx < 8),
      |""".stripMargin

  /** Audio near-duplicate detection over REAL RIFF/WAVE payloads — the
    * audio-modality member of the near-dup family, closing the verb
    * across all corpus modalities (text / embedding / image / audio).
    *
    * Fingerprint (the envelope-gradient shape — [[imageDedup]]'s dHash
    * analog on the time axis): each doc id derives a 520-frame mono 8 kHz
    * clip — amp(f) = (((fam % 1000003)·(f²+29) + 17f + pert) % 1000003)
    * % 65536 − 32768 with fam = doc_id/4 (the intermediate prime mod
    * keeps the waveform a function of the FULL family id — the
    * [[dhashPayload]] lesson), variants v = doc_id%4 > 0 perturbing the
    * single sample f = 200+v by +9999 (a click/edit: the near-duplicate
    * fixture). One `mapPartitions` pass ENCODES each clip through the
    * real `javax.sound` WAV writer (SPI resolved once per partition) and
    * immediately DECODES via the RIFF chunk walk ([[parseWav]]); the
    * fingerprint is computed from DECODED samples only: 65 windows of 8
    * samples, window energy = Σ|amp|, bit k = [energy(k+1) > energy(k)]
    * (gain-shift invariant the way dHash is brightness-invariant),
    * packed into four 16-bit bands. The single-sample edits land in ONE
    * window → ≤ 2 flipped bits, all in band 1 → total family recall via
    * [[bandPairs]], exact hamming verify.
    *
    * Scale: identical to [[imageDedup]] — payloads fuse encode→decode→
    * hash inside the scan partition, only 5-long signature rows shuffle,
    * candidates ∝ Σ bucket² per band. Verification: the oracle replays
    * sample formula → window energies → bit packing → the SAME band
    * join, so a hash match proves the WAV roundtrip bit-exact AND the
    * LSH semantics agree. */
  def audioDedup(spark: SparkSession, sfDir: String,
      maxHamming: Int = DefaultMaxHamming): DataFrame =
    bandPairs(audioSigs(spark, sfDir), maxHamming)

  /** Every doc's audio signature — shared scan stage ([[imageSigs]]'
    * contract for the WAV envelope hash). */
  private def audioSigs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    audioSigsOf(Tables.documents(spark, sfDir).select(col("doc_id")).as[Long])
  }

  /** [[imageSigsOf]]' contract for the WAV envelope hash. */
  private def audioSigsOf(ids: Dataset[Long]): DataFrame = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
        import scala.jdk.CollectionConverters._
        val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
        val writer = java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
          .iterator().asScala
          .find(_.isFileTypeSupported(wave))
          .getOrElse(sys.error("no WAVE AudioFileWriter provider"))
        it.map(id => audioSignature(writer, id))
      }.toDF()
  }

  /** One id's envelope-gradient signature: fixture WAV encode, REAL
    * RIFF-chunk-walk decode, 65 window energies over the decoded samples
    * (8 frames/window), gradient-sign bits in four 16-bit bands. Shared
    * by the batch [[audioDedup]] and the streaming ingest-edge form
    * ([[graft.streaming.Streaming.mixedMediaDedupStream]]) so both sides
    * run the identical arithmetic. */
  private[graft] def audioSignature(
      writer: javax.sound.sampled.spi.AudioFileWriter, id: Long): HashBands = {
    val payload = envelopePayload(writer, id)
    val pcm = parseWav(payload).data
    // 65 window energies over the decoded samples (8 frames/window)
    val e = new Array[Long](65)
    var f = 0
    while (f < 520) {
      val a = (((pcm(2 * f + 1) & 0xff) << 8) | (pcm(2 * f) & 0xff))
        .toShort.toLong
      e(f / 8) += math.abs(a)
      f += 1
    }
    val bands = Array.fill(4)(0L)
    var k = 0
    while (k < 64) {
      if (e(k + 1) > e(k)) bands(k / 16) |= 1L << (k % 16)
      k += 1
    }
    HashBands(id, bands(0), bands(1), bands(2), bands(3))
  }

  /** One id's envelope fixture clip as real RIFF/WAVE bytes (mono,
    * 520 frames, 16-bit PCM at 8 kHz). */
  private[graft] def envelopePayload(
      writer: javax.sound.sampled.spi.AudioFileWriter,
      id: Long): Array[Byte] = {
    val fam = id / 4
    val v = id % 4
    val pcm = new Array[Byte](520 * 2)
    var f = 0
    while (f < 520) {
      val base = (fam % 1000003L) * (f.toLong * f + 29) + 17L * f
      val pert = if (v > 0 && f == 200 + v) 9999L else 0L
      val a = (((base + pert) % 1000003L) % 65536L - 32768L).toInt
      pcm(2 * f) = (a & 0xff).toByte
      pcm(2 * f + 1) = ((a >> 8) & 0xff).toByte
      f += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f, 16, 1, /*signed=*/ true, /*bigEndian=*/ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 520L)
    val bos = new java.io.ByteArrayOutputStream()
    writer.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The envelope-hash pipeline replayed relationally — sample formula →
    * window energies → bit packing → the SAME banded-LSH candidate join →
    * exact hamming verify. */
  // lazy: the bit-CTE prefix is declared below (an eager val would null-init)
  lazy val audioDedupSql: String = audioBitCte + bandPairsSqlTail(DefaultMaxHamming)

  /** The audio envelope bit pipeline as a WITH prefix ([[imageBitCte]]'s
    * contract). */
  private val audioBitCte: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id // 4 AS fam, doc_id % 4 AS v FROM documents),
      |fr AS (
      |  SELECT doc_id, fam, v, unnest(range(0, 520)) AS f FROM d),
      |amp AS (
      |  SELECT doc_id, f,
      |    (((fam % 1000003) * (f * f + 29) + 17 * f
      |      + CASE WHEN v > 0 AND f = 200 + v THEN 9999 ELSE 0 END)
      |     % 1000003) % 65536 - 32768 AS a
      |  FROM fr),
      |win AS (
      |  SELECT doc_id, f // 8 AS w, SUM(abs(a)) AS e
      |  FROM amp GROUP BY 1, 2),
      |bit AS (
      |  SELECT l.doc_id, l.w AS k,
      |    CASE WHEN r.e > l.e THEN 1 ELSE 0 END AS bit
      |  FROM win l JOIN win r ON r.doc_id = l.doc_id AND r.w = l.w + 1
      |  WHERE l.w < 64),
      |""".stripMargin

  /** Video near-duplicate detection over REAL animated-GIF payloads —
    * the last modality of the near-dup family (text / embedding / image /
    * audio / video all now carry the verb).
    *
    * Fingerprint: frame-SAMPLED perceptual hash — each doc id derives a
    * 5-frame 18×16 grayscale clip (g(i,p) = (((fam % 1000003)·(p²+31) +
    * 7p + 53i + pert) % 1000003) % 231 + 10, fam = doc_id/4; variants
    * v = doc_id%4 > 0 edit the single pixel p = 96+v of the MIDDLE frame
    * by +115), one `mapPartitions` pass ENCODES the sequence through the
    * real JDK GIF writer and DECODES ONLY the middle frame
    * (`reader.read(2)` — the [[multimodalVideo]] frame-sampling economics:
    * a 2-hour clip costs one frame decode), then [[imageDedup]]'s dHash
    * on the decoded pixels and the shared [[bandPairs]] LSH verify.
    * Production variants hash several sampled frames and vote; the
    * single-frame form is the unit of that composition.
    *
    * Scale and verification: identical to [[imageDedup]] — payloads fuse
    * encode→decode→hash inside the scan partition (no binary crosses an
    * exchange, typed plan audit), oracle replays the middle-frame formula
    * through the SAME relational tail. */
  def videoDedup(spark: SparkSession, sfDir: String,
      maxHamming: Int = DefaultMaxHamming): DataFrame =
    bandPairs(videoSigs(spark, sfDir), maxHamming)

  /** Every doc's video signature — shared scan stage ([[imageSigs]]'
    * contract for the middle-frame GIF dHash). */
  private def videoSigs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    videoSigsOf(Tables.documents(spark, sfDir).select(col("doc_id")).as[Long])
  }

  /** [[imageSigsOf]]' contract for the middle-frame GIF dHash. */
  private def videoSigsOf(ids: Dataset[Long]): DataFrame = {
    import ids.sparkSession.implicits._
    ids.mapPartitions { it =>
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("gif").next()
        it.map(id => videoSignature(writer, reader, id))
      }.toDF()
  }

  /** One id's frame-sampled signature: fixture animated-GIF encode, REAL
    * random-access decode of ONLY the middle frame, dHash over the decoded
    * gray pixels. Shared by the batch [[videoDedup]] and the streaming
    * ingest-edge form
    * ([[graft.streaming.Streaming.mixedMediaDedupStream]]). */
  private[graft] def videoSignature(writer: javax.imageio.ImageWriter,
      reader: javax.imageio.ImageReader, id: Long): HashBands = {
    val payload = clipPayload(writer, id)
    reader.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload)))
    val img = reader.read(2) // middle of the 5 frames, random access
    gridBands(id, img, p => (p & 0xff).toLong) // single gray channel
  }

  /** Dedup-quality evaluation — precision/recall of [[imageDedup]]'s
    * banded-LSH pair set against the fixture's analytically-known ground
    * truth (the family structure: every intra-family pair IS a near-dup
    * by construction, every cross-family pair is not). The one-row report
    * a production pipeline puts on its dedup dashboard: found pairs,
    * true/false positives, and floor-gridded precision/recall — recall
    * 10000/10000 here because the fixture's edits keep three bands
    * intact, precision slightly under (the genuinely-near cross-family
    * tail the hamming threshold admits).
    *
    * Scale: the metric aggregation collapses the pair set to ONE row
    * before the single-row broadcast cross-attach of the truth count —
    * nothing pair-sized crosses a second exchange. */
  def imageDedupEval(spark: SparkSession, sfDir: String): DataFrame =
    dedupEvalOf(spark, sfDir, imageDedup(spark, sfDir))

  /** The one copy of the media dedup-quality metric: precision/recall of
    * a modality's banded-LSH pair set against the fixture's
    * analytically-known family truth. Shared by [[imageDedupEval]],
    * [[audioDedupEval]] and [[videoDedupEval]] so the three modality
    * dashboards measure their SIGNALS (dHash vs envelope hash vs
    * middle-frame dHash) under identical metric arithmetic — the signal
    * gap is the deliverable, not metric drift. Scale: the pair set
    * collapses to ONE row before the single-row broadcast cross-attach of
    * the truth count — nothing pair-sized crosses a second exchange. */
  private def dedupEvalOf(spark: SparkSession, sfDir: String,
      pairs: DataFrame): DataFrame = {
    val found = pairs
      .withColumn("tp",
        (expr("doc_a div 4") === expr("doc_b div 4")).cast("long"))
      .agg(count(lit(1)).as("n_found"), sum(col("tp")).as("true_positives"))
    // truth = sum over families of C(k,2); k counts EXISTING docs so a
    // partial tail family contributes its real pair count
    val truth = Tables.documents(spark, sfDir)
      .select(expr("doc_id div 4").as("fam"))
      .groupBy("fam").agg(count(lit(1)).as("k"))
      .agg(sum(expr("k * (k - 1) div 2")).as("n_true_pairs"))
    // empty denominators get a DEFINED value (vacuous 10000), not a NULL
    // the dashboard consumer would trip over — mirrored in the oracle
    found.crossJoin(broadcast(truth))
      .select(col("n_true_pairs"), col("n_found"), col("true_positives"),
        (col("n_found") - col("true_positives")).as("false_positives"),
        when(col("n_found") === 0, lit(10000L)).otherwise(
          floor(lit(10000.0) * col("true_positives") / col("n_found")))
          .cast("long").as("precision_e4"),
        when(col("n_true_pairs") === 0, lit(10000L)).otherwise(
          floor(lit(10000.0) * col("true_positives") / col("n_true_pairs")))
          .cast("long").as("recall_e4"))
  }

  /** The metric replayed over the SAME pair pipeline (the modality's full
    * dedup SQL as a subquery) plus the analytic truth count — the oracle
    * twin of [[dedupEvalOf]]. */
  private def dedupEvalSqlOf(pairsSql: String): String =
    s"""WITH found0 AS (SELECT * FROM ($pairsSql) f),
      |found AS (
      |  SELECT COUNT(*) AS n_found,
      |    SUM(CASE WHEN doc_a // 4 = doc_b // 4 THEN 1 ELSE 0 END)
      |      AS true_positives
      |  FROM found0),
      |truth AS (
      |  SELECT SUM(k * (k - 1) // 2) AS n_true_pairs
      |  FROM (SELECT doc_id // 4 AS fam, COUNT(*) AS k
      |        FROM documents GROUP BY 1))
      |SELECT CAST(t.n_true_pairs AS BIGINT) AS n_true_pairs,
      |  CAST(f.n_found AS BIGINT) AS n_found,
      |  CAST(f.true_positives AS BIGINT) AS true_positives,
      |  CAST(f.n_found - f.true_positives AS BIGINT) AS false_positives,
      |  CAST(CASE WHEN f.n_found = 0 THEN 10000
      |    ELSE floor(10000.0 * f.true_positives / f.n_found) END AS BIGINT)
      |    AS precision_e4,
      |  CAST(CASE WHEN t.n_true_pairs = 0 THEN 10000
      |    ELSE floor(10000.0 * f.true_positives / t.n_true_pairs) END
      |    AS BIGINT) AS recall_e4
      |FROM found f, truth t""".stripMargin

  val imageDedupEvalSql: String = dedupEvalSqlOf(imageDedupSql)

  /** [[imageDedupEval]]'s dashboard for the AUDIO deduper — measures the
    * envelope-gradient hash's signal quality under the shared metric, so
    * the envelope-vs-dHash recall gap is a table read, not a guess. The
    * WAV fixture's single-sample click flips ≤ 2 bits inside one window
    * band, so family recall is total here too; precision measures the
    * genuinely-near cross-family tail the threshold admits — the envelope
    * hash summarizes 8 samples per bit (vs dHash's 4 pixels), so its
    * cross-family collision tail is the number to watch. Measured at
    * sf0.1: precision 10000e-4 (zero false positives) vs image dHash's
    * 9976 and video middle-frame dHash's 9948 — on this fixture the
    * envelope signal is the CLEANEST of the three, recall 10000e-4 in
    * every modality. */
  def audioDedupEval(spark: SparkSession, sfDir: String): DataFrame =
    dedupEvalOf(spark, sfDir, audioDedup(spark, sfDir))

  val audioDedupEvalSql: String = dedupEvalSqlOf(audioDedupSql)

  /** [[imageDedupEval]]'s dashboard for the VIDEO deduper — the
    * middle-frame dHash's signal quality. The frame-sampling economics
    * ([[videoDedup]]: one decoded frame per clip) cost recall ONLY for
    * edits outside the sampled frame; the fixture plants its edit in the
    * middle frame, so recall here isolates the hash signal itself, and a
    * production multi-frame voter would only add to it. */
  def videoDedupEval(spark: SparkSession, sfDir: String): DataFrame =
    dedupEvalOf(spark, sfDir, videoDedup(spark, sfDir))

  /** One id's fixture clip as a real 5-frame animated GIF (18×16 gray,
    * sequence-encoded — writer reused across rows). */
  private[graft] def clipPayload(writer: javax.imageio.ImageWriter,
      id: Long): Array[Byte] = {
    val fam = id / 4
    val v = id % 4
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var i = 0
    while (i < 5) {
      val img = new java.awt.image.BufferedImage(
        18, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var p = 0
      while (p < 288) {
        val base = (fam % 1000003L) * (p.toLong * p + 31) + 7L * p + 53L * i
        val pert = if (v > 0 && i == 2 && p == 96 + v) 115L else 0L
        val g = (10L + ((base + pert) % 1000003L) % 231).toInt
        img.getRaster.setSample(p % 18, p / 18, 0, g)
        p += 1
      }
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
      i += 1
    }
    writer.endWriteSequence()
    ios.close()
    bos.toByteArray
  }

  /** The middle-frame dHash replayed relationally through the shared
    * band tail. */
  // lazy: the bit-CTE prefix is declared below (an eager val would null-init)
  lazy val videoDedupSql: String = videoBitCte + bandPairsSqlTail(DefaultMaxHamming)

  /** The video middle-frame bit pipeline as a WITH prefix
    * ([[imageBitCte]]'s contract). */
  private val videoBitCte: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id // 4 AS fam, doc_id % 4 AS v FROM documents),
      |px AS (
      |  SELECT doc_id, fam, v, unnest(range(0, 288)) AS p FROM d),
      |val AS (
      |  SELECT doc_id, p,
      |    10 + (((fam % 1000003) * (p * p + 31) + 7 * p + 53 * 2
      |          + CASE WHEN v > 0 AND p = 96 + v THEN 115 ELSE 0 END)
      |          % 1000003) % 231 AS val
      |  FROM px),
      |blk AS (
      |  SELECT doc_id, (p % 18) // 2 AS bx, (p // 18) // 2 AS by,
      |    SUM(val) AS bsum
      |  FROM val GROUP BY 1, 2, 3),
      |bit AS (
      |  SELECT l.doc_id, l.by * 8 + l.bx AS k,
      |    CASE WHEN r.bsum > l.bsum THEN 1 ELSE 0 END AS bit
      |  FROM blk l JOIN blk r
      |    ON r.doc_id = l.doc_id AND r.by = l.by AND r.bx = l.bx + 1
      |  WHERE l.bx < 8),
      |""".stripMargin

  // declared AFTER videoDedupSql — a val referencing a later val in the
  // same object would initialize to null
  val videoDedupEvalSql: String = dedupEvalSqlOf(videoDedupSql)

  /** Incremental media near-dup — [[graft.operators.Dedup.dedupIncremental]]'s
    * batch-vs-base verb for the media modalities: a NEW payload batch
    * (`doc_id % 10 = 9`, the text form's convention) signature-hashes in
    * the scan stage and band-joins against the BASE signatures only — the
    * base NEVER self-joins (plan-audited), so a daily ingest pays
    * batch×base band-bucket work instead of re-paying the full corpus's
    * Σ bucket² (the batch dedupers remain the exhaustive reconciliation,
    * the reference's checker pattern). Since r15 the base side IS the
    * precomputed signature table ([[Staged]] — built once per corpus by
    * decoding the base stripe, then a bare parquet scan on every
    * ingest), and the batch side decodes ONLY its own stripe: an
    * incremental run's decode cost is batch-sized, matching the
    * retrieval family's persisted-base contract. Oracles still replay
    * both sides from the payload formulas, so a stale staged signature
    * table fails the gate loudly.
    *
    * Output matches the text form's presentation: one verdict per flagged
    * new doc — (new_id, kind, dup_of). `kind` = 'exact' when some base
    * signature is IDENTICAL (hamming 0 — the fingerprint the streaming
    * historical tier stores), else 'near' (0 < hamming ≤ maxHamming);
    * dup_of = the smallest qualifying base id (first-match, SURVEY §2
    * G3), with exact matches winning the kind. */
  private def mediaDedupIncrementalOf(batchSig: DataFrame,
      baseSig: DataFrame, maxHamming: Int): DataFrame = {
    def bands(sig: DataFrame) = sig.select(col("doc_id"),
      col("b0"), col("b1"), col("b2"), col("b3"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band_idx", "band_val")))
    val hamming = (0 until 4).map(i =>
        call_function("bit_count",
          col(s"a.b$i").bitwiseXOR(col(s"b.b$i"))).cast("long"))
      .reduce(_ + _)
    val cand = bands(batchSig).as("a")
      .join(bands(baseSig).as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val"))
      .select(col("a.doc_id").as("new_id"), col("b.doc_id").as("base_id"),
        hamming.as("hamming"))
      .where(col("hamming") <= maxHamming)
      // multi-band candidates repeat with identical hamming — pure dedup
      .groupBy("new_id", "base_id").agg(min("hamming").as("hamming"))
    val ex = cand.filter(col("hamming") === 0)
      .groupBy("new_id").agg(min("base_id").as("dup_of"))
      .withColumn("kind", lit("exact"))
    val nr = cand.join(ex.select("new_id"), Seq("new_id"), "left_anti")
      .groupBy("new_id").agg(min("base_id").as("dup_of"))
      .withColumn("kind", lit("near"))
    ex.select("new_id", "kind", "dup_of")
      .unionByName(nr.select("new_id", "kind", "dup_of"))
      .orderBy("new_id")
  }

  /** The ids of one stripe, filtered AT the parquet scan so the decode
    * stage only ever sees its own side. */
  private def stripeIds(spark: SparkSession, sfDir: String,
      batch: Boolean): Dataset[Long] = {
    import spark.implicits._
    val m = pmod(col("doc_id"), lit(10L))
    Tables.documents(spark, sfDir).select(col("doc_id"))
      .filter(if (batch) m === 9 else m =!= 9).as[Long]
  }

  /** The base stripe's signature table, decoded ONCE per corpus and
    * staged ([[Staged]]'s content-keyed atomic publish) — the
    * "precomputed signature table the batch probes" every incremental
    * ingest reads as a bare parquet scan. */
  private def stagedBaseSigs(spark: SparkSession, sfDir: String,
      modality: String)(build: => DataFrame): DataFrame =
    Staged.parquet(spark,
      s"media_sigs_v1/${Staged.dirKey(sfDir)}_$modality")(build)

  /** [[mediaDedupIncrementalOf]] over the image dHash signatures. */
  def imageDedupIncremental(spark: SparkSession, sfDir: String,
      maxHamming: Int = DefaultMaxHamming): DataFrame =
    mediaDedupIncrementalOf(
      imageSigsOf(stripeIds(spark, sfDir, batch = true)),
      stagedBaseSigs(spark, sfDir, "image")(
        imageSigsOf(stripeIds(spark, sfDir, batch = false))),
      maxHamming)

  /** [[mediaDedupIncrementalOf]] over the audio envelope signatures. */
  def audioDedupIncremental(spark: SparkSession, sfDir: String,
      maxHamming: Int = DefaultMaxHamming): DataFrame =
    mediaDedupIncrementalOf(
      audioSigsOf(stripeIds(spark, sfDir, batch = true)),
      stagedBaseSigs(spark, sfDir, "audio")(
        audioSigsOf(stripeIds(spark, sfDir, batch = false))),
      maxHamming)

  /** [[mediaDedupIncrementalOf]] over the video middle-frame signatures. */
  def videoDedupIncremental(spark: SparkSession, sfDir: String,
      maxHamming: Int = DefaultMaxHamming): DataFrame =
    mediaDedupIncrementalOf(
      videoSigsOf(stripeIds(spark, sfDir, batch = true)),
      stagedBaseSigs(spark, sfDir, "video")(
        videoSigsOf(stripeIds(spark, sfDir, batch = false))),
      maxHamming)

  /** The asymmetric (batch probes base) relational tail — the oracle twin
    * of [[mediaDedupIncrementalOf]]; expects the modality's `bit` CTE
    * upstream ([[imageBitCte]]'s contract). */
  private def incrementalSqlTail(maxHamming: Int): String =
    s"""bands AS (
      |  SELECT doc_id, k // 16 AS band_idx,
      |    CAST(SUM(bit * CAST(pow(2, k % 16) AS BIGINT)) AS BIGINT)
      |      AS band_val
      |  FROM bit GROUP BY 1, 2),
      |sig AS (
      |  SELECT doc_id,
      |    MAX(CASE WHEN band_idx = 0 THEN band_val END) AS b0,
      |    MAX(CASE WHEN band_idx = 1 THEN band_val END) AS b1,
      |    MAX(CASE WHEN band_idx = 2 THEN band_val END) AS b2,
      |    MAX(CASE WHEN band_idx = 3 THEN band_val END) AS b3
      |  FROM bands GROUP BY doc_id),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS base_id
      |  FROM bands a JOIN bands b
      |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
      |  WHERE a.doc_id % 10 = 9 AND b.doc_id % 10 <> 9),
      |ham AS (
      |  SELECT c.new_id, c.base_id,
      |    CAST(bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
      |       + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
      |      AS BIGINT) AS hamming
      |  FROM cand c
      |  JOIN sig sa ON sa.doc_id = c.new_id
      |  JOIN sig sb ON sb.doc_id = c.base_id),
      |v AS (SELECT * FROM ham WHERE hamming <= $maxHamming),
      |ex AS (
      |  SELECT new_id, min(base_id) AS dup_of FROM v
      |  WHERE hamming = 0 GROUP BY 1),
      |nr AS (
      |  SELECT new_id, min(base_id) AS dup_of FROM v
      |  WHERE new_id NOT IN (SELECT new_id FROM ex) GROUP BY 1)
      |SELECT new_id, 'exact' AS kind, dup_of FROM ex
      |UNION ALL
      |SELECT new_id, 'near' AS kind, dup_of FROM nr
      |ORDER BY new_id""".stripMargin

  lazy val imageDedupIncrementalSql: String =
    imageBitCte + incrementalSqlTail(DefaultMaxHamming)
  lazy val audioDedupIncrementalSql: String =
    audioBitCte + incrementalSqlTail(DefaultMaxHamming)
  lazy val videoDedupIncrementalSql: String =
    videoBitCte + incrementalSqlTail(DefaultMaxHamming)

  /** [[dedupEvalOf]]'s dashboard for the INCREMENTAL form — per-new-doc
    * precision/recall against the fixture's family truth: a batch doc
    * should flag iff its family holds ≥ 1 base doc (every intra-family
    * pair is a near-dup by construction), and a flag is TRUE iff dup_of
    * landed inside the family. The same one-row collapse before the
    * broadcast truth attach. */
  private def incrDedupEvalOf(spark: SparkSession, sfDir: String,
      flags: DataFrame): DataFrame = {
    val m = flags
      .withColumn("tp",
        (expr("new_id div 4") === expr("dup_of div 4")).cast("long"))
      .agg(count(lit(1)).as("n_flagged"), sum(col("tp")).as("true_positives"))
    val docs = Tables.documents(spark, sfDir)
    val truth = docs.filter(pmod(col("doc_id"), lit(10L)) === 9)
      .select(expr("doc_id div 4").as("fam"))
      .join(docs.filter(pmod(col("doc_id"), lit(10L)) =!= 9)
        .select(expr("doc_id div 4").as("fam")).distinct(), Seq("fam"),
        "left_semi")
      .agg(count(lit(1)).as("n_truth"))
    m.crossJoin(broadcast(truth))
      .select(col("n_truth"), col("n_flagged"), col("true_positives"),
        (col("n_flagged") - col("true_positives")).as("false_positives"),
        when(col("n_flagged") === 0, lit(10000L)).otherwise(
          floor(lit(10000.0) * col("true_positives") / col("n_flagged")))
          .cast("long").as("precision_e4"),
        when(col("n_truth") === 0, lit(10000L)).otherwise(
          floor(lit(10000.0) * col("true_positives") / col("n_truth")))
          .cast("long").as("recall_e4"))
  }

  def imageDedupIncrEval(spark: SparkSession, sfDir: String): DataFrame =
    incrDedupEvalOf(spark, sfDir, imageDedupIncremental(spark, sfDir))

  /** The incremental dashboard for the audio and video modalities — the
    * same ONE metric helper, so the three incremental signals are
    * comparable the way the batch evals are. */
  def audioDedupIncrEval(spark: SparkSession, sfDir: String): DataFrame =
    incrDedupEvalOf(spark, sfDir, audioDedupIncremental(spark, sfDir))

  def videoDedupIncrEval(spark: SparkSession, sfDir: String): DataFrame =
    incrDedupEvalOf(spark, sfDir, videoDedupIncremental(spark, sfDir))

  /** The incremental metric replayed over the modality's full incremental
    * SQL — [[incrDedupEvalOf]]'s oracle twin. */
  private def incrDedupEvalSqlOf(flagsSql: String): String =
    s"""WITH flags AS (SELECT * FROM ($flagsSql) f),
      |m AS (
      |  SELECT COUNT(*) AS n_flagged,
      |    SUM(CASE WHEN new_id // 4 = dup_of // 4 THEN 1 ELSE 0 END)
      |      AS true_positives
      |  FROM flags),
      |truth AS (
      |  SELECT COUNT(*) AS n_truth FROM documents b
      |  WHERE b.doc_id % 10 = 9 AND EXISTS (
      |    SELECT 1 FROM documents a
      |    WHERE a.doc_id // 4 = b.doc_id // 4 AND a.doc_id % 10 <> 9))
      |SELECT CAST(t.n_truth AS BIGINT) AS n_truth,
      |  CAST(m.n_flagged AS BIGINT) AS n_flagged,
      |  CAST(m.true_positives AS BIGINT) AS true_positives,
      |  CAST(m.n_flagged - m.true_positives AS BIGINT) AS false_positives,
      |  CAST(CASE WHEN m.n_flagged = 0 THEN 10000
      |    ELSE floor(10000.0 * m.true_positives / m.n_flagged) END AS BIGINT)
      |    AS precision_e4,
      |  CAST(CASE WHEN t.n_truth = 0 THEN 10000
      |    ELSE floor(10000.0 * m.true_positives / t.n_truth) END AS BIGINT)
      |    AS recall_e4
      |FROM m, truth t""".stripMargin

  lazy val imageDedupIncrEvalSql: String =
    incrDedupEvalSqlOf(imageDedupIncrementalSql)
  lazy val audioDedupIncrEvalSql: String =
    incrDedupEvalSqlOf(audioDedupIncrementalSql)
  lazy val videoDedupIncrEvalSql: String =
    incrDedupEvalSqlOf(videoDedupIncrementalSql)
}
