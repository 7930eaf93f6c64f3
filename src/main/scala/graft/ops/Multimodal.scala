package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata alongside. IMAGE decode
  * AND transform are REAL — [[encodeImage]]/[[decodeImage]] run the
  * JDK-resident `javax.imageio` codecs (PNG/BMP/JPEG/GIF) and
  * [[resizeImage]] nearest-neighbor-resamples the decoded raster — and
  * so are AUDIO's — [[encodeAudio]]/[[decodeAudio]] run
  * `javax.sound.sampled` (WAV/AIFF/AU containers, PCM frames) and
  * [[convertAudio]] runs the JDK converter chain (rate / channel
  * count) — all with lossless-roundtrip or exact-transform oracles.
  * VIDEO is real too: [[encodeVideo]] writes genuine RIFF-AVI
  * containers and [[sampleVideoFrames]] demuxes them with a
  * from-scratch RIFF chunk walker — uncompressed 24-bit DIB frames
  * decode by direct layout (exact cross-engine oracle) and Motion-JPEG
  * frames through the JDK JPEG reader. Only non-AVI compressed media
  * genuinely lacks a JDK codec; [[stubDecode]] / [[stubFrameSample]]
  * remain as deterministic fallbacks for opaque payloads — the
  * Spark-side plumbing (schema contract, partition-preserving
  * `mapPartitions` batch shape, the Scala analogue of `mapInPandas`,
  * projection-friendly metadata extraction) is real and tested either
  * way.
  *
  * At 100 TB: payload bytes never enter a shuffle — decode/feature
  * steps are per-partition projections; group-bys operate on the
  * extracted metadata columns only.
  */
object Multimodal {

  /** Output contract of the decode stage. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** Deterministic fake decoder standing in for a real image/audio
    * library: derives "dimensions" and a tiny "feature vector" purely
    * from the payload bytes, so tests are stable. A production build
    * swaps the body for the real codec; the signature and batch shape
    * (Iterator[Row] => Iterator[Row], one partition at a time) stay. */
  def stubDecode(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](payIdx)
        val n = bytes.length
        val fmt = if (n == 0) "empty" else if ((bytes(0) & 1) == 0) "img/fake-a" else "img/fake-b"
        val w = 16 + (n % 64)
        val h = 16 + ((n / 64) % 64)
        val feat = Array.tabulate(4)(i => (if (n > i) (bytes(i % n) & 0xff) else 0).toFloat / 255f)
        Row(id, n.toLong, fmt, w, h, feat.toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(decodedSchema))
  }

  /** Wrap a text column as a binary payload (test harness for the
    * plumbing; real pipelines read binary files or parquet BLOBs). */
  def asPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Deterministic RGB value of pixel (x, y) of image `id` — the shared
    * contract between [[encodeImage]], the roundtrip oracle SQL (plain
    * BIGINT arithmetic any engine reproduces on the non-negative ids
    * there), and the spec. The id reduces mod 2^24 BEFORE the multiply
    * (congruent result — the folded-away part is a multiple of 2^24),
    * so the product tops out near 2^56 and the arithmetic is exact in
    * ANY engine for ANY id: a raw id·2654435761 passes 2^63 at
    * id ≈ 3.5e9, where DuckDB errors and Scala silently wraps.
    * floorMod, NOT `%`, for the same reason as [[sampleValue]]: a
    * signed remainder on a negative id would go negative, setRGB would
    * mask it to 24 bits, and the decode-side `& 0xffffff` checksum
    * would diverge from the contract. */
  private[graft] def pixelValue(id: Long, x: Int, y: Int): Int =
    java.lang.Math.floorMod(
      java.lang.Math.floorMod(id, 16777216L) * 2654435761L +
        x * 40503L + y * 69061L,
      16777216L).toInt

  /** Output contract of the REAL decode stage ([[decodeImage]]). */
  val imageSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("pix_sum", LongType)))

  /** Generate real PNG/BMP image bytes in-engine: pixel (x,y) carries
    * [[pixelValue]], written through `javax.imageio` (JDK-resident —
    * no external codec). Input: (id, width, height, format∈{png,bmp});
    * output: (media_id, format, payload). The compressed bytes are
    * opaque and codec-version-dependent — correctness is asserted on
    * the DECODED roundtrip ([[decodeImage]]), never on the bytes.
    * Per-partition projection: payload bytes never shuffle. */
  def encodeImage(
      df: DataFrame, idCol: String, wCol: String, hCol: String,
      fmtCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long").as("media_id"),
      col(wCol).cast("int").as("w"), col(hCol).cast("int").as("h"),
      col(fmtCol).cast("string").as("fmt"))
    src.mapPartitions { rows =>
      rows.map { r =>
        val (id, w, h, fmt) = (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))
        require(w > 0 && h > 0, s"encodeImage: non-positive dims ${w}x$h")
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, pixelValue(id, x, y)); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(img, fmt, bos),
          s"encodeImage: no $fmt writer")
        Row(id, fmt, bos.toByteArray)
      }
    }(org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("format", StringType),
      StructField("payload", BinaryType)))))
  }

  /** REAL image decode via `javax.imageio` (PNG/BMP/JPEG/GIF — the
    * JDK-resident readers): detects the container format from the
    * bytes, reads dimensions, and reduces the pixel raster to a
    * checksum (Σ 24-bit RGB over all pixels) so a lossless roundtrip
    * is verifiable end-to-end in SQL. Undecodable payloads yield NULL
    * fields rather than failing the job — corrupt media is data, not
    * an error, at corpus scale. Same per-partition batch shape as
    * [[stubDecode]]; this replaces the stub's fake geometry with the
    * actual codec for formats the JDK ships. */
  def decodeImage(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        // NULL ids/payloads are corrupt-metadata rows, not task errors.
        val id: java.lang.Long =
          if (r.isNullAt(idIdx)) null else Long.box(r.getLong(idIdx))
        try {
          val bytes = r.getAs[Array[Byte]](payIdx)
          // readImageWithFormat holds the FD-safety discipline:
          // MemoryCacheImageInputStream, never the temp-file-backed
          // default factory (one temp FILE + descriptor per row would
          // exhaust ulimit/tmpdir on a large partition between GCs).
          val fi = readImageWithFormat(bytes, 0, bytes.length)
          if (fi == null) Row(id, null, null, null, null)
          else {
            val (fmt, img) = fi
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                sum += (img.getRGB(x, y) & 0xffffff); x += 1
              }
              y += 1
            }
            Row(id, fmt, img.getWidth, img.getHeight, sum)
          }
        } catch {
          case _: Exception => Row(id, null, null, null, null)
        }
      }
    }(org.apache.spark.sql.Encoders.row(imageSchema))
  }

  /** Deterministic 16-bit PCM sample `i` of clip `id` — the shared
    * contract between [[encodeAudio]], the roundtrip oracle SQL (plain
    * BIGINT arithmetic; SQL `%` on the non-negative ids there equals
    * floorMod), and the spec. The id reduces mod 2^16 before the
    * multiply (congruent, and overflow-proof for any id — see
    * [[pixelValue]]). floorMod, NOT `%`: Scala's signed remainder
    * would push negative ids below -32768 and the low-16-bit PCM
    * write would silently wrap them. Range [-32768, 32767] for every
    * (id, i). */
  private[graft] def sampleValue(id: Long, i: Int): Int =
    (java.lang.Math.floorMod(
      java.lang.Math.floorMod(id, 65536L) * 31L + i * 2654435761L,
      65536L) - 32768L).toInt

  /** Output contract of the REAL audio decode stage ([[decodeAudio]]). */
  val audioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("encoding", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("sample_sum", LongType)))

  /** Generate real RIFF/WAVE bytes in-engine: `nSamples` frames of
    * 16-bit signed little-endian mono PCM at `sampleRate`, sample `i`
    * carrying [[sampleValue]], written through the JDK-resident
    * `javax.sound.sampled` codec (AudioSystem.write — audio's
    * [[encodeImage]] twin; the container genuinely lacks codecs only
    * for COMPRESSED audio and video, which keep the stubs). Input:
    * (id, nSamples); output: (media_id, payload). Correctness is
    * asserted on the decoded roundtrip, never on the container
    * bytes. */
  def encodeAudio(
      df: DataFrame, idCol: String, nSamplesCol: String,
      sampleRate: Int = 8000): DataFrame = {
    require(sampleRate > 0)
    val src = df.select(col(idCol).cast("long").as("media_id"),
      col(nSamplesCol).cast("int").as("n"))
    src.mapPartitions { rows =>
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, 1, true, false) // 16-bit signed LE mono
      rows.map { r =>
        val (id, n) = (r.getLong(0), r.getInt(1))
        require(n > 0, s"encodeAudio: non-positive sample count $n")
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val v = sampleValue(id, i)
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        try javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        finally ais.close()
        Row(id, bos.toByteArray)
      }
    }(org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))))
  }

  /** REAL audio decode via `javax.sound.sampled` (WAV/AIFF/AU — the
    * JDK-resident readers): parses the container header for encoding /
    * sample rate / channel count, streams the PCM frames, and reduces
    * them to a sample checksum (Σ signed 16-bit LE samples) so a
    * lossless roundtrip is verifiable end-to-end in SQL. Undecodable
    * payloads and NULL ids degrade to NULL fields — corrupt media is
    * data, not an error. Same per-partition shape as [[decodeImage]];
    * payload bytes never shuffle. */
  def decodeAudio(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id: java.lang.Long =
          if (r.isNullAt(idIdx)) null else Long.box(r.getLong(idIdx))
        try {
          val bytes = r.getAs[Array[Byte]](payIdx)
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val fmt = ais.getFormat
            val frames = ais.getFrameLength
            // The checksum contract is defined over 16-bit integer
            // samples; pairing raw bytes of an 8/24/32-bit or float
            // payload would return a confident wrong value — degrade
            // the CHECKSUM to NULL there while keeping the honest
            // header fields.
            val sum: java.lang.Long =
              if (fmt.getSampleSizeInBits != 16) null
              else {
                val data = ais.readAllBytes()
                val bigEndian = fmt.isBigEndian
                var s = 0L
                var i = 0
                while (i + 1 < data.length) {
                  val lo = if (bigEndian) data(i + 1) else data(i)
                  val hi = if (bigEndian) data(i) else data(i + 1)
                  s += ((hi.toInt << 8) | (lo.toInt & 0xff)).toShort.toLong
                  i += 2
                }
                Long.box(s)
              }
            Row(id, fmt.getEncoding.toString, fmt.getSampleRate.toInt,
              fmt.getChannels, frames, sum)
          } finally ais.close()
        } catch {
          case _: Exception => Row(id, null, null, null, null, null)
        }
      }
    }(org.apache.spark.sql.Encoders.row(audioSchema))
  }

  /** Output contract of the REAL audio conversion stage ([[convertAudio]]). */
  val convertedAudioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("sample_sum", LongType)))

  /** REAL audio format conversion via the JDK's
    * `AudioSystem.getAudioInputStream(targetFormat, stream)` converter
    * chain: decode the container, convert the PCM stream to 16-bit
    * signed little-endian at (`targetRate`, `targetChannels`), and
    * reduce the CONVERTED stream to (frame count, Σ signed samples
    * across all channels) — the transform stage the codec roundtrip
    * ([[decodeAudio]]) didn't exercise. Channel conversion is exact
    * and engine-mirrorable (mono→stereo duplicates each sample, so the
    * checksum is exactly 2× the mono sum — probe-verified; N→mono
    * mixes down deterministically), which is what the value oracle
    * pins; sample-RATE conversion runs the JDK's interpolating
    * resampler, whose values are implementation-defined — spec-covered
    * by invariants (frame count, header, determinism), not the SQL
    * oracle. Unsupported conversions and undecodable payloads degrade
    * to NULL fields. Per-partition projection; payload bytes never
    * shuffle. */
  def convertAudio(
      df: DataFrame, idCol: String, payloadCol: String,
      targetRate: Int, targetChannels: Int): DataFrame = {
    require(targetRate > 0 && targetChannels > 0,
      s"convertAudio: non-positive target rate/channels $targetRate/$targetChannels")
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id: java.lang.Long =
          if (r.isNullAt(idIdx)) null else Long.box(r.getLong(idIdx))
        try {
          val bytes = r.getAs[Array[Byte]](payIdx)
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val tgt = new javax.sound.sampled.AudioFormat(
              targetRate.toFloat, 16, targetChannels, true, false)
            // One-hop when the provider supports the combined jump;
            // otherwise convert channels at the source rate first, then
            // resample — the JDK registers those as separate providers.
            val conv =
              if (javax.sound.sampled.AudioSystem.isConversionSupported(
                tgt, ais.getFormat)) {
                javax.sound.sampled.AudioSystem.getAudioInputStream(tgt, ais)
              } else {
                val mid = new javax.sound.sampled.AudioFormat(
                  ais.getFormat.getSampleRate, 16, targetChannels, true, false)
                javax.sound.sampled.AudioSystem.getAudioInputStream(tgt,
                  javax.sound.sampled.AudioSystem.getAudioInputStream(mid, ais))
              }
            try {
              val data = conv.readAllBytes()
              var s = 0L
              var i = 0
              while (i + 1 < data.length) {
                s += ((data(i + 1).toInt << 8) | (data(i).toInt & 0xff)).toShort.toLong
                i += 2
              }
              Row(id, targetRate, targetChannels,
                (data.length / (2L * targetChannels)), s)
            } finally conv.close()
          } finally ais.close()
        } catch {
          case _: Exception => Row(id, null, null, null, null)
        }
      }
    }(org.apache.spark.sql.Encoders.row(convertedAudioSchema))
  }

  /** Output contract of the REAL audio feature stage
    * ([[audioFeatures]]): one row per analysis window — long format,
    * so `windows` is a knob, not a schema change. */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("win", IntegerType),
    StructField("n_samples", LongType),
    StructField("sum_s", LongType),
    StructField("sum_abs", LongType),
    StructField("sum_sq", LongType)))

  /** REAL audio feature extraction — the feature-extract verb over the
    * decoded PCM stream (audio twin of [[imageFeatures]]): the clip
    * splits into `windows` equal spans (sample i → window
    * `i·windows DIV n`) and each span reduces to integer sums — Σs
    * (DC offset), Σ|s| (mean-abs energy), Σs² (power/RMS numerator) —
    * the classic VAD/loudness features, kept as exact integers so the
    * whole vector is SQL-reproducible from the sample contract
    * (Σs² ≤ 32768²·n stays far under 2^63). The checksum contract is
    * 16-bit PCM, like [[decodeAudio]]: other widths degrade to NULL
    * fields, as do undecodable payloads. Channels interleave into the
    * sample stream in frame order. Every window emits a row — a clip
    * SHORTER than `windows` yields (n_samples=0, sums 0) rows for its
    * empty spans, keeping the feature vector fixed-shape for ML
    * consumers; a GROUP-BY SQL mirror reproduces those rows only with
    * a window-spine LEFT JOIN (the shipped oracle's clips are all
    * ≥ `windows` samples, where plain GROUP BY suffices).
    * Explode-per-window dataflow; payload bytes never shuffle. */
  def audioFeatures(
      df: DataFrame, idCol: String, payloadCol: String,
      windows: Int = 4): DataFrame = {
    require(windows > 0, s"audioFeatures: non-positive windows $windows")
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id: java.lang.Long =
          if (r.isNullAt(idIdx)) null else Long.box(r.getLong(idIdx))
        try {
          val bytes = r.getAs[Array[Byte]](payIdx)
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val fmt = ais.getFormat
            require(fmt.getSampleSizeInBits == 16, "feature contract is 16-bit PCM")
            // Unsigned 16-bit would be summed as two's-complement and
            // silently skew DC/energy — degrade to NULL like every
            // other non-conforming payload instead.
            require(fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
              "feature contract is SIGNED PCM")
            val data = ais.readAllBytes()
            val n = data.length / 2
            require(n > 0, "empty PCM stream")
            val bigEndian = fmt.isBigEndian
            val nS = new Array[Long](windows)
            val sS = new Array[Long](windows)
            val sA = new Array[Long](windows)
            val sQ = new Array[Long](windows)
            var i = 0
            while (i < n) {
              val lo = if (bigEndian) data(2 * i + 1) else data(2 * i)
              val hi = if (bigEndian) data(2 * i) else data(2 * i + 1)
              val s = (((hi.toInt << 8) | (lo.toInt & 0xff)).toShort).toLong
              val w = (i.toLong * windows / n).toInt
              nS(w) += 1; sS(w) += s; sA(w) += math.abs(s); sQ(w) += s * s
              i += 1
            }
            (0 until windows).map(w =>
              Row(id, w, nS(w), sS(w), sA(w), sQ(w)))
          } finally ais.close()
        } catch {
          case _: Exception =>
            Iterator.single(Row(id, null, null, null, null, null))
        }
      }
    }(org.apache.spark.sql.Encoders.row(audioFeatureSchema))
  }

  /** Output contract of the REAL resize stage ([[resizeImage]]). */
  val resizedImageSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("format", StringType),
    StructField("src_w", IntegerType),
    StructField("src_h", IntegerType),
    StructField("out_w", IntegerType),
    StructField("out_h", IntegerType),
    StructField("pix_sum", LongType)))

  /** Aspect-preserving fit of (w, h) into (targetW, targetH) in PURE
    * INTEGER arithmetic, so any engine reproduces it exactly: the
    * binding side is decided by cross-multiplication (targetW·h ≤
    * targetH·w ⇔ width binds) and the other side floors through
    * integer division — no float scale whose w·(tw/w) could land an
    * ulp under tw and floor to tw−1. Degenerate aspects clamp at 1px. */
  private[graft] def fitDims(
      w: Int, h: Int, targetW: Int, targetH: Int): (Int, Int) =
    if (targetW.toLong * h <= targetH.toLong * w)
      (targetW, math.max(1, (h.toLong * targetW / w).toInt))
    else (math.max(1, (w.toLong * targetH / h).toInt), targetH)

  /** REAL raster resize: decode the payload (same `javax.imageio` path
    * as [[decodeImage]]), resample it nearest-neighbor into the
    * aspect-preserving [[fitDims]] geometry — output pixel (ox, oy)
    * reads source pixel (ox·w DIV outW, oy·h DIV outH), the standard
    * top-left-anchored NN kernel in integer arithmetic — and reduce
    * the RESIZED raster to the Σ 24-bit-RGB checksum. The transformed
    * pixel buffer is materialized (setRGB into a new image, checksum
    * read back from it), so the oracle verifies an actual resample,
    * not geometry math. Undecodable payloads degrade to NULL fields;
    * per-partition projection — payload bytes never shuffle. */
  def resizeImage(
      df: DataFrame, idCol: String, payloadCol: String,
      targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0,
      s"resizeImage: non-positive target ${targetW}x$targetH")
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id: java.lang.Long =
          if (r.isNullAt(idIdx)) null else Long.box(r.getLong(idIdx))
        try {
          val bytes = r.getAs[Array[Byte]](payIdx)
          val fi = readImageWithFormat(bytes, 0, bytes.length)
          if (fi == null) Row(id, null, null, null, null, null, null)
          else {
            val (fmt, img) = fi
            val (w, h) = (img.getWidth, img.getHeight)
            val (ow, oh) = fitDims(w, h, targetW, targetH)
            val out = new java.awt.image.BufferedImage(
              ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var oy = 0
            while (oy < oh) {
              val sy = (oy.toLong * h / oh).toInt
              var ox = 0
              while (ox < ow) {
                out.setRGB(ox, oy,
                  img.getRGB((ox.toLong * w / ow).toInt, sy))
                ox += 1
              }
              oy += 1
            }
            var sum = 0L
            oy = 0
            while (oy < oh) {
              var ox = 0
              while (ox < ow) { sum += (out.getRGB(ox, oy) & 0xffffff); ox += 1 }
              oy += 1
            }
            Row(id, fmt, w, h, ow, oh, sum)
          }
        } catch {
          case _: Exception => Row(id, null, null, null, null, null, null)
        }
      }
    }(org.apache.spark.sql.Encoders.row(resizedImageSchema))
  }

  /** Output contract of the metadata-only resize-geometry stage. */
  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("out_w", IntegerType),
    StructField("out_h", IntegerType),
    StructField("scale_x", DoubleType),
    StructField("scale_y", DoubleType)))

  /** Resize GEOMETRY over decoded metadata — the planning half of the
    * resize stage (what dims/scale would the fit produce), kept as
    * pure column math so it stays in codegen and runs without payloads.
    * The raster transform itself is [[resizeImage]]. */
  def stubResize(decoded: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val sx = lit(targetW.toDouble) / col("width").cast("double")
    val sy = lit(targetH.toDouble) / col("height").cast("double")
    val s = least(sx, sy)
    decoded.select(
      col("media_id"),
      floor(col("width") * s).cast("int").as("out_w"),
      floor(col("height") * s).cast("int").as("out_h"),
      s.as("scale_x"), s.as("scale_y"))
  }

  /** Output contract of the frame-sample stage: one row per sampled
    * frame (video → frames explode). */
  val framesSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", LongType),
    StructField("frame_payload", BinaryType)))

  /** Raw fixed-stride payload splitter: treats the payload as
    * `frameLen`-byte frames and emits every `stride`-th one — the
    * explode-per-frame dataflow (row count multiplies, payload bytes
    * stay partition-local) for headerless raw-tensor blobs. CONTAINER
    * video goes through the real demuxer, [[sampleVideoFrames]]. */
  def stubFrameSample(
      df: DataFrame, idCol: String, payloadCol: String,
      frameLen: Int, stride: Int): DataFrame = {
    require(frameLen > 0 && stride > 0)
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](payIdx)
        val nFrames = bytes.length / frameLen
        (0 until nFrames by stride).iterator.map { f =>
          Row(id, f.toLong,
            java.util.Arrays.copyOfRange(bytes, f * frameLen, (f + 1) * frameLen))
        }
      }
    }(org.apache.spark.sql.Encoders.row(framesSchema))
  }

  /** REAL image feature extraction over the decoded raster — the
    * feature-extract verb with an actual codec behind it (the fake
    * 4-float vector of [[stubDecode]] remains only for opaque
    * payloads). Emits per-channel integer sums and a `pool`×`pool`
    * average-pool grid of grayscale (r+g+b) sums — the classic
    * tiny-embedding shape — all in integer arithmetic (no float means,
    * no division), so the whole feature vector is exactly
    * reproducible in SQL from the pixel contract. Pixel x maps to grid
    * cell `x·pool DIV w` (same for y). Cells are unpacked to scalar
    * columns `g_<i>_<j>` (i = x-cell, j = y-cell) because array cells
    * defeat the driver's comparator; normalize downstream where floats
    * belong. Every cell column is always present — an image narrower
    * or shorter than `pool` leaves its unreachable cells at 0 (the
    * fixed-shape contract; a GROUP-BY SQL mirror needs a cell spine
    * for such images — the shipped oracle's dims are all ≥ pool).
    * Undecodable payloads degrade to NULL fields; per-partition
    * projection — payload bytes never shuffle. */
  def imageFeatures(
      df: DataFrame, idCol: String, payloadCol: String,
      pool: Int = 2): DataFrame = {
    require(pool > 0, s"imageFeatures: non-positive pool $pool")
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    val schema = StructType(
      Seq(StructField("media_id", LongType),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("r_sum", LongType),
        StructField("g_sum", LongType),
        StructField("b_sum", LongType)) ++
        (for (i <- 0 until pool; j <- 0 until pool)
          yield StructField(s"g_${i}_$j", LongType)))
    val nulls = Array.fill[Any](5 + pool * pool)(null)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id: java.lang.Long =
          if (r.isNullAt(idIdx)) null else Long.box(r.getLong(idIdx))
        try {
          val bytes = r.getAs[Array[Byte]](payIdx)
          val img = readImageBytes(bytes, 0, bytes.length)
          require(img != null, "no image reader for payload")
          val (w, h) = (img.getWidth, img.getHeight)
          var rs = 0L; var gs = 0L; var bs = 0L
          val cells = new Array[Long](pool * pool)
          var y = 0
          while (y < h) {
            val cy = y * pool / h
            var x = 0
            while (x < w) {
              val v = img.getRGB(x, y)
              val cr = (v >> 16) & 0xff; val cg = (v >> 8) & 0xff; val cb = v & 0xff
              rs += cr; gs += cg; bs += cb
              cells((x * pool / w) * pool + cy) += (cr + cg + cb).toLong
              x += 1
            }
            y += 1
          }
          Row.fromSeq(Seq(id, w, h, rs, gs, bs) ++ cells)
        } catch {
          case _: Exception => Row.fromSeq(id +: nulls.toSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  // ------------------------------------------------------------ video

  /** Deterministic RGB of pixel (x, y) in FRAME `f` of video `id` —
    * the shared contract between [[encodeVideo]], the demux oracle SQL
    * (plain BIGINT arithmetic), and the spec: [[pixelValue]] over a
    * per-frame mixed id. The id reduces mod 2^24 BEFORE the frame mix,
    * so every intermediate stays below 2^56 — exact in any engine for
    * any id (same overflow discipline as [[pixelValue]]). */
  private[graft] def framePixel(id: Long, f: Int, x: Int, y: Int): Int =
    pixelValue(java.lang.Math.floorMod(id, 16777216L) * 1000003L + f, x, y)

  // --- RIFF assembly (little-endian, word-aligned), the container
  // grammar shared by WAV (chunk id + u32 size + body) and AVI (the
  // same grammar with LIST nesting). Public spec; no codec library.
  private def cc(s: String): Array[Byte] = {
    require(s.length == 4); s.getBytes("US-ASCII")
  }
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(9 + body.length)
    out.write(cc(id)); out.write(le32(body.length.toLong)); out.write(body)
    if ((body.length & 1) == 1) out.write(0) // RIFF pads odd chunks
    out.toByteArray
  }
  private def riffList(typ: String, parts: Seq[Array[Byte]]): Array[Byte] =
    riffChunk("LIST", Array.concat(cc(typ) +: parts: _*))

  /** One uncompressed '00db' frame: bottom-up rows (positive biHeight),
    * BGR byte order, rows padded to 4 bytes — the DIB layout
    * BITMAPINFOHEADER declares. Pixel (x, y) carries [[framePixel]]
    * with y=0 the TOP row, so the writer flips and the demuxer must
    * un-flip (pinned by the pix00 contract — a checksum alone is
    * orientation-blind). */
  private def dibFrame(id: Long, f: Int, w: Int, h: Int): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val base = (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val v = framePixel(id, f, x, y)
        out(base + 3 * x) = (v & 0xff).toByte           // B
        out(base + 3 * x + 1) = ((v >> 8) & 0xff).toByte  // G
        out(base + 3 * x + 2) = ((v >> 16) & 0xff).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** THE image-reader acquisition discipline, in one place
    * (MemoryCacheImageInputStream — never the temp-file-backed default
    * factory — finally-disposed reader, finally-closed stream), shared
    * by [[decodeImage]], [[resizeImage]], [[imageFeatures]], and the
    * MJPG frame path. Null when no reader claims the bytes. */
  private def readImageWithFormat(
      bytes: Array[Byte], off: Int,
      len: Int): (String, java.awt.image.BufferedImage) = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes, off, len))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) null
      else {
        val reader = readers.next()
        try {
          val fmt = reader.getFormatName.toLowerCase
          reader.setInput(iis)
          (fmt, reader.read(0))
        } finally reader.dispose()
      }
    } finally iis.close()
  }

  private def readImageBytes(
      bytes: Array[Byte], off: Int, len: Int): java.awt.image.BufferedImage = {
    val fi = readImageWithFormat(bytes, off, len)
    if (fi == null) null else fi._2
  }

  /** Generate a REAL RIFF-AVI container in-engine — video's
    * [[encodeImage]]/[[encodeAudio]] twin. Codec `dib` writes
    * uncompressed bottom-up 24-bit '00db' frames (no codec involved,
    * so the demuxed values are exactly engine-mirrorable); codec `mjpg`
    * writes each '00dc' frame as a real JPEG through `javax.imageio` —
    * the Motion-JPEG layout, the one compressed video flavor the JDK
    * can actually code. Input: (id, nFrames, w, h, codec); output:
    * (media_id, codec, payload). Container bytes are opaque;
    * correctness is asserted on the demuxed roundtrip
    * ([[sampleVideoFrames]]). Per-partition projection: payload bytes
    * never shuffle. */
  def encodeVideo(
      df: DataFrame, idCol: String, nFramesCol: String,
      wCol: String, hCol: String, codecCol: String): DataFrame = {
    val src = df.select(col(idCol).cast("long").as("media_id"),
      col(nFramesCol).cast("int").as("n"),
      col(wCol).cast("int").as("w"), col(hCol).cast("int").as("h"),
      col(codecCol).cast("string").as("codec"))
    src.mapPartitions { rows =>
      rows.map { r =>
        val (id, n, w, h, codec) =
          (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))
        require(n > 0 && w > 0 && h > 0,
          s"encodeVideo: non-positive geometry n=$n ${w}x$h")
        val mjpg = codec match {
          case "dib"  => false
          case "mjpg" => true
          case other => throw new IllegalArgumentException(
            s"encodeVideo: unknown codec '$other' (dib|mjpg)")
        }
        val frames: Seq[Array[Byte]] = (0 until n).map { f =>
          if (!mjpg) dibFrame(id, f, w, h)
          else {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { img.setRGB(x, y, framePixel(id, f, x, y)); x += 1 }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            require(javax.imageio.ImageIO.write(img, "jpg", bos),
              "encodeVideo: no jpg writer")
            bos.toByteArray
          }
        }
        val dibSize = ((w * 3 + 3) & ~3) * h
        val avih = riffChunk("avih", Array.concat(
          le32(33333L), le32(0L), le32(0L), le32(0L), // usec/frame, maxBps, pad, flags
          le32(n.toLong), le32(0L), le32(1L), le32(0L), // totalFrames, initial, streams, sugBuf
          le32(w.toLong), le32(h.toLong),
          le32(0L), le32(0L), le32(0L), le32(0L)))    // reserved[4]
        val strh = riffChunk("strh", Array.concat(
          cc("vids"), if (mjpg) cc("MJPG") else cc("DIB "),
          le32(0L), le16(0), le16(0),                 // flags, priority, language
          le32(0L), le32(1L), le32(30L), le32(0L),    // initFrames, scale, rate, start
          le32(n.toLong), le32(0L), le32(0L), le32(0L), // length, sugBuf, quality, sampleSize
          le16(0), le16(0), le16(w), le16(h)))        // rcFrame
        val strf = riffChunk("strf", Array.concat(
          le32(40L), le32(w.toLong), le32(h.toLong),  // biSize, biWidth, biHeight (bottom-up)
          le16(1), le16(24),                          // biPlanes, biBitCount
          if (mjpg) cc("MJPG") else le32(0L),         // biCompression
          le32(if (mjpg) 0L else dibSize.toLong),     // biSizeImage
          le32(0L), le32(0L), le32(0L), le32(0L)))
        val hdrl = riffList("hdrl", Seq(avih, riffList("strl", Seq(strh, strf))))
        val movi = riffList("movi",
          frames.map(fb => riffChunk(if (mjpg) "00dc" else "00db", fb)))
        Row(id, codec, riffChunk("RIFF", Array.concat(cc("AVI "), hdrl, movi)))
      }
    }(org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("codec", StringType),
      StructField("payload", BinaryType)))))
  }

  private def leU32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private def leU16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  private val MjpgFourcc = 0x47504A4DL // 'MJPG' read little-endian

  /** Parsed AVI container: geometry/format of the first 'vids' and
    * first 'auds' stream plus the in-order movi chunk lists for each,
    * mapped by ACTUAL stream index — movi chunk ids are `NNdb`/`NNdc`
    * (video) and `NNwb` (audio) where NN is the decimal index of the
    * owning strl, so an audio-first container routes exactly like a
    * video-first one. Absent streams keep comp/tag = -1. */
  private final case class AviMeta(
      vidW: Int, vidH: Int, vidBits: Int, vidComp: Long,
      frames: IndexedSeq[(Int, Int)],
      audTag: Int, audChannels: Int, audRate: Int, audBits: Int,
      audio: IndexedSeq[(Int, Int)]) {
    def hasVideo: Boolean = vidComp != -1L
    def hasAudio: Boolean = audTag != -1
  }

  private def parseAvi(bytes: Array[Byte]): AviMeta = {
    require(bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" &&
      fourcc(bytes, 8) == "AVI ", "not a RIFF/AVI container")
    var w = 0; var h = 0; var bits = 0; var comp = -1L
    var audTag = -1; var audCh = 0; var audRate = 0; var audBits = 0
    var strlCount = 0        // index of the NEXT strl list
    var curStrl = -1         // index of the strl being walked
    var curType = ""         // fccType its strh declared
    var vidStream = -1; var audStream = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val audio = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(start: Int, end: Int, inMovi: Boolean, inStrl: Boolean,
        depth: Int): Unit = {
      // Depth cap so a crafted container of nested 12-byte LISTs
      // (~1 MB buys tens of thousands of levels) hits the per-row
      // Exception degrade path instead of a StackOverflowError —
      // an Error would escape `catch { case _: Exception }` in the
      // callers and kill the task. Real AVI nests 3-4 levels.
      require(depth <= 64, "LIST nesting too deep")
      var p = start
      while (p + 8 <= end) {
        val id = fourcc(bytes, p)
        val len = leU32(bytes, p + 4).toInt
        val body = p + 8
        require(len >= 0 && body + len <= end, s"truncated chunk '$id'")
        if (id == "LIST") {
          val typ = fourcc(bytes, body)
          if (typ == "strl") { curStrl = strlCount; strlCount += 1; curType = "" }
          walk(body + 4, body + len, inMovi || typ == "movi",
            inStrl || typ == "strl", depth + 1)
        } else if (inStrl && id == "strh") {
          curType = fourcc(bytes, body)
        } else if (inStrl && id == "strf" && curType == "vids" && comp == -1L) {
          w = leU32(bytes, body + 4).toInt
          h = leU32(bytes, body + 8).toInt
          bits = leU16(bytes, body + 14)
          comp = leU32(bytes, body + 16)
          vidStream = curStrl
        } else if (inStrl && id == "strf" && curType == "auds" && audTag == -1) {
          audTag = leU16(bytes, body)      // PCMWAVEFORMAT: wFormatTag
          audCh = leU16(bytes, body + 2)
          audRate = leU32(bytes, body + 4).toInt
          audBits = leU16(bytes, body + 14)
          audStream = curStrl
        } else if (inMovi && id.length == 4 &&
            id.charAt(0).isDigit && id.charAt(1).isDigit) {
          val idx = (id.charAt(0) - '0') * 10 + (id.charAt(1) - '0')
          val suffix = id.substring(2)
          if (idx == vidStream && (suffix == "db" || suffix == "dc"))
            frames += ((body, len))
          else if (idx == audStream && suffix == "wb")
            audio += ((body, len))
        }
        p = body + len + (len & 1) // skip the alignment pad byte
      }
    }
    walk(12, bytes.length, inMovi = false, inStrl = false, depth = 0)
    AviMeta(w, h, bits, comp, frames.toIndexedSeq,
      audTag, audCh, audRate, audBits, audio.toIndexedSeq)
  }

  /** Generate an INTERLEAVED two-stream RIFF-AVI container — video
    * (uncompressed DIB, the [[framePixel]] contract) as stream 0 and
    * 16-bit LE mono PCM audio (the [[sampleValue]] contract, same as
    * the WAV work) as stream 1, each frame's `01wb` audio slice
    * following its `00db` chunk the way real muxers interleave for
    * streaming playback. Audio sample i of the clip lives in frame
    * i·nFrames DIV nSamples's slice. Input: (id, nFrames, w, h,
    * nSamples); output: (media_id, payload). Correctness is asserted
    * on the demuxed roundtrip of BOTH streams ([[sampleVideoFrames]] /
    * [[demuxAviAudio]]). */
  def encodeAv(
      df: DataFrame, idCol: String, nFramesCol: String,
      wCol: String, hCol: String, nSamplesCol: String,
      sampleRate: Int = 8000): DataFrame = {
    require(sampleRate > 0)
    val src = df.select(col(idCol).cast("long").as("media_id"),
      col(nFramesCol).cast("int").as("nf"),
      col(wCol).cast("int").as("w"), col(hCol).cast("int").as("h"),
      col(nSamplesCol).cast("int").as("ns"))
    src.mapPartitions { rows =>
      rows.map { r =>
        val (id, nf, w, h, ns) =
          (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
        require(nf > 0 && w > 0 && h > 0 && ns > 0,
          s"encodeAv: non-positive geometry nf=$nf ${w}x$h ns=$ns")
        val dibSize = ((w * 3 + 3) & ~3) * h
        val avih = riffChunk("avih", Array.concat(
          le32(33333L), le32(0L), le32(0L), le32(0L),
          le32(nf.toLong), le32(0L), le32(2L), le32(0L), // TWO streams
          le32(w.toLong), le32(h.toLong),
          le32(0L), le32(0L), le32(0L), le32(0L)))
        val strhV = riffChunk("strh", Array.concat(
          cc("vids"), cc("DIB "),
          le32(0L), le16(0), le16(0),
          le32(0L), le32(1L), le32(30L), le32(0L),
          le32(nf.toLong), le32(0L), le32(0L), le32(0L),
          le16(0), le16(0), le16(w), le16(h)))
        val strfV = riffChunk("strf", Array.concat(
          le32(40L), le32(w.toLong), le32(h.toLong),
          le16(1), le16(24), le32(0L), le32(dibSize.toLong),
          le32(0L), le32(0L), le32(0L), le32(0L)))
        val strhA = riffChunk("strh", Array.concat(
          cc("auds"), le32(0L),
          le32(0L), le16(0), le16(0),
          le32(0L), le32(1L), le32(sampleRate.toLong), le32(0L),
          le32(ns.toLong), le32(0L), le32(0L), le32(2L), // dwSampleSize = block
          le16(0), le16(0), le16(0), le16(0)))
        val strfA = riffChunk("strf", Array.concat( // PCMWAVEFORMAT + bits
          le16(1), le16(1), le32(sampleRate.toLong),
          le32(sampleRate.toLong * 2), le16(2), le16(16)))
        val hdrl = riffList("hdrl", Seq(avih,
          riffList("strl", Seq(strhV, strfV)),
          riffList("strl", Seq(strhA, strfA))))
        val chunks = (0 until nf).flatMap { f =>
          val lo = (f.toLong * ns / nf).toInt
          val hi = ((f + 1).toLong * ns / nf).toInt
          val pcm = new Array[Byte]((hi - lo) * 2)
          var i = lo
          while (i < hi) {
            val v = sampleValue(id, i)
            pcm(2 * (i - lo)) = (v & 0xff).toByte
            pcm(2 * (i - lo) + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          Seq(riffChunk("00db", dibFrame(id, f, w, h)),
            riffChunk("01wb", pcm))
        }
        val movi = riffList("movi", chunks)
        Row(id, riffChunk("RIFF", Array.concat(cc("AVI "), hdrl, movi)))
      }
    }(org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))))
  }

  /** Output contract of the AVI audio demux ([[demuxAviAudio]]). */
  val aviAudioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("sample_sum", LongType)))

  /** Demux the AUDIO stream out of a RIFF-AVI container: route the
    * `NNwb` movi chunks of the first 'auds' stream (by actual stream
    * index — interleaved with video frames), concatenate the PCM in
    * chunk order, and reduce to the 16-bit sample checksum — the same
    * contract as [[decodeAudio]], proving A/V interleave handling, not
    * just single-stream parsing. Non-PCM / non-16-bit audio and
    * containers without an audio stream degrade to NULL fields, as do
    * corrupt payloads. Per-partition projection; payload bytes never
    * shuffle. */
  def demuxAviAudio(
      df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id: java.lang.Long =
          if (r.isNullAt(idIdx)) null else Long.box(r.getLong(idIdx))
        try {
          val bytes = r.getAs[Array[Byte]](payIdx)
          val meta = parseAvi(bytes)
          require(meta.hasAudio, "no 'auds' stream header in container")
          require(meta.audTag == 1 && meta.audBits == 16,
            s"checksum contract is 16-bit PCM (tag=${meta.audTag} bits=${meta.audBits})")
          var n = 0L
          var sum = 0L
          meta.audio.foreach { case (off, len) =>
            var i = off
            while (i + 1 < off + len) {
              sum += (((bytes(i + 1).toInt << 8) | (bytes(i).toInt & 0xff)).toShort).toLong
              n += 1
              i += 2
            }
          }
          Row(id, meta.audRate, meta.audChannels, n, sum)
        } catch {
          case _: Exception => Row(id, null, null, null, null)
        }
      }
    }(org.apache.spark.sql.Encoders.row(aviAudioSchema))
  }

  /** Output contract of the REAL frame-sample stage
    * ([[sampleVideoFrames]]): `pix00` is the TOP-LEFT pixel of the
    * decoded frame — it pins the bottom-up un-flip that the
    * orientation-blind checksum cannot. */
  val videoFramesSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", LongType),
    StructField("codec", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("pix00", IntegerType),
    StructField("pix_sum", LongType)))

  /** REAL video frame sampling: demux the RIFF-AVI container with the
    * from-scratch chunk walker ([[parseAvi]] — the public RIFF grammar,
    * no codec library), take every `stride`-th movi frame, and decode
    * it — uncompressed 24-bit DIB frames by direct bottom-up BGR
    * layout, MJPG frames through the JDK JPEG reader — down to
    * (dims, top-left pixel, Σ 24-bit-RGB checksum). Undecodable or
    * non-AVI payloads degrade to one NULL-field row (corrupt media is
    * data, not an error); frame decode is forced EAGERLY inside the
    * guard so a frame-level parse error cannot escape through the lazy
    * iterator as a task failure. Explode-per-frame dataflow: row count
    * multiplies, payload bytes stay partition-local and never
    * shuffle. */
  def sampleVideoFrames(
      df: DataFrame, idCol: String, payloadCol: String,
      stride: Int): DataFrame = {
    require(stride > 0, s"sampleVideoFrames: non-positive stride $stride")
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id: java.lang.Long =
          if (r.isNullAt(idIdx)) null else Long.box(r.getLong(idIdx))
        try {
          val bytes = r.getAs[Array[Byte]](payIdx)
          val meta = parseAvi(bytes)
          require(meta.hasVideo, "no 'vids' stream header in container")
          val (w, h, bits, comp, frames) =
            (meta.vidW, meta.vidH, meta.vidBits, meta.vidComp, meta.frames)
          val mjpg = comp == MjpgFourcc
          require(mjpg || (comp == 0L && bits == 24),
            s"unsupported video format comp=$comp bits=$bits")
          // Range.map is EAGER — every sampled frame decodes inside
          // this try, so per-frame corruption degrades, not throws.
          (0 until frames.length by stride).map { f =>
            val (off, len) = frames(f)
            if (!mjpg) {
              val rowStride = (w * 3 + 3) & ~3
              require(len >= rowStride * h, "truncated DIB frame")
              def px(x: Int, y: Int): Int = {
                val base = off + (h - 1 - y) * rowStride + 3 * x
                ((bytes(base + 2) & 0xff) << 16) |
                  ((bytes(base + 1) & 0xff) << 8) | (bytes(base) & 0xff)
              }
              var sum = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) { sum += px(x, y); x += 1 }
                y += 1
              }
              Row(id, f.toLong, "dib", w, h, px(0, 0), sum)
            } else {
              val img = readImageBytes(bytes, off, len)
              require(img != null, "undecodable MJPG frame")
              var sum = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  sum += (img.getRGB(x, y) & 0xffffff); x += 1
                }
                y += 1
              }
              Row(id, f.toLong, "mjpg", img.getWidth, img.getHeight,
                img.getRGB(0, 0) & 0xffffff, sum)
            }
          }.iterator
        } catch {
          case _: Exception =>
            Iterator.single(Row(id, null, null, null, null, null, null))
        }
      }
    }(org.apache.spark.sql.Encoders.row(videoFramesSchema))
  }
}
