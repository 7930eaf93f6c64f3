package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Real-codec multimodal coverage: the javax.imageio encode/decode
  * roundtrip must reproduce the generating parameters exactly (PNG and
  * BMP are lossless RGB), and undecodable payloads must degrade to
  * NULL fields, not task failures. */
class MultimodalSpec extends SparkSpec with Matchers {
  import scala.jdk.CollectionConverters._

  private def paramsDf(rows: Seq[(Long, Int, Int, String)]) = {
    import org.apache.spark.sql.{Row, types => T}
    spark.createDataFrame(
      rows.map { case (i, w, h, f) => Row(i, w, h, f) }.asJava,
      T.StructType(Seq(
        T.StructField("id", T.LongType, nullable = false),
        T.StructField("w", T.IntegerType, nullable = false),
        T.StructField("h", T.IntegerType, nullable = false),
        T.StructField("fmt", T.StringType, nullable = false))))
  }

  test("encodeImage→decodeImage roundtrips dims, format, and pixel checksum for PNG and BMP") {
    val params = Seq(
      (1L, 5, 9, "png"), (2L, 16, 4, "bmp"),
      (3L, 1, 1, "png"), (4L, 11, 7, "bmp"))
    val decoded = Multimodal.decodeImage(
      Multimodal.encodeImage(paramsDf(params), "id", "w", "h", "fmt"),
      "media_id", "payload")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    for ((id, w, h, fmt) <- params) {
      val expSum = (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.pixelValue(id, x, y).toLong).sum
      decoded(id) shouldBe ((fmt, w, h, expSum))
    }
  }

  test("decodeImage: undecodable payloads yield NULL fields, not failures") {
    import org.apache.spark.sql.{Row, types => T}
    val df = spark.createDataFrame(
      Seq(Row(7L, Array[Byte](1, 2, 3, 4)), Row(8L, Array.emptyByteArray)).asJava,
      T.StructType(Seq(
        T.StructField("media_id", T.LongType, nullable = false),
        T.StructField("payload", T.BinaryType, nullable = true))))
    val out = Multimodal.decodeImage(df, "media_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    out(7L).isNullAt(1) shouldBe true // format
    out(7L).isNullAt(2) shouldBe true // width
    out(8L).isNullAt(4) shouldBe true // pix_sum
  }

  test("encodeAudio→decodeAudio roundtrips rate, channels, frame count, and sample checksum") {
    import org.apache.spark.sql.{Row, types => T}
    val params = Seq((1L, 37), (2L, 256), (9L, 1))
    val df = spark.createDataFrame(
      params.map { case (i, n) => Row(i, n) }.asJava,
      T.StructType(Seq(
        T.StructField("id", T.LongType, nullable = false),
        T.StructField("n", T.IntegerType, nullable = false))))
    val out = Multimodal.decodeAudio(
      Multimodal.encodeAudio(df, "id", "n", sampleRate = 8000),
      "media_id", "payload")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5))).toMap
    for ((id, n) <- params) {
      val expSum = (0 until n).map(i => Multimodal.sampleValue(id, i).toLong).sum
      out(id) shouldBe (("PCM_SIGNED", 8000, 1, n.toLong, expSum))
    }
  }

  test("decodeAudio: non-16-bit payloads keep honest header fields but NULL the checksum") {
    import org.apache.spark.sql.{Row, types => T}
    // real 8-bit PCM WAV built with the same JDK codec
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val pcm = Array.tabulate[Byte](40)(i => (i * 5).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 40L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val df = spark.createDataFrame(
      Seq(Row(6L, bos.toByteArray)).asJava,
      T.StructType(Seq(
        T.StructField("media_id", T.LongType, nullable = false),
        T.StructField("payload", T.BinaryType, nullable = true))))
    val r = Multimodal.decodeAudio(df, "media_id", "payload").head()
    r.getInt(2) shouldBe 8000      // header fields stay real
    r.getInt(3) shouldBe 1
    r.getLong(4) shouldBe 40L
    r.isNullAt(5) shouldBe true    // checksum contract is 16-bit only
  }

  test("decodeAudio: garbage payloads degrade to NULL fields") {
    import org.apache.spark.sql.{Row, types => T}
    val df = spark.createDataFrame(
      Seq(Row(3L, Array[Byte](82, 73, 70, 70)), Row(4L, Array.emptyByteArray)).asJava,
      T.StructType(Seq(
        T.StructField("media_id", T.LongType, nullable = false),
        T.StructField("payload", T.BinaryType, nullable = true))))
    val out = Multimodal.decodeAudio(df, "media_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    out(3L).isNullAt(1) shouldBe true
    out(4L).isNullAt(5) shouldBe true
  }

  test("decodeImage detects format from bytes regardless of what the writer was told") {
    // encode as PNG, hand the payload over with no format metadata at
    // all — detection must come from the byte signature
    val dec = Multimodal.decodeImage(
      Multimodal.encodeImage(paramsDf(Seq((42L, 6, 6, "png"))), "id", "w", "h", "fmt")
        .select(col("media_id"), col("payload")),
      "media_id", "payload").head()
    dec.getString(1) shouldBe "png"
    dec.getInt(2) shouldBe 6
  }

  private def clipsDf(rows: Seq[(Long, Int)]) = {
    import org.apache.spark.sql.{Row, types => T}
    spark.createDataFrame(
      rows.map { case (i, n) => Row(i, n) }.asJava,
      T.StructType(Seq(
        T.StructField("id", T.LongType, nullable = false),
        T.StructField("n", T.IntegerType, nullable = false))))
  }

  test("convertAudio: mono→stereo duplicates samples — checksum exactly 2x, frames kept") {
    val params = Seq((1L, 64), (2L, 191), (3L, 1))
    val out = Multimodal.convertAudio(
      Multimodal.encodeAudio(clipsDf(params), "id", "n", sampleRate = 8000),
      "media_id", "payload", targetRate = 8000, targetChannels = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    for ((id, n) <- params) {
      val monoSum = (0 until n).map(Multimodal.sampleValue(id, _).toLong).sum
      out(id) shouldBe ((8000, 2, n.toLong, 2 * monoSum))
    }
  }

  test("convertAudio: rate downconversion resamples deterministically with sane framing") {
    val n = 800
    val conv = Multimodal.convertAudio(
      Multimodal.encodeAudio(clipsDf(Seq((5L, n))), "id", "n", sampleRate = 8000),
      "media_id", "payload", targetRate = 4000, targetChannels = 1)
    val r1 = conv.head()
    r1.getInt(1) shouldBe 4000
    r1.getInt(2) shouldBe 1
    // the JDK resampler interpolates — frame count lands NEAR n/2
    // (observed n/2 + 1 on this JDK) but the exact tail handling is
    // vendor-defined: assert a generous ~2:1 band so a JDK upgrade
    // can't fail the suite without an actual behavior break; values
    // must still be deterministic across evaluations
    r1.getLong(3) should (be >= (n / 2 - 16).toLong and be <= (n / 2 + 16).toLong)
    val r2 = conv.head()
    r2.getLong(3) shouldBe r1.getLong(3)
    r2.getLong(4) shouldBe r1.getLong(4)
  }

  test("convertAudio: garbage payloads degrade to NULL fields") {
    import org.apache.spark.sql.{Row, types => T}
    val df = spark.createDataFrame(
      Seq(Row(9L, Array[Byte](1, 2, 3))).asJava,
      T.StructType(Seq(
        T.StructField("media_id", T.LongType, nullable = false),
        T.StructField("payload", T.BinaryType, nullable = true))))
    val r = Multimodal.convertAudio(df, "media_id", "payload", 8000, 2).head()
    r.getLong(0) shouldBe 9L
    (1 to 4).foreach(i => r.isNullAt(i) shouldBe true)
  }

  test("fitDims: integer aspect fit binds the right side and clamps degenerate aspects") {
    Multimodal.fitDims(10, 5, 8, 8) shouldBe ((8, 4))   // width binds
    Multimodal.fitDims(5, 10, 8, 8) shouldBe ((4, 8))   // height binds
    Multimodal.fitDims(8, 8, 8, 8) shouldBe ((8, 8))    // exact
    Multimodal.fitDims(4, 4, 8, 8) shouldBe ((8, 8))    // upscale
    Multimodal.fitDims(1000, 1, 8, 8) shouldBe ((8, 1)) // clamp at 1px
    Multimodal.fitDims(1, 1000, 8, 8) shouldBe ((1, 8))
  }

  test("resizeImage: NN resample checksum matches the pixelValue contract, up and down") {
    val params = Seq(
      (1L, 16, 4, "png"),  // downscale, width binds
      (2L, 4, 16, "bmp"),  // downscale, height binds
      (3L, 3, 5, "png"),   // upscale
      (4L, 8, 8, "bmp"))   // identity fit
    val out = Multimodal.resizeImage(
      Multimodal.encodeImage(paramsDf(params), "id", "w", "h", "fmt"),
      "media_id", "payload", targetW = 8, targetH = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
          r.getLong(6))).toMap
    for ((id, w, h, fmt) <- params) {
      val (ow, oh) = Multimodal.fitDims(w, h, 8, 8)
      // NN kernel replayed from the contract: resized (ox, oy) reads
      // source (ox*w DIV ow, oy*h DIV oh), whose RGB is pixelValue
      val expSum = (for (oy <- 0 until oh; ox <- 0 until ow) yield
        Multimodal.pixelValue(id, ox * w / ow, oy * h / oh).toLong).sum
      out(id) shouldBe ((fmt, w, h, ow, oh, expSum))
    }
  }

  test("resizeImage: undecodable payloads degrade to NULL fields") {
    import org.apache.spark.sql.{Row, types => T}
    val df = spark.createDataFrame(
      Seq(Row(7L, Array[Byte](9, 9, 9))).asJava,
      T.StructType(Seq(
        T.StructField("media_id", T.LongType, nullable = false),
        T.StructField("payload", T.BinaryType, nullable = true))))
    val r = Multimodal.resizeImage(df, "media_id", "payload", 8, 8).head()
    r.getLong(0) shouldBe 7L
    (1 to 6).foreach(i => r.isNullAt(i) shouldBe true)
  }

  private def videoParamsDf(rows: Seq[(Long, Int, Int, Int, String)]) = {
    import org.apache.spark.sql.{Row, types => T}
    spark.createDataFrame(
      rows.map { case (i, n, w, h, c) => Row(i, n, w, h, c) }.asJava,
      T.StructType(Seq(
        T.StructField("id", T.LongType, nullable = false),
        T.StructField("n", T.IntegerType, nullable = false),
        T.StructField("w", T.IntegerType, nullable = false),
        T.StructField("h", T.IntegerType, nullable = false),
        T.StructField("codec", T.StringType, nullable = false))))
  }

  test("encodeVideo→sampleVideoFrames: DIB demux matches the framePixel contract, incl. un-flip") {
    // odd widths exercise the 4-byte DIB row padding; (0,0) pins the
    // bottom-up un-flip that the orientation-blind checksum cannot
    val params = Seq(
      (1L, 5, 5, 3, "dib"), (2L, 1, 4, 4, "dib"),
      (3L, 8, 7, 2, "dib"), (4L, 3, 1, 6, "dib"))
    val out = Multimodal.sampleVideoFrames(
      Multimodal.encodeVideo(videoParamsDf(params), "id", "n", "w", "h", "codec"),
      "media_id", "payload", stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getLong(6))).toMap
    val expKeys = params.flatMap { case (id, n, _, _, _) =>
      (0 until n by 2).map(f => (id, f.toLong)) }
    out.keySet shouldBe expKeys.toSet
    for ((id, n, w, h, _) <- params; f <- 0 until n by 2) {
      val expSum = (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.framePixel(id, f, x, y).toLong).sum
      out((id, f.toLong)) shouldBe
        (("dib", w, h, Multimodal.framePixel(id, f, 0, 0), expSum))
    }
  }

  test("sampleVideoFrames: MJPG frames decode through the real JDK JPEG reader") {
    val params = Seq((11L, 4, 16, 8, "mjpg"), (12L, 2, 24, 24, "mjpg"))
    val run = () => Multimodal.sampleVideoFrames(
      Multimodal.encodeVideo(videoParamsDf(params), "id", "n", "w", "h", "codec"),
      "media_id", "payload", stride = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getInt(3), r.getInt(4), r.getLong(6))).toMap
    val out = run()
    out.size shouldBe 6 // every frame, stride 1
    for ((id, n, w, h, _) <- params; f <- 0 until n) {
      val (codec, ow, oh, sum) = out((id, f.toLong))
      codec shouldBe "mjpg"
      ow shouldBe w
      oh shouldBe h
      // JPEG is lossy — the value is unpinned, but it must be a real
      // decoded raster (bounded by 24-bit range) and deterministic
      sum should (be >= 0L and be <= w.toLong * h * 0xffffff)
    }
    run() shouldBe out
  }

  test("sampleVideoFrames: non-AVI and truncated payloads degrade to one NULL row") {
    import org.apache.spark.sql.{Row, types => T}
    val good = Multimodal.encodeVideo(
      videoParamsDf(Seq((5L, 3, 4, 4, "dib"))), "id", "n", "w", "h", "codec")
      .head().getAs[Array[Byte]]("payload")
    val df = spark.createDataFrame(
      Seq(Row(7L, Array[Byte](1, 2, 3, 4)),
        Row(8L, java.util.Arrays.copyOfRange(good, 0, good.length / 2)),
        Row(9L, good)).asJava,
      T.StructType(Seq(
        T.StructField("media_id", T.LongType, nullable = false),
        T.StructField("payload", T.BinaryType, nullable = true))))
    val out = Multimodal.sampleVideoFrames(df, "media_id", "payload", 1)
      .collect().groupBy(_.getLong(0))
    out(7L).length shouldBe 1
    out(7L).head.isNullAt(1) shouldBe true // frame_idx NULL marks corrupt
    out(8L).length shouldBe 1
    out(8L).head.isNullAt(6) shouldBe true
    out(9L).length shouldBe 3              // the intact sibling still demuxes
    out(9L).map(_.getLong(1)).sorted shouldBe Array(0L, 1L, 2L)
  }

  test("sampleVideoFrames: a deeply-nested LIST bomb degrades to NULL, not StackOverflowError") {
    import org.apache.spark.sql.{Row, types => T}
    // ~100k nested 12-byte LIST chunks in a valid RIFF envelope: the
    // recursion this depth would overflow the task stack as an Error,
    // escaping the Exception degrade guard; the depth cap must turn
    // it into the one-NULL-row contract instead.
    val levels = 100000
    val total = 12 + levels * 12
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
      .put("AVI ".getBytes("US-ASCII"))
    for (i <- 0 until levels)
      buf.put("LIST".getBytes("US-ASCII")).putInt((levels - i) * 12 - 8)
        .put("hdrl".getBytes("US-ASCII"))
    val df = spark.createDataFrame(
      Seq(Row(42L, buf.array())).asJava,
      T.StructType(Seq(
        T.StructField("media_id", T.LongType, nullable = false),
        T.StructField("payload", T.BinaryType, nullable = true))))
    val out = Multimodal.sampleVideoFrames(df, "media_id", "payload", 1).collect()
    out.length shouldBe 1
    out.head.getLong(0) shouldBe 42L
    out.head.isNullAt(1) shouldBe true
  }

  test("imageFeatures: channel sums and pooled grid match the pixelValue contract") {
    val params = Seq((1L, 5, 9, "png"), (2L, 16, 4, "bmp"), (3L, 2, 2, "png"))
    val out = Multimodal.imageFeatures(
      Multimodal.encodeImage(paramsDf(params), "id", "w", "h", "fmt"),
      "media_id", "payload", pool = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((id, w, h, _) <- params) {
      var rs = 0L; var gs = 0L; var bs = 0L
      val cells = Array.fill(4)(0L)
      for (y <- 0 until h; x <- 0 until w) {
        val v = Multimodal.pixelValue(id, x, y)
        rs += (v >> 16) & 0xff; gs += (v >> 8) & 0xff; bs += v & 0xff
        cells((x * 2 / w) * 2 + (y * 2 / h)) += ((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)
      }
      val r = out(id)
      (r.getInt(1), r.getInt(2)) shouldBe ((w, h))
      (r.getLong(3), r.getLong(4), r.getLong(5)) shouldBe ((rs, gs, bs))
      (0 until 4).map(i => r.getLong(6 + i)) shouldBe cells.toSeq
    }
  }

  test("imageFeatures: undecodable payloads degrade to NULL fields") {
    import org.apache.spark.sql.{Row, types => T}
    val df = spark.createDataFrame(
      Seq(Row(7L, Array[Byte](1, 2, 3))).asJava,
      T.StructType(Seq(
        T.StructField("media_id", T.LongType, nullable = false),
        T.StructField("payload", T.BinaryType, nullable = true))))
    val r = Multimodal.imageFeatures(df, "media_id", "payload", pool = 2).head()
    r.getLong(0) shouldBe 7L
    (1 to 9).foreach(i => r.isNullAt(i) shouldBe true)
  }

  test("audioFeatures: windowed DC/energy/power sums match the sampleValue contract") {
    val params = Seq((1L, 37), (2L, 256), (9L, 4))
    val out = Multimodal.audioFeatures(
      Multimodal.encodeAudio(clipsDf(params), "id", "n", sampleRate = 8000),
      "media_id", "payload", windows = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    for ((id, n) <- params; w <- 0 until 4) {
      val ss = (0 until n).filter(i => i.toLong * 4 / n == w)
        .map(Multimodal.sampleValue(id, _).toLong)
      out((id, w)) shouldBe
        ((ss.size.toLong, ss.sum, ss.map(math.abs).sum, ss.map(s => s * s).sum))
    }
  }

  test("audioFeatures: clips shorter than `windows` emit fixed-shape zero rows for empty spans") {
    val out = Multimodal.audioFeatures(
      Multimodal.encodeAudio(clipsDf(Seq((3L, 2))), "id", "n", sampleRate = 8000),
      "media_id", "payload", windows = 4)
      .collect().map(r => r.getInt(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    out.keySet shouldBe Set(0, 1, 2, 3) // ALL windows present — fixed shape
    // 2 samples land in windows 0 and 2 (i*4 DIV 2); 1 and 3 are empty
    val s0 = Multimodal.sampleValue(3L, 0).toLong
    val s1 = Multimodal.sampleValue(3L, 1).toLong
    out(0) shouldBe ((1L, s0, math.abs(s0), s0 * s0))
    out(2) shouldBe ((1L, s1, math.abs(s1), s1 * s1))
    out(1) shouldBe ((0L, 0L, 0L, 0L))
    out(3) shouldBe ((0L, 0L, 0L, 0L))
  }

  test("audioFeatures: non-16-bit and garbage payloads degrade to one NULL row") {
    import org.apache.spark.sql.{Row, types => T}
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val pcm = Array.tabulate[Byte](40)(i => (i * 3).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 40L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val df = spark.createDataFrame(
      Seq(Row(6L, bos.toByteArray), Row(7L, Array[Byte](1, 2))).asJava,
      T.StructType(Seq(
        T.StructField("media_id", T.LongType, nullable = false),
        T.StructField("payload", T.BinaryType, nullable = true))))
    val out = Multimodal.audioFeatures(df, "media_id", "payload", 4)
      .collect().groupBy(_.getLong(0))
    out(6L).length shouldBe 1  // 8-bit clip: contract is 16-bit only
    out(6L).head.isNullAt(1) shouldBe true
    out(7L).head.isNullAt(5) shouldBe true
  }

  test("encodeAv→demux: both interleaved streams roundtrip — audio sums, video frames") {
    import org.apache.spark.sql.{Row, types => T}
    val params = Seq((1L, 3, 5, 4, 37), (2L, 2, 4, 4, 256), (9L, 5, 3, 3, 5))
    val df = spark.createDataFrame(
      params.map { case (i, nf, w, h, ns) => Row(i, nf, w, h, ns) }.asJava,
      T.StructType(Seq(
        T.StructField("id", T.LongType, nullable = false),
        T.StructField("nf", T.IntegerType, nullable = false),
        T.StructField("w", T.IntegerType, nullable = false),
        T.StructField("h", T.IntegerType, nullable = false),
        T.StructField("ns", T.IntegerType, nullable = false))))
    val av = Multimodal.encodeAv(df, "id", "nf", "w", "h", "ns")
      .localCheckpoint(true)
    // audio: full PCM reassembles across the interleaved 01wb slices
    val audio = Multimodal.demuxAviAudio(av, "media_id", "payload")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    for ((id, _, _, _, ns) <- params) {
      val expSum = (0 until ns).map(Multimodal.sampleValue(id, _).toLong).sum
      audio(id) shouldBe ((8000, 1, ns.toLong, expSum))
    }
    // video: frame demux ignores the audio chunks between frames
    val frames = Multimodal.sampleVideoFrames(av, "media_id", "payload", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(6)).toMap
    for ((id, nf, w, h, _) <- params; f <- 0 until nf) {
      val expSum = (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.framePixel(id, f, x, y).toLong).sum
      frames((id, f.toLong)) shouldBe expSum
    }
  }

  test("demuxAviAudio: video-only and corrupt containers degrade to NULL fields") {
    import org.apache.spark.sql.{Row, types => T}
    val videoOnly = Multimodal.encodeVideo(
      videoParamsDf(Seq((5L, 2, 4, 4, "dib"))), "id", "n", "w", "h", "codec")
      .select(col("media_id"), col("payload"))
    val garbage = spark.createDataFrame(
      Seq(Row(7L, Array[Byte](1, 2, 3))).asJava,
      T.StructType(Seq(
        T.StructField("media_id", T.LongType, nullable = false),
        T.StructField("payload", T.BinaryType, nullable = true))))
    val out = Multimodal.demuxAviAudio(videoOnly.union(garbage), "media_id", "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    out(5L).isNullAt(4) shouldBe true // no auds stream → NULL, not a crash
    out(7L).isNullAt(1) shouldBe true
  }

  test("AVI roundtrip property: 60 random geometries demux exactly, both streams, odd strides") {
    import org.apache.spark.sql.{Row, types => T}
    // seeded sweep across the layout branches: odd widths (DIB row
    // padding), 1-pixel edges, frame counts vs stride remainders,
    // audio slices that don't divide evenly across frames
    val rnd = new scala.util.Random(2026)
    val params = (1L to 60L).map { id =>
      (id, 1 + rnd.nextInt(12), 1 + rnd.nextInt(33),
        1 + rnd.nextInt(17), 1 + rnd.nextInt(300))
    }
    val df = spark.createDataFrame(
      params.map { case (i, nf, w, h, ns) => Row(i, nf, w, h, ns) }.asJava,
      T.StructType(Seq(
        T.StructField("id", T.LongType, nullable = false),
        T.StructField("nf", T.IntegerType, nullable = false),
        T.StructField("w", T.IntegerType, nullable = false),
        T.StructField("h", T.IntegerType, nullable = false),
        T.StructField("ns", T.IntegerType, nullable = false))))
    val av = Multimodal.encodeAv(df, "id", "nf", "w", "h", "ns")
      .localCheckpoint(true)
    for (stride <- Seq(1, 3)) {
      val frames = Multimodal.sampleVideoFrames(av, "media_id", "payload", stride)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getInt(3), r.getInt(4), r.getInt(5), r.getLong(6))).toMap
      val expKeys = params.flatMap { case (id, nf, _, _, _) =>
        (0 until nf by stride).map(f => (id, f.toLong)) }.toSet
      frames.keySet shouldBe expKeys
      for ((id, nf, w, h, _) <- params; f <- 0 until nf by stride) {
        val expSum = (for (y <- 0 until h; x <- 0 until w)
          yield Multimodal.framePixel(id, f, x, y).toLong).sum
        frames((id, f.toLong)) shouldBe
          ((w, h, Multimodal.framePixel(id, f, 0, 0), expSum))
      }
    }
    val audio = Multimodal.demuxAviAudio(av, "media_id", "payload")
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    for ((id, _, _, _, ns) <- params) {
      val expSum = (0 until ns).map(Multimodal.sampleValue(id, _).toLong).sum
      audio(id) shouldBe ((ns.toLong, expSum))
    }
  }

  test("encodeVideo rejects unknown codecs and non-positive geometry") {
    intercept[org.apache.spark.SparkException] {
      Multimodal.encodeVideo(
        videoParamsDf(Seq((1L, 2, 4, 4, "h264"))), "id", "n", "w", "h", "codec")
        .head()
    }
    intercept[org.apache.spark.SparkException] {
      Multimodal.encodeVideo(
        videoParamsDf(Seq((1L, 0, 4, 4, "dib"))), "id", "n", "w", "h", "codec")
        .head()
    }
  }
}
