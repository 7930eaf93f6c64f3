package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata alongside. The container
  * has no image/audio codecs, so the DECODE step is a deterministic
  * stub ([[stubDecode]]) — but everything Spark-side is real and
  * tested: schema contract, partition-preserving `mapPartitions`
  * batch shape (the Scala analogue of `mapInPandas`), and
  * projection-friendly metadata extraction.
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

  /** Output contract of the resize stage. */
  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("out_w", IntegerType),
    StructField("out_h", IntegerType),
    StructField("scale_x", DoubleType),
    StructField("scale_y", DoubleType)))

  /** Resize stub over decoded metadata: computes the aspect-preserving
    * fit into `targetW x targetH` (the real op would also transform the
    * pixel buffer; the geometry, schema, and per-partition batch shape
    * are the production plumbing). Pure column math — stays in codegen. */
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

  /** Frame-sampling stub: treats the payload as `frameLen`-byte frames
    * and emits every `stride`-th one — the explode-per-frame dataflow
    * (row count multiplies, payload bytes stay partition-local) with a
    * deterministic fake splitter standing in for a video demuxer. */
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
}
