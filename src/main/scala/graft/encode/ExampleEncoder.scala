package graft.encode

import java.nio.charset.StandardCharsets.UTF_8
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Row → payload-bytes contract — the Spark shape of the reference's
  * `_Converter` ABC (`feast_component/converters.py:8-35`): one concrete
  * implementation per payload format, executed inside `mapPartitions`
  * (opaque bytes gain nothing from Catalyst columns).
  */
trait ExampleEncoder extends Serializable {
  def encode(schema: StructType, row: Row): Array[Byte]
}

/** Row → serialized `tf.train.Example`, with the reference's type
  * mapping (`converters.py:50-53` via tfx `row_to_example`; table in
  * SURVEY.md §1.2):
  *
  *   - integer/boolean       → int64_list (bool as 0/1)
  *   - float/double          → float_list (lossy float32, like the reference)
  *   - string                → bytes_list (UTF-8)
  *   - binary                → bytes_list
  *   - timestamp             → bytes_list of ISO-8601 UTC (documented choice)
  *   - date                  → bytes_list of yyyy-MM-dd
  *   - array<primitive>      → flattened into the same Feature's value list
  *   - NULL                  → feature present but empty (key kept)
  *   - struct/map/decimal…   → rejected (unsupported in the reference path too)
  */
object TfExampleEncoder extends ExampleEncoder {
  import TfExample._

  private val TsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").withZone(ZoneOffset.UTC)

  def encode(schema: StructType, row: Row): Array[Byte] = {
    val features = schema.fields.zipWithIndex.map { case (field, i) =>
      val value: FeatureValue =
        if (row.isNullAt(i)) Empty
        else field.dataType match {
          case ArrayType(elem, _) =>
            encodeSeq(elem, row.getSeq[Any](i).filter(_ != null), field.name)
          case dt => encodeSeq(dt, Seq(row.get(i)), field.name)
        }
      field.name -> value
    }.toMap
    TfExample.encode(features)
  }

  private[encode] def encodeSeq(dt: DataType, vs: Seq[Any], name: String): FeatureValue = dt match {
    case LongType    => Int64s(vs.map(_.asInstanceOf[Long]))
    case IntegerType => Int64s(vs.map(_.asInstanceOf[Int].toLong))
    case ShortType   => Int64s(vs.map(_.asInstanceOf[Short].toLong))
    case ByteType    => Int64s(vs.map(_.asInstanceOf[Byte].toLong))
    case BooleanType => Int64s(vs.map(v => if (v.asInstanceOf[Boolean]) 1L else 0L))
    case DoubleType  => Floats(vs.map(_.asInstanceOf[Double].toFloat))
    case FloatType   => Floats(vs.map(_.asInstanceOf[Float]))
    case StringType  => Bytes(vs.map(_.asInstanceOf[String].getBytes(UTF_8)))
    case BinaryType  => Bytes(vs.map(_.asInstanceOf[Array[Byte]]))
    case TimestampType =>
      Bytes(vs.map(v => TsFmt.format(v.asInstanceOf[java.sql.Timestamp].toInstant).getBytes(UTF_8)))
    case TimestampNTZType => // wall-clock without zone: rendered as-if UTC
      Bytes(vs.map(v =>
        TsFmt.format(v.asInstanceOf[java.time.LocalDateTime].toInstant(ZoneOffset.UTC)).getBytes(UTF_8)))
    case DateType =>
      Bytes(vs.map(v => v.asInstanceOf[java.sql.Date].toString.getBytes(UTF_8)))
    case other =>
      throw new IllegalArgumentException(
        s"column '$name': type $other is not representable as tf.train.Feature " +
          "(supported: int/long/bool -> int64_list, float/double -> float_list, " +
          "string/binary/timestamp/date -> bytes_list, plus arrays thereof)")
  }
}

/** Row → serialized `tf.train.SequenceExample`. The reference declares
  * this format but never implemented it (`converters.py:55-57` raises;
  * dispatch at `executor.py:148-149`) — here it is for real:
  *
  *   - scalar columns               → context features (same §1.2 mapping)
  *   - array<primitive> columns     → a FeatureList with ONE single-value
  *                                    Feature per element (each element
  *                                    is a sequence step)
  *   - array<array<primitive>>      → a FeatureList with one multi-value
  *                                    Feature per inner array
  *   - NULL                         → empty context feature / empty list
  */
object TfSequenceExampleEncoder extends ExampleEncoder {
  import TfExample._

  def encode(schema: StructType, row: Row): Array[Byte] = {
    var context = Map.empty[String, FeatureValue]
    var lists = Map.empty[String, Seq[FeatureValue]]
    schema.fields.zipWithIndex.foreach { case (field, i) =>
      field.dataType match {
        case ArrayType(ArrayType(inner, _), _) =>
          val steps =
            if (row.isNullAt(i)) Seq.empty[FeatureValue]
            else row.getSeq[Seq[Any]](i).map { innerVals =>
              if (innerVals == null) Empty
              else TfExampleEncoder.encodeSeq(
                inner, innerVals.filter(_ != null), field.name)
            }
          lists += field.name -> steps
        case ArrayType(elem, _) =>
          val steps =
            if (row.isNullAt(i)) Seq.empty[FeatureValue]
            else row.getSeq[Any](i).map { v =>
              if (v == null) Empty
              else TfExampleEncoder.encodeSeq(elem, Seq(v), field.name)
            }
          lists += field.name -> steps
        case dt =>
          val value: FeatureValue =
            if (row.isNullAt(i)) Empty
            else TfExampleEncoder.encodeSeq(dt, Seq(row.get(i)), field.name)
          context += field.name -> value
      }
    }
    TfExample.encodeSequence(context, lists)
  }
}
