package graft.encode

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal hand-rolled `tf.train.Example` protobuf wire codec.
  *
  * The reference emits serialized `tf.train.Example` bytes as its only
  * payload format (`feast_component/converters.py:50-53`,
  * `executor.py:141-147`). No protobuf-java or TensorFlow jars exist on
  * this classpath, so we write the wire format directly from the public
  * proto definitions (tensorflow/core/example/{example,feature}.proto):
  *
  * {{{
  * message Example  { Features features = 1; }
  * message Features { map<string, Feature> feature = 1; }
  * message Feature  { oneof kind {
  *   BytesList bytes_list = 1; FloatList float_list = 2; Int64List int64_list = 3; } }
  * message BytesList { repeated bytes value = 1; }
  * message FloatList { repeated float value = 1 [packed=true]; }
  * message Int64List { repeated int64 value = 1 [packed=true]; }
  * }}}
  *
  * A map<string, Feature> serializes as a repeated embedded message with
  * key=field 1 (string), value=field 2 (message). We emit keys in sorted
  * order so encoding is deterministic. A decoder lives alongside the
  * encoder because tests must round-trip without TF on the classpath.
  */
object TfExample {

  sealed trait FeatureValue
  final case class Int64s(values: Seq[Long]) extends FeatureValue
  final case class Floats(values: Seq[Float]) extends FeatureValue
  final case class Bytes(values: Seq[Array[Byte]]) extends FeatureValue
  /** NULL input → feature present with no kind set (reference behavior
    * for null BigQuery values: key kept, empty feature). */
  case object Empty extends FeatureValue

  // ---------------------------------------------------------------- encode

  def encode(features: collection.Map[String, FeatureValue]): Array[Byte] = {
    val featuresMsg = new ProtoOut
    features.toSeq.sortBy(_._1).foreach { case (name, value) =>
      val entry = new ProtoOut
      entry.writeBytesField(1, name.getBytes(UTF_8))
      entry.writeBytesField(2, encodeFeature(value))
      featuresMsg.writeBytesField(1, entry.toByteArray)
    }
    val example = new ProtoOut
    example.writeBytesField(1, featuresMsg.toByteArray)
    example.toByteArray
  }

  private def encodeFeature(v: FeatureValue): Array[Byte] = {
    val out = new ProtoOut
    v match {
      case Bytes(vs) =>
        val list = new ProtoOut
        vs.foreach(b => list.writeBytesField(1, b))
        out.writeBytesField(1, list.toByteArray)
      case Floats(vs) =>
        val list = new ProtoOut
        val packed = new ProtoOut
        vs.foreach(f => packed.writeFixed32(java.lang.Float.floatToIntBits(f)))
        list.writeBytesField(1, packed.toByteArray)
        out.writeBytesField(2, list.toByteArray)
      case Int64s(vs) =>
        val list = new ProtoOut
        val packed = new ProtoOut
        vs.foreach(packed.writeVarint)
        list.writeBytesField(1, packed.toByteArray)
        out.writeBytesField(3, list.toByteArray)
      case Empty => // no kind set
    }
    out.toByteArray
  }

  private final class ProtoOut {
    private val buf = new ByteArrayOutputStream(64)
    def writeVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { buf.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      buf.write(v.toInt)
    }
    def writeFixed32(v: Int): Unit = {
      buf.write(v & 0xff); buf.write((v >>> 8) & 0xff)
      buf.write((v >>> 16) & 0xff); buf.write((v >>> 24) & 0xff)
    }
    /** tag(field, wire=2) + length + bytes */
    def writeBytesField(field: Int, bytes: Array[Byte]): Unit = {
      writeVarint((field << 3) | 2); writeVarint(bytes.length.toLong)
      buf.write(bytes, 0, bytes.length)
    }
    def toByteArray: Array[Byte] = buf.toByteArray
  }

  // ------------------------------------------------------- SequenceExample

  /** Serialize a `tf.train.SequenceExample`
    * (tensorflow/core/example/example.proto):
    *
    * {{{
    * message SequenceExample { Features context = 1; FeatureLists feature_lists = 2; }
    * message FeatureLists   { map<string, FeatureList> feature_list = 1; }
    * message FeatureList    { repeated Feature feature = 1; }
    * }}}
    *
    * The reference DECLARES this format but its converter always raises
    * (`feast_component/converters.py:55-57`, dispatched at
    * `executor.py:148-149`); we implement it for real: scalar columns →
    * context features, sequence columns → one Feature per step. */
  def encodeSequence(
      context: collection.Map[String, FeatureValue],
      featureLists: collection.Map[String, Seq[FeatureValue]]): Array[Byte] = {
    val contextMsg = new ProtoOut
    context.toSeq.sortBy(_._1).foreach { case (name, value) =>
      val entry = new ProtoOut
      entry.writeBytesField(1, name.getBytes(UTF_8))
      entry.writeBytesField(2, encodeFeature(value))
      contextMsg.writeBytesField(1, entry.toByteArray)
    }
    val listsMsg = new ProtoOut
    featureLists.toSeq.sortBy(_._1).foreach { case (name, steps) =>
      val listMsg = new ProtoOut
      steps.foreach(step => listMsg.writeBytesField(1, encodeFeature(step)))
      val entry = new ProtoOut
      entry.writeBytesField(1, name.getBytes(UTF_8))
      entry.writeBytesField(2, listMsg.toByteArray)
      listsMsg.writeBytesField(1, entry.toByteArray)
    }
    val seqExample = new ProtoOut
    seqExample.writeBytesField(1, contextMsg.toByteArray)
    seqExample.writeBytesField(2, listsMsg.toByteArray)
    seqExample.toByteArray
  }

  /** Parse serialized SequenceExample bytes (test oracle). */
  def decodeSequence(
      bytes: Array[Byte]): (Map[String, FeatureValue], Map[String, Seq[FeatureValue]]) = {
    val in = new ProtoIn(bytes, 0, bytes.length)
    var context = Map.empty[String, FeatureValue]
    var lists = Map.empty[String, Seq[FeatureValue]]
    while (in.hasRemaining) {
      val (field, wire) = in.readTag()
      (field, wire) match {
        case (1, 2) => context = decodeFeatureMap(in.readLenDelimited())
        case (2, 2) =>
          val listsIn = in.readLenDelimited()
          while (listsIn.hasRemaining) {
            val (f2, w2) = listsIn.readTag()
            if (f2 == 1 && w2 == 2) {
              val entry = listsIn.readLenDelimited()
              var key = ""; var steps = Seq.empty[FeatureValue]
              while (entry.hasRemaining) {
                val (f3, w3) = entry.readTag()
                (f3, w3) match {
                  case (1, 2) => key = new String(entry.readLenDelimited().slice(), UTF_8)
                  case (2, 2) =>
                    val listIn = entry.readLenDelimited()
                    while (listIn.hasRemaining) {
                      val (f4, w4) = listIn.readTag()
                      if (f4 == 1 && w4 == 2) steps :+= decodeFeature(listIn.readLenDelimited())
                      else listIn.skip(w4)
                    }
                  case _ => entry.skip(w3)
                }
              }
              lists += key -> steps
            } else listsIn.skip(w2)
          }
        case (_, w) => in.skip(w)
      }
    }
    (context, lists)
  }

  /** Parse a `Features` message body into its feature map. */
  private def decodeFeatureMap(features: ProtoIn): Map[String, FeatureValue] = {
    var out = Map.empty[String, FeatureValue]
    while (features.hasRemaining) {
      val (f2, w2) = features.readTag()
      if (f2 == 1 && w2 == 2) {
        val entry = features.readLenDelimited()
        var key = ""; var value: FeatureValue = Empty
        while (entry.hasRemaining) {
          val (f3, w3) = entry.readTag()
          (f3, w3) match {
            case (1, 2) => key = new String(entry.readLenDelimited().slice(), UTF_8)
            case (2, 2) => value = decodeFeature(entry.readLenDelimited())
            case _      => entry.skip(w3)
          }
        }
        out += key -> value
      } else features.skip(w2)
    }
    out
  }

  // ---------------------------------------------------------------- decode

  /** Parse serialized Example bytes back to the feature map (test oracle). */
  def decode(bytes: Array[Byte]): Map[String, FeatureValue] = {
    val in = new ProtoIn(bytes, 0, bytes.length)
    var out = Map.empty[String, FeatureValue]
    while (in.hasRemaining) {
      val (field, wire) = in.readTag()
      if (field == 1 && wire == 2) out ++= decodeFeatureMap(in.readLenDelimited())
      else in.skip(wire)
    }
    out
  }

  private def decodeFeature(in: ProtoIn): FeatureValue = {
    var result: FeatureValue = Empty
    while (in.hasRemaining) {
      val (field, wire) = in.readTag()
      (field, wire) match {
        case (1, 2) => // BytesList
          val list = in.readLenDelimited()
          val vs = Seq.newBuilder[Array[Byte]]
          while (list.hasRemaining) {
            val (f, w) = list.readTag()
            if (f == 1 && w == 2) vs += list.readLenDelimited().slice()
            else list.skip(w)
          }
          result = Bytes(vs.result())
        case (2, 2) => // FloatList
          val list = in.readLenDelimited()
          val vs = Seq.newBuilder[Float]
          while (list.hasRemaining) {
            val (f, w) = list.readTag()
            if (f == 1 && w == 2) { // packed
              val packed = list.readLenDelimited()
              while (packed.hasRemaining)
                vs += java.lang.Float.intBitsToFloat(packed.readFixed32())
            } else if (f == 1 && w == 5) vs += java.lang.Float.intBitsToFloat(list.readFixed32())
            else list.skip(w)
          }
          result = Floats(vs.result())
        case (3, 2) => // Int64List
          val list = in.readLenDelimited()
          val vs = Seq.newBuilder[Long]
          while (list.hasRemaining) {
            val (f, w) = list.readTag()
            if (f == 1 && w == 2) { // packed
              val packed = list.readLenDelimited()
              while (packed.hasRemaining) vs += packed.readVarint()
            } else if (f == 1 && w == 0) vs += list.readVarint()
            else list.skip(w)
          }
          result = Int64s(vs.result())
        case (_, w) => in.skip(w)
      }
    }
    result
  }

  private final class ProtoIn(bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasRemaining: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0; var v = 0L
      while ({ val b = bytes(pos); pos += 1; v |= (b & 0x7fL) << shift; shift += 7; (b & 0x80) != 0 }) ()
      v
    }
    def readTag(): (Int, Int) = { val t = readVarint(); ((t >>> 3).toInt, (t & 7).toInt) }
    def readFixed32(): Int = {
      val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
        ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def readLenDelimited(): ProtoIn = {
      val len = readVarint().toInt
      val sub = new ProtoIn(bytes, pos, pos + len); pos += len; sub
    }
    def slice(): Array[Byte] = java.util.Arrays.copyOfRange(bytes, pos, end)
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint(); ()
      case 1 => pos += 8
      case 2 => val len = readVarint().toInt; pos += len
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }
}
