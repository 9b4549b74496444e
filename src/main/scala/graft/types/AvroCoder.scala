package graft.types

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ranges.{Bound, ScanRange}

/** Avro-encoded columns: whole records, arrays, or primitives serialized as
  * raw Avro binary in a single cell. Schema conversion and serde semantics
  * follow the reference (core/.../types/Avro.scala:83-426), rebuilt on
  * Avro 1.12:
  *  - record→struct (Row), array→ArrayType, map(string→V)→MapType;
  *  - unions: [T,"null"]→nullable T, [int,long]→long, [float,double]→double;
  *  - bytes/fixed→binary, enum→string.
  *
  * Avro binary does not sort lexicographically, so Avro row keys disable
  * range pruning (preservesOrdering=false; reference SHCDataType.scala:30-34).
  */
final class AvroCoder(schemaJson: String) extends FieldCoder {

  @transient private lazy val schema: Schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val writer = new GenericDatumWriter[Any](schema, GenericData.get())
  @transient private lazy val reader = new GenericDatumReader[Any](schema, schema, GenericData.get())

  override def name: String = FieldCoder.Avro
  override def preservesOrdering(dt: DataType): Boolean = false
  override def supportsComposite: Boolean = false
  override def byteWidth(dt: DataType): Int = -1

  override def encode(dt: DataType, v: Any): Array[Byte] = {
    val avroValue = AvroCoder.toAvro(v, schema)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().directBinaryEncoder(out, null)
    writer.write(avroValue, enc)
    enc.flush()
    out.toByteArray
  }

  override def decode(dt: DataType, b: Array[Byte], off: Int, len: Int): Any = {
    val dec = DecoderFactory.get().binaryDecoder(b, off, len, null)
    AvroCoder.fromAvro(reader.read(null, dec), schema)
  }

  override def lessRanges(dt: DataType, v: Any, incl: Boolean): Seq[ScanRange[Array[Byte]]] =
    Seq(ScanRange.all)
  override def greaterRanges(dt: DataType, v: Any, incl: Boolean): Seq[ScanRange[Array[Byte]]] =
    Seq(ScanRange.all)
}

object AvroCoder {

  def sqlTypeFor(schemaJson: String): DataType =
    toSqlType(new Schema.Parser().parse(schemaJson))

  /** Avro schema → Spark SQL type (reference Avro.scala:83-135). */
  def toSqlType(s: Schema): DataType = s.getType match {
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.map { f =>
        StructField(f.name(), toSqlType(f.schema()), nullable = isNullable(f.schema()))
      }.toSeq)
    case Schema.Type.ARRAY =>
      ArrayType(toSqlType(s.getElementType), containsNull = isNullable(s.getElementType))
    case Schema.Type.MAP =>
      MapType(StringType, toSqlType(s.getValueType), valueContainsNull = isNullable(s.getValueType))
    case Schema.Type.UNION => unionToSql(s)
    case Schema.Type.NULL  => NullType
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  /** Union flattening (reference Avro.scala:115-131): [T,null]→T nullable,
    * [int,long]→long, [float,double]→double. */
  private def unionToSql(s: Schema): DataType = {
    val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
    branches.map(_.getType).toList match {
      case t :: Nil => toSqlType(branches.head)
      case List(Schema.Type.INT, Schema.Type.LONG) | List(Schema.Type.LONG, Schema.Type.INT) => LongType
      case List(Schema.Type.FLOAT, Schema.Type.DOUBLE) | List(Schema.Type.DOUBLE, Schema.Type.FLOAT) => DoubleType
      case _ =>
        throw new UnsupportedOperationException(s"unsupported Avro union: $s")
    }
  }

  /** Spark external value (Row/Seq/Map/primitive) → Avro generic value. */
  def toAvro(v: Any, s: Schema): Any = {
    if (v == null) return null
    s.getType match {
      case Schema.Type.UNION =>
        // Encode via the WIDEST branch of mixed-numeric unions, matching the
        // promotion unionToSql does on the decode path: a [int,long] union is
        // surfaced as LongType, so its values arrive as Long — encoding via
        // the first branch would silently truncate through intValue()
        // (likewise [float,double] through floatValue()). The datum writer
        // resolves the union tag from the runtime type, so handing it the
        // wide value selects the wide branch.
        val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        val branch =
          branches.find(_.getType == Schema.Type.LONG)
            .filter(_ => branches.exists(_.getType == Schema.Type.INT))
            .orElse(branches.find(_.getType == Schema.Type.DOUBLE)
              .filter(_ => branches.exists(_.getType == Schema.Type.FLOAT)))
            .getOrElse(branches.head)
        toAvro(v, branch)
      case Schema.Type.RECORD =>
        val rec = new GenericData.Record(s)
        val row = v.asInstanceOf[Row]
        s.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
          rec.put(i, toAvro(row.get(i), f.schema()))
        }
        rec
      case Schema.Type.ARRAY =>
        val elems = (v match {
          case seq: Seq[_] => seq
          case arr: Array[_] => arr.toSeq
          case it: java.util.List[_] => it.asScala.toSeq
        }).map(toAvro(_, s.getElementType))
        new GenericData.Array(s, elems.asJava)
      case Schema.Type.MAP =>
        v.asInstanceOf[Map[String, _]].map { case (k, x) => k -> toAvro(x, s.getValueType) }.asJava
      case Schema.Type.BYTES => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case Schema.Type.FIXED => new GenericData.Fixed(s, v.asInstanceOf[Array[Byte]])
      case Schema.Type.ENUM  => new GenericData.EnumSymbol(s, v.toString)
      // STRING also absorbs DecimalType values: the reference serializes
      // Spark decimals as their decimal string (Avro.scala:152,256) since
      // Avro <1.8 had no decimal logical type. BigDecimal/Decimal.toString
      // is the same plain representation.
      case Schema.Type.STRING => v.toString
      case Schema.Type.INT =>
        v match { case n: Number => n.intValue(); case x => x }
      case Schema.Type.LONG =>
        v match {
          // TimestampType maps to long epoch-millis on the write path
          // (reference Avro.scala:194,257-258: Timestamp.getTime)
          case t: java.sql.Timestamp => t.getTime
          case n: Number => n.longValue()
          case x => x
        }
      case Schema.Type.FLOAT =>
        v match { case n: Number => n.floatValue(); case x => x }
      case Schema.Type.DOUBLE =>
        v match { case n: Number => n.doubleValue(); case x => x }
      case _ => v
    }
  }

  /** Avro generic value → Spark external value. */
  def fromAvro(v: Any, s: Schema): Any = {
    if (v == null) return null
    s.getType match {
      case Schema.Type.UNION =>
        val branch = s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
        // promote mixed-numeric unions like the schema conversion does
        val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        if (branches.size > 1) {
          v match {
            case n: java.lang.Integer => n.longValue()
            case n: java.lang.Long    => n.longValue()
            case n: java.lang.Float   => n.doubleValue()
            case n: java.lang.Double  => n.doubleValue()
            case other => fromAvro(other, branches.head)
          }
        } else fromAvro(v, branch)
      case Schema.Type.RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(s.getFields.asScala.map(f => fromAvro(rec.get(f.pos()), f.schema())).toSeq)
      case Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[_]].asScala.map(fromAvro(_, s.getElementType)).toSeq
      case Schema.Type.MAP =>
        v.asInstanceOf[java.util.Map[_, _]].asScala.map { case (k, x) =>
          k.toString -> fromAvro(x, s.getValueType)
        }.toMap
      case Schema.Type.STRING | Schema.Type.ENUM =>
        v match { case u: Utf8 => u.toString; case x => x.toString }
      case Schema.Type.BYTES =>
        v match {
          case bb: java.nio.ByteBuffer =>
            val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
          case arr: Array[Byte] => arr
        }
      case Schema.Type.FIXED => v.asInstanceOf[GenericData.Fixed].bytes()
      case _ => v
    }
  }
}
