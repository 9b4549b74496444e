package graft.datasource

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM-external ↔ Catalyst-internal value conversion for the reader/writer.
  * (Spark's own CatalystTypeConverters is private[sql]; this covers exactly
  * the types the catalog supports.) */
object CatalystConv {

  def toCatalyst(dt: DataType, v: Any): Any = {
    if (v == null) return null
    dt match {
      case StringType => UTF8String.fromString(v.toString)
      case BinaryType => v
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType => v
      case d: DecimalType =>
        Decimal(v.asInstanceOf[java.math.BigDecimal], d.precision, d.scale)
      case TimestampType =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .fromJavaTimestamp(v.asInstanceOf[java.sql.Timestamp])
      case MapType(kt, vt, _) =>
        val m = v.asInstanceOf[scala.collection.Map[_, _]]
        val keys = new GenericArrayData(m.keysIterator.map(toCatalyst(kt, _)).toArray[Any])
        val values = new GenericArrayData(m.valuesIterator.map(toCatalyst(vt, _)).toArray[Any])
        new ArrayBasedMapData(keys, values)
      case ArrayType(et, _) =>
        val seq = v match {
          case s: Seq[_] => s
          case a: Array[_] => a.toSeq
        }
        new GenericArrayData(seq.map(toCatalyst(et, _)).toArray[Any])
      case st: StructType =>
        val row = v.asInstanceOf[Row]
        new GenericInternalRow(
          st.fields.zipWithIndex.map { case (f, i) => toCatalyst(f.dataType, row.get(i)) })
      case _ => v
    }
  }

  def fromCatalyst(dt: DataType, v: Any): Any = {
    if (v == null) return null
    dt match {
      case StringType => v.asInstanceOf[UTF8String].toString
      case BinaryType => v
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType => v
      case _: DecimalType => v.asInstanceOf[Decimal].toJavaBigDecimal
      case TimestampType =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .toJavaTimestamp(v.asInstanceOf[Long])
      case MapType(kt, vt, _) =>
        val m = v.asInstanceOf[MapData]
        val keys = m.keyArray().toObjectArray(kt).map(fromCatalyst(kt, _))
        val values = m.valueArray().toObjectArray(vt).map(fromCatalyst(vt, _))
        keys.zip(values).toMap
      case ArrayType(et, _) =>
        v.asInstanceOf[ArrayData].toObjectArray(et).map(fromCatalyst(et, _)).toSeq
      case st: StructType =>
        val ir = v.asInstanceOf[InternalRow]
        Row.fromSeq(st.fields.zipWithIndex.map { case (f, i) =>
          fromCatalyst(f.dataType, ir.get(i, f.dataType))
        }.toSeq)
      case _ => v
    }
  }
}
