package graft.types

import org.apache.spark.sql.types._

import graft.ranges.{Bound, ScanRange}
import CoderUtil._

/** Order-preserving encoding in the style of Apache Phoenix's public byte
  * format (reference behavior: core/.../types/Phoenix.scala; format re-derived
  * clean-room from the public Phoenix docs — sign-bit-flipped integers,
  * bit-complemented negative floats):
  *
  *  - integers: big-endian with the sign bit XOR-ed, so byte order == value
  *    order (no sign-split needed at planning time);
  *  - floats/doubles: IEEE754 bits; positives get the sign bit set, negatives
  *    are fully complemented — the classic total-order float trick;
  *  - strings: UTF-8 as-is; booleans 0x00/0x01; binary raw.
  */
object PhoenixCoder extends FieldCoder {

  override def name: String = FieldCoder.Phoenix

  override def preservesOrdering(dt: DataType): Boolean = true

  /** The whole point of the Phoenix format: sign-flipped ints and
    * totally-ordered float bits make byte order the VALUE order for every
    * supported type — no planning-time compensation anywhere. */
  override def byteOrderIsValueOrder(dt: DataType): Boolean = true

  override def supportsComposite: Boolean = true

  override def byteWidth(dt: DataType): Int = dt match {
    case BooleanType | ByteType => 1
    case ShortType => 2
    case IntegerType | FloatType => 4
    case LongType | DoubleType => 8
    case StringType | BinaryType => -1
    case MapType(_, _, _) => -1
    case _ => throw new UnsupportedOperationException(s"Phoenix cannot encode $dt")
  }

  private def flipSignInt(v: Int): Int = v ^ Int.MinValue
  private def flipSignLong(v: Long): Long = v ^ Long.MinValue

  private def orderFloatBits(f: Float): Int = {
    val bits = java.lang.Float.floatToIntBits(f)
    if (bits < 0) ~bits else bits ^ Int.MinValue
  }
  private def orderDoubleBits(d: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(d)
    if (bits < 0) ~bits else bits ^ Long.MinValue
  }

  override def encode(dt: DataType, v: Any): Array[Byte] = dt match {
    case BooleanType => Array(if (v.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
    case ByteType    => Array((v.asInstanceOf[Byte] ^ 0x80).toByte)
    case ShortType   => bytesShort((v.asInstanceOf[Short] ^ 0x8000).toShort)
    case IntegerType => bytesInt(flipSignInt(v.asInstanceOf[Int]))
    case LongType    => bytesLong(flipSignLong(v.asInstanceOf[Long]))
    case FloatType   => bytesInt(orderFloatBits(v.asInstanceOf[Float]))
    case DoubleType  => bytesLong(orderDoubleBits(v.asInstanceOf[Double]))
    case StringType  => v.toString.getBytes("UTF-8")
    case BinaryType  => v.asInstanceOf[Array[Byte]]
    case _ => throw new UnsupportedOperationException(s"Phoenix cannot encode $dt")
  }

  override def decode(dt: DataType, b: Array[Byte], off: Int, len: Int): Any = dt match {
    case BooleanType => b(off) != 0
    case ByteType    => (b(off) ^ 0x80).toByte
    case ShortType   => (readShort(b, off) ^ 0x8000).toShort
    case IntegerType => flipSignInt(readInt(b, off))
    case LongType    => flipSignLong(readLong(b, off))
    case FloatType   =>
      val bits = readInt(b, off)
      java.lang.Float.intBitsToFloat(if (bits < 0) bits ^ Int.MinValue else ~bits)
    case DoubleType  =>
      val bits = readLong(b, off)
      java.lang.Double.longBitsToDouble(if (bits < 0) bits ^ Long.MinValue else ~bits)
    case StringType  => new String(b, off, len, "UTF-8")
    case BinaryType  => java.util.Arrays.copyOfRange(b, off, off + len)
    case MapType(_, vt, _) => decode(vt, b, off, len)
    case _ => throw new UnsupportedOperationException(s"Phoenix cannot decode $dt")
  }

  /** Order-preserving ⇒ a comparison is always one contiguous byte range. */
  override def lessRanges(dt: DataType, v: Any, incl: Boolean): Seq[ScanRange[Array[Byte]]] =
    Seq(ScanRange(Bound.negInf, Bound(Some(encode(dt, v)), incl)))

  override def greaterRanges(dt: DataType, v: Any, incl: Boolean): Seq[ScanRange[Array[Byte]]] =
    Seq(ScanRange(Bound(Some(encode(dt, v)), incl), Bound.posInf))
}
