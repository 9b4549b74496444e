package graft.types

import org.apache.spark.sql.types._

import graft.ranges.ScanRange
import CoderUtil._

/** Big-endian "natural" encoding (reference: core/.../types/PrimitiveType.scala).
  *
  * Two's-complement integers and IEEE754 floats do NOT sort
  * lexicographically: negative ints sort above positives, and negative
  * floats sort reversed. The `lessRanges`/`greaterRanges` sign-splits below
  * reproduce the correctness-critical BoundRanges semantics
  * (reference ScanRange.scala:283-426) — the guard tests are the
  * negative-row-key query suites.
  */
object PrimitiveCoder extends FieldCoder {

  override def name: String = FieldCoder.Primitive

  /** Only unsigned-comparable encodings keep byte order == value order. */
  override def preservesOrdering(dt: DataType): Boolean = dt match {
    case StringType | BinaryType | BooleanType => true
    // signed numerics break lexicographic order, but the sign-split range
    // algebra compensates at scan-planning time, so row keys are allowed:
    case ShortType | IntegerType | LongType | FloatType | DoubleType | ByteType => true
    case _ => false
  }

  /** Strict byte-order identity holds only where no sign-split compensation
    * exists: raw UTF-8 / raw bytes / the 0x00-false 0xFF-true boolean. */
  override def byteOrderIsValueOrder(dt: DataType): Boolean = dt match {
    case StringType | BinaryType | BooleanType => true
    case _ => false
  }

  override def supportsComposite: Boolean = true

  override def byteWidth(dt: DataType): Int = dt match {
    case BooleanType | ByteType => 1
    case ShortType => 2
    case IntegerType | FloatType => 4
    case LongType | DoubleType => 8
    case StringType | BinaryType => -1
    case MapType(_, vt, _) => -1
    case _ => throw new UnsupportedOperationException(s"PrimitiveType cannot encode $dt")
  }

  override def encode(dt: DataType, v: Any): Array[Byte] = dt match {
    case BooleanType => Array(if (v.asInstanceOf[Boolean]) (-1).toByte else 0.toByte)
    case ByteType    => Array(v.asInstanceOf[Byte])
    case ShortType   => bytesShort(v.asInstanceOf[Short])
    case IntegerType => bytesInt(v.asInstanceOf[Int])
    case LongType    => bytesLong(v.asInstanceOf[Long])
    case FloatType   => bytesInt(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
    case DoubleType  => bytesLong(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
    case StringType  => v.toString.getBytes("UTF-8")
    case BinaryType  => v.asInstanceOf[Array[Byte]]
    case _ => throw new UnsupportedOperationException(s"PrimitiveType cannot encode $dt")
  }

  override def decode(dt: DataType, b: Array[Byte], off: Int, len: Int): Any = dt match {
    case BooleanType => b(off) != 0
    case ByteType    => b(off)
    case ShortType   => readShort(b, off)
    case IntegerType => readInt(b, off)
    case LongType    => readLong(b, off)
    case FloatType   => java.lang.Float.intBitsToFloat(readInt(b, off))
    case DoubleType  => java.lang.Double.longBitsToDouble(readLong(b, off))
    case StringType  => new String(b, off, len, "UTF-8")
    case BinaryType  => java.util.Arrays.copyOfRange(b, off, off + len)
    // dynamic/versioned map columns decode their value type per cell:
    case MapType(_, vt, _) => decode(vt, b, off, len)
    case _ => throw new UnsupportedOperationException(s"PrimitiveType cannot decode $dt")
  }

  // ---- sign-split pushdown ranges ------------------------------------------

  private def enc(dt: DataType, v: Any): Array[Byte] = encode(dt, v)

  override def lessRanges(dt: DataType, v: Any, incl: Boolean): Seq[ScanRange[Array[Byte]]] = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      val (neg, isNonNeg, minB, negOneB, zeroB) = intParts(dt, v)
      if (isNonNeg)
        Seq(rng(zeroB, true, enc(dt, v), incl), rng(minB, true, negOneB, true))
      else
        Seq(rng(minB, true, enc(dt, v), incl))
    case FloatType | DoubleType =>
      if (fpNonNeg(dt, v))
        Seq(rng(fpZero(dt), true, enc(dt, v), incl), rng(fpNegZero(dt), true, fpNegInf(dt), true))
      else // byte order within negatives is reversed: x < v  ⇔  bytes(x) > bytes(v)
        Seq(rng(enc(dt, v), incl, fpNegInf(dt), true))
    case BooleanType | StringType | BinaryType =>
      Seq(ScanRange(graft.ranges.Bound.negInf, graft.ranges.Bound(Some(enc(dt, v)), incl)))
    case _ => Seq(ScanRange.all)
  }

  override def greaterRanges(dt: DataType, v: Any, incl: Boolean): Seq[ScanRange[Array[Byte]]] = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      val (maxB, isNonNeg, _, negOneB, zeroB) = intPartsMax(dt, v)
      if (isNonNeg)
        Seq(rng(enc(dt, v), incl, maxB, true))
      else
        Seq(rng(enc(dt, v), incl, negOneB, true), rng(zeroB, true, maxB, true))
    case FloatType | DoubleType =>
      if (fpNonNeg(dt, v))
        Seq(rng(enc(dt, v), incl, fpPosInf(dt), true))
      else // reversed negatives: x > v ⇔ bytes(x) < bytes(v), plus all non-negatives
        Seq(rng(fpNegZero(dt), true, enc(dt, v), incl), rng(fpZero(dt), true, fpPosInf(dt), true))
    case BooleanType | StringType | BinaryType =>
      Seq(ScanRange(graft.ranges.Bound(Some(enc(dt, v)), incl), graft.ranges.Bound.posInf))
    case _ => Seq(ScanRange.all)
  }

  private def rng(lo: Array[Byte], loInc: Boolean, hi: Array[Byte], hiInc: Boolean): ScanRange[Array[Byte]] =
    ScanRange(graft.ranges.Bound(Some(lo), loInc), graft.ranges.Bound(Some(hi), hiInc))

  /** (minBytes, v>=0, minBytes, bytes(-1), bytes(0)) for the integral type. */
  private def intParts(dt: DataType, v: Any) = dt match {
    case ByteType    => (null, v.asInstanceOf[Byte] >= 0, Array(Byte.MinValue), Array((-1).toByte), Array(0.toByte))
    case ShortType   => (null, v.asInstanceOf[Short] >= 0, bytesShort(Short.MinValue), bytesShort(-1), bytesShort(0))
    case IntegerType => (null, v.asInstanceOf[Int] >= 0, bytesInt(Int.MinValue), bytesInt(-1), bytesInt(0))
    case LongType    => (null, v.asInstanceOf[Long] >= 0, bytesLong(Long.MinValue), bytesLong(-1), bytesLong(0))
  }

  /** (maxBytes, v>=0, _, bytes(-1), bytes(0)). */
  private def intPartsMax(dt: DataType, v: Any) = dt match {
    case ByteType    => (Array(Byte.MaxValue), v.asInstanceOf[Byte] >= 0, null, Array((-1).toByte), Array(0.toByte))
    case ShortType   => (bytesShort(Short.MaxValue), v.asInstanceOf[Short] >= 0, null, bytesShort(-1), bytesShort(0))
    case IntegerType => (bytesInt(Int.MaxValue), v.asInstanceOf[Int] >= 0, null, bytesInt(-1), bytesInt(0))
    case LongType    => (bytesLong(Long.MaxValue), v.asInstanceOf[Long] >= 0, null, bytesLong(-1), bytesLong(0))
  }

  private def fpNonNeg(dt: DataType, v: Any): Boolean = dt match {
    case FloatType  => !(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]) < 0)
    case DoubleType => !(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]) < 0)
  }

  private def fpZero(dt: DataType)    = if (dt == FloatType) bytesInt(0) else bytesLong(0L)
  private def fpPosInf(dt: DataType)  =
    if (dt == FloatType) bytesInt(java.lang.Float.floatToIntBits(Float.PositiveInfinity))
    else bytesLong(java.lang.Double.doubleToLongBits(Double.PositiveInfinity))
  private def fpNegZero(dt: DataType) =
    if (dt == FloatType) bytesInt(java.lang.Float.floatToIntBits(-0.0f))
    else bytesLong(java.lang.Double.doubleToLongBits(-0.0d))
  private def fpNegInf(dt: DataType)  =
    if (dt == FloatType) bytesInt(java.lang.Float.floatToIntBits(Float.NegativeInfinity))
    else bytesLong(java.lang.Double.doubleToLongBits(Double.NegativeInfinity))
}
