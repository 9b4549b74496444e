package graft.types

import org.apache.spark.sql.types._

import graft.ranges.{Bound, ScanRange}

/** Serde SPI: encodes/decodes one field between JVM values and the store's
  * byte representation, and (for pushdown) maps typed comparisons to byte
  * ranges under the store's unsigned-lexicographic key order.
  *
  * Reference semantics: core/.../types/SHCDataType.scala:22-50 (trait
  * contract), instantiated reflectively by name (:56-103). Coders are
  * user-pluggable the same way here (see [[FieldCoder.byName]]).
  */
trait FieldCoder extends Serializable {

  def name: String

  /** True iff encoded byte order equals value order — required for row-key
    * fields (range pruning relies on it). */
  def preservesOrdering(dt: DataType): Boolean

  /** STRICT byte-order identity: rows laid out in encoded-key byte order
    * really are sorted by VALUE, with no planning-time compensation.
    * [[preservesOrdering]] is the weaker contract ("range pruning can be
    * made correct", e.g. via sign-split ranges for two's-complement ints);
    * this one backs the scan's `SupportsReportOrdering` claim, where no
    * compensation is possible — a false `true` here silently corrupts
    * sort-based plans. Default false: user coders must opt in. */
  def byteOrderIsValueOrder(dt: DataType): Boolean = false

  /** True iff the coder can participate in concatenated composite keys. */
  def supportsComposite: Boolean

  /** Fixed encoded width in bytes, or -1 for variable width. */
  def byteWidth(dt: DataType): Int

  def encode(dt: DataType, v: Any): Array[Byte]

  def decode(dt: DataType, bytes: Array[Byte], off: Int, len: Int): Any

  final def decode(dt: DataType, bytes: Array[Byte]): Any =
    decode(dt, bytes, 0, bytes.length)

  /** Byte ranges covering {x : x < v} (or <=) under unsigned-lex order.
    * May over-approximate; callers keep such filters residual. */
  def lessRanges(dt: DataType, v: Any, inclusive: Boolean): Seq[ScanRange[Array[Byte]]]

  /** Byte ranges covering {x : x > v} (or >=). */
  def greaterRanges(dt: DataType, v: Any, inclusive: Boolean): Seq[ScanRange[Array[Byte]]]
}

object FieldCoder {

  val Primitive = "PrimitiveType"
  val Phoenix = "Phoenix"
  val Avro = "Avro"

  /** Coder registry; unknown names fall back to reflective instantiation so
    * user coders plug in exactly like the reference's SHCDataTypeFactory. */
  def byName(name: String): FieldCoder = name match {
    case Primitive => PrimitiveCoder
    case Phoenix   => PhoenixCoder
    case other =>
      Class.forName(other).getDeclaredConstructor().newInstance() match {
        case c: FieldCoder => c
        case _ => throw new IllegalArgumentException(s"$other is not a FieldCoder")
      }
  }
}

/** Shared helpers for coders over big-endian primitive layouts. */
private[types] object CoderUtil {

  def bytesShort(v: Short): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  def bytesInt(v: Int): Array[Byte] = {
    val out = new Array[Byte](4)
    var x = v; var i = 3
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out
  }

  def bytesLong(v: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    var x = v; var i = 7
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out
  }

  def readShort(b: Array[Byte], off: Int): Short =
    (((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)).toShort

  def readInt(b: Array[Byte], off: Int): Int = {
    var x = 0; var i = 0
    while (i < 4) { x = (x << 8) | (b(off + i) & 0xff); i += 1 }
    x
  }

  def readLong(b: Array[Byte], off: Int): Long = {
    var x = 0L; var i = 0
    while (i < 8) { x = (x << 8) | (b(off + i) & 0xff); i += 1 }
    x
  }
}
