package graft.ranges

/** Unsigned-lexicographic byte-array ordering and helpers — the key order of
  * the embedded KV store (reference: core/.../package.scala:24-38).
  */
object BytesUtil {

  /** Max row-key length used when padding range endpoints. */
  val MaxKeyLength = 256

  implicit val byteArrayOrdering: Ordering[Array[Byte]] = new Ordering[Array[Byte]] {
    override def compare(a: Array[Byte], b: Array[Byte]): Int = compareBytes(a, b)
  }

  def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val cmp = (a(i) & 0xff) - (b(i) & 0xff)
      if (cmp != 0) return cmp
      i += 1
    }
    a.length - b.length
  }

  def equalsBytes(a: Array[Byte], b: Array[Byte]): Boolean =
    java.util.Arrays.equals(a, b)

  def startsWith(a: Array[Byte], prefix: Array[Byte]): Boolean = {
    if (a.length < prefix.length) return false
    var i = 0
    while (i < prefix.length) {
      if (a(i) != prefix(i)) return false
      i += 1
    }
    true
  }

  /** Smallest byte array strictly greater than every array with this prefix,
    * or None if the prefix is all 0xff (no upper bound exists). */
  def prefixUpperBound(prefix: Array[Byte]): Option[Array[Byte]] = {
    val out = prefix.clone()
    var i = out.length - 1
    while (i >= 0) {
      if ((out(i) & 0xff) != 0xff) {
        out(i) = (out(i) + 1).toByte
        return Some(java.util.Arrays.copyOf(out, i + 1))
      }
      i -= 1
    }
    None
  }

  def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = new Array[Byte](parts.map(_.length).sum)
    var off = 0
    parts.foreach { p => System.arraycopy(p, 0, out, off, p.length); off += p.length }
    out
  }

  def toHex(a: Array[Byte]): String = a.map(b => f"${b & 0xff}%02x").mkString
}
