package graft.ranges

import scala.collection.mutable.ArrayBuffer

/** Z-order (Morton) curve encoding and rectangle→range decomposition —
  * multi-dimensional pruning for a one-dimensional row-key space.
  *
  * The engine's row-key algebra prunes on a SINGLE key order; a query that
  * constrains TWO dimensions (user × time slot, lat × lon) gets pruning on
  * only the leading one. Z-ordering interleaves the bits of both dimensions
  * into one 64-bit key, so keys close in either dimension stay close in key
  * order, and a 2-D rectangle decomposes into a SMALL set of contiguous key
  * ranges — each pruned by the ordinary region/range planner. The same idea
  * ships publicly as Delta Lake Z-ORDER clustering and HBase/Phoenix
  * space-filling-curve keys; the range-splitting here is the classic
  * quadtree descent behind Tropf–Herzog LITMAX/BIGMIN (2000).
  *
  * Layout: x occupies even bits (bit 0, 2, …62), y odd bits (1, 3, …63) of
  * the UNSIGNED morton code; both inputs are sign-flipped first so signed
  * int order matches unsigned bit order, and the final code is sign-flipped
  * back to a SIGNED long with the same total order — so the engine's
  * order-preserving bigint key coder sorts z exactly like unsigned morton.
  *
  * All methods are pure bit math — safe on executors and in codegen. */
object ZOrder {

  /** Spread the low 32 bits of v across the even bits of a long. */
  private def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Inverse of [[spread]]: gather the even bits of v into the low 32. */
  private def compact(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >>> 1)) & 0x3333333333333333L
    x = (x | (x >>> 2)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x >>> 4)) & 0x00ff00ff00ff00ffL
    x = (x | (x >>> 8)) & 0x0000ffff0000ffffL
    x = (x | (x >>> 16)) & 0x00000000ffffffffL
    x
  }

  /** Signed int → order-preserving unsigned 32-bit value (in a long). */
  private def toU(v: Int): Long = (v ^ Int.MinValue).toLong & 0xffffffffL
  private def fromU(u: Long): Int = (u.toInt) ^ Int.MinValue

  /** Unsigned-domain morton code of two unsigned 32-bit coordinates. */
  private def encodeU(ux: Long, uy: Long): Long = spread(ux) | (spread(uy) << 1)

  /** Morton code of (x, y) as a SIGNED long whose signed order equals the
    * curve's unsigned order — directly usable as a bigint row key. */
  def encode(x: Int, y: Int): Long = encodeU(toU(x), toU(y)) ^ Long.MinValue

  def decodeX(z: Long): Int = fromU(compact(z ^ Long.MinValue))
  def decodeY(z: Long): Int = fromU(compact((z ^ Long.MinValue) >>> 1))

  /** Decompose the rectangle [xlo..xhi] × [ylo..yhi] (inclusive, signed)
    * into ascending, disjoint, coalesced SIGNED z ranges (inclusive both
    * ends) that COVER every point in the rectangle.
    *
    * Quadtree descent: a node is an aligned sub-rectangle of the plane
    * whose z codes are contiguous; fully-contained nodes emit their exact
    * z range, disjoint nodes prune, partial nodes split on the most
    * significant undecided bit (y then x, matching the interleave). When
    * `maxRanges` leaves have been emitted, remaining partial nodes emit
    * their WHOLE z range instead of splitting — an over-approximation, so
    * callers must keep the exact x/y residual predicate ([[decodeX]]/
    * [[decodeY]] bounds) on top of the pushed ranges; with a generous
    * budget the decomposition is exact and the residual filters nothing.
    *
    * Cost: O(maxRanges + 64) nodes visited; the emitted list is sorted and
    * coalesced, ready for the scan-range OR-algebra. */
  def rectRanges(xlo: Int, xhi: Int, ylo: Int, yhi: Int,
      maxRanges: Int = 64): Seq[(Long, Long)] = {
    require(xlo <= xhi && ylo <= yhi,
      s"rectRanges: empty rectangle [$xlo..$xhi]×[$ylo..$yhi]")
    require(maxRanges >= 1, s"rectRanges: maxRanges must be >= 1")
    val (qx0, qx1, qy0, qy1) = (toU(xlo), toU(xhi), toU(ylo), toU(yhi))
    val buf = new ArrayBuffer[(Long, Long)]
    // intervals stay aligned (length a power of two) under halving, so the
    // node's z codes are contiguous: min = encodeU(nx0, ny0) (all free bits
    // 0), max = encodeU(nx1, ny1) (all free bits 1)
    def go(nx0: Long, nx1: Long, ny0: Long, ny1: Long, splitY: Boolean): Unit = {
      if (nx1 < qx0 || nx0 > qx1 || ny1 < qy0 || ny0 > qy1) return
      val contained = qx0 <= nx0 && nx1 <= qx1 && qy0 <= ny0 && ny1 <= qy1
      if (contained || buf.length >= maxRanges) {
        buf += ((encodeU(nx0, ny0), encodeU(nx1, ny1))); ()
      } else if (splitY && ny0 < ny1) {
        val mid = ny0 + (ny1 - ny0) / 2
        go(nx0, nx1, ny0, mid, splitY = false)
        go(nx0, nx1, mid + 1, ny1, splitY = false)
      } else if (!splitY && nx0 < nx1) {
        val mid = nx0 + (nx1 - nx0) / 2
        go(nx0, mid, ny0, ny1, splitY = true)
        go(mid + 1, nx1, ny0, ny1, splitY = true)
      } else if (ny0 < ny1 || nx0 < nx1) {
        go(nx0, nx1, ny0, ny1, !splitY) // this axis exhausted, flip
      } else {
        buf += ((encodeU(nx0, ny0), encodeU(nx0, ny0))); () // single point
      }
    }
    // bit 63 is y's top bit, so the descent splits y first
    go(0L, 0xffffffffL, 0L, 0xffffffffL, splitY = true)
    // DFS low-child-first emits in ascending unsigned z; coalesce adjacent
    val out = new ArrayBuffer[(Long, Long)]
    buf.foreach { case (lo, hi) =>
      if (out.nonEmpty && java.lang.Long.compareUnsigned(lo, out.last._2 + 1) <= 0) {
        val (plo, phi) = out.remove(out.length - 1)
        val nhi = if (java.lang.Long.compareUnsigned(hi, phi) > 0) hi else phi
        out += ((plo, nhi)); ()
      } else { out += ((lo, hi)); () }
    }
    out.map { case (lo, hi) => (lo ^ Long.MinValue, hi ^ Long.MinValue) }.toSeq
  }
}
