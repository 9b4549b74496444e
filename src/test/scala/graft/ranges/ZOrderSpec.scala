package graft.ranges

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property tests for the Morton curve math and the quadtree rectangle
  * decomposition — the foundation under the kv26 z-order query, so the
  * guarantees are pinned here independently of any table:
  *
  *  - encode/decode is a bijection (random + extreme coordinates);
  *  - rectRanges COVERS: every point inside the rectangle encodes into
  *    some emitted range (over-approximation is allowed, gaps are not);
  *  - rectRanges is EXACT when the budget allows: points outside the
  *    rectangle fall outside every range;
  *  - emitted ranges are sorted, disjoint, coalesced — the shape the
  *    scan-range OR-algebra expects. */
class ZOrderSpec extends AnyFunSuite {

  private val extremes =
    Seq(Int.MinValue, Int.MinValue + 1, -2, -1, 0, 1, 2, Int.MaxValue - 1, Int.MaxValue)

  test("encode/decode roundtrip on extremes and random points") {
    val rnd = new Random(42)
    val pts = (for (x <- extremes; y <- extremes) yield (x, y)) ++
      Seq.fill(2000)((rnd.nextInt(), rnd.nextInt()))
    for ((x, y) <- pts) {
      val z = ZOrder.encode(x, y)
      assert(ZOrder.decodeX(z) == x, s"x roundtrip ($x,$y)")
      assert(ZOrder.decodeY(z) == y, s"y roundtrip ($x,$y)")
    }
  }

  test("encode is distinct for distinct points") {
    val rnd = new Random(7)
    val pts = Seq.fill(5000)((rnd.nextInt(1000) - 500, rnd.nextInt(1000) - 500)).distinct
    assert(pts.map { case (x, y) => ZOrder.encode(x, y) }.distinct.size == pts.size)
  }

  private def inRanges(ranges: Seq[(Long, Long)], z: Long): Boolean =
    ranges.exists { case (lo, hi) => lo <= z && z <= hi }

  private def checkRect(xlo: Int, xhi: Int, ylo: Int, yhi: Int,
      maxRanges: Int, expectExact: Boolean, probe: Random): Unit = {
    val ranges = ZOrder.rectRanges(xlo, xhi, ylo, yhi, maxRanges)
    assert(ranges.nonEmpty)
    // sorted, disjoint, coalesced
    for (Seq((_, ahi), (blo, _)) <- ranges.sliding(2) if ranges.size > 1)
      assert(ahi < blo && ahi + 1 < blo, s"ranges not disjoint+coalesced: $ranges")
    // coverage: interior, edge, and corner points are all inside
    def pts(n: Int) = Seq((xlo, ylo), (xlo, yhi), (xhi, ylo), (xhi, yhi)) ++
      Seq.fill(n)((xlo + probe.nextInt(math.max(1, xhi - xlo + 1)),
        ylo + probe.nextInt(math.max(1, yhi - ylo + 1))))
    for ((x, y) <- pts(200))
      assert(inRanges(ranges, ZOrder.encode(x, y)), s"uncovered ($x,$y) in [$xlo..$xhi]x[$ylo..$yhi]")
    if (expectExact) {
      // exactness the strong way: an exact cover's total z span equals the
      // rectangle's point count — no z outside the rectangle is covered
      val span = ranges.map { case (lo, hi) => BigInt(hi) - BigInt(lo) + 1 }.sum
      val area = (BigInt(xhi) - BigInt(xlo) + 1) * (BigInt(yhi) - BigInt(ylo) + 1)
      assert(span == area, s"span=$span != area=$area for [$xlo..$xhi]x[$ylo..$yhi]")
      // and points just outside each face are outside every range
      val outside = Seq((xlo - 1, ylo), (xhi + 1, yhi), (xlo, ylo - 1), (xhi, yhi + 1))
      for ((x, y) <- outside if x > Int.MinValue && y > Int.MinValue)
        assert(!inRanges(ranges, ZOrder.encode(x, y)), s"leak ($x,$y) for [$xlo..$xhi]x[$ylo..$yhi]")
    }
  }

  test("rectRanges covers exactly with an unbounded budget (random rectangles)") {
    // an exact cover of a misaligned w×h rectangle needs O(w+h) aligned
    // quads — budget must be unbounded for exactness; production callers
    // use a small budget + the exact x/y residual instead
    val rnd = new Random(11)
    for (_ <- 0 until 40) {
      val xlo = rnd.nextInt(2000) - 1000; val xhi = xlo + rnd.nextInt(300)
      val ylo = rnd.nextInt(2000) - 1000; val yhi = ylo + rnd.nextInt(300)
      checkRect(xlo, xhi, ylo, yhi, maxRanges = Int.MaxValue, expectExact = true, rnd)
    }
  }

  test("rectRanges under a tight budget still covers (over-approximation)") {
    val rnd = new Random(13)
    for (_ <- 0 until 20) {
      val xlo = rnd.nextInt(100000) - 50000; val xhi = xlo + rnd.nextInt(5000)
      val ylo = rnd.nextInt(100000) - 50000; val yhi = ylo + rnd.nextInt(5000)
      checkRect(xlo, xhi, ylo, yhi, maxRanges = 4, expectExact = false, rnd)
    }
  }

  test("rectRanges handles degenerate and extreme rectangles") {
    val rnd = new Random(17)
    checkRect(5, 5, 9, 9, maxRanges = 8, expectExact = true, rnd) // single point
    checkRect(-3, 7, 4, 4, maxRanges = Int.MaxValue, expectExact = true, rnd) // 1-row strip
    // a 1-column × full-height strip is Z-order's pathological case (its
    // points scatter across the whole curve): coverage must hold, but only
    // via over-approximation — this is exactly why the residual predicate
    // stays on top of the pushed ranges
    checkRect(0, 0, Int.MinValue, Int.MaxValue, maxRanges = 64, expectExact = false, rnd)
    val full = ZOrder.rectRanges(Int.MinValue, Int.MaxValue, Int.MinValue, Int.MaxValue)
    assert(full == Seq((Long.MinValue, Long.MaxValue))) // whole plane = whole key space
  }

  test("rectRanges prunes: a small rectangle's ranges span a sliver of the key space") {
    // budget-64 over-approximation of a 101×101 rectangle: ~2M z codes out
    // of 2^64 — the scan touches a 1e-13 sliver; unbounded budget is exact
    val ranges = ZOrder.rectRanges(100, 200, 3000, 3100, maxRanges = 64)
    val span = ranges.map { case (lo, hi) => BigInt(hi) - BigInt(lo) + 1 }.sum
    assert(span < (BigInt(1) << 32), s"span=$span ranges=${ranges.size}")
    val exact = ZOrder.rectRanges(100, 200, 3000, 3100, maxRanges = Int.MaxValue)
    val exactSpan = exact.map { case (lo, hi) => BigInt(hi) - BigInt(lo) + 1 }.sum
    assert(exactSpan == BigInt(101) * 101)
  }
}
