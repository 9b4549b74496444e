package graft.ranges

import org.scalatest.funsuite.AnyFunSuite

/** Interval-algebra truth tests (port of the reference ScanRangeTestSuite's
  * coverage, plus seeded-random property checks against brute-force
  * membership). */
class ScanRangeSpec extends AnyFunSuite {

  private def r(lo: Int, loInc: Boolean, hi: Int, hiInc: Boolean) =
    ScanRange(Bound(Some(lo), loInc), Bound(Some(hi), hiInc))

  private def contains(rs: Seq[ScanRange[Int]], v: Int) = rs.exists(_.contains(v))

  test("intersect basic") {
    assert(r(0, true, 10, true).intersect(r(5, true, 15, true)).contains(r(5, true, 10, true)))
    assert(r(0, true, 10, false).intersect(r(10, true, 15, true)).isEmpty)
    assert(r(0, true, 10, true).intersect(r(10, true, 15, true)).contains(r(10, true, 10, true)))
  }

  test("normalize merges overlap and adjacency") {
    val merged = ScanRange.normalize(Seq(r(0, true, 5, false), r(5, true, 10, true), r(20, true, 30, true)))
    assert(merged == Seq(r(0, true, 10, true), r(20, true, 30, true)))
    // exclusive-exclusive adjacency must NOT merge
    val gap = ScanRange.normalize(Seq(r(0, true, 5, false), r(5, false, 10, true)))
    assert(gap.size == 2)
  }

  test("or keeps lists sorted and disjoint; and clips") {
    val a = Seq(r(0, true, 10, true))
    val b = Seq(r(5, true, 15, true), r(20, true, 25, true))
    assert(ScanRange.or(a, b) == Seq(r(0, true, 15, true), r(20, true, 25, true)))
    assert(ScanRange.and(a, b) == Seq(r(5, true, 10, true)))
  }

  test("infinite bounds") {
    val le5 = Seq(ScanRange.atMost(5))
    val ge3 = Seq(ScanRange.atLeast(3))
    assert(ScanRange.and(le5, ge3) == Seq(r(3, true, 5, true)))
    assert(ScanRange.or(le5, ge3) == Seq(ScanRange.all[Int]))
  }

  private val rnd = new scala.util.Random(42)

  private def randBound(): Bound[Int] =
    if (rnd.nextInt(6) == 0) Bound(None, inclusive = true)
    else Bound(Some(rnd.nextInt(41) - 20), rnd.nextBoolean())

  private def randRanges(): Seq[ScanRange[Int]] =
    Seq.fill(1 + rnd.nextInt(4))(ScanRange(randBound(), randBound()))

  test("property: and/or match brute-force membership over [-25,25]") {
    (1 to 500).foreach { _ =>
      val as = randRanges(); val bs = randRanges()
      val and = ScanRange.and(as, bs)
      val or = ScanRange.or(as, bs)
      (-25 to 25).foreach { v =>
        assert(contains(and, v) == (contains(as, v) && contains(bs, v)), s"and@$v: $as ∧ $bs")
        assert(contains(or, v) == (contains(as, v) || contains(bs, v)), s"or@$v: $as ∨ $bs")
      }
    }
  }

  test("property: normalize yields non-empty ranges with same membership") {
    (1 to 500).foreach { _ =>
      val rs = randRanges()
      val n = ScanRange.normalize(rs)
      (-25 to 25).foreach { v => assert(contains(n, v) == contains(rs, v)) }
      assert(n.forall(!_.isEmpty))
    }
  }
}
