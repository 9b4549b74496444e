package graft.types

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.ranges.BytesUtil.byteArrayOrdering
import graft.ranges.ScanRange

/** Property tests for the correctness core SURVEY §7.4 ranks highest:
  * byte-order vs value-order (sign-split encodings) and the interval
  * algebra. A silent bug in either drops rows for negative-key range
  * queries without failing any example-based test.
  *
  * Properties, per coder × type:
  *  - round-trip: decode(encode(v)) == v
  *  - order embedding (order-preserving coders): encode order == value order
  *  - pushdown soundness+exactness: v' satisfies (v' < v) iff encode(v') is
  *    inside lessRanges(v); same for greater — the reference over-scans here
  *    (`<` → `<=`); ours must be exact for sign-split primitives too.
  * And for the range algebra: and/or behave as set intersection/union on
  * random probes.
  */
class CoderPropsSpec extends AnyFunSuite {

  /** Deterministic ScalaCheck sampling (no scalatest bridge in the offline
    * cache): n samples drawn with fixed seeds. */
  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] = {
    val p = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(p, org.scalacheck.rng.Seed(i.toLong)))
  }
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit = samples(g).foreach(f)
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    samples(g1).zip(samples(g2).reverse).foreach { case (a, b) => f(a, b) }

  private val ord = byteArrayOrdering

  private def inRanges(rs: Seq[ScanRange[Array[Byte]]], b: Array[Byte]): Boolean =
    rs.exists(_.contains(b)(ord))

  private val typedGens: Seq[(DataType, Gen[Any])] = Seq(
    IntegerType -> Gen.oneOf(Gen.chooseNum(Int.MinValue, Int.MaxValue), Gen.oneOf(0, -1, 1, Int.MinValue, Int.MaxValue)).map(x => x: Any),
    LongType -> Gen.oneOf(Gen.chooseNum(Long.MinValue, Long.MaxValue), Gen.oneOf(0L, -1L, 1L, Long.MinValue, Long.MaxValue)).map(x => x: Any),
    ShortType -> Gen.chooseNum(Short.MinValue, Short.MaxValue).map(x => x: Any),
    DoubleType -> Gen.oneOf(
      Gen.chooseNum(-1e12, 1e12), Gen.oneOf(0.0, -0.0 + 0.0, 1.5, -1.5, 1e-300, -1e-300)).map(x => x: Any),
    FloatType -> Gen.chooseNum(-1e12f, 1e12f).map(x => x: Any),
    StringType -> Gen.alphaNumStr.map(x => x: Any),
    ByteType -> Gen.chooseNum(Byte.MinValue, Byte.MaxValue).map(x => x: Any),
    BooleanType -> Gen.oneOf(true, false).map(x => x: Any))

  private def valueOrd(dt: DataType): Ordering[Any] = (dt match {
    case IntegerType => Ordering.Int
    case LongType => Ordering.Long
    case ShortType => Ordering.Short
    case DoubleType => Ordering.Double.TotalOrdering
    case FloatType => Ordering.Float.TotalOrdering
    case StringType => Ordering.String
    case ByteType => Ordering.Byte
    case BooleanType => Ordering.Boolean
  }).asInstanceOf[Ordering[Any]]

  for ((coderName, coder) <- Seq("PrimitiveCoder" -> PrimitiveCoder,
                                 "PhoenixCoder" -> PhoenixCoder);
       (dt, gen) <- typedGens) {

    test(s"$coderName/$dt: round-trip identity") {
      forAll(gen) { v =>
        assert(coder.decode(dt, coder.encode(dt, v)) == v)
      }
    }

    test(s"$coderName/$dt: range pushdown is exact on random pairs") {
      val vo = valueOrd(dt)
      forAll(gen, gen) { (a, b) =>
        val eb = coder.encode(dt, b)
        // b < a ⟺ encode(b) ∈ lessRanges(a, incl=false), etc.
        assert(inRanges(coder.lessRanges(dt, a, false), eb) == vo.lt(b, a),
          s"lessRanges($a) membership wrong for $b")
        assert(inRanges(coder.lessRanges(dt, a, true), eb) == vo.lteq(b, a),
          s"lessRanges($a, incl) membership wrong for $b")
        assert(inRanges(coder.greaterRanges(dt, a, false), eb) == vo.gt(b, a),
          s"greaterRanges($a) membership wrong for $b")
        assert(inRanges(coder.greaterRanges(dt, a, true), eb) == vo.gteq(b, a),
          s"greaterRanges($a, incl) membership wrong for $b")
      }
    }
  }

  // Phoenix additionally embeds value order in byte order (row-key support)
  for ((dt, gen) <- typedGens) {
    test(s"PhoenixCoder/$dt: encode order == value order") {
      val vo = valueOrd(dt)
      forAll(gen, gen) { (a, b) =>
        val c = ord.compare(PhoenixCoder.encode(dt, a), PhoenixCoder.encode(dt, b))
        assert(Integer.signum(c) == Integer.signum(vo.compare(a, b)),
          s"byte order disagrees with value order for ($a, $b)")
      }
    }
  }

  // ---- interval algebra as set semantics over random probes ----
  private val boundGen: Gen[graft.ranges.Bound[Int]] = for {
    v <- Gen.chooseNum(-20, 20)
    incl <- Gen.oneOf(true, false)
    inf <- Gen.frequency(9 -> false, 1 -> true)
  } yield if (inf) graft.ranges.Bound[Int](None, inclusive = true)
          else graft.ranges.Bound(Some(v), incl)

  private val rangeGen: Gen[ScanRange[Int]] =
    for (s <- boundGen; e <- boundGen) yield ScanRange(s, e)
  private val rangesGen: Gen[Seq[ScanRange[Int]]] = Gen.listOfN(4, rangeGen)

  test("ScanRange.and/or/normalize = set intersection/union/identity on probes") {
    forAll(rangesGen, rangesGen) { (as, bs) =>
      val probes = -22 to 22
      def member(rs: Seq[ScanRange[Int]], v: Int) = rs.exists(_.contains(v))
      val union = ScanRange.or(as, bs)
      val inter = ScanRange.and(as, bs)
      val normA = ScanRange.normalize(as)
      probes.foreach { v =>
        assert(member(union, v) == (member(as, v) || member(bs, v)),
          s"or mismatch at $v for $as | $bs")
        assert(member(inter, v) == (member(as, v) && member(bs, v)),
          s"and mismatch at $v for $as & $bs")
        assert(member(normA, v) == member(as, v), s"normalize changed membership at $v")
      }
      // normalized output must be sorted and non-overlapping
      val norm = ScanRange.normalize(union)
      norm.sliding(2).foreach {
        case Seq(x, y) =>
          assert(x.intersect(y).forall(_.isEmpty), s"overlap after normalize: $x, $y")
        case _ =>
      }
    }
  }
}
