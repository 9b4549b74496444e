package graft.store

import java.util.concurrent.{ConcurrentHashMap, ConcurrentSkipListMap}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.types.PrimitiveCoder

/** Property fuzz for the literal-coercion layer ([[KvPredicate.normalize]] /
  * [[KvPredicate.normalizeBound]]) against its documented comparison
  * domains: float/double columns view the literal through `double`
  * (compareTyped's `(Number, Number)` fallback, NaN greatest, ±0.0
  * distinct), integral columns compare EXACTLY (the semantics of Spark's
  * `UnwrapCastInBinaryComparison`, under which `-0.0` is 0 and bounds
  * beyond 2^53 stay exact). The hand-picked cases live in
  * PushdownEdgeSpec; this pins the claim over random
  * (literal box × column DataType × op × probe) quadruples.
  *
  * Seeded, so failures reproduce. */
class NormalizePropsSpec extends AnyFunSuite {

  import KvPredicate._

  private val ops: Seq[Op] = Seq(Eq, Lt, Le, Gt, Ge)
  private val numericDts: Seq[DataType] =
    Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)

  /** Random literal in a random numeric box, biased toward edges. */
  private def randLiteral(rnd: scala.util.Random): Number = rnd.nextInt(12) match {
    case 0 => java.lang.Byte.valueOf((rnd.nextInt(256) - 128).toByte)
    case 1 => java.lang.Short.valueOf(rnd.nextInt(65536).toShort)
    case 2 => java.lang.Integer.valueOf(rnd.nextInt())
    case 3 => java.lang.Long.valueOf(rnd.nextLong())
    case 4 => java.lang.Long.valueOf(rnd.nextLong() >> rnd.nextInt(60)) // small-ish longs
    case 5 => java.lang.Integer.valueOf(rnd.nextInt(21) - 10)
    case 6 => java.lang.Float.valueOf((rnd.nextFloat() - 0.5f) * 300f)
    case 7 => java.lang.Double.valueOf((rnd.nextDouble() - 0.5) * 300.0)
    case 8 => java.lang.Double.valueOf((rnd.nextInt(21) - 10).toDouble) // integral doubles
    case 9 => java.lang.Double.valueOf( // fractional near an integer
      (rnd.nextInt(21) - 10).toDouble + (rnd.nextInt(3) - 1) * 0.5)
    case 10 => // big/edge doubles: ±2^k spanning the int and long domains
      java.lang.Double.valueOf(math.pow(2, rnd.nextInt(16) + 50) * (if (rnd.nextBoolean()) 1 else -1))
    case 11 => Seq[Number](
      java.lang.Double.valueOf(Double.NaN), java.lang.Float.valueOf(Float.NaN),
      java.lang.Double.valueOf(Double.PositiveInfinity),
      java.lang.Double.valueOf(Double.NegativeInfinity),
      java.lang.Double.valueOf(-0.0), java.lang.Float.valueOf(-0.0f),
      java.lang.Double.valueOf(0.0),
      java.lang.Long.valueOf(Long.MaxValue), java.lang.Long.valueOf(Long.MinValue),
      java.lang.Long.valueOf(1L << 60), java.lang.Long.valueOf((1L << 60) - 1),
      java.lang.Double.valueOf(9.223372036854776e18), // 2^63: no long equals it
      java.lang.Double.valueOf(1.1), java.lang.Double.valueOf(1.3)
    )(rnd.nextInt(14))
  }

  /** Probe values in the column's own box (what coder.decode produces). */
  private def probes(dt: DataType, rnd: scala.util.Random): Seq[Any] = {
    def ri = rnd.nextInt(41) - 20
    dt match {
      case ByteType => Seq(Byte.MinValue, Byte.MaxValue, 0.toByte, (-1).toByte,
        ri.toByte, rnd.nextInt(256).toByte).map(java.lang.Byte.valueOf(_))
      case ShortType => Seq(Short.MinValue, Short.MaxValue, 0.toShort, (-1).toShort,
        ri.toShort, rnd.nextInt(65536).toShort).map(java.lang.Short.valueOf(_))
      case IntegerType => Seq(Int.MinValue, Int.MaxValue, 0, -1, ri, rnd.nextInt())
        .map(java.lang.Integer.valueOf(_))
      case LongType => Seq(Long.MinValue, Long.MaxValue, 0L, -1L, ri.toLong,
        rnd.nextLong(), 1L << 60, (1L << 60) - 1).map(java.lang.Long.valueOf(_))
      case FloatType => Seq(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity,
        0.0f, -0.0f, 1.1f, 1.3f, Math.nextUp(1.3f), Math.nextDown(1.1f),
        ri.toFloat, (rnd.nextFloat() - 0.5f) * 300f).map(java.lang.Float.valueOf(_))
      case DoubleType => Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
        0.0, -0.0, 1.1, 1.3, ri.toDouble, (rnd.nextDouble() - 0.5) * 300.0)
        .map(java.lang.Double.valueOf(_))
      case _ => Seq.empty
    }
  }

  private def holds(op: Op, c: Int): Boolean = op match {
    case Eq => c == 0
    case Lt => c < 0
    case Le => c <= 0
    case Gt => c > 0
    case Ge => c >= 0
  }

  /** The target semantics, per column type: double-domain compare for fp
    * columns (the compareTyped fallback), exact numeric compare for
    * integral columns (UnwrapCastInBinaryComparison's view, where NaN and
    * +Inf sit above every integer and -Inf below). */
  private def oracleCmp(dt: DataType, x: Any, lit: Number): Int = dt match {
    case FloatType | DoubleType =>
      java.lang.Double.compare(x.asInstanceOf[Number].doubleValue(), lit.doubleValue())
    case _ =>
      val xl = x.asInstanceOf[Number].longValue()
      lit match {
        case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short | _: java.lang.Byte =>
          java.lang.Long.compare(xl, lit.longValue())
        case _ =>
          val d = lit.doubleValue()
          if (d.isNaN) -1 // NaN greatest: every integer sorts below it
          else if (d == Double.PositiveInfinity) -1
          else if (d == Double.NegativeInfinity) 1
          else new java.math.BigDecimal(xl).compareTo(new java.math.BigDecimal(d))
      }
  }

  test("normalizeBound/normalize match the domain semantics over random quadruples") {
    val rnd = new scala.util.Random(0xC0FFEE14)
    var checked = 0
    for (_ <- 1 to 2000) {
      val lit = randLiteral(rnd)
      val dt = numericDts(rnd.nextInt(numericDts.size))
      val op = ops(rnd.nextInt(ops.size))
      val norm: Either[String, Any => Boolean] = op match {
        case Eq => normalize(lit, dt) match {
          case None => Left("nothing")
          case Some(v) => Right((x: Any) => holds(Eq, compareTyped(x, v)))
        }
        case _ => normalizeBound(lit, dt, op) match {
          case NormBound.Everything => Left("everything")
          case NormBound.Nothing => Left("nothing")
          case NormBound.Cmp(op2, v, _) => Right((x: Any) => holds(op2, compareTyped(x, v)))
        }
      }
      for (x <- probes(dt, rnd)) {
        val expected = holds(op, oracleCmp(dt, x, lit))
        val actual = norm match {
          case Left("everything") => true
          case Left(_) => false
          case Right(f) => f(x)
        }
        assert(actual == expected,
          s"dt=$dt op=$op lit=$lit (${lit.getClass.getSimpleName}) x=$x: " +
            s"oracle=$expected normalized=$actual")
        checked += 1
      }
    }
    assert(checked > 10000, s"fuzz volume too low: $checked")
    // deterministic pin for the saturation edge the fuzz only hits by
    // chance: longValue() saturates 2^63 to MaxValue whose double view is
    // 2^63 again — no long equals 2^63, so Eq must match nothing
    assert(normalize(java.lang.Double.valueOf(9.223372036854776e18), LongType).isEmpty)
    assert(normalize(java.lang.Double.valueOf(-9.223372036854776e18), LongType)
      .contains(java.lang.Long.valueOf(Long.MinValue))) // -2^63 IS MinValue
  }

  test("inOf set membership matches the domain semantics (and always collapses)") {
    val rnd = new scala.util.Random(0xBEEF14)
    def cells(dt: DataType, x: Any) = {
      val m = new ConcurrentHashMap[(String, String), ConcurrentSkipListMap[java.lang.Long, Array[Byte]]]()
      val versions = new ConcurrentSkipListMap[java.lang.Long, Array[Byte]](
        java.util.Collections.reverseOrder[java.lang.Long]())
      versions.put(1L, PrimitiveCoder.encode(dt, x))
      m.put(("f", "d"), versions)
      m
    }
    val key = PrimitiveCoder.encode(IntegerType, 1)
    var setBacked = 0
    for (_ <- 1 to 1000) {
      val dt = numericDts(rnd.nextInt(numericDts.size))
      val lits = Seq.fill(rnd.nextInt(6) + 2)(randLiteral(rnd))
      val leaves = lits.map(l => ValueCmp("f", "d", Eq, l, dt, PrimitiveCoder))
      val collapsed = inOf(leaves).getOrElse(fail(s"no collapse for $dt"))
      collapsed match {
        case _: ValueIn => setBacked += 1
        case p => fail(s"homogeneous Eq leaves must collapse to ValueIn, got $p")
      }
      for (x <- probes(dt, rnd)) {
        val expected = lits.exists(l => oracleCmp(dt, x, l) == 0)
        val actual = collapsed.eval(key, cells(dt, x), None)
        assert(actual == expected, s"dt=$dt lits=$lits x=$x: oracle=$expected set=$actual")
      }
    }
    assert(setBacked == 1000, s"every homogeneous batch must collapse: $setBacked")
  }
}
