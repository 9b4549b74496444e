package graft.types

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ranges.{BytesUtil, ScanRange}

/** Round-trip + ordering + sign-split-range properties for the coders —
  * the correctness core flagged in SURVEY.md §7.4(1). Seeded-random
  * property checks (scalatestplus is unavailable offline). */
class CoderSpec extends AnyFunSuite {

  private val coders = Seq(PrimitiveCoder, PhoenixCoder)
  private val rnd = new scala.util.Random(42)
  private val N = 400

  private def roundTrip(dt: DataType, v: Any): Unit = coders.foreach { c =>
    val enc = c.encode(dt, v)
    val dec = c.decode(dt, enc)
    assert(dec == v, s"${c.name} $dt $v -> ${BytesUtil.toHex(enc)} -> $dec")
  }

  private def randInts: Seq[Int] =
    Seq.fill(N)(rnd.nextInt()) ++ Seq(0, 1, -1, Int.MaxValue, Int.MinValue)
  private def randLongs: Seq[Long] =
    Seq.fill(N)(rnd.nextLong()) ++ Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue)
  private def randShorts: Seq[Short] =
    Seq.fill(N)(rnd.nextInt().toShort) ++ Seq[Short](0, 1, -1, Short.MaxValue, Short.MinValue)
  private def randBytes: Seq[Byte] = (-128 to 127).map(_.toByte)
  private def randFloats: Seq[Float] =
    Seq.fill(N)((rnd.nextFloat() - 0.5f) * 2e9f) ++ Seq(0f, -0f, 1.5f, -1.5f)
  private def randDoubles: Seq[Double] =
    Seq.fill(N)((rnd.nextDouble() - 0.5) * 2e12) ++ Seq(0d, -0d, 2.5d, -2.5d)
  private def randStrings: Seq[String] =
    Seq.fill(N)(rnd.alphanumeric.take(rnd.nextInt(8)).mkString) ++ Seq("", "a", "zz")

  test("round-trip all primitive types") {
    randInts.foreach(roundTrip(IntegerType, _))
    randLongs.foreach(roundTrip(LongType, _))
    randShorts.foreach(roundTrip(ShortType, _))
    randBytes.foreach(roundTrip(ByteType, _))
    Seq(true, false).foreach(roundTrip(BooleanType, _))
    randStrings.foreach(roundTrip(StringType, _))
    randFloats.foreach(roundTrip(FloatType, _))
    randDoubles.foreach(roundTrip(DoubleType, _))
  }

  test("Phoenix byte order equals value order (all numeric types)") {
    def check[T](dt: DataType, vs: Seq[T], cmp: (T, T) => Int): Unit =
      vs.sliding(2).foreach { case Seq(a, b) =>
        val c = BytesUtil.compareBytes(PhoenixCoder.encode(dt, a), PhoenixCoder.encode(dt, b))
        assert(Integer.signum(c) == Integer.signum(cmp(a, b)), s"$dt: $a vs $b")
      case _ =>
      }
    check[Int](IntegerType, randInts, _.compareTo(_))
    check[Long](LongType, randLongs, _.compareTo(_))
    check[Short](ShortType, randShorts, _.compareTo(_))
    check[Float](FloatType, randFloats, java.lang.Float.compare)
    check[Double](DoubleType, randDoubles, java.lang.Double.compare)
  }

  /** The guard for SURVEY §7.4(1): membership of enc(x) in lessRanges(v) /
    * greaterRanges(v) must equal x<v / x>v for every coder and type. */
  private def rangeProperty[T](dt: DataType, vs: Seq[T])(lt: (T, T) => Boolean): Unit = {
    implicit val ord: Ordering[Array[Byte]] = BytesUtil.byteArrayOrdering
    coders.foreach { c =>
      val pairs = vs.zip(rnd.shuffle(vs)) ++ vs.map(v => (v, v))
      pairs.foreach { case (x, v) =>
        val ex = c.encode(dt, x)
        val eq = !lt(x, v) && !lt(v, x) // total-order equality (-0.0 consistent)
        def in(rs: Seq[ScanRange[Array[Byte]]]) = rs.exists(_.contains(ex))
        assert(in(c.lessRanges(dt, v, inclusive = false)) == lt(x, v),
          s"${c.name} $dt: x=$x < v=$v")
        assert(in(c.lessRanges(dt, v, inclusive = true)) == (lt(x, v) || eq),
          s"${c.name} $dt: x=$x <= v=$v")
        assert(in(c.greaterRanges(dt, v, inclusive = false)) == lt(v, x),
          s"${c.name} $dt: x=$x > v=$v")
        assert(in(c.greaterRanges(dt, v, inclusive = true)) == (lt(v, x) || eq),
          s"${c.name} $dt: x=$x >= v=$v")
      }
    }
  }

  test("sign-split less/greater ranges: int")   { rangeProperty[Int](IntegerType, randInts)(_ < _) }
  test("sign-split less/greater ranges: long")  { rangeProperty[Long](LongType, randLongs)(_ < _) }
  test("sign-split less/greater ranges: short") { rangeProperty[Short](ShortType, randShorts)(_ < _) }
  test("sign-split less/greater ranges: byte")  { rangeProperty[Byte](ByteType, randBytes)(_ < _) }
  test("sign-split less/greater ranges: float") {
    rangeProperty[Float](FloatType, randFloats)((a, b) => java.lang.Float.compare(a, b) < 0)
  }
  test("sign-split less/greater ranges: double") {
    rangeProperty[Double](DoubleType, randDoubles)((a, b) => java.lang.Double.compare(a, b) < 0)
  }
  test("less/greater ranges: string") {
    rangeProperty[String](StringType, randStrings)((a, b) =>
      BytesUtil.compareBytes(a.getBytes("UTF-8"), b.getBytes("UTF-8")) < 0)
  }

  test("avro record round-trip") {
    val schema =
      """{"type":"record","name":"User","fields":[
        |{"name":"name","type":"string"},
        |{"name":"favorite_number","type":["int","null"]},
        |{"name":"favorite_array","type":{"type":"array","items":"string"}}]}""".stripMargin
    val coder = new AvroCoder(schema)
    val dt = AvroCoder.sqlTypeFor(schema)
    val row = org.apache.spark.sql.Row("alice", 42, Seq("a", "b"))
    val back = coder.decode(dt, coder.encode(dt, row)).asInstanceOf[org.apache.spark.sql.Row]
    assert(back.getString(0) == "alice")
    assert(back.getInt(1) == 42)
    assert(back.getSeq[String](2) == Seq("a", "b"))
  }

  test("avro write mapping: Decimal -> string, Timestamp -> epoch millis") {
    // the reference serializes DecimalType as its decimal string and
    // TimestampType as long epoch-millis (Avro.scala:152,194,256-258);
    // round-trip surfaces them as string/long, matching toSqlType
    val schema =
      """{"type":"record","name":"Fin","fields":[
        |{"name":"amount","type":"string"},
        |{"name":"at","type":"long"}]}""".stripMargin
    val coder = new AvroCoder(schema)
    val dt = AvroCoder.sqlTypeFor(schema)
    val ts = java.sql.Timestamp.valueOf("2026-01-15 10:30:00.123")
    val row = org.apache.spark.sql.Row(new java.math.BigDecimal("12345.670000"), ts)
    val back = coder.decode(dt, coder.encode(dt, row)).asInstanceOf[org.apache.spark.sql.Row]
    assert(back.getString(0) == "12345.670000")
    assert(back.getLong(1) == ts.getTime)

    // the same values survive the Catalyst-internal conversion the write
    // path performs before encoding
    import graft.datasource.CatalystConv
    val dec = CatalystConv.fromCatalyst(DecimalType(18, 6),
      CatalystConv.toCatalyst(DecimalType(18, 6), new java.math.BigDecimal("12345.670000")))
    assert(dec.asInstanceOf[java.math.BigDecimal].compareTo(
      new java.math.BigDecimal("12345.670000")) == 0)
    val ts2 = CatalystConv.fromCatalyst(TimestampType,
      CatalystConv.toCatalyst(TimestampType, ts))
    assert(ts2 == ts)
  }
}
