package graft.datasource

import java.util.concurrent.{ConcurrentHashMap, ConcurrentSkipListMap}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.IntegerType
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.store.KvStore
import graft.types.PrimitiveCoder

/** Edge cases of the pushdown contract found by review — each was a
  * handled=true wrong answer before its fix:
  *   - top-N over a sign-split integral key drained BYTE order (0,1,2,…)
  *     and early-stopped before the true negative minimum; now the planner
  *     splits regions at the sign boundary so every partition drains value
  *     order;
  *   - NOT over composed predicates used blanket IsNotNull guards, dropping
  *     rows where a null column makes the child definitively FALSE
  *     (`!(a <=> v)` — which Spark pushes un-normalized — dropped every
  *     null row); negation now pushes through the tree De-Morgan-style;
  *   - a StartsWith prefix LONGER than a fixed-width key part compared into
  *     the NEXT part's bytes, returning false positives. */
class PushdownEdgeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); KvStore.dropAll() }

  // ---- top-N over signed integral keys ------------------------------------

  test("top-N pushdown stays correct over negative integral keys") {
    import spark.implicits._
    val catalog =
      """{"table":{"namespace":"default", "name":"negtop"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"v":{"cf":"f", "col":"v", "type":"int"}}}""".stripMargin
    (-20L to 20L).map(k => (k, k.toInt * 3)).toDF("key", "v")
      .write.format("graft-kv")
      .options(Map("catalog" -> catalog, "newtable" -> "4",
        "minSplitNum" -> "-20", "maxSplitNum" -> "20"))
      .mode("append").save()
    val df = spark.read.format("graft-kv").option("catalog", catalog).load()

    val asc = df.orderBy(col("key")).limit(5)
    assert(asc.queryExecution.executedPlan.toString.contains("pushedLimit=5"),
      "top-N must still push for integral keys")
    assert(asc.collect().map(_.getLong(0)).toSeq == (-20L to -16L))

    val desc = df.orderBy(col("key").desc).limit(4)
    assert(desc.queryExecution.executedPlan.toString.contains("pushedLimit=4 (reversed)"))
    assert(desc.collect().map(_.getLong(0)).toSeq == Seq(20L, 19L, 18L, 17L))

    // offset pagination across the sign boundary
    val page = df.orderBy(col("key")).offset(18).limit(4)
    assert(page.collect().map(_.getLong(0)).toSeq == Seq(-2L, -1L, 0L, 1L))

    // a filter whose range spans the boundary composes with the split
    val filtered = df.filter(col("key") >= -3L && col("key") <= 6L)
      .orderBy(col("key")).limit(3)
    assert(filtered.collect().map(_.getLong(0)).toSeq == Seq(-3L, -2L, -1L))
  }

  test("top-N pushdown declines float keys (negatives are byte-reversed)") {
    import spark.implicits._
    val catalog =
      """{"table":{"namespace":"default", "name":"negtopf"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"double"},
        |"v":{"cf":"f", "col":"v", "type":"int"}}}""".stripMargin
    Seq(-2.5, -1.25, 0.0, 1.5, 3.75).zipWithIndex.map { case (k, i) => (k, i) }
      .toDF("key", "v")
      .write.format("graft-kv")
      .options(Map("catalog" -> catalog, "newtable" -> "4"))
      .mode("append").save()
    val df = spark.read.format("graft-kv").option("catalog", catalog).load()
    val top = df.orderBy(col("key")).limit(2)
    assert(!top.queryExecution.executedPlan.toString.contains("pushedLimit"),
      "float keys must not push top-N")
    assert(top.collect().map(_.getDouble(0)).toSeq == Seq(-2.5, -1.25))
  }

  // ---- NOT pushdown: three-valued semantics -------------------------------

  test("!(col <=> v) keeps null rows through the connector") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val catalog =
      """{"table":{"namespace":"default", "name":"nsafe"},
        |"rowkey":"key",
        |"columns":{
        |"k":{"cf":"rowkey", "col":"key", "type":"int"},
        |"v":{"cf":"f", "col":"v", "type":"int"},
        |"s":{"cf":"f", "col":"s", "type":"string"}}}""".stripMargin
    // `s` is always present: a row whose every value column is null writes
    // ZERO cells and (HBase-like) does not exist in the store at all
    val rows = (0 until 12).map { k =>
      Row(k, if (k % 3 == 0) null else Int.box(k % 4), s"s$k")
    }
    val source = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("k", IntegerType, nullable = false),
        StructField("v", IntegerType, nullable = true),
        StructField("s", StringType, nullable = true))))
    source.write.format("graft-kv")
      .options(Map("catalog" -> catalog, "newtable" -> "4"))
      .mode("append").save()
    val kv = spark.read.format("graft-kv").option("catalog", catalog).load()

    for (pred <- Seq(
        !(col("v") <=> 1), !(col("v") <=> lit(null)), col("v") <=> 2,
        !(col("s") <=> "s5"), !(col("v") <=> 1) && (col("s") <=> "s3"))) {
      val expected = source.filter(pred).select("k").collect().map(_.getInt(0)).sorted.toSeq
      val actual = kv.filter(pred).select("k").collect().map(_.getInt(0)).sorted.toSeq
      assert(actual == expected, s"predicate $pred: expected $expected, got $actual")
    }
  }

  // compile-level: trees Spark's optimizer would normally normalize away
  // still reach compile() via DELETE conditions and index plans — their
  // three-valued negation must be exact or unhandled, never wrong

  private val notCat = graft.catalog.GraftCatalog.parse(
    """{"table":{"namespace":"default", "name":"notsem"},
      |"rowkey":"key",
      |"columns":{
      |"k":{"cf":"rowkey", "col":"key", "type":"int"},
      |"v":{"cf":"f", "col":"v", "type":"int"},
      |"s":{"cf":"f", "col":"s", "type":"string"}}}""".stripMargin, Map.empty)

  /** Build a store row: ints under f:v, strings under f:s; None = absent. */
  private def rowCells(v: Option[Int], s: Option[String]) = {
    val m = new ConcurrentHashMap[(String, String), ConcurrentSkipListMap[java.lang.Long, Array[Byte]]]()
    def put(qual: String, bytes: Array[Byte]): Unit = {
      val versions = new ConcurrentSkipListMap[java.lang.Long, Array[Byte]](
        java.util.Collections.reverseOrder[java.lang.Long]())
      versions.put(1L, bytes)
      m.put(("f", qual), versions)
    }
    v.foreach(x => put("v", PrimitiveCoder.encode(IntegerType, x)))
    s.foreach(x => put("s", x.getBytes("UTF-8")))
    m
  }

  private def evalPred(hrf: FilterCompiler.Hrf, v: Option[Int], s: Option[String]): Boolean = {
    assert(hrf.handled, "predicate must compile exactly")
    assert(hrf.ranges.nonEmpty, "full-range predicate expected")
    hrf.pred.forall(_.eval(PrimitiveCoder.encode(IntegerType, 1), rowCells(v, s), None))
  }

  test("Not(And(IsNull, cmp)): a null in the OTHER conjunct must still match") {
    val hrf = FilterCompiler.compile(notCat, Not(And(IsNull("s"), EqualTo("v", 5))))
    // SQL: NOT(s IS NULL AND v = 5)
    assert(!evalPred(hrf, v = Some(5), s = None))          // true  AND true  -> drop
    assert(evalPred(hrf, v = None, s = Some("x")))         // false AND null  -> keep (old guards dropped it)
    assert(evalPred(hrf, v = Some(3), s = None))           // true  AND false -> keep
    assert(evalPred(hrf, v = Some(5), s = Some("x")))      // false AND true  -> keep
  }

  test("Not(Or(cmp, IsNull)): unknown OR false is not true") {
    val hrf = FilterCompiler.compile(notCat, Not(Or(EqualTo("v", 1), IsNull("s"))))
    // SQL: NOT(v = 1 OR s IS NULL)
    assert(!evalPred(hrf, v = None, s = Some("x")))        // null OR false -> unknown -> drop
    assert(evalPred(hrf, v = Some(2), s = Some("x")))      // false OR false -> keep
    assert(!evalPred(hrf, v = Some(1), s = Some("x")))     // true -> drop
    assert(!evalPred(hrf, v = Some(2), s = None))          // s null -> drop
  }

  test("Not(IsNotNull) is IsNull, not the empty set") {
    val hrf = FilterCompiler.compile(notCat, Not(IsNotNull("v")))
    assert(evalPred(hrf, v = None, s = None))
    assert(!evalPred(hrf, v = Some(1), s = None))
  }

  test("Not(EqualNullSafe) matches nulls; double negation cancels") {
    val hrf = FilterCompiler.compile(notCat, Not(EqualNullSafe("v", 5)))
    assert(evalPred(hrf, v = None, s = None))              // null <=> 5 is false -> keep
    assert(!evalPred(hrf, v = Some(5), s = None))
    assert(evalPred(hrf, v = Some(4), s = None))
    val dn = FilterCompiler.compile(notCat, Not(Not(EqualTo("v", 5))))
    assert(!evalPred(dn, v = None, s = None))
    assert(evalPred(dn, v = Some(5), s = None))
  }

  test("Not over null-bearing / empty IN lists keeps the closed forms") {
    // NOT IN (…, NULL) is never true -> exact empty
    val withNull = FilterCompiler.compile(notCat, Not(In("v", Array(Int.box(1), null))))
    assert(withNull.handled && withNull.ranges.isEmpty)
    // nested under And via De Morgan: Not(And(In-with-null, x)) = Or(empty, ¬x)
    val nested = FilterCompiler.compile(notCat,
      Not(And(In("v", Array(Int.box(1), null)), EqualTo("v", 3))))
    assert(nested.handled)
    assert(evalPred(nested, v = Some(2), s = None))        // ¬(v=3) keeps it
    assert(!evalPred(nested, v = Some(3), s = None))
    // NOT(v IN ()) = NOT(FALSE) = everything, including null rows
    val emptyIn = FilterCompiler.compile(notCat, Not(In("v", Array.empty[Any])))
    assert(emptyIn.handled && emptyIn.pred.isEmpty && emptyIn.ranges.nonEmpty)
  }

  test("a large IN collapses to set predicates (value and key columns), evaluating exactly") {
    import graft.store.KvPredicate
    // value column: N same-shaped Eq leaves must become ONE ValueIn —
    // the generic Or walks every branch per served row, which measured
    // 80+ s at 15k keys × 150k rows in sv24's decrement read
    val vals: Array[Any] = (0 until 5000).map(i => Int.box(i * 2)).toArray
    val vIn = FilterCompiler.compile(notCat, In("v", vals))
    assert(vIn.handled)
    assert(vIn.pred.exists(_.isInstanceOf[KvPredicate.ValueIn]),
      s"value IN must collapse to ValueIn, got ${vIn.pred}")
    assert(evalPred(vIn, v = Some(4998), s = None))
    assert(!evalPred(vIn, v = Some(4999), s = None)) // odd: not in set
    assert(!evalPred(vIn, v = None, s = None))       // null never matches IN
    // key column: same collapse on the KeyCmp shape, and the point ranges
    // still plan (the scan seeks; the set predicate is the exact residual)
    val kIn = FilterCompiler.compile(notCat, In("k", vals))
    assert(kIn.handled && kIn.ranges.nonEmpty)
    assert(kIn.pred.exists(_.isInstanceOf[KvPredicate.KeyIn]),
      s"key IN must collapse to KeyIn, got ${kIn.pred}")
    assert(kIn.pred.get.eval(
      PrimitiveCoder.encode(IntegerType, 4998), rowCells(None, None), None))
    assert(!kIn.pred.get.eval(
      PrimitiveCoder.encode(IntegerType, 3), rowCells(None, None), None))
    // heterogeneous leaves keep the generic Or (no silent misfold)
    val mixed = FilterCompiler.compile(notCat,
      Or(In("v", Array(Int.box(1))), EqualTo("k", 7)))
    assert(mixed.handled)
  }

  test("floating IN keeps compareTo semantics: NaN matches, -0.0 stays distinct from 0.0") {
    // the Or(ValueCmp(Eq)) path this collapse replaced compared via
    // Double.compareTo (NaN = NaN TRUE, -0.0 = 0.0 FALSE); Scala set
    // equality does the opposite on both — canonical() must restore it
    import graft.store.KvPredicate
    import org.apache.spark.sql.types.DoubleType
    val leaves = Seq(Double.NaN, -0.0d, 2.5d).map(x =>
      KvPredicate.ValueCmp("f", "d", KvPredicate.Eq, Double.box(x),
        DoubleType, PrimitiveCoder))
    val in = KvPredicate.inOf(leaves).get
    assert(in.isInstanceOf[KvPredicate.ValueIn], s"expected ValueIn, got $in")
    def cells(x: Double) = {
      val m = new ConcurrentHashMap[(String, String), ConcurrentSkipListMap[java.lang.Long, Array[Byte]]]()
      val versions = new ConcurrentSkipListMap[java.lang.Long, Array[Byte]](
        java.util.Collections.reverseOrder[java.lang.Long]())
      versions.put(1L, PrimitiveCoder.encode(DoubleType, x))
      m.put(("f", "d"), versions)
      m
    }
    val key = PrimitiveCoder.encode(IntegerType, 1)
    assert(in.eval(key, cells(Double.NaN), None), "NaN IN (NaN, ...) must match")
    assert(in.eval(key, cells(-0.0d), None))
    assert(!in.eval(key, cells(0.0d), None),
      "0.0 must NOT match an IN containing only -0.0 (compareTo semantics)")
    assert(in.eval(key, cells(2.5d), None))
    assert(!in.eval(key, cells(2.6d), None))
  }

  test("Eq/In literals with a mismatched box compile against a bigint LEADING key (no encode crash)") {
    // a DIRECT FilterCompiler.compile caller (DELETE conditions, index
    // planning) may push literals whose box type differs from the key's —
    // the leading-key path used to crash inside coder.encode on the raw
    // literal before the leaf ever reached inOf's normalization
    val bigCat = graft.catalog.GraftCatalog.parse(
      """{"table":{"namespace":"default", "name":"bigkeysem"},
        |"rowkey":"key",
        |"columns":{
        |"k":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"v":{"cf":"f", "col":"v", "type":"int"}}}""".stripMargin, Map.empty)
    import org.apache.spark.sql.types.LongType
    // Integer literal against the bigint rowkey: plans a point range at
    // the COERCED long and evaluates numerically
    val eq = FilterCompiler.compile(bigCat, EqualTo("k", Int.box(7)))
    assert(eq.handled && eq.ranges.nonEmpty, s"coerced Eq must plan ranges: $eq")
    assert(eq.pred.get.eval(
      PrimitiveCoder.encode(LongType, 7L), rowCells(None, None), None))
    assert(!eq.pred.get.eval(
      PrimitiveCoder.encode(LongType, 8L), rowCells(None, None), None))
    val in = FilterCompiler.compile(bigCat, In("k", Array[Any](Int.box(3), Int.box(9))))
    assert(in.handled && in.ranges.nonEmpty)
    assert(in.pred.get.eval(
      PrimitiveCoder.encode(LongType, 9L), rowCells(None, None), None))
    assert(!in.pred.get.eval(
      PrimitiveCoder.encode(LongType, 4L), rowCells(None, None), None))
    // a literal no bigint can equal compiles to the EMPTY row set
    val never = FilterCompiler.compile(bigCat, EqualTo("k", Double.box(2.5)))
    assert(never.handled && never.ranges.isEmpty && never.pred.isEmpty,
      s"non-round-trip Eq literal must match nothing: $never")
  }

  test("IN with mismatched numeric literal boxes still matches numerically") {
    // the Or(ValueCmp(Eq)) path fell back to compareTyped's (Number, Number)
    // double-value comparison for mismatched boxes, so an Integer literal
    // matched a LongType column; the set collapse must normalize through the
    // column's DataType, not silently match nothing on box class
    import graft.store.KvPredicate
    import org.apache.spark.sql.types.{IntegerType, LongType}
    def valueLeaves(vs: Seq[Any], dt: org.apache.spark.sql.types.DataType) =
      vs.map(v => KvPredicate.ValueCmp("f", "d", KvPredicate.Eq, v, dt, PrimitiveCoder))
    def cellsL(x: Long) = {
      val m = new ConcurrentHashMap[(String, String), ConcurrentSkipListMap[java.lang.Long, Array[Byte]]]()
      val versions = new ConcurrentSkipListMap[java.lang.Long, Array[Byte]](
        java.util.Collections.reverseOrder[java.lang.Long]())
      versions.put(1L, PrimitiveCoder.encode(LongType, x))
      m.put(("f", "d"), versions)
      m
    }
    def cellsI(x: Int) = {
      val m = new ConcurrentHashMap[(String, String), ConcurrentSkipListMap[java.lang.Long, Array[Byte]]]()
      val versions = new ConcurrentSkipListMap[java.lang.Long, Array[Byte]](
        java.util.Collections.reverseOrder[java.lang.Long]())
      versions.put(1L, PrimitiveCoder.encode(IntegerType, x))
      m.put(("f", "d"), versions)
      m
    }
    val key = PrimitiveCoder.encode(IntegerType, 1)
    // Integer literals against a LongType column: must match the decoded Longs
    val intVsLong = KvPredicate.inOf(
      valueLeaves(Seq(Int.box(3), Int.box(7)), LongType)).get
    assert(intVsLong.isInstanceOf[KvPredicate.ValueIn])
    assert(intVsLong.eval(key, cellsL(3L), None),
      "Integer literal 3 must match LongType value 3")
    assert(intVsLong.eval(key, cellsL(7L), None))
    assert(!intVsLong.eval(key, cellsL(4L), None))
    // Double literal 2.0 against IntegerType: matches decoded 2 (numeric eq);
    // 2.5 can never equal an int — dropped from the set, no error, no match
    val dblVsInt = KvPredicate.inOf(
      valueLeaves(Seq(Double.box(2.0), Double.box(2.5)), IntegerType)).get
    assert(dblVsInt.eval(key, cellsI(2), None),
      "Double literal 2.0 must match IntegerType value 2")
    assert(!dblVsInt.eval(key, cellsI(3), None))
    // Long literal above Int range against IntegerType: dropped, never matches
    val bigVsInt = KvPredicate.inOf(
      valueLeaves(Seq(Long.box(1L + Int.MaxValue), Long.box(5L)), IntegerType)).get
    assert(bigVsInt.eval(key, cellsI(5), None))
    assert(!bigVsInt.eval(key, cellsI(Int.MinValue), None),
      "an out-of-range Long literal must not wrap into Int range")
    // Long literals above 2^53 against LongType: exact, no double round-trip loss
    val big = (1L << 60) + 1L
    val hugeLong = KvPredicate.inOf(
      valueLeaves(Seq(Long.box(big)), LongType)).get
    assert(hugeLong.eval(key, cellsL(big), None))
    assert(!hugeLong.eval(key, cellsL(1L << 60), None),
      "2^60 must not match 2^60+1 through a lossy double round-trip")
  }

  // ---- StartsWith over fixed-width key parts ------------------------------

  test("StartsWith prefix longer than a fixed-width key part matches nothing") {
    import spark.implicits._
    val catalog =
      """{"table":{"namespace":"default", "name":"fixpfx"},
        |"rowkey":"c1:c2",
        |"columns":{
        |"c1":{"cf":"rowkey", "col":"c1", "type":"string", "length":"2"},
        |"c2":{"cf":"rowkey", "col":"c2", "type":"string"},
        |"v":{"cf":"f", "col":"v", "type":"int"}}}""".stripMargin
    val source = Seq(("ab", "cat", 1), ("ab", "dog", 2), ("ac", "ant", 3), ("zz", "zap", 4))
      .toDF("c1", "c2", "v")
    source.write.format("graft-kv")
      .options(Map("catalog" -> catalog, "newtable" -> "4"))
      .mode("append").save()
    val kv = spark.read.format("graft-kv").option("catalog", catalog).load()

    // 'abc' is wider than c1's declared 2 bytes: no c1 value can match, and
    // the old raw-byte test matched ('ab','cat') through c2's first byte
    assert(kv.filter(col("c1").startsWith("abc")).count() == 0)
    for (pred <- Seq(col("c1").startsWith("ab"), col("c1").startsWith("a"),
        col("c2").startsWith("ca"), col("c1").startsWith("abc"))) {
      val expected = source.filter(pred).select("v").collect().map(_.getInt(0)).sorted.toSeq
      val actual = kv.filter(pred).select("v").collect().map(_.getInt(0)).sorted.toSeq
      assert(actual == expected, s"predicate $pred")
    }
    // negation of the over-width prefix is everything (c1 is never null)
    assert(kv.filter(!col("c1").startsWith("abc")).count() == 4)
  }

  // ---- range-bound literal coercion (direct compile() callers) ------------

  private def bigCat = graft.catalog.GraftCatalog.parse(
    """{"table":{"namespace":"default", "name":"bigkeybound"},
      |"rowkey":"key",
      |"columns":{
      |"k":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"v":{"cf":"f", "col":"v", "type":"int"}}}""".stripMargin, Map.empty)

  test("range-bound literals with a mismatched box compile against a bigint LEADING key") {
    import org.apache.spark.sql.types.LongType
    def k(x: Long) = PrimitiveCoder.encode(LongType, x)
    val none = rowCells(None, None)
    // Integer bound used to reach coder.lessRanges raw and crash encode
    val lt = FilterCompiler.compile(bigCat, LessThan("k", Int.box(5)))
    assert(lt.handled && lt.ranges.nonEmpty, s"coerced bound must plan ranges: $lt")
    assert(lt.pred.get.eval(k(4), none, None) && !lt.pred.get.eval(k(5), none, None))
    // fractional bounds round toward the op's direction: k < 2.5 ⇔ k <= 2
    val ltf = FilterCompiler.compile(bigCat, LessThan("k", Double.box(2.5)))
    assert(ltf.handled && ltf.ranges.nonEmpty)
    assert(ltf.pred.get.eval(k(2), none, None) && !ltf.pred.get.eval(k(3), none, None))
    val gtf = FilterCompiler.compile(bigCat, GreaterThan("k", Double.box(2.5)))
    assert(gtf.pred.get.eval(k(3), none, None) && !gtf.pred.get.eval(k(2), none, None))
    // bounds outside the type's domain collapse closed-form
    val all = FilterCompiler.compile(bigCat, LessThan("k", Double.box(1e20)))
    assert(all.handled && all.ranges.nonEmpty && all.pred.isEmpty, s"everything: $all")
    val nothing = FilterCompiler.compile(bigCat, GreaterThan("k", Double.box(1e20)))
    assert(nothing.handled && nothing.ranges.isEmpty && nothing.pred.isEmpty, s"nothing: $nothing")
    // above 2^53 the bound math must stay in the long domain: double(2^60 - 1)
    // rounds back to 2^60, so a float-side `- 1` would wrongly admit 2^60
    val p60 = FilterCompiler.compile(bigCat, LessThan("k", Double.box(1.152921504606846976e18)))
    assert(!p60.pred.get.eval(k(1L << 60), none, None))
    assert(p60.pred.get.eval(k((1L << 60) - 1), none, None))
    // negation of a domain-wide bound is the empty set (key parts never null)
    val negAll = FilterCompiler.compile(bigCat, Not(LessThan("k", Double.box(1e20))))
    assert(negAll.handled && negAll.ranges.isEmpty, s"not(everything) = nothing: $negAll")
  }

  test("NaN bounds on a floating key keep Double.compare semantics (NaN greatest)") {
    import org.apache.spark.sql.types.DoubleType
    val dblCat = graft.catalog.GraftCatalog.parse(
      """{"table":{"namespace":"default", "name":"dblkeybound"},
        |"rowkey":"key",
        |"columns":{
        |"k":{"cf":"rowkey", "col":"key", "type":"double"},
        |"v":{"cf":"f", "col":"v", "type":"int"}}}""".stripMargin, Map.empty)
    def k(x: Double) = PrimitiveCoder.encode(DoubleType, x)
    val none = rowCells(None, None)
    // x < NaN: every non-NaN matches — no contiguous IEEE-bit range covers
    // that, so the scan must NOT prune (AllRanges) while the pred stays exact
    val lt = FilterCompiler.compile(dblCat, LessThan("k", Double.box(Double.NaN)))
    assert(lt.handled && lt.pred.nonEmpty)
    assert(lt.ranges == Seq(graft.ranges.ScanRange.all[Array[Byte]]), s"NaN bound must not prune: $lt")
    assert(lt.pred.get.eval(k(1.5), none, None))
    assert(lt.pred.get.eval(k(Double.PositiveInfinity), none, None))
    assert(!lt.pred.get.eval(k(Double.NaN), none, None))
    val le = FilterCompiler.compile(dblCat, LessThanOrEqual("k", Double.box(Double.NaN)))
    assert(le.handled && le.pred.isEmpty && le.ranges.nonEmpty, s"x <= NaN is everything: $le")
    val gt = FilterCompiler.compile(dblCat, GreaterThan("k", Double.box(Double.NaN)))
    assert(gt.handled && gt.ranges.isEmpty, s"x > NaN is nothing: $gt")
    val ge = FilterCompiler.compile(dblCat, GreaterThanOrEqual("k", Double.box(Double.NaN)))
    assert(ge.handled && ge.ranges.nonEmpty)
    assert(ge.pred.get.eval(k(Double.NaN), none, None), "only NaN >= NaN")
    assert(!ge.pred.get.eval(k(3.0), none, None))
  }

  test("float key bounds from double literals round to the nearest sound float bound") {
    import org.apache.spark.sql.types.FloatType
    val fltCat = graft.catalog.GraftCatalog.parse(
      """{"table":{"namespace":"default", "name":"fltkeybound"},
        |"rowkey":"key",
        |"columns":{
        |"k":{"cf":"rowkey", "col":"key", "type":"float"},
        |"v":{"cf":"f", "col":"v", "type":"int"}}}""".stripMargin, Map.empty)
    def k(x: Float) = PrimitiveCoder.encode(FloatType, x)
    val none = rowCells(None, None)
    // (float)1.1 > 1.1d: x <= 1.1d excludes 1.1f, x > 1.1d includes it
    val le = FilterCompiler.compile(fltCat, LessThanOrEqual("k", Double.box(1.1)))
    assert(!le.pred.get.eval(k(1.1f), none, None))
    assert(le.pred.get.eval(k(Math.nextDown(1.1f)), none, None))
    val gt = FilterCompiler.compile(fltCat, GreaterThan("k", Double.box(1.1)))
    assert(gt.pred.get.eval(k(1.1f), none, None))
    assert(!gt.pred.get.eval(k(Math.nextDown(1.1f)), none, None))
    // (float)1.3 < 1.3d: x < 1.3d includes 1.3f, x >= 1.3d excludes it
    val lt = FilterCompiler.compile(fltCat, LessThan("k", Double.box(1.3)))
    assert(lt.pred.get.eval(k(1.3f), none, None))
    assert(!lt.pred.get.eval(k(Math.nextUp(1.3f)), none, None))
    val ge = FilterCompiler.compile(fltCat, GreaterThanOrEqual("k", Double.box(1.3)))
    assert(!ge.pred.get.eval(k(1.3f), none, None))
    assert(ge.pred.get.eval(k(Math.nextUp(1.3f)), none, None))
  }

  test("IN drops non-round-trip literals instead of going unhandled (DELETE-all hazard)") {
    import org.apache.spark.sql.types.LongType
    def k(x: Long) = PrimitiveCoder.encode(LongType, x)
    val none = rowCells(None, None)
    // direct DELETE/index callers never check `handled`: an unhandled
    // `k IN (3, 2.5)` would hand AllRanges + no pred to deleteNow and
    // silently target EVERY row — the 2.5 leaf matches nothing and must
    // simply drop from the union
    val in = FilterCompiler.compile(bigCat, In("k", Array[Any](Int.box(3), Double.box(2.5))))
    assert(in.handled && in.ranges.nonEmpty && in.pred.nonEmpty, s"must stay exact: $in")
    assert(in.pred.get.eval(k(3), none, None))
    assert(!in.pred.get.eval(k(2), none, None))
    // every literal non-round-trip ⇒ the exact empty set
    val empty = FilterCompiler.compile(bigCat, In("k", Array[Any](Double.box(2.5), Double.box(0.5))))
    assert(empty.handled && empty.ranges.isEmpty, s"all-dropped IN is empty: $empty")
    // and destructive callers refuse an over-approximation loudly
    intercept[IllegalArgumentException](FilterCompiler.unhandled.exactOrThrow("DELETE"))
    in.exactOrThrow("DELETE") // exact passes through
  }

  test("Not of a non-round-trip Eq on a VALUE column keeps the IsNotNull guard") {
    import org.apache.spark.sql.types.LongType
    def k(x: Long) = PrimitiveCoder.encode(LongType, x)
    // intCol = 2.5 matches nothing, but NOT(intCol = 2.5) is only true for
    // NON-NULL intCol (3VL: NOT(NULL = 2.5) is not true) — the negation
    // must carry an IsNotNull guard, not compile to bare everything
    val not = FilterCompiler.compile(bigCat, Not(EqualTo("v", Double.box(2.5))))
    assert(not.handled && not.pred.nonEmpty, s"value-col negation needs a guard: $not")
    assert(not.pred.get.eval(k(1), rowCells(Some(7), None), None))
    assert(!not.pred.get.eval(k(1), rowCells(None, None), None))
  }
}
