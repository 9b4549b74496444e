package graft.datasource

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.store.KvStore

// Record fixtures live at top level so Spark can derive product encoders.
case class HRec(col0: String, col1: Boolean, col2: Double, col3: Float,
    col4: Int, col5: Long, col6: Short, col7: String, col8: Byte)
object HRec {
  def apply(i: Int, t: String): HRec = HRec(f"row$i%03d", i % 2 == 0, i.toDouble,
    i.toFloat, i, i.toLong, i.toShort, s"String$i: $t", i.toByte)
}
case class IRec(col0: Int, col1: Boolean, col7: String)
case class CRec(col00: String, col01: Int, col1: Boolean, col7: String)
case class VRec(key: String, v: String)
case class DRec(key: String, dyn: Map[String, Int])
case class PRec(col0: Int, col7: String)
case class PCRec(col00: String, col01: Int, col7: String)

/** End-to-end connector tests over the embedded store, mirroring the
  * reference's minicluster suites:
  *  - F1 256-row string-key corpus (DefaultSourceSuite.scala:109-428)
  *  - F2 negative int keys (DataTypeSuite.scala:90-151)
  *  - F3 composite keys (CompositeKeySuite.scala:80-179)
  *  - versions (MaxVersionsSuite.scala:45-98), dynamic cols (DynamicColumnSuite)
  */
class GraftSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); KvStore.dropAll() }

  import spark.implicits._

  // ---- F1: 256-row string-key corpus --------------------------------------

  val f1Catalog: String =
    """{"table":{"namespace":"default", "name":"f1table"},
      |"rowkey":"key",
      |"columns":{
      |"col0":{"cf":"rowkey", "col":"key", "type":"string"},
      |"col1":{"cf":"cf1", "col":"col1", "type":"boolean"},
      |"col2":{"cf":"cf2", "col":"col2", "type":"double"},
      |"col3":{"cf":"cf3", "col":"col3", "type":"float"},
      |"col4":{"cf":"cf4", "col":"col4", "type":"int"},
      |"col5":{"cf":"cf5", "col":"col5", "type":"bigint"},
      |"col6":{"cf":"cf6", "col":"col6", "type":"smallint"},
      |"col7":{"cf":"cf7", "col":"col7", "type":"string"},
      |"col8":{"cf":"cf8", "col":"col8", "type":"tinyint"}}}""".stripMargin

  def writeF1(): Unit = {
    (0 to 255).map(HRec(_, "extra")).toDF()
      .write.format("graft-kv")
      .options(Map("catalog" -> f1Catalog, "newtable" -> "5"))
      .mode("append").save()
  }

  def readF1(): DataFrame =
    spark.read.format("graft-kv").option("catalog", f1Catalog).load()

  test("F1: write populates presplit regions; full count") {
    writeF1()
    val t = KvStore.table("default:f1table")
    assert(t.regions.size == 5)
    assert(readF1().count() == 256)
  }

  test("F1: range pushdown with residual (filtered query0 shape)") {
    val df = readF1()
    assert(df.filter($"col0" <= "row005").select("col0", "col1").count() == 6)
    assert(df.filter($"col0" < "row005").count() == 5)
    assert(df.filter($"col0" > "row250").count() == 5)
    assert(df.filter($"col0" >= "row250").count() == 6)
    assert(df.filter($"col0" === "row100").count() == 1)
  }

  test("F1: boolean combinations") {
    val df = readF1()
    // (col0 <= row050 && col0 > row040) || col0 === row005 → 10 + 1
    assert(df.filter(($"col0" <= "row050" && $"col0" > "row040") || $"col0" === "row005").count() == 11)
    assert(df.filter($"col4" < 10 && $"col1" === true).count() == 5)
  }

  test("F1: IN and NOT IN (set-difference rewrite)") {
    val df = readF1()
    assert(df.filter($"col0".isin("row001", "row002", "row099")).count() == 3)
    assert(df.filter($"col0".isin("row001", "row002", "row099") &&
      !$"col0".isin("row002")).count() == 2)
  }

  test("F1: 2000-element IN / NOT-IN (reference stack-overflow regression)") {
    // reference DefaultSourceSuite.scala:156-194 pins very large IN lists;
    // compile must stay near-linear in |IN| (single normalize pass)
    val df = readF1()
    val big = (0 until 2000).map(i => f"row${i % 1000}%03x") // 1000 distinct, half miss
    val t0 = System.nanoTime()
    val hits = df.filter($"col0".isin(big: _*)).count()
    val notIn = df.filter($"col0".isin(big: _*) && !$"col0".isin(big.take(1000): _*)).count()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    // keys row000..row0ff (hex) exist only when the hex string is all digits:
    // compute expected straight from the generator
    val keys = (0 to 255).map(i => f"row$i%03d").toSet
    assert(hits == big.distinct.count(keys.contains))
    assert(notIn == 0) // second IN list covers the first
    assert(elapsedMs < 30000, s"large-IN path took ${elapsedMs}ms")
  }

  test("F1: NOT IN with a NULL in the list matches nothing") {
    val df = readF1()
    // SQL three-valued logic: x NOT IN ('row001', NULL) is never true
    val withNull: Seq[Any] = Seq("row001", null)
    assert(df.filter(!$"col0".isInCollection(withNull)).count() == 0)
    // positive IN with a null simply ignores it
    assert(df.filter($"col0".isInCollection(withNull)).count() == 1)
  }

  test("F1: string predicates on key and value columns") {
    val df = readF1()
    assert(df.filter($"col0".startsWith("row25")).count() == 6) // row250..row255
    assert(df.filter($"col7".endsWith(": extra")).count() == 256)
    assert(df.filter($"col7".contains("String100")).count() == 1)
  }

  test("F1: column range predicates on every numeric type") {
    val df = readF1()
    assert(df.filter($"col2" < 16.0).count() == 16)
    assert(df.filter($"col3" >= 254.0f).count() == 2)
    assert(df.filter($"col4" <= 9).count() == 10)
    assert(df.filter($"col5" > 250L).count() == 5)
    assert(df.filter($"col6" === 7.toShort).count() == 1)
    // tinyint wraps: bytes cycle every 256 — all 256 distinct here
    assert(df.filter($"col8" === 100.toByte).count() == 1)
  }

  test("F1: SQL over temp view with count(col)") {
    readF1().createOrReplaceTempView("f1view")
    val n = spark.sql("select count(col1) from f1view where col0 < 'row050'").collect()(0).getLong(0)
    assert(n == 50)
  }

  test("F1: projection pruning reads only required columns") {
    val df = readF1().select("col0", "col5")
    assert(df.columns.toSeq == Seq("col0", "col5"))
    assert(df.collect().map(_.getLong(1)).sum == (0 to 255).map(_.toLong).sum)
  }

  test("F1: input partitions carry region-host locality hints") {
    // reference getPreferredLocations (HBaseTableScan.scala:384-388): each
    // partition schedules onto its region's host
    writeF1()
    val catalog = graft.catalog.GraftCatalog.parse(f1Catalog, Map.empty)
    val opts = GraftOptions(new java.util.HashMap[String, String](
      java.util.Map.of("catalog", f1Catalog)))
    val parts = new GraftScan(catalog, opts, catalog.schema, Array.empty)
      .planInputPartitions()
    assert(parts.length == KvStore.table("default:f1table").regions.size)
    val hostsByRegion = KvStore.table("default:f1table").regionInfos
      .map(r => r.index -> r.host).toMap
    parts.foreach { p =>
      val gp = p.asInstanceOf[GraftInputPartition]
      // the partition CARRIES its region's host; the preference itself is
      // suppressed under local-mode masters (synthetic hosts would starve
      // stages mixing scan and post-shuffle partitions — see
      // GraftInputPartition.preferredLocations), where it must be empty
      assert(gp.host == hostsByRegion(gp.regionIndex))
      assert(gp.preferredLocations().isEmpty,
        "local mode must not advertise synthetic region hosts")
    }
  }

  // ---- F2: int row key with negatives -------------------------------------

  val f2Catalog: String =
    """{"table":{"namespace":"default", "name":"f2table", "tableCoder":"PrimitiveType"},
      |"rowkey":"key",
      |"columns":{
      |"col0":{"cf":"rowkey", "col":"key", "type":"int"},
      |"col1":{"cf":"cf1", "col":"col1", "type":"boolean"},
      |"col7":{"cf":"cf7", "col":"col7", "type":"string"}}}""".stripMargin

  test("F2: negative int keys — sign-split range correctness") {
    (0 to 31).map(i => IRec(if (i % 2 == 0) i else -i, i % 2 == 0, s"s$i")).toDF()
      .write.format("graft-kv")
      .options(Map("catalog" -> f2Catalog, "newtable" -> "4"))
      .mode("append").save()
    val df = spark.read.format("graft-kv").option("catalog", f2Catalog).load()
    assert(df.count() == 32)
    assert(df.filter($"col0" < 0).count() == 16)   // DataTypeSuite: 16 rows
    assert(df.filter($"col0" <= -10).count() == 11) // DataTypeSuite: 11 rows
    assert(df.filter($"col0" > 0).count() == 15)
    assert(df.filter($"col0" >= -5).count() == 19) // -5..-1 odd: -5,-3,-1 (3) + 0,2,..30 (16)
    assert(df.filter($"col0" === -11).count() == 1)
  }

  // ---- F3: composite key ---------------------------------------------------

  val f3Catalog: String =
    """{"table":{"namespace":"default", "name":"f3table", "tableCoder":"PrimitiveType"},
      |"rowkey":"key1:key2",
      |"columns":{
      |"col00":{"cf":"rowkey", "col":"key1", "type":"string", "length":"6"},
      |"col01":{"cf":"rowkey", "col":"key2", "type":"int"},
      |"col1":{"cf":"cf1", "col":"col1", "type":"boolean"},
      |"col7":{"cf":"cf7", "col":"col7", "type":"string"}}}""".stripMargin

  test("F3: composite key point + range + suffix predicates") {
    (0 to 255).map(i => CRec(f"row$i%03d", if (i % 2 == 0) i else -i, i % 2 == 0, s"s$i")).toDF()
      .write.format("graft-kv")
      .options(Map("catalog" -> f3Catalog, "newtable" -> "5"))
      .mode("append").save()
    val df = spark.read.format("graft-kv").option("catalog", f3Catalog).load()
    assert(df.count() == 256)
    // first-dimension predicates prune ranges
    assert(df.filter($"col00" === "row100").count() == 1)
    assert(df.filter($"col00" <= "row005").count() == 6)
    assert(df.filter($"col00".startsWith("row25")).count() == 6)
    // suffix predicates (dropped by the reference, pushed as KeyCmp here)
    assert(df.filter($"col01" < 0).count() == 128)
    assert(df.filter($"col01" === -11).count() == 1)
    assert(df.filter($"col00" > "row249" && $"col01" % 2 === 0).count() == 3)
  }

  // ---- versions ------------------------------------------------------------

  val vCatalog: String =
    """{"table":{"namespace":"default", "name":"vtable"},
      |"rowkey":"key",
      |"columns":{
      |"key":{"cf":"rowkey", "col":"key", "type":"string"},
      |"v":{"cf":"cf1", "col":"v", "type":"string"}}}""".stripMargin

  test("versions: timestamped writes, time-range reads, explosion") {
    def writeAt(ts: Long, suffix: String): Unit =
      (0 until 4).map(i => VRec(s"k$i", s"val$suffix$i")).toDF()
        .write.format("graft-kv")
        .options(Map("catalog" -> vCatalog, "newtable" -> "4",
          "timestamp" -> ts.toString, "maxVersions" -> "3"))
        .mode("append").save()
    writeAt(1000L, "A")
    writeAt(2000L, "B")
    writeAt(3000L, "C")

    def read(extra: (String, String)*): DataFrame =
      spark.read.format("graft-kv")
        .options(Map("catalog" -> vCatalog) ++ extra.toMap).load()

    // default: latest merge
    assert(read().count() == 4)
    assert(read().filter($"v".startsWith("valC")).count() == 4)
    // exact timestamp
    assert(read("timestamp" -> "2000").filter($"v".startsWith("valB")).count() == 4)
    // time range [min, max)
    assert(read("minStamp" -> "1000", "maxStamp" -> "2001")
      .filter($"v".startsWith("valB")).count() == 4)
    // explosion: one row per version
    assert(read("mergeToLatest" -> "false", "maxVersions" -> "3").count() == 12)
  }

  // ---- dynamic columns -----------------------------------------------------

  val dynCatalog: String =
    """{"table":{"namespace":"default", "name":"dyntable"},
      |"rowkey":"key",
      |"columns":{
      |"key":{"cf":"rowkey", "col":"key", "type":"string"},
      |"dyn":{"cf":"cf1", "col":"", "type":"map<string,int>"}}}""".stripMargin

  test("dynamic columns: schema-on-read map round trip") {
    Seq(DRec("a", Map("x" -> 1, "y" -> 2)), DRec("b", Map("z" -> 3))).toDF()
      .write.format("graft-kv")
      .options(Map("catalog" -> dynCatalog, "newtable" -> "4"))
      .mode("append").save()
    val df = spark.read.format("graft-kv").option("catalog", dynCatalog).load()
    val rows = df.orderBy("key").collect()
    assert(rows(0).getAs[Map[String, Int]]("dyn") == Map("x" -> 1, "y" -> 2))
    assert(rows(1).getAs[Map[String, Int]]("dyn") == Map("z" -> 3))
  }

  // ---- nulls ---------------------------------------------------------------

  test("nulls are skipped on write and read back as null") {
    val nullCatalog =
      """{"table":{"namespace":"default", "name":"ntable"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"string"},
        |"a":{"cf":"cf1", "col":"a", "type":"string"},
        |"b":{"cf":"cf1", "col":"b", "type":"int"}}}""".stripMargin
    Seq(("k1", Some("x"), Some(1)), ("k2", None, Some(2)), ("k3", Some("y"), None))
      .toDF("key", "a", "b")
      .write.format("graft-kv")
      .options(Map("catalog" -> nullCatalog, "newtable" -> "4"))
      .mode("append").save()
    val df = spark.read.format("graft-kv").option("catalog", nullCatalog).load()
    assert(df.count() == 3)
    assert(df.filter($"a".isNull).count() == 1)
    assert(df.filter($"a".isNotNull && $"b".isNotNull).count() == 1)
    assert(df.filter(!($"a" === "x")).count() == 1) // k3; k2 is NULL → excluded
  }

  // ---- Phoenix coder -------------------------------------------------------

  test("Phoenix coder: negative int keys order-preserving") {
    val pCatalog =
      """{"table":{"namespace":"default", "name":"ptable", "tableCoder":"Phoenix", "version":"2.0"},
        |"rowkey":"key",
        |"columns":{
        |"col0":{"cf":"rowkey", "col":"key", "type":"int"},
        |"col7":{"cf":"cf7", "col":"col7", "type":"string"}}}""".stripMargin
    (0 to 31).map(i => PRec(if (i % 2 == 0) i else -i, s"s$i")).toDF()
      .write.format("graft-kv")
      .options(Map("catalog" -> pCatalog, "newtable" -> "4"))
      .mode("append").save()
    val df = spark.read.format("graft-kv").option("catalog", pCatalog).load()
    assert(df.filter($"col0" < 0).count() == 16)
    assert(df.filter($"col0" <= -10).count() == 11)
    assert(df.filter($"col0" === -11).count() == 1)
  }

  test("Phoenix coder: composite key (string(6) + int) with negative parts") {
    // reference PhoenixCompositeKeySuite shape: fixed-width string prefix,
    // int suffix with mixed signs; prefix predicates prune ranges, suffix
    // predicates are exact key predicates
    val pcCatalog =
      """{"table":{"namespace":"default", "name":"pctable", "tableCoder":"Phoenix", "version":"2.0"},
        |"rowkey":"key1:key2",
        |"columns":{
        |"col00":{"cf":"rowkey", "col":"key1", "type":"string", "length":"6"},
        |"col01":{"cf":"rowkey", "col":"key2", "type":"int"},
        |"col7":{"cf":"cf7", "col":"col7", "type":"string"}}}""".stripMargin
    (0 to 63).map(i => PCRec(f"row$i%03d", if (i % 2 == 0) i else -i, s"s$i")).toDF()
      .write.format("graft-kv")
      .options(Map("catalog" -> pcCatalog, "newtable" -> "4"))
      .mode("append").save()
    val df = spark.read.format("graft-kv").option("catalog", pcCatalog).load()
    assert(df.count() == 64)
    assert(df.filter($"col00" === "row005" && $"col01" === -5).count() == 1)
    assert(df.filter($"col00" <= "row009").count() == 10)
    assert(df.filter($"col01" < 0).count() == 32) // suffix predicate, exact
    assert(df.filter($"col00" >= "row060" && $"col01" >= 0).count() == 2)
  }
}
