package graft.datasource

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.store.KvStore

/** Salted (bucketed) tables: `"table":{"salt":"n"}` spreads every write
  * across n bucket regions by a one-byte key-hash prefix — the Phoenix
  * salt-bucket defense against monotone-key region hot-spotting. The salt
  * must be invisible to every read surface: decode, filter pushdown (ranges
  * fan per bucket; single-part point lookups compute their salt), top-N,
  * pushed aggregation, and the SQL catalog's row-level operations. */
class SaltedSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalog.graft", classOf[GraftTableCatalog].getName)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); KvStore.dropAll() }

  private val saltedCatalog =
    """{"table":{"namespace":"default", "name":"salted1", "salt":"8"},
      |"rowkey":"key",
      |"columns":{
      |"k":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"v":{"cf":"f", "col":"v", "type":"string"},
      |"x":{"cf":"f", "col":"x", "type":"double"}}}""".stripMargin

  private def writeSalted(): Unit = {
    import spark.implicits._
    if (!KvStore.exists("default:salted1")) {
      (0L until 1000L).map(i => (i, s"v$i", i * 1.5)).toDF("k", "v", "x")
        .write.format("graft-kv")
        .options(Map("catalog" -> saltedCatalog, "newtable" -> "4"))
        .mode("append").save()
    }
  }

  private def readSalted() =
    spark.read.format("graft-kv").option("catalog", saltedCatalog).load()

  test("a monotone key stream spreads across every bucket region") {
    writeSalted()
    val t = KvStore.table("default:salted1")
    assert(t.regions.size == 8, "one region per salt bucket")
    val counts = t.regions.map(_.rowCount.get())
    assert(counts.forall(_ > 0), s"every bucket must take writes: $counts")
    // 1000 monotone keys over 8 buckets: no bucket hot-spots
    assert(counts.max < 1000 / 2, s"no bucket may dominate: $counts")
  }

  test("decode, range scan, and point lookup see through the salt") {
    writeSalted()
    val df = readSalted()
    assert(df.count() == 1000)
    // round trip: values land on their keys
    val some = df.filter(col("k") === 123L).collect()
    assert(some.toSeq.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))) ==
      Seq((123L, "v123", 184.5)))
    // single-part Eq computes its salt: exactly ONE partition (a point get,
    // not an 8-bucket fan)
    assert(df.filter(col("k") === 123L).rdd.getNumPartitions == 1)
    // range predicates fan per bucket but stay correct and complete
    val ranged = df.filter(col("k") >= 100L && col("k") < 200L)
    assert(ranged.count() == 100)
    assert(ranged.agg(sum(col("k"))).head().getLong(0) == (100L until 200L).sum)
    // IN-list: every member an exact salted get
    assert(df.filter(col("k").isin(5L, 500L, 999L)).count() == 3)
  }

  test("top-N and pushed aggregation stay correct on salted regions") {
    writeSalted()
    val df = readSalted()
    // per-region order within a bucket IS logical order (salt byte is
    // constant inside a region), so pushed top-N + Spark's final merge
    // return the true global top
    val top = df.orderBy(col("k")).limit(5).collect().map(_.getLong(0)).toSeq
    assert(top == (0L until 5L))
    val bottom = df.orderBy(col("k").desc).limit(3).collect().map(_.getLong(0)).toSeq
    assert(bottom == Seq(999L, 998L, 997L))
    // pushed min/max/count: per-region partials merge across buckets
    val agg = df.agg(min(col("k")), max(col("k")), count(lit(1))).head()
    assert((agg.getLong(0), agg.getLong(1), agg.getLong(2)) == (0L, 999L, 1000L))
  }

  test("composite salted key: first-part ranges fan, suffix predicates push") {
    import spark.implicits._
    val cat =
      """{"table":{"namespace":"default", "name":"salted2", "salt":"4"},
        |"rowkey":"key1:key2",
        |"columns":{
        |"a":{"cf":"rowkey", "col":"key1", "type":"string", "length":"2"},
        |"b":{"cf":"rowkey", "col":"key2", "type":"bigint"},
        |"v":{"cf":"f", "col":"v", "type":"string"}}}""".stripMargin
    val rows = for (a <- Seq("aa", "bb", "cc"); b <- 0L until 50L)
      yield (a, b, s"$a-$b")
    rows.toDF("a", "b", "v").write.format("graft-kv")
      .options(Map("catalog" -> cat, "newtable" -> "4")).mode("append").save()
    val df = spark.read.format("graft-kv").option("catalog", cat).load()
    assert(df.count() == 150)
    assert(df.filter(col("a") === "bb").count() == 50)
    assert(df.filter(col("a") === "bb" && col("b") < 10L).count() == 10)
    assert(df.filter(col("a") >= "bb").count() == 100)
    val one = df.filter(col("a") === "cc" && col("b") === 7L).collect()
    assert(one.length == 1 && one.head.getString(2) == "cc-7")
    KvStore.drop("default:salted2")
  }

  test("SQL catalog: saltBuckets TBLPROPERTY, row-level UPDATE/DELETE on salted") {
    spark.sql(
      """CREATE TABLE graft.default.saltsql (k BIGINT, v STRING)
        |TBLPROPERTIES ('rowkey' = 'k', 'saltBuckets' = '8')""".stripMargin)
    try {
      assert(KvStore.table("default:saltsql").regions.size == 8)
      spark.range(0, 200).selectExpr("id AS k", "concat('v', CAST(id AS STRING)) AS v")
        .createOrReplaceTempView("saltsql_src")
      spark.sql("INSERT INTO graft.default.saltsql SELECT k, v FROM saltsql_src")
      assert(KvStore.table("default:saltsql").regions.map(_.rowCount.get()).forall(_ > 0))
      // the delta writer salts through the shared codec: update in place...
      spark.sql("UPDATE graft.default.saltsql SET v = upper(v) WHERE k = 7")
      assert(spark.sql("SELECT v FROM graft.default.saltsql WHERE k = 7")
        .head().getString(0) == "V7")
      // ...delete by residual predicate (row-level path, salted row ids):
      // v100..v199 have 4+ chars
      spark.sql("DELETE FROM graft.default.saltsql WHERE length(v) > 3")
      assert(spark.sql("SELECT count(*) AS n FROM graft.default.saltsql")
        .head().getLong(0) == 100L) // v0..v99 survive
      // ...and exact-range DELETE (metadata path through salted fan-out)
      spark.sql("DELETE FROM graft.default.saltsql WHERE k < 5")
      assert(spark.sql("SELECT count(*) AS n FROM graft.default.saltsql")
        .head().getLong(0) == 95L)
    } finally spark.sql("DROP TABLE graft.default.saltsql")
  }
}
