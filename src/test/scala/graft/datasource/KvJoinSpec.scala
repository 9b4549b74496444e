package graft.datasource

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.store.KvStore

/** kv × kv join pushdown ([[PushedKvJoin]]): every accepted shape must be
  * byte-identical to the UNPUSHED plan (conf off), and every out-of-scope
  * shape must decline and still answer correctly through Spark's own join. */
class KvJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val ConfKey = "spark.sql.optimizer.datasourceV2JoinPushdown"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); KvStore.dropAll() }

  import spark.implicits._

  private val catA =
    """{"table":{"namespace":"default", "name":"jta"},
      |"rowkey":"key",
      |"columns":{
      |"k":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"a1":{"cf":"f", "col":"a1", "type":"string"},
      |"a2":{"cf":"f", "col":"a2", "type":"bigint"}}}""".stripMargin
  private val catB =
    """{"table":{"namespace":"default", "name":"jtb"},
      |"rowkey":"key",
      |"columns":{
      |"k":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"b1":{"cf":"f", "col":"b1", "type":"string"},
      |"b2":{"cf":"f", "col":"b2", "type":"double"}}}""".stripMargin
  private val catSalted =
    """{"table":{"namespace":"default", "name":"jts", "salt":"4"},
      |"rowkey":"key",
      |"columns":{
      |"k":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"s1":{"cf":"f", "col":"s1", "type":"string"}}}""".stripMargin

  override def beforeAll(): Unit = {
    super.beforeAll()
    // A: keys 1..200; B: keys 100..300 (partial overlap, some missing b2)
    (1L to 200L).map(i => (i, s"a$i", i * 7)).toDF("k", "a1", "a2")
      .write.format("graft-kv").options(Map("catalog" -> catA, "newtable" -> "6"))
      .mode("append").save()
    (100L to 300L).map(i => (i, s"b$i", i / 2.0)).toDF("k", "b1", "b2")
      .write.format("graft-kv").options(Map("catalog" -> catB, "newtable" -> "5"))
      .mode("append").save()
    (1L to 50L).map(i => (i, s"s$i")).toDF("k", "s1")
      .write.format("graft-kv").options(Map("catalog" -> catSalted))
      .mode("append").save()
  }

  private def readA = spark.read.format("graft-kv").option("catalog", catA).load()
  private def readB = spark.read.format("graft-kv").option("catalog", catB).load()

  private def withConf[T](on: Boolean)(body: => T): T = {
    val prev = spark.conf.getOption(ConfKey)
    spark.conf.set(ConfKey, on.toString)
    try body finally prev match {
      case Some(v) => spark.conf.set(ConfKey, v)
      case None => spark.conf.unset(ConfKey)
    }
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString()
  }

  /** Build the same frame twice — pushed and unpushed — and compare. */
  private def differential(build: => DataFrame, expectPushed: Boolean): Unit = {
    val (pushedRows, plan) = withConf(on = true) {
      val df = build; (sortedRows(df), planOf(df))
    }
    val unpushedRows = withConf(on = false)(sortedRows(build))
    assert(pushedRows == unpushedRows, "pushed != unpushed")
    assert(plan.contains("GraftKvJoinScan") == expectPushed,
      s"expected pushed=$expectPushed in:\n${plan.take(3000)}")
  }

  test("inner key join pushes and matches the unpushed plan") {
    differential(readA.join(readB, Seq("k")), expectPushed = true)
  }

  test("left outer key join pushes; unmatched rows pad right columns with nulls") {
    differential(readA.join(readB, Seq("k"), "left"), expectPushed = true)
  }

  test("projection pruning after the join (keys projected away)") {
    differential(readA.join(readB, Seq("k")).select($"a1", $"b1"),
      expectPushed = true)
  }

  test("filters above the join push into the sides and the join still pushes") {
    // every conjunct compiles exactly → sides absorb them, join pushes
    differential(
      readA.join(readB, Seq("k"))
        .filter($"a2" > 100L && $"b2" > 60.0 && $"b1".endsWith("3")),
      expectPushed = true)
  }

  test("a residual side filter blocks the push (Filter node above the side)") {
    // a2 % 3 can't compile to an exact store predicate → stays a Filter
    // node above the left relation, which the rule refuses to push through
    differential(
      readA.join(readB, Seq("k")).filter($"a2" % 3 === 0 && $"b2" > 60.0),
      expectPushed = false)
  }

  test("pre-join side filters compose with LEFT OUTER null padding") {
    differential(
      readA.filter($"k" < 150L)
        .join(readB.filter($"b2" > 80.0), Seq("k"), "left"),
      expectPushed = true)
  }

  test("self join with conflict aliases") {
    differential(
      readA.as("x").join(readA.as("y"),
        col("x.k") === col("y.k")).select(col("x.k"), col("x.a1"), col("y.a2")),
      expectPushed = true)
  }

  test("aggregate over a pushed join") {
    differential(
      readA.join(readB, Seq("k"))
        .groupBy(($"k" % 10).as("g"))
        .agg(count(lit(1)).as("n"), sum($"a2").as("sa"),
          sum($"b2".cast("decimal(18,6)")).cast("string").as("sb")),
      expectPushed = true)
  }

  test("non-key equi-join declines and falls back correctly") {
    // a1 = b1 never matches (different prefixes) but the shape matters:
    // value-column equality must NOT push
    differential(readA.join(readB, $"a1" === $"b1"), expectPushed = false)
    // and a key-to-VALUE join must not push either (b2 is not b's key)
    differential(
      readA.as("l").join(readB.as("r"),
        col("l.k") === col("r.b2").cast("long")),
      expectPushed = false)
  }

  test("salted tables decline join pushdown") {
    val s = spark.read.format("graft-kv").option("catalog", catSalted).load()
    differential(readA.join(s.withColumnRenamed("s1", "sv"), Seq("k")),
      expectPushed = false)
  }

  test("time-travel reads decline join pushdown") {
    val b = spark.read.format("graft-kv").option("catalog", catB)
      .option("maxStamp", Long.MaxValue.toString).load()
    differential(readA.join(b, Seq("k")), expectPushed = false)
  }

  test("full outer joins are not pushed but stay correct") {
    differential(readA.join(readB, Seq("k"), "full"), expectPushed = false)
  }

  private val catCompA =
    """{"table":{"namespace":"default", "name":"jca"},
      |"rowkey":"k1:k2",
      |"columns":{
      |"g":{"cf":"rowkey", "col":"k1", "type":"string", "length":"1"},
      |"n":{"cf":"rowkey", "col":"k2", "type":"bigint"},
      |"av":{"cf":"f", "col":"av", "type":"string"}}}""".stripMargin
  private val catCompB =
    """{"table":{"namespace":"default", "name":"jcb"},
      |"rowkey":"k1:k2",
      |"columns":{
      |"h":{"cf":"rowkey", "col":"k1", "type":"string", "length":"1"},
      |"m":{"cf":"rowkey", "col":"k2", "type":"bigint"},
      |"bv":{"cf":"f", "col":"bv", "type":"double"}}}""".stripMargin

  test("composite-key joins push on all-parts equality, decline on a prefix") {
    val rows = for (g <- Seq("a", "b", "c"); i <- 1L to 40L) yield (g, i)
    rows.map { case (g, i) => (g, i, s"$g$i") }.toDF("g", "n", "av")
      .write.format("graft-kv").options(Map("catalog" -> catCompA, "newtable" -> "4"))
      .mode("append").save()
    rows.filter(_._2 % 2 == 0).map { case (g, i) => (g, i, i * 1.5) }
      .toDF("h", "m", "bv")
      .write.format("graft-kv").options(Map("catalog" -> catCompB, "newtable" -> "4"))
      .mode("append").save()
    def a = spark.read.format("graft-kv").option("catalog", catCompA).load()
    def b = spark.read.format("graft-kv").option("catalog", catCompB).load()
    // all parts equated (order scrambled on purpose) → pushes
    differential(
      a.join(b, $"n" === $"m" && $"g" === $"h").select($"g", $"n", $"av", $"bv"),
      expectPushed = true)
    differential(
      a.join(b, $"g" === $"h" && $"n" === $"m", "left"),
      expectPushed = true)
    // only the first key part equated → a prefix can match MANY right rows,
    // the single-probe shape is wrong: must decline
    differential(
      a.join(b, $"g" === $"h").select($"g", $"n", $"m", $"av", $"bv"),
      expectPushed = false)
    // only the second part → decline
    differential(
      a.join(b, $"n" === $"m").select($"g", $"h", $"n", $"av", $"bv"),
      expectPushed = false)
  }

  test("a second join above a pushed join falls back (one level only)") {
    val j = readA.join(readB, Seq("k"))
    // joining the pushed pair with a parquet frame: the kv pair may push,
    // the outer join runs in Spark — results must match conf-off exactly
    val dim = (1L to 300L by 3).map(i => (i, s"d$i")).toDF("k", "d")
    differential(j.join(dim, Seq("k")).select($"k", $"a1", $"b1", $"d"),
      expectPushed = true)
  }
}
