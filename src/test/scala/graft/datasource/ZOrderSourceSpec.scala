package graft.datasource

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import graft.functions.ZOrderExprs
import graft.ranges.ZOrder
import graft.store.KvStore

/** End-to-end Z-order pruning through the kv source: random point sets
  * keyed by morton(x, y), random rectangle queries decomposed into pushed
  * z ranges + the exact decode residual — results must equal a brute-force
  * filter of the full table, and the scan metrics must prove the pushed
  * ranges actually PRUNED (rows scanned ≪ table size). */
class ZOrderSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); KvStore.dropAll() }

  import spark.implicits._

  private val catalogJson =
    """{"table":{"namespace":"default", "name":"ztab"},
      |"rowkey":"z:id",
      |"columns":{
      |"z":{"cf":"rowkey", "col":"z", "type":"bigint"},
      |"id":{"cf":"rowkey", "col":"id", "type":"bigint"},
      |"payload":{"cf":"f", "col":"p", "type":"string"}}}""".stripMargin

  private def allPlanNodes(p: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allPlanNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allPlanNodes(q.plan)
    case _ => p +: p.children.flatMap(allPlanNodes)
  }

  private def scanOf(df: DataFrame) =
    allPlanNodes(df.queryExecution.executedPlan).collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get

  private val rnd = new Random(99)
  // clustered + uniform points: clusters make some rectangles dense
  private val points: Seq[(Int, Int, Long)] = {
    val uniform = Seq.tabulate(3000)(i =>
      (rnd.nextInt(4000) - 2000, rnd.nextInt(4000) - 2000, i.toLong))
    val clustered = Seq.tabulate(1000)(i =>
      (500 + rnd.nextInt(64), -300 + rnd.nextInt(64), 10000L + i))
    uniform ++ clustered
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    points.toDF("x", "y", "id")
      .select(ZOrderExprs.morton2($"x", $"y").as("z"), $"id",
        concat(lit("p"), $"id").as("payload"))
      .write.format("graft-kv")
      .options(Map("catalog" -> catalogJson, "newtable" -> "8"))
      .mode("append").save()
  }

  private def queryRect(xlo: Int, xhi: Int, ylo: Int, yhi: Int,
      maxRanges: Int): DataFrame = {
    val ranges = ZOrder.rectRanges(xlo, xhi, ylo, yhi, maxRanges)
    val zPushed = ranges.map { case (lo, hi) => $"z" >= lo && $"z" <= hi }
      .reduce(_ || _)
    spark.read.format("graft-kv").option("catalog", catalogJson).load()
      .filter(zPushed)
      .withColumn("x", ZOrderExprs.mortonX($"z"))
      .withColumn("y", ZOrderExprs.mortonY($"z"))
      .filter($"x".between(xlo, xhi) && $"y".between(ylo, yhi))
      .select($"id", $"x", $"y", $"payload")
  }

  private def expect(xlo: Int, xhi: Int, ylo: Int, yhi: Int): Set[Long] =
    points.collect {
      case (x, y, id) if x >= xlo && x <= xhi && y >= ylo && y <= yhi => id
    }.toSet

  test("random rectangles: pushed z-ranges + residual == brute force") {
    for (i <- 0 until 15) {
      val xlo = rnd.nextInt(4000) - 2100; val xhi = xlo + rnd.nextInt(600)
      val ylo = rnd.nextInt(4000) - 2100; val yhi = ylo + rnd.nextInt(600)
      val budget = Seq(4, 16, 64)(i % 3) // tight budgets over-approximate
      val got = queryRect(xlo, xhi, ylo, yhi, budget)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == expect(xlo, xhi, ylo, yhi),
        s"rect [$xlo..$xhi]x[$ylo..$yhi] budget=$budget")
    }
  }

  test("the dense cluster rectangle returns every cluster point") {
    val got = queryRect(500, 563, -300, -237, maxRanges = 64)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = expect(500, 563, -300, -237)
    assert(want.size >= 1000, "cluster should dominate this rectangle")
    assert(got == want)
  }

  test("z-range pushdown prunes the scan: rows scanned far below table size") {
    val df = queryRect(500, 563, -300, -237, maxRanges = 64)
    df.collect()
    val scanned = scanOf(df).metrics("graftRowsScanned").value
    // the rectangle holds ~1000 cluster points + a few uniform strays out
    // of 4000 rows; a pruned scan reads the covered sliver only
    assert(scanned < 2000, s"scanned=$scanned of ${points.size} rows — no pruning")
    assert(scanned >= 1000, s"scanned=$scanned — cluster rows must be read")
  }

  test("a tiny empty rectangle scans almost nothing") {
    val df = queryRect(1900, 1910, 1900, 1910, maxRanges = 64)
    assert(df.count() == expect(1900, 1910, 1900, 1910).size.toLong)
    df.collect()
    val scanned = scanOf(df).metrics("graftRowsScanned").value
    assert(scanned < 100, s"scanned=$scanned — tiny rectangle must prune hard")
  }
}
