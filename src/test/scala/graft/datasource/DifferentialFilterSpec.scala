package graft.datasource

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.store.KvStore

case class DiffRec(k: Int, v: Int, s: String)

/** Differential test of the pushdown contract: every random predicate tree
  * must return EXACTLY the same rows through the connector (ranges + store
  * predicates + Catalyst residuals) as through the in-memory DataFrame.
  * This is the broad-spectrum guard for the soundness rule — a pushdown
  * that over-prunes silently drops rows and no example test would notice.
  * Predicates are seeded, so failures reproduce. */
class DifferentialFilterSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); KvStore.dropAll() }

  private val catalog =
    """{"table":{"namespace":"default", "name":"dtable"},
      |"rowkey":"key",
      |"columns":{
      |"k":{"cf":"rowkey", "col":"key", "type":"int"},
      |"v":{"cf":"f", "col":"v", "type":"int"},
      |"s":{"cf":"f", "col":"s", "type":"string"}}}""".stripMargin

  private lazy val source: DataFrame = {
    import spark.implicits._
    // negative keys exercise the sign-split range encodings
    (-40 to 40).map(i => DiffRec(i, i * 7 % 23, s"str${(i % 7 + 7) % 7}")).toDF()
  }

  private lazy val kv: DataFrame = {
    source.write.format("graft-kv")
      .options(Map("catalog" -> catalog, "newtable" -> "4",
        "minSplitNum" -> "-40", "maxSplitNum" -> "40"))
      .mode("append").save()
    spark.read.format("graft-kv").option("catalog", catalog).load()
  }

  /** Random predicate over (k, v, s), depth-bounded. */
  private def randomPred(rnd: scala.util.Random, depth: Int): Column = {
    def leaf(): Column = rnd.nextInt(8) match {
      case 0 => col("k") < rnd.between(-45, 45)
      case 1 => col("k") >= rnd.between(-45, 45)
      case 2 => col("k") === rnd.between(-45, 45)
      case 3 => col("v") > rnd.between(-2, 25)
      case 4 => col("v") <= rnd.between(-2, 25)
      case 5 => col("s").startsWith("str" + rnd.nextInt(8))
      case 6 => col("s").contains(rnd.nextInt(10).toString)
      case 7 => col("k").isin(Seq.fill(3)(rnd.between(-45, 45)).map(Int.box): _*)
    }
    if (depth == 0) leaf()
    else rnd.nextInt(4) match {
      case 0 => randomPred(rnd, depth - 1) && randomPred(rnd, depth - 1)
      case 1 => randomPred(rnd, depth - 1) || randomPred(rnd, depth - 1)
      case 2 => !randomPred(rnd, depth - 1)
      case _ => leaf()
    }
  }

  test("60 random predicate trees: connector result == in-memory result") {
    kv.count() // force table population
    val rnd = new scala.util.Random(4242)
    (1 to 60).foreach { i =>
      val p = randomPred(rnd, 2)
      val expected = source.filter(p).select("k").collect().map(_.getInt(0)).sorted
      val actual = kv.filter(p).select("k").collect().map(_.getInt(0)).sorted
      assert(actual.sameElements(expected),
        s"case $i: predicate $p\nexpected ${expected.mkString(",")}\n" +
          s"actual ${actual.mkString(",")}")
    }
  }
}
