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
    def leaf(): Column = rnd.nextInt(10) match {
      case 0 => col("k") < rnd.between(-45, 45)
      case 1 => col("k") >= rnd.between(-45, 45)
      case 2 => col("k") === rnd.between(-45, 45)
      case 3 => col("v") > rnd.between(-2, 25)
      case 4 => col("v") <= rnd.between(-2, 25)
      case 5 => col("s").startsWith("str" + rnd.nextInt(8))
      case 6 => col("s").contains(rnd.nextInt(10).toString)
      case 7 => col("k").isin(Seq.fill(3)(rnd.between(-45, 45)).map(Int.box): _*)
      // LARGE INs exercise the set-predicate collapse (KeyIn/ValueIn) on
      // both the key and a value column — the fast path the CDC sliver
      // lookups push — against the same differential oracle
      case 8 => col("k").isin(Seq.fill(40)(rnd.between(-45, 45)).map(Int.box): _*)
      case 9 => col("v").isin(Seq.fill(25)(rnd.between(-2, 25)).map(Int.box): _*)
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

  // ---- indexed differential: same soundness rule, now with secondary
  // indexes in the way. Random predicates INCLUDING null tests on indexed
  // columns and random projections drive the planner across all three read
  // paths (index-only / consult point gets / plain scan); every case must
  // equal the in-memory result, and the run must have exercised the index
  // paths at least once (else the test silently stops guarding them).

  private val idxCatalog =
    """{"table":{"namespace":"default", "name":"dtable_idx"},
      |"rowkey":"key",
      |"columns":{
      |"k":{"cf":"rowkey", "col":"key", "type":"int"},
      |"v":{"cf":"f", "col":"v", "type":"int", "index":"true", "cover":"w"},
      |"s":{"cf":"f", "col":"s", "type":"string", "index":"true"},
      |"w":{"cf":"f", "col":"w", "type":"bigint"},
      |"u":{"cf":"f", "col":"u", "type":"string"}}}""".stripMargin

  private lazy val idxSource: DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = (-40 to 40).map { k =>
      Row(k,
        if (k % 11 == 0) null else Int.box(k * 5 % 17), // nulls + sign-split values
        if (k % 13 == 0) null else s"s${(k % 5 + 5) % 5}",
        Long.box(k * 3L),
        s"u${(k % 3 + 3) % 3}")
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("k", IntegerType, nullable = false),
        StructField("v", IntegerType, nullable = true),
        StructField("s", StringType, nullable = true),
        StructField("w", LongType, nullable = false),
        StructField("u", StringType, nullable = true))))
  }

  private lazy val idxKv: DataFrame = {
    idxSource.write.format("graft-kv")
      .options(Map("catalog" -> idxCatalog, "newtable" -> "4",
        "minSplitNum" -> "-40", "maxSplitNum" -> "40"))
      .mode("append").save()
    spark.read.format("graft-kv").option("catalog", idxCatalog).load()
  }

  private def randomIdxPred(rnd: scala.util.Random, depth: Int): Column = {
    def leaf(): Column = rnd.nextInt(12) match {
      case 0 => col("v") === rnd.between(-17, 17)
      case 1 => col("v") > rnd.between(-17, 17)
      case 2 => col("v").isin(Seq.fill(3)(rnd.between(-17, 17)).map(Int.box): _*)
      case 3 => col("v").isNull
      case 4 => col("v").isNotNull
      case 5 => col("s") === s"s${rnd.nextInt(6)}"
      case 6 => col("s").startsWith("s" + rnd.nextInt(3))
      case 7 => col("w") === rnd.between(-120, 120).toLong
      case 8 => col("u") === s"u${rnd.nextInt(3)}"
      case 9 => col("k") < rnd.between(-45, 45)
      // null-safe equality: Not(EqualNullSafe) reaches pushdown UN-normalized
      // (the optimizer keeps it), the shape that exposed the blanket-guard
      // negation bug — random ! wrapping covers both polarities
      case 10 => col("v") <=> rnd.between(-17, 17)
      case 11 => col("s") <=> s"s${rnd.nextInt(6)}"
    }
    if (depth == 0) leaf()
    else rnd.nextInt(4) match {
      case 0 => randomIdxPred(rnd, depth - 1) && randomIdxPred(rnd, depth - 1)
      case 1 => randomIdxPred(rnd, depth - 1) || randomIdxPred(rnd, depth - 1)
      case 2 => !randomIdxPred(rnd, depth - 1)
      case _ => leaf()
    }
  }

  private def scanMetrics(df: DataFrame): Map[String, Long] = {
    def nodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        nodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => p +: nodes(q.plan)
      case _ => p +: p.children.flatMap(nodes)
    }
    nodes(df.queryExecution.executedPlan).collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.metrics.map { case (n, m) => n -> m.value }.toMap
    }.getOrElse(Map.empty)
  }

  test("80 random predicate trees over an INDEXED table: all read paths agree") {
    idxKv.count() // force population + index build
    val rnd = new scala.util.Random(20260813)
    val projections = Seq(
      Seq("k"), Seq("k", "v"), Seq("k", "v", "w"), Seq("k", "s"),
      Seq("k", "v", "s", "w", "u"))
    var indexOnlyRuns = 0
    var consultRuns = 0
    (1 to 80).foreach { i =>
      val p = randomIdxPred(rnd, 2)
      val proj = projections(rnd.nextInt(projections.length))
      def canon(df: DataFrame): Seq[String] =
        df.filter(p).select(proj.map(col): _*).collect()
          .map(r => proj.indices.map(j => String.valueOf(r.get(j))).mkString("|"))
          .sorted.toSeq
      val expected = canon(idxSource)
      val actualDf = idxKv.filter(p).select(proj.map(col): _*)
      val actual = actualDf.collect()
        .map(r => proj.indices.map(j => String.valueOf(r.get(j))).mkString("|"))
        .sorted.toSeq
      assert(actual == expected,
        s"case $i: predicate $p, projection $proj\n" +
          s"expected ${expected.mkString(";")}\nactual ${actual.mkString(";")}")
      val m = scanMetrics(actualDf)
      if (m.getOrElse("graftIndexOnlyScan", 0L) > 0) indexOnlyRuns += 1
      else if (m.getOrElse("graftIndexKeys", 0L) > 0) consultRuns += 1
    }
    info(s"index-only runs: $indexOnlyRuns, consult runs: $consultRuns, " +
      s"plain scans: ${80 - indexOnlyRuns - consultRuns}")
    assert(indexOnlyRuns > 0, "no case exercised the index-only path")
    assert(consultRuns > 0, "no case exercised the consult path")
  }
}
