package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.store.KvStore

/** The distributed index consult ([[IndexSemiJoin]]): when the driver-side
  * consult would decline (estimated matches over `indexLookupCap`), an
  * indexed-column filter rewrites into a broadcast LEFT SEMI join against
  * the index table, whose key set reaches the main scan as a RUNTIME filter
  * — selectivity-proportional index I/O with no driver materialization.
  * The rule is ON BY DEFAULT (self-deciding three-way policy: consult /
  * semi-join / full scan off the same O(regions) estimate); the first test
  * pins that no conf is required, and the band-edge test differential-pins
  * the exact decline/accept boundaries at both the cap and maxKeys edges. */
class IndexSemiJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); KvStore.dropAll() }

  private val catalogJson =
    """{"table":{"namespace":"default", "name":"sjtab"},
      |"rowkey":"key",
      |"columns":{
      |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"owner":{"cf":"f", "col":"o", "type":"string"},
      |"grade":{"cf":"f", "col":"g", "type":"string", "length":"4", "index":"true"},
      |"v":{"cf":"f", "col":"v", "type":"bigint"}}}""".stripMargin

  private def populate(): Unit = {
    import spark.implicits._
    // 2000 rows; grade gNNN (N = id % 200) — 10 rows per grade; the g199
    // stratum is written as NULL grades (no index entry, must never be
    // dropped wrongly by an index-routed plan)
    (0L until 2000L).map { i =>
      (i, s"owner$i", if (i % 200 == 199) null else f"g${i % 200}%03d", i * 2)
    }.toDF("key", "owner", "grade", "v")
      .write.format("graft-kv")
      .options(Map("catalog" -> catalogJson, "newtable" -> "4",
        "minSplitNum" -> "0", "maxSplitNum" -> "2000", "timestamp" -> "100"))
      .mode("overwrite").save()
  }

  private def read(extra: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("graft-kv")
      .options(Map("catalog" -> catalogJson) ++ extra).load()

  private def withSemiJoin[A](enabled: Boolean)(body: => A): A = {
    spark.conf.set(IndexSemiJoin.EnabledKey, enabled.toString)
    try body finally spark.conf.unset(IndexSemiJoin.EnabledKey)
  }

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
  }

  test("over-cap indexed filter rewrites to a broadcast semi-join BY DEFAULT; results differential-equal") {
    populate()
    def q(extra: Map[String, String]) = read(extra)
      .filter(col("grade") >= "g010" && col("grade") <= "g019")
      .select(col("key"), col("grade"), col("v"))
    // tiny cap: estimated matches (region row counters) exceed it, so the
    // driver consult would decline — exactly the band the rule owns
    val capped = Map("indexLookupCap" -> "10")
    val expected = withSemiJoin(enabled = false) {
      q(capped).collect().map(_.toString).sorted.toSeq
    }
    assert(expected.size == 100) // grades g010..g019, 10 rows each
    // NO conf set: the self-deciding default must engage the middle band
    assert(spark.conf.getOption(IndexSemiJoin.EnabledKey).isEmpty)
    locally {
      val df = q(capped)
      val got = df.collect().map(_.toString).sorted.toSeq
      assert(got == expected, "semi-join rewrite must not change results")
      val plan = finalPlan(df)
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
        s"expected a broadcast left-semi against the index table:\n${plan.take(3000)}")
      assert(plan.contains("sjtab__idx__grade"),
        s"the join's build side must be the index table scan:\n${plan.take(3000)}")
      assert(plan.contains("RuntimeFilters: [dynamicpruning"),
        s"the index key set must reach the main scan as a runtime filter:\n${plan.take(3000)}")
      // the runtime key set must turn the main scan selectivity-proportional:
      // 100 matching rows materialized, not the 2000-row table
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allNodes(a.executedPlan)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          p +: allNodes(qs.plan)
        case _ => p +: p.children.flatMap(allNodes)
      }
      val mainScan = allNodes(df.queryExecution.executedPlan).collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.description().contains("default:sjtab,") => b
      }.get
      assert(mainScan.metrics("graftRowsScanned").value == 100L,
        s"runtime point gets must materialize only matching rows, got " +
          s"${mainScan.metrics("graftRowsScanned").value}")
    }
  }

  test("null-indexed rows and disjunctive predicates stay exact under the rule") {
    if (!KvStore.exists("default:sjtab")) populate()
    withSemiJoin(enabled = true) {
      // IS NULL must not be routed through the index (no entries for nulls)
      val nulls = read(Map("indexLookupCap" -> "10"))
        .filter(col("grade").isNull).select("key")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(nulls == (199L until 2000L by 200L).toSeq)
      // OR across columns references more than the indexed attr — the
      // conjunct is not rewritable and the result must still be exact
      val mixed = read(Map("indexLookupCap" -> "10"))
        .filter(col("grade") === "g005" || col("v") === 4L)
        .select("key").collect().map(_.getLong(0)).sorted.toSeq
      assert(mixed == (Seq(2L) ++ (5L until 2000L by 200L)).sorted)
      assert(mixed.size == 11)
    }
  }

  test("below the cap the plan-time consult wins: no join in the plan") {
    if (!KvStore.exists("default:sjtab")) populate()
    withSemiJoin(enabled = true) {
      // default cap (100k) >> upper bound estimate: rule declines
      val df = read().filter(col("grade") === "g042").select("key", "v")
      assert(df.collect().length == 10)
      val plan = finalPlan(df)
      assert(!plan.contains("LeftSemi"),
        s"under-cap consults must stay plan-time point gets:\n${plan.take(3000)}")
    }
  }

  test("var-width string index: semi-join rewrite stays exact incl. prefix-value hazards") {
    // city is a VAR-WIDTH string index (no declared length): entries parse
    // as var-value + fixed bigint key via the negative-offset layout. The
    // value set includes prefix pairs ("c1" is a byte-prefix of "c10"),
    // the classic var-width entry-range over-approximation hazard.
    val vcat =
      """{"table":{"namespace":"default", "name":"sjvtab"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"city":{"cf":"f", "col":"c", "type":"string", "index":"true"},
        |"v":{"cf":"f", "col":"v", "type":"bigint"}}}""".stripMargin
    import spark.implicits._
    (0L until 2000L).map(i => (i, s"c${i % 200}", i * 3))
      .toDF("key", "city", "v")
      .write.format("graft-kv")
      .options(Map("catalog" -> vcat, "newtable" -> "4",
        "minSplitNum" -> "0", "maxSplitNum" -> "2000", "timestamp" -> "100"))
      .mode("overwrite").save()
    def q(extra: Map[String, String]) = spark.read.format("graft-kv")
      .options(Map("catalog" -> vcat) ++ extra).load()
      .filter(col("city").isin("c1", "c10", "c150"))
      .select(col("key"), col("city"), col("v"))
    val capped = Map("indexLookupCap" -> "10")
    val expected = withSemiJoin(enabled = false) {
      q(capped).collect().map(_.toString).sorted.toSeq
    }
    assert(expected.size == 30) // 3 cities × 10 rows
    withSemiJoin(enabled = true) {
      val df = q(capped)
      val got = df.collect().map(_.toString).sorted.toSeq
      assert(got == expected,
        "var-width semi-join rewrite must not change results")
      val plan = finalPlan(df)
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
        s"expected a broadcast left-semi against the string index:\n${plan.take(3000)}")
      assert(plan.contains("sjvtab__idx__city"),
        s"the build side must be the string-index table scan:\n${plan.take(3000)}")
      assert(plan.contains("RuntimeFilters: [dynamicpruning"),
        s"the key set must reach the main scan as a runtime filter:\n${plan.take(3000)}")
    }
    // ordering shapes across prefix boundaries stay exact under the rule
    withSemiJoin(enabled = true) {
      val gt = spark.read.format("graft-kv")
        .options(Map("catalog" -> vcat) ++ capped).load()
        .filter(col("city") > "c1" && col("city") < "c100" && col("v") >= 0L)
        .select("city").distinct()
        .collect().map(_.getString(0)).sorted.toSeq
      // lexicographically between "c1" (exclusive) and "c100" (exclusive):
      // "c10" only (c0x < c1; c100 excluded; c11+ > c100... no: "c11" > "c100")
      assert(gt == Seq("c10"), s"got $gt")
    }
  }

  test("unselective predicates above maxKeys keep the plain scan") {
    if (!KvStore.exists("default:sjtab")) populate()
    withSemiJoin(enabled = true) {
      spark.conf.set(IndexSemiJoin.MaxKeysKey, "100")
      try {
        val df = read(Map("indexLookupCap" -> "10"))
          .filter(col("grade") >= "g000").select("key")
        assert(df.collect().length == 1990) // all non-null grades
        val plan = finalPlan(df)
        assert(!plan.contains("LeftSemi"),
          s"an unselective predicate must not pay join machinery:\n${plan.take(3000)}")
      } finally spark.conf.unset(IndexSemiJoin.MaxKeysKey)
    }
  }

  test("band edges are exact: decline at estimate==cap / accept at cap−1; decline at maxKeys==estimate−1 / accept at estimate") {
    if (!KvStore.exists("default:sjtab")) populate()
    import org.apache.spark.sql.sources
    import graft.datasource.SecondaryIndex
    import graft.ranges.{BytesUtil, ScanRange}
    // compute the EXACT estimate upper bound the rule will see for this
    // predicate, through the same machinery the rule uses
    val cat = graft.catalog.GraftCatalog.parse(catalogJson)
    val field = cat.indexedFields.find(_.name == "grade").get
    val idxName = SecondaryIndex.indexTableName("default:sjtab", field)
    implicit val ord: Ordering[Array[Byte]] = BytesUtil.byteArrayOrdering
    val lo = SecondaryIndex.valueRanges(field,
      sources.GreaterThanOrEqual("grade", "g010")).get
    val hi = SecondaryIndex.valueRanges(field,
      sources.LessThanOrEqual("grade", "g019")).get
    val (_, upper) = SecondaryIndex.estimateMatches(idxName,
      ScanRange.and(lo, hi), fixedWidth = field.byteWidth > 0)
    assert(upper >= 100L, s"estimate must cover the 100 true matches, got $upper")
    def q(cap: Long) = read(Map("indexLookupCap" -> cap.toString))
      .filter(col("grade") >= "g010" && col("grade") <= "g019")
      .select("key")
    def hasSemi(df: org.apache.spark.sql.DataFrame): Boolean =
      finalPlan(df).contains("LeftSemi")
    // cap edge: estimate <= cap → the plan-time consult owns it (decline);
    // one below → the middle band opens (accept)
    val atCap = q(upper)
    assert(atCap.collect().length == 100)
    assert(!hasSemi(atCap), s"estimate==cap must stay with the plan-time consult")
    val belowCap = q(upper - 1)
    assert(belowCap.collect().length == 100)
    assert(hasSemi(belowCap), "estimate==cap+1 band must engage the semi-join")
    // maxKeys edge: estimate > maxKeys → full scan (decline); estimate ==
    // maxKeys → still selective enough (accept)
    try {
      spark.conf.set(IndexSemiJoin.MaxKeysKey, (upper - 1).toString)
      val overMax = q(10)
      assert(overMax.collect().length == 100)
      assert(!hasSemi(overMax), "estimate>maxKeys must fall back to the full scan")
      spark.conf.set(IndexSemiJoin.MaxKeysKey, upper.toString)
      val atMax = q(10)
      assert(atMax.collect().length == 100)
      assert(hasSemi(atMax), "estimate==maxKeys must accept the semi-join")
    } finally spark.conf.unset(IndexSemiJoin.MaxKeysKey)
  }
}
