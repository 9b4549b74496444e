package graft.datasource

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.store.KvStore

/** Storage-partitioned joins between salted kv tables: the scans report
  * `KeyGroupedPartitioning(bucket(n, key))` (resolved through the catalog's
  * FunctionCatalog, [[SaltFunctions]]), so a row-key equi-join between two
  * tables with the same bucket count plans with NO shuffle on either side —
  * bucket i joins bucket i. */
class SpjSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.catalog.graft", classOf[GraftTableCatalog].getName)
    .config("spark.sql.sources.v2.bucketing.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); KvStore.dropAll() }

  private def createPair(): Unit = {
    spark.sql("DROP TABLE IF EXISTS graft.default.spj_a")
    spark.sql("DROP TABLE IF EXISTS graft.default.spj_b")
    spark.sql(
      """CREATE TABLE graft.default.spj_a (k BIGINT, a STRING)
        |TBLPROPERTIES ('rowkey' = 'k', 'saltBuckets' = '8')""".stripMargin)
    spark.sql(
      """CREATE TABLE graft.default.spj_b (k BIGINT, b DOUBLE)
        |TBLPROPERTIES ('rowkey' = 'k', 'saltBuckets' = '8')""".stripMargin)
    spark.range(0, 500)
      .selectExpr("id AS k", "concat('a', CAST(id AS STRING)) AS a")
      .createOrReplaceTempView("spj_src_a")
    spark.range(0, 500, 2)
      .selectExpr("id AS k", "CAST(id AS DOUBLE) * 0.5 AS b")
      .createOrReplaceTempView("spj_src_b")
    spark.sql("INSERT INTO graft.default.spj_a SELECT * FROM spj_src_a")
    spark.sql("INSERT INTO graft.default.spj_b SELECT * FROM spj_src_b")
  }

  /** The FINAL physical plan — executes the frame first so AQE's plan is
    * settled, then unwraps the adaptive root (a plain `collect` on the
    * adaptive wrapper sees no children). */
  private def finalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.execution.SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
  }

  test("row-key equi-join between equal-salt tables plans with no shuffle") {
    createPair()
    val joined = spark.sql(
      """SELECT a.k, a.a, b.b FROM graft.default.spj_a a
        |JOIN graft.default.spj_b b ON a.k = b.k""".stripMargin)
    val plan = finalPlan(joined).toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffle-family join in:\n$plan")
    assert(!plan.contains("Exchange"),
      s"storage-partitioned join must not shuffle either side:\n$plan")
    val rows = joined.collect()
    assert(rows.length == 250)
    assert(rows.forall(r => r.getString(1) == s"a${r.getLong(0)}" &&
      r.getDouble(2) == r.getLong(0) * 0.5))
  }

  test("same join with bucketing disabled shuffles and agrees") {
    val joined = spark.sql(
      """SELECT a.k, a.a, b.b FROM graft.default.spj_a a
        |JOIN graft.default.spj_b b ON a.k = b.k""".stripMargin)
    val expected = joined.collect().map(_.toString).sorted
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    try {
      val rejoined = spark.sql(
        """SELECT a.k, a.a, b.b FROM graft.default.spj_a a
          |JOIN graft.default.spj_b b ON a.k = b.k""".stripMargin)
      assert(finalPlan(rejoined).toString.contains("Exchange"),
        "control: bucketing off must shuffle")
      assert(rejoined.collect().map(_.toString).sorted.sameElements(expected))
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
  }

  test("key-range filter on one side keeps the join shuffle-free and exact") {
    // the filter prunes nothing bucket-wise (salt fans every logical range
    // across all buckets) but does prune rows store-side; partition values
    // stay aligned and the join still runs storage-partitioned
    val joined = spark.sql(
      """SELECT a.k, b.b FROM graft.default.spj_a a
        |JOIN graft.default.spj_b b ON a.k = b.k
        |WHERE a.k >= 100 AND a.k < 300""".stripMargin)
    val plan = finalPlan(joined).toString
    assert(!plan.contains("Exchange"), s"filtered SPJ must stay shuffle-free:\n$plan")
    val rows = joined.collect()
    assert(rows.length == 100)
    assert(rows.forall(r => r.getLong(0) >= 100 && r.getLong(0) < 300 &&
      r.getDouble(1) == r.getLong(0) * 0.5))
  }

  test("string-keyed SPJ with reported ordering drops the sorts too") {
    // primitive STRING keys have strict byte-order == value-order, so the
    // scan also reports per-partition ASC key ordering; with
    // v2.bucketing.sorting on, the merge join needs neither exchange nor
    // sort on either side — a fully store-aligned join
    spark.conf.set("spark.sql.sources.v2.bucketing.sorting.enabled", "true")
    try {
      spark.sql("DROP TABLE IF EXISTS graft.default.spj_sa")
      spark.sql("DROP TABLE IF EXISTS graft.default.spj_sb")
      spark.sql(
        """CREATE TABLE graft.default.spj_sa (k STRING, a BIGINT)
          |TBLPROPERTIES ('rowkey' = 'k', 'saltBuckets' = '8')""".stripMargin)
      spark.sql(
        """CREATE TABLE graft.default.spj_sb (k STRING, b BIGINT)
          |TBLPROPERTIES ('rowkey' = 'k', 'saltBuckets' = '8')""".stripMargin)
      spark.range(0, 400)
        .selectExpr("concat('k', lpad(CAST(id AS STRING), 5, '0')) AS k", "id AS a")
        .createOrReplaceTempView("spj_src_sa")
      spark.range(0, 400, 4)
        .selectExpr("concat('k', lpad(CAST(id AS STRING), 5, '0')) AS k", "id * 10 AS b")
        .createOrReplaceTempView("spj_src_sb")
      spark.sql("INSERT INTO graft.default.spj_sa SELECT * FROM spj_src_sa")
      spark.sql("INSERT INTO graft.default.spj_sb SELECT * FROM spj_src_sb")
      val joined = spark.sql(
        """SELECT a.k, a.a, b.b FROM graft.default.spj_sa a
          |JOIN graft.default.spj_sb b ON a.k = b.k""".stripMargin)
      val plan = finalPlan(joined).toString
      assert(plan.contains("SortMergeJoin"), s"expected merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"must be exchange-free:\n$plan")
      assert(!plan.contains(" Sort ["),
        s"reported ordering must eliminate the sorts:\n$plan")
      val rows = joined.collect()
      assert(rows.length == 100)
      assert(rows.forall(r => r.getLong(2) == r.getLong(1) * 10))
    } finally
      spark.conf.set("spark.sql.sources.v2.bucketing.sorting.enabled", "false")
  }

  test("GROUP BY the row key of a salted table aggregates with no exchange") {
    if (!KvStore.exists("default:spj_a")) createPair()
    val agg = spark.sql(
      """SELECT k, count(*) AS n, max(a) AS ma
        |FROM graft.default.spj_a GROUP BY k""".stripMargin)
    val plan = finalPlan(agg).toString
    assert(!plan.contains("Exchange"),
      s"bucket partitioning satisfies the group-by distribution:\n$plan")
    assert(agg.collect().length == 500)
  }

  test("one-side-salted join: v2 bucketing shuffle aligns only the other side") {
    // the kv side stays in place; the parquet-like side shuffles INTO the
    // kv table's bucket partitioning by evaluating the catalog's bucket
    // function — one exchange total, and it is bucket(8, k), not hash
    spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
    try {
      spark.range(0, 500, 3).selectExpr("id AS k", "id * 7 AS c")
        .createOrReplaceTempView("spj_plain")
      val joined = spark.sql(
        """SELECT a.k, a.a, p.c FROM graft.default.spj_a a
          |JOIN spj_plain p ON a.k = p.k""".stripMargin)
      val rows = joined.collect()
      assert(rows.length == 167)
      assert(rows.forall(r => r.getLong(2) == r.getLong(0) * 7))
      val plan = finalPlan(joined).toString
      val exchanges = plan.linesIterator.count(_.contains("Exchange "))
      assert(exchanges <= 1, s"at most the non-kv side may shuffle:\n$plan")
      if (exchanges == 1)
        assert(!plan.linesIterator.exists(l =>
          l.contains("Exchange ") && l.contains("GraftScan")),
          s"the kv side must not move:\n$plan")
    } finally
      spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "false")
  }

  test("bucket-pruning filter on one side still joins exactly") {
    // a point filter leaves one bucket alive on side B; partition-value
    // push (v2.bucketing.pushPartValues) pads the other side or the plan
    // falls back — either way rows must be exact
    val joined = spark.sql(
      """SELECT a.k, b.b FROM graft.default.spj_a a
        |JOIN graft.default.spj_b b ON a.k = b.k
        |WHERE b.k = 42""".stripMargin)
    val rows = joined.collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 42 && rows(0).getDouble(1) == 21.0)
  }

  test("mismatched bucket counts fall back to a shuffled join, same rows") {
    spark.sql("DROP TABLE IF EXISTS graft.default.spj_c")
    spark.sql(
      """CREATE TABLE graft.default.spj_c (k BIGINT, c STRING)
        |TBLPROPERTIES ('rowkey' = 'k', 'saltBuckets' = '4')""".stripMargin)
    spark.range(0, 500, 5).selectExpr("id AS k", "'c' AS c")
      .createOrReplaceTempView("spj_src_c")
    spark.sql("INSERT INTO graft.default.spj_c SELECT * FROM spj_src_c")
    val joined = spark.sql(
      """SELECT a.k, c.c FROM graft.default.spj_a a
        |JOIN graft.default.spj_c c ON a.k = c.k""".stripMargin)
    assert(joined.collect().length == 100)
  }
}
