package graft.datasource

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ranges.ScanRange
import graft.store.KvStore
import graft.types.FieldCoder

/** A user-pluggable coder (reference SHCDataType.scala:72-77: any class
  * reflectively instantiated by name). Encodes ints as fixed-width decimal
  * strings — silly but order-preserving for non-negatives. */
class DecimalStringCoder extends FieldCoder {
  override def name: String = getClass.getName
  override def preservesOrdering(dt: DataType): Boolean = true
  override def supportsComposite: Boolean = true
  override def byteWidth(dt: DataType): Int = dt match {
    case IntegerType => 10
    case _ => -1
  }
  override def encode(dt: DataType, v: Any): Array[Byte] = dt match {
    case IntegerType => f"${v.asInstanceOf[Int]}%010d".getBytes("UTF-8")
    case StringType  => v.toString.getBytes("UTF-8")
    case _ => throw new UnsupportedOperationException(dt.toString)
  }
  override def decode(dt: DataType, b: Array[Byte], off: Int, len: Int): Any = dt match {
    case IntegerType => new String(b, off, len, "UTF-8").toInt
    case StringType  => new String(b, off, len, "UTF-8")
    case _ => throw new UnsupportedOperationException(dt.toString)
  }
  override def lessRanges(dt: DataType, v: Any, incl: Boolean): Seq[ScanRange[Array[Byte]]] =
    Seq(ScanRange(graft.ranges.Bound.negInf, graft.ranges.Bound(Some(encode(dt, v)), incl)))
  override def greaterRanges(dt: DataType, v: Any, incl: Boolean): Seq[ScanRange[Array[Byte]]] =
    Seq(ScanRange(graft.ranges.Bound(Some(encode(dt, v)), incl), graft.ranges.Bound.posInf))
}

case class ARec(id: Long, rec: Row)

/** Remaining reference-suite coverage: explicit restrictive modes
  * (DynamicColumnSuite's three modes), Avro-encoded row keys
  * (AvroSourceKeySuite.scala:57-74), and the pluggable-coder SPI. */
class ExtendedSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); KvStore.dropAll() }

  private def allPlanNodes(p: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allPlanNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allPlanNodes(q.plan)
    case _ => p +: p.children.flatMap(allPlanNodes)
  }

  import spark.implicits._

  test("restrictive modes: none / family / column all return correct rows") {
    val catalog =
      """{"table":{"namespace":"default", "name":"rtable"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"string"},
        |"a":{"cf":"cf1", "col":"a", "type":"int"},
        |"b":{"cf":"cf2", "col":"b", "type":"string"}}}""".stripMargin
    Seq(("k1", 1, "x"), ("k2", 2, "y")).toDF("key", "a", "b")
      .write.format("graft-kv")
      .options(Map("catalog" -> catalog, "newtable" -> "4"))
      .mode("append").save()
    for (mode <- Seq("none", "family", "column", "auto")) {
      val df = spark.read.format("graft-kv")
        .options(Map("catalog" -> catalog, "restrictive" -> mode)).load()
      assert(df.orderBy("key").collect().map(_.getInt(1)).toSeq == Seq(1, 2), s"mode=$mode")
    }
  }

  test("aggregate pushdown: flat aggregates push; grouped aggregates fall back correctly") {
    val catalog =
      """{"table":{"namespace":"default", "name":"aggtable"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"grp":{"cf":"f", "col":"grp", "type":"string"},
        |"v":{"cf":"f", "col":"v", "type":"double"},
        |"s":{"cf":"f", "col":"s", "type":"string"}}}""".stripMargin
    val data = (1L to 40L).map(i => (i, s"g${i % 3}", i * 1.5, s"s$i"))
    data.toDF("key", "grp", "v", "s").write.format("graft-kv")
      .options(Map("catalog" -> catalog, "newtable" -> "4",
        "minSplitNum" -> "0", "maxSplitNum" -> "40"))
      .mode("append").save()
    val df = spark.read.format("graft-kv").option("catalog", catalog).load()
    // flat: pushed, one partial per region, merged by Spark's final agg
    val flat = df.agg(count(lit(1)), count(col("s")), min(col("v")), max(col("v")),
      min(col("s")), max(col("key"))).head()
    assert(flat.getLong(0) == 40L && flat.getLong(1) == 40L)
    assert(flat.getDouble(2) == 1.5 && flat.getDouble(3) == 60.0)
    assert(flat.getString(4) == "s1") // lexicographic min
    assert(flat.getLong(5) == 40L)
    assert(df.agg(count(lit(1))).queryExecution.executedPlan.toString
      .contains("pushedAggregates"))
    // grouped: NOT pushed (store answers no grouped partials) — full fallback
    val grouped = df.groupBy(col("grp")).agg(count(lit(1)).as("n"), max(col("v")).as("mx"))
    assert(!grouped.queryExecution.executedPlan.toString.contains("pushedAggregates"))
    val g = grouped.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = data.groupBy(_._2).view.mapValues(rs =>
      (rs.size.toLong, rs.map(_._3).max)).toMap
    assert(g == want)
  }

  test("pushed Sum under ANSI mode raises on Long overflow instead of wrapping") {
    val catalog =
      """{"table":{"namespace":"default", "name":"ansiovf"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"v":{"cf":"f", "col":"v", "type":"bigint"}}}""".stripMargin
    Seq((1L, Long.MaxValue), (2L, Long.MaxValue)).toDF("key", "v")
      .write.format("graft-kv")
      .options(Map("catalog" -> catalog, "newtable" -> "4",
        "minSplitNum" -> "0", "maxSplitNum" -> "10"))
      .mode("append").save()
    val df = spark.read.format("graft-kv").option("catalog", catalog).load()
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "Spark 4 defaults ANSI on — this test pins the pushed partial's match")
    val agg = df.agg(sum(col("v")))
    // the aggregate still pushes (one partial per region)...
    assert(agg.queryExecution.executedPlan.toString.contains("pushedAggregates"))
    // ...and the overflowing partial ERRORS like the engine's ANSI sum
    // would, never silently wraps to a negative total
    val e = intercept[Exception](agg.collect())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[ArithmeticException]),
      s"expected an overflow error, got: $e")
  }

  test("limit/top-N pushdown: early stop per region; non-key orderings decline") {
    val catalog =
      """{"table":{"namespace":"default", "name":"limtable"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"v":{"cf":"f", "col":"v", "type":"double"}}}""".stripMargin
    (1L to 40L).map(i => (i, (41 - i) * 1.0)).toDF("key", "v").write.format("graft-kv")
      .options(Map("catalog" -> catalog, "newtable" -> "4",
        "minSplitNum" -> "0", "maxSplitNum" -> "40"))
      .mode("append").save()
    val df = spark.read.format("graft-kv").option("catalog", catalog).load()
    // plain limit: pushed partially, exactly n rows survive the global cut
    val lim = df.limit(5)
    assert(lim.queryExecution.executedPlan.toString.contains("pushedLimit=5"))
    assert(lim.count() == 5L)
    // top-N by the row key: pushed; result equals the full sort
    val top = df.orderBy(col("key")).limit(7)
    assert(top.queryExecution.executedPlan.toString.contains("pushedLimit=7"))
    assert(top.collect().map(_.getLong(0)).toSeq == (1L to 7L))
    // descending key: pushed as a REVERSED scan (skip-list descendingMap)
    val topDesc = df.orderBy(col("key").desc).limit(3)
    assert(topDesc.queryExecution.executedPlan.toString.contains("pushedLimit=3 (reversed)"),
      topDesc.queryExecution.executedPlan.toString.take(2000))
    assert(topDesc.collect().map(_.getLong(0)).toSeq == Seq(40L, 39L, 38L))
    // ordering by a value column: decline (full sort)
    val bad = df.orderBy(col("v")).limit(3)
    assert(!bad.queryExecution.executedPlan.toString.contains("pushedLimit"))
    assert(bad.collect().map(_.getLong(0)).toSeq ==
      Seq(40L, 39L, 38L)) // still correct through the fallback
    // LIMIT + OFFSET pagination: whatever limit Spark chooses to push, the
    // per-partition early stop must keep >= offset+limit candidates so the
    // global offset cut stays correct — both scan directions
    val page = df.orderBy(col("key")).offset(5).limit(3)
    assert(page.collect().map(_.getLong(0)).toSeq == Seq(6L, 7L, 8L),
      page.queryExecution.executedPlan.toString.take(2000))
    val pageDesc = df.orderBy(col("key").desc).offset(5).limit(3)
    assert(pageDesc.collect().map(_.getLong(0)).toSeq == Seq(35L, 34L, 33L),
      pageDesc.queryExecution.executedPlan.toString.take(2000))
  }

  test("reported statistics: small kv dimension auto-broadcasts, no hint") {
    // limtable (40 rows) exists from the limit test; join it to a larger
    // in-memory side WITHOUT a broadcast hint — the scan's reported size
    // must let Catalyst pick BroadcastHashJoin (DSv2's default "unknown"
    // size would force sort-merge)
    val catalog =
      """{"table":{"namespace":"default", "name":"limtable"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"v":{"cf":"f", "col":"v", "type":"double"}}}""".stripMargin
    if (!KvStore.exists("default:limtable")) {
      (1L to 40L).map(i => (i, (41 - i) * 1.0)).toDF("key", "v").write.format("graft-kv")
        .options(Map("catalog" -> catalog, "newtable" -> "4",
          "minSplitNum" -> "0", "maxSplitNum" -> "40"))
        .mode("append").save()
    }
    val dim = spark.read.format("graft-kv").option("catalog", catalog).load()
    val facts = spark.range(0, 10000).selectExpr("id % 40 + 1 AS key", "id AS x")
    val joined = facts.join(dim, "key")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the 40-row kv side to broadcast:\n${plan.take(3000)}")
    assert(joined.count() == 10000L)
  }

  test("runtime filtering: the build side's key set prunes regions at runtime") {
    val catalog =
      """{"table":{"namespace":"default", "name":"rtftable"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"v":{"cf":"f", "col":"v", "type":"double"}}}""".stripMargin
    spark.range(1, 40001).selectExpr("id AS key", "CAST(id * 1.5 AS DOUBLE) AS v")
      .write.format("graft-kv")
      .options(Map("catalog" -> catalog, "newtable" -> "8",
        "minSplitNum" -> "0", "maxSplitNum" -> "40000"))
      .mode("overwrite").save()
    val fact = spark.read.format("graft-kv").option("catalog", catalog).load()
    // the build side must not constant-fold to a LocalRelation, or DPP sees
    // no selective filter — derive it from a Range
    val dim = spark.range(1, 100).selectExpr("id AS k", "CAST(id % 7 AS STRING) AS tag")
      .filter(col("tag") === "3")
    val joined = fact.join(broadcast(dim), fact("key") === dim("k"))
    val rows = joined.collect()
    assert(rows.length == 14) // keys 3, 10, ..., 94
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("RuntimeFilters: [dynamicpruning"),
      s"expected a runtime filter on the kv scan:\n${plan.take(3000)}")
    // the 14 keys (< 100) live in the FIRST of 8 regions: the runtime key
    // set must prune the other regions before the probe scan starts
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: allNodes(q.plan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    val scan = allNodes(joined.queryExecution.executedPlan).collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan.inputRDD.getNumPartitions == 1,
      s"expected the runtime key set to prune to 1 region, got ${scan.inputRDD.getNumPartitions}")
  }

  test("runtime filtering prunes regions of a grouped-aggregate pushdown scan") {
    // the r3 gap: an aggregated scan hid its key fields from
    // filterAttributes (readSchema was the agg schema), so a DPP-prunable
    // aggregated probe read all regions. With GROUP BY pushdown the group
    // key fields live in the agg read schema and the runtime key set must
    // prune regions exactly like a row scan.
    val catalog =
      """{"table":{"namespace":"default", "name":"rtfaggtable"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"v":{"cf":"f", "col":"v", "type":"double"}}}""".stripMargin
    spark.range(1, 40001).selectExpr("id AS key", "CAST(id * 1.5 AS DOUBLE) AS v")
      .write.format("graft-kv")
      .options(Map("catalog" -> catalog, "newtable" -> "8",
        "minSplitNum" -> "0", "maxSplitNum" -> "40000"))
      .mode("overwrite").save()
    val fact = spark.read.format("graft-kv").option("catalog", catalog).load()
    val agged = fact.groupBy(col("key"))
      .agg(count(lit(1)).as("n"), max(col("v")).as("mx"))
    // the dim must come off storage: a Range-derived tag would let the
    // optimizer infer `cast(key % 7 ...) = 3` onto the probe key, which
    // lands as a RESIDUAL on the scan and (correctly) declines the agg
    // push — the parquet round trip severs that lineage
    val dimPath = "/tmp/graft_rtfagg_dim"
    spark.range(1, 100).selectExpr("id AS k", "CAST(id % 7 AS STRING) AS tag")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("tag") === "3")
    val joined = agged.join(broadcast(dim), agged("key") === dim("k"))
    val rows = joined.collect()
    assert(rows.length == 14) // keys 3, 10, ..., 94
    assert(rows.forall(r => r.getAs[Long]("n") == 1L &&
      r.getAs[Double]("mx") == r.getAs[Long]("key") * 1.5))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("pushedGroupBy=[key]"),
      s"the grouped aggregate must stay pushed under DPP:\n${plan.take(3000)}")
    assert(plan.contains("RuntimeFilters: [dynamicpruning"),
      s"expected a runtime filter on the aggregated kv scan:\n${plan.take(3000)}")
    val scan = allPlanNodes(joined.queryExecution.executedPlan).collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan.inputRDD.getNumPartitions == 1,
      s"runtime key set must prune the aggregated scan to 1 region, " +
        s"got ${scan.inputRDD.getNumPartitions}")
  }

  test("custom scan metrics report rows scanned and regions planned vs total") {
    // limtable (40 rows, 4 regions) from the limit test
    val catalog =
      """{"table":{"namespace":"default", "name":"limtable"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"v":{"cf":"f", "col":"v", "type":"double"}}}""".stripMargin
    if (!KvStore.exists("default:limtable")) {
      (1L to 40L).map(i => (i, (41 - i) * 1.0)).toDF("key", "v").write.format("graft-kv")
        .options(Map("catalog" -> catalog, "newtable" -> "4",
          "minSplitNum" -> "0", "maxSplitNum" -> "40"))
        .mode("append").save()
    }
    val df = spark.read.format("graft-kv").option("catalog", catalog).load()
      .filter(col("key") >= 1L && col("key") <= 12L)
    df.collect()
    val scan = allPlanNodes(df.queryExecution.executedPlan).collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    val metrics = scan.metrics
    assert(metrics("graftRowsScanned").value == 12L)
    assert(metrics("graftRegionsTotal").value == 4L)
    assert(metrics("graftRegionsPlanned").value < 4L,
      s"key range [1,12] must prune regions: planned ${metrics("graftRegionsPlanned").value}")
  }

  test("_cell_ts metadata column surfaces the newest visible cell stamp") {
    val catalog =
      """{"table":{"namespace":"default", "name":"metats"},
        |"rowkey":"key",
        |"columns":{
        |"k":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"bal":{"cf":"f", "col":"bal", "type":"double"}}}""".stripMargin
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "bal").write.format("graft-kv")
      .options(Map("catalog" -> catalog, "newtable" -> "4", "timestamp" -> "1000",
        "maxVersions" -> "2"))
      .mode("append").save()
    // second generation touches only row 2
    Seq((2L, 21.0)).toDF("k", "bal").write.format("graft-kv")
      .options(Map("catalog" -> catalog, "timestamp" -> "2000", "maxVersions" -> "2"))
      .mode("append").save()
    val df = spark.read.format("graft-kv")
      .options(Map("catalog" -> catalog, "maxVersions" -> "2")).load()
    // hidden from SELECT *
    assert(df.columns.toSeq == Seq("k", "bal"))
    val rows = df.select(col("k"), col("bal"), col("_cell_ts"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(rows == Map(1L -> (10.0, 1000L), 2L -> (21.0, 2000L)))
    // composes with the time-range read: as of stamp 1000, row 2 shows its
    // first generation and its newest VISIBLE stamp is 1000
    val asOf = spark.read.format("graft-kv")
      .options(Map("catalog" -> catalog, "maxVersions" -> "2",
        "minStamp" -> "0", "maxStamp" -> "1001")).load()
      .select(col("k"), col("bal"), col("_cell_ts"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(asOf == Map(1L -> (10.0, 1000L), 2L -> (20.0, 1000L)))
  }

  test("_cell_ts is projection-independent: row-wide newest stamp under any SELECT list") {
    val catalog =
      """{"table":{"namespace":"default", "name":"metats2"},
        |"rowkey":"key",
        |"columns":{
        |"k":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"v1":{"cf":"f", "col":"a", "type":"string"},
        |"v2":{"cf":"f", "col":"b", "type":"string"}}}""".stripMargin
    Seq((1L, "x", "y")).toDF("k", "v1", "v2").write.format("graft-kv")
      .options(Map("catalog" -> catalog, "newtable" -> "4", "timestamp" -> "1000"))
      .mode("append").save()
    // second generation touches ONLY v2 — v1's newest cell stays at 1000
    Seq((1L, "y2")).toDF("k", "v2").write.format("graft-kv")
      .options(Map("catalog" -> catalog, "timestamp" -> "2000"))
      .mode("append").save()
    val df = spark.read.format("graft-kv").option("catalog", catalog).load()
    // the contract is the newest visible stamp OF THE ROW — the same row
    // must report the same _cell_ts no matter which columns ride along
    // (before the fix, SELECT k, v1, _cell_ts restricted the scan to v1's
    // column and reported 1000)
    assert(df.select(col("k"), col("_cell_ts")).head().getLong(1) == 2000L)
    assert(df.select(col("k"), col("v1"), col("_cell_ts")).head().getLong(2) == 2000L)
    assert(df.select(col("k"), col("v2"), col("_cell_ts")).head().getLong(2) == 2000L)
    assert(df.select(col("k"), col("v1"), col("v2"), col("_cell_ts")).head().getLong(3) == 2000L)
  }

  test("tombstones option on a BATCH read: _deleted constant false, deleted rows gone") {
    val catalog =
      """{"table":{"namespace":"default", "name":"tomb_batch"},
        |"rowkey":"key",
        |"columns":{
        |"k":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"v":{"cf":"f", "col":"v", "type":"string"}}}""".stripMargin
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").write.format("graft-kv")
      .options(Map("catalog" -> catalog, "newtable" -> "4", "timestamp" -> "1000"))
      .mode("append").save()
    val parsed = graft.catalog.GraftCatalog.parse(catalog, Map.empty)
    val hrf = FilterCompiler.compileAll(parsed,
      Seq(org.apache.spark.sql.sources.EqualTo("k", 2L)))
    KvStore.table("default:tomb_batch").delete(hrf.ranges, hrf.pred, stamp = 2000)
    // a batch read sees CURRENT state: the deleted row is gone, survivors
    // carry _deleted=false and a real _cell_ts — markers never leak into
    // batch results even under the option
    val rows = spark.read.format("graft-kv")
      .options(Map("catalog" -> catalog, "tombstones" -> "true")).load()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(rows == Set((1L, "a", 1000L, false), (3L, "c", 1000L, false)))
    // without the option the schema is unchanged
    assert(spark.read.format("graft-kv").option("catalog", catalog).load()
      .columns.toSeq == Seq("k", "v"))
  }

  test("Avro-encoded row key: round trip with range pruning disabled") {
    val keySchema =
      """{"type":"record","name":"K","fields":[
        |{"name":"part","type":"string"},{"name":"seq","type":"int"}]}""".stripMargin
    val catalog =
      """{"table":{"namespace":"default", "name":"aktable"},
        |"rowkey":"key",
        |"columns":{
        |"k":{"cf":"rowkey", "col":"key", "avro":"keySchema"},
        |"v":{"cf":"f", "col":"v", "type":"string"}}}""".stripMargin
    val schema = StructType(Seq(
      StructField("k", graft.types.AvroCoder.sqlTypeFor(keySchema)),
      StructField("v", StringType)))
    val rows = (0 until 8).map(i => Row(Row(s"p${i % 2}", i), s"val$i"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .write.format("graft-kv")
      .options(Map("catalog" -> catalog, "keySchema" -> keySchema, "newtable" -> "4"))
      .mode("append").save()
    val df = spark.read.format("graft-kv")
      .options(Map("catalog" -> catalog, "keySchema" -> keySchema)).load()
    assert(df.count() == 8)
    // nested-field projection + filter on the struct key (residual, exact)
    assert(df.filter(col("k.part") === "p1").count() == 4)
    assert(df.select(col("k.seq")).collect().map(_.getInt(0)).sorted.toSeq == (0 until 8))
  }

  test("user-specified schema: pruned + reordered read (reference HBaseRelation:313)") {
    val catalog =
      """{"table":{"namespace":"default", "name":"ustable"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"string"},
        |"a":{"cf":"cf1", "col":"a", "type":"int"},
        |"b":{"cf":"cf1", "col":"b", "type":"string"}}}""".stripMargin
    Seq(("k1", 1, "x"), ("k2", 2, "y")).toDF("key", "a", "b")
      .write.format("graft-kv")
      .options(Map("catalog" -> catalog, "newtable" -> "4"))
      .mode("append").save()
    val user = StructType(Seq(StructField("b", StringType), StructField("key", StringType)))
    val df = spark.read.format("graft-kv").option("catalog", catalog)
      .schema(user).load()
    assert(df.schema.fieldNames.toSeq == Seq("b", "key"))
    assert(df.orderBy("key").collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("x", "k1"), ("y", "k2")))
    // a column the catalog doesn't know must be rejected up front
    val bogus = StructType(Seq(StructField("nope", StringType)))
    intercept[Exception] {
      spark.read.format("graft-kv").option("catalog", catalog).schema(bogus).load().collect()
    }
  }

  test("cluster option isolates same-named tables on independent stores") {
    val catalog =
      """{"table":{"namespace":"default", "name":"ctable"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"string"},
        |"v":{"cf":"cf1", "col":"v", "type":"int"}}}""".stripMargin
    Seq(("k1", 1), ("k2", 2)).toDF("key", "v")
      .write.format("graft-kv")
      .options(Map("catalog" -> catalog, "cluster" -> "east", "newtable" -> "4"))
      .mode("append").save()
    Seq(("k1", 10), ("k3", 30)).toDF("key", "v")
      .write.format("graft-kv")
      .options(Map("catalog" -> catalog, "cluster" -> "west", "newtable" -> "6"))
      .mode("append").save()
    // independent stores with their own split layouts
    assert(KvStore.table("east#default:ctable").regions.size == 4)
    assert(KvStore.table("west#default:ctable").regions.size == 6)
    assert(!KvStore.exists("default:ctable"))
    def readC(cl: String) = spark.read.format("graft-kv")
      .options(Map("catalog" -> catalog, "cluster" -> cl)).load()
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(readC("east") == Map("k1" -> 1, "k2" -> 2))
    assert(readC("west") == Map("k1" -> 10, "k3" -> 30))
    // a cross-cluster join in one query sees both
    def df(cl: String) = spark.read.format("graft-kv")
      .options(Map("catalog" -> catalog, "cluster" -> cl)).load()
    val joined = df("east").as("e").join(df("west").as("w"), Seq("key"))
      .select(col("key"), col("e.v").as("ve"), col("w.v").as("vw")).collect()
    assert(joined.map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq == Seq(("k1", 1, 10)))
  }

  test("user-pluggable coder resolved by class name") {
    val catalog =
      s"""{"table":{"namespace":"default", "name":"uctable", "tableCoder":"${classOf[DecimalStringCoder].getName}", "version":"2.0"},
         |"rowkey":"key",
         |"columns":{
         |"id":{"cf":"rowkey", "col":"key", "type":"int"},
         |"v":{"cf":"f", "col":"v", "type":"string"}}}""".stripMargin
    (0 until 50).map(i => (i, s"v$i")).toDF("id", "v")
      .write.format("graft-kv")
      .options(Map("catalog" -> catalog, "newtable" -> "4"))
      .mode("append").save()
    val df = spark.read.format("graft-kv").option("catalog", catalog).load()
    assert(df.count() == 50)
    assert(df.filter(col("id") < 10).count() == 10)
    assert(df.filter(col("id") === 42).count() == 1)
  }

  test("self-referential overwrite: the source scan sees the PRE-overwrite table") {
    val catalog =
      """{"table":{"namespace":"default", "name":"selfovw"},
        |"rowkey":"key",
        |"columns":{
        |"k":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"v":{"cf":"f", "col":"v", "type":"bigint"}}}""".stripMargin
    def opts = Map("catalog" -> catalog, "newtable" -> "4",
      "minSplitNum" -> "0", "maxSplitNum" -> "100")
    (1L to 10L).map(k => (k, k * 10)).toDF("k", "v")
      .write.format("graft-kv").options(opts).mode("append").save()
    def kv = spark.read.format("graft-kv").option("catalog", catalog).load()

    // INSERT OVERWRITE t SELECT ... FROM t: the truncate used to run at
    // writer-factory creation, so the self-scan read an empty table
    kv.select(col("k"), (col("v") + 1L).as("v"))
      .write.format("graft-kv").options(opts).mode("overwrite").save()
    assert(kv.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      (1L to 10L).map(k => (k, k * 10 + 1)),
      "overwrite-from-self must transform the OLD rows, not an empty table")

    // plain overwrite from external data still replaces wholesale
    Seq((100L, 7L)).toDF("k", "v")
      .write.format("graft-kv").options(opts).mode("overwrite").save()
    assert(kv.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((100L, 7L)))
  }

  test("a user-specified schema may prune/reorder but never retype") {
    val catalog =
      """{"table":{"namespace":"default", "name":"uschema"},
        |"rowkey":"key",
        |"columns":{
        |"k":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"v":{"cf":"f", "col":"v", "type":"string"}}}""".stripMargin
    Seq((1L, "a")).toDF("k", "v").write.format("graft-kv")
      .options(Map("catalog" -> catalog, "newtable" -> "4",
        "minSplitNum" -> "0", "maxSplitNum" -> "10"))
      .mode("append").save()
    // prune + reorder: honored
    val pruned = spark.read.format("graft-kv").option("catalog", catalog)
      .schema(StructType(Seq(StructField("v", StringType), StructField("k", LongType))))
      .load()
    assert(pruned.schema.fieldNames.toSeq == Seq("v", "k"))
    // same names, different type: rejected loudly (it used to be silently
    // ignored in favor of the catalog types)
    val e = intercept[Exception] {
      spark.read.format("graft-kv").option("catalog", catalog)
        .schema(StructType(Seq(StructField("k", StringType), StructField("v", StringType))))
        .load()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => t.getMessage != null && t.getMessage.contains("retype")),
      s"expected a retype rejection, got $e")
  }
}
