package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.store.KvStore

/** Physical-plan quality gates — the 100 TB design assertions:
  * filters reach the parquet scan, small dimensions broadcast, top-k never
  * globally sorts, connector scans prune partitions by row-key range.
  * A regression here is a scale bug even when results stay correct. */
class PlanAuditSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); KvStore.dropAll() }

  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes
    val plan = df.queryExecution.executedPlan
    val finalPlan = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    finalPlan.toString()
  }

  test("q2: predicates push into the parquet scan") {
    val plan = executedPlan(Relational.q2FilterProject(spark, dir))
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("l_quantity"), "pushed filter should mention l_quantity")
  }

  test("q1: aggregation is partial (map-side combine) before the shuffle") {
    val plan = executedPlan(Relational.q1Agg(spark, dir))
    assert(plan.contains("partial_sum") || plan.contains("partial"),
      s"expected partial aggregation:\n${plan.take(3000)}")
  }

  test("q3: dimension joins broadcast (no shuffle of the small side)") {
    val plan = executedPlan(Relational.q3Join(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("q4: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = executedPlan(Relational.q4Sort(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("kv2: row-key range prunes graft-kv partitions") {
    // build the table, then plan a key-range scan: only regions overlapping
    // [50, 120) may produce input partitions
    Connector.kv2RangePushdown(spark, dir).collect()
    val df = spark.read.format("graft-kv")
      .option("catalog",
        """{"table":{"namespace":"default", "name":"kv_customer"},
          |"rowkey":"key",
          |"columns":{
          |"c_custkey":{"cf":"rowkey", "col":"key", "type":"bigint"},
          |"c_name":{"cf":"f", "col":"name", "type":"string"}}}""".stripMargin)
      .load()
      .filter(org.apache.spark.sql.functions.col("c_custkey") >= 50L &&
        org.apache.spark.sql.functions.col("c_custkey") < 120L)
    val totalRegions = KvStore.table("default:kv_customer").regions.size
    val scanned = df.rdd.getNumPartitions
    assert(totalRegions == 8)
    // [50,120) of keys 1..150 over 8 regions spans a contiguous subset
    assert(scanned < totalRegions && scanned <= 4,
      s"key range [50,120) should prune to a few of $totalRegions regions, got $scanned")
    // a point lookup must hit exactly one region
    val point = df.filter(org.apache.spark.sql.functions.col("c_custkey") === 60L)
    assert(point.rdd.getNumPartitions == 1)
  }

  test("kv1: full scan plans one partition per region (parallelism preserved)") {
    Connector.kv1ScanProject(spark, dir).collect()
    val df = spark.read.format("graft-kv")
      .option("catalog",
        """{"table":{"namespace":"default", "name":"kv_customer"},
          |"rowkey":"key",
          |"columns":{
          |"c_custkey":{"cf":"rowkey", "col":"key", "type":"bigint"},
          |"c_name":{"cf":"f", "col":"name", "type":"string"}}}""".stripMargin)
      .load()
    assert(df.rdd.getNumPartitions == KvStore.table("default:kv_customer").regions.size)
  }

  test("kv1: all-primitive scan reads columnar; versioned read falls back to rows") {
    Connector.kv1ScanProject(spark, dir).collect()
    val catalogJson =
      """{"table":{"namespace":"default", "name":"kv_customer"},
        |"rowkey":"key",
        |"columns":{
        |"c_custkey":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"c_name":{"cf":"f", "col":"name", "type":"string"}}}""".stripMargin
    val df = spark.read.format("graft-kv").option("catalog", catalogJson).load()
    val plan = executedPlan(df)
    assert(plan.contains("ColumnarToRow"),
      s"all-primitive kv scan should be columnar:\n${plan.take(3000)}")
    // per-timestamp explosion can emit many rows per KvRow — must stay row-based
    val exploded = spark.read.format("graft-kv").option("catalog", catalogJson)
      .option("mergeToLatest", "false").option("maxVersions", "3").load()
    val explodedPlan = executedPlan(exploded)
    assert(!explodedPlan.contains("ColumnarToRow"),
      s"exploded-version scan must fall back to the row reader:\n${explodedPlan.take(3000)}")
    // _cell_ts rides the columnar path too: a long vector filled from the
    // row's newest stamp alongside the decoded data slots
    val withTs = df.select(org.apache.spark.sql.functions.col("c_custkey"),
      org.apache.spark.sql.functions.col("_cell_ts"))
    val tsPlan = executedPlan(withTs)
    assert(tsPlan.contains("ColumnarToRow"),
      s"_cell_ts projection should stay columnar:\n${tsPlan.take(3000)}")
  }

  test("scan leases release at task end: no reader leaks across row, columnar, agg, and join paths") {
    import org.apache.spark.sql.functions.{col, count, lit}
    Connector.kv1ScanProject(spark, dir).collect() // build kv_customer
    val baseline = KvStore.openScanCount
    val catalogJson =
      """{"table":{"namespace":"default", "name":"kv_customer"},
        |"rowkey":"key",
        |"columns":{
        |"c_custkey":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"c_name":{"cf":"f", "col":"name", "type":"string"}}}""".stripMargin
    val df = spark.read.format("graft-kv").option("catalog", catalogJson).load()
    df.collect()                                  // columnar reader
    df.filter(col("c_custkey") < 0L).collect()    // empty result still closes
    df.agg(count(lit(1))).collect()               // pushed-agg reader
    Connector.kv27JoinPushdown(spark, dir).collect() // kv×kv join reader
    assert(KvStore.openScanCount == baseline,
      s"scan leases leaked: ${KvStore.openScanCount - baseline} still open " +
        "after collect — a reader path is missing its close()")
  }

  test("avro vector columns read columnar: array<float> decodes into batch child vectors") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // the sv18 inverted-file shape: leading int cell, bigint vec_id, and an
    // Avro-coded float-vector payload — the ANN probe's hot read path
    val avro = """{"type":"array","items":"float"}"""
    val catalogJson =
      """{"table":{"namespace":"default", "name":"kv_vecplan"},
        |"rowkey":"cell:vid",
        |"columns":{
        |"cell":{"cf":"rowkey", "col":"cell", "type":"int"},
        |"vec_id":{"cf":"rowkey", "col":"vid", "type":"bigint"},
        |"v":{"cf":"f", "col":"v", "avro":"annVec"},
        |"tag":{"cf":"f", "col":"tag", "type":"string"}}}""".stripMargin
    KvStore.drop("default:kv_vecplan")
    // row 7's vector is NULL (null-skip writes no v cell; the non-null tag
    // keeps the row alive) — it must come back with a null array through
    // the vector putNull path, not vanish or corrupt neighbors
    val rows = (0 until 64).map(i =>
      (i % 4, i.toLong, if (i == 7) null else Array(i.toFloat, i + 0.5f, -i.toFloat), s"t$i"))
    rows.toDF("cell", "vec_id", "v", "tag").write.format("graft-kv")
      .options(Map("catalog" -> catalogJson, "annVec" -> avro, "newtable" -> "4"))
      .mode("append").save()
    val df = spark.read.format("graft-kv")
      .options(Map("catalog" -> catalogJson, "annVec" -> avro)).load()
    val plan = executedPlan(df)
    assert(plan.contains("ColumnarToRow"),
      s"avro float-vector scan must ride the columnar path:\n${plan.take(3000)}")
    // and the vectors round-trip bit-exactly through the child-vector writes
    val got = df.select(col("cell"), col("vec_id"), col("v")).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        Option(r.getSeq[Float](2)).map(_.toList).orNull)).sortBy(_._2)
    val want = rows.map { case (c, id, v, _) =>
      (c, id, Option(v).map(_.toList).orNull) }.sortBy(_._2)
    assert(got.toSeq == want.toSeq)
    KvStore.drop("default:kv_vecplan")
  }

  test("keyPrefixes option: slivers are exact, scan-bounded, and compose with pushed filters") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val catalogJson =
      """{"table":{"namespace":"default", "name":"kv_prefopt"},
        |"rowkey":"key",
        |"columns":{
        |"ik":{"cf":"rowkey", "col":"key", "type":"string"},
        |"n":{"cf":"f", "col":"n", "type":"bigint"}}}""".stripMargin
    KvStore.drop("default:kv_prefopt")
    val rows = for (b <- 0 until 20; i <- 0 until 40)
      yield (f"$b%02d:$i%04d", b * 10000L + i)
    rows.toDF("ik", "n").write.format("graft-kv")
      .options(Map("catalog" -> catalogJson, "newtable" -> "8",
        "minSplit" -> "0", "maxSplit" -> "z"))
      .mode("append").save()
    def read(prefixes: Seq[String]) = spark.read.format("graft-kv")
      .options(Map("catalog" -> catalogJson,
        "keyPrefixes" -> prefixes.mkString("\u0001"))).load()
    // exact slivers: only the named buckets come back, and the SCAN itself
    // reads only them (option → ranges, no Spark-side residual filter)
    val df = read(Seq("03:", "07:", "11:"))
    df.collect() // settle metrics
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val want = rows.filter(r => Seq("03:", "07:", "11:").exists(r._1.startsWith))
      .sorted
    assert(got.toSeq == want, s"got ${got.length} rows, want ${want.length}")
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    assert(scan.metrics("graftRowsScanned").value == want.length.toLong,
      "the option must restrict the SCAN, not rely on a downstream filter")
    // composes with an ordinary pushed filter: intersection semantics
    val composed = read(Seq("03:", "07:", "11:")).filter(col("ik") >= "07:")
    val gotC = composed.collect().map(_.getString(0)).sorted
    assert(gotC.toSeq == want.map(_._1).filter(_ >= "07:").toSeq)
    KvStore.drop("default:kv_prefopt")
  }

  test("keyPrefixes survives a runtime-filter re-plan (broadcast-join probe)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val catalogJson =
      """{"table":{"namespace":"default", "name":"kv_prefdpp"},
        |"rowkey":"key",
        |"columns":{
        |"ik":{"cf":"rowkey", "col":"key", "type":"string"},
        |"n":{"cf":"f", "col":"n", "type":"bigint"}}}""".stripMargin
    KvStore.drop("default:kv_prefdpp")
    val rows = for (b <- 0 until 20; i <- 0 until 40)
      yield (f"$b%02d:$i%04d", b * 10000L + i)
    rows.toDF("ik", "n").write.format("graft-kv")
      .options(Map("catalog" -> catalogJson, "newtable" -> "8",
        "minSplit" -> "0", "maxSplit" -> "z"))
      .mode("append").save()
    // the scan advertises runtime filtering on its key; probing it through
    // a broadcast join hands over the build side's keys and forces a
    // RE-PLAN — which must recompile WITH the prefix restriction. If the
    // re-plan dropped it, "12:0001" (in the table, in the build side, NOT
    // in the prefixes) would leak into the join output.
    val restricted = spark.read.format("graft-kv")
      .options(Map("catalog" -> catalogJson,
        "keyPrefixes" -> Seq("03:", "07:", "11:").mkString("\u0001"))).load()
    val dim = Seq("03:0005", "07:0007", "12:0001").toDF("ik")
    val got = restricted.join(org.apache.spark.sql.functions.broadcast(dim), Seq("ik"))
      .select(col("ik")).collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("03:0005", "07:0007"),
      s"the prefix restriction must survive the runtime-filter re-plan, got ${got.toSeq}")
    KvStore.drop("default:kv_prefdpp")
  }

  test("px9: query side is broadcast (corpus never shuffles for the join)") {
    val plan = executedPlan(Pipeline.px9AnnBrute(spark, dir))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(3000))
  }

  test("px7: sketch side is shuffle-free up to the band bucket join") {
    val df = Pipeline.px7MinhashLsh(spark, dir)
    val plan = executedPlan(df)
    // the sketch is a native expression, never a HOF or a per-doc groupBy
    assert(plan.contains("minhashbands") || plan.contains("MinHashBands"), plan.take(3000))
    assert(!plan.contains("transform("), "sketch must not fall back to HOF transform")
    // exactly the bucket-join / distinct / rerank shuffles remain: the
    // generate (posexplode) must sit directly over the file scan in the
    // same stage, with no Exchange between them
    val gen = plan.linesIterator.find(_.contains("Generate")).getOrElse("")
    assert(gen.nonEmpty, "expected posexplode Generate node")
  }

  test("px13: IVF probes broadcast the query side; corpus scans once") {
    val plan = executedPlan(Pipeline.px13AnnIvf(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(plan.contains("nearestcentroids") || plan.contains("NearestCentroids"),
      plan.take(3000))
  }

  test("q15: bucketed join shuffles neither side") {
    Relational.q15BucketedJoin(spark, dir).collect() // writes bucketed tables
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val join = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
      val plan = executedPlan(join)
      assert(plan.contains("SortMergeJoin"), plan.take(3000))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n${plan.take(3000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ev4: range join runs as a granule equi-join, not a nested loop") {
    val plan = executedPlan(Events.ev4RangeJoin(spark, dir))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join must not fall back to a nested loop:\n${plan.take(3000)}")
    assert(plan.contains("granule"), plan.take(3000))
  }

  test("ev3: as-of join is one data shuffle (union + window), not a join") {
    val df = Events.ev3AsofJoin(spark, dir)
    val plan = executedPlan(df)
    assert(!plan.contains("Join"), s"as-of must not compile to a join:\n${plan.take(2000)}")
    // shuffles: one hashpartitioning(user_id) for the window + the final
    // range partitioning for the orderBy — never one per input branch
    val exchanges = plan.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 2, s"expected <= 2 exchanges, got $exchanges:\n${plan.take(3000)}")
  }

  test("px11: banded near-dup never cross-joins or broadcasts the corpus") {
    val plan = executedPlan(Pipeline.px11EmbeddingNearDup(spark, dir))
    assert(!plan.contains("CartesianProduct"),
      s"near-dup must not cross-join:\n${plan.take(3000)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"near-dup must not nested-loop:\n${plan.take(3000)}")
    assert(plan.contains("signlshbands") || plan.contains("SignLshBands"),
      "expected the fused banded-LSH expression in the plan")
  }

  test("px15: the vocabulary-sized df table is never hint-broadcast") {
    // the tf⋈df join must be free to shuffle on term: df's cardinality is
    // the vocabulary, which grows with the corpus. The STATIC plan (before
    // AQE's runtime downgrade, which is allowed) must carry no broadcast
    // hint on the df aggregate — only the 1-row corpus-count side may
    // broadcast.
    // (the planner may still pick a broadcast from SIZE STATISTICS at test
    // scale — that is the adaptive behavior we want; a HINT would force it
    // at any scale)
    val df = Pipeline.px15Keywords(spark, dir)
    val optimized = df.queryExecution.optimizedPlan.toString()
    // hints survive into the optimized plan as Join ... Hint=(strategy=...);
    // the term-keyed join (the line carrying the term equality condition)
    // must not have one — only the 1-row corpus-count cross join may
    val termJoinHinted = optimized.linesIterator.exists(l =>
      l.contains("Join") && l.contains("term#") && l.contains("broadcast"))
    assert(!termJoinHinted,
      s"tf⋈df term join must carry no broadcast hint:\n$optimized")
    assert(optimized.linesIterator.exists(l =>
      l.contains("Join Cross") && l.contains("broadcast")),
      s"the 1-row corpus count should stay hint-broadcast:\n$optimized")
  }

  test("px16: repetition signals are one shuffle-free projection") {
    import org.apache.spark.sql.functions.col
    val d = Tables.documents(spark, dir).select(col("doc_id"),
      graft.pipeline.TextOps.dupTokenFrac(col("text")).as("dup"),
      graft.pipeline.TextOps.maxRun(graft.pipeline.TextOps.tokens(col("text"))).as("run"),
      graft.pipeline.TextOps.topBigramFrac(col("text")).as("tbf"))
    val plan = executedPlan(d)
    assert(!plan.contains("Exchange"),
      s"quality signals must scan without shuffling:\n${plan.take(3000)}")
  }

  test("px18: stratified sampling is map-only (no exchange, pruned scan)") {
    import org.apache.spark.sql.functions.col
    val s = graft.pipeline.Sampling.stratifiedSample(
      Tables.documents(spark, dir), "lang", "doc_id", Map("en" -> 0.5))
      .select(col("doc_id"), col("lang"), col("sample_weight"))
    val plan = executedPlan(s)
    assert(!plan.contains("Exchange"),
      s"hash-threshold sampling must not shuffle:\n${plan.take(3000)}")
    assert(plan.contains("ReadSchema") && !plan.contains("text"),
      "the scan should prune the text column — sampling reads only lang/id")
  }

  test("px19: sequence packing pays exactly one shuffle (the shard window)") {
    val p = graft.pipeline.Sampling.packSequences(
      Tables.documents(spark, dir), "doc_id", "text", budget = 256, shards = 8)
    val plan = executedPlan(p)
    // match the operator wherever AQE nests it ("+- Exchange hashpartitioning…")
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"packing must shuffle once (by shard), found $exchanges:\n${plan.take(3000)}")
  }

  test("px17: decontamination partial-aggregates and never cross-joins") {
    val plan = executedPlan(Pipeline.px17Decontam(spark, dir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"n-gram overlap must stay an equi-join:\n${plan.take(3000)}")
    assert(plan.contains("partial"),
      s"expected map-side partial aggregation of pair counts:\n${plan.take(3000)}")
  }

  test("px34: the Bloom prefilter broadcasts; the corpus never sort-merge-joins") {
    val plan = executedPlan(Pipeline.px34BloomDecontam(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"the tiny eval gram side must broadcast:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must never shuffle keyed on n-grams:\n${plan.take(3000)}")
  }

  test("px41: the 256-row ratio table broadcasts; scoring never shuffles on tokens") {
    val plan = executedPlan(Pipeline.px41ImportanceRatios(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"the bucket-ratio table must broadcast into the scoring pass:\n${plan.take(3000)}")
    assert(!plan.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && (l.contains("tok#") || l.contains("(tok,"))),
      s"token occurrences must never shuffle keyed on the token:\n${plan.take(3000)}")
  }

  test("px42: the top-K vocabulary is a TakeOrdered + broadcast, never a global sort") {
    val plan = executedPlan(Pipeline.px42OovRate(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-K vocab selection must be per-partition heaps:\n${plan.take(3000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"the K-row vocabulary must broadcast into the membership probe:\n${plan.take(3000)}")
  }

  test("px35: heavy hitters shuffle only the sketch-filtered sliver") {
    val plan = executedPlan(Pipeline.px35HeavyHitters(spark, dir))
    // map-side partial count before the one gram shuffle
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"expected map-side partial counts:\n${plan.take(3000)}")
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"exact pass must shuffle once (post-CMS-filter grams), found $exchanges:\n${plan.take(3000)}")
  }

  test("px45: per-source caps run as a bounded partial aggregate, never a window") {
    val plan = executedPlan(Pipeline.px45SourceCaps(spark, dir))
    assert(!plan.contains("Window"),
      s"the cap must be the bounded top-k Aggregator, not a per-source window sort:\n${plan.take(3000)}")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected the typed Aggregator's partial/final pair:\n${plan.take(3000)}")
    // partial aggregation bounds the shuffle to <= cap rows per (task, source)
    assert(plan.contains("partial"),
      s"expected a map-side partial aggregate before the source shuffle:\n${plan.take(3000)}")
  }

  test("px46: assignment is map-only against a broadcast centroid table") {
    val plan = executedPlan(Pipeline.px46ClusterSample(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"the nlist-row centroid table must broadcast:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"the corpus must never shuffle to meet the centroids:\n${plan.take(3000)}")
    // the only hash exchange is the per-cell top-k window
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"expected exactly the per-cell window shuffle, found $exchanges:\n${plan.take(3000)}")
  }

  test("px47: anchors broadcast; the corpus streams once with the label filter fused") {
    val plan = executedPlan(Pipeline.px47HardNegatives(spark, dir))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the anchor batch must broadcast (label inequality is the join condition):\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"),
      s"the corpus must not partition-cross-product:\n${plan.take(3000)}")
    // one scan of embeddings feeds the corpus side (the anchor side is the
    // same table but filtered to the 10 anchors before broadcast)
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"expected only the per-anchor top-k window shuffle, found $exchanges:\n${plan.take(3000)}")
  }

  test("px50: the composed corpus build stays broadcast/equi-join, no window") {
    val plan = executedPlan(Pipeline.px50CorpusBuild(spark, dir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      s"keeper and gate semi-joins must broadcast at this size:\n${plan.take(3000)}")
    assert(!plan.contains("Window"),
      s"the cap must stay the bounded Aggregator through composition:\n${plan.take(3000)}")
    assert(plan.contains("partial"),
      s"expected map-side partials for dedup keepers and the cap:\n${plan.take(3000)}")
  }

  test("px51: fuzzy decontam broadcasts the eval side; the corpus never sort-merge-joins") {
    val plan = executedPlan(Pipeline.px51FuzzyDecontam(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"eval bands and shingles must broadcast:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"the corpus must never shuffle or cross-join to meet the eval set:\n${plan.take(3000)}")
    // candidate distinct is the only hash work; AQE broadcasts the small
    // candidate set back onto the corpus shingles
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2,
      s"expected at most the candidate-distinct shuffle, found $exchanges:\n${plan.take(3000)}")
  }

  test("kv27: the pushed kv join plans no exchange below the aggregate") {
    val df = Connector.kv27JoinPushdown(spark, dir) // eager; plan require'd inside
    assert(df.collect().nonEmpty)
    // and the differential/fallback coverage lives in KvJoinSpec; here we
    // re-assert the pushed scan exists under this session's configs
    val confKey = "spark.sql.optimizer.datasourceV2JoinPushdown"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, "true")
    try {
      Connector.ensureCustomer(spark, dir)
      val cust = spark.read.format("graft-kv").option("catalog",
        """{"table":{"namespace":"default", "name":"kv_join_cust"},
          |"rowkey":"key",
          |"columns":{
          |"c_custkey":{"cf":"rowkey", "col":"key", "type":"bigint"},
          |"c_acctbal":{"cf":"f", "col":"bal", "type":"double"}}}""".stripMargin).load()
      val stat = spark.read.format("graft-kv").option("catalog",
        """{"table":{"namespace":"default", "name":"kv_join_stat"},
          |"rowkey":"key",
          |"columns":{
          |"custkey":{"cf":"rowkey", "col":"key", "type":"bigint"},
          |"n_orders":{"cf":"f", "col":"n", "type":"bigint"}}}""".stripMargin).load()
      val j = cust.join(stat,
        org.apache.spark.sql.functions.col("c_custkey") ===
          org.apache.spark.sql.functions.col("custkey"))
      val plan = executedPlan(j)
      assert(plan.contains("GraftKvJoinScan"), plan.take(3000))
      assert(!plan.contains("Exchange") && !plan.contains("BroadcastHashJoin") &&
        !plan.contains("SortMergeJoin"),
        s"the pushed join must plan no join operator and no exchange:\n${plan.take(3000)}")
    } finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }

  test("px21: the composed manifest stays equi-join only (no cross product)") {
    val plan = executedPlan(Pipeline.px21CorpusManifest(spark, dir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"manifest pipeline must never cross-join:\n${plan.take(3000)}")
  }

  test("ev12: OHLC bars are one partial-aggregable groupBy — no window, no sort") {
    val plan = executedPlan(graft.queries.Events.ev12Ohlc(spark, dir))
    assert(!plan.contains("Window"),
      s"open/close must be min_by/max_by aggregates, not a per-bar window sort:\n${plan.take(3000)}")
    assert(plan.contains("partial"),
      s"expected map-side partial aggregation of the bars:\n${plan.take(3000)}")
    // one shuffle for the (type, hour) groupBy; the final orderBy is a range
    // exchange, not a hash one
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"expected exactly the bar-key shuffle, found $exchanges:\n${plan.take(3000)}")
  }

  test("ev7: rolling stats + per-user rollup pay exactly one shuffle") {
    // the three rolling stats are frames of one user_id window and the
    // groupBy rides the window's hash partitioning — a second Exchange
    // would re-shuffle 100 TB of events for nothing (the ORDER BY of the
    // driver-facing query is presentation, not the operator)
    val plan = executedPlan(Events.ev7Anomaly(spark, dir))
    val dataExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(dataExchanges == 1, s"expected 1 hash exchange:\n${plan.take(4000)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("ev8: funnel reads events once and pays one user shuffle") {
    // the three stage windows chain over one user_id partitioning and the
    // rollup rides it; a join-per-stage formulation would scan events 3x
    val plan = executedPlan(Events.ev8Funnel(spark, dir))
    val dataExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(dataExchanges == 1, s"expected 1 hash exchange:\n${plan.take(4000)}")
    assert(!plan.contains("Join"), s"funnel must not join:\n${plan.take(3000)}")
  }

  test("px26: inverted index pays one term shuffle (window + groupBy share it)") {
    val plan = executedPlan(graft.pipeline.TextOps.invertedIndex(
      Tables.documents(spark, dir), "doc_id", "text", k = 20, minDf = 2))
    val dataExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(dataExchanges == 1, s"expected 1 hash exchange:\n${plan.take(4000)}")
  }

  test("px27: chunking is a shuffle-free explode over the scan") {
    val plan = executedPlan(graft.pipeline.TextOps.chunk(
      Tables.documents(spark, dir), "doc_id", "text", 64, 48))
    assert(!plan.contains("Exchange"), s"expected no exchange:\n${plan.take(4000)}")
    assert(plan.contains("Generate explode") || plan.contains("Generate"),
      plan.take(2000))
  }

  test("ev10: retention reads events once and never joins back") {
    // the cohort day is a window min over the user shuffle — the
    // first-day-table formulation would scan events twice and join; pin
    // one scan, zero joins, and the bounded exchange chain (user window,
    // per-user-day dedup, triangle rollup)
    val plan = executedPlan(Events.ev10Retention(spark, dir))
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected one events scan, got $scans:\n${plan.take(3000)}")
    assert(!plan.contains("Join"), s"retention must not join:\n${plan.take(3000)}")
    val dataExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(dataExchanges <= 3, s"expected <= 3 hash exchanges:\n${plan.take(4000)}")
  }

  test("px30: bigram counting partial-aggregates; no per-document window") {
    // bigrams come from zipping the token array with its own tail — pure
    // map-side Generate; the first exchange must carry PARTIALLY-combined
    // (w1,w2) counts, never raw corpus-sized pair rows keyed by (doc, pos)
    val plan = executedPlan(graft.pipeline.TextOps.bigramLm(
      Tables.documents(spark, dir), "text", minCount = 3L))
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"expected map-side combine before the shuffle:\n${plan.take(4000)}")
    val dataExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(dataExchanges == 2,
      s"expected 2 hash exchanges (pair count, prefix window):\n${plan.take(4000)}")
    assert(plan.contains("Generate"), plan.take(2000))
  }

  test("px31: BM25 broadcasts only the query terms and the one-row totals") {
    // the posting-list side (corpus-sized) must shuffle-join nothing bigger
    // than itself: query terms arrive via TakeOrderedAndProject + broadcast,
    // totals as a broadcast one-row aggregate; the corpus never broadcasts
    val plan = executedPlan(graft.pipeline.TextOps.bm25Search(
      Tables.documents(spark, dir), "doc_id", "text", nQueryTerms = 3, k = 10))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    // the only nested-loop is the cross join with the ONE-ROW totals
    // aggregate (broadcast by construction); a second one would mean the
    // corpus side got cross-joined
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nlj <= 1, s"expected at most the one-row totals cross join:\n${plan.take(4000)}")
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"tf counting must map-side combine:\n${plan.take(3000)}")
  }

  test("kv15: aggregates push into the store scan (one partial row per region)") {
    Connector.ensureCustomer(spark, dir)
    val df = Connector.kv15AggPushdown(spark, dir)
    val plan = executedPlan(df)
    assert(plan.contains("pushedAggregates"),
      s"expected the scan to carry pushed aggregates:\n${plan.take(3000)}")
    assert(plan.contains("SumOp(c_custkey"),
      s"sum(c_custkey) must push, not fall back:\n${plan.take(3000)}")
    // each surviving region contributes exactly ONE partial row; the scan's
    // partition count is bounded by the region count, not the table size
    // (AQE wraps stages as leaves, so descend into QueryStageExec plans)
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: allNodes(q.plan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    val scan = allNodes(df.queryExecution.executedPlan).collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    val parts = scan.inputRDD.getNumPartitions
    val regions = graft.store.KvStore.table("default:kv_customer").regions.size
    assert(parts <= regions, s"expected <= $regions partitions, got $parts")
    // and the key-range predicate still prunes regions before aggregation
    assert(parts < regions,
      s"expected the c_custkey >= 100 range to prune at least one region")
  }

  test("kv17: GROUP BY a row-key prefix pushes grouped partials into the scan") {
    val df = Connector.kv17GroupbyPushdown(spark, dir)
    val plan = executedPlan(df)
    assert(plan.contains("pushedGroupBy=[o_orderstatus]"),
      s"expected grouped aggregate pushdown:\n${plan.take(3000)}")
    assert(plan.contains("pushedAggregates="), plan.take(3000))
    // grouped partials batch into vectors (one row per distinct prefix —
    // the many-groups 100× shape rides the columnar path)
    assert(plan.contains("ColumnarToRow"),
      s"grouped-agg scan should emit columnar batches:\n${plan.take(3000)}")
    // a non-prefix grouping must NOT push (falls back to a plain scan)
    val noPush = executedPlan(
      spark.read.format("graft-kv")
        .option("catalog", Connector.ordersCatalog).load()
        .groupBy(org.apache.spark.sql.functions.col("o_orderpriority"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n")))
    assert(!noPush.contains("pushedGroupBy"),
      s"value-column grouping must decline the push:\n${noPush.take(3000)}")
  }

  test("kv18: ORDER BY row key DESC + LIMIT pushes a reversed top-N scan") {
    val df = Connector.kv18ReverseTopn(spark, dir)
    val plan = executedPlan(df)
    assert(plan.contains("pushedLimit=15 (reversed)"),
      s"expected a reversed top-N pushdown:\n${plan.take(3000)}")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("kv16: ORDER BY row key + LIMIT pushes top-N into the scan") {
    Connector.ensureCustomer(spark, dir)
    val df = Connector.kv16TopnPushdown(spark, dir)
    val plan = executedPlan(df)
    assert(plan.contains("pushedLimit=20"),
      s"expected the scan to stop each region after 20 rows:\n${plan.take(3000)}")
    assert(plan.contains("TakeOrderedAndProject"),
      "partial pushdown keeps the global top-N cut")
  }

  test("kv26: z-order rectangle pushes range disjunction; scan reads a sliver") {
    import org.apache.spark.sql.functions.col
    import graft.functions.ZOrderExprs
    Connector.kv26Zorder(spark, dir).collect() // builds the z-keyed table
    // a tight rectangle (users 3-5 × slots 200-400, ~3% of rows): the
    // pushed z ranges must keep the scan at a sliver of the table
    val ranges = graft.ranges.ZOrder.rectRanges(3, 5, 200, 400, maxRanges = 32)
    val df = spark.read.format("graft-kv")
      .option("catalog", Connector.zorderEventsCatalog).load()
      .filter(ranges.map { case (lo, hi) => col("z") >= lo && col("z") <= hi }
        .reduce(_ || _))
      .withColumn("x", ZOrderExprs.mortonX(col("z")))
      .withColumn("y", ZOrderExprs.mortonY(col("z")))
      .filter(col("x").between(3, 5) && col("y").between(200, 400))
    val n = df.count()
    df.collect()
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: allNodes(q.plan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    val scan = allNodes(df.queryExecution.executedPlan).collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get
    val scanned = scan.metrics("graftRowsScanned").value
    val total = graft.store.KvStore.table("default:kv_zorder_events").regions
      .map(_.rowCount.get()).sum
    assert(n > 0, "rectangle must be non-vacuous")
    assert(scanned < total * 3 / 10,
      s"z-range pushdown read $scanned of $total rows — no multi-dim pruning")
  }

  test("kv write: rows range-partition + sort by row key (region-aligned tasks)") {
    val catalog =
      """{"table":{"namespace":"default", "name":"planwrite"},
        |"rowkey":"key",
        |"columns":{
        |"k":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"v":{"cf":"f", "col":"v", "type":"string"}}}""".stripMargin
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      spark.range(0, 1000)
        .selectExpr("id AS k", "CAST(id AS STRING) AS v")
        .write.format("graft-kv")
        .options(Map("catalog" -> catalog, "newtable" -> "4",
          "minSplitNum" -> "0", "maxSplitNum" -> "1000"))
        .mode("append").save()
      val deadline = System.currentTimeMillis() + 15000
      def writePlan: Option[String] = {
        import scala.jdk.CollectionConverters._
        plans.asScala.find(p => p.contains("AppendData") || p.contains("planwrite"))
      }
      while (writePlan.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val plan = writePlan.getOrElse(fail("write plan never reached the listener"))
      // RequiresDistributionAndOrdering: one RANGE exchange on the key (each
      // task owns a contiguous key slice → O(1) regions per task) plus a
      // task-local sort — never a hash scatter of every task across every
      // region, and no global sort node
      assert(plan.contains("rangepartitioning"), plan.take(3000))
      assert(plan.linesIterator.exists(l => l.contains("Sort ") && l.contains("ASC")),
        plan.take(3000))
    } finally spark.listenerManager.unregister(listener)
  }

  test("native CosineSim participates in whole-stage codegen") {
    val plan = executedPlan(Pipeline.px11EmbeddingNearDup(spark, dir))
    assert(plan.contains("cosinesim") || plan.contains("CosineSim"), plan.take(3000))
    // `*(n)` prefixes mark WholeStageCodegen stages in the executed plan
    assert(plan.contains("*("), "expected codegen stages")
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("cosinesim")),
      "cosinesim should sit inside a codegen stage")
  }

  test("px59 semantic decontam is map-only over the corpus (broadcast eval, no corpus shuffle)") {
    val df = graft.queries.Pipeline.px59SemanticDecontam(spark, dir)
    val plan = executedPlan(df)
    // the eval set rides as ONE broadcast row; scoring must not shuffle
    // the corpus — at 100 TB a corpus x eval pair shuffle is the failure
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"eval side must broadcast:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"corpus must not shuffle against the eval set:\n${plan.take(3000)}")
    // exactly the aggregate's and the final ORDER BY's exchanges — no
    // exchange between the corpus scan and the scoring
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 3,
      s"expected only the eval-agg + sort exchanges, found $exchanges:\n${plan.take(3000)}")
  }

  test("px61 IVF-PQ: queries broadcast into the cell join; the code table never shuffles") {
    val plan = executedPlan(graft.queries.Pipeline.px61IvfPqAnn(spark, dir))
    // the (small) probe side must broadcast against the cell-keyed code
    // table — at 100 TB a corpus-side shuffle on cell is the failure
    assert(plan.contains("BroadcastHashJoin"),
      s"probe side must broadcast:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"the code table must not shuffle into the join:\n${plan.take(3000)}")
    // remaining exchanges: the per-query top-k window + the final ORDER BY
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 3,
      s"expected only the window + sort exchanges, found $exchanges:\n${plan.take(3000)}")
    // PQ reconstruction (the m codebook element_at lookups) must sit ABOVE
    // the cell join: below it, EVERY corpus row pays O(m) lookups whether
    // or not its cell was probed (~94% wasted at nlist=64/nprobe=4). Plans
    // print top-down, so every reconstruction line must precede the join.
    // marker: the reconstruction is concat(element_at(<codebook>..), ..);
    // plain element_at also appears BELOW the join in the code table's
    // cell assignment (element_at(nearestcentroids..)), so match the
    // concat-wrapped form specifically.
    val lines = plan.linesIterator.toVector
    val joinAt = lines.indexWhere(_.contains("BroadcastHashJoin"))
    val reconAt = lines.zipWithIndex.filter(_._1.contains("concat(element_at")).map(_._2)
    assert(joinAt >= 0 && reconAt.nonEmpty, s"expected a join and a reconstruction:\n$plan")
    assert(reconAt.forall(_ < joinAt),
      s"codebook reconstruction must be projected above the cell join " +
        s"(join at line $joinAt, element_at at $reconAt):\n${plan.take(3000)}")
  }

  test("px62 collocations: partial counts, keyed-window marginals, top-N never global-sorts") {
    val plan = executedPlan(graft.queries.Pipeline.px62Collocations(spark, dir))
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"pair counting must map-side combine:\n${plan.take(3000)}")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the top-N must not be a global sort:\n${plan.take(3000)}")
    // the 1-row total rides as a broadcast, never a shuffled join
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the N total must broadcast:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    // the totals branch re-derives from the same pair-count subtree; the
    // docstring's "ONE (w1,w2) count shuffle" claim rests on AQE's
    // runtime stage reuse actually deduplicating it — pin that here
    // (explode shows once: the reused stage replaces the second subtree)
    assert(plan.contains("ReusedExchange"),
      s"the totals branch must REUSE the pair-count exchange:\n${plan.take(3000)}")
    assert(plan.linesIterator.count(_.contains("Generate explode")) == 1,
      s"the bigram explode must run once, not per branch:\n${plan.take(3000)}")
  }

  test("px63 shard shuffle: one shard-keyed exchange, no single-task funnel") {
    val plan = executedPlan(graft.queries.Pipeline.px63ShardShuffle(spark, dir))
    // the epoch order must come from a shard-keyed window — a global
    // row_number (empty partition spec) would funnel the corpus through
    // ONE task at 100 TB
    assert(plan.contains("hashpartitioning(shard"),
      s"position window must partition by shard:\n${plan.take(3000)}")
    assert(!plan.contains("SinglePartition"),
      s"no stage may collapse to a single partition:\n${plan.take(3000)}")
  }

  test("px64 mixture plan: one low-cardinality groupBy + a broadcast 1-row total") {
    val plan = executedPlan(graft.queries.Pipeline.px64MixturePlan(spark, dir))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the totals row must broadcast:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(3000))
    assert(plan.contains("partial"),
      s"source aggregation must map-side combine:\n${plan.take(3000)}")
  }

  test("px65 token drift: one keyed count shuffle, totals branch reuses it, top-N never global-sorts") {
    val plan = executedPlan(graft.queries.Pipeline.px65TokenDrift(spark, dir))
    assert(plan.contains("partial"),
      s"token counting must map-side combine:\n${plan.take(3000)}")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the top-N must not be a global sort:\n${plan.take(3000)}")
    assert(plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"snapshot totals must broadcast, never shuffle-join:\n${plan.take(3000)}")
    // the per-snapshot totals re-derive from the same union+count subtree;
    // the "ONE union+keyed count shuffle" docstring claim rests on AQE's
    // runtime stage reuse — pin it
    assert(plan.contains("ReusedExchange"),
      s"the totals branch must REUSE the token-count exchange:\n${plan.take(3000)}")
  }

  test("px66 ANN recall audit: query sample broadcasts on both branches, corpus never shuffles") {
    val plan = executedPlan(graft.queries.Pipeline.px66AnnRecall(spark, dir))
    // exact branch = px9's broadcast nested loop over the sampled queries;
    // IVF branch = px13's broadcast cell join. The corpus side must never
    // sort-merge against either — at 100 TB that shuffle is the failure.
    assert(plan.contains("BroadcastNestedLoopJoin") && plan.contains("BroadcastHashJoin"),
      s"both ranking branches must broadcast the query sample:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"the corpus must not shuffle into either ranking:\n${plan.take(3000)}")
  }

  test("px67 dup-size histogram: composes the clustering with two tiny partial aggs, no new corpus shuffle") {
    val plan = executedPlan(graft.queries.Pipeline.px67DupSizeHistogram(spark, dir))
    assert(plan.contains("partial"),
      s"histogram aggregation must map-side combine:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("px68 source dedup rates: low-card partial agg over one doc_id join, no cartesian") {
    val plan = executedPlan(graft.queries.Pipeline.px68SourceDedupRates(spark, dir))
    assert(plan.contains("partial"),
      s"per-source aggregation must map-side combine:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("px69 exact-substring removal: gram agg combines map-side, rebuild stays doc-keyed") {
    val plan = executedPlan(graft.queries.Pipeline.px69ExactSubstrDedup(spark, dir))
    // the one corpus-sized aggregation (cnt + canonical min per gram)
    // must apply partial aggs before the gram shuffle
    assert(plan.contains("partial"),
      s"gram stats must map-side combine:\n${plan.take(3000)}")
    // everything after the dup-position sliver is doc-keyed: the island
    // window and the spans⋈tokens rebuild partition on doc_id, so no
    // per-task state exceeds a document
    assert(plan.contains("hashpartitioning(doc_id"),
      s"span merge must partition by doc_id:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // a window over an EMPTY partition spec would funnel the corpus
    // through one task
    assert(!plan.contains("SinglePartition"),
      s"no stage may collapse to a single partition:\n${plan.take(3000)}")
  }

  test("px71 audio segments: map-only framing, the one exchange is media-keyed") {
    val plan = executedPlan(graft.queries.Pipeline.px71AudioSegments(spark, dir))
    // the island merge must partition by media_id — per-task state is one
    // recording's frames, never the corpus
    assert(plan.contains("hashpartitioning(media_id"),
      s"segment merge must partition by media_id:\n${plan.take(3000)}")
    assert(!plan.contains("SinglePartition"),
      s"no stage may collapse to a single partition:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      plan.take(3000))
  }

  test("px72 source containment: one gram agg carrying source sets, no gram self-join") {
    val plan = executedPlan(graft.queries.Pipeline.px72SourceContainment(spark, dir))
    assert(plan.contains("partial"),
      s"the gram aggregation must map-side combine:\n${plan.take(3000)}")
    // the matrix falls out of the collect_set fan-out — a gram-keyed
    // SELF-join would shuffle the corpus twice and amplify
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"no gram self-join allowed:\n${plan.take(3000)}")
    // the per-source denominators are a #sources-row frame — broadcast
    assert(plan.contains("BroadcastHashJoin"),
      s"denominators must broadcast:\n${plan.take(3000)}")
  }

  test("px70 novelty rate: one gram-keyed min + join back, per-doc agg combines map-side") {
    val plan = executedPlan(graft.queries.Pipeline.px70NoveltyRate(spark, dir))
    assert(plan.contains("partial"),
      s"first-doc attribution must map-side combine:\n${plan.take(3000)}")
    assert(plan.contains("hashpartitioning(gram"),
      s"attribution must shuffle on the gram key:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("SinglePartition"),
      s"no stage may collapse to a single partition:\n${plan.take(3000)}")
  }

  test("WAL rotation metrics surface on the batch-write node (SQL UI path)") {
    // a batch write that crosses the auto-checkpoint gate must report the
    // rotations it triggered as DRIVER metrics on its own write node —
    // the SQL-UI observable beside the scan-side graftRowsScanned family
    import graft.store.KvStore
    val dir = java.nio.file.Files.createTempDirectory("graft-walmetrics")
    KvStore.enableWal(dir)
    KvStore.setWalAutoCheckpoint(records = 50, bytes = 0)
    val cat =
      """{"table":{"namespace":"default", "name":"walmetrics_t"},
        |"rowkey":"key",
        |"columns":{
        |"id":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"v":{"cf":"f", "col":"v", "type":"string"}}}""".stripMargin
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.execution.SparkPlan]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        { plans.add(qe.executedPlan); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      import spark.implicits._
      (0L until 500L).map(i => (i, s"v$i")).toDF("id", "v")
        .write.format("graft-kv")
        .options(Map("catalog" -> cat, "newtable" -> "4",
          "minSplitNum" -> "0", "maxSplitNum" -> "500"))
        .mode("overwrite").save()
      // QueryExecutionListener rides the async listener bus
      var spins = 0
      while (plans.isEmpty && spins < 50) { Thread.sleep(100); spins += 1 }
      Thread.sleep(300)
      def nodes(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          nodes(a.executedPlan)
        case other => other +: other.children.flatMap(nodes)
      }
      import scala.jdk.CollectionConverters._
      val allNodes = plans.asScala.toSeq.flatMap(nodes)
      val writeNode: Option[org.apache.spark.sql.execution.SparkPlan] =
        allNodes.find(_.metrics.contains("graftWalRotations"))
      info(s"captured ${plans.size} plans; node classes: " +
        allNodes.map(_.getClass.getSimpleName).distinct.mkString(","))
      assert(writeNode.isDefined,
        "the v2 write node must expose the graftWalRotations custom metric")
      assert(writeNode.get.metrics("graftWalRotations").value >= 1L,
        "a 500-row write over a 50-record gate must report its rotations")
      assert(writeNode.get.metrics.contains("graftWalRotationMs"),
        "rotation wall-clock must be reported beside the count")
    } finally {
      spark.listenerManager.unregister(listener)
      KvStore.setWalAutoCheckpoint(
        KvStore.DefaultAutoCheckpointRecords, KvStore.DefaultAutoCheckpointBytes)
      KvStore.disableWal()
      KvStore.drop("default:walmetrics_t")
    }
  }

  test("kv32: the probe list prunes the cell-keyed code-table SCAN to probed cells") {
    // px61's I/O-pruning claim made real: with `cell` the LEADING row-key
    // part, pushing the probe list as In plans one point-range sliver per
    // probed cell — regions no probe touches produce NO input partition.
    Pipeline.kv32IvfPqScan(spark, dir).collect() // builds + snapshots the table
    val table = KvStore.table("default:kv_ivfpq_codes")
    val totalRegions = table.regions.size
    assert(totalRegions == 8, s"kv_ivfpq_codes presplits to 8 regions, got $totalRegions")
    def scan(cells: Seq[Int]) = spark.read.format("graft-kv")
      .options(Map("catalog" -> Pipeline.kv32Catalog, "pqCodes" -> Pipeline.kv32Avro))
      .load()
      .filter(org.apache.spark.sql.functions.col("cell")
        .isin(cells.map(Int.box): _*))
    // one query's probe list (nprobe=4 of nlist=16): at most 4 cells' worth
    // of regions may plan — nprobe/nlist of the corpus, not all of it
    val probed = scan(Seq(0, 1, 2, 3))
    val scanned = probed.rdd.getNumPartitions
    assert(scanned <= 4 && scanned < totalRegions,
      s"4 probed cells must plan <= 4 region slivers of $totalRegions, got $scanned")
    assert(probed.count() > 0, "probed slivers must actually serve rows")
    // a single-cell probe is a single sliver
    assert(scan(Seq(5)).rdd.getNumPartitions == 1,
      "one probed cell must plan exactly one region sliver")
  }

  test("q27: recursion executes as ONE native loop operator with data-dependent depth") {
    // pin the recursion operator's shape: the fixpoint must run as Spark 4's
    // native UnionLoop (one operator iterating INSIDE one execution), not a
    // driver loop re-planning per iteration — a regression into per-iteration
    // re-planning would show up as the loop operator vanishing from the plan
    // audit the LAZY recursion frame: the public q27RecursiveCte executes
    // it eagerly (AQE off for the loop) and returns a checkpointed result
    // whose own plan is a bare RDD scan. Run the audit body under the
    // SAME AQE-off window the production path uses — auditing the
    // AQE-on plan would pass even if an AQE-specific regression broke
    // the eager path (r14 ADVICE item 4).
    val aqeK = "spark.sql.adaptive.enabled"
    val prevAqe = spark.conf.getOption(aqeK)
    spark.conf.set(aqeK, "false")
    val plan = try {
      val df = Relational.q27Recursion(spark, dir)
      df.collect()
      df.queryExecution.executedPlan.toString
    } finally prevAqe match {
      case Some(v) => spark.conf.set(aqeK, v)
      case None => spark.conf.unset(aqeK)
    }
    assert("UnionLoop".r.findAllIn(plan).size >= 1,
      s"q27 must execute through the native recursion operator:\n${plan.take(1500)}")
    // the recursive STEP join must stay a broadcast hash join: the inner
    // (parent-edge) side is small and the loop body re-executes once per
    // iteration — a stats flip to SortMergeJoin would silently multiply
    // the 17-iteration loop into 17 full shuffles of the edge table. One
    // SMJ is expected OUTSIDE the loop (the corpus-sized final left join).
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 1,
      s"q27's recursive step must broadcast the edge side:\n${plan.take(2000)}")
    assert("SortMergeJoin".r.findAllIn(plan).size <= 1,
      s"q27 must not sort-merge inside the loop body:\n${plan.take(2000)}")
    // depth is DATA-DEPENDENT and really iterates: squeezing the engine's
    // recursion budget below the corpus's chain depth must fail loudly,
    // proving the loop runs to a data-driven fixpoint rather than a fixed
    // unrolling
    val limitKey = "spark.sql.cteRecursionLevelLimit"
    val old = spark.conf.get(limitKey)
    try {
      spark.conf.set(limitKey, "2")
      val ex = intercept[Exception] {
        Relational.q27RecursiveCte(spark, dir).collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(ex).exists(m => m.toLowerCase.contains("recursion")),
        s"expected the recursion-limit refusal, got: $ex")
    } finally spark.conf.set(limitKey, old)
    // and at the default limit the fixpoint converges well below it
    assert(Relational.q27RecursiveCte(spark, dir).count() > 0)
  }

  test("sv25: the maintained code table serves probe slivers, not corpus scans") {
    // kv32's audit twin on the CDC-MAINTAINED layout: after the full
    // maintenance run, a probe list over kv_ivfpq_live must plan one
    // region sliver per probed cell — the serving claim holds for the
    // maintained table, not just the one-shot snapshot
    StreamBatch.sv25StreamIvfPq(spark, dir).collect()
    val table = KvStore.table("default:kv_ivfpq_live")
    val totalRegions = table.regions.size
    def scan(cells: Seq[Int]) = spark.read.format("graft-kv")
      .options(Map("catalog" -> StreamBatch.sv25CodesCatalog,
        "pqCodes" -> StreamBatch.sv20AvroCodes))
      .load()
      .filter(org.apache.spark.sql.functions.col("cell")
        .isin(cells.map(Int.box): _*))
    val scanned = scan(Seq(0, 1, 2, 3)).rdd.getNumPartitions
    assert(scanned <= 4 && scanned < totalRegions,
      s"4 probed cells must plan <= 4 slivers of $totalRegions regions, got $scanned")
    assert(scan(Seq(0, 1, 2, 3)).count() > 0, "probed slivers must serve rows")
    assert(scan(Seq(5)).rdd.getNumPartitions == 1)
  }

  test("warm query construction is job-free: the Tables relation cache holds") {
    // Round-13 attribution of the 'fixed per-query overhead' VERDICT item:
    // every spark.read.parquet call re-ran file listing plus a driver-side
    // schema-inference JOB (~35-50 ms single-task stage), 100-200 ms of
    // build cost on EVERY query invocation. Tables now caches the resolved
    // relation per (session, dir, table); this guard pins the contract —
    // a second construction of the same query schedules NO Spark job and
    // reuses the identical resolved plan object.
    Tables(spark, dir, "lineitem").count() // prime the cache through a real query
    assert(Tables(spark, dir, "lineitem") eq Tables(spark, dir, "lineitem"),
      "repeated Tables() resolution must return the cached DataFrame instance")
    // statusTracker is the public job census; the MAX job id is monotone
    // (job ids only grow), so the comparison survives AppStatusStore's
    // retained-jobs eviction, which could shrink a raw COUNT between
    // samples in a long shared-session suite. Construction+analysis runs
    // on THIS thread, so any job it schedules registers synchronously.
    def maxJobId(): Int = {
      val ids = spark.sparkContext.statusTracker.getJobIdsForGroup(null)
      if (ids.isEmpty) -1 else ids.max
    }
    val before = maxJobId()
    val df = graft.SparkEntry.queries("q9_count")(spark, dir)
    df.queryExecution.assertAnalyzed()
    df.count() // a real action AFTER, proving the growth below is observable
    val afterAction = maxJobId()
    assert(afterAction > before, "sanity: the count() action must register as a job")
    val built = graft.SparkEntry.queries("q9_count")(spark, dir)
    built.queryExecution.assertAnalyzed()
    assert(maxJobId() == afterAction,
      s"warm construction+analysis of q9_count must schedule no job")
  }
}
