package graft.datasource

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.GraftCatalog
import graft.store.KvStore

/** Global secondary index ([[SecondaryIndex]]): write-path maintenance
  * through every mutation route, planner consult correctness, and the
  * fallback gates. */
class IndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.stop(); KvStore.dropAll() }

  import spark.implicits._

  private val catalogJson =
    """{"table":{"namespace":"default", "name":"idxtab"},
      |"rowkey":"key",
      |"columns":{
      |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"owner":{"cf":"f", "col":"o", "type":"string", "index":"true"},
      |"score":{"cf":"f", "col":"s", "type":"bigint", "index":"true"},
      |"note":{"cf":"f", "col":"n", "type":"string"}}}""".stripMargin

  private val cat = GraftCatalog.parse(catalogJson, Map.empty)
  private val opts = GraftOptions(new java.util.HashMap[String, String] {
    put("catalog", catalogJson)
  })

  private def write(rows: Seq[(Long, String, Long, String)], ts: Long): Unit =
    rows.toDF("key", "owner", "score", "note").write.format("graft-kv")
      .options(Map("catalog" -> catalogJson, "newtable" -> "4",
        "minSplitNum" -> "0", "maxSplitNum" -> "1000", "timestamp" -> ts.toString))
      .mode("append").save()

  private def readBack = spark.read.format("graft-kv").option("catalog", catalogJson).load()

  private def allPlanNodes(p: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allPlanNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allPlanNodes(q.plan)
    case _ => p +: p.children.flatMap(allPlanNodes)
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    allPlanNodes(df.queryExecution.executedPlan).collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.get

  test("catalog parses index flags; key/dynamic columns are rejected") {
    assert(cat.indexedFields.map(_.name) == Seq("owner", "score"))
    val bad =
      """{"table":{"namespace":"default", "name":"badidx"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"bigint", "index":"true"},
        |"v":{"cf":"f", "col":"v", "type":"string"}}}""".stripMargin
    val e = intercept[IllegalArgumentException](GraftCatalog.parse(bad, Map.empty))
    assert(e.getMessage.contains("primary index"))
  }

  test("writes maintain the index; an indexed eq-filter read consults it") {
    write(Seq(
      (1L, "alice", 10L, "a"), (2L, "bob", 20L, "b"), (3L, "alice", 30L, "c"),
      (4L, "carol", 10L, "d"), (5L, "bob", 50L, "e")), ts = 100L)
    assert(KvStore.exists("default:idxtab__idx__owner"))
    assert(KvStore.exists("default:idxtab__idx__score"))

    val df = readBack.filter(col("owner") === "alice").select(col("key"), col("score"))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(rows.toSeq == Seq((1L, 10L), (3L, 30L)))
    val metrics = scanOf(df).metrics
    assert(metrics("graftIndexKeys").value == 2L,
      s"eq consult must produce exactly the 2 matching keys, got ${metrics("graftIndexKeys").value}")
    assert(metrics("graftRowsScanned").value == 2L,
      "point gets must materialize only matching rows, not the whole table")
  }

  test("updating an indexed value retires the old entry and adds the new") {
    // key 2: bob -> dave (newer stamp wins latest-merge)
    write(Seq((2L, "dave", 20L, "b2")), ts = 200L)
    val dave = readBack.filter(col("owner") === "dave").select("key")
      .collect().map(_.getLong(0)).toSeq
    assert(dave == Seq(2L))
    val bob = readBack.filter(col("owner") === "bob").select("key")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(bob == Seq(5L), s"key 2's old 'bob' entry must be retired, got $bob")
  }

  test("range + In filters consult; residual predicates still apply") {
    // owner is VARIABLE-width; a {key}-only projection now serves
    // INDEX-ONLY (entries parse as var-value + fixed-key via the
    // negative-offset layout) — no consult, no main-table touch
    val in = readBack.filter(col("owner").isin("alice", "dave")).select("key")
    assert(in.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(scanOf(in).metrics("graftIndexOnlyScan").value == 1L)
    assert(scanOf(in).metrics("graftIndexKeys").value == 0L)
    // widening the projection past the index forces the point-get consult
    val inWide = readBack.filter(col("owner").isin("alice", "dave"))
      .select("key", "note")
    assert(inWide.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(scanOf(inWide).metrics("graftIndexKeys").value == 3L)

    // numeric range on the second index; extra predicate on an unindexed
    // column is evaluated on the fetched rows
    val rng = readBack.filter(col("score") >= 20L && col("score") <= 50L &&
      col("note") =!= "b2").select("key")
    assert(rng.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 5L))
    val m = scanOf(rng).metrics
    assert(m("graftIndexKeys").value == 3L, // keys 2,3,5 match the range pre-residual
      s"range consult keys: ${m("graftIndexKeys").value}")
  }

  test("SQL DELETE retires index entries (metadata-delete path)") {
    val tmp = readBack
    tmp.createOrReplaceTempView("idxtab_v")
    // exact-compilable delete routes through KvTable.delete → hooks fire
    KvStore.table("default:idxtab").delete(
      Seq(graft.ranges.ScanRange.point(
        cat.rowKeyParts.head.field.coder.encode(
          org.apache.spark.sql.types.LongType, 3L))), None, stamp = 300L)
    val alice = readBack.filter(col("owner") === "alice").select("key")
      .collect().map(_.getLong(0)).toSeq
    assert(alice == Seq(1L), s"deleted key 3 must leave the index, got $alice")
  }

  test("versioned and time-travel reads do not consult the index") {
    import org.apache.spark.sql.sources.EqualTo
    assert(SecondaryIndex.lookup(cat, opts, Seq(EqualTo("owner", "alice"))).isDefined)
    val versioned = opts.copy(maxVersions = 3)
    assert(SecondaryIndex.lookup(cat, versioned, Seq(EqualTo("owner", "alice"))).isEmpty)
    val timeTravel = opts.copy(maxStamp = Some(150L))
    assert(SecondaryIndex.lookup(cat, timeTravel, Seq(EqualTo("owner", "alice"))).isEmpty)
    // no filter on an indexed column -> no consult
    assert(SecondaryIndex.lookup(cat, opts, Seq(EqualTo("note", "a"))).isEmpty)
  }

  test("INSERT OVERWRITE (drop-recreate) rebuilds the index tables") {
    Seq((7L, "erin", 70L, "x"), (8L, "erin", 80L, "y"))
      .toDF("key", "owner", "score", "note").write.format("graft-kv")
      .options(Map("catalog" -> catalogJson, "newtable" -> "4",
        "minSplitNum" -> "0", "maxSplitNum" -> "1000", "timestamp" -> "400"))
      .mode("overwrite").save()
    val erin = readBack.filter(col("owner") === "erin").select("key")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(erin == Seq(7L, 8L))
    // stale pre-overwrite entries must be gone with their index tables
    val alice = readBack.filter(col("owner") === "alice").count()
    assert(alice == 0L)
  }

  test("indexed-filter scans report consult-bounded stats and auto-broadcast in joins") {
    val dim = readBack.filter(col("owner") === "erin").select(col("key"), col("score"))
    val fact = spark.range(0, 10000).select(
      (col("id") % 10L + 1L).as("key"), col("id").as("payload"))
    val joined = fact.join(dim, "key")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"a 2-key indexed filter must auto-broadcast without hints:\n${plan.take(2500)}")
  }

  test("a pure TTL window (lower stamp bound) still consults; upper bounds decline") {
    import org.apache.spark.sql.sources.EqualTo
    val tenYears = 10L * 365 * 24 * 3600 * 1000
    // fresh wall-clock stamps: rows must be INSIDE the ttl window
    write(Seq((20L, "frank", 5L, "f1"), (21L, "frank", 6L, "f2")),
      ts = System.currentTimeMillis())
    val ttlOpts = opts.copy(ttl = Some(tenYears))
      .withTtlResolved(System.currentTimeMillis())
    assert(ttlOpts.timeRange.isDefined)
    assert(SecondaryIndex.lookup(cat, ttlOpts, Seq(EqualTo("owner", "frank"))).isDefined)
    val ttlRead = spark.read.format("graft-kv").option("catalog", catalogJson)
      .option("ttl", tenYears.toString).load()
      .filter(col("owner") === "frank").select("key")
    assert(ttlRead.collect().map(_.getLong(0)).sorted.toSeq == Seq(20L, 21L))
    assert(scanOf(ttlRead).metrics("graftIndexKeys").value == 2L,
      "TTL reads must still take the index point-get path")
  }

  test("index-only scan: projections inside {indexed col, key} never touch the main table") {
    // live rows here: erin (7, 70), (8, 80) and frank (20, 5), (21, 6);
    // score is FIXED-width (bigint) so its index supports index-only scans
    val df = readBack.filter(col("score") === 5L).select(col("key"), col("score"))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(rows.toSeq == Seq((20L, 5L)))
    val m = scanOf(df).metrics
    assert(m("graftIndexOnlyScan").value == 1L,
      "a {key, score} projection with a score filter must serve from the index alone")
    assert(m("graftIndexKeys").value == 0L, "index-only needs no point-get consult")

    // a key-suffix predicate rides along: it compiles exactly against the
    // index catalog (key part at a shifted offset)
    val mixed = readBack.filter(col("score") >= 5L && col("key") > 20L).select("key")
    assert(mixed.collect().map(_.getLong(0)).sorted.toSeq == Seq(21L))
    assert(scanOf(mixed).metrics("graftIndexOnlyScan").value == 1L)

    // count(*) under the filter: global agg pushdown composes (KeysOnly
    // partials over the index regions)
    val cnt = readBack.filter(col("score").isin(5L, 6L)).agg(count(lit(1)).as("n"))
    // collect() (not head()) so the DF's own queryExecution carries metrics
    assert(cnt.collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(scanOf(cnt).metrics("graftIndexOnlyScan").value == 1L)
  }

  test("index-only declines: wider projections, OR-with-key, and null tests") {
    // projecting a non-index column falls back to the point-get consult
    val wide = readBack.filter(col("owner") === "frank").select("key", "score")
    assert(wide.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((20L, 5L), (21L, 6L)))
    val mWide = scanOf(wide).metrics
    assert(mWide("graftIndexOnlyScan").value == 0L)
    assert(mWide("graftIndexKeys").value == 2L)

    // a row whose indexed column is NULL exists in the main table only —
    // every shape that could match it must refuse the index
    write(Seq((30L, null, 9L, "nullowner")), ts = 600L)
    val orKey = readBack.filter(col("owner") === "frank" || col("key") === 30L).select("key")
    assert(orKey.collect().map(_.getLong(0)).sorted.toSeq == Seq(20L, 21L, 30L),
      "OR-with-key can match null-owner rows; the index must not serve it")
    assert(scanOf(orKey).metrics("graftIndexOnlyScan").value == 0L)

    val isNull = readBack.filter(col("owner").isNull).select("key")
    assert(isNull.collect().map(_.getLong(0)).toSeq == Seq(30L))
    assert(scanOf(isNull).metrics("graftIndexOnlyScan").value == 0L)
  }

  test("covered columns: wider projections stay index-only and track updates") {
    val covCatalog =
      """{"table":{"namespace":"default", "name":"covtab"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"grp":{"cf":"f", "col":"g", "type":"bigint", "index":"true", "cover":"label,qty"},
        |"label":{"cf":"f", "col":"l", "type":"string"},
        |"qty":{"cf":"f", "col":"q", "type":"bigint"},
        |"other":{"cf":"f", "col":"o", "type":"string"}}}""".stripMargin
    def writeCov(rows: Seq[(Long, Long, String, Long, String)], ts: Long): Unit =
      rows.toDF("key", "grp", "label", "qty", "other").write.format("graft-kv")
        .options(Map("catalog" -> covCatalog, "newtable" -> "4",
          "minSplitNum" -> "0", "maxSplitNum" -> "100", "timestamp" -> ts.toString))
        .mode("append").save()
    writeCov(Seq((1L, 10L, "a", 5L, "x"), (2L, 10L, "b", 6L, "y"),
      (3L, 20L, "c", 7L, "z")), ts = 100L)
    def readCov = spark.read.format("graft-kv").option("catalog", covCatalog).load()

    // {key, label, qty} projection: label/qty ride in the entries
    val df = readCov.filter(col("grp") === 10L)
      .select(col("key"), col("label"), col("qty"))
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(rows.toSeq == Seq((1L, "a", 5L), (2L, "b", 6L)))
    assert(scanOf(df).metrics("graftIndexOnlyScan").value == 1L,
      "covered projections must serve from the index alone")

    // filters on covered columns compile as exact value predicates
    val filtered = readCov.filter(col("grp") === 10L && col("qty") > 5L).select("key", "label")
    assert(filtered.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((2L, "b")))
    assert(scanOf(filtered).metrics("graftIndexOnlyScan").value == 1L)

    // an un-covered column falls back to the point-get consult
    val wide = readCov.filter(col("grp") === 10L).select("key", "other")
    assert(wide.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "x"), (2L, "y")))
    assert(scanOf(wide).metrics("graftIndexOnlyScan").value == 0L)
    assert(scanOf(wide).metrics("graftIndexKeys").value == 2L)

    // a covered-only update refreshes the entry in place
    writeCov(Seq((1L, 10L, "a2", 50L, "x")), ts = 200L)
    val upd = readCov.filter(col("grp") === 10L).select(col("key"), col("label"), col("qty"))
    assert(upd.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq ==
      Seq((1L, "a2", 50L), (2L, "b", 6L)))
    assert(scanOf(upd).metrics("graftIndexOnlyScan").value == 1L)

    // an indexed-value change re-keys the entry, covered values ride along
    writeCov(Seq((2L, 20L, "b2", 60L, "y")), ts = 300L)
    val moved = readCov.filter(col("grp") === 20L).select(col("key"), col("label"))
    assert(moved.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((2L, "b2"), (3L, "c")))
    assert(readCov.filter(col("grp") === 10L).count() == 1L)
  }

  test("GROUP BY an indexed column pushes grouped partials through the index") {
    // covtab state from the covered test: (1, grp 10, a2, 50), (2, grp 20,
    // b2, 60), (3, grp 20, c, 7)
    val covCatalog =
      """{"table":{"namespace":"default", "name":"covtab"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"grp":{"cf":"f", "col":"g", "type":"bigint", "index":"true", "cover":"label,qty"},
        |"label":{"cf":"f", "col":"l", "type":"string"},
        |"qty":{"cf":"f", "col":"q", "type":"bigint"},
        |"other":{"cf":"f", "col":"o", "type":"string"}}}""".stripMargin
    val grouped = spark.read.format("graft-kv").option("catalog", covCatalog).load()
      .filter(col("grp").isin(10L, 20L))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("qty")).as("s"))
      .orderBy(col("grp"))
    val rows = grouped.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((10L, 1L, 50L), (20L, 2L, 67L)))
    val plan = grouped.queryExecution.executedPlan.toString
    assert(plan.contains("pushedGroupBy=[grp]"),
      s"GROUP BY on the indexed column must push grouped partials:\n${plan.take(2500)}")
    assert(plan.contains("scan=index-only(default:covtab__idx__grp)"),
      s"explain output must surface the index-only decision:\n${plan.take(2500)}")
    assert(scanOf(grouped).metrics("graftIndexOnlyScan").value == 1L,
      "the grouped partials must stream off the INDEX's sort order")
  }

  test("var-width bounds stay exact for prefix values and adversarial key bytes") {
    // The hazard the 0x00 entry terminator exists for: a value that is a
    // byte-PREFIX of a bound ("a" vs "ab") pairs with main-key bytes that
    // sort arbitrarily high — key -1L encodes as 0xFF×8, so without the
    // terminator the entry "a"‖0xFF… would sort past any widened bound
    // ("ac") and range pruning would silently drop the row.
    val vcat =
      """{"table":{"namespace":"default", "name":"vbtab"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"name":{"cf":"f", "col":"n", "type":"string", "index":"true"},
        |"note":{"cf":"f", "col":"o", "type":"string"}}}""".stripMargin
    Seq((-1L, "a", "neg"), (10L, "ab", "x"), (11L, "abc", "y"), (12L, "b", "z"))
      .toDF("key", "name", "note").write.format("graft-kv")
      .options(Map("catalog" -> vcat, "newtable" -> "4", "timestamp" -> "100"))
      .mode("append").save()
    def q(cols: String*)(f: org.apache.spark.sql.Column) =
      spark.read.format("graft-kv").option("catalog", vcat).load()
        .filter(f).select(cols.head, cols.tail: _*)
    def keysOf(f: org.apache.spark.sql.Column): Seq[Long] =
      q("key")(f).collect().map(_.getLong(0)).sorted.toSeq
    // INDEX-ONLY path ({name, key} projection)
    assert(keysOf(col("name") <= "ab") == Seq(-1L, 10L),
      "Le must keep the prefix value 'a' despite its 0xFF… key bytes")
    assert(keysOf(col("name") < "ab") == Seq(-1L))
    assert(keysOf(col("name") > "ab") == Seq(11L, 12L),
      "Gt must keep extensions ('abc') and larger values")
    assert(keysOf(col("name") >= "ab") == Seq(10L, 11L, 12L))
    assert(keysOf(col("name") === "ab") == Seq(10L))
    assert(keysOf(col("name").between("a", "abc")) == Seq(-1L, 10L, 11L))
    val ixo = q("key")(col("name") <= "ab")
    ixo.collect()
    assert(scanOf(ixo).metrics("graftIndexOnlyScan").value == 1L)
    // CONSULT path (note in the projection forces point gets)
    def keysWide(f: org.apache.spark.sql.Column): Seq[Long] =
      q("key", "note")(f).collect().map(_.getLong(0)).sorted.toSeq
    assert(keysWide(col("name") <= "ab") == Seq(-1L, 10L))
    assert(keysWide(col("name") > "a") == Seq(10L, 11L, 12L))
    assert(keysWide(col("name") < "b") == Seq(-1L, 10L, 11L))
    val consulted = q("key", "note")(col("name") <= "ab")
    consulted.collect()
    assert(scanOf(consulted).metrics("graftIndexKeys").value == 2L,
      "the consult must find exactly the two matching entries")
  }

  test("NUL-bearing var-width indexed values are rejected at encode, before any mutation") {
    val vcat =
      """{"table":{"namespace":"default", "name":"nultab"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"name":{"cf":"f", "col":"n", "type":"string", "index":"true"}}}""".stripMargin
    val e = intercept[Exception] {
      Seq((1L, "ok"), (2L, "bad\u0000name")).toDF("key", "name")
        .write.format("graft-kv")
        .options(Map("catalog" -> vcat, "newtable" -> "4"))
        .mode("append").save()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
    assert(rootMessages(e).exists(_.contains("0x00")),
      s"expected the NUL-terminator contract error, got: ${e.getMessage}")
    // the failing WRITE TASK must not have committed a half-indexed row:
    // the index never gained an entry for the NUL value
    if (graft.store.KvStore.exists("default:nultab__idx__name")) {
      val entries = graft.store.KvStore.table("default:nultab__idx__name")
        .regions.map(_.rowCount.get()).sum
      assert(entries == 0L || entries == 1L,
        s"no NUL entry may exist; index holds $entries entries")
    }
    graft.store.KvStore.drop("default:nultab")
    graft.store.KvStore.drop("default:nultab__idx__name")
  }

  test("var-width binary indexes are rejected at catalog validation") {
    val bad =
      """{"table":{"namespace":"default", "name":"binidx"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"blob":{"cf":"f", "col":"b", "type":"binary", "index":"true"}}}""".stripMargin
    val e = intercept[IllegalArgumentException](GraftCatalog.parse(bad, Map.empty))
    assert(e.getMessage.contains("var-width binary"))
  }

  test("GROUP BY a var-width string index streams grouped partials off the index") {
    // prefix-related owners "ab" (key 10) and "abc" (key 11) — whose index
    // entries INTERLEAVE byte-wise — plus erin (7, 8) and frank (20, 21)
    // from earlier tests. Fragmented runs must still merge to exact group
    // totals in the final aggregate. (Idempotent re-put: the same cells at
    // the same stamp also land in the over-approximation test.)
    write(Seq((10L, "ab", 1L, "p"), (11L, "abc", 2L, "q")), ts = 500L)
    val grouped = readBack
      .filter(col("owner").isin("ab", "abc", "erin", "frank"))
      .groupBy(col("owner"))
      .agg(count(lit(1)).as("n"), min(col("key")).as("k0"), max(col("key")).as("k1"))
      .orderBy(col("owner"))
    val rows = grouped.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(("ab", 1L, 10L, 10L), ("abc", 1L, 11L, 11L),
      ("erin", 2L, 7L, 8L), ("frank", 2L, 20L, 21L)))
    val plan = grouped.queryExecution.executedPlan.toString
    assert(plan.contains("pushedGroupBy=[owner]"),
      s"GROUP BY on the var-width indexed column must push grouped partials:\n${plan.take(2500)}")
    assert(plan.contains("scan=index-only(default:idxtab__idx__owner)"),
      s"explain output must surface the index-only decision:\n${plan.take(2500)}")
    assert(scanOf(grouped).metrics("graftIndexOnlyScan").value == 1L)
  }

  test("indexLookupCap: a tiny cap forces consult fallback without changing results") {
    // note in the projection keeps this off the index-only path — the
    // consult-vs-fallback decision is what this test pins
    val capped = spark.read.format("graft-kv").option("catalog", catalogJson)
      .option("indexLookupCap", "0").load()
      .filter(col("owner") === "erin").select("key", "note")
    assert(capped.collect().map(_.getLong(0)).sorted.toSeq == Seq(7L, 8L))
    val m = scanOf(capped).metrics
    assert(m("graftIndexKeys").value == 0L,
      "over-cap consults must fall back to the plain region scan")
  }

  test("string-prefix over-approximation is corrected by the row predicate") {
    write(Seq((10L, "ab", 1L, "p"), (11L, "abc", 2L, "q")), ts = 500L)
    // {key}-only: INDEX-ONLY scan; the terminated entry layout keeps "abc"
    // entries outside eq "ab"'s range, and the exact var-width key
    // predicate backstops it either way
    val df = readBack.filter(col("owner") === "ab").select("key")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(10L))
    assert(scanOf(df).metrics("graftIndexOnlyScan").value == 1L)
    // wider projection: the point-get CONSULT. The 0x00 entry terminator
    // makes Eq an EXACT entry range — "abc" entries sort outside
    // ["ab"‖0x00, "ab"‖0x01) — so the consult reads only the true match
    val wide = readBack.filter(col("owner") === "ab").select("key", "note")
    assert(wide.collect().map(_.getLong(0)).toSeq == Seq(10L))
    val m = scanOf(wide).metrics
    assert(m("graftIndexKeys").value == 1L,
      "the terminated entry layout must make Eq consults exact (no prefix false positives)")
    // ordering comparisons around prefix-related values: "ab" < "abc", and
    // a value that is a byte-prefix of the bound ("ab" vs "abc") must not
    // be lost through entry-range under-approximation on either path
    val gt = readBack.filter(col("owner") > "ab" && col("key").between(10L, 11L))
      .select("key")
    assert(gt.collect().map(_.getLong(0)).sorted.toSeq == Seq(11L),
      "Gt must keep longer-string extensions of the bound")
    val lt = readBack.filter(col("owner") < "abc" && col("key").between(10L, 11L))
      .select("key")
    assert(lt.collect().map(_.getLong(0)).sorted.toSeq == Seq(10L),
      "Lt must keep values that are byte-prefixes of the bound")
  }

  test("selectivity pre-check: an unselective range declines off row counters, zero entry reads") {
    // every owner value written by this suite starts with an ASCII byte in
    // [0x40, 0x80) — index region 1 — so a range from " " FULLY covers
    // every populated index region. The pre-check sums the O(1) region row
    // counters, sees the covered floor alone exceeds the cap, and declines
    // without reading a single index entry — O(regions), not O(cap).
    // note in the projection keeps this off the index-only path — the
    // CONSULT's pre-check is what this test pins
    val capped = spark.read.format("graft-kv").option("catalog", catalogJson)
      .option("indexLookupCap", "2").load()
      .filter(col("owner") >= " ").select("key", "note")
    val keys = capped.collect().map(_.getLong(0))
    assert(keys.length > 2, "the filter must be unselective (matches everything)")
    assert(scanOf(capped).metrics("graftIndexKeys").value == 0L,
      "an unselective consult must fall back to the region scan")
    assert(SecondaryIndex.lastConsultEntriesRead.get() == 0L,
      s"pre-check must decline without scanning; read " +
        s"${SecondaryIndex.lastConsultEntriesRead.get()} entries")
  }

  test("delete-mode write: a key frame dies distributed, index hooks fire, MVCC re-put resurrects") {
    // the distributed retirement primitive the CDC consumers (sv11/sv12)
    // ride: rows to drop are a DataFrame of KEYS written with delete=true —
    // each writer task tombstones against its own region slice; no driver
    // round-trip of the key set
    val delCatalog =
      """{"table":{"namespace":"default", "name":"deltab"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"owner":{"cf":"f", "col":"o", "type":"string", "index":"true"},
        |"note":{"cf":"f", "col":"n", "type":"string"}}}""".stripMargin
    (0L until 100L).map(i => (i, if (i % 2 == 0) "even" else "odd", s"n$i"))
      .toDF("key", "owner", "note").write.format("graft-kv")
      .options(Map("catalog" -> delCatalog, "newtable" -> "4",
        "minSplitNum" -> "0", "maxSplitNum" -> "100", "timestamp" -> "100"))
      .mode("append").save()
    def read = spark.read.format("graft-kv").option("catalog", delCatalog).load()
    assert(read.count() == 100)

    // delete every even key via a KEY-ONLY frame through the writer
    spark.range(0, 100, 2).selectExpr("id AS key")
      .write.format("graft-kv")
      .options(Map("catalog" -> delCatalog, "delete" -> "true", "timestamp" -> "200"))
      .mode("append").save()
    assert(read.count() == 50)
    assert(read.filter(col("key") % 2 === 0).count() == 0)
    // index hooks fired inside deleteRow: the 'even' postings are retired
    assert(read.filter(col("owner") === "even").count() == 0)
    assert(read.filter(col("owner") === "odd").count() == 50)

    // MVCC: a newer-stamp re-put resurrects through the tombstone
    Seq((42L, "even", "back")).toDF("key", "owner", "note")
      .write.format("graft-kv")
      .options(Map("catalog" -> delCatalog, "timestamp" -> "300"))
      .mode("append").save()
    val back = read.filter(col("owner") === "even")
      .select("key").collect().map(_.getLong(0)).toSeq
    assert(back == Seq(42L))
    KvStore.drop("default:deltab")
    KvStore.drop("default:deltab__idx__owner")
  }
}
