package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Scale-proxy stress: the closest a single-JVM sandbox gets to the 100 TB
  * adversarial case — a generated 10⁶-doc corpus that is 70% exact
  * boilerplate copies (50 templates × ~14k copies each), 20% near-dup
  * template variants, 10% unique. Exercises the px5/px7/px14 shapes at
  * volume and asserts the scale defenses hold:
  *
  *  - exact-dup pre-collapse: sketching runs on ~300k representatives, not
  *    10⁶ docs, and NO quadratic pair set is ever materialized (keepers are
  *    labeled through the rep graph);
  *  - salted bucket caps: a deliberately tiny cap forces overflow, whose
  *    drops are observe-counted (never silent) while kept totals respect
  *    the cap;
  *  - wall-clock ceilings as the regression net for the r4 cap/columnar
  *    changes — generous (this machine's timings vary 3× under load) but
  *    low enough that an accidental O(n²) reappearing would blow them.
  */
class ScaleProxySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val N = 1000000L

  /** 70% exact copies of 50 templates, 20% near-dup variants (one trailing
    * token differs), 10% unique — the boilerplate-heavy web-crawl profile
    * that makes naive LSH quadratic. */
  private def corpus: DataFrame = spark.range(N).selectExpr(
    "id AS doc_id",
    """CASE
      |  WHEN id % 10 < 7 THEN concat('boilerplate terms of service template ',
      |    CAST((id DIV 10) % 50 AS STRING), ' applies to all users of this site')
      |  WHEN id % 10 < 9 THEN concat('boilerplate terms of service template ',
      |    CAST((id DIV 10) % 50 AS STRING), ' applies to all users of site ',
      |    CAST(id % 9973 AS STRING))
      |  ELSE concat('unique document ', CAST(id AS STRING), ' content ',
      |    CAST(xxhash64(CAST(id AS STRING)) AS STRING))
      |END AS text""".stripMargin)

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def timedCpu[A](f: => A): (A, Double, Double) = {
    val c0 = graft.Bench.jvmCpuNanos()
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9, (graft.Bench.jvmCpuNanos() - c0) / 1e9)
  }

  /** The wall ceilings are the O(n²) regression net, but a bare wall budget
    * is a flake generator on a shared host (r14's only red gate: 162.9 s
    * under full-suite contention vs 20.3 s isolated, same code). A real
    * quadratic blowup burns CPU as well as wall — 5e9 shingle comparisons
    * cannot hide — so the net now requires BOTH budgets blown: wall noise
    * alone (external load, suite contention) leaves cpu at the linear
    * level; cpu pollution alone (other work in this JVM) leaves wall at
    * the linear level; an accidental O(n²) blows both. */
  private def assertBudget(what: String, secs: Double, cpuS: Double,
      wallCeil: Double, cpuCeil: Double): Unit =
    assert(secs < wallCeil || cpuS < cpuCeil,
      s"$what took $secs s wall AND $cpuS cpu-s (ceilings: $wallCeil s wall, " +
        s"$cpuCeil cpu-s) — both blown, which load alone cannot explain")

  test("px5 shape: exact dedup of 1M docs collapses the 70% boilerplate") {
    val (rows, secs, cpuS) = timedCpu {
      Dedup.exact(corpus, "text", "doc_id")
        .agg(count(lit(1)).as("n_distinct"), sum(col("n_copies")).as("n_docs"),
          max(col("n_copies")).as("biggest"))
        .head()
    }
    info(f"exact dedup of $N%d docs: $secs%.1f s ($cpuS%.1f cpu-s), " +
      s"${rows.getAs[Long]("n_distinct")} distinct")
    assert(rows.getAs[Long]("n_docs") == N)
    // 50 templates × ~14k copies dominate; near-dup variants repeat ~2×
    assert(rows.getAs[Long]("biggest") >= 10000L)
    assert(rows.getAs[Long]("n_distinct") < 400000L)
    assertBudget("exact dedup", secs, cpuS, 40.0, 200.0)
  }

  test("px7+px14 shape: minhashKeepers labels the 1M corpus without quadratic work") {
    val df = corpus
    val (labels, secs, cpuS) = timedCpu {
      val l = Dedup.minhashKeepers(df, "text", "doc_id", 32, 16, 0.8,
        maxBucket = 64).persist()
      l.count()
      l
    }
    val n = labels.count()
    info(f"minhashKeepers on $N%d docs: $secs%.1f s ($cpuS%.1f cpu-s), $n%d labeled")
    // every exact-dup member is labeled (70% of the corpus at minimum);
    // output is LINEAR — the expanded pair formulation would be ~5e9 rows
    assert(n >= (N * 7) / 10, s"labeled only $n")
    assert(n <= N)
    // all ~14k copies of one template resolve to ONE keeper: collapse +
    // rep-graph labeling must not fracture an exact group
    val perTemplate = df.filter(col("doc_id") % 10 < 7)
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"))
      .groupBy(col("text"))
      .agg(countDistinct(col("keep_id")).as("keepers"), count(lit(1)).as("members"))
      .agg(max(col("keepers")).as("max_keepers"), min(col("members")).as("min_members"),
        count(lit(1)).as("templates"))
      .head()
    assert(perTemplate.getAs[Long]("templates") == 50L)
    assert(perTemplate.getAs[Long]("max_keepers") == 1L,
      "an exact-dup group fractured into multiple keepers")
    assert(perTemplate.getAs[Long]("min_members") >= 10000L,
      "exact-dup members lost their labels")
    labels.unpersist()
    assertBudget("minhashKeepers", secs, cpuS, 90.0, 600.0)
  }

  test("secondary index at 1M rows: cold values are point gets, the hot value falls back") {
    import graft.store.KvStore
    val catalogJson =
      """{"table":{"namespace":"default", "name":"idxscale"},
        |"rowkey":"key",
        |"columns":{
        |"key":{"cf":"rowkey", "col":"key", "type":"bigint"},
        |"owner":{"cf":"f", "col":"o", "type":"string", "index":"true"},
        |"bucket":{"cf":"f", "col":"b", "type":"bigint", "index":"true"},
        |"v":{"cf":"f", "col":"v", "type":"bigint"}}}""".stripMargin
    val (_, loadSecs) = timed {
      spark.range(N).selectExpr("id AS key",
        // one hot value with 500k rows (beyond the consult cap) and 25k
        // cold values with ~20 rows each — the selectivity skew an index
        // must survive
        "CASE WHEN id % 2 = 0 THEN 'hot' ELSE concat('u', CAST(id % 25000 AS STRING)) END AS owner",
        "id % 1000 AS bucket",
        "id * 3 AS v")
        .write.format("graft-kv")
        .options(Map("catalog" -> catalogJson, "newtable" -> "8",
          "minSplitNum" -> "0", "maxSplitNum" -> N.toString, "timestamp" -> "100"))
        .mode("append").save()
    }
    info(f"indexed load of $N%d rows: $loadSecs%.1f s (two hooked indexes)")

    def read = spark.read.format("graft-kv").option("catalog", catalogJson).load()
    val (cold, coldSecs) = timed {
      read.filter(col("owner") === "u7").select("key").collect()
    }
    // ids ≡ 7 (mod 25000) are all odd (25000 is even), so every one of the
    // 40 hits carries owner u7
    assert(cold.length == 40)
    assert(cold.forall(r => r.getLong(0) % 2 == 1 && r.getLong(0) % 25000 == 7))
    info(f"cold-value indexed read: $coldSecs%.2f s for ${cold.length} of $N%d rows")
    assert(coldSecs < 5.0, s"an indexed point lookup must not scan 1M rows: $coldSecs s")

    // the hot value exceeds LookupCap -> consult declines, full scan, still correct
    val (hot, hotSecs) = timed { read.filter(col("owner") === "hot").count() }
    assert(hot == N / 2)
    info(f"hot-value fallback scan: $hotSecs%.2f s for $hot rows")

    // GROUP BY the numeric indexed column: grouped partials stream off the
    // index's sort, reading only the 3 selected buckets of 1M rows
    val (g, gSecs) = timed {
      val grouped = read.filter(col("bucket").isin(1L, 2L, 3L))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n")).orderBy(col("bucket"))
      val rows = grouped.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(grouped.queryExecution.executedPlan.toString.contains("pushedGroupBy=[bucket]"))
      rows
    }
    assert(g == Seq((1L, 1000L), (2L, 1000L), (3L, 1000L)))
    info(f"grouped index-only agg: $gSecs%.2f s for 3 of 1000 buckets")
    assert(gSecs < 5.0, s"a grouped indexed agg must not scan 1M rows: $gSecs s")
    KvStore.drop("default:idxscale")
    KvStore.drop("default:idxscale__idx__owner")
    KvStore.drop("default:idxscale__idx__bucket")
  }

  test("px37 quantizer: nlist ∝ √n keeps within-cluster pair growth sub-quadratic") {
    def embeddings(n: Long): DataFrame = spark.range(n).selectExpr(
      "id AS vec_id",
      "transform(sequence(0, 7), d -> CAST(sin(CAST(id * 31 + d * 17 AS DOUBLE)) AS FLOAT)) AS embedding")
    // the same derivation px37's caller uses (Pipeline.semDedupCentroidsFor)
    def withinPairs(n: Long): (Int, Long) = {
      val e = embeddings(n)
      val nlist = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
      val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", nlist)
      val sizes = e.select(element_at(
          graft.functions.VectorExprs.nearestCentroids(col("embedding"), cents, 1), 1)
          .as("cell"))
        .groupBy("cell").count().collect().map(_.getLong(1))
      (nlist, sizes.map(c => c * (c - 1) / 2).sum)
    }
    val (nl1, p1) = withinPairs(2000)
    val (nl2, p2) = withinPairs(8000)
    assert(nl2 >= 2 * nl1 - 2, s"a 4x corpus must roughly double nlist: $nl1 -> $nl2")
    val ratio = p2.toDouble / math.max(p1, 1L).toDouble
    info(f"within-cluster pairs: n=2000 -> $p1 (nlist=$nl1), n=8000 -> $p2 (nlist=$nl2), ratio $ratio%.1f")
    // a FIXED nlist multiplies within-cluster pairs ~16x for a 4x corpus
    // (cluster sizes scale linearly); √n scaling holds the growth near
    // 4^1.5 = 8x — per-vector comparison work grows √n, not n
    assert(ratio < 12.0,
      s"pair growth $ratio x must stay well under the fixed-nlist 16x")
  }

  test("px37 boundary multi-probe: straddling near-dups recovered, membership growth = boundary population") {
    import spark.implicits._
    // 16 one-hot centroids over 20 dims; 8000 interior vectors firmly in
    // one cell; 50 planted NEAR-DUP PAIRS straddling distinct cell-pair
    // boundaries — each twin's primary cell differs (1.01 vs 1.0 on the
    // two centroid axes), so single-probe cluster-local comparison can
    // NEVER see the pair, while the top-2 similarity gap (~0.007) is well
    // inside the probe epsilon
    val dim = 20
    val cents = Array.tabulate(16) { c =>
      val v = new Array[Double](dim); v(c) = 1.0; v
    }
    val interior = (0 until 8000).map { id =>
      val v = new Array[Double](dim)
      v(id % 16) = 1.0
      v(16 + id % 4) = 0.2 + 0.1 * (id % 5)
      (id.toLong, v.toSeq)
    }
    val twins = (0 until 50).flatMap { k =>
      val c1 = k % 16
      val c2 = (k + 1 + k / 16) % 16 // distinct (c1, c2) combos across pairs
      val a = new Array[Double](dim); a(c1) = 1.01; a(c2) = 1.0
      val b = new Array[Double](dim); b(c1) = 1.0; b(c2) = 1.01
      Seq((10000L + 2 * k, a.toSeq), (10001L + 2 * k, b.toSeq))
    }
    val df = (interior ++ twins).toDF("id", "v")
    val twinIds = twins.map(_._1).toSet
    val oddTwinIds = twinIds.filter(_ % 2 == 1)

    val keptSingle = Similarity.semanticDedup(df, "id", "v", cents, threshold = 0.95)
      .collect().map(_.getLong(0)).toSet
    assert(twinIds.subsetOf(keptSingle),
      "single-probe must MISS every straddling pair (both twins kept) — " +
        "the boundary blind spot multi-probe exists for")

    val keptMulti = Similarity.semanticDedup(df, "id", "v", cents,
      threshold = 0.95, probeEps = 0.02).collect().map(_.getLong(0)).toSet
    assert(keptMulti == keptSingle -- oddTwinIds,
      "multi-probe must drop exactly the higher twin of each straddling " +
        "pair and change nothing else")

    // pair-count growth is bounded by the BOUNDARY population: only the
    // 100 twins earn a second membership; all 8000 interior vectors stay
    // single-membership (their top-2 gap is ~0.3, far above epsilon)
    val memberships = df.select(explode(
        graft.functions.VectorExprs.boundaryProbeCells(col("v"), cents, 0.02)))
      .count()
    assert(memberships == 8100L + 100L,
      s"expected 8200 memberships (n + boundary), got $memberships")
    info(s"recovered ${oddTwinIds.size} straddling dups for " +
      s"${memberships - 8100} extra memberships (${8100} vectors)")
  }

  test("capPerGroup: a 900k-row hot domain ships bounded shuffle records") {
    // 90% of rows in ONE domain — the skew shape per-domain caps exist for
    val skewed = spark.range(N).selectExpr(
      "id AS doc_id",
      "CASE WHEN id % 10 < 9 THEN 'megafarm.example' ELSE concat('site', CAST(id % 997 AS STRING)) END AS source",
      "id % 100000 AS score")
    val shuffleRecords = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) shuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val (rows, secs) = try {
      val (df, s) = timed {
        Sampling.capPerGroup(skewed, "source", "doc_id", col("score"), cap = 10).collect()
      }
      // listener events are async; wait for the counter to go quiet
      var last = -1L
      var spins = 0
      while (shuffleRecords.get() != last && spins < 20) {
        last = shuffleRecords.get(); Thread.sleep(250); spins += 1
      }
      (df, s)
    } finally spark.sparkContext.removeSparkListener(listener)
    info(f"capPerGroup over $N%d rows (90%% one domain): $secs%.1f s, " +
      s"${shuffleRecords.get()} shuffle records")
    // 998 groups × ≤ cap each; the hot domain contributes exactly cap
    assert(rows.count(_.getString(0) == "megafarm.example") == 10)
    assert(rows.length <= 998 * 10)
    // the keeper set for the hot domain is its true top: ids scoring 99999
    // all end in digit 9 (id ≡ 99999 mod 100000) and route to site-groups,
    // so megafarm's true max is 99998 — ties broken by ascending id
    val hot = rows.filter(_.getString(0) == "megafarm.example").sortBy(_.getInt(3))
    assert(hot.forall(_.getLong(2) == 99998L))
    assert(hot.map(_.getLong(1)).toSeq == hot.map(_.getLong(1)).toSeq.sorted)
    // partial aggregation bounds the shuffle to ≤ cap rows per (task, group),
    // NOT one record per input row: with 998 groups, a handful of map tasks,
    // and an aggregate-result row per (task, group), anything near N would
    // mean the partial combine is broken
    assert(shuffleRecords.get() < N / 10,
      s"shuffle carried ${shuffleRecords.get()} records — partial top-k not applied?")
  }

  test("fuzzyDecontamPairs: 1M-doc corpus vs broadcast eval set, contamination found") {
    // evals derived from UNIQUE docs (ids ≡ 9 mod 10): one token appended,
    // so each should link back to exactly its source; plus one eval derived
    // from a boilerplate template, which must link to EVERY copy
    val uniqueEvalIds = (0 until 100).map(i => i.toLong * 10 + 9)
    val eval = corpus
      .filter(col("doc_id").isin(uniqueEvalIds :+ 0L: _*)) // id 0 = template copy
      .selectExpr("doc_id AS eval_id", "concat(text, ' evalq') AS text")
    val (rows, secs, cpuS) = timedCpu {
      Dedup.fuzzyDecontamPairs(corpus, eval, "doc_id", "text", "eval_id", "text")
        .collect()
    }
    info(f"fuzzy decontam of $N%d docs vs ${uniqueEvalIds.size + 1} evals: " +
      f"$secs%.1f s ($cpuS%.1f cpu-s), ${rows.length} pairs")
    // every unique-doc eval linked back to its own source
    uniqueEvalIds.foreach { id =>
      assert(rows.exists(r => r.getLong(0) == id && r.getLong(1) == id),
        s"eval $id did not link back to its source")
    }
    // the boilerplate eval is contaminated across every copy of template 0:
    // ids with id%10<7 and (id DIV 10)%50 == 0 → 1M/10*7/50 = 14k copies
    val hot = rows.count(_.getLong(1) == 0L)
    assert(hot >= 10000, s"boilerplate eval matched only $hot copies")
    assertBudget("fuzzy decontam", secs, cpuS, 90.0, 600.0)
  }

  test("capBuckets at 1M entries in one bucket: capped, spread, drops observed") {
    val entries = spark.range(N).selectExpr("id", "0 AS band", "7L AS bh")
    val (kept, secs, cpuS) = timedCpu {
      val capped = Dedup.capBuckets(entries.toDF(), Seq("band", "bh"), 1000, "stress")
      val k = capped.collect().length.toLong
      val m = capped.queryExecution.observedMetrics.collectFirst {
        case (n, r) if n.startsWith("graft.capBuckets.stress.") => r
      }.getOrElse(fail("no graft.capBuckets.stress.* metric observed"))
      assert(m.getAs[Long]("hot_buckets") == Dedup.CapSalts.toLong)
      assert(m.getAs[Long]("dropped_entries") == N - k)
      k
    }
    info(f"capBuckets on $N%d-entry bucket: $secs%.1f s ($cpuS%.1f cpu-s), kept $kept%d")
    assert(kept <= 1000L && kept > 900L)
    assertBudget("capBuckets", secs, cpuS, 30.0, 150.0)
  }
}
