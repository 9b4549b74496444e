package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.StreamBatch
import graft.store.KvStore

/** Streaming scale proxy: the CDC maintenance protocols'
  * batch-proportionality claim demonstrated at proxy size, not just pinned
  * at toy size. A 100k-row persisted state (near-dup band index / ANN
  * inverted file) absorbs small CDC waves through the EXACT production
  * protocols ([[StreamBatch.maintainNearDupIndex]],
  * [[StreamBatch.maintainAnnIndex]]), and each drain's observed cost —
  * rows the store served ([[KvStore.rowsServed]]) and shuffle records
  * written (task-metrics listener) — must track the WAVE size, never the
  * corpus/index size. Bounds are generous (constant-factor slop for plan
  * re-execution and write repartitioning) but orders of magnitude below
  * corpus scale, so a reintroduced per-batch index scan, mirror scan, or
  * corpus re-tokenize blows them immediately. */
class StreamingScaleProxySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Shuffle records written across every job inside `f` (the listener bus
    * is async — spin until the counter goes quiet). */
  private def measureShuffle[A](f: => A): (A, Long) = {
    val recs = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) { recs.addAndGet(m.shuffleWriteMetrics.recordsWritten); () }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = f
      var last = -1L; var spins = 0
      while (recs.get() != last && spins < 20) {
        last = recs.get(); Thread.sleep(200); spins += 1
      }
      (r, recs.get())
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def tableRows(name: String): Long =
    KvStore.table(name).regions.map(_.rowCount.get()).sum

  test("sv14 protocol at 100k docs: a 500-doc wave's store reads and shuffles track the wave, not the index") {
    val src = StreamBatch.sv14SrcCatalog.replace("\"kv_nd_src\"", "\"kv_nd_src_sxp\"")
    val fwd = StreamBatch.sv14FwdCatalog.replace("\"kv_nd_fwd\"", "\"kv_nd_fwd_sxp\"")
    val idx = StreamBatch.sv14IdxCatalog.replace("\"kv_nd_idx\"", "\"kv_nd_idx_sxp\"")
    val pairs = StreamBatch.sv14PairsCatalog.replace("\"kv_nd_pairs\"", "\"kv_nd_pairs_sxp\"")
    Seq("kv_nd_src_sxp", "kv_nd_fwd_sxp", "kv_nd_idx_sxp", "kv_nd_pairs_sxp")
      .foreach(t => KvStore.drop(s"default:$t"))
    val N = 100000L; val W = 500L
    val maxId = N + 2 * W
    // six tokens per doc, all derived from the seed id — cross-doc token
    // overlap ~0, so LSH buckets hold only genuine copies (shared static
    // tokens would make every band bucket corpus-sized and the self-join
    // quadratic — the exact pathology the protocol must not have)
    def textOf(seed: Column): Column = concat_ws(" ",
      (1 to 6).map(k => concat(lit("w"), xxhash64(seed.cast("string"), lit(k)))): _*)
    def writeSrc(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> src, "newtable" -> "4",
          "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    // pre-create mirror/index/pairs (the first batch reads them) — the
    // same empty-table bootstrap sv14StreamIncrNeardup performs
    def kvInit(df: DataFrame, cat: String, numeric: Boolean): Unit = {
      val splits =
        if (numeric) Map("minSplitNum" -> "0", "maxSplitNum" -> maxId.toString)
        else Map("minSplit" -> "0", "maxSplit" -> "z")
      df.write.format("graft-kv")
        .options(Map("catalog" -> cat, "newtable" -> "4", "timestamp" -> "1") ++ splits)
        .mode("append").save()
    }
    kvInit(spark.range(0).select(col("id").as("doc_id"),
      lit("").as("text")), fwd, numeric = true)
    kvInit(spark.range(0).select(lit("").as("ik"), lit(0).as("band"),
      lit(0L).as("bh"), lit(0L).as("doc_id")), idx, numeric = false)
    kvInit(spark.range(0).select(lit("").as("pk"), lit(0L).as("id_a"),
      lit(0L).as("id_b"), lit(0.0d).as("jaccard")), pairs, numeric = false)
    val ckpt = Files.createTempDirectory("graft-sxp14-ckpt").toString
    def drain(): Unit =
      StreamBatch.maintainNearDupIndex(spark, src, fwd, idx, pairs, maxId, ckpt)

    // wave 1: the 100k-doc corpus (unique texts) builds the persisted state
    writeSrc(spark.range(N).select(col("id").as("doc_id"),
      textOf(col("id")).as("text")), ts = 1000, overwrite = true)
    val (_, shuf1) = measureShuffle(drain())
    val idxRows = tableRows("default:kv_nd_idx_sxp")
    val fwdRows = tableRows("default:kv_nd_fwd_sxp")
    assert(fwdRows == N)
    assert(idxRows >= 15L * N, s"index must hold ~16 band entries per doc, got $idxRows")

    // wave 2: 500 new docs, the first 100 exact copies of corpus docs 0..99
    // (their pairs must be found via index slivers + mirror point-gets)
    writeSrc(spark.range(W).select((col("id") + N).as("doc_id"),
      textOf(when(col("id") < 100, col("id")).otherwise(col("id") + N)).as("text")),
      ts = 2000, overwrite = false)
    val base2 = KvStore.rowsServed
    val (_, shuf2) = measureShuffle(drain())
    val served2 = KvStore.rowsServed - base2
    info(s"wave2: served=$served2 shuffle=$shuf2 (index=$idxRows, wave1 shuffle=$shuf1)")
    assert(served2 < 30000L,
      s"wave-2 drain served $served2 store rows for a $W-doc wave — " +
        "a per-batch index or mirror scan crept back in")
    assert(served2 * 50 < idxRows + fwdRows,
      s"wave-2 reads ($served2) must be orders below state size (${idxRows + fwdRows})")
    assert(shuf2 < 300000L && shuf2 * 10 < shuf1,
      s"wave-2 shuffled $shuf2 records (wave-1: $shuf1) — batch work is not wave-proportional")

    // wave 3 (drift check — the state grew, the bound must not): copies of
    // corpus docs 200..299, disjoint from wave 2's
    writeSrc(spark.range(W).select((col("id") + N + W).as("doc_id"),
      textOf(when(col("id") < 100, col("id") + 200).otherwise(col("id") + N + W)).as("text")),
      ts = 3000, overwrite = false)
    val base3 = KvStore.rowsServed
    val (_, shuf3) = measureShuffle(drain())
    val served3 = KvStore.rowsServed - base3
    info(s"wave3: served=$served3 shuffle=$shuf3")
    assert(served3 < 30000L && shuf3 < 300000L,
      s"wave-3 cost grew past the wave bound (served=$served3, shuffle=$shuf3)")

    // correctness spot-check: the incremental drains discovered exactly the
    // cross-wave copy pairs
    val got = spark.read.format("graft-kv").option("catalog", pairs).load()
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 100).foreach { i =>
      assert(got.contains((i.toLong, N + i)), s"missing wave-2 pair ($i, ${N + i})")
      assert(got.contains((200L + i, N + W + i)), s"missing wave-3 pair (${200 + i}, ${N + W + i})")
    }
    assert(got.size == 200, s"expected exactly the 200 copy pairs, got ${got.size}")
    Seq("kv_nd_src_sxp", "kv_nd_fwd_sxp", "kv_nd_idx_sxp", "kv_nd_pairs_sxp")
      .foreach(t => KvStore.drop(s"default:$t"))
  }

  test("sv18 ANN maintenance at 100k vectors: a 500-vector update wave point-reads only its touched rows") {
    val src = StreamBatch.sv18SrcCatalog.replace("\"kv_ann_src\"", "\"kv_ann_src_sxp\"")
    val fwd = StreamBatch.sv18FwdCatalog.replace("\"kv_ann_fwd\"", "\"kv_ann_fwd_sxp\"")
    val idx = StreamBatch.sv18IdxCatalog.replace("\"kv_ann_idx\"", "\"kv_ann_idx_sxp\"")
    val avro = StreamBatch.sv18AvroVec
    Seq("kv_ann_src_sxp", "kv_ann_fwd_sxp", "kv_ann_idx_sxp")
      .foreach(t => KvStore.drop(s"default:$t"))
    val N = 100000L; val W = 500L
    // 16 coarse cells on a 4×4 grid over the first two coordinates
    val cents: Array[Array[Double]] =
      (0 until 16).map(c => Array((c % 4).toDouble, (c / 4).toDouble, 0.0, 0.0)).toArray
    def vecOf(id: Column, shift: Double): Column = array(
      ((id % 4) + lit(shift)).cast("float"),
      (floor(id / 4) % 4).cast("float"),
      ((id % 7) * lit(0.01)).cast("float"),
      lit(0.0f))
    def writeSrc(df: DataFrame, ts: Long): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> src, "annVec" -> avro, "newtable" -> "4",
          "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> N.toString))
        .mode("append").save()
    val ckpt = Files.createTempDirectory("graft-sxp18-ckpt").toString
    def drain(stamp: Long): Unit =
      StreamBatch.maintainAnnIndex(spark, src, fwd, idx, cents, N, ckpt, stamp)

    // wave 1: the 100k-vector corpus builds mirror + inverted file
    writeSrc(spark.range(N).select(col("id").as("vec_id"),
      vecOf(col("id"), 0.0).as("embedding")), ts = 1000)
    drain(stamp = 10)
    assert(tableRows("default:kv_ann_fwd_sxp") == N)
    assert(tableRows("default:kv_ann_idx_sxp") == N,
      "one inverted-file entry per live vector")

    // wave 2: 500 spread-out vectors UPDATE (moved to a different cell) —
    // retirement must point-read exactly the touched mirror rows
    writeSrc(spark.range(W).select((col("id") * 200 + 3).as("vec_id"),
      vecOf(col("id") * 200 + 3, 2.0).as("embedding")), ts = 2000)
    val base2 = KvStore.rowsServed
    val (_, shuf2) = measureShuffle(drain(stamp = 20))
    val served2 = KvStore.rowsServed - base2
    info(s"wave2: served=$served2 shuffle=$shuf2")
    assert(served2 < 10000L,
      s"update wave served $served2 rows for $W changed vectors — " +
        "retirement is reading corpus-scale state")
    assert(served2 * 50 < 2 * N, "wave reads must be orders below mirror+index size")
    assert(tableRows("default:kv_ann_idx_sxp") == N,
      "updates must RE-KEY entries (retire old cell, insert new), not duplicate them")
    assert(tableRows("default:kv_ann_fwd_sxp") == N)

    // wave 3: a 200-id tombstone wave retires mirror + index entries
    import spark.implicits._
    (0L until 200L).map(_ * 400 + 7).toDF("vec_id").write.format("graft-kv")
      .options(Map("catalog" -> src, "annVec" -> avro,
        "delete" -> "true", "timestamp" -> "3000"))
      .mode("append").save()
    val base3 = KvStore.rowsServed
    drain(stamp = 30)
    val served3 = KvStore.rowsServed - base3
    info(s"wave3: served=$served3")
    assert(served3 < 10000L, s"tombstone wave served $served3 rows for 200 deletes")
    assert(tableRows("default:kv_ann_idx_sxp") == N - 200)
    assert(tableRows("default:kv_ann_fwd_sxp") == N - 200)
    Seq("kv_ann_src_sxp", "kv_ann_fwd_sxp", "kv_ann_idx_sxp")
      .foreach(t => KvStore.drop(s"default:$t"))
  }

  test("sv19 decontamination at a 100k-pair mirror: a 500-doc wave touches only its slivers") {
    val src = StreamBatch.sv19SrcCatalog.replace("\"kv_ctm_src\"", "\"kv_ctm_src_sxp\"")
    val mir = StreamBatch.sv19MirCatalog.replace("\"kv_ctm_mirror\"", "\"kv_ctm_mirror_sxp\"")
    Seq("kv_ctm_src_sxp", "kv_ctm_mirror_sxp").foreach(t => KvStore.drop(s"default:$t"))
    val N = 100000L; val W = 500L; val E = 200L
    // eval docs: five distinct tokens derived from the eval id — a
    // contaminated train doc carries exactly its eval doc's one 5-gram
    def evalText(id: Column): Column = concat_ws(" ",
      (1 to 5).map(k => concat(lit("e"), id, lit("t"), lit(k))): _*)
    // clean text: six tokens unique to the doc id (zero eval overlap)
    def cleanText(seed: Column): Column = concat_ws(" ",
      (1 to 6).map(k => concat(lit("w"), xxhash64(seed.cast("string"), lit(k)))): _*)
    val evalDocs = spark.range(E).select(col("id").as("doc_id"),
      evalText(col("id")).as("text"))
    val evalG = StreamBatch.contamEvalGrams(evalDocs, 5)
    def writeSrc(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> src, "newtable" -> "4",
          "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> N.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    val ckpt = Files.createTempDirectory("graft-sxp19-ckpt").toString
    def drain(stamp: Long): Unit =
      StreamBatch.maintainContamMirror(spark, src, mir, evalG, N, ckpt, stamp)
    try {
      // wave 1: 100k train docs, every one contaminated with eval (id % E)
      // — the mirror lands at 100k pairs, well past the small-state gate
      writeSrc(spark.range(N).select(col("id").as("doc_id"),
        evalText(col("id") % E).as("text")), ts = 1000, overwrite = true)
      val (_, shuf1) = measureShuffle(drain(stamp = 10))
      assert(tableRows("default:kv_ctm_mirror_sxp") == N,
        "every corpus doc must pair with its eval doc")

      // wave 2: 500 spread-out docs are REWRITTEN clean — retirement must
      // read only their 500 key slivers, never the 100k-pair mirror, and
      // the eval side must not re-tokenize (it is pre-exploded)
      writeSrc(spark.range(W).select((col("id") * 200 + 3).as("doc_id"))
        .withColumn("text", cleanText(col("doc_id"))), ts = 2000, overwrite = false)
      val base2 = KvStore.rowsServed
      val (_, shuf2) = measureShuffle(drain(stamp = 20))
      val served2 = KvStore.rowsServed - base2
      info(s"wave2: served=$served2 shuffle=$shuf2 (wave1 shuffle=$shuf1)")
      assert(served2 < 30000L,
        s"wave-2 drain served $served2 store rows for a $W-doc wave — " +
          "a per-batch mirror scan or eval re-read crept back in")
      assert(shuf2 * 10 < shuf1,
        s"wave-2 shuffled $shuf2 records (wave-1: $shuf1) — work is not wave-proportional")
      assert(tableRows("default:kv_ctm_mirror_sxp") == N - W,
        "the cleaned docs' pairs must be retired, all others untouched")
    } finally {
      evalG.unpersist()
      Seq("kv_ctm_src_sxp", "kv_ctm_mirror_sxp").foreach(t => KvStore.drop(s"default:$t"))
    }
  }

  test("sv20 PQ code maintenance at 100k vectors: a CDC wave never reads the code table") {
    val src = StreamBatch.sv20SrcCatalog.replace("\"kv_pq_src\"", "\"kv_pq_src_sxp\"")
    val codes = StreamBatch.sv20CodesCatalog.replace("\"kv_pq_codes\"", "\"kv_pq_codes_sxp\"")
    Seq("kv_pq_src_sxp", "kv_pq_codes_sxp").foreach(t => KvStore.drop(s"default:$t"))
    val N = 100000L
    // 2 sub-quantizers x 4 centroids over a 4-dim space
    val books: Array[Array[Array[Double]]] = Array(
      (0 until 4).map(c => Array(c.toDouble, 0.0)).toArray,
      (0 until 4).map(c => Array(0.0, c.toDouble)).toArray)
    def vecOf(id: Column, shift: Double): Column = array(
      ((id % 4) + lit(shift)).cast("float"), (floor(id / 4) % 4).cast("float"),
      ((id % 3) + lit(shift)).cast("float"), (floor(id / 3) % 4).cast("float"))
    def writeSrc(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> src, "annVec" -> StreamBatch.sv18AvroVec,
          "newtable" -> "4", "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> N.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    val ckpt = Files.createTempDirectory("graft-sxp20-ckpt").toString
    def drain(stamp: Long): Unit =
      StreamBatch.maintainPqCodes(spark, src, codes, books, N, ckpt, stamp)

    // wave 1: 100k vectors encode into the code table
    writeSrc(spark.range(N).select(col("id").as("vec_id"),
      vecOf(col("id"), 0.0).as("embedding")), ts = 1000, overwrite = true)
    drain(stamp = 10)
    assert(tableRows("default:kv_pq_codes_sxp") == N)

    // wave 2: 300 updates + 200 tombstones. The protocol is MAP-ONLY —
    // the only store rows served may be the CDC source read of the wave
    // itself; the 100k-row code table must never be read
    writeSrc(spark.range(300L).select((col("id") * 300 + 1).as("vec_id"),
      vecOf(col("id") * 300 + 1, 1.0).as("embedding")), ts = 2000, overwrite = false)
    import spark.implicits._
    (0L until 200L).map(_ * 450 + 2).toDF("vec_id").write.format("graft-kv")
      .options(Map("catalog" -> src, "annVec" -> StreamBatch.sv18AvroVec,
        "delete" -> "true", "timestamp" -> "2500"))
      .mode("append").save()
    val base2 = KvStore.rowsServed
    val (_, shuf2) = measureShuffle(drain(stamp = 20))
    val served2 = KvStore.rowsServed - base2
    info(s"wave2: served=$served2 shuffle=$shuf2")
    assert(served2 < 5000L,
      s"wave-2 drain served $served2 store rows for a 500-row wave — " +
        "the map-only protocol must read nothing but the CDC wave itself")
    assert(tableRows("default:kv_pq_codes_sxp") == N - 200,
      "tombstoned ids must die; updates must overwrite in place")
    Seq("kv_pq_src_sxp", "kv_pq_codes_sxp").foreach(t => KvStore.drop(s"default:$t"))
  }

  test("sv21 bigram maintenance at 100k docs (500k counts): a 400-doc wave point-reads only its grams") {
    val src = StreamBatch.sv21SrcCatalog.replace("\"kv_lm_src\"", "\"kv_lm_src_sxp\"")
    val mir = StreamBatch.sv21MirrorCatalog.replace("\"kv_lm_mirror\"", "\"kv_lm_mirror_sxp\"")
    val cnt = StreamBatch.sv21CountsCatalog.replace("\"kv_lm_counts\"", "\"kv_lm_counts_sxp\"")
    Seq("kv_lm_src_sxp", "kv_lm_mirror_sxp", "kv_lm_counts_sxp")
      .foreach(t => KvStore.drop(s"default:$t"))
    val N = 100000L; val W = 400L
    val maxId = N + 2 * W
    // six tokens per doc, all derived from the seed — every doc's 5 bigrams
    // are globally unique, so the counts table is exactly 5 rows per live
    // doc and every arithmetic invariant below is exact
    def textOf(seed: Column): Column = concat_ws(" ",
      (1 to 6).map(k => concat(lit("w"), xxhash64(seed.cast("string"), lit(k)))): _*)
    def writeSrc(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> src, "newtable" -> "4",
          "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    // the empty-table bootstrap sv21StreamBigramLm performs
    spark.range(0).select(col("id").as("doc_id"), lit("").as("text"))
      .write.format("graft-kv")
      .options(Map("catalog" -> mir, "newtable" -> "4", "maxVersions" -> "2",
        "timestamp" -> "1",
        "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
      .mode("append").save()
    spark.range(0).select(lit("").as("gram"), lit("").as("w1"),
        lit("").as("w2"), lit(0L).as("cnt"))
      .write.format("graft-kv")
      .options(Map("catalog" -> cnt, "newtable" -> "4", "maxVersions" -> "2",
        "timestamp" -> "1",
        "minSplit" -> "0", "maxSplit" -> "z"))
      .mode("append").save()
    val ckpt = Files.createTempDirectory("graft-sxp21-ckpt").toString
    def drain(): Unit = {
      StreamBatch.maintainBigramCounts(spark, src, mir, cnt, maxId, ckpt); ()
    }

    // wave 1: the 100k-doc corpus builds the 500k-gram count state
    writeSrc(spark.range(N).select(col("id").as("doc_id"),
      textOf(col("id")).as("text")), ts = 1000, overwrite = true)
    val (_, shuf1) = measureShuffle(drain())
    val cntRows = tableRows("default:kv_lm_counts_sxp")
    assert(cntRows == 5L * N, s"expected 5 unique bigrams per doc, got $cntRows")
    assert(tableRows("default:kv_lm_mirror_sxp") == N)

    // wave 2: 200 text UPDATES (old grams must decrement to zero and die,
    // new grams insert) + 200 new docs. Reads allowed: the CDC wave, the
    // 200 touched mirror rows, and the affected grams' current counts
    // (≤ 2000 live rows) — never the 500k-row count table or 100k mirror
    writeSrc(spark.range(200L).select((col("id") * 450).as("doc_id"),
      textOf(col("id") * 450 + 7000000).as("text")), ts = 2000, overwrite = false)
    writeSrc(spark.range(200L).select((col("id") + N).as("doc_id"),
      textOf(col("id") + N).as("text")), ts = 2100, overwrite = false)
    val base2 = KvStore.rowsServed
    val (_, shuf2) = measureShuffle(drain())
    val served2 = KvStore.rowsServed - base2
    info(s"wave2: served=$served2 shuffle=$shuf2 (counts=$cntRows, wave1 shuffle=$shuf1)")
    assert(served2 < 20000L,
      s"wave-2 drain served $served2 store rows for a $W-doc wave — " +
        "a counts or mirror scan crept back in")
    assert(served2 * 50 < cntRows + N,
      s"wave-2 reads ($served2) must be orders below state size (${cntRows + N})")
    assert(shuf2 < 200000L && shuf2 * 10 < shuf1,
      s"wave-2 shuffled $shuf2 records (wave-1: $shuf1) — batch work is not wave-proportional")
    def liveCounts(): Long = spark.read.format("graft-kv")
      .option("catalog", cnt).load().filter(col("cnt") > 0).count()
    assert(liveCounts() == 5L * N + 1000,
      "updates must be count-neutral (old grams to zero, new grams born); 200 new docs add 1000")
    assert(tableRows("default:kv_lm_counts_sxp") == 5L * N + 2000,
      "updated docs' old grams stay as logical-zero rows until compaction")
    assert(tableRows("default:kv_lm_mirror_sxp") == N + 200)

    // wave 3: 100 tombstones — a decrement-only wave; the zero-crossing
    // grams must die by key with the same wave-proportional cost
    import spark.implicits._
    (0L until 100L).map(_ * 450 + 1).toDF("doc_id").write.format("graft-kv")
      .options(Map("catalog" -> src, "delete" -> "true", "timestamp" -> "3000"))
      .mode("append").save()
    val base3 = KvStore.rowsServed
    val (_, shuf3) = measureShuffle(drain())
    val served3 = KvStore.rowsServed - base3
    info(s"wave3: served=$served3 shuffle=$shuf3")
    assert(served3 < 10000L && shuf3 < 100000L,
      s"tombstone wave cost grew past the wave bound (served=$served3, shuffle=$shuf3)")
    assert(liveCounts() == 5L * N + 1000 - 500,
      "each tombstoned doc's 5 unique grams must zero-cross to logical death")
    assert(tableRows("default:kv_lm_mirror_sxp") == N + 200,
      "tombstoned docs stay as empty-text mirror rows until compaction")
    Seq("kv_lm_src_sxp", "kv_lm_mirror_sxp", "kv_lm_counts_sxp")
      .foreach(t => KvStore.drop(s"default:$t"))
  }

  test("sv22 manifest maintenance at 100k docs: a 500-doc wave reads only the wave + the constant counter table") {
    val src = StreamBatch.sv22SrcCatalog.replace("\"kv_sh_src\"", "\"kv_sh_src_sxp\"")
    val man = StreamBatch.sv22ManifestCatalog.replace("\"kv_sh_manifest\"", "\"kv_sh_manifest_sxp\"")
    val ctr = StreamBatch.sv22CountersCatalog.replace("\"kv_sh_counters\"", "\"kv_sh_counters_sxp\"")
    Seq("kv_sh_src_sxp", "kv_sh_manifest_sxp", "kv_sh_counters_sxp")
      .foreach(t => KvStore.drop(s"default:$t"))
    val shards = 16
    val N = 100000L; val W = 500L
    val maxId = N + 2 * W
    def writeSrc(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> src, "newtable" -> "4",
          "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    // the empty-table bootstrap sv22StreamShardManifest performs
    spark.range(0).select(col("id").as("doc_id"), col("id").as("skey"),
        lit(0).as("shard"), col("id").as("pos"))
      .write.format("graft-kv")
      .options(Map("catalog" -> man, "newtable" -> "4", "timestamp" -> "1",
        "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
      .mode("append").save()
    spark.range(0).select(col("id").cast("int").as("shard"), col("id").as("n"))
      .write.format("graft-kv")
      .options(Map("catalog" -> ctr, "newtable" -> "4", "maxVersions" -> "2",
        "timestamp" -> "1", "minSplitNum" -> "0",
        "maxSplitNum" -> (shards - 1).toString))
      .mode("append").save()
    val ckpt = Files.createTempDirectory("graft-sxp22-ckpt").toString
    def drain(): Unit = {
      StreamBatch.maintainShardManifest(spark, src, man, ctr, shards, maxId,
        ckpt); ()
    }
    def manifest(): DataFrame = spark.read.format("graft-kv")
      .option("catalog", man).load()
      .select(col("doc_id"), col("shard"), col("pos"))

    // wave 1: the 100k-doc corpus builds the manifest
    writeSrc(spark.range(N).select(col("id").as("doc_id"),
      lit("t").as("text")), ts = 1000, overwrite = true)
    val (_, shuf1) = measureShuffle(drain())
    assert(tableRows("default:kv_sh_manifest_sxp") == N)
    // the counter table is CONSTANT-size at any corpus scale — that is
    // what the per-batch whole-read-and-broadcast rests on
    assert(tableRows("default:kv_sh_counters_sxp") == shards.toLong,
      "counter table must hold exactly one row per shard")

    // snapshot some never-again-touched docs' positions before wave 2
    val stableIds = Seq(1L, 3L, 7L, 99L, 54321L)
    val before = manifest().filter(col("doc_id").isin(stableIds: _*))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap

    // wave 2: 300 updates (retire + re-append at the tail) + 200 new docs.
    // Reads allowed: the CDC wave and the `shards`-row counter table —
    // NEVER the 100k-row manifest (the protocol writes it blind)
    writeSrc(spark.range(300L).select((col("id") * 300).as("doc_id"),
      lit("u").as("text")), ts = 2000, overwrite = false)
    writeSrc(spark.range(200L).select((col("id") + N).as("doc_id"),
      lit("n").as("text")), ts = 2100, overwrite = false)
    val base2 = KvStore.rowsServed
    val (_, shuf2) = measureShuffle(drain())
    val served2 = KvStore.rowsServed - base2
    info(s"wave2: served=$served2 shuffle=$shuf2 (wave1 shuffle=$shuf1)")
    assert(served2 < 5000L,
      s"wave-2 drain served $served2 store rows for a $W-doc wave — " +
        "a manifest scan crept back in (the protocol must never read it)")
    assert(shuf2 < 20000L && shuf2 * 10 < shuf1,
      s"wave-2 shuffled $shuf2 records (wave-1: $shuf1) — batch work is not wave-proportional")
    assert(tableRows("default:kv_sh_manifest_sxp") == N + 200)
    assert(tableRows("default:kv_sh_counters_sxp") == shards.toLong)

    // STABILITY: untouched docs keep their exact (shard, pos); updated
    // docs re-appended ABOVE their shard's wave-1 high-water
    val after = manifest().filter(col("doc_id").isin(stableIds: _*))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(after == before, s"survivor positions moved: $before -> $after")
    // the update wave covered ids 0, 300, ..., 89700 — multiples of 300
    // at or above 300*300 were NEVER touched and legitimately keep wave-1
    // positions (the first draft of this filter included them and
    // "found" 34 spliced docs that were simply untouched)
    val updated = col("doc_id") % 300 === 0 && col("doc_id") < 300L * 300
    val hw1 = manifest().filter(col("doc_id") < N && !updated)
      .groupBy(col("shard")).agg(max(col("pos")).as("hw"))
    val moved = manifest().filter(updated)
      .join(hw1, Seq("shard"))
      .filter(col("pos") <= col("hw")).count()
    assert(moved == 0L, "updated docs must re-append above the shard tail, never splice")
    Seq("kv_sh_src_sxp", "kv_sh_manifest_sxp", "kv_sh_counters_sxp")
      .foreach(t => KvStore.drop(s"default:$t"))
  }

  test("sv22 capped catch-up: a backlog drains in admission-sized batches with collision-free positions") {
    // THE multi-batch scenario a restarted maintainer faces at scale: a
    // backlog accumulated over many stamp generations, drained under a
    // maxRowsPerBatch budget — several micro-batches in ONE AvailableNow
    // run. Each batch's counter read (as-of its own batchId-derived stamp)
    // must see the PREVIOUS batch's advance; with the old fixed per-drain
    // stamp every batch read pre-drain counters and positions collided.
    val src = StreamBatch.sv22SrcCatalog.replace("\"kv_sh_src\"", "\"kv_sh_src_ccu\"")
    val man = StreamBatch.sv22ManifestCatalog.replace("\"kv_sh_manifest\"", "\"kv_sh_manifest_ccu\"")
    val ctr = StreamBatch.sv22CountersCatalog.replace("\"kv_sh_counters\"", "\"kv_sh_counters_ccu\"")
    Seq("kv_sh_src_ccu", "kv_sh_manifest_ccu", "kv_sh_counters_ccu")
      .foreach(t => KvStore.drop(s"default:$t"))
    val shards = 16
    val N = 50000L
    spark.range(0).select(col("id").as("doc_id"), col("id").as("skey"),
        lit(0).as("shard"), col("id").as("pos"))
      .write.format("graft-kv")
      .options(Map("catalog" -> man, "newtable" -> "4", "timestamp" -> "1",
        "minSplitNum" -> "0", "maxSplitNum" -> N.toString))
      .mode("append").save()
    spark.range(0).select(col("id").cast("int").as("shard"), col("id").as("n"))
      .write.format("graft-kv")
      .options(Map("catalog" -> ctr, "newtable" -> "4", "maxVersions" -> "2",
        "timestamp" -> "1", "minSplitNum" -> "0",
        "maxSplitNum" -> (shards - 1).toString))
      .mode("append").save()
    // the backlog: 10 stamp generations of 5k docs each (admission cuts at
    // stamp granularity, so the budget below yields ~5 batches)
    (0 until 10).foreach { g =>
      spark.range(g * 5000L, (g + 1) * 5000L)
        .select(col("id").as("doc_id"), lit("t").as("text"))
        .write.format("graft-kv")
        .options(Map("catalog" -> src, "newtable" -> "4",
          "timestamp" -> (1000 + g).toString,
          "minSplitNum" -> "0", "maxSplitNum" -> N.toString))
        .mode(if (g == 0) "overwrite" else "append").save()
    }
    val ckpt = Files.createTempDirectory("graft-ccu22-ckpt").toString
    val lastWrite = StreamBatch.maintainShardManifest(spark, src, man, ctr,
      shards, N, ckpt, maxRowsPerBatch = Some(12000L))
    // several batches ran: the last write stamp is (batchId+1)*10 + 1, so
    // > 21 proves at least three micro-batches drained the backlog
    assert(lastWrite > 21L,
      s"expected a multi-batch drain, last write stamp $lastWrite says otherwise")
    val out = spark.read.format("graft-kv").option("catalog", man).load()
      .select(col("doc_id"), col("shard"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.length == N, s"manifest must hold every backlog doc, got ${out.length}")
    // the collision check: NO deletes ran, so each shard's positions must
    // be EXACTLY 1..count — any cross-batch counter miss leaves duplicates
    // and holes here
    out.groupBy(_._2).foreach { case (sh, rows) =>
      val ps = rows.map(_._3).sorted.toSeq
      assert(ps == (1L to rows.length.toLong).toSeq,
        s"shard $sh positions are not contiguous 1..${rows.length} — " +
          "a batch read stale counters")
    }
    // counters converge to the per-shard high-water
    val ctrs = spark.read.format("graft-kv").option("catalog", ctr).load()
      .collect().map(r => r.getAs[Int]("shard") -> r.getAs[Long]("n")).toMap
    out.groupBy(_._2).foreach { case (sh, rows) =>
      assert(ctrs(sh) == rows.length.toLong,
        s"shard $sh counter ${ctrs(sh)} != ${rows.length}")
    }
    Seq("kv_sh_src_ccu", "kv_sh_manifest_ccu", "kv_sh_counters_ccu")
      .foreach(t => KvStore.drop(s"default:$t"))
  }

  test("sv21 capped catch-up: a gram shared across batches ACCUMULATES through the chunked drain") {
    // the sv21 multi-batch hazard: two docs in DIFFERENT micro-batches of
    // one capped drain share a bigram. Batch b+1's count read (as-of its
    // own batchId-derived stamp) must see batch b's write, so the shared
    // gram accumulates 1-per-doc across the whole backlog. Under the old
    // fixed per-drain stamp, every batch read the PRE-DRAIN count (zero)
    // and overwrote its predecessor — the final count collapsed to the
    // last batch's contribution alone.
    val src = StreamBatch.sv21SrcCatalog.replace("\"kv_lm_src\"", "\"kv_lm_src_ccu\"")
    val mir = StreamBatch.sv21MirrorCatalog.replace("\"kv_lm_mirror\"", "\"kv_lm_mirror_ccu\"")
    val cnt = StreamBatch.sv21CountsCatalog.replace("\"kv_lm_counts\"", "\"kv_lm_counts_ccu\"")
    Seq("kv_lm_src_ccu", "kv_lm_mirror_ccu", "kv_lm_counts_ccu")
      .foreach(t => KvStore.drop(s"default:$t"))
    val N = 50000L
    // "zz qq" is shared by EVERY doc; the remaining tokens are seed-unique
    // (so only the one shared gram crosses batch boundaries)
    def textOf(seed: Column): Column = concat(lit("zz qq "), concat_ws(" ",
      (1 to 4).map(k => concat(lit("w"), xxhash64(seed.cast("string"), lit(k)))): _*))
    spark.range(0).select(col("id").as("doc_id"), lit("").as("text"))
      .write.format("graft-kv")
      .options(Map("catalog" -> mir, "newtable" -> "4", "maxVersions" -> "2",
        "timestamp" -> "1", "minSplitNum" -> "0", "maxSplitNum" -> N.toString))
      .mode("append").save()
    spark.range(0).select(lit("").as("gram"), lit("").as("w1"),
        lit("").as("w2"), lit(0L).as("cnt"))
      .write.format("graft-kv")
      .options(Map("catalog" -> cnt, "newtable" -> "4", "maxVersions" -> "2",
        "timestamp" -> "1", "minSplit" -> "0", "maxSplit" -> "z"))
      .mode("append").save()
    // the backlog: 10 stamp generations of 5k docs each
    (0 until 10).foreach { g =>
      spark.range(g * 5000L, (g + 1) * 5000L)
        .select(col("id").as("doc_id"), textOf(col("id")).as("text"))
        .write.format("graft-kv")
        .options(Map("catalog" -> src, "newtable" -> "4",
          "timestamp" -> (1000 + g).toString,
          "minSplitNum" -> "0", "maxSplitNum" -> N.toString))
        .mode(if (g == 0) "overwrite" else "append").save()
    }
    val ckpt = Files.createTempDirectory("graft-ccu21-ckpt").toString
    val lastWrite = StreamBatch.maintainBigramCounts(spark, src, mir, cnt,
      N, ckpt, maxRowsPerBatch = Some(12000L))
    assert(lastWrite > 21L,
      s"expected a multi-batch drain, last write stamp $lastWrite says otherwise")
    val shared = spark.read.format("graft-kv").option("catalog", cnt).load()
      .filter(col("gram") === "zz qq").select(col("cnt"))
      .collect().map(_.getLong(0)).toSeq
    assert(shared == Seq(N),
      s"the shared gram must accumulate one count per doc across ALL batches " +
        s"of the chunked drain, got $shared (a per-drain count collapses to " +
        "the last batch's contribution)")
    // every doc's 5 grams: "zz qq" + "qq w1" + 3 unique pairs — total rows
    // = 1 shared + 4N doc-unique, all live
    val total = spark.read.format("graft-kv").option("catalog", cnt).load()
      .filter(col("cnt") > 0).count()
    assert(total == 4L * N + 1, s"expected ${4L * N + 1} live grams, got $total")
    Seq("kv_lm_src_ccu", "kv_lm_mirror_ccu", "kv_lm_counts_ccu")
      .foreach(t => KvStore.drop(s"default:$t"))
  }

  test("sv23/sv24 join-view + rollup maintenance at 100k orders: each delta direction reads slivers, never the view or fact table") {
    // the IVM proportionality claim, both directions: an orders wave reads
    // the wave's mirror point-gets + the (dimension-sized) customer
    // mirror; a customer wave reads ONLY its custkeys' view PREFIX
    // slivers — never the 100k-row view, never the orders
    val ordCat = StreamBatch.sv23OrdSrcCatalog
      .replace("\"kv_jv_ord_src\"", "\"kv_jv_ord_src_sxp\"")
    val custCat = StreamBatch.sv23CustSrcCatalog
      .replace("\"kv_jv_cust_src\"", "\"kv_jv_cust_src_sxp\"")
    val ordMir = StreamBatch.sv23OrdMirrorCatalog
      .replace("\"kv_jv_ord_mirror\"", "\"kv_jv_ord_mirror_sxp\"")
    val custMir = StreamBatch.sv23CustMirrorCatalog
      .replace("\"kv_jv_cust_mirror\"", "\"kv_jv_cust_mirror_sxp\"")
    val viewCat = StreamBatch.sv23ViewCatalog
      .replace("\"kv_jv_view\"", "\"kv_jv_view_sxp\"")
    val aggCat = StreamBatch.sv24AggCatalog
      .replace("\"kv_jv_agg\"", "\"kv_jv_agg_sxp\"")
    val tables = Seq("kv_jv_ord_src_sxp", "kv_jv_cust_src_sxp",
      "kv_jv_ord_mirror_sxp", "kv_jv_cust_mirror_sxp", "kv_jv_view_sxp",
      "kv_jv_agg_sxp")
    tables.foreach(t => KvStore.drop(s"default:$t"))
    val N = 100000L   // orders
    val C = 1000L     // customers (dimension)
    val W = 500L      // orders wave
    val WC = 20L      // customer wave
    def writeOrd(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> ordCat, "newtable" -> "4",
          "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> N.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    def writeCust(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> custCat, "newtable" -> "4",
          "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> C.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    // bootstrap the three state tables
    spark.range(0).select(col("id").as("o_orderkey"), col("id").as("o_custkey"))
      .write.format("graft-kv")
      .options(Map("catalog" -> ordMir, "newtable" -> "4", "maxVersions" -> "2",
        "timestamp" -> "1", "minSplitNum" -> "0", "maxSplitNum" -> N.toString))
      .mode("append").save()
    spark.range(0).select(col("id").as("c_custkey"), lit("").as("seg"))
      .write.format("graft-kv")
      .options(Map("catalog" -> custMir, "newtable" -> "4", "maxVersions" -> "2",
        "timestamp" -> "1", "minSplitNum" -> "0", "maxSplitNum" -> C.toString))
      .mode("append").save()
    spark.range(0).select(col("id").as("c_custkey"), col("id").as("o_orderkey"),
        col("id").as("price_c"), lit("").as("seg"), lit(1).as("alive"))
      .write.format("graft-kv")
      .options(Map("catalog" -> viewCat, "newtable" -> "4", "maxVersions" -> "2",
        "timestamp" -> "1")).mode("append").save()
    spark.range(0).select(lit("").as("segment"), lit(0L).as("n_orders"),
        lit(0L).as("revenue_c"))
      .write.format("graft-kv")
      .options(Map("catalog" -> aggCat, "newtable" -> "4", "maxVersions" -> "2",
        "timestamp" -> "1", "minSplit" -> "0", "maxSplit" -> "z"))
      .mode("append").save()
    val ckptO = Files.createTempDirectory("graft-sxp23-ord").toString
    val ckptC = Files.createTempDirectory("graft-sxp23-cust").toString
    // dimension load, then the 100k fact build (the expensive one-time pass)
    writeCust(spark.range(C).select(col("id").as("c_custkey"),
      concat(lit("S"), (col("id") % 5).cast("string")).as("seg")),
      ts = 1000, overwrite = true)
    StreamBatch.maintainJoinViewCustomer(spark, 100000L, ckptC,
      custCat, custMir, viewCat, Some(aggCat))
    writeOrd(spark.range(N).select(col("id").as("o_orderkey"),
      (col("id") % C).as("o_custkey"), (col("id") * 7).as("price_c")),
      ts = 2000, overwrite = true)
    val (_, shufBuild) = measureShuffle {
      StreamBatch.maintainJoinViewOrders(spark, 200000L, ckptO,
        ordCat, ordMir, custMir, viewCat, Some(aggCat))
    }
    assert(tableRows("default:kv_jv_view_sxp") == N)

    // ORDERS wave: 500 changes (300 custkey moves + 200 new orders).
    // Allowed reads: the wave's ord-mirror point-gets + the C-row customer
    // mirror (dimension-sized — below the small-state gate it scans whole)
    writeOrd(spark.range(300L).select((col("id") * 300).as("o_orderkey"),
      ((col("id") + 7) % C).as("o_custkey"), lit(1L).as("price_c")),
      ts = 3000, overwrite = false)
    writeOrd(spark.range(200L).select((col("id") + N).as("o_orderkey"),
      (col("id") % C).as("o_custkey"), lit(2L).as("price_c")),
      ts = 3100, overwrite = false)
    val baseA = KvStore.rowsServed
    val (_, shufA) = measureShuffle {
      StreamBatch.maintainJoinViewOrders(spark, 300000L, ckptO,
        ordCat, ordMir, custMir, viewCat, Some(aggCat))
    }
    val servedA = KvStore.rowsServed - baseA
    info(s"orders wave: served=$servedA shuffle=$shufA (build shuffle=$shufBuild)")
    assert(servedA < 8000L,
      s"a $W-order wave served $servedA store rows — the orders side is " +
        "scanning the view, the fact mirror, or the corpus")
    assert(shufA < 20000L && shufA * 10 < shufBuild,
      s"orders wave shuffled $shufA records (build: $shufBuild) — not wave-proportional")

    // CUSTOMER wave: 20 re-segmentations. Allowed reads: those custkeys'
    // view prefix slivers (~100 orders each) — the In pushdown on the
    // LEADING key part must plan only those ranges, never the 100k view
    writeCust(spark.range(WC).select((col("id") * 40).as("c_custkey"),
      lit("ZZ").as("seg")), ts = 4000, overwrite = false)
    val baseB = KvStore.rowsServed
    val (_, shufB) = measureShuffle {
      StreamBatch.maintainJoinViewCustomer(spark, 400000L, ckptC,
        custCat, custMir, viewCat, Some(aggCat))
    }
    val servedB = KvStore.rowsServed - baseB
    info(s"customer wave: served=$servedB shuffle=$shufB")
    assert(servedB < 10000L,
      s"a $WC-customer wave served $servedB store rows — the prefix-sliver " +
        "read fell back to a view scan")
    assert(shufB < 20000L,
      s"customer wave shuffled $shufB records — not wave-proportional")
    // the repair landed: every order of a re-segmented customer shows ZZ
    val zz = spark.read.format("graft-kv").option("catalog", viewCat).load()
      .filter(col("alive") === 1 && col("seg") === "ZZ").count()
    val expected = spark.read.format("graft-kv").option("catalog", viewCat).load()
      .filter(col("alive") === 1 &&
        col("c_custkey") % 40 === 0 && col("c_custkey") < WC * 40).count()
    assert(zz == expected, s"repaired $zz rows, expected $expected")
    // rollup CONSERVATION at 100k: the maintained totals must equal the
    // view's own aggregation bit-for-bit after every wave
    val fromView = spark.read.format("graft-kv").option("catalog", viewCat).load()
      .filter(col("alive") === 1)
      .groupBy(when(col("seg") === "", lit("(none)")).otherwise(col("seg"))
        .as("segment"))
      .agg(count(lit(1)).as("n"), sum(col("price_c")).as("r"))
      .collect().map(x => x.getAs[String]("segment") ->
        ((x.getAs[Long]("n"), x.getAs[Long]("r")))).toMap
    val fromAgg = spark.read.format("graft-kv").option("catalog", aggCat).load()
      .filter(col("n_orders") > 0)
      .collect().map(x => x.getAs[String]("segment") ->
        ((x.getAs[Long]("n_orders"), x.getAs[Long]("revenue_c")))).toMap
    assert(fromAgg == fromView,
      s"maintained rollup diverged from the view's recomputation")
    tables.foreach(t => KvStore.drop(s"default:$t"))
  }
}
