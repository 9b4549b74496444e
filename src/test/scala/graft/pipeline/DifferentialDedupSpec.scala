package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Differential testing of the dedup family: random seeded corpora, each
  * operator's distributed output compared against a brute-force in-memory
  * twin. Complements the two fixed driver datasets the SQL oracles cover —
  * here the INPUTS vary (duplicate groups, near-dup chains, empty and
  * single-token docs injected), so structural edge cases can't hide.
  *
  *  - SimHash pigeonhole is EXACT for Hamming ≤ 3 → set equality.
  *  - MinHash banding at J ≥ 0.8 with 16 bands × 2 rows has per-pair miss
  *    probability ≤ (1-J²)¹⁶ ≤ 10⁻⁷ → equality holds for every seeded
  *    corpus (any future miss means a REAL structural bug with overwhelming
  *    likelihood, not banding luck).
  *  - Connected components vs an in-memory union-find → exact labels.
  */
class DifferentialDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  /** Random corpus: base docs from a small vocabulary, plus injected exact
    * duplicates, near-duplicates (one token changed), and degenerate docs. */
  private def corpus(seed: Long): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val vocab = (0 until 30).map(i => s"w$i")
    def doc(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0 until 60).map(i => (i.toLong, doc(8 + rnd.nextInt(20))))
    val dups = (0 until 10).map { i =>
      val (_, t) = base(rnd.nextInt(base.size)); (100L + i, t)
    }
    val nearDups = (0 until 10).map { i =>
      val (_, t) = base(rnd.nextInt(base.size))
      val toks = t.split(" ")
      toks(rnd.nextInt(toks.length)) = vocab(rnd.nextInt(vocab.size))
      (200L + i, toks.mkString(" "))
    }
    val degenerate = Seq((300L, "solo"), (301L, ""), (302L, "x x x x x x x x x x"))
    base ++ dups ++ nearDups ++ degenerate
  }

  /** Brute-force bigram-shingle Jaccard (mirrors the operators' notion). */
  private def shingleSet(text: String): Set[String] = {
    val toks = text.trim.split("\\s+").toSeq
    if (toks.isEmpty || (toks.size == 1 && toks.head.isEmpty)) Set(toks.headOption.getOrElse(""))
    else if (toks.size == 1) toks.toSet
    else toks.sliding(2).map(_.mkString(" ")).toSet
  }

  private def jaccard(a: Set[String], b: Set[String]): Option[Double] = {
    val union = (a ++ b).size
    if (union == 0) None else Some((a & b).size.toDouble / union)
  }

  test("minhashLshPairs == brute-force shingle-Jaccard pairs on 12 random corpora") {
    for (seed <- 1 to 12) {
      val docs = corpus(seed)
      val expected = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        j <- jaccard(shingleSet(ta), shingleSet(tb)) if j >= 0.8
      } yield (ia, ib)).toSet
      val got = Dedup.minhashLshPairs(docs.toDF("doc_id", "text"), "text", "doc_id",
          numHashes = 32, bands = 16, threshold = 0.8)
        .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"seed=$seed missed=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    }
  }

  test("fuzzyDecontamPairs == brute-force cross Jaccard on 12 random corpus/eval splits") {
    for (seed <- 1 to 12) {
      val rnd = new Random(seed * 31L)
      val docs = corpus(seed)
      // eval set: paraphrases of random docs (one token appended / swapped)
      // plus one stranger that should match nothing
      val vocab = (0 until 30).map(i => s"w$i")
      val eval = (0 until 8).map { i =>
        val (_, t) = docs(rnd.nextInt(docs.size))
        val mutated =
          if (t.trim.isEmpty) "was empty"
          else if (rnd.nextBoolean()) t + " appended"
          else { val ts = t.split(" "); ts(rnd.nextInt(ts.length)) = vocab(rnd.nextInt(vocab.size)); ts.mkString(" ") }
        (1000L + i, mutated)
      } :+ (2000L, "zq zq zq completely alien tokens qz qz")
      val expected = (for {
        (ic, tc) <- docs; (ie, te) <- eval
        j <- jaccard(shingleSet(tc), shingleSet(te)) if j >= 0.8
      } yield (ic, ie)).toSet
      val got = Dedup.fuzzyDecontamPairs(docs.toDF("doc_id", "text"),
          eval.toDF("eval_id", "text"), "doc_id", "text", "eval_id", "text",
          numHashes = 32, bands = 16, threshold = 0.8)
        .select($"doc_id", $"eval_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"seed=$seed missed=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    }
  }

  test("simhashPairs == brute-force Hamming<=3 pairs on 12 random corpora (exact pigeonhole)") {
    def md5Lower(s: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      (8 to 15).foldLeft(0L)((acc, i) => acc | ((dig(i) & 0xffL) << ((i - 8) * 8)))
    }
    def simhash(text: String): Option[Long] = {
      val toks = text.trim.split("\\s+").toSeq.distinct
      if (toks.isEmpty || toks == Seq("")) {
        if (toks == Seq("")) Some {
          // a single empty token still votes (matches the operator, which
          // filters only size-0 arrays)
          val h = md5Lower("")
          (0 until 64).foldLeft(0L)((fp, b) => if (((h >>> b) & 1L) == 1L) fp | (1L << b) else fp)
        } else None
      } else Some {
        val counts = new Array[Int](64)
        toks.foreach { t =>
          val h = md5Lower(t)
          (0 until 64).foreach(b => if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1)
        }
        (0 until 64).foldLeft(0L)((fp, b) => if (counts(b) > 0) fp | (1L << b) else fp)
      }
    }
    for (seed <- 13 to 24) {
      val docs = corpus(seed)
      val fps = docs.flatMap { case (id, t) => simhash(t).map(id -> _) }
      val expected = (for {
        (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
        if java.lang.Long.bitCount(fa ^ fb) <= 3
      } yield (ia, ib)).toSet
      val got = Dedup.simhashPairs(docs.toDF("doc_id", "text"), "text", "doc_id",
          maxHamming = 3, md5Base = true)
        .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"seed=$seed missed=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    }
  }

  test("minhashKeepers == components(minhashLshPairs) in both collapse regimes") {
    for (seed <- 37 to 42) {
      // inject a dup group LARGER than the forced threshold (maxBucket=4 ⇒
      // collapseThreshold=4) so the second leg genuinely engages the
      // collapse/expansion machinery — the seeded corpus alone tops out at
      // dup groups of ~4, which take the direct path at both settings
      val base = corpus(seed)
      val bigGroup = (0 until 7).map(i => (400L + i, base.head._2))
      val docs = base ++ bigGroup
      // direct regime (group of 8 ≤ 1024: no collapse) and forced-collapse
      // regime (8 > 4: collapse + label inheritance through members) must
      // both match the expanded-pair formulation row for row
      for (maxBucket <- Seq(Dedup.DefaultMaxBucket, 4)) {
        val df = docs.toDF("doc_id", "text")
        val viaPairs = Dedup.components(
            Dedup.minhashLshPairs(df, "text", "doc_id", 32, 16, 0.8, maxBucket))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val viaKeepers = Dedup.minhashKeepers(df, "text", "doc_id", 32, 16, 0.8, maxBucket)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(viaKeepers == viaPairs,
          s"seed=$seed maxBucket=$maxBucket diff=${
            (viaPairs.toSet -- viaKeepers.toSet).take(3)} / ${
            (viaKeepers.toSet -- viaPairs.toSet).take(3)}")
      }
    }
  }

  test("minhashKeepers canonicalizes a degenerate corpus without quadratic pairs") {
    val n = 3000
    val degenerate = spark.range(n)
      .selectExpr("id AS doc_id", "'the very same boilerplate page content' AS text")
    val labels = Dedup.minhashKeepers(degenerate, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // every doc labeled, all to the minimum id — reached WITHOUT listing
    // the n*(n-1)/2 ≈ 4.5M pairs the expanded formulation would build
    assert(labels.length == n)
    assert(labels.forall(_._2 == 0L))
  }

  test("ngramJaccardPairs == brute-force blocked token-set Jaccard on 12 random corpora") {
    for (seed <- 43 to 54) {
      val rnd = new Random(seed)
      val docs = corpus(seed).map { case (id, t) =>
        (id, t, s"blk${rnd.nextInt(3)}")
      }
      val expected = (for {
        (ia, ta, ba) <- docs; (ib, tb, bb) <- docs
        if ia < ib && ba == bb
        ja = {
          val (sa, sb) = (ta.trim.split("\\s+").toSet, tb.trim.split("\\s+").toSet)
          val u = (sa ++ sb).size
          if (u == 0) -1.0 else (sa & sb).size.toDouble / u
        }
        if ja >= 0.8
      } yield (ia, ib)).toSet
      val got = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text", "blk"),
          "text", "doc_id", "blk", 0.8)
        .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"seed=$seed missed=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    }
  }

  test("components == in-memory union-find on 12 random pair graphs") {
    for (seed <- 25 to 36) {
      val rnd = new Random(seed)
      val n = 40
      val pairs = (0 until 50).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      // union-find twin
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val inGraph = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      val expected = inGraph.map(id => id -> find(id.toInt).toLong).toMap
      val got = Dedup.components(pairs.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed diff=${
        (expected.toSet -- got.toSet).take(3)} / ${(got.toSet -- expected.toSet).take(3)}")
    }
  }

  test("components(reliableCheckpoints=true): the cluster durability branch converges identically") {
    // the branch a REAL cluster uses (df.checkpoint(true) to the
    // checkpoint dir instead of executor-block localCheckpoint) was never
    // executed by any spec before round 10 — local runs always took the
    // local branch. A 12-node path graph needs ~11 propagation rounds, so
    // with the default checkpointEvery=3 this exercises >= 3 reliable
    // cadence pins plus the final pin.
    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt")
    val prev = Option(spark.sparkContext.getCheckpointDir).flatten
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      import spark.implicits._
      val path = (0L until 11L).map(i => (i, i + 1))
      val got = Dedup.components(path.toDF("id_a", "id_b"),
          reliableCheckpoints = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == (0L to 11L).map(_ -> 0L).toMap,
        "reliable-checkpoint propagation must converge to the path minimum")
      assert(java.nio.file.Files.list(dir).count() > 0,
        "reliable checkpoints must actually land in the checkpoint dir")
      // the local-branch block-release guard is asserted by the existing
      // specs; here the point is the RELIABLE branch runs end-to-end
    } finally {
      prev.foreach(spark.sparkContext.setCheckpointDir)
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
  }

  /** Brute-force maximal duplicated-span merge (mirrors [[Dedup.dupSpans]]
    * semantics: cross-doc n-grams, overlap-or-adjacent intervals merge). */
  private def refDupSpans(docs: Seq[(Long, String)], n: Int): Seq[(Long, Long, Long, Long)] = {
    val occ = docs.flatMap { case (id, t) =>
      val tk = t.trim.split("\\s+").toSeq
      if (tk.size >= n) (0 to tk.size - n).map(i => (id, i + 1, tk.slice(i, i + n).mkString(" ")))
      else Nil
    }
    val dupG = occ.map(o => (o._3, o._1)).distinct.groupBy(_._1)
      .collect { case (g, xs) if xs.size >= 2 => g }.toSet
    occ.filter(o => dupG(o._3)).groupBy(_._1).toSeq.flatMap { case (id, os) =>
      var spans = List.empty[(Int, Int)]
      os.map(_._2).sorted.foreach { p =>
        spans match {
          case (s, e) :: rest if p <= e + 1 =>
            spans = (s, math.max(e, p + n - 1)) :: rest
          case _ => spans = (p, p + n - 1) :: spans
        }
      }
      spans.reverse.map { case (s, e) => (id, s.toLong, e.toLong, (e - s + 1).toLong) }
    }.sortBy(x => (x._1, x._2))
  }

  test("dupSpans == brute-force span merge on random corpora (n=5 and the denser n=3)") {
    for (seed <- 1 to 6; n <- Seq(3, 5)) {
      val docs = corpus(seed)
      val expected = refDupSpans(docs, n)
      val got = Dedup.dupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n)
        .orderBy($"doc_id", $"span_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == expected, s"seed=$seed n=$n diff=${
        (expected.toSet -- got.toSet).take(3)} / ${(got.toSet -- expected.toSet).take(3)}")
      assert(expected.nonEmpty, s"seed=$seed n=$n produced no spans — fixture too weak")
    }
  }

  test("exactSubstrDedup refuses an out-of-domain (doc_id,pos) packing loudly") {
    // the canonical-occurrence agg packs doc_id*1e9+pos into a long; past
    // ~9.2e9 doc_ids or 1e9-token docs the packing mis-orders — the guard
    // must fail the job, not dedup against a wrong canonical occurrence
    val dupText = "a b c d e f g h i j"
    val bad = Seq((10000000000L, dupText), (1L, dupText))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Dedup.exactSubstrDedup(bad, "doc_id", "text", n = 5).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("packing domain")),
      s"expected the loud packing-domain refusal, got: $ex")
    // in-domain corpus still works, and the dup gram is actually removed
    val ok = Dedup.exactSubstrDedup(
      Seq((1L, dupText), (2L, dupText)).toDF("doc_id", "text"),
      "doc_id", "text", n = 5).orderBy($"doc_id").collect()
    assert(ok.length == 2)
    assert(ok(1).getAs[Long]("removed_tokens") == 10L,
      s"doc 2 duplicates doc 1 entirely — all tokens must be removed: ${ok.toSeq}")
  }
}
