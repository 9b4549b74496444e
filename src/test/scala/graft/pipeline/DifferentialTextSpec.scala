package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Differential testing of the text-shaping operators over random seeded
  * corpora, each distributed output compared against a brute-force
  * in-memory twin (same philosophy as [[DifferentialDedupSpec]]: the SQL
  * oracles cover two fixed datasets; here the INPUTS vary so structural
  * edge cases — single-token docs, blank docs, hapax terms, tiny tails —
  * can't hide).
  */
class DifferentialTextSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  private def corpus(seed: Long): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val vocab = (0 until 25).map(i => s"w$i")
    def doc(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    (0 until 40).map(i => (i.toLong, doc(1 + rnd.nextInt(40)))) ++
      Seq((100L, ""), (101L, "  "), (102L, "solo"))
  }

  private def toks(t: String): Seq[String] =
    if (t.trim.isEmpty) Seq.empty else t.trim.split("\\s+").toSeq

  test("chunk: differential vs in-memory slicing across seeds and strides") {
    for (seed <- Seq(1L, 2L, 3L); (c, st) <- Seq((8, 8), (8, 5), (4, 1))) {
      val docs = corpus(seed)
      val got = TextOps.chunk(docs.toDF("doc_id", "text"), "doc_id", "text",
        chunkSize = c, stride = st)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
          (r.getAs[Long]("start_tok"), r.getAs[Long]("n_chunk_tokens"),
            r.getAs[String]("chunk_md5"))).toMap
      val want = docs.flatMap { case (id, t) =>
        val ts = toks(t)
        if (ts.isEmpty) Seq.empty
        else (0 until ts.size by st).zipWithIndex.map { case (start, i) =>
          val slice = ts.slice(start, start + c)
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(slice.mkString(" ").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          (id, i.toLong) -> (start.toLong, slice.size.toLong, md5)
        }
      }.toMap
      assert(got == want, s"seed=$seed chunk=$c stride=$st")
      // coverage: every token position of every non-blank doc is inside
      // at least one chunk (stride <= chunkSize guarantees tiling)
      docs.foreach { case (id, t) =>
        val n = toks(t).size
        val covered = got.collect { case ((d, _), (s0, len, _)) if d == id =>
          (s0 until s0 + len) }.flatten.toSet
        assert(covered == (0L until n.toLong).toSet, s"doc $id not tiled")
      }
    }
  }

  test("contamination: differential vs brute force; collision-heavy candidate hashes rerank exactly") {
    for (seed <- Seq(11L, 12L, 13L); n <- Seq(2, 3)) {
      val train = corpus(seed)
      val eval = corpus(seed + 1000).take(12)
      // brute force: distinct word n-grams, pairwise intersection sizes
      def gramsOf(t: String): Set[String] = {
        val ts = toks(t)
        if (ts.size < n) Set.empty
        else ts.sliding(n).map(_.mkString(" ")).toSet
      }
      val want = (for {
        (tid, tt) <- train; (eid, et) <- eval
        shared = (gramsOf(tt) intersect gramsOf(et)).size
        if shared >= 1
      } yield (tid, eid) -> shared.toLong).toMap
      def run(bits: Int): Map[(Long, Long), Long] =
        Dedup.contamination(train.toDF("doc_id", "text"), eval.toDF("doc_id", "text"),
          "doc_id", "text", n = n, candidateHashBits = bits)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(run(64) == want, s"seed=$seed n=$n (full-width hash)")
      // 2-bit candidate hash = 4 buckets: nearly every gram pair collides,
      // so the candidate phase admits almost everything — the exact string
      // rerank must still produce byte-identical results (this is the
      // collision path a 64-bit hash never exercises in test-sized data)
      assert(run(2) == want, s"seed=$seed n=$n (collision-heavy hash)")
    }
  }

  test("bigramLm: differential vs in-memory pair/prefix counts across seeds") {
    for (seed <- Seq(11L, 12L, 13L); minCount <- Seq(1L, 2L)) {
      val docs = corpus(seed)
      val got = TextOps.bigramLm(docs.toDF("doc_id", "text"), "text", minCount)
        .collect()
        .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
          (r.getAs[Long]("c12"), r.getAs[Long]("c1"), r.getAs[Long]("p_micro"))).toMap
      val pairs = docs.flatMap { case (_, t) =>
        val ts = toks(t); ts.zip(ts.drop(1))
      }
      val c12 = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val c1 = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val want = c12.collect { case ((a, b), n) if n >= minCount =>
        (a, b) -> (n, c1(a), n * 1000000L / c1(a))
      }.toMap
      assert(got == want, s"seed=$seed minCount=$minCount")
    }
  }

  test("kmvDistinct: differential vs in-memory k-minimum-values across seeds") {
    // the reference recomputes the same md5-hash ranking and the same
    // 128-bit integer estimate, so the comparison is exact equality
    def md5Lower(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      java.nio.ByteBuffer.wrap(d, 8, 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    }
    for (seed <- Seq(21L, 22L); k <- Seq(4, 64)) {
      val docs = corpus(seed).map { case (id, t) =>
        (id, t, if (id % 3 == 0) "a" else "b") // two strata of uneven size
      }
      val got = TextOps.kmvDistinct(docs.toDF("doc_id", "text", "source"),
        "source", "text", k = k)
        .collect()
        .map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_distinct_exact"), r.getAs[Long]("est_kmv"))).toMap
      val want = docs.groupBy(_._3).view.mapValues { ds =>
        val terms = ds.flatMap(d => toks(d._2)).distinct
        val nd = terms.size.toLong
        if (nd < k) (nd, nd)
        else {
          // unsigned order over the signed md5 longs; term breaks ties
          val hk = terms.map(t => (md5Lower(t), t))
            .sortBy { case (h, t) => (h ^ Long.MinValue, t) }
            .apply(k - 1)._1
          val u = BigInt(hk) + (if (hk < 0) BigInt(2).pow(64) else BigInt(0))
          (nd, ((BigInt(k - 1) * BigInt(2).pow(64)) / u).toLong)
        }
      }.toMap
      assert(got == want, s"seed=$seed k=$k got=$got want=$want")
    }
  }

  test("bm25Search: differential vs in-memory scoring across seeds") {
    for (seed <- Seq(31L, 32L); (nq, k) <- Seq((3, 10), (5, 4))) {
      val docs = corpus(seed)
      val got = TextOps.bm25Search(docs.toDF("doc_id", "text"), "doc_id", "text",
        nQueryTerms = nq, k = k)
        .collect()
        .map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id")) ->
          (r.getAs[Long]("tf"), r.getAs[Long]("dl"), r.getAs[Long]("df"),
            r.getAs[Long]("score_micro"), r.getAs[Int]("rank"))).toMap
      val toksByDoc = docs.map { case (id, t) => id -> toks(t) }
      val n = BigInt(docs.size)
      val tTok = BigInt(toksByDoc.map(_._2.size).sum)
      val tf = toksByDoc.flatMap { case (id, ts) =>
        ts.groupBy(identity).map { case (term, g) =>
          (term, id, ts.size.toLong, g.size.toLong) }
      }
      val dfm = tf.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val qTerms = dfm.toSeq.sortBy { case (t, d) => (-d, t) }.take(nq).map(_._1).toSet
      val want = tf.filter(p => qTerms(p._1)).map { case (term, id, dl, c) =>
        val d = BigInt(dfm(term))
        val score = ((2 * n - 2 * d + 1) * 22 * tTok * c * 1000000) /
          ((2 * d + 1) * (10 * tTok * c + 3 * tTok + 9 * dl * n))
        (term, id) -> (c, dl, dfm(term), score.toLong)
      }.groupBy(_._1._1).view.mapValues { rows =>
        rows.sortBy { case ((_, id), (_, _, _, s)) => (-s, id) }
          .zipWithIndex.take(k)
          .map { case (((t, id), (c, dl, d, s)), i) => (t, id) -> (c, dl, d, s, i + 1) }
      }.toMap.values.flatten.toMap
      assert(got == want, s"seed=$seed nq=$nq k=$k")
    }
  }

  test("invertedIndex: differential vs in-memory postings across seeds") {
    for (seed <- Seq(7L, 8L); (k, minDf) <- Seq((1000, 1), (3, 2))) {
      val docs = corpus(seed)
      val got = TextOps.invertedIndex(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = k, minDf = minDf)
        .collect()
        .map(r => r.getAs[String]("term") ->
          (r.getAs[Long]("df"), r.getAs[String]("postings"),
            r.getAs[Int]("truncated"))).toMap
      val want = docs
        .flatMap { case (id, t) => toks(t).distinct.map(_ -> id) }
        .groupBy(_._1).view
        .mapValues(_.map(_._2).sorted)
        .filter(_._2.size >= minDf)
        .map { case (term, ids) =>
          term -> (ids.size.toLong, ids.take(k).mkString(","),
            if (ids.size > k) 1 else 0)
        }.toMap
      assert(got == want, s"seed=$seed k=$k minDf=$minDf")
    }
  }
}
