package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Differential tests for the sketch-prefilter two-pass operators:
  * [[Dedup.bloomContamination]] and [[Sketches.heavyHitters]] must be
  * byte-identical to their exact naive twins on random corpora — INCLUDING
  * under sketch parameters chosen to flood the exact pass with false
  * positives, which is where a wrong rerank would show. */
class SketchOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  private def corpus(seed: Long, nDocs: Int): DataFrame = {
    val rnd = new Random(seed)
    val vocab = (0 until 25).map(i => s"w$i")
    def doc(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val rows = (0 until nDocs).map(i => (i.toLong, doc(5 + rnd.nextInt(30)))) ++
      Seq((nDocs.toLong, ""), (nDocs + 1L, "solo"), (nDocs + 2L, "a b c"))
    rows.toDF("doc_id", "text")
  }

  private def sorted(df: DataFrame): Seq[Row2] =
    df.collect().map(r => Row2(r.toSeq.map(String.valueOf))).toSeq.sortBy(_.vals.mkString("|"))
  private case class Row2(vals: Seq[String])

  test("bloomContamination == contamination on random corpora") {
    var nonVacuous = 0
    for (seed <- Seq(1L, 2L, 3L)) {
      val d = corpus(seed, 80)
      val train = d.filter($"doc_id" % 10 =!= 0)
      val eval = d.filter($"doc_id" % 10 === 0)
      val exact = Dedup.contamination(train, eval, "doc_id", "text", n = 3)
      val bloom = Dedup.bloomContamination(train, eval, "doc_id", "text", n = 3)
      assert(sorted(bloom) == sorted(exact), s"seed=$seed")
      if (exact.count() > 0) nonVacuous += 1
    }
    assert(nonVacuous > 0, "every seed produced a vacuous corpus")
  }

  test("bloomContamination survives a false-positive-flooding fpp") {
    val d = corpus(7L, 60)
    val train = d.filter($"doc_id" % 10 =!= 0)
    val eval = d.filter($"doc_id" % 10 === 0)
    val exact = Dedup.contamination(train, eval, "doc_id", "text", n = 4)
    // fpp=0.5 floods the prefilter with false positives; the exact string
    // join must drop every one of them
    val bloom = Dedup.bloomContamination(train, eval, "doc_id", "text",
      n = 4, fpp = 0.5)
    assert(sorted(bloom) == sorted(exact))
  }

  test("bloomContamination with an undersized expectedItems stays exact") {
    // undersizing the filter degrades fpp (more false positives), never
    // recall — the result must not change
    val d = corpus(11L, 60)
    val train = d.filter($"doc_id" % 10 =!= 0)
    val eval = d.filter($"doc_id" % 10 === 0)
    val exact = Dedup.contamination(train, eval, "doc_id", "text", n = 4)
    val bloom = Dedup.bloomContamination(train, eval, "doc_id", "text",
      n = 4, expectedItems = 2L)
    assert(sorted(bloom) == sorted(exact))
  }

  test("bloomContamination handles an empty eval side") {
    val d = corpus(13L, 30)
    val bloom = Dedup.bloomContamination(
      d, d.filter($"doc_id" < 0), "doc_id", "text", n = 4)
    assert(bloom.count() == 0)
  }

  private def naiveHeavyHitters(docs: DataFrame, n: Int, minCount: Long): DataFrame =
    docs.select(TextOps.tokens($"text").as("toks"))
      .select(explode(Sketches.ngramsWithMultiplicity($"toks", n)).as("ngram"))
      .filter(length($"ngram") > 0)
      .groupBy($"ngram").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" >= minCount)

  test("heavyHitters == naive groupBy/HAVING on random corpora") {
    for (seed <- Seq(1L, 5L, 9L); minCount <- Seq(1L, 3L, 8L)) {
      val d = corpus(seed, 100)
      val fast = Sketches.heavyHitters(d, "text", n = 2, minCount = minCount)
      assert(sorted(fast) == sorted(naiveHeavyHitters(d, 2, minCount)),
        s"seed=$seed minCount=$minCount")
    }
  }

  test("heavyHitters stays exact with a terrible eps (huge overcounts)") {
    val d = corpus(3L, 120)
    // eps=0.5 → width-4 sketch: nearly every gram collides, estimates are
    // wildly inflated, the candidate sliver approaches the full gram set —
    // the exact HAVING must still produce the exact answer
    val fast = Sketches.heavyHitters(d, "text", n = 3, minCount = 4L, eps = 0.5)
    assert(sorted(fast) == sorted(naiveHeavyHitters(d, 3, 4L)))
  }

  test("heavyHitters: threshold above every count yields an empty result") {
    val d = corpus(4L, 20)
    assert(Sketches.heavyHitters(d, "text", n = 3, minCount = 1000000L).count() == 0)
  }

  test("vocabOverlap: exact columns are exact; KMV estimates track them") {
    // three sources with engineered vocabularies: A = w0..w199,
    // B = w100..w299 (|A∩B| = 100), C = w500..w519 (disjoint, < k terms)
    val rows =
      (0 until 200).map(i => ("A", s"w$i")) ++
        (100 until 300).map(i => ("B", s"w$i")) ++
        (500 until 520).map(i => ("C", s"w$i"))
    val docs = rows.groupBy(identity).keys.toSeq
      .map { case (s, w) => (s, w) }
      .groupBy(_._1).toSeq
      .map { case (s, ws) => (s, ws.map(_._2).mkString(" ")) }
      .toDF("source", "text")
    val out = TextOps.vocabOverlap(docs, "source", "text", k = 64)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    val (ndA, ndB, interAB, unionAB, estU, estI) = out(("A", "B"))
    assert((ndA, ndB, interAB, unionAB) == (200L, 200L, 100L, 300L))
    // KMV with k=64: standard error ~ 1/sqrt(k-2) ≈ 13%; 3σ tolerance
    assert(math.abs(estU - unionAB) <= unionAB * 2 / 5, s"est_union=$estU vs $unionAB")
    assert(math.abs(estI - interAB) <= unionAB * 2 / 5, s"est_inter=$estI vs $interAB")
    val (_, ndC, interAC, unionAC, estUac, _) = out(("A", "C"))
    assert(ndC == 20L && interAC == 0L && unionAC == 220L)
    assert(estUac >= 200L, s"union estimate must dominate the exhaustive side, got $estUac")
    // C's sketch is exhaustive (20 < k): B-C union estimate inherits B's
    // estimator error only
    val (_, _, interBC, unionBC, _, estIbc) = out(("B", "C"))
    assert(interBC == 0L && unionBC == 220L)
    assert(estIbc <= unionBC / 2, s"disjoint sources: est_inter should be small, got $estIbc")
  }
}
