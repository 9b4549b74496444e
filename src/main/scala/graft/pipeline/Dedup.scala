package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed to
  * survive a 1000-executor / 100 TB corpus:
  *
  *  - exact: one hash-shuffle on the content hash (map-side combine);
  *  - n-gram Jaccard: pairwise ONLY within a blocking key — never a global
  *    cross join;
  *  - MinHash+LSH: shingle→minhash (one groupBy), band→bucket join (shuffle
  *    on band hash), exact-Jaccard rerank of candidates only;
  *  - SimHash: 64-bit fingerprints + banded chunk join, Hamming rerank.
  *
  * All hashes are seed-fixed (xxhash64/md5) — runs are deterministic.
  */
object Dedup {

  /** Exact dedup by content hash. Output: one row per distinct content with
    * the keeper id (min) and the copy count. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Sorted distinct word tokens — sorted ONCE per document so pairwise
    * Jaccard is a single O(n+m) merge instead of a per-pair hash set. */
  private def tokenSet(c: Column): Column =
    sort_array(array_distinct(TextOps.tokens(c)))

  /** Exact token-set Jaccard via the native O(n+m) merge expression.
    * PRECONDITION: both inputs must be sorted, de-duplicated arrays (use
    * [[tokenSet]]); unsorted input silently undercounts the intersection.
    * Two empty sets yield NULL, so `>= threshold` filters drop the pair. */
  def jaccard(a: Column, b: Column): Column =
    graft.functions.HashExprs.sortedJaccard(a, b)

  /** All pairs within each `blockCol` group with token-set Jaccard ≥
    * threshold. Blocking bounds the pair count: the shuffle is on the block
    * key and each block's pairs are generated locally post-shuffle. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val t = df.select(col(blockCol).as("block"), col(idCol).as("id"),
      tokenSet(col(textCol)).as("toks"))
    val a = t.select(col("block"), col("id").as("id_a"), col("toks").as("toks_a"))
    val b = t.select(col("block"), col("id").as("id_b"), col("toks").as("toks_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccard(col("toks_a"), col("toks_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Word bigram shingles ("w1 w2"). */
  def shingles(text: Column): Column = {
    val toks = TextOps.tokens(text)
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - 2, lit(0))),
      i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
  }

  /** MinHash signature over word-bigram shingles, computed by the native
    * one-pass `MinHashSig` expression directly from the token array — NO
    * explode, NO groupBy, NO shuffle. At 100 TB this is embarrassingly
    * parallel; an explode+groupBy alternative shuffles the whole shingle
    * set. Output: (id, sig array<long>). Empty documents are dropped. */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int): DataFrame =
    df.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("id"), graft.functions.HashExprs.minhashSig(col("toks"), numHashes).as("sig"))

  /** MinHash+LSH near-dup pairs: band the signature, bucket-join on
    * (band index, band hash), then exact-Jaccard rerank of candidates.
    * The only all-to-all step is the band-hash shuffle — standard LSH
    * scaling; candidate rerank touches candidate pairs only.
    *
    * The rerank measures Jaccard over the SAME bigram-shingle sets the
    * MinHash sketch measures (round 1 reranked on unigram token sets — a
    * different similarity than the candidate generator's, so the output
    * was neither "all shingle-near-dups" nor "all unigram-near-dups").
    * With matched notions the output is exactly {pairs : shingle-Jaccard ≥
    * threshold} ∩ candidates, and the banding (default 16 bands × 2 rows:
    * per-pair recall 1-(1-J²)^16 ≥ 1-10⁻⁷ at J = 0.8) makes candidate
    * recall effectively total, so the exact-all-pairs SQL is a valid
    * oracle (verified equal at every test SF). */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 32, bands: Int = 16, threshold: Double = 0.8): DataFrame = {
    val buckets = df
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("id"),
        posexplode(graft.functions.HashExprs.minhashBands(col("toks"), numHashes, bands)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bh"))
    val cand = buckets.as("x").join(buckets.as("y"), Seq("band", "bh"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val sh = df.select(col(idCol).as("id"),
      graft.functions.HashExprs.sortedShingles(TextOps.tokens(col(textCol))).as("sh"))
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Connected components over a near-dup pair graph → canonical keeper per
    * component: the step that turns pairwise near-dup detection into an
    * actionable dedup decision (keep min-id, drop the rest).
    *
    * Min-label propagation: every node starts labeled with itself; each
    * round takes the min over its neighbors' labels; converges in
    * O(component diameter) rounds (near-dup clusters are tiny — pairs and
    * small cliques — so 2-3 rounds in practice). Each round is ONE
    * edge⋈label equi-join + groupBy — the standard large-graph CC shape
    * that scales to 100 TB edge sets (no driver-side graph). The lineage is
    * cut with localCheckpoint per round so the plan doesn't grow with the
    * iteration count. Output: (id, keep_id = component minimum), one row
    * per node that appears in ≥1 pair. */
  def components(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    val edges = pairs.select(col(idA).as("a"), col(idB).as("b"))
      .union(pairs.select(col(idB).as("a"), col(idA).as("b")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    while (changed > 0) {
      val neighborMin = edges.join(labels, edges("b") === labels("id"))
        .groupBy(col("a")).agg(min(col("label")).as("nmin"))
      val updated = labels.join(neighborMin, labels("id") === neighborMin("a"))
        .select(labels("id").as("id"), col("label"),
          least(col("label"), col("nmin")).as("next"))
        .localCheckpoint(true)
      changed = updated.filter(col("next") < col("label")).count()
      labels = updated.select(col("id"), col("next").as("label"))
    }
    labels.select(col("id"), col("label").as("keep_id"))
  }

  /** 64-bit SimHash over word tokens via the native one-pass `SimHash64`
    * expression: bit b of xxhash64(token) votes ±1; fingerprint bit = sign
    * of the vote sum. A pure projection — no explode, no groupBy, no
    * shuffle. */
  def simhash(df: DataFrame, textCol: String, idCol: String,
      md5Base: Boolean = false): DataFrame =
    df.select(col(idCol).as("id"),
        array_distinct(TextOps.tokens(col(textCol))).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("id"),
        graft.functions.HashExprs.simhash64(col("toks"), md5Base).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, found by the
    * 4-chunk pigeonhole: any pair within distance 3 shares at least one
    * exact 16-bit chunk, so candidates come from 4 chunk-equality joins. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, md5Base: Boolean = false): DataFrame = {
    val fps = simhash(df, textCol, idCol, md5Base)
    val chunks = fps.select(col("id"), col("simhash"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xffffL)).as("ch"))
      }: _*)).as("ck"))
      .select(col("id"), col("simhash"), col("ck.chunk").as("chunk"), col("ck.ch").as("ch"))
    chunks.as("x").join(chunks.as("y"), Seq("chunk", "ch"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.simhash").as("fp_a"), col("y.simhash").as("fp_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
