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

  /** Word-level distinct tokens. */
  private def tokenSet(c: Column): Column = array_distinct(TextOps.tokens(c))

  /** Exact token-set Jaccard similarity of two token arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b))).cast("double")
  }

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

  /** MinHash signature: for hash function i, min over shingles of
    * xxhash64(shingle, i). One explode + one groupBy with numHashes map-side
    * combined min aggregates — a single shuffle keyed by document. */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int): DataFrame = {
    val exploded = df.select(col(idCol).as("id"),
      explode(shingles(col(textCol))).as("shingle"))
    val aggs = (0 until numHashes).map(i =>
      min(xxhash64(col("shingle"), lit(i))).as(s"h$i"))
    exploded.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash+LSH near-dup pairs: band the signature, bucket-join on
    * (band index, band hash), then exact-Jaccard rerank of candidates.
    * The only all-to-all step is the band-hash shuffle — standard LSH
    * scaling; candidate rerank touches candidate pairs only. */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 32, bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val sigs = minhashSignatures(df, textCol, idCol, numHashes)
    val bandCols = (0 until bands).map { b =>
      val cs = (0 until rows).map(r => col(s"h${b * rows + r}"))
      struct(lit(b).as("band"), xxhash64(cs: _*).as("bh"))
    }
    val buckets = sigs.select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val cand = buckets.as("x").join(buckets.as("y"), Seq("band", "bh"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val toks = df.select(col(idCol).as("id"), tokenSet(col(textCol)).as("toks"))
    cand
      .join(toks.select(col("id").as("id_a"), col("toks").as("toks_a")), Seq("id_a"))
      .join(toks.select(col("id").as("id_b"), col("toks").as("toks_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("toks_a"), col("toks_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over word tokens: bit b of xxhash64(token) votes ±1;
    * fingerprint bit = sign of the vote sum. One explode + one groupBy. */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val exploded = df.select(col(idCol).as("id"),
      explode(array_distinct(TextOps.tokens(col(textCol)))).as("tok"))
      .withColumn("th", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { b =>
      sum(when(col("th").bitwiseAND(lit(1L << b)) =!= 0L, 1).otherwise(-1)).as(s"b$b")
    }
    val summed = exploded.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).foldLeft(lit(0L)) { (acc, b) =>
      acc + when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L)
    }
    summed.select(col("id"), fp.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, found by the
    * 4-chunk pigeonhole: any pair within distance 3 shares at least one
    * exact 16-bit chunk, so candidates come from 4 chunk-equality joins. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fps = simhash(df, textCol, idCol)
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
