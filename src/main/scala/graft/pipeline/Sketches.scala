package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-driven two-pass operators: a bounded-memory sketch pass finds a
  * candidate sliver, an exact pass restricted to that sliver makes the
  * answer precise. The pattern keeps the expensive global operation
  * (a groupBy over billions of distinct keys) off the long tail entirely —
  * the sketch is a few MB regardless of corpus size, and the exact pass
  * shuffles only keys the sketch could not rule out.
  *
  * Related single-pass sketches live elsewhere: [[TextOps.kmvDistinct]]
  * (KMV cardinality) and [[Dedup.bloomContamination]] (Bloom-prefiltered
  * decontamination).
  */
object Sketches {

  /** Exact heavy hitters over word n-grams via a Count-Min-Sketch prefilter.
    *
    * Task: every distinct word `n`-gram whose corpus-wide occurrence count
    * is ≥ `minCount`, with its EXACT count — `(ngram, cnt)`.
    *
    * Naive shape: explode + groupBy(ngram) + HAVING — one shuffle keyed on
    * EVERY distinct n-gram, which at 100 TB is billions of singleton keys
    * shuffled only to be discarded by the HAVING. Here instead:
    *
    *  1. SKETCH PASS: a Count-Min Sketch over the exploded gram stream
    *     (`DataFrameStatFunctions.countMinSketch` — distributed build,
    *     per-partition sketches merged associatively; `eps`/`confidence`
    *     size it at `ceil(2/eps) × ceil(-ln(1-confidence)/ln 2)` counters,
    *     ~1 MB at the defaults, independent of corpus size).
    *  2. EXACT PASS: re-explode, keep only grams the sketch estimates
    *     ≥ `minCount` (map-side, no shuffle for the long tail), then an
    *     exact groupBy + HAVING over the surviving sliver.
    *
    * Exactness: CMS estimates NEVER undercount (each counter is an
    * overcount of its cell's true sum), so no true heavy hitter is dropped
    * by the prefilter — false negatives are impossible at ANY `eps`, which
    * only tunes how many long-tail grams leak through to the exact pass
    * (expected overcount ≤ eps·N with probability `confidence`). The final
    * HAVING re-applies the threshold on true counts, so leaked grams
    * vanish. Asserted differentially against the naive shape in
    * SketchOpsSpec, including with a deliberately terrible `eps`.
    *
    * Recompute-over-cache: the gram stream is produced twice rather than
    * cached — at 100 TB the re-scan is a codegen'd map over parquet splits,
    * while caching it would pin the entire exploded corpus. */
  def heavyHitters(docs: DataFrame, textCol: String, n: Int,
      minCount: Long, eps: Double = 1e-4, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    require(n >= 1, s"heavyHitters: n must be >= 1, got $n")
    require(minCount >= 1, s"heavyHitters: minCount must be >= 1, got $minCount")
    def grams = docs
      .select(TextOps.tokens(col(textCol)).as("toks"))
      .select(explode(ngramsWithMultiplicity(col("toks"), n)).as("ngram"))
      .filter(length(col("ngram")) > 0)
    val cms = grams.stat.countMinSketch(col("ngram"), eps, confidence, seed)
    val estimate = udf((g: String) => cms.estimateCount(g))
    grams
      .filter(estimate(col("ngram")) >= minCount)
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Word n-grams WITH multiplicity (counting semantics — deliberately not
    * [[Dedup.tokenNgramsOf]], whose array_distinct is set semantics). A doc
    * shorter than n contributes nothing. */
  private[pipeline] def ngramsWithMultiplicity(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
}
