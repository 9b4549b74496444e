package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Tokenizer-training primitives: the iterative merge-discovery loop at the
  * heart of BPE-style tokenizers, run at corpus scale. Each round is ONE
  * distributed pass — count adjacent-token pairs (a word-count-shaped
  * shuffle with map-side combine), pick the most frequent pair
  * (deterministic tie-break), apply the merge as a map-only string rewrite
  * — exactly how distributed tokenizer training iterates (production
  * systems batch several merges per pass; the loop shape is the same).
  * Everything is exact integer counting and deterministic string rewriting,
  * so the whole training trace is reproducible cross-engine.
  */
object Tokenizer {

  /** Discover `rounds` BPE-style merges over whitespace tokens: per round,
    * the most frequent adjacent pair (ties → lexicographically smallest
    * pair) merges into one token (`"a b"` → `"a_b"`). Precondition: the
    * corpus must not contain the merge marker `_` (checked up front —
    * a marker collision would make later rounds ambiguous).
    *
    * Merge application is `replace(text, "a b", "a_b")` — left-to-right,
    * non-overlapping, identical semantics in Spark and SQL engines; for
    * immediately repeated pairs ("a b a b") only alternating occurrences
    * merge in one round, which IS standard BPE behavior for overlapping
    * pair instances.
    *
    * The per-round argmax is a driver-side single-row action (the merge
    * CHOICE feeds the next round's plan — the same driver-breakpoint shape
    * as iterative label propagation); each round's data work is one
    * partial-aggregated pair count plus a map-only rewrite, so a 100 TB
    * corpus costs `rounds` scans and tiny shuffles.
    *
    * Output: (round, pair, merged, n) — the merge table a tokenizer ships. */
  def bpeMerges(docs: DataFrame, textCol: String, rounds: Int = 3): DataFrame = {
    require(rounds > 0, s"rounds must be positive, got $rounds")
    require(docs.filter(col(textCol).contains("_")).isEmpty,
      "corpus contains the merge marker '_'; pick a marker absent from the data")
    val sp = docs.sparkSession
    var cur = docs.select(col(textCol).as("text"))
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val top: Option[Row] = cur
        .select(explode(TextOps.bigramsOf(TextOps.tokens(col("text")))).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(1).collect().headOption
      top.foreach { row =>
        val pair = row.getString(0)
        val merged = pair.replace(' ', '_')
        merges += ((r, pair, merged, row.getLong(1)))
        cur = cur.withColumn("text",
          expr(s"replace(text, '${pair.replace("'", "''")}', '${merged.replace("'", "''")}')"))
      }
    }
    import sp.implicits._
    merges.result().toDF("round", "pair", "merged", "n")
  }
}
