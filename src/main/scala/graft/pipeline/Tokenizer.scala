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
    * pair) merges into one token (`"a b"` → `"a_b"`).
    *
    * The working text is whitespace-NORMALIZED once up front
    * (`\s+` → single space), so every counted pair is separated by exactly
    * one space and the merge rewrite matches every counted occurrence —
    * without this, pairs straddling newlines/tabs would be counted but
    * never merged. Merge application is `replace(text, "a b", "a_b")` —
    * left-to-right, non-overlapping, identical semantics in Spark and SQL
    * engines; for immediately repeated pairs ("a b a b") only alternating
    * occurrences merge in one round, which IS standard BPE behavior for
    * overlapping pair instances. The pair is passed as a bound literal
    * (never spliced into SQL text, where backslashes would be re-parsed
    * as escapes).
    *
    * Marker safety: a corpus token already containing `_` could conflate
    * with merged tokens in later rounds. The check rides round 1's pair
    * aggregate (a pair string contains every token that is ever adjacent
    * to another; single-token documents produce no pairs and cannot
    * interact with merges), so it costs no extra corpus scan.
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
    val sp = docs.sparkSession
    var cur = docs.select(
      regexp_replace(trim(col(textCol)), "\\s+", " ").as("text"))
    // each round's rewrite chains on the previous round's TEXT: without a
    // materialization barrier, round r's lazy lineage re-runs all r-1
    // earlier rewrites plus the tokenize/explode on every pass — total
    // work quadratic in rounds. Persisting the working text makes round r
    // read round r-1's cached rewrite once (MEMORY_AND_DISK: the working
    // set is the corpus itself, so spill beats recompute at scale; a
    // 100 TB deployment would checkpoint every few rounds instead). The
    // previous round's cache is dropped only AFTER the round's action has
    // populated the new one — unpersisting earlier would force the new
    // cache to recompute the whole rewrite chain it was meant to cut.
    var live: List[DataFrame] = Nil // persisted working texts, newest first
    def materialize(df: DataFrame): DataFrame = {
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      live = p :: live
      p
    }
    def dropSuperseded(): Unit = {
      live.drop(1).foreach(_.unpersist(blocking = false))
      live = live.take(1)
    }
    cur = materialize(cur)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      // ONE job: deterministic argmax (max n, then lexicographically
      // smallest pair — min_by over the (-n, pair) struct) + the round-1
      // marker-collision check, both partial-aggregated
      // tokenize into a materialized column FIRST: passing tokens(text)
      // straight into the bigram HOF splices the split expression into the
      // lambda body, where interpreted evaluation re-runs the split for
      // EVERY element_at — O(tokens²) per document (the px16 trap)
      val row: Row = cur
        .select(TextOps.tokens(col("text")).as("toks"))
        .select(explode(TextOps.bigramsOf(col("toks"))).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("n"))
        .agg(
          min_by(struct(col("pair"), col("n")),
            struct((-col("n")).as("nn"), col("pair"))).as("top"),
          max(col("pair").contains("_")).as("marker"))
        .first()
      dropSuperseded() // this round's action populated the newest cache
      if (r == 1 && !row.isNullAt(1) && row.getBoolean(1)) throw new IllegalArgumentException(
        "corpus contains the merge marker '_'; pick a marker absent from the data")
      if (!row.isNullAt(0)) {
        val top = row.getStruct(0)
        val pair = top.getString(0)
        val merged = pair.replace(' ', '_')
        merges += ((r, pair, merged, top.getLong(1)))
        if (r < rounds) cur = materialize(cur.withColumn("text",
          call_function("replace", col("text"), lit(pair), lit(merged))))
      }
    }
    live.foreach(_.unpersist(blocking = false))
    import sp.implicits._
    merges.result().toDF("round", "pair", "merged", "n")
  }
}
