package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * Everything here is pure `org.apache.spark.sql.functions` composition —
  * codegen'd expressions inside WholeStageCodegen, no UDFs, no shuffles
  * beyond what the caller adds — so a 100 TB corpus scan stays a single
  * embarrassingly-parallel map over parquet splits.
  */
object TextOps {

  /** Per-invocation disambiguator for [[sourceContainment]]'s observe()
    * name (Spark requires observation names unique within one query). */
  private val containObsSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Whitespace tokens (empty text yields one empty token, like SQL split). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Canonical text form for normalization-based dedup (the C4 trick:
    * lowercase, strip punctuation, collapse whitespace BEFORE hashing, so
    * trivially-reformatted copies — case, punctuation, spacing — collapse
    * to one canonical string). Pure map over codegen'd builtins: lower →
    * non-alphanumerics to spaces → whitespace collapse → trim. The ASCII
    * character class is deliberate: it means the same RE2 pattern in an
    * external SQL engine normalizes identically. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** BPE-ish sub-word segments: letter runs, digit runs, single symbols. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|\\S"), lit(0)))

  def charCount(text: Column): Column = length(text)

  /** Punctuation chars per char — one regexp_replace, no explode. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def meanTokenLength(text: Column): Column =
    aggregate(tokens(text), lit(0), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(tokens(text)), lit(1)).cast("double")

  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column =
    size(filter(tokens(text), t => t.isin(EnStopwords: _*)))
      .cast("double") / greatest(size(tokens(text)), lit(1)).cast("double")

  /** Composite quality score in [0,1]: length-normalized, penalizes extreme
    * punctuation and rewards a natural stopword rate. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    round((lenScore + punctPenalty + stopScore) / 3.0, 6)
  }

  /** Per-language mini-lexicons for the n-gram/stopword language-ID
    * heuristic. Deterministic tie-break: lexicon order below. */
  val LangLexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "a", "in", "to", "is"),
    "es" -> Seq("el", "la", "de", "los", "en", "y", "que"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "nicht"),
    "fr" -> Seq("le", "la", "les", "des", "et", "un", "est"),
    "zh" -> Seq("de", "shi", "bu", "le", "ren", "wo"))

  private def lexScore(text: Column, lex: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(lex: _*)))

  /** Stopword-count language ID: argmax lexicon hit count, first-wins ties.
    * (An n-gram heuristic over a fixed lexicon — same class of detector as
    * fastText-style baselines, expressible as one codegen'd expression.) */
  def langId(text: Column): Column = {
    val scores = LangLexicons.map { case (lang, lex) => (lang, lexScore(text, lex)) }
    // argmax with first-wins tie-break: lang_i wins if score_i > score_j for
    // all j < i and score_i >= score_j for all j > i
    scores.zipWithIndex.foldLeft(lit("und")) { case (acc, ((lang, s), i)) =>
      val beatsEarlier = scores.take(i).map { case (_, s2) => s > s2 }
        .foldLeft(lit(true))(_ && _)
      val holdsLater = scores.drop(i + 1).map { case (_, s2) => s >= s2 }
        .foldLeft(lit(true))(_ && _)
      when(beatsEarlier && holdsLater && s > 0, lang).otherwise(acc)
    }
  }

  /** Top-k characteristic terms per document by tf·idf, with a LOG-FREE
    * rational idf so the score is bit-identical across engines:
    * score = (tf × N) / df — tf·N is exact integer arithmetic and the
    * single double division is correctly rounded everywhere, unlike ln()
    * whose last ulp differs between libm implementations. Shape: one
    * (doc, term) shuffle for tf, one term shuffle for df, a term-keyed
    * tf⋈df join, a per-doc top-k window — all partial-aggregated, no
    * collect, no driver-side count; scales like any word-count.
    *
    * The df side is deliberately NOT hint-broadcast: its cardinality is the
    * vocabulary, which grows with the corpus (hundreds of millions of terms
    * at 100 TB — far past any broadcast limit). The plan stays a term-keyed
    * shuffle join; AQE is free to downgrade it to a broadcast at runtime
    * when the vocabulary actually is small, which is the correct adaptive
    * behavior — a hint would force the impossible at scale. The corpus size
    * N joins in as a 1-row aggregate (broadcast by construction) instead of
    * a driver-side `count()` action. */
  def topTerms(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 3): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      // a blank/whitespace doc tokenizes to [""] — the empty term is not a
      // keyword (same guard every sibling term op applies)
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("score"), col("rank"))
  }

  /** Word bigrams WITH multiplicity ("w1 w2") — repetition counting needs
    * the duplicates that [[Dedup.shingles]] deliberately drops (and unlike
    * shingles, a single-token document has NO bigram here: shingles maps it
    * to the token itself to match MinHash sketch semantics, repetition
    * statistics must not). See also [[Dedup.tokenNgrams]], the distinct
    * general-n form — the three are intentionally distinct semantics, not
    * redundant copies. */
  def bigramsOf(toks: Column): Column =
    when(size(toks) <= 1, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))

  def bigrams(text: Column): Column = bigramsOf(tokens(text))

  /** Longest run of equal ADJACENT elements in a string array (0 for an
    * empty array). On a SORTED array this is the maximum multiplicity of any
    * element — the trick the repetition signals below use to stay a pure
    * per-row projection: `maxRun(array_sort(xs))` replaces an
    * explode → groupBy → max pipeline, so a 100 TB corpus scan stays
    * embarrassingly parallel with NO shuffle. The fold is a higher-order
    * `aggregate` (CodegenFallback, like all HOFs) but runs O(n) per row with
    * no allocation beyond the 3-field struct. */
  def maxRun(arr: Column): Column =
    aggregate(arr,
      struct(lit(null).cast("string").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, t) => {
        val run = when(t <=> acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1))
        struct(t.as("prev"), run.as("run"), greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1, adapted to
    * token level for single-line documents):
    *
    *  - `dupTokenFrac`: fraction of token occurrences that are repeats of an
    *    earlier token — 1 − distinct/total;
    *  - `topBigramCount`: multiplicity of the most frequent word bigram
    *    (max run of the sorted bigram array);
    *  - `topBigramFrac`: fraction of tokens covered by that bigram
    *    (count × 2 / n_tokens, the Gopher "top n-gram coverage" signal).
    *
    * All three are per-row projections — a quality-filter pass over 100 TB
    * is one parquet scan, no shuffle. */
  def dupTokenFrac(text: Column): Column =
    lit(1.0) - size(array_distinct(tokens(text))).cast("double") /
      greatest(size(tokens(text)), lit(1)).cast("double")

  def topBigramCount(text: Column): Column = maxRun(array_sort(bigrams(text)))

  def topBigramFrac(text: Column): Column =
    least(topBigramCount(text).cast("double") * 2.0 /
      greatest(size(tokens(text)), lit(1)).cast("double"), lit(1.0))

  /** Winnowing-style document fingerprint: lexicographic min of the MD5 of
    * every k-gram, via the native one-pass [[graft.functions.MinKgramMd5]]
    * expression (bit-identical to the
    * `array_min(transform(sequence(...), md5(substring(...))))` SQL form,
    * which is CodegenFallback and allocates per position). */
  def fingerprintExpr(textCol: String, k: Int = 16): Column =
    graft.functions.HashExprs.minKgramMd5(col(textCol), k)

  // --- PII scrubbing -------------------------------------------------------
  // Patterns stay inside the RE2 ∩ java.util.regex common subset (no
  // backreferences, no lookaround, ASCII \d), so the SAME pattern string is
  // exact in both Spark codegen and the DuckDB oracle.

  /** RFC-ish email addresses ("user.name+tag@host.co"). */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style phone numbers ("555-867-5309"). */
  val PhoneRe: String = "\\d{3}-\\d{3}-\\d{4}"

  /** Dotted-quad IPv4 literals (syntactic — no octet-range check, matching
    * the recall-first convention of corpus scrubbers). */
  val Ipv4Re: String = "(?:\\d{1,3}\\.){3}\\d{1,3}"

  /** Non-overlapping match count of one PII pattern — a codegen'd projection. */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Redact emails, then phones, then IPv4s with typed placeholder tokens.
    * Order matters only for nested matches (digits inside an email local
    * part are gone before the phone/IP passes); the fixed order makes the
    * output deterministic and cross-engine identical. A pure per-row
    * projection: the scrub pass over 100 TB is one parquet scan, no
    * shuffle. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
        lit(PhoneRe), lit("<PHONE>")),
      lit(Ipv4Re), lit("<IP>"))

  /** Inverted index over distinct word tokens: one row per term with its
    * document frequency and a posting list CAPPED at the `k` smallest doc
    * ids (rendered as a comma-joined string so the row is cross-engine
    * hashable). The cap is the scale contract: a stopword's posting list is
    * the whole corpus, and an uncapped `collect_list` would buffer millions
    * of ids in ONE aggregation state — here a per-term `row_number` bounds
    * every aggregation buffer at `k` BEFORE the collect, and `truncated`
    * marks capped terms so the loss is visible, never silent. `minDf` drops
    * hapax terms (df < minDf), the bulk of any vocabulary.
    *
    * Shape: tokens explode once; ONE term-keyed shuffle feeds the window
    * (rank + frequency as two frames of the same window spec) and the
    * groupBy rides the same partitioning — no second exchange. */
  def invertedIndex(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 20, minDf: Int = 2): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"invertedIndex: k must be positive, got $k")
    val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
    docs
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(tokens(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
      .withColumn("rn", row_number().over(w))
      .withColumn("df", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("df") >= minDf && col("rn") <= k)
      .groupBy(col("term"))
      .agg(max(col("df")).as("df"),
        array_join(sort_array(collect_list(col("doc_id"))), ",").as("postings"),
        (max(col("df")) > k).cast("int").as("truncated"))
  }

  /** Context-window chunking: split each document's token sequence into
    * fixed-size chunks of `chunkSize` tokens starting every `stride` tokens
    * (overlap = chunkSize − stride), the pass that turns raw documents into
    * training-context rows. Chunk starts are every multiple of `stride`
    * below the token count, so the tail chunk may be short but every token
    * is covered and no start is generated past the end. Output: (doc_id,
    * chunk_id, start_tok, n_chunk_tokens, chunk_md5) — the md5 of the
    * space-rejoined chunk stands in for the chunk text so the row stays
    * small and cross-engine hashable.
    *
    * A pure per-row explode (≤ n/stride + 1 rows per doc) — a 100 TB
    * chunking pass is one parquet scan, no shuffle. Blank documents are
    * dropped (whitespace split would yield one empty token). */
  def chunk(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, chunkSize: Int = 64, stride: Int = 48): org.apache.spark.sql.DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"chunk: need 0 < stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n"))
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0),
          floor((col("n") - 1) / lit(stride)).cast("int"))).as("chunk_id"))
      .select(col("doc_id"),
        col("chunk_id").cast("long").as("chunk_id"),
        (col("chunk_id") * stride).cast("long").as("start_tok"),
        least(col("n") - col("chunk_id") * stride, lit(chunkSize)).cast("long")
          .as("n_chunk_tokens"),
        md5(concat_ws(" ",
          slice(col("toks"), col("chunk_id") * stride + 1, lit(chunkSize))))
          .as("chunk_md5"))
  }

  /** KMV (k-minimum-values) distinct-cardinality sketch per stratum — the
    * cardinality-estimation primitive a 100 TB pipeline runs instead of an
    * exact COUNT(DISTINCT) when the distinct set itself is too large to
    * shuffle: hash every value to a uniform 64-bit point, keep only the k
    * smallest hashes per stratum, and estimate |distinct| ≈ (k−1)·2⁶⁴/h₍k₎
    * from the k-th smallest. Unlike HLL (whose register layout is
    * engine-specific), KMV over the md5-derived hash is EXACTLY
    * reproducible in SQL, so the estimate gets a full hash oracle:
    * the estimate is computed in 128-bit INTEGER arithmetic
    * ((k−1)·2⁶⁴ div h — Spark decimal(38,0) `div`, DuckDB HUGEINT `//`),
    * no float anywhere. A stratum with fewer than k distinct values
    * reports its exact count (the sketch saw everything).
    *
    * Output: (source, n_distinct_exact, est_kmv) — the exact count rides
    * along as the same window's full-frame count, making the estimator's
    * error visible in the result itself.
    *
    * Shape note: this formulation shuffles the distinct (stratum, value)
    * pairs to rank them (fine at documents-table vocabulary scale, and it
    * is what makes the exact count available for free); the true 100 TB
    * deployment keeps per-partition k-minimum heaps and merges them — the
    * same two-phase refinement [[Sampling.stratifiedExactK]] implements
    * for bounded top-k, at the cost of losing the exact count. */
  def kmvDistinct(docs: org.apache.spark.sql.DataFrame, stratumCol: String,
      textCol: String, k: Int = 64): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"kmvDistinct: k must be >= 2, got $k")
    val two64 = lit(new java.math.BigDecimal("18446744073709551616"))
    // XOR of the sign bit turns signed long order into unsigned hash order
    // (DuckDB's UBIGINT order); term breaks full-64-bit hash ties
    val w = Window.partitionBy(col("source"))
      .orderBy(col("h").bitwiseXOR(lit(Long.MinValue)), col("term"))
    docs
      .select(col(stratumCol).as("source"),
        explode(array_distinct(tokens(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
      .withColumn("h", graft.functions.HashExprs.md5NumberLower(col("term")))
      .withColumn("rk", row_number().over(w))
      .withColumn("nd", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("rk") === least(lit(k), col("nd")))
      .withColumn("u", when(col("h") < 0,
        col("h").cast("decimal(38,0)") + two64).otherwise(col("h").cast("decimal(38,0)")))
      .select(col("source"), col("nd").as("n_distinct_exact"),
        when(col("nd") < k, col("nd")).otherwise(
          expr(s"CAST($k - 1 AS DECIMAL(38,0)) * CAST('18446744073709551616' AS DECIMAL(38,0)) div u"))
          .as("est_kmv"))
  }

  /** Cross-source vocabulary overlap via KMV sketch ALGEBRA — the property
    * that makes sketches the right tool at 100 TB: k-minimum-values
    * sketches are MERGEABLE, so pairwise union/intersection cardinalities
    * of every source pair come from the tiny per-source sketches alone —
    * the full vocabularies never meet. Union estimate = the KMV estimator
    * over the merged (k smallest of A's ∪ B's sketch rows) sketch;
    * intersection by inclusion–exclusion over the three estimates, clamped
    * at 0. When the merged sketch holds fewer than k rows, both sides'
    * sketches were exhaustive and the union "estimate" is exact.
    *
    * Like [[kmvDistinct]], every estimate is 128-bit INTEGER arithmetic
    * over the md5-derived hash, so even the approximations hash-match the
    * SQL oracle; the EXACT pairwise counts ride along (computed from the
    * distinct (source, term) pairs — affordable at vocabulary scale, and
    * they make the estimator's error visible in the result). The source ×
    * source pair frame is a deliberate tiny crossJoin (#sources² rows).
    *
    * Output per pair (sa < sb): exact distinct counts, exact
    * intersection/union, and the sketch-derived union/intersection
    * estimates. */
  def vocabOverlap(docs: org.apache.spark.sql.DataFrame, stratumCol: String,
      textCol: String, k: Int = 64): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"vocabOverlap: k must be >= 2, got $k")
    val two64 = "CAST('18446744073709551616' AS DECIMAL(38,0))"
    def unsignedH = col("h").bitwiseXOR(lit(Long.MinValue))
    def estCol(mCol: Column): Column = when(mCol < k, mCol.cast("decimal(38,0)"))
      .otherwise(expr(s"CAST(${k - 1} AS DECIMAL(38,0)) * $two64 div u"))
    def withU(df: org.apache.spark.sql.DataFrame) = df.withColumn("u",
      when(col("h") < 0, col("h").cast("decimal(38,0)") + expr(two64))
        .otherwise(col("h").cast("decimal(38,0)")))
    val terms = docs
      .select(col(stratumCol).as("source"),
        explode(array_distinct(tokens(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
      .withColumn("h", graft.functions.HashExprs.md5NumberLower(col("term")))
    val w = Window.partitionBy(col("source")).orderBy(unsignedH, col("term"))
    val ranked = terms
      .withColumn("rk", row_number().over(w))
      .withColumn("nd", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val sketch = ranked.filter(col("rk") <= k)
      .select(col("source"), col("term"), col("h"), col("nd"))
    // per-source exact count + KMV estimate (the k-th ranked row carries it)
    val perSource = withU(ranked.filter(col("rk") === least(lit(k), col("nd"))))
      .select(col("source"), col("nd"), estCol(col("nd")).as("est"))
    val pairs = perSource
      .select(col("source").as("sa"), col("nd").as("nd_a"), col("est").as("est_a"))
      .crossJoin(perSource
        .select(col("source").as("sb"), col("nd").as("nd_b"), col("est").as("est_b")))
      .filter(col("sa") < col("sb")) // tiny: #sources² rows
    // merged pair sketch: distinct sketch rows of either side
    val merged = pairs.select(col("sa"), col("sb"))
      .join(sketch.withColumnRenamed("source", "sa"), Seq("sa"))
      .select(col("sa"), col("sb"), col("term"), col("h"))
      .unionByName(pairs.select(col("sa"), col("sb"))
        .join(sketch.withColumnRenamed("source", "sb"), Seq("sb"))
        .select(col("sa"), col("sb"), col("term"), col("h")))
      .distinct()
    val wp = Window.partitionBy(col("sa"), col("sb")).orderBy(unsignedH, col("term"))
    val kthUnion = withU(merged
      .withColumn("rk", row_number().over(wp))
      .withColumn("m", count(lit(1)).over(
        wp.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("rk") === least(lit(k), col("m"))))
      .select(col("sa"), col("sb"), estCol(col("m")).as("est_union"))
    // exact pairwise intersection from the distinct (source, term) pairs
    val inter = terms.select(col("source").as("sa"), col("term"))
      .join(terms.select(col("source").as("sb"), col("term")), Seq("term"))
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("inter_exact"))
    pairs
      .join(kthUnion, Seq("sa", "sb"))
      .join(inter, Seq("sa", "sb"), "left")
      .withColumn("inter_exact", coalesce(col("inter_exact"), lit(0L)))
      .select(col("sa"), col("sb"),
        col("nd_a").cast("long").as("nd_a"), col("nd_b").cast("long").as("nd_b"),
        col("inter_exact"),
        (col("nd_a") + col("nd_b") - col("inter_exact")).cast("long").as("union_exact"),
        col("est_union").cast("long").as("est_union"),
        greatest(lit(0).cast("decimal(38,0)"),
          col("est_a") + col("est_b") - col("est_union"))
          .cast("long").as("est_inter"))
  }

  /** Bigram language-model counts — the n-gram-LM training pass (KenLM-style
    * count collection) a corpus pipeline runs to score fluency or build a
    * cheap contamination/quality prior. For every adjacent token pair the
    * corpus-wide pair count c12, the prefix count c1 = Σ_w c(w1,w), and the
    * conditional probability P(w2|w1) as exact integer micro-units
    * (c12·10⁶ div c1 — both engines truncate the same integer division, so
    * even the "probability" column hash-matches). Pairs below `minCount`
    * are dropped AFTER the prefix totals are taken, so c1 remains the true
    * LM denominator.
    *
    * Shape: bigrams come from zipping each token array with its own tail —
    * a pure map-side explode, no per-document window, no positional
    * self-join (at 100 TB a posexplode+lead formulation would add a
    * corpus-sized (doc, pos) shuffle before the count even starts). Then
    * one (w1,w2) count shuffle with map-side partial aggregation, and the
    * prefix-total window re-keys on w1 alone. */
  def bigramLm(docs: org.apache.spark.sql.DataFrame, textCol: String,
      minCount: Long = 3L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = filter(tokens(col(textCol)), t => length(t) > 0)
    docs
      .select(toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .withColumn("c1", sum(col("c12")).over(Window.partitionBy(col("w1"))))
      .filter(col("c12") >= minCount)
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        expr("CAST(c12 AS DECIMAL(38,0)) * 1000000 div c1").as("p_micro"))
  }

  /** PMI-ranked collocations — the corpus-analysis pass that surfaces
    * multi-word expressions ("new york", "machine learning") for tokenizer
    * vocabulary decisions and phrase-aware dedup. For every adjacent token
    * pair: c12 (pair count), c1 (count of w1 in FIRST position), c2 (count
    * of w2 in SECOND position), and the PMI association strength. PMI =
    * log(c12·N / (c1·c2)) is reported as its argument — the LIFT ratio in
    * exact integer micro-units (c12·N·10⁶ div c1·c2): log is monotone, so
    * lift ranks identically, and integer division hash-matches any SQL
    * engine bit-for-bit where cross-engine libm `log` would not.
    *
    * Shape: same map-side tail-zip explode as [[bigramLm]] (no positional
    * shuffle), one (w1,w2) count shuffle with map-side partials, two keyed
    * window re-sums for the marginals, and a broadcast 1-row total for N —
    * never an unkeyed window (an `over ()` would funnel the whole pair
    * vocabulary through one task at 100 TB). The final top-N is a
    * TakeOrderedAndProject, not a global sort. */
  def pmiCollocations(docs: org.apache.spark.sql.DataFrame, textCol: String,
      minCount: Long = 5L, topN: Int = 20): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = filter(tokens(col(textCol)), t => length(t) > 0)
    val counts = docs
      .select(toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val total = counts.agg(sum(col("c12")).as("n"))
    counts
      .withColumn("c1", sum(col("c12")).over(Window.partitionBy(col("w1"))))
      .withColumn("c2", sum(col("c12")).over(Window.partitionBy(col("w2"))))
      .filter(col("c12") >= minCount)
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        expr("CAST(c12 AS DECIMAL(38,0)) * n * 1000000 div (CAST(c1 AS DECIMAL(38,0)) * c2)")
          .as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("w1"), col("w2"))
      .limit(topN)
  }

  /** Token-distribution DRIFT between two corpus snapshots — the
    * monitoring pass a training-data pipeline runs on every corpus
    * rebuild: a token whose smoothed frequency ratio spikes flags
    * contamination, genre shift, a broken extractor, or over-aggressive
    * dedup long before a model trains on it. Per token: before/after
    * counts and the add-1-smoothed relative-rate LIFT in exact integer
    * micro-units, `((ca+1)·(nb+V)·10⁶) div ((cb+1)·(na+V))` — the
    * argument of the log-likelihood drift score (log is monotone, so
    * ranking matches, and integer division hash-matches any engine where
    * float log would not); V (joint vocabulary) is the add-1 mass.
    *
    * Shape: the two snapshots UNION with a snapshot tag and count in ONE
    * (token)-keyed shuffle with map-side partials — no token join at all
    * (a per-snapshot count + full-outer join would shuffle twice and join
    * once); totals ride back as a broadcast 1-row frame, and the top-N is
    * a TakeOrderedAndProject, never a global sort. */
  def tokenDrift(before: org.apache.spark.sql.DataFrame,
      after: org.apache.spark.sql.DataFrame, textCol: String,
      topN: Int = 20): org.apache.spark.sql.DataFrame = {
    val toks = filter(tokens(col(textCol)), t => length(t) > 0)
    val c = before.select(toks.as("toks"), lit(0).as("snap"))
      .unionByName(after.select(toks.as("toks"), lit(1).as("snap")))
      .select(explode(col("toks")).as("token"), col("snap"))
      .groupBy(col("token"))
      .agg(sum(when(col("snap") === 0, 1L).otherwise(0L)).as("cb"),
        sum(when(col("snap") === 1, 1L).otherwise(0L)).as("ca"))
    val t = c.agg(sum(col("cb")).as("nb"), sum(col("ca")).as("na"),
      count(lit(1)).as("v"))
    c.crossJoin(broadcast(t))
      .select(col("token"), col("cb"), col("ca"),
        expr("CAST(ca + 1 AS DECIMAL(38,0)) * (nb + v) * 1000000 div " +
          "(CAST(cb + 1 AS DECIMAL(38,0)) * (na + v))").as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("token"))
      .limit(topN)
  }

  /** Gopher-style quality-rule bundle: the battery of cheap heuristic
    * filters a training-data pipeline runs over every document BEFORE any
    * expensive processing (Rae et al. 2021 "Scaling Language Models",
    * Appendix A — the rule STRUCTURE; the thresholds here are tuned to the
    * synthetic corpus). One codegen'd projection per document — tokenizes
    * once via a lateral alias, every verdict in exact integer micro-units
    * (no float thresholds, so the pass/fail booleans hash-match any SQL
    * engine bit-for-bit). At 100 TB this is one parquet scan, no shuffle:
    * the cheapest 30-50% corpus reduction available, which is why it runs
    * first in every real pipeline. Rules:
    *
    *  - `ok_len`:   token count within [minTokens, maxTokens]
    *  - `ok_mean`:  mean token length within [2, 10] (micro-units)
    *  - `ok_stop`:  at least `minStopwords` (English) stopwords
    *  - `ok_uniq`:  unique-token fraction ≥ 40% (kills word-salad spam)
    *  - `ok_punct`: punctuation ≤ 10% of characters
    *
    * `pass` = all five. */
  def gopherRules(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minTokens: Int = 30, maxTokens: Int = 10000,
      minStopwords: Int = 1): org.apache.spark.sql.DataFrame = {
    val toks = filter(tokens(col(textCol)), t => length(t) > 0)
    docs
      .select(col(idCol), col(textCol).as("__text"), toks.as("__toks"))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        (aggregate(col("__toks"), lit(0L), (acc, t) => acc + length(t)) * 1000000L)
          .as("__len_sum_m"),
        (size(array_distinct(col("__toks"))).cast("long") * 1000000L)
          .as("__uniq_m"),
        size(filter(col("__toks"), t => t.isin(EnStopwords: _*)))
          .cast("long").as("n_stopwords"),
        ((length(col("__text")) - length(regexp_replace(col("__text"), "[.,!?;:]", "")))
          .cast("long") * 1000000L).as("__punct_m"),
        length(col("__text")).cast("long").as("__chars"))
      .select(col(idCol), col("n_tokens"), col("n_stopwords"),
        expr("__len_sum_m div greatest(n_tokens, 1)").as("mean_len_micro"),
        expr("__uniq_m div greatest(n_tokens, 1)").as("uniq_frac_micro"),
        expr("__punct_m div greatest(__chars, 1)").as("punct_frac_micro"))
      .select(col(idCol), col("n_tokens"), col("n_stopwords"),
        col("mean_len_micro"), col("uniq_frac_micro"), col("punct_frac_micro"),
        (col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens).as("ok_len"),
        (col("mean_len_micro") >= 2000000L && col("mean_len_micro") <= 10000000L)
          .as("ok_mean"),
        (col("n_stopwords") >= minStopwords).as("ok_stop"),
        (col("uniq_frac_micro") >= 400000L).as("ok_uniq"),
        (col("punct_frac_micro") <= 100000L).as("ok_punct"))
      .withColumn("pass",
        col("ok_len") && col("ok_mean") && col("ok_stop") &&
          col("ok_uniq") && col("ok_punct"))
  }

  /** Per-document language-model quality score: the mean conditional bigram
    * probability under the corpus's own bigram LM ([[bigramLm]]), in exact
    * integer micro-units — the integer-arithmetic stand-in for the CCNet
    * perplexity filter (docs scoring far below the corpus norm are noise;
    * far above are boilerplate). Bigrams the LM dropped (below `minCount`)
    * back off to probability 0, which is exactly the pessimism a filter
    * wants for rare garbage.
    *
    * Shape: the LM is one (w1,w2)-keyed aggregate of the corpus; scoring
    * re-explodes each document's bigrams and LEFT-joins the LM — one
    * shuffle each side of the join, partial aggregation before both. The
    * join key is the raw bigram pair; at 100 TB you would dictionary-encode
    * the vocabulary first (the LM table IS that dictionary) so the join
    * moves two ints per bigram, not strings — same plan shape, smaller
    * bytes. */
  def lmScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minCount: Long = 3L): org.apache.spark.sql.DataFrame = {
    val lm = bigramLm(docs, textCol, minCount)
      .select(col("w1"), col("w2"), col("p_micro"))
    val toks = filter(tokens(col(textCol)), t => length(t) > 0)
    docs
      .select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col(idCol), explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .join(lm, Seq("w1", "w2"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("p_micro"), lit(0L).cast("decimal(38,0)")))
          .as("__p_sum"))
      .select(col(idCol), col("n_bigrams"),
        expr("CAST(__p_sum div n_bigrams AS BIGINT)").as("score_micro"))
  }

  /** BM25 keyword retrieval with EXACT integer scoring — the lexical-search
    * complement of the vector-ANN family: for the `nQueryTerms` highest-df
    * terms (a deterministic stand-in for a user query), the top `k`
    * documents by BM25. The standard formula
    * idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) with k1=6/5, b=3/4 and the
    * log-free rational idf (2N−2df+1)/(2df+1) (same monotone-idf trick as
    * the tf·idf keywords op) clears denominators to pure integers:
    *
    *   score ∝ (2N−2df+1)·22·T·tf  /  (2df+1)·(10·T·tf + 3·T + 9·dl·N)
    *
    * where N = corpus docs, T = total tokens, dl = document length — one
    * 128-bit integer division to micro-units, no float anywhere, so the
    * ranking AND the scores hash-match cross-engine.
    *
    * Shape: one (term, doc) count shuffle with map-side combine; df rides
    * a term-keyed window on the SAME rows; the two corpus scalars (N, T)
    * broadcast as a one-row aggregate (never a driver collect); query
    * terms are a TakeOrderedAndProject top-`nQueryTerms` broadcast back as
    * a semi-join, so the candidate set shrinks to matching postings before
    * any scoring work. Per-term ranking partitions by term — fine, query
    * terms are few by construction.
    *
    * The totals aggregate IS a second tokenize pass over the corpus. A
    * marker-row fusion (a NULL-term row per doc riding the tf shuffle) was
    * tried and reverted: the isnull/isnotnull split pushes below the shared
    * aggregate (filters on a group key), forking the subtree into THREE
    * non-reusable explodes — measurably slower than the extra size-only
    * pass, which never explodes. */
  def bm25Search(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, nQueryTerms: Int = 3, k: Int = 10): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toksCol = filter(tokens(col(textCol)), t => length(t) > 0)
    val toked = docs.select(col(idCol).as("doc_id"), toksCol.as("toks"))
    val totals = toked.agg(count(lit(1)).as("n_docs"),
      sum(size(col("toks")).cast("long")).as("t_tokens"))
    val tf = toked
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
    val queryTerms = tf.select(col("term"), col("df")).distinct()
      .orderBy(col("df").desc, col("term").asc).limit(nQueryTerms)
    val byTerm = Window.partitionBy(col("term"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    tf.join(broadcast(queryTerms.select(col("term"))), Seq("term"))
      .crossJoin(broadcast(totals))
      .withColumn("score_micro", expr(
        // Every denominator product starts from a DECIMAL(38,0) factor so the
        // whole score stays in 128-bit integers: 10*t_tokens*tf in BIGINT
        // silently wraps past ~9.2e18 (non-ANSI), and the DuckDB oracle's
        // HUGEINT math would diverge exactly there.
        """CAST(2*n_docs - 2*df + 1 AS DECIMAL(38,0)) * 22 * t_tokens * tf * 1000000
          | div (CAST(2*df + 1 AS DECIMAL(38,0)) *
          |      (CAST(10 AS DECIMAL(38,0)) * t_tokens * tf +
          |       CAST(3 AS DECIMAL(38,0)) * t_tokens +
          |       CAST(9 AS DECIMAL(38,0)) * dl * n_docs))""".stripMargin))
      .withColumn("rank", row_number().over(byTerm))
      .filter(col("rank") <= k)
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"),
        col("score_micro"), col("rank"))
  }

  /** Per-source token-length histogram in power-of-two buckets — the
    * dataset-card statistics pass (length distributions per source) every
    * corpus release ships. Bucketing is EXACT integer arithmetic on both
    * engines: bucket = number of binary digits of the token count
    * (`length(bin(n))` = ⌊log2 n⌋+1 — no float log anywhere), the bucket's
    * lower bound is an integer shift. Map-only projection + one
    * (source, bucket) count shuffle with map-side combine; output
    * cardinality is sources × ~60 buckets, independent of corpus size. */
  def lengthHistogram(docs: org.apache.spark.sql.DataFrame, srcCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val nTok = size(filter(tokens(col(textCol)), t => length(t) > 0))
    docs.select(col(srcCol).as("source"), nTok.cast("long").as("n_tokens"))
      .withColumn("bucket", when(col("n_tokens") <= 0, lit(0))
        .otherwise(length(bin(col("n_tokens")))).cast("int"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("lo", when(col("bucket") === 0, lit(0L))
        .otherwise(expr("shiftleft(CAST(1 AS BIGINT), bucket - 1)")))
      .select(col("source"), col("bucket"), col("lo"), col("n_docs"), col("sum_tokens"))
  }

  /** Cross-document boilerplate coverage: the fraction of each document's
    * token positions covered by some word `n`-gram that appears in ≥ `minDf`
    * DISTINCT documents — the corpus-level complement of the within-doc
    * repetition signals above (C4/CCNet-style frequent-span removal, at the
    * token-window level because this corpus has no line structure).
    * Output: (doc_id, n_tokens, boilerplate_tokens, boilerplate_frac).
    *
    * Shape: positioned n-grams explode once; document frequency is one
    * gram-keyed shuffle (partial-aggregated two-phase distinct); frequent
    * grams join back on the gram key (AQE broadcasts when the hot set is
    * small — not hinted, because a boilerplate-heavy corpus can make it
    * large); covered-position count is an interval-merge FOLD over the
    * sorted start offsets (`aggregate` over ≤ doc-length ints), not a
    * per-position explode — per-doc state stays bounded by document length,
    * the unit the pipeline already holds in memory. */
  def boilerplateCoverage(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int = 8, minDf: Int = 2): org.apache.spark.sql.DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n_tokens"))
    val posGrams = base
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("toks")) - n),
          i => struct(i.as("i"),
            concat_ws(" ", slice(col("toks"), i + 1, lit(n))).as("gram")))).as("g"))
      .select(col("doc_id"), col("g.i").as("i"), col("g.gram").as("gram"))
    val hotGrams = posGrams
      .groupBy(col("gram")).agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("gram"))
    // starts are sorted ascending and every gram spans n positions, so the
    // running exclusive end never exceeds s + n: each start contributes
    // (s + n) − max(s, prevEnd) ∈ (0, n] new covered positions
    val covered = posGrams.join(hotGrams, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("i"))).as("starts"))
      .select(col("doc_id"),
        aggregate(col("starts"),
          struct(lit(0).as("total"), lit(0).as("prevEnd")),
          (a, s) => struct(
            (a.getField("total") + (s + n - greatest(s, a.getField("prevEnd"))))
              .as("total"),
            (s + n).as("prevEnd")),
          a => a.getField("total")).as("covered"))
    base.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("covered"), lit(0)).as("boilerplate_tokens"),
        (coalesce(col("covered"), lit(0)).cast("double") /
          greatest(col("n_tokens"), lit(1)).cast("double")).as("boilerplate_frac"))
  }

  /** EXACT corpus quantiles of tokens-per-document — order statistics
    * without sorting the corpus. A 100 TB corpus cannot afford a global
    * sort (the naive quantile), and mergeable sketches (t-digest/KLL) give
    * approximations; but tokens-per-doc lives in a small DISCRETE domain,
    * so the exact answer reduces to a value HISTOGRAM first: one
    * map-combined groupBy collapses the corpus to ≤ |domain| rows (~10⁴),
    * a single-task running sum over those rows builds the exact CDF (the
    * one task touches domain-sized data, never corpus-sized), and each
    * requested quantile reads off the smallest value whose cumulative
    * count reaches `ceil(p·n)` — the `quantile_disc` definition, computed
    * with explicit integer arithmetic so both engines agree bit-for-bit.
    *
    * Output per requested quantile: (p_micro, rank, value, n). */
  def exactQuantiles(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String,
      quantilesMicro: Seq[Long] = Seq(250000L, 500000L, 750000L, 900000L, 990000L))
      : org.apache.spark.sql.DataFrame = {
    val lens = docs.select(
      size(filter(tokens(col(textCol)), t => length(t) > 0)).cast("long").as("v"))
    val hist = lens.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cdf = hist.withColumn("cum", sum(col("c")).over(w))
      .crossJoin(broadcast(hist.agg(sum(col("c")).as("n"))))
    val sp = docs.sparkSession
    import sp.implicits._
    val qs = quantilesMicro.toDF("p_micro")
    cdf.join(broadcast(qs),
        col("cum") >= expr("(p_micro * n + 999999) div 1000000"))
      .groupBy(col("p_micro"))
      .agg(min(expr("(p_micro * n + 999999) div 1000000")).as("rank"),
        min(col("v")).as("value"), min(col("n")).as("n"))
      .select(col("p_micro"), col("rank"), col("value"), col("n"))
  }

  /** Out-of-vocabulary rate against the corpus's own top-`vocabSize`
    * token vocabulary — the tokenizer-coverage diagnostic run before
    * committing a vocab budget: documents with a high OOV fraction will
    * fragment into byte-level pieces and train poorly. Vocabulary = the
    * `vocabSize` most frequent tokens (ties broken token-ascending, so the
    * set is deterministic across engines and partitionings).
    *
    * Output: (doc_id, n_tokens, oov_tokens, oov_micro) in exact integer
    * micro-units; empty docs score 0.
    *
    * Shape at 100 TB: token counting is one map-combined aggregate; the
    * top-K selection is a TakeOrdered (per-partition heaps, never a global
    * sort); the K-row vocabulary BROADCASTS into the scoring pass, which
    * is a map-side membership probe + one doc-keyed aggregate. No gram
    * shuffle, no quadratic term. */
  def oovRate(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, vocabSize: Int = 500): org.apache.spark.sql.DataFrame = {
    val occ = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(filter(tokens(col(textCol)), t => length(t) > 0)).as("tok"))
    val vocab = occ.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc).limit(vocabSize)
      .select(col("tok"), lit(true).as("__in"))
    val scored = occ.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, lit(1L)).otherwise(lit(0L))).as("oov_tokens"))
      .withColumn("oov_micro",
        expr("oov_tokens * 1000000 div greatest(n_tokens, 1)"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("oov_tokens"), lit(0L)).as("oov_tokens"),
        coalesce(col("oov_micro"), lit(0L)).as("oov_micro"))
  }

  /** Source-to-source n-gram CONTAINMENT matrix — the dataset-card
    * cross-overlap number ("X % of source A's distinct 5-grams appear in
    * source B"), directional (containment, not Jaccard — a small corpus
    * fully inside a big one reads 100 % one way and small the other),
    * diagonal rows included as the self-check (always 10⁶).
    * Complements [[vocabOverlap]] (unigram vocabulary, KMV-estimated
    * union) with exact phrase-level containment.
    *
    * Scale shape: per-source distinct grams (map-side `array_distinct`
    * then one (source, gram) distinct — the only corpus-sized shuffle);
    * each gram then carries its source SET (`collect_set`, bounded by
    * #sources) and the pair fan-out is |set|² per gram, aggregated with
    * partial combine. NO gram-keyed self-join: the matrix falls out of
    * one aggregation, and the per-source denominators broadcast.
    *
    * '''Stratum-cardinality domain''': `stratumCol` is a dataset-card
    * stratum (tens to a few hundred sources), NOT an open-ended column
    * like crawl domain — the fan-out is |sources-sharing-gram|² per gram,
    * and a boilerplate gram present in thousands of strata would emit
    * millions of pair rows (per-domain dedup rates are [[Dedup]]'s px68
    * composition instead). Grams whose source set exceeds `maxSources`
    * are DROPPED from the matrix — numerator and denominator
    * consistently, since the diagonal is computed from the same retained
    * gram population — with the drop count reported through the same
    * `observe` channel [[Dedup.capBuckets]] uses (never silent). */
  def sourceContainment(docs: org.apache.spark.sql.DataFrame,
      stratumCol: String, textCol: String, n: Int = 5,
      maxSources: Int = 512): org.apache.spark.sql.DataFrame = {
    require(maxSources > 1, s"sourceContainment: maxSources must be > 1, got $maxSources")
    GraftMetrics.ensureListener(docs.sparkSession)
    // the gram explode is the expensive map — when the input arrives in
    // FEWER splits than the cluster has slots (a single test parquet; a
    // 100 TB corpus has thousands of splits and must NOT be reshuffled
    // just to explode), spread the doc rows first. The smallness probe is
    // logical-plan STATS (catalog/file sizes, no job, no RDD lineage
    // materialization on the driver): an input smaller than what fills
    // every slot at the configured split size cannot scan into
    // >= parallelism splits. Compute the whole matrix from ONE subtree:
    // the denominators ARE the diagonal (|A ∩ A| = |A|), so no second
    // gram pass exists to re-run
    val sess = docs.sparkSession
    val parallelism = sess.sparkContext.defaultParallelism
    val maxSplit = sess.sessionState.conf.filesMaxPartitionBytes
    val statsSmall = docs.queryExecution.optimizedPlan.stats.sizeInBytes <
      BigInt(parallelism.toLong) * maxSplit
    // The stats probe is trustworthy only for file-backed inputs (file
    // sizes). A DERIVED frame (post-join/filter, no CBO stats) reports a
    // coarse over-estimate — a product of its children — so a genuinely
    // 1-2-split input could skip the spread and serialize the gram explode
    // onto a couple of slots. For those, fall back to the physical
    // partition count (costs one planning pass; file-scan inputs — the
    // 100 TB path — never take it).
    val fileBacked = docs.queryExecution.optimizedPlan.collectLeaves().forall {
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
      case _ => false
    }
    val small = statsSmall ||
      (!fileBacked && docs.rdd.getNumPartitions < parallelism)
    val spread = if (small) docs.repartition(parallelism) else docs
    val pd = spread
      .select(col(stratumCol).as("src"),
        explode(Dedup.tokenNgramsOf(tokens(coalesce(col(textCol), lit(""))), n))
          .as("gram"))
      .distinct()
    val hot = size(col("ss")) > maxSources
    val inter = pd.groupBy(col("gram")).agg(collect_set(col("src")).as("ss"))
      .observe(s"graft.sourceContainment.${containObsSeq.incrementAndGet()}",
        coalesce(sum(when(hot, lit(1L)).otherwise(lit(0L))), lit(0L))
          .as("dropped_grams"))
      .filter(!hot)
      .select(explode(col("ss")).as("source_a"), col("ss"))
      .select(col("source_a"), explode(col("ss")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("inter_grams"))
    val diag = inter.filter(col("source_a") === col("source_b"))
      .select(col("source_a"), col("inter_grams").as("a_grams"))
    inter
      .join(broadcast(diag), Seq("source_a"))
      .select(col("source_a"), col("source_b"), col("inter_grams"),
        col("a_grams"),
        expr("inter_grams * 1000000 div a_grams").as("containment_micro"))
  }
}
