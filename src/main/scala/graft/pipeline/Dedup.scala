package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  * The LSH family (MinHash, SimHash, and [[Similarity.embeddingNearDupPairs]])
  * shares two defenses against the adversarial case a training corpus is
  * guaranteed to contain — boilerplate (identical headers, mirrored pages)
  * that lands millions of documents in ONE bucket and turns the candidate
  * join quadratic:
  *
  *  1. '''exact pre-dedup''': documents are grouped by exact content first
  *     (one hash-window pass); only one REPRESENTATIVE per distinct content
  *     enters sketching and bucketing, so identical documents cost one
  *     sketch instead of m, and their m·(m-1)/2 output pairs are generated
  *     by a cheap expansion join at the end (identical content ⇒ identical
  *     similarity, so the expansion is exact, not approximate);
  *  2. '''per-bucket caps''' ([[capBuckets]]): a (band, bucket) bucket keeps
  *     at most `maxBucket` representatives, chosen deterministically from
  *     salted sub-cells so no single task ever sorts a whole hot bucket; the
  *     overflow is counted and LOGGED, never silently dropped. With distinct
  *     content already collapsed, a cap-sized bucket means `maxBucket`
  *     *different* documents agreeing on a sketch band — overwhelmingly a
  *     boilerplate pathology, not signal.
  *
  * All hashes are seed-fixed (xxhash64/md5) — runs are deterministic.
  */
object Dedup {

  @transient private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Default per-(band,bucket) representative cap for LSH candidate
    * generation. Candidate volume per cell is Θ(cell²); 10⁵ caps a single
    * cell's pairs at ~5·10⁹ — large, but bounded and spillable — where an
    * uncapped boilerplate bucket of 10⁷ docs would be 5·10¹³. */
  val DefaultMaxBucket: Int = 100000

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

  // ---- shared machinery for the capped, pre-deduped LSH family -------------

  /** Collapse exact-duplicate content to one representative row per group.
    * Returns `(repRows, membersOpt)`:
    *
    *  - the duplicate check is ONE map-side-combined aggregate over
    *    `(contentKey, id)` — no shuffle of the payload, no window sort;
    *  - when the corpus has NO exact duplicates (the common case once
    *    upstream exact dedup ran), `membersOpt` is None and `repRows` is the
    *    input unchanged — callers skip the expansion machinery entirely and
    *    the plan equals the direct formulation plus this one cheap check;
    *  - with duplicates, `repRows` keeps only group minimum-id rows (inner
    *    join against the rep-id set) and `membersOpt` carries the persisted
    *    (id, rep) mapping for the final pair expansion. `repRows` is
    *    persisted: several sketch branches consume it, and without the cache
    *    each would recompute the scan→group→join subtree; its size is
    *    proportional to DISTINCT content (what survived dedup), not the
    *    corpus, and primitive columns cache columnar.
    *
    * The check is an eager driver-side branch: plan specialization from a
    * cheap statistic, the same trick AQE applies at runtime.
    *
    *  - The statistic (LARGEST exact-dup group size) is MEMOIZED per
    *    canonicalized input plan, so a process that runs several LSH
    *    operators over the same corpus (px7 then px14, Verify, Bench) pays
    *    the check job once, not once per operator. The cache can only go
    *    stale if the files behind an identical plan are rewritten in-process
    *    — which would flip a performance branch, never an answer.
    *  - The collapse only engages when some group EXCEEDS
    *    `collapseThreshold`: a handful of small duplicate groups is exactly
    *    what the sketch join handles natively (identical content ⇒ identical
    *    sketch ⇒ same bucket ⇒ pair found, at m²/2 candidate cost for a
    *    group of m — trivial below the threshold), and engaging the
    *    member-mapping/expansion machinery for them costs more than it
    *    saves. Keeping the threshold ≤ the bucket cap guarantees a bucket
    *    whose size is driven by ONE dup group was collapsed before
    *    [[capBuckets]] could truncate it. A bucket can still exceed the cap
    *    from >maxBucket DISTINCT contents agreeing on a sketch band; the
    *    cap then drops candidates (possibly including small-dup-group
    *    pairs) — that loss is the cap's documented recall trade and is
    *    always LOGGED via the observe metric, never silent. A stale cached
    *    statistic (files rewritten in-process behind an identical plan) can
    *    likewise only defer the collapse into the logged-cap regime. */
  /** The stat cache keys are full canonicalized plans (exact, collision-
    * free); bound the entry count so long-lived drivers that touch many
    * distinct corpora don't accumulate plan trees (LocalRelation keys pin
    * their row data). Eviction just re-runs the one-job statistic. */
  private val DupStatCacheMax = 64

  /** access-ordered LRU, evicting one-at-a-time past the cap (a wholesale
    * clear() would re-run every live corpus's statistic on next touch);
    * synchronized — the cache is driver-side, contention-free. */
  private val dupStatCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, java.lang.Long](
        16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, java.lang.Long]): Boolean =
        size() > DupStatCacheMax
    })

  /** Largest exact-dup group size above which the collapse machinery
    * engages: 1024²/2 candidate pairs per uncollapsed group is the most the
    * direct path is allowed to enumerate. */
  val DefaultCollapseThreshold: Int = 1024

  /** Detect oversized exact-duplicate groups and, when one exceeds
    * `collapseThreshold`, return a collapsed frame (one representative per
    * content key) plus the rep→member mapping needed to fan results back
    * out; below the threshold the input passes through untouched (None).
    * The max-group probe is memoized per canonicalized plan via
    * [[dupStatCache]] so repeated calls over the same input pay one job. */
  private[pipeline] def exactGroupReps(rows: DataFrame, contentKey: Column,
      collapseThreshold: Int = DefaultCollapseThreshold): (DataFrame, Option[DataFrame]) = {
    val keyed = rows.withColumn("__ck", contentKey)
    val groups = keyed.select(col("__ck"), col("id"))
      .groupBy(col("__ck")).agg(min(col("id")).as("rep"), count(lit(1)).as("gs"))
    val maxGroup = dupStatCache.computeIfAbsent(
      keyed.queryExecution.analyzed.canonicalized,
      _ => groups.agg(coalesce(max(col("gs")), lit(0L))).first().getLong(0))
    if (maxGroup <= collapseThreshold) (rows, None)
    else {
      // localCheckpoint, NOT persist: both frames are consumed repeatedly by
      // the caller's joins, but this function can hand out no unpersist
      // handle — a persist() would pin its plan in the CacheManager FOREVER
      // (strong reference, never GC'd). Checkpoint blocks are released by
      // the ContextCleaner once the returned frames become unreachable, so
      // long-lived drivers looping over corpora don't accumulate them.
      val members = keyed.select(col("__ck"), col("id"))
        .join(groups.select(col("__ck"), col("rep")), Seq("__ck"))
        .select(col("id"), col("rep"))
        .localCheckpoint(true)
      val repRows = rows.join(groups.select(col("rep").as("id")), Seq("id"))
        .localCheckpoint(true)
      (repRows, Some(members))
    }
  }

  /** Salted cells per bucket: a bucket never sorts in one task — each of the
    * `CapSalts` cells handles ~1/16 of even the hottest bucket. */
  private[pipeline] val CapSalts = 16

  /** Cap every bucket (grouping of `keys`) at ≤ `maxBucket` entries,
    * deterministically. The cap is SALTED two-level: each entry lands in one
    * of `s = min(CapSalts, maxBucket)` cells by `xxhash64(id) mod s`, and
    * each cell keeps its `maxBucket / s` smallest ids. Total kept per bucket
    * is ≤ s·⌊maxBucket/s⌋ ≤ maxBucket (slightly conservative when s doesn't
    * divide). The point of the salt: a degenerate 10⁷-entry boilerplate
    * bucket is no longer a single-task spillable window sort — its rows
    * spread across s cells whose windows sort independently, so the largest
    * task handles ~bucketSize/s rows. The survivor set is a hash-spread
    * union of per-cell minima instead of the global `maxBucket` smallest
    * ids — equally deterministic, and the cap is a recall heuristic, not a
    * semantic contract. Costs one exchange on (keys, salt) before the
    * downstream join's exchange on keys; the re-shuffled set is the CAPPED
    * one, i.e. bounded.
    *
    * Overflow is still never silent: cell size rides as a second frame of
    * the SAME window and an `observe` metric (computed inline by
    * CollectMetrics, zero extra jobs) reports hot-cell and dropped-entry
    * totals to the [[GraftMetrics]] listener when the consuming action
    * completes. */
  /** Per-invocation disambiguator for observe() names: Spark requires
    * observation names to be unique within one query, so composing the same
    * operator twice in a single action (e.g. a union of two LSH dedups)
    * would otherwise fail analysis with DUPLICATED_METRICS_NAME. */
  private val capObsSeq = new java.util.concurrent.atomic.AtomicLong()

  private[pipeline] def capBuckets(entries: DataFrame, keys: Seq[String],
      maxBucket: Int, tag: String): DataFrame = {
    require(maxBucket > 0, s"$tag: maxBucket must be positive, got $maxBucket")
    if (maxBucket == Int.MaxValue) return entries
    GraftMetrics.ensureListener(entries.sparkSession)
    val s = math.min(CapSalts, maxBucket)
    val cellCap = maxBucket / s
    val w = Window.partitionBy((keys.map(col) :+ col("__salt")): _*).orderBy(col("id"))
    val hot = col("__cn") === 1 && col("__csz") > cellCap
    // The explicit-N repartition REPLACES the exchange the window would
    // force (EnsureRequirements inserts none on top: hash on the same key
    // SET satisfies the window's clustered distribution) while pinning the
    // stage's parallelism — the cell sort + the downstream bucket join are
    // CPU-per-row bound with tiny rows, and AQE's byte-targeted coalescing
    // would serialize them at small shuffle sizes. The salt leads the key
    // list so the partitioning is NOT semantically equal to the ENSURE
    // exchange it replaces (an equal one is elided, dropping the pin) —
    // and salt-first hashing is also what spreads a degenerate hot
    // bucket's cells across tasks.
    entries
      .withColumn("__salt", pmod(xxhash64(col("id")), lit(s.toLong)))
      .repartition(
        entries.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
        col("__salt") +: keys.map(col): _*)
      .withColumn("__cn", row_number().over(w))
      .withColumn("__csz", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .observe(s"graft.capBuckets.$tag.${capObsSeq.incrementAndGet()}",
        coalesce(sum(when(hot, lit(1L)).otherwise(lit(0L))), lit(0L)).as("hot_buckets"),
        coalesce(sum(when(hot, col("__csz") - cellCap).otherwise(lit(0L))), lit(0L))
          .as("dropped_entries"))
      .filter(col("__cn") <= cellCap).drop("__salt", "__cn", "__csz")
  }

  /** Expand similarity pairs over exact-duplicate REPRESENTATIVES back to
    * pairs over all members. `repPairs` carries (ra, rb, payload...) with
    * ra < rb for distinct groups, or ra == rb for an intra-group entry
    * (members of one exact-dup group, pairwise similarity = the group's
    * self-similarity). Identical content ⇒ identical sketch/score, so the
    * expansion is exact. Output ids are order-normalized (id_a < id_b). */
  private[pipeline] def expandGroupPairs(repPairs: DataFrame, members: DataFrame): DataFrame = {
    val payload = repPairs.columns.filterNot(c => c == "ra" || c == "rb").map(col)
    repPairs
      .join(members.select(col("id").as("ida"), col("rep").as("ra")), Seq("ra"))
      .join(members.select(col("id").as("idb"), col("rep").as("rb")), Seq("rb"))
      .filter(col("ra") =!= col("rb") || col("ida") < col("idb"))
      .select(least(col("ida"), col("idb")).as("id_a") +:
        greatest(col("ida"), col("idb")).as("id_b") +: payload.toSeq: _*)
  }

  /** Exact-dup groups of size > 1, as (rep, group size). */
  private[pipeline] def dupGroups(members: DataFrame): DataFrame =
    members.groupBy(col("rep")).agg(count(lit(1)).as("gs")).filter(col("gs") > 1)

  /** MinHash+LSH near-dup pairs: band the signature, bucket-join on
    * (band index, band hash), then exact-Jaccard rerank of candidates.
    * The only all-to-all step is the band-hash shuffle — standard LSH
    * scaling; candidate rerank touches candidate pairs only.
    *
    * Scale shape (see the object Scaladoc): exact-duplicate groups are
    * collapsed first so sketches are computed once per distinct content,
    * hot (band, bucket) cells are capped with a logged drop count, and
    * exact-dup pairs re-enter through the expansion join.
    *
    * The rerank measures Jaccard over the SAME bigram-shingle sets the
    * MinHash sketch measures. With matched notions the output is exactly
    * {pairs : shingle-Jaccard ≥ threshold} ∩ candidates, and the banding
    * (default 16 bands × 2 rows: per-pair recall 1-(1-J²)^16 ≥ 1-10⁻⁷ at
    * J = 0.8) makes candidate recall effectively total, so the exact
    * all-pairs SQL is a valid oracle (verified equal at every test SF). */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 32, bands: Int = 16, threshold: Double = 0.8,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val (repPairs, sh, membersOpt) =
      minhashRepPairs(df, textCol, idCol, numHashes, bands, threshold, maxBucket)
    membersOpt match {
      case None => repPairs.withColumnsRenamed(Map("ra" -> "id_a", "rb" -> "id_b"))
      case Some(members) =>
        // intra-group pairs: self-Jaccard of the representative's shingle
        // set (1.0 for any non-empty set; NULL — filtered — when empty)
        val selfPairs = sh.join(dupGroups(members), sh("id") === col("rep"))
          .select(col("id").as("ra"), col("id").as("rb"),
            jaccard(col("sh"), col("sh")).as("jaccard"))
          .filter(col("jaccard") >= threshold)
        expandGroupPairs(repPairs.union(selfPairs), members)
    }
  }

  /** Cross-corpus FUZZY decontamination: every (corpus doc, eval doc) pair
    * with shingle-Jaccard ≥ threshold — the fuzzy complement of the exact
    * n-gram overlap passes ([[decontaminate]], [[bloomDecontaminate]]),
    * catching eval examples that were lightly paraphrased or truncated
    * into the training corpus (the Llama-style fuzzy dedup against evals;
    * exact n-grams miss single-token edits).
    *
    * Scale shape: BIPARTITE banding — the eval set (thousands of rows, the
    * small side by construction) bands and BROADCASTS; the corpus bands
    * map-only and meets it in a broadcast equi-join on (band, bucket), so
    * the corpus never shuffles and never pairs with itself (contrast
    * [[minhashLshPairs]], whose within-corpus buckets need caps — here the
    * candidate fan-out is bounded by the eval side). Exact shingle-Jaccard
    * reranks the candidates, so banding only proposes, never decides. */
  def fuzzyDecontamPairs(corpus: DataFrame, eval: DataFrame,
      corpusIdCol: String, corpusTextCol: String, evalIdCol: String,
      evalTextCol: String, numHashes: Int = 32, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    val ct = corpus
      .select(col(corpusIdCol).as("doc_id"),
        TextOps.tokens(col(corpusTextCol)).as("toks"))
      .filter(size(col("toks")) > 0)
    val et = eval
      .select(col(evalIdCol).as("eval_id"),
        TextOps.tokens(col(evalTextCol)).as("etoks"))
      .filter(size(col("etoks")) > 0)
    val cb = ct.select(col("doc_id"),
        posexplode(graft.functions.HashExprs.minhashBands(col("toks"), numHashes, bands)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bh"))
    val eb = et.select(col("eval_id"),
        posexplode(graft.functions.HashExprs.minhashBands(col("etoks"), numHashes, bands)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bh"))
    val cand = cb.join(broadcast(eb), Seq("band", "bh"))
      .select(col("doc_id"), col("eval_id")).distinct()
    val csh = ct.select(col("doc_id"),
      graft.functions.HashExprs.sortedShingles(col("toks")).as("sh_c"))
    val esh = et.select(col("eval_id"),
      graft.functions.HashExprs.sortedShingles(col("etoks")).as("sh_e"))
    cand.join(csh, Seq("doc_id")).join(broadcast(esh), Seq("eval_id"))
      .withColumn("jaccard", jaccard(col("sh_c"), col("sh_e")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id"), col("eval_id"), col("jaccard"))
  }

  /** Shared MinHash+LSH machinery over exact-dup REPRESENTATIVES: returns
    * `(repPairs (ra, rb, jaccard), shingleSets (id, sh), membersOpt)`.
    * [[minhashLshPairs]] expands rep pairs to member pairs (quadratic
    * OUTPUT for an m-member dup group — inherent to a pair listing);
    * [[minhashKeepers]] instead clusters on the rep graph and maps members
    * to labels, so no quadratic set is ever materialized. */
  private def minhashRepPairs(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int, bands: Int, threshold: Double,
      maxBucket: Int): (DataFrame, DataFrame, Option[DataFrame]) = {
    val (repRows, membersOpt) = exactGroupReps(
      df.select(col(idCol).as("id"), col(textCol).as("txt")), md5(col("txt")),
      math.min(DefaultCollapseThreshold, maxBucket))
    // Sketches are RECOMPUTED per consumer rather than persisted: the
    // shingle sets are corpus-sized nested arrays, which Spark's in-memory
    // cache stores row-serialized — measured SLOWER to cache+read than to
    // recompute through the codegen'd native expressions, and at 100 TB
    // caching corpus-sized shingles is storage-prohibitive anyway. The
    // sketch compute is an embarrassingly-parallel map over parquet splits;
    // identical branches below share one scan via Spark's exchange reuse.
    val toks = repRows
      .select(col("id"), TextOps.tokens(col("txt")).as("toks"))
      .filter(size(col("toks")) > 0)
    val buckets = toks
      .select(col("id"),
        posexplode(graft.functions.HashExprs.minhashBands(col("toks"), numHashes, bands)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bh"))
    val capped = capBuckets(buckets, Seq("band", "bh"), maxBucket, "minhashLshPairs")
    // The explicit-N repartition after the distinct pins the RERANK's
    // parallelism: each candidate row costs a full shingle-set intersection
    // (CPU-per-row-bound, tiny bytes), so AQE's byte-targeted coalescing
    // would fold the few-MB pair frame onto 1-2 cores and serialize the most
    // expensive stage of the whole pass. A user-specified partition count is
    // exempt from AQE coalescing (REPARTITION_BY_NUM origin), so the pin
    // holds without a global minPartitionSize floor taxing every other
    // query. Cost: one extra exchange of the DEDUPED (ra, rb) id pairs —
    // 16 bytes/row, far below the band shuffle that produced them — and at
    // production scale (where the pair frame exceeds the coalescing target
    // anyway) it is a no-op-sized safety net, not a bottleneck.
    // NOTE the pin partitions on ra ALONE: a repartition on (ra, rb) — the
    // distinct's own keys — is provably redundant with the exchange the
    // aggregate already requires, and Catalyst elides it (verified: the
    // plan kept only the ENSURE_REQUIREMENTS exchange and the rerank
    // re-serialized). Hashing the pin on a strict subset keeps it a real,
    // AQE-exempt exchange.
    val cand = capped.as("x").join(capped.as("y"), Seq("band", "bh"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("ra"), col("y.id").as("rb"))
      .distinct()
      .repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
        col("ra"))
    // the shingle sets feed both rerank join branches, but are deliberately
    // NOT persisted: the nested array<string> column caches row-serialized,
    // and re-reading it was MEASURED slower than recomputing through the
    // codegen'd native expression (cache round-trip 1.0 s + 3.3 s vs 2.4 s
    // recomputed at sf0.1) — and at 100 TB caching corpus-sized shingle
    // sets is storage-prohibitive anyway
    val sh = toks.select(col("id"),
      graft.functions.HashExprs.sortedShingles(col("toks")).as("sh"))
    val repPairs = cand
      .join(sh.select(col("id").as("ra"), col("sh").as("sh_a")), Seq("ra"))
      .join(sh.select(col("id").as("rb"), col("sh").as("sh_b")), Seq("rb"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("ra"), col("rb"), col("jaccard"))
    (repPairs, sh, membersOpt)
  }

  /** Near-dup CANONICALIZATION in one call: MinHash+LSH pair detection +
    * connected components + keeper assignment, WITHOUT ever materializing
    * the expanded pair set. `components(minhashLshPairs(...))` is correct
    * but lists m·(m−1)/2 pairs for an m-member exact-dup group before
    * clustering collapses them again — 5·10¹¹ pair rows for one
    * million-copy boilerplate page. Here label propagation runs on the
    * REPRESENTATIVE graph (bounded by distinct content) and members then
    * inherit their rep's component label through one join:
    * keep_id(member) = label(rep) — exact, because every member of an
    * exact-dup group is similarity-1.0-connected to its rep, and reps are
    * group minima, so the component minimum over reps IS the minimum over
    * all members. Output matches `components(minhashLshPairs(...))` row
    * for row (one (id, keep_id) per doc in ≥1 near-dup pair or size>1
    * exact-dup group). */
  def minhashKeepers(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 32, bands: Int = 16, threshold: Double = 0.8,
      maxBucket: Int = DefaultMaxBucket, maxIters: Int = 100,
      reliableCheckpoints: Boolean = false): DataFrame = {
    val (repPairs, sh, membersOpt) =
      minhashRepPairs(df, textCol, idCol, numHashes, bands, threshold, maxBucket)
    val repLabels = components(repPairs.select(col("ra"), col("rb")), "ra", "rb",
      maxIters, reliableCheckpoints)
    membersOpt match {
      case None => repLabels
      case Some(members) =>
        // nodes = members whose rep is in a near-dup pair, plus members of
        // size>1 exact-dup groups whose rep was sketchable (mirrors the
        // expanded graph: intra-group pairs need a non-empty shingle set)
        val pairedReps = repLabels.select(col("id").as("rep"))
        val dupReps = dupGroups(members).select(col("rep"))
          .join(sh.select(col("id").as("rep")), Seq("rep"))
        val nodes = members
          .join(pairedReps.union(dupReps).distinct(), Seq("rep"))
        nodes.join(repLabels.withColumnRenamed("id", "rep"), Seq("rep"), "left")
          .select(col("id"), coalesce(col("keep_id"), col("rep")).as("keep_id"))
    }
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
    * cut each round so the plan doesn't grow with the iteration count.
    *
    * Durability: `reliableCheckpoints=false` (default) uses
    * `localCheckpoint` — executor-block storage, fine for local mode but
    * lost (unrecoverably: lineage is truncated) if an executor dies
    * mid-iteration. On a cluster pass `reliableCheckpoints=true` AND set
    * `spark.sparkContext.setCheckpointDir` to reliable storage (HDFS/S3);
    * each round then survives executor loss. `maxIters` guards against a
    * pathological long-path graph (label propagation needs O(diameter)
    * rounds); exceeding it throws rather than looping unbounded.
    * `checkpointEvery` amortizes the eager per-round materialization: only
    * every k-th round (and the final one) checkpoints; in between, rounds
    * stay lazy and the convergence count recomputes up to k−1 joins of
    * lineage from the last checkpoint — the standard iteration-vs-
    * materialization trade (Pregel's checkpoint interval). k=1 restores
    * checkpoint-every-round. Output: (id, keep_id = component minimum),
    * one row per node that appears in ≥1 pair. */
  def components(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      maxIters: Int = 100, reliableCheckpoints: Boolean = false,
      checkpointEvery: Int = 3): DataFrame = {
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    def cp(df: DataFrame): DataFrame =
      if (reliableCheckpoints) df.checkpoint(true) else df.localCheckpoint(true)
    // Deterministically free a SUPERSEDED local checkpoint's executor blocks
    // (the ContextCleaner only reclaims them after a driver GC, so a
    // 100-round propagation would otherwise hold every round's blocks):
    // eager localCheckpoint plans are a LogicalRDD over the checkpointed
    // RDD — unpersist that RDD once nothing derived from it is live.
    def release(df: DataFrame): Unit =
      if (!reliableCheckpoints)
        df.queryExecution.analyzed.collectFirst {
          case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
        }.foreach(_.unpersist(blocking = false))
    // symmetric closure in ONE pass: each pair row explodes into both
    // directions, so the (possibly expensive) upstream pair pipeline
    // executes exactly once with NO eager pre-checkpoint of a mirror (a
    // self-union would reference `pairs` twice and need one — measured a
    // full extra materialization per call at sf0.1)
    val edges = cp(pairs.select(col(idA).as("a"), col(idB).as("b"))
      .select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct())
    var lastCkpt = cp(edges.select(col("a").as("id")).distinct()
      .withColumn("label", col("id")))
    var labels = lastCkpt
    var sinceCkpt = 0
    var changed = 1L
    var iters = 0
    while (changed > 0) {
      if (iters >= maxIters) throw new IllegalStateException(
        s"Dedup.components: no convergence after $maxIters rounds — the pair " +
          "graph has a component of diameter > maxIters (min-label propagation " +
          "needs O(diameter) rounds); raise maxIters or pre-cluster the input")
      val neighborMin = edges.join(labels, edges("b") === labels("id"))
        .groupBy(col("a")).agg(min(col("label")).as("nmin"))
      val updated = labels.join(neighborMin, labels("id") === neighborMin("a"))
        .select(labels("id").as("id"), col("label"),
          least(col("label"), col("nmin")).as("next"))
      sinceCkpt += 1
      if (sinceCkpt >= checkpointEvery) {
        // cadence round: pin this round's state, retire the previous pin
        // (everything derived from it is folded into the fresh checkpoint).
        // The convergence count rides the checkpoint's own materialization
        // job as an observe() metric — a separate count() here was one
        // extra driver-blocking job per cadence round, measurable across
        // the five pipelines that call this in sequence (px14/21/54/58/67).
        // The wait is BOUNDED: observation values arrive via the async
        // listener bus, whose events Spark drops (non-fatally) under
        // saturation — a bare obs.get would then hang this loop forever,
        // so a dropped event falls back to the explicit count instead.
        val obs = org.apache.spark.sql.Observation()
        val fresh = cp(updated.observe(obs,
          coalesce(sum(when(col("next") < col("label"), lit(1L))
            .otherwise(lit(0L))), lit(0L)).as("changed")))
        changed = GraftMetrics.observedLongOr(obs, "changed") {
          fresh.filter(col("next") < col("label")).count()
        }
        release(lastCkpt)
        lastCkpt = fresh
        labels = fresh.select(col("id"), col("next").as("label"))
        sinceCkpt = 0
      } else {
        // lazy round: the convergence count re-executes ≤ k−1 joins of
        // lineage from lastCkpt — cheaper than a block write per round
        changed = updated.filter(col("next") < col("label")).count()
        labels = updated.select(col("id"), col("next").as("label"))
      }
      iters += 1
    }
    // the returned frame must not reach through `edges` (released next):
    // pin the final labels if the last round didn't land on the cadence
    if (sinceCkpt > 0) {
      val fin = cp(labels)
      release(lastCkpt)
      lastCkpt = fin
      labels = fin
    }
    release(edges) // the result depends only on the final labels checkpoint
    labels.select(col("id"), col("label").as("keep_id"))
  }

  /** Distinct word n-grams of a text column, as space-joined strings.
    * Related but DELIBERATELY distinct helpers: [[shingles]] (n=2, distinct,
    * maps a single-token doc to the token itself — MinHash sketch
    * semantics) and [[TextOps.bigramsOf]] (n=2, WITH multiplicity, empty for
    * single-token docs — repetition counting). Here a doc shorter than n
    * has no n-gram at all: contamination must not match sub-n fragments. */
  def tokenNgrams(text: Column, n: Int): Column =
    tokenNgramsOf(TextOps.tokens(text), n)

  /** [[tokenNgrams]] over an ALREADY-MATERIALIZED token array. Hot paths
    * must tokenize into a column first and pass the attribute: the `toks`
    * expression is spliced into the HOF lambda body, where interpreted
    * evaluation re-runs it for every element — a split expression there
    * costs O(tokens²) per document (the px16/px23 trap). */
  def tokenNgramsOf(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))

  /** Corpus SNAPSHOT DIFF — dataset-versioning's core query: which
    * documents were added, removed, or changed between two corpus
    * snapshots. One full-outer join on the id; change detection compares
    * the text column directly (at 100 TB you'd pre-hash both sides to
    * xxhash64 and compare 8-byte digests — same join shape, 1e-9 collision
    * odds; the direct compare keeps the oracle engine-exact). Emits only
    * the delta rows (status ≠ unchanged): the output scales with the
    * CHANGE volume, not the corpus. */
  def snapshotDiff(before: DataFrame, after: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // presence comes from explicit join-side markers, NEVER from the text
    // column's nullability: a document with NULL text present only in
    // `before` would otherwise read as "added" instead of "removed". The
    // change test is null-safe for the same reason (NULL -> "x" IS a change).
    val a = before.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("__a"), lit(true).as("__pa"))
    val b = after.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("__b"), lit(true).as("__pb"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__pa").isNull, lit("added"))
          .when(col("__pb").isNull, lit("removed"))
          .when(!(col("__a") <=> col("__b")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .filter(col("status") =!= "unchanged")
  }

  /** Duplicated-n-gram fraction per document — the CCNet/Gopher repetition
    * filter at CORPUS granularity: for every document, the fraction of its
    * n-gram OCCURRENCES whose n-gram also appears in at least one OTHER
    * document. High fractions mark boilerplate (licence blocks, navigation
    * chrome, templated spam) that per-document repetition stats (px16)
    * can't see, because the repetition lives across documents.
    *
    * Output: (doc_id, n_grams, dup_grams, dup_frac_micro, keep) — exact
    * integer micro-units, keep = frac ≤ `keepBelowMicro`. A document
    * shorter than n tokens has no n-grams: frac 0, kept.
    *
    * Shape, 100 TB honest: occurrence explosion is map-side; the
    * per-(doc, gram) pre-aggregation runs with map-side combine BEFORE
    * anything shuffles, so the gram shuffle carries one row per distinct
    * (doc, gram) — boilerplate's repetitions within a doc collapse
    * locally. Doc-frequency is a second map-combined aggregate over those
    * rows, joined back on the gram key (both sides already hash-partitioned
    * by gram, so the join reuses the partitioning). Nothing is driver-side
    * and nothing is quadratic; at production scale the gram strings would
    * be xxhash64-keyed (the px17 trick, ~1e-9 collision odds at 1e10
    * grams), kept as exact strings here so the DuckDB oracle replays the
    * arithmetic bit-for-bit. */
  def dupNgramFraction(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, keepBelowMicro: Long = 300000L): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("toks"))
    val occ = toks.filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(transform(sequence(lit(0), size(col("toks")) - n),
        i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))).as("gram"))
    val perDoc = occ.groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
    val docFreq = perDoc.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val agg = perDoc.join(docFreq, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"),
        sum(when(col("df") >= 2, col("c")).otherwise(lit(0L))).as("dup_grams"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("dup_grams"), lit(0L)).as("dup_grams"))
      .withColumn("dup_frac_micro",
        expr("dup_grams * 1000000 div greatest(n_grams, 1)"))
      .withColumn("keep", col("dup_frac_micro") <= keepBelowMicro)
  }

  /** EXACT-SUBSTRING duplicate-SPAN extraction — the removal half of
    * cross-document dedup (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better": train on corpora with long shared
    * substrings CUT, not just whole near-dup docs dropped). Where
    * [[dupNgramFraction]] scores HOW duplicated a document is, this emits
    * the actual spans a clip pass would remove: for every document, the
    * MAXIMAL token intervals covered by `n`-grams that also occur in at
    * least one OTHER document. Overlapping or token-adjacent duplicated
    * grams merge into one span (a run of shared text is one cut, not a
    * per-gram confetti of cuts).
    *
    * Output: one row per span — (doc_id, span_start, span_end,
    * span_tokens), 1-based inclusive token offsets, ordered by
    * (doc_id, span_start). Documents with no cross-doc n-gram emit no rows.
    *
    * Shape at 100 TB — the paper's suffix array wants one global sorted
    * order with random access, which a shared-nothing engine can't hold;
    * the shuffle-native equivalent is position-carrying n-gram inversion:
    *  1. (doc, pos, gram) occurrences: map-only explode, linear in tokens;
    *  2. cross-doc grams: map-combined distinct on (gram, doc) then ONE
    *     gram-keyed aggregate filtered to docFreq ≥ 2;
    *  3. positions of duplicated grams: join back on the gram key — both
    *     sides are already hash-partitioned by gram so the join reuses the
    *     partitioning, and a boilerplate gram with 10⁷ occurrences is a
    *     skewed JOIN key (AQE skew-split applies), never a single-task agg;
    *  4. gaps-and-islands merge per doc: running max of span ends over a
    *     doc-partitioned window — state is doc-bounded, never global.
    * As with [[dupNgramFraction]], production would key step 2-3 by
    * xxhash64(gram); exact strings here keep the oracle bit-replayable. */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    val occ = gramOccurrences(docs, idCol, textCol, n)
    val dupGrams = occ.select(col("gram"), col("doc_id")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).select(col("gram"))
    val dupPos = occ.join(dupGrams, Seq("gram"))
      .select(col("doc_id"), col("pos"))
    mergeIslands(dupPos, "doc_id", n)
      .select(col("doc_id"),
        col("island_start").cast("long").as("span_start"),
        col("island_end").cast("long").as("span_end"),
        (col("island_end") - col("island_start") + 1L).as("span_tokens"))
  }

  /** Benchmark decontamination: for every training document, the eval-set
    * documents it shares ≥ `minShared` distinct word `n`-grams with — the
    * standard n-gram-overlap contamination check run before training (GPT-3
    * appendix C / PaLM-style, token-level). Output:
    * (train_id, eval_id, n_shared).
    *
    * Shape, built for the 100 TB case where the "eval set" is a full
    * held-out split that scales with the corpus (so nothing broadcasts):
    *  1. CANDIDATE join on `xxhash64(ngram)` — both sides explode to
    *     DISTINCT n-grams (array_distinct before the explode keeps
    *     within-doc repeats from inflating counts) but ship only
    *     (doc_id, 8-byte hash) into the big shuffle, an order of magnitude
    *     fewer bytes than the n-gram strings themselves on long grams.
    *  2. EXACT string rerank restricted to the candidate documents: the
    *     true string-keyed join re-runs only over docs that hash-matched
    *     something (the contaminated sliver, not the corpus), so hash
    *     collisions are invisible in the output — a colliding pair either
    *     re-verifies on real strings or falls below `minShared` and drops.
    *     Any truly-overlapping pair hash-matches by definition, so the
    *     restriction loses nothing and the result is byte-identical to the
    *     plain string join.
    *
    * `candidateHashBits` (< 64) deliberately weakens the candidate hash —
    * a test hook that makes collisions abundant so the rerank's
    * correctness is actually exercised (64-bit collisions are otherwise
    * unobservable in any test-sized corpus). */
  def contamination(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 5, minShared: Int = 1,
      candidateHashBits: Int = 64): DataFrame =
    contaminationWithEvalGrams(train,
      evalGrams(eval, idCol, textCol, n), idCol, textCol, n, minShared,
      candidateHashBits)

  /** The exploded `(eval_id, ngram)` frame [[contamination]] probes —
    * exposed so a long-lived caller (the sv19 streaming decontamination
    * protocol) can compute it ONCE, persist/checkpoint it, and reuse it
    * across micro-batches via [[contaminationWithEvalGrams]] instead of
    * paying the eval-corpus tokenize + explode on every batch. */
  def evalGrams(eval: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = eval
    .select(col(idCol).as("eval_id"), TextOps.tokens(col(textCol)).as("toks"))
    .select(col("eval_id"), explode(tokenNgramsOf(col("toks"), n)).as("ngram"))

  /** [[contamination]] with the eval side already exploded to
    * `(eval_id, ngram)` (the [[evalGrams]] shape) — byte-identical output;
    * the variant exists so streaming callers hoist the static eval work
    * out of the per-batch loop. */
  def contaminationWithEvalGrams(train: DataFrame, evalG: DataFrame,
      idCol: String, textCol: String, n: Int = 5, minShared: Int = 1,
      candidateHashBits: Int = 64): DataFrame = {
    def grams(df: DataFrame, as: String) = df
      .select(col(idCol).as(as), TextOps.tokens(col(textCol)).as("toks"))
      .select(col(as), explode(tokenNgramsOf(col("toks"), n)).as("ngram"))
    def h(c: Column): Column =
      if (candidateHashBits >= 64) xxhash64(c)
      else pmod(xxhash64(c), lit(1L << candidateHashBits))
    val trainG = grams(train, "train_id")
    val candTrain = trainG.select(col("train_id"), h(col("ngram")).as("h"))
      .join(evalG.select(h(col("ngram")).as("h")), Seq("h"), "leftsemi")
      .select(col("train_id")).distinct()
    val candEval = evalG.select(col("eval_id"), h(col("ngram")).as("h"))
      .join(trainG.select(h(col("ngram")).as("h")), Seq("h"), "leftsemi")
      .select(col("eval_id")).distinct()
    trainG.join(candTrain, Seq("train_id"), "leftsemi")
      .join(evalG.join(candEval, Seq("eval_id"), "leftsemi"), Seq("ngram"))
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** [[contamination]] specialised for the COMMON production shape: the
    * eval/benchmark side is tiny relative to the corpus (a benchmark suite
    * vs a 100 TB crawl), so the right plan never shuffles the corpus at
    * all — a broadcast Bloom filter over the eval n-gram hashes prunes the
    * corpus grams MAP-SIDE, and only the surviving sliver (true overlaps
    * plus `fpp` false positives) enters a broadcast equi-join against the
    * eval grams. Two corpus passes happen implicitly (explode feeds both
    * the semi-filter and the rerank) but neither moves corpus bytes across
    * the network keyed on n-grams, which [[contamination]]'s hash-join
    * shape must.
    *
    * Exactness: Bloom filters have NO false negatives, so every truly
    * shared gram survives the prefilter; false positives are eliminated by
    * the exact string join. The result is byte-identical to
    * [[contamination]] on the same inputs — asserted differentially in
    * SketchOpsSpec, including under an absurd `fpp` that floods the join
    * with false positives.
    *
    * At 100 TB: ~1e8 distinct eval grams at 1% fpp is a ~120 MB bit array
    * — broadcastable; the corpus-side work is a codegen'd scan + filter.
    * The filter is sized from an exact distinct count of the (small) eval
    * side; `expectedItems` overrides the sizing (a test hook — undersizing
    * degrades fpp, never recall). */
  def bloomContamination(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 5, minShared: Int = 1, fpp: Double = 0.01,
      expectedItems: Long = -1L): DataFrame = {
    def grams(df: DataFrame, as: String) = df
      .select(col(idCol).as(as), TextOps.tokens(col(textCol)).as("toks"))
      .select(col(as), explode(tokenNgramsOf(col("toks"), n)).as("ngram"))
    val evalG = grams(eval, "eval_id")
    val evalHashes = evalG.select(xxhash64(col("ngram")).as("h"))
    val nDistinct = evalHashes.distinct().count()
    val prefilter: Column =
      if (nDistinct == 0) lit(false) // no eval grams — nothing can match
      else {
        val nItems = if (expectedItems > 0) expectedItems else nDistinct
        val bloom = evalHashes.stat.bloomFilter("h", nItems, fpp)
        val mightContain = udf((h: Long) => bloom.mightContainLong(h))
        mightContain(xxhash64(col("ngram")))
      }
    grams(train, "train_id")
      .filter(prefilter)
      .join(broadcast(evalG), Seq("ngram"))
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
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
    * exact 16-bit chunk, so candidates come from 4 chunk-equality joins.
    * Same scale defenses as [[minhashLshPairs]]: exact-dup groups collapse
    * to one representative before fingerprinting (identical content ⇒
    * identical fingerprint ⇒ Hamming 0), hot (chunk, value) cells are
    * capped with a logged drop count, exact-dup pairs re-enter via the
    * expansion join. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, md5Base: Boolean = false,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val (repRows, membersOpt) = exactGroupReps(
      df.select(col(idCol).as("id"), col(textCol).as("txt")), md5(col("txt")),
      math.min(DefaultCollapseThreshold, maxBucket))
    // not persisted: the main path consumes the fingerprints exactly once
    // (the 4-way chunk explode), and the one-pass SimHash64 projection is
    // cheaper to recompute on the rare dup-expansion branch than every
    // corpus would be to cache
    val fps = repRows
      .select(col("id"), array_distinct(TextOps.tokens(col("txt"))).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("id"),
        graft.functions.HashExprs.simhash64(col("toks"), md5Base).as("simhash"))
    val chunks = fps.select(col("id"), col("simhash"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xffffL)).as("ch"))
      }: _*)).as("ck"))
      .select(col("id"), col("simhash"), col("ck.chunk").as("chunk"), col("ck.ch").as("ch"))
    val capped = capBuckets(chunks, Seq("chunk", "ch"), maxBucket, "simhashPairs")
    val repPairs = capped.as("x").join(capped.as("y"), Seq("chunk", "ch"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("ra"), col("y.id").as("rb"),
        col("x.simhash").as("fp_a"), col("y.simhash").as("fp_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("ra"), col("rb"), col("hamming"))
    membersOpt match {
      case None => repPairs.withColumnsRenamed(Map("ra" -> "id_a", "rb" -> "id_b"))
      case Some(members) =>
        // identical content ⇒ identical fingerprint ⇒ Hamming distance 0
        val selfPairs = fps.join(dupGroups(members), fps("id") === col("rep"))
          .select(col("id").as("ra"), col("id").as("rb"),
            bit_count(col("simhash").bitwiseXOR(col("simhash"))).as("hamming"))
        expandGroupPairs(repPairs.union(selfPairs), members)
    }
  }

  /** Positioned word-`n`-gram occurrences: one row per gram START position
    * (1-based, token index) — `(doc_id, pos, gram)`. Null text reads as
    * empty; docs shorter than `n` tokens emit nothing. Shared by the span
    * detector ([[dupSpans]]), the span REMOVER ([[exactSubstrDedup]]) and
    * the corpus-order novelty metric ([[noveltyRate]]). */
  private def gramOccurrences(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        TextOps.tokens(coalesce(col(textCol), lit(""))).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("toks")) - (n - 1)),
          i => struct(i.cast("long").as("pos"),
            concat_ws(" ", slice(col("toks"), i, lit(n))).as("gram")))).as("pg"))
      .select(col("doc_id"), col("pg.pos").as("pos"), col("pg.gram").as("gram"))

  /** Gaps-and-islands merge — the ONE implementation of the running-max
    * window all position-merging passes share ([[dupSpans]]'s detector,
    * [[exactSubstrDedup]]'s remover, and
    * [[Multimodal.audioSegments]]'s segmenter): rows are `(partCol,
    * pos)` where each pos covers `width` slots; touching/overlapping
    * covers collapse to one island per `(partCol, island)` with
    * `island_start`/`island_end` (inclusive). Partitioned by `partCol`,
    * so per-task state is one partition member's positions. */
  private[pipeline] def mergeIslands(pos: DataFrame, partCol: String,
      width: Int): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col("pos"))
    pos
      .withColumn("prev_end", max(col("pos") + (width - 1))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("prev_end").isNull || col("pos") > col("prev_end") + 1, 1)
          .otherwise(0))
      .withColumn("island", sum(col("brk")).over(w))
      .groupBy(col(partCol), col("island"))
      .agg(min(col("pos")).as("island_start"),
        (max(col("pos")) + (width - 1)).as("island_end"))
  }

  /** Exact-substring deduplication with REMOVAL (the ExactSubstr pass of
    * Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better", at word-token grain): every corpus-wide duplicated token
    * `n`-gram occurrence EXCEPT the canonical first one (min `(doc_id,
    * pos)`) is cut out of its document, overlapping cuts merged into
    * spans, and the surviving tokens re-joined into `clean_text`. Unlike
    * [[dupSpans]] (the detector this completes, which only *reports*
    * cross-document spans at distinct-doc df ≥ 2), the remover counts
    * WITHIN-document repeats too — a gram occurring twice in one doc is
    * duplicated text — and emits the cleaned corpus, not a report.
    *
    * Output per input document: `(doc_id, n_tokens, removed_tokens,
    * kept_tokens, clean_text)`.
    *
    * Scale shape, in corpus-sized pieces only:
    *  1. positioned-gram explode (map-side, no shuffle);
    *  2. ONE gram-keyed aggregation — `count ≥ 2` plus the canonical
    *     occurrence as `min(doc_id·10⁹ + pos)` (partial aggs apply; the
    *     encoded min keeps the agg a plain `long` min instead of a struct
    *     ordering — exact for doc_ids below ~9.2×10⁹ and docs below 10⁹
    *     tokens, the packing's stated domain; a corpus past either bound
    *     switches the agg to `min_by(struct(doc_id, pos))`);
    *  3. the occurrence→stats join back on the SAME gram key (AQE reuses
    *     the co-partitioning; only grams that survived `cnt ≥ 2` flow);
    *  4. everything after is doc-keyed: the island merge window and the
    *     spans⋈tokens rebuild partition on `doc_id`, so per-task state is
    *     bounded by DOCUMENT length, never corpus size.
    * No broadcast of anything corpus-sized, no collect, no cross join;
    * the only data that grows super-linearly with dup rate is the dup
    * positions sliver itself. */
  def exactSubstrDedup(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    val occ = gramOccurrences(docs, idCol, textCol, n)
    // Loud guard on the packing domain (scaladoc step 2): an out-of-domain
    // corpus must FAIL, not dedup against a mis-ordered canonical occurrence.
    val key = when(col("doc_id") < 0L || col("doc_id") >= 9223372036L ||
        col("pos") >= 1000000000L,
      raise_error(format_string(
        "exactSubstrDedup: (doc_id,pos)=(%d,%d) exceeds the long-packing " +
          "domain [0,9.2e9)x[0,1e9); switch the canon agg to " +
          "min_by(struct(doc_id,pos))", col("doc_id"), col("pos"))).cast("long"))
      .otherwise(col("doc_id") * lit(1000000000L) + col("pos"))
    val stats = occ.groupBy(col("gram"))
      .agg(count(lit(1)).as("cnt"), min(key).as("canon"))
      .filter(col("cnt") >= 2)
      .select(col("gram"), col("canon"))
    val dupPos = occ.join(stats, Seq("gram"))
      .filter(key =!= col("canon"))
      .select(col("doc_id"), col("pos"))
    val spans = mergeIslands(dupPos, "doc_id", n)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("island_start").as("s"),
        col("island_end").as("e"))).as("spans"))
    docs.select(col(idCol).cast("long").as("doc_id"),
        TextOps.tokens(coalesce(col(textCol), lit(""))).as("toks"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("spans",
        coalesce(col("spans"), array().cast("array<struct<s:long,e:long>>")))
      .withColumn("kept_idx",
        filter(sequence(lit(1L), size(col("toks")).cast("long")),
          i => !exists(col("spans"),
            sp => i >= sp.getField("s") && i <= sp.getField("e"))))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("kept_idx"))).cast("long")
          .as("removed_tokens"),
        size(col("kept_idx")).cast("long").as("kept_tokens"),
        array_join(transform(col("kept_idx"),
          i => element_at(col("toks"), i.cast("int"))), " ").as("clean_text"))
  }

  /** Corpus-order novelty rate — for each document, the fraction of its
    * DISTINCT word `n`-grams never seen in any EARLIER document (by
    * `doc_id` order, the ingestion order in this corpus). The running
    * novelty curve is the standard crawl-saturation diagnostic: when
    * marginal novelty collapses, more of the same crawl stops buying
    * training signal. Order-aware, unlike [[dupNgramFraction]]'s
    * symmetric df ≥ 2 boilerplate fraction.
    *
    * Output: `(doc_id, n_grams, novel_grams, novelty_micro)` — micro-unit
    * integer rate (null for docs too short to have a gram).
    *
    * Shape: per-doc distinct (map-side `array_distinct`, no shuffle) →
    * ONE gram-keyed `min(doc_id)` aggregation → join back on the same
    * gram key → one doc-keyed count. First-occurrence attribution via
    * `min` is exactly parallel: no sort, no sequential scan over the
    * corpus order. */
  def noveltyRate(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    val pd = gramOccurrences(docs, idCol, textCol, n)
      .select(col("doc_id"), col("gram")).distinct()
    val first = pd.groupBy(col("gram")).agg(min(col("doc_id")).as("first_doc"))
    val perDoc = pd.join(first, Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), lit(1L)).otherwise(lit(0L)))
          .as("novel_grams"))
    ids.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("novel_grams"), lit(0L)).as("novel_grams"))
      // gramless docs get the documented NULL, never a ÷0 — under ANSI
      // mode (this repo's pinned default) a bare `div n_grams` would
      // abort the whole query on the first short document
      .withColumn("novelty_micro",
        when(col("n_grams") === 0, lit(null).cast("long"))
          .otherwise(expr("novel_grams * 1000000 div greatest(n_grams, 1)")))
  }
}
