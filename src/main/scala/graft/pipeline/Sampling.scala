package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-shaping operators for training-data pipelines: deterministic
  * stratified sampling (data mixing) and sequence packing (token-budget
  * batching). Both are designed so a 100 TB corpus pays at most one shuffle:
  * sampling is a pure map-side filter (NO shuffle at all), packing is one
  * shard-keyed window.
  */
object Sampling {

  /** Deterministic hash-threshold stratified sampling — the data-mixing
    * primitive (downsample over-represented strata, keep the rest): a row
    * survives iff `md5_number_lower(seed|stratum|id) & 0xffff <
    * rate·65536`. Properties a 100 TB pipeline needs:
    *
    *  - '''map-only''': the keep decision is a per-row hash compare — no
    *    shuffle, no sort, no count pass; the corpus scan is the whole cost
    *    (contrast `df.stat.sampleBy`, which is also map-only but seeds a
    *    per-partition RNG: its output changes with the partitioning, while
    *    the hash of (seed, stratum, id) is invariant under repartitioning,
    *    re-runs, and engine choice);
    *  - '''deterministic & cross-engine''': the md5-derived hash is DuckDB's
    *    `md5_number_lower`, so the exact sample is SQL-reproducible;
    *  - '''unbiased re-weighting''': each kept row carries
    *    `weight = 1/rate`, so downstream token counts / loss sums stay
    *    unbiased estimates of the full-corpus values.
    *
    * Rates are quantized to k/65536 (exact 16-bit thresholds) so the
    * comparison is integer, not float. Strata missing from `rates` keep
    * everything (rate 1.0). */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      rates: Map[String, Double], seed: String = "strat42"): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      s"rates must be in [0,1], got $rates")
    val thresholds = rates.map { case (k, r) => k -> math.round(r * 65536).toInt }
    val thr = thresholds.foldLeft(lit(65536)) { case (acc, (stratum, t)) =>
      when(col(stratumCol) === stratum, lit(t)).otherwise(acc)
    }
    // concat, NOT concat_ws: concat propagates NULL exactly like SQL `||`,
    // so a NULL stratum or id drops the row on BOTH engines (a rate lookup
    // for a NULL stratum is undefined anyway); concat_ws would silently
    // skip the NULL and diverge from the SQL oracle
    val bucket = graft.functions.HashExprs.md5NumberLower(
      concat(lit(seed), lit("|"), col(stratumCol), lit("|"), col(idCol).cast("string")))
      .bitwiseAND(lit(0xffffL))
    df.withColumn("__thr", thr)
      .filter(bucket < col("__thr"))
      .withColumn("sample_weight", lit(65536.0) / col("__thr").cast("double"))
      .drop("__thr")
  }

  /** Epoch-reproducible global shuffle + shard assignment — the step that
    * turns a curated corpus into the TRAINING ORDER a data loader consumes.
    * Each row gets a deterministic shuffle key (the md5-derived hash of
    * `seed|id`, masked to 62 bits so signed/unsigned engines order it
    * identically), a shard = key mod `shards`, and its position within the
    * shard (ordered by key, id). Changing the seed is a fresh epoch
    * permutation; re-running with the same seed reproduces the exact order
    * — invariant under partitioning, cluster size, and engine (contrast
    * `orderBy(rand())`, which is none of these).
    *
    * Shape: the key is a per-row projection (map-only); the only shuffle is
    * the shard-keyed exchange, and each shard's position sort is an
    * in-task (disk-backed) sort of corpus/`shards` rows — `shards` is the
    * parallelism knob a 100 TB run raises so no single sort dominates.
    * There is NO global total order (that would funnel one task); the
    * (shard, pos) pair IS the epoch order a loader reads shard-by-shard. */
  def shardShuffle(df: DataFrame, idCol: String, seed: String = "epoch0",
      shards: Int = 64): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    import org.apache.spark.sql.expressions.Window
    val key = graft.functions.HashExprs.md5NumberLower(
      concat(lit(seed), lit("|"), col(idCol).cast("string")))
      .bitwiseAND(lit(0x3fffffffffffffffL))
    df.select(col(idCol), key.as("skey"))
      .withColumn("shard", (col("skey") % shards).cast("int"))
      // pos is LONG, computed as a 64-bit running count rather than
      // row_number() (whose IntegerType wraps past ~2.1B rows — a real
      // bound for one shard of a 100 TB corpus). The (skey, id) ordering
      // is total (md5 key ties broken by the unique id), so the running
      // count IS the row number, in the bigint domain sv22's manifest
      // schema already declares for the same concept.
      .withColumn("pos", count(lit(1)).over(
        Window.partitionBy(col("shard")).orderBy(col("skey"), col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Source-mixture statistics + temperature re-weighting — the pass that
    * decides how hard to up/down-sample each source (domain) before
    * training. Per source: exact doc/token counts, the natural token share
    * `p`, and the α = 1/2 temperature boost `1/√p` (∝ the factor that turns
    * the natural mixture p into the flattened target p^α; emitted
    * UN-normalized because the normalizer Σ p^α is a cross-row float sum
    * whose value depends on addition order — the caller normalizes once
    * over the handful of source rows, where order is theirs to fix).
    *
    * Every emitted number is deterministic bit-for-bit across engines:
    * counts are exact integer sums; `p` is ONE correctly-rounded division
    * of two exactly-converted BIGINTs; the boost is ONE correctly-rounded
    * `sqrt` (IEEE 754 requires sqrt and ÷ to round correctly, unlike `pow`
    * or `ln`). Shape: one low-cardinality groupBy (sources), a 1-row total
    * joined back by broadcast — no driver-side count, no second scan. */
  def mixtureWeights(docs: DataFrame, stratumCol: String,
      tokenCount: Column): DataFrame = {
    val s = docs.groupBy(col(stratumCol).as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(tokenCount).as("n_tokens"))
    val t = s.agg(sum(col("n_tokens")).as("total"))
    s.crossJoin(broadcast(t))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("total").cast("double")).as("p"),
        sqrt(col("total").cast("double") / col("n_tokens").cast("double"))
          .as("boost"))
  }

  /** Token-budget MIXTURE PLAN — the data-constrained-scaling decision
    * ("how many tokens do we draw from each source, and how many epochs of
    * each source is that?") made hash-exact. Per source: exact doc/token
    * counts, the natural token share, the α = 1/2 temperature-flattened
    * target allocation of `budgetTokens`, and the resulting repeat factor
    * (epochs) — `epochs_micro > 1 000 000` is the data-constrained signal
    * (that source repeats during training; Muennighoff et al. 2023 put the
    * useful-repeat knee near 4 epochs).
    *
    * Arithmetic is INTEGER end-to-end so any engine reproduces it
    * bit-for-bit: the α = 1/2 weight uses the integer square root
    * `s = ⌊√n_tokens⌋` (p^α ∝ √n_tokens; floor(IEEE sqrt) is exact here —
    * for n < 2^52 the true √n of a non-square sits ≳ 1/(2√n) from the
    * nearest integer, orders of magnitude past double rounding error),
    * the allocation is `budget·s div Σs`, and shares/epochs are micro-unit
    * integer divisions. No cross-row FLOAT sum anywhere — those depend on
    * addition order, which engines do not promise.
    *
    * Shape: one low-cardinality groupBy (sources), ONE 1-row total
    * broadcast back — same plan as [[mixtureWeights]]. */
  def mixturePlan(docs: DataFrame, stratumCol: String, tokenCount: Column,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val s = docs.groupBy(col(stratumCol).as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(tokenCount).as("n_tokens"))
      .withColumn("s", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    val t = s.agg(sum(col("n_tokens")).as("total"), sum(col("s")).as("s_total"))
    s.crossJoin(broadcast(t))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("CAST(n_tokens AS DECIMAL(38,0)) * 1000000 div total").as("p_micro"),
        expr(s"CAST($budgetTokens AS DECIMAL(38,0)) * s div s_total")
          .as("planned_tokens"))
      .withColumn("epochs_micro",
        expr("CAST(planned_tokens AS DECIMAL(38,0)) * 1000000 div n_tokens"))
  }

  /** Exact-k deterministic sample per stratum: the k rows with the
    * SMALLEST `md5_number_lower(seed|stratum|id) & Long.MaxValue` values
    * (63-bit mask so signed-long and unsigned-SQL orderings agree),
    * ties broken by id. The eval-set construction primitive: exactly k
    * rows per language/domain, reproducible across runs, engines, and
    * repartitioning.
    *
    * Scale shape: a per-stratum window sort would funnel each stratum
    * through ONE task (a giant stratum = straggler). Instead a typed
    * bounded-top-k [[org.apache.spark.sql.expressions.Aggregator]] runs as
    * a partial aggregate: every map task keeps at most k candidates per
    * stratum, the shuffle carries ≤ k rows per (partition, stratum), and
    * the merge keeps k — the classic distributed TakeOrdered-per-key.
    * Output: (stratum, id, rank) with rank 1..k by hash order. */
  /** The ONE bounded top-k Aggregator both exact-k selectors run on —
    * keeps the `k` first (Long, Long) pairs under `before` per group, as a
    * partial aggregate: every map task holds ≤ k candidates per group, the
    * shuffle carries ≤ k rows per (partition, group), and the merge keeps
    * k. Input rows are (group, a, b); the buffer is `before`-ascending. */
  private lazy val pairArrayEnc: org.apache.spark.sql.Encoder[Array[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long)]]()

  private def boundedTopK(k: Int, before: ((Long, Long), (Long, Long)) => Boolean)
      : org.apache.spark.sql.expressions.Aggregator[
        (String, Long, Long), Array[(Long, Long)], Array[(Long, Long)]] =
    new org.apache.spark.sql.expressions.Aggregator[
        (String, Long, Long), Array[(Long, Long)], Array[(Long, Long)]] {
      override def zero: Array[(Long, Long)] = Array.empty
      override def reduce(buf: Array[(Long, Long)],
          row: (String, Long, Long)): Array[(Long, Long)] = {
        // hot path: once the buffer is full, almost every row fails the
        // top-k cut — reject with one comparison, no allocation
        if (buf.length == k && !before((row._2, row._3), buf(k - 1))) buf
        else merge(buf, Array((row._2, row._3)))
      }
      override def merge(x: Array[(Long, Long)],
          y: Array[(Long, Long)]): Array[(Long, Long)] = {
        val out = new Array[(Long, Long)](math.min(x.length + y.length, k))
        var i = 0; var j = 0; var w = 0
        while (w < out.length) {
          out(w) =
            if (j >= y.length || (i < x.length && before(x(i), y(j)))) { i += 1; x(i - 1) }
            else { j += 1; y(j - 1) }
          w += 1
        }
        out
      }
      override def finish(b: Array[(Long, Long)]): Array[(Long, Long)] = b
      override def bufferEncoder: org.apache.spark.sql.Encoder[Array[(Long, Long)]] =
        pairArrayEnc
      override def outputEncoder: org.apache.spark.sql.Encoder[Array[(Long, Long)]] =
        pairArrayEnc
    }

  def stratifiedExactK(df: DataFrame, stratumCol: String, idCol: String,
      k: Int, seed: String = "exk42"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val sp = df.sparkSession
    import sp.implicits._
    val hash = graft.functions.HashExprs.md5NumberLower(
      concat(lit(seed), lit("|"), col(stratumCol), lit("|"), col(idCol).cast("string")))
      .bitwiseAND(lit(Long.MaxValue))
    // NULL stratum/id rows are dropped — same contract as
    // [[stratifiedSample]]'s NULL-propagating hash (and without the filter
    // the typed encoder would fail on NULL in a non-nullable Long field)
    val keyed = df.select(col(stratumCol).cast("string").as("stratum"),
        hash.as("h"), col(idCol).cast("long").as("id"))
      .filter(col("stratum").isNotNull && col("id").isNotNull)
      .as[(String, Long, Long)]
    // keep order: ascending (hash, id)
    val topK = boundedTopK(k, (a, b) => a._1 < b._1 || (a._1 == b._1 && a._2 < b._2))
    keyed.groupByKey(_._1).agg(topK.toColumn.name("top"))
      .flatMap { case (stratum, top) =>
        top.iterator.zipWithIndex.map { case ((_, id), i) => (stratum, id, i + 1) }
      }
      .toDF("stratum", "id", "rank")
  }

  /** Per-group cap by a quality score — the "at most `cap` documents per
    * domain, best first" rule every web-corpus recipe applies (per-domain
    * caps counter SEO-farm over-representation; the keeper set is the
    * `cap` HIGHEST-scoring docs, not a random sample — contrast
    * [[stratifiedExactK]], which selects by seeded hash for unbiased eval
    * sets). Ties break by ascending id so the selection is total-ordered
    * and reproducible.
    *
    * Scale shape: identical to [[stratifiedExactK]] — a per-group window
    * sort would funnel each domain through one task, and web domains are
    * exactly where skew lives (one crawl domain can be 1% of the corpus).
    * Instead the bounded top-k Aggregator runs as a partial aggregate:
    * every map task keeps ≤ cap candidates per group, the shuffle carries
    * ≤ cap rows per (partition, group), and the merge keeps cap. A
    * 10⁹-page domain costs the same shuffle bytes as a 10³-page one.
    *
    * Output: (group, id, score, rank) with rank 1..cap by (score desc, id
    * asc). Integer scores only — the cap decision must not ride on float
    * ordering. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: Column, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val sp = df.sparkSession
    import sp.implicits._
    val keyed = df.select(col(groupCol).cast("string").as("grp"),
        scoreCol.cast("long").as("score"), col(idCol).cast("long").as("id"))
      .filter(col("grp").isNotNull && col("score").isNotNull && col("id").isNotNull)
      .as[(String, Long, Long)]
    // keep order: score DESC, id ASC
    val topK = boundedTopK(cap, (a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
    keyed.groupByKey(_._1).agg(topK.toColumn.name("top"))
      .flatMap { case (grp, top) =>
        top.iterator.zipWithIndex.map { case ((sc, id), i) => (grp, id, sc, i + 1) }
      }
      .toDF("group", "id", "score", "rank")
  }

  /** NEXT-FIT bin packing: documents never split across packs — a doc that
    * would overflow the open bin closes it and starts a new one (oversized
    * docs get a bin alone). The padding-free-boundaries layout instruction
    * tuning wants, complementing [[packSequences]]' concat-and-chunk (which
    * splits docs to eliminate padding instead).
    *
    * Scale shape: packing is order-dependent, so it cannot be a pure map —
    * but like [[packSequences]] it does NOT need a global sort. Documents
    * hash into `shards` independent streams; each shard's stream is packed
    * by `flatMapSortedGroups` (Spark sorts within the shard shuffle by id —
    * secondary sort, no in-memory group materialization) with O(1) state:
    * the open bin's fill. One shuffle, bins globally unique via
    * shard · 2⁴⁰ + index. All arithmetic integer → hash-exact cross-engine;
    * the oracle replays the same greedy fold as a recursive CTE.
    *
    * Output: (doc_id, n_tokens, shard, bin_id, fill_after) — fill_after is
    * the open bin's token count after placing the doc, which pins the
    * whole greedy trace, not just the final assignment. */
  def packNextFit(df: DataFrame, idCol: String, textCol: String,
      budget: Int = 512, shards: Int = 8): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0 && (shards & (shards - 1)) == 0,
      s"shards must be a power of two, got $shards")
    val sp = df.sparkSession
    import sp.implicits._
    val nTok = TextOps.tokenCount(col(textCol)).cast("long")
    val shard = graft.functions.HashExprs.md5NumberLower(
      concat(lit("pack42|"), col(idCol).cast("string")))
      .bitwiseAND(lit((shards - 1).toLong)).cast("int")
    // NULL id/text rows are dropped — same contract as [[stratifiedExactK]]
    // (and without the filter the typed encoder dies on NULL in a
    // non-nullable Long field)
    val base = df.select(col(idCol).cast("long").as("id"),
        nTok.as("n_tokens"), shard.as("shard"))
      .filter(col("id").isNotNull && col("n_tokens").isNotNull)
      .as[(Long, Long, Int)]
    base.groupByKey(_._3)
      .flatMapSortedGroups(col("id")) { (sh: Int, it: Iterator[(Long, Long, Int)]) =>
        var bin = 0L
        var fill = 0L
        var first = true
        it.map { case (id, n, _) =>
          if (first) { fill = n; first = false }
          else if (fill + n <= budget) fill += n
          else { bin += 1; fill = n }
          (id, n, sh, sh.toLong * (1L << 40) + bin, fill)
        }
      }
      .toDF("doc_id", "n_tokens", "shard", "bin_id", "fill_after")
  }

  /** Concat-and-chunk sequence packing: assign every document a (pack_id,
    * begin_offset) as if the corpus were concatenated in a deterministic
    * order and cut into fixed `budget`-token packs — the standard LLM
    * pretraining batching layout (documents flow across pack boundaries;
    * the trainer masks attention at document breaks).
    *
    * Scale shape: packing is inherently order-sensitive, so it cannot be a
    * pure map — but it does NOT need a global sort either. The corpus is
    * split into `shards` independent streams by a deterministic hash of the
    * id; each shard is packed separately with ONE window (cumulative token
    * sum over the shard's id order). That is a single hash-partition
    * shuffle; each shard's window sorts locally. At 100 TB, `shards` is
    * sized to the cluster (thousands), keeping every shard's sort in one
    * task's memory; pack ids are globally unique via shard * 2⁴⁰ + index.
    *
    * Output: (id, n_tokens, shard, pack_id, begin_offset) plus any `carry`
    * columns — enough for a writer to materialize packs by grouping on
    * pack_id. Documents longer than `budget` simply span multiple packs
    * (concat-and-chunk semantics). All arithmetic is integer → hash-exact
    * across engines. `carry` rides metadata columns (language, sample
    * weight, …) through the window, so a composed pipeline needs no
    * join-back against its own upstream — at 100 TB that join-back would
    * re-scan the corpus. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Int = 512, shards: Int = 8,
      carry: Seq[String] = Nil): DataFrame = {
    require(budget > 0, "budget must be positive")
    // power-of-two shard count makes the assignment a bit-mask of the hash —
    // identical on signed (Spark long) and unsigned (SQL UBIGINT) views of
    // the same 64-bit value, so the layout is cross-engine exact
    require(shards > 0 && (shards & (shards - 1)) == 0,
      s"shards must be a power of two, got $shards")
    val reserved = Set("id", "n_tokens", "shard", "cum", "pack_id", "begin_offset")
    require(carry.forall(c => !reserved.contains(c)),
      s"carry columns collide with generated output columns: " +
        s"${carry.filter(reserved.contains).mkString(", ")} (reserved: ${reserved.mkString(", ")})")
    val nTok = TextOps.tokenCount(col(textCol)).cast("long")
    val shard = graft.functions.HashExprs.md5NumberLower(
      concat(lit("pack42|"), col(idCol).cast("string")))
      .bitwiseAND(lit((shards - 1).toLong)).cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol).as("id") +: nTok.as("n_tokens") +: shard.as("shard") +:
        carry.map(col): _*)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      // `div`, not `/`: Column./ is Divide, which is DOUBLE division in
      // Spark — exactness here must not ride on float rounding
      .withColumn("pack_id", expr(
        s"cast(shard as bigint) * ${1L << 40}L + (cum - n_tokens) div $budget"))
      .withColumn("begin_offset", ((col("cum") - col("n_tokens")) % budget).cast("int"))
      .drop("cum")
  }

  /** DSIR-shaped importance scoring (Xie et al. 2023, "Data Selection via
    * Importance Resampling"): hash every token into one of `buckets`
    * feature buckets, estimate the TARGET distribution (rows matching
    * `isTarget`) and the SOURCE distribution (all rows) over those buckets,
    * and score each document by its mean per-token target/source ratio —
    * documents whose token profile looks like the target domain score high
    * and get up-sampled by the caller. DSIR's log-likelihood ratio is
    * replaced by the mean LINEAR ratio in exact integer micro-units: same
    * ordering intent, zero cross-engine float/log hazard (`log` is not
    * required to be correctly rounded; integer division is exact).
    *
    * Output: (doc_id, n_tokens, score_micro); score 0 for empty docs.
    * score_micro = mean over token occurrences of
    * `ct(bucket)·10⁶ div cs(bucket)` — between 0 (bucket never appears in
    * target) and 10⁶ (bucket exclusive to target).
    *
    * Shape at 100 TB: two corpus passes, as DSIR requires (one to estimate,
    * one to score). The estimate pass reduces to `buckets` rows via
    * map-side combine (the shuffle carries ≤ buckets rows per map task);
    * the ratio table — 256 rows here — BROADCASTS to the scoring pass, so
    * scoring adds one doc-keyed map-combined aggregate and no join
    * shuffle. The md5-derived bucket hash is DuckDB's `md5_number_lower`,
    * so the oracle replays feature hashing exactly. */
  def importanceRatios(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val occ = docs.select(col(idCol).cast("long").as("doc_id"), isTarget.as("__t"),
        explode(filter(graft.pipeline.TextOps.tokens(col(textCol)),
          t => length(t) > 0)).as("tok"))
      .withColumn("b", graft.functions.HashExprs.md5NumberLower(col("tok"))
        .bitwiseAND(lit((buckets - 1).toLong)))
    val ratios = occ.groupBy(col("b")).agg(
        count(lit(1)).as("cs"),
        sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).as("ct"))
      // the product is corpus-aggregate scale: a bucket with >= ~9.2e12
      // target-token occurrences would wrap BIGINT*1e6 negative (non-ANSI);
      // DECIMAL(38,0) keeps it exact, and `div` still lands in BIGINT
      // micro-units <= 1e6 (DuckDB raises on BIGINT overflow rather than
      // wrapping, so the engines agree wherever both complete)
      .select(col("b"),
        expr("CAST(ct AS DECIMAL(38,0)) * 1000000 div cs").as("ratio_micro"))
    val scored = occ.join(broadcast(ratios), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("ratio_micro")).as("__sum"))
      .select(col("doc_id"), col("n_tokens"),
        expr("__sum div greatest(n_tokens, 1)").as("score_micro"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score_micro"), lit(0L)).as("score_micro"))
  }
}
