package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.GraftStreaming

/** Streaming queries surfaced through the batch correctness gate: each runs
  * a Structured Streaming pipeline over the events parquet (as a file-stream
  * source) to completion with Trigger.AvailableNow, then returns the sink
  * table as a DataFrame whose contents are DETERMINISTIC and expressible in
  * batch SQL — so `graft.streaming` gets driver-checked CORRECTNESS rows,
  * not just ScalaTests.
  *
  * Determinism notes:
  *  - sv1 emits only the (user_id, event_type) KEY SET of the streaming
  *    dedup — which row of each duplicate group survives depends on
  *    micro-batch partition order, but the key set equals batch DISTINCT;
  *  - sv2's stateful sessionizer folds each user's events in (ts, event_id)
  *    order inside the (single) batch, so the final per-user counts equal
  *    the batch window twin exactly.
  */
object StreamBatch {

  /** Ephemeral per-invocation working dirs (streaming checkpoints, file
    * sources, CDC log dirs): every sv query creates a FRESH one per call
    * and abandons it at the end — the durability a persistent checkpoint
    * buys is out of scope by construction (a re-run re-creates the world,
    * and the crash/replay specs exercise torn state through the kv store's
    * own stamps, not the checkpoint). On this host they landed on ext4
    * /tmp, so every offset/commit-log and state-store delta write paid
    * create+fsync+rename against a real disk (guide §6: small files hurt
    * twice; a drain suite writes dozens of them). Default to RAM-backed
    * /dev/shm when present; `graft.stream.tmpBase` overrides for
    * deployments that want durable checkpoints (i.e. streams that OUTLIVE
    * the process — at cluster scale point this at reliable storage). */
  private def tempWorkDir(s: SparkSession, prefix: String): java.nio.file.Path = {
    val base = s.conf.getOption("graft.stream.tmpBase").orElse {
      val shm = java.nio.file.Paths.get("/dev/shm")
      if (Files.isDirectory(shm) && Files.isWritable(shm)) Some("/dev/shm")
      else None
    }
    base match {
      case Some(b) => Files.createTempDirectory(
        java.nio.file.Paths.get(b), prefix)
      case None => Files.createTempDirectory(prefix)
    }
  }

  /** Stream the events parquet through a fresh file-source dir (the parquet
    * file is copied so the source directory contains exactly one file). */
  private def eventStream(s: SparkSession, dir: String): DataFrame = {
    ensureCkptChecksum(s)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val src = tempWorkDir(s, "graft-sv-src")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      src.resolve("events.parquet"))
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    Tables.normalizeEventTs(s.readStream.schema(schema).parquet(src.toString))
  }

  /** Stateful streaming operators launch one state-store task per shuffle
    * partition PER MICRO-BATCH; at these data sizes 32 partitions is pure
    * fixed overhead (measured ~2× on the stream-stream join). Pin 8 for the
    * stream's lifetime and restore after: the state partitioning bakes into
    * each query's FRESH checkpoint at its first batch, so the choice is
    * per-query-run, and every sv oracle is partitioning-independent (key
    * sets, per-group folds, maxes). At real scale the inverse applies —
    * size state partitions to executor count × cores, not down. */
  private def withStreamShuffle[A](s: SparkSession)(f: => A): A = {
    ensureCkptChecksum(s)
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try f finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Spark 4.1 writes a `.crc` companion next to EVERY checkpoint file
    * (offset/commit logs, state deltas/snapshots) and re-verifies it on
    * read — per checkpointed file that is one extra create+write+fsync and
    * one extra open+read (guide §6: small files hurt twice). For these
    * single-JVM drains over fresh local checkpoints corruption detection
    * buys nothing; measured on the state-heavy streams (paired A/B):
    * sv4 9.9→7.0 s, sv6 4.8→4.1 s. Deployments on flaky object storage
    * re-enable with `graft.stream.ckptChecksum=true`. SET-ONCE (idempotent,
    * no restore window) rather than set/restore: the conf only affects
    * graft's own streaming checkpoints, and a set-once cannot leak a
    * mid-run value the way an interrupted restore can. */
  private def ensureCkptChecksum(s: SparkSession): Unit =
    s.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled",
      s.conf.get("graft.stream.ckptChecksum", "false"))

  /** AQE OFF for one drain run (restoring after): every foreachBatch job a
    * CDC maintainer issues is either a hinted broadcast, a bounded sliver
    * read, or a batch-proportional write — AdaptiveSparkPlan's per-job
    * stage-materialization and re-planning has nothing to re-optimize and
    * costs measurably (paired A/B at sf0.1, wall and JVM-cpu: sv21
    * 17.5→11.3 s / 70→52 cpu-s, sv12 6.2→4.5 / 27→17, sv25 24.4→20.5,
    * sv14 ≥15→14.5, sv22 8.1→7.4, sv26 10.0→8.9). Unlike the join-view
    * pin this deliberately does NOT touch shuffle partitions: a
    * maintainer's first batch is a corpus-sized load with real compute
    * that needs the session's full parallelism (an 8-partition pin
    * measured 2-6× slower there). `graft.stream.aqe=true` restores AQE
    * for deployments whose catch-up batches rival the corpus. */
  private def withDrainAqe[A](s: SparkSession)(f: => A): A = {
    ensureCkptChecksum(s)
    val aqeK = "spark.sql.adaptive.enabled"
    val prev = s.conf.get(aqeK)
    s.conf.set(aqeK, s.conf.get("graft.stream.aqe", "false"))
    try f finally s.conf.set(aqeK, prev)
  }

  private def runToMemory(df: DataFrame, name: String, mode: String): Unit =
    withStreamShuffle(df.sparkSession) {
      // explicit RAM-backed checkpoint (see tempWorkDir) — without it the
      // engine creates an implicit one under java.io.tmpdir (ext4 here),
      // paying disk fsyncs for offset/commit/state files per micro-batch
      val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
        .option("checkpointLocation",
          tempWorkDir(df.sparkSession, s"graft-$name-ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

  /** sv1: watermarked streaming dedup — one row per distinct
    * (user_id, event_type); the emitted key set equals batch DISTINCT. */
  def sv1StreamDedup(s: SparkSession, dir: String): DataFrame = {
    val deduped = GraftStreaming.dedupStream(
      eventStream(s, dir), Seq("user_id", "event_type"), "ts")
      .select(col("user_id"), col("event_type"))
    runToMemory(deduped, "sv1_out", "append")
    s.table("sv1_out").select(col("user_id"), col("event_type"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val sv1Sql: String =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  /** sv2: stateful streaming sessionization (flatMapGroupsWithState) — the
    * last update per user equals the batch gap-sessionizer exactly. */
  def sv2StreamSessionize(s: SparkSession, dir: String): DataFrame = {
    runToMemory(GraftStreaming.sessionizeStream(eventStream(s, dir)),
      "sv2_out", "update")
    // update mode re-emits a user per batch; counts are monotone, so the
    // max per user is the final state
    s.sql(
      """SELECT user_id, max(n_sessions) AS n_sessions, max(n_events) AS n_events
        |FROM sv2_out GROUP BY user_id ORDER BY user_id""".stripMargin)
  }

  /** Same semantics as the batch sessionizer ev2 — same oracle. */
  val sv2Sql: String = Events.ev2Sql

  private val kvSinkCatalog =
    """{"table":{"namespace":"default", "name":"kv_stream_events"},
      |"rowkey":"key",
      |"columns":{
      |"event_id":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"user_id":{"cf":"f", "col":"user", "type":"bigint"},
      |"event_type":{"cf":"f", "col":"etype", "type":"string"},
      |"value":{"cf":"f", "col":"value", "type":"double"}}}""".stripMargin

  /** sv3: streaming graft-kv SINK end to end — the stream flows through
    * the NATIVE DSv2 STREAMING_WRITE sink (`writeStream.format("graft-kv")`,
    * [[graft.datasource.GraftStreamingWrite]], including start-of-query
    * DDL+presplit), then the table reads back through the connector. Puts
    * are idempotent upserts by (key, cf, qual, ts) with a fixed stamp, so
    * at-least-once micro-batch delivery collapses to exactly-once table
    * contents = batch SELECT of the source. */
  def sv3StreamKvSink(s: SparkSession, dir: String): DataFrame = {
    if (!graft.store.KvStore.exists("default:kv_stream_events")) {
      val maxId = Tables.events(s, dir)
        .agg(max(col("event_id").cast("long"))).head().getLong(0)
      val stream = eventStream(s, dir)
        .select(col("event_id").cast("long").as("event_id"),
          col("user_id").cast("long").as("user_id"),
          col("event_type"), col("value").cast("double").as("value"))
      GraftStreaming.runOnce(GraftStreaming.kvSink(stream, Map(
        "catalog" -> kvSinkCatalog, "newtable" -> "4", "timestamp" -> "1000",
        "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString)))
    }
    s.read.format("graft-kv").option("catalog", kvSinkCatalog).load()
      .orderBy(col("event_id"))
  }

  val sv3Sql: String =
    """SELECT CAST(event_id AS BIGINT) AS event_id, CAST(user_id AS BIGINT) AS user_id,
      |       event_type, CAST(value AS DOUBLE) AS value
      |FROM events ORDER BY event_id""".stripMargin

  /** sv4: stream-stream interval self-join — every purchase matched to the
    * same user's clicks within the preceding 10 minutes. Watermarks on both
    * sides + the time-range join condition bound the join state; the inner
    * join's match set is deterministic and equals the batch interval join. */
  def sv4StreamIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val joined = GraftStreaming.intervalJoinStream(eventStream(s, dir))
      .select(col("l_id").cast("long").as("purchase_id"),
        col("r_id").cast("long").as("click_id"),
        col("l_user").cast("long").as("user_id"),
        (unix_micros(col("l_ts")) - unix_micros(col("r_ts"))).as("gap_us"))
    runToMemory(joined, "sv4_out", "append")
    s.table("sv4_out").orderBy(col("purchase_id"), col("click_id"))
  }

  val sv4Sql: String =
    """SELECT CAST(p.event_id AS BIGINT) AS purchase_id,
      |       CAST(c.event_id AS BIGINT) AS click_id,
      |       CAST(p.user_id AS BIGINT) AS user_id,
      |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |FROM events p JOIN events c
      |  ON p.user_id = c.user_id AND p.event_type = 'purchase'
      | AND c.event_type = 'click'
      | AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts
      |ORDER BY purchase_id, click_id""".stripMargin

  /** sv5: STREAM-STATIC join — the event stream enriched against the
    * graft-kv customer dimension (read through the connector, so the static
    * side exercises the DSv2 scan inside a streaming micro-batch). Inner
    * stream-static joins need no watermark: the static side is re-planned
    * per batch and no join state accumulates. The enriched row set is
    * deterministic = the batch join. */
  def sv5StreamStaticJoin(s: SparkSession, dir: String): DataFrame = {
    Connector.ensureCustomer(s, dir)
    val dim = s.read.format("graft-kv")
      .option("catalog", Connector.customerCatalog).load()
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val joined = eventStream(s, dir)
      .select(col("event_id").cast("long").as("event_id"),
        col("user_id").cast("long").as("user_id"))
      .join(dim, col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_mktsegment"), col("c_acctbal"))
    runToMemory(joined, "sv5_out", "append")
    s.table("sv5_out").orderBy(col("event_id"))
  }

  val sv5Sql: String =
    """SELECT CAST(e.event_id AS BIGINT) AS event_id,
      |       CAST(e.user_id AS BIGINT) AS user_id,
      |       c.c_mktsegment, c.c_acctbal
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |ORDER BY event_id""".stripMargin

  /** sv6: watermarked streaming windowed aggregation in APPEND mode — the
    * streaming twin of ev1, emitted through the gate with an exact oracle.
    * Append mode finalizes a window only once the watermark (max event time
    * − 10 min) passes its end, so the emitted set is the batch aggregate
    * RESTRICTED to closed windows — a deterministic condition the oracle
    * reproduces with `ws + 5 min <= max(ts) − 10 min`. Trailing windows
    * stay open by design (in production the next day's data closes them);
    * restricting the oracle rather than switching to complete mode keeps
    * the driver row exercising the real production path: bounded state,
    * watermark eviction, append-only sink. */
  def sv6StreamWindowAgg(s: SparkSession, dir: String): DataFrame = {
    runToMemory(GraftStreaming.windowedEventAgg(eventStream(s, dir)),
      "sv6_out", "append")
    s.table("sv6_out").orderBy(col("ws"), col("event_type"))
  }

  val sv6Sql: String =
    """WITH agg AS (
      |  SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, event_type,
      |    count(*) AS n,
      |    CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS sum_value
      |  FROM events GROUP BY 1, 2),
      |wmk AS (SELECT max(ts) - INTERVAL 10 MINUTE AS wm FROM events)
      |SELECT agg.ws, agg.event_type, agg.n, agg.sum_value
      |FROM agg, wmk WHERE agg.ws + INTERVAL 5 MINUTE <= wmk.wm
      |ORDER BY agg.ws, agg.event_type""".stripMargin

  /** sv7: stateful streaming anomaly detection — ev7's streaming twin
    * (flatMapGroupsWithState holding each user's last 20 micro-unit values,
    * scoring with the SAME 128-bit integer test). Counters are monotone, so
    * the max per user is the final state; it equals the batch ev7 output
    * bit for bit, hence the shared oracle. */
  def sv7StreamAnomaly(s: SparkSession, dir: String): DataFrame = {
    runToMemory(GraftStreaming.anomalyStream(eventStream(s, dir)),
      "sv7_out", "update")
    s.sql(
      """SELECT user_id, max(n_events) AS n_events, max(n_scored) AS n_scored,
        |       max(n_anomalies) AS n_anomalies
        |FROM sv7_out GROUP BY user_id ORDER BY user_id""".stripMargin)
  }

  /** Same semantics and arithmetic as batch ev7 — same oracle. */
  val sv7Sql: String = Events.ev7Sql

  /** sv8: stateful streaming transition counting — ev11's streaming twin
    * (flatMapGroupsWithState holding each user's chain clock + per-pair
    * counts). Per-user counts are monotone, so max per (user, from, to) is
    * the final state; summing across users and row-normalizing with the
    * SAME integer micro-unit division reproduces the batch transition
    * matrix exactly, hence the shared oracle. */
  def sv8StreamTransitions(s: SparkSession, dir: String): DataFrame = {
    runToMemory(GraftStreaming.transitionStream(eventStream(s, dir)),
      "sv8_out", "update")
    s.sql(
      """WITH per AS (SELECT user_id, from_type, to_type, max(n) AS n
        |             FROM sv8_out GROUP BY 1, 2, 3),
        |c AS (SELECT from_type, to_type, sum(n) AS n FROM per GROUP BY 1, 2),
        |t AS (SELECT from_type, to_type, n,
        |        sum(n) OVER (PARTITION BY from_type) AS n_from FROM c)
        |SELECT from_type, to_type, n, n_from, n * 1000000 div n_from AS p_micro
        |FROM t ORDER BY from_type, to_type""".stripMargin)
  }

  /** Same semantics and arithmetic as batch ev11 — same oracle. */
  val sv8Sql: String = Events.ev11Sql

  /** sv9: stateful streaming ordered funnel — ev8's streaming twin
    * (flatMapGroupsWithState holding each user's three set-at-most-once
    * stage stamps). Stage and stamps are monotone, so the per-user max at
    * the gate is the final state; `timestamp_micros` turns the exact
    * integer stamps back into timestamps, hence the shared oracle. */
  def sv9StreamFunnel(s: SparkSession, dir: String): DataFrame = {
    runToMemory(GraftStreaming.funnelStream(eventStream(s, dir)),
      "sv9_out", "update")
    s.sql(
      """SELECT user_id, CAST(max(funnel_stage) AS INT) AS funnel_stage,
        |  timestamp_micros(max(tv_us)) AS ts_view,
        |  timestamp_micros(max(tc_us)) AS ts_click,
        |  timestamp_micros(max(tp_us)) AS ts_purchase
        |FROM sv9_out GROUP BY user_id ORDER BY user_id""".stripMargin)
  }

  /** Same semantics as batch ev8 — same oracle. */
  val sv9Sql: String = Events.ev8Sql

  private val sv10SourceCatalog =
    """{"table":{"namespace":"default", "name":"kv_cdc_events"},
      |"rowkey":"key",
      |"columns":{
      |"event_id":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"user_id":{"cf":"f", "col":"user", "type":"bigint"},
      |"event_type":{"cf":"f", "col":"etype", "type":"string"},
      |"value":{"cf":"f", "col":"value", "type":"double"}}}""".stripMargin

  private val sv10SinkCatalog = sv10SourceCatalog
    .replace("\"kv_cdc_events\"", "\"kv_cdc_mirror\"")

  /** sv10: native streaming SOURCE end to end — the CDC round trip. Three
    * stamped write generations land in a kv table; after each, a
    * `readStream.format("graft-kv")` query ([[graft.datasource
    * .GraftMicroBatchStream]], offsets = per-region MVCC high-water marks)
    * resumes from ONE shared checkpoint and drains into the native kv SINK,
    * stamping that phase's rows with a fixed sink timestamp. Each resumed
    * run therefore mirrors exactly the rows written since the previous run
    * — the incremental-refresh shape — and the mirror's exploded-version
    * read (mergeToLatest=false) exposes all three generations at once:
    * full snapshot + the %7 update wave + the %13 update wave, which is
    * precisely the UNION ALL the oracle states. */
  def sv10StreamKvSource(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir).select(
      col("event_id").cast("long").as("event_id"),
      col("user_id").cast("long").as("user_id"),
      col("event_type"),
      col("value").cast("double").as("value"))
    val maxId = base.agg(max(col("event_id"))).head().getLong(0)
    def writeGen(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> sv10SourceCatalog, "newtable" -> "4",
          "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    val ckpt = tempWorkDir(s, "graft-sv10-ckpt").toString
    def mirror(phaseStamp: Long): Unit = {
      ensureCkptChecksum(s)
      val stream = s.readStream.format("graft-kv")
        .option("catalog", sv10SourceCatalog).load()
      GraftStreaming.runOnce(GraftStreaming.kvSink(stream, Map(
        "catalog" -> sv10SinkCatalog, "newtable" -> "4",
        "timestamp" -> phaseStamp.toString, "maxVersions" -> "4",
        "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString,
        "checkpointLocation" -> ckpt)))
    }
    // fresh run every invocation: gen1 recreates the source, the mirror
    // drops, and the checkpoint dir above is new
    graft.store.KvStore.drop("default:kv_cdc_mirror")
    writeGen(base, ts = 1000, overwrite = true)
    mirror(phaseStamp = 10)
    writeGen(base.filter(col("event_id") % 7 === 0)
      .withColumn("value", col("value") + 1000000.0d), ts = 2000, overwrite = false)
    mirror(phaseStamp = 20)
    writeGen(base.filter(col("event_id") % 13 === 0)
      .withColumn("value", col("value") + 2000000.0d), ts = 3000, overwrite = false)
    mirror(phaseStamp = 30)
    s.read.format("graft-kv")
      .options(Map("catalog" -> sv10SinkCatalog, "maxVersions" -> "4",
        "mergeToLatest" -> "false")).load()
      .orderBy(col("event_id"), col("value"))
  }

  val sv10Sql: String =
    """WITH base AS (
      |  SELECT CAST(event_id AS BIGINT) AS event_id,
      |         CAST(user_id AS BIGINT) AS user_id,
      |         event_type, CAST(value AS DOUBLE) AS value
      |  FROM events)
      |SELECT * FROM (
      |  SELECT event_id, user_id, event_type, value FROM base
      |  UNION ALL
      |  SELECT event_id, user_id, event_type, value + 1000000 FROM base
      |  WHERE event_id % 7 = 0
      |  UNION ALL
      |  SELECT event_id, user_id, event_type, value + 2000000 FROM base
      |  WHERE event_id % 13 = 0
      |) ORDER BY event_id, value""".stripMargin

  private val sv11SourceCatalog = sv10SourceCatalog
    .replace("\"kv_cdc_events\"", "\"kv_cdc_del_src\"")
  private val sv11MirrorCatalog = sv10SourceCatalog
    .replace("\"kv_cdc_events\"", "\"kv_cdc_del_mirror\"")

  /** sv11: tombstone CDC end to end — the delete-propagation shape sv10
    * can't express. The source table goes through snapshot → ranged DELETE →
    * update wave; after each phase a `tombstones=true` streaming read
    * resumes from one shared checkpoint and a foreachBatch consumer applies
    * the changes to a mirror: `_deleted=false` rows upsert, `_deleted=true`
    * rows delete (exact keys, the store's SupportsDelete path). The final
    * mirror equals base minus the deleted id range — except ids the update
    * wave re-put afterwards (resurrection), which return with updated
    * values. Exactly the incremental-index-maintenance loop a 100 TB
    * training-data pipeline runs off CDC. */
  def sv11StreamCdcTombstones(s: SparkSession, dir: String): DataFrame = {
    import graft.datasource.FilterCompiler
    import graft.store.KvStore
    val base = Tables.events(s, dir).select(
      col("event_id").cast("long").as("event_id"),
      col("user_id").cast("long").as("user_id"),
      col("event_type"),
      col("value").cast("double").as("value"))
    val maxId = base.agg(max(col("event_id"))).head().getLong(0)
    val srcParsed = graft.catalog.GraftCatalog.parse(sv11SourceCatalog, Map.empty)
    val mirParsed = graft.catalog.GraftCatalog.parse(sv11MirrorCatalog, Map.empty)
    def writeGen(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> sv11SourceCatalog, "newtable" -> "4",
          "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    val ckpt = tempWorkDir(s, "graft-sv11-ckpt").toString
    def mirrorApply(phaseStamp: Long): Unit = {
      val stream = s.readStream.format("graft-kv")
        .option("catalog", sv11SourceCatalog).option("tombstones", "true").load()
      withDrainAqe(s) { // per-batch jobs are broadcasts/slivers: AQE only re-plans (see helper)
      val q = stream.writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          // the batch frame feeds three actions (tombstone write, isEmpty
          // probe, upsert write); pinning it reads the source slice once
          // per batch instead of three times — batch-proportional memory
          val b = df.persist()
          // tombstones mirror as DISTRIBUTED delete-writes (delete=true):
          // each task drops its own region slice's keys — no driver
          // round-trip of the deleted-id set
          b.filter(col("_deleted")).select(col("event_id"))
            .write.format("graft-kv")
            .options(Map("catalog" -> sv11MirrorCatalog, "delete" -> "true",
              "timestamp" -> phaseStamp.toString, "newtable" -> "4",
              "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
            .mode("append").save()
          val ups = b.filter(!col("_deleted")).drop("_deleted", "_cell_ts")
          if (!ups.isEmpty)
            ups.write.format("graft-kv")
              .options(Map("catalog" -> sv11MirrorCatalog, "newtable" -> "4",
                "timestamp" -> phaseStamp.toString,
                "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
              .mode("append").save()
          b.unpersist()
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      } // withDrainAqe
    }
    // fresh run every invocation (same protocol as sv10)
    KvStore.drop(mirParsed.qualifiedName)
    writeGen(base, ts = 1000, overwrite = true)
    mirrorApply(phaseStamp = 10)
    // ranged DELETE on the source — streams as _deleted=true tombstones
    val hrf = FilterCompiler.compileAll(srcParsed, Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("event_id", 100L),
      org.apache.spark.sql.sources.LessThanOrEqual("event_id", 499L))).exactOrThrow("CDC DELETE")
    KvStore.table(srcParsed.qualifiedName).delete(hrf.ranges, hrf.pred, stamp = 2000)
    mirrorApply(phaseStamp = 20)
    // update wave: re-puts %7 ids (resurrecting deleted ones) with new values
    writeGen(base.filter(col("event_id") % 7 === 0)
      .withColumn("value", col("value") + 1000000.0d), ts = 3000, overwrite = false)
    mirrorApply(phaseStamp = 30)
    s.read.format("graft-kv")
      .option("catalog", sv11MirrorCatalog).load()
      .orderBy(col("event_id"))
  }

  val sv11Sql: String =
    """WITH base AS (
      |  SELECT CAST(event_id AS BIGINT) AS event_id,
      |         CAST(user_id AS BIGINT) AS user_id,
      |         event_type, CAST(value AS DOUBLE) AS value
      |  FROM events)
      |SELECT event_id, user_id, event_type,
      |       CASE WHEN event_id % 7 = 0 THEN value + 1000000 ELSE value END AS value
      |FROM base
      |WHERE event_id NOT BETWEEN 100 AND 499 OR event_id % 7 = 0
      |ORDER BY event_id""".stripMargin

  private val sv15SourceCatalog = sv10SourceCatalog
    .replace("\"kv_cdc_events\"", "\"kv_cdc_lake_src\"")

  /** sv15: CDC → parquet LAKEHOUSE log, merge-on-read — the "sync the kv
    * table into the data lake" consumer. Same three-phase source protocol
    * as sv11 (snapshot → ranged DELETE → update wave with resurrections),
    * but the `tombstones=true` stream lands every change — upserts AND
    * delete tombstones — as IMMUTABLE appended parquet rows (the
    * Hudi/Iceberg merge-on-read shape: writes are append-only and O(batch),
    * no partition rewrite ever). The current state is reconstructed at READ
    * time: one window keyed by event_id takes the newest `_cell_ts` row and
    * drops it if it is a tombstone. At 100 TB the log partitions by ingest
    * batch, the reconstruction is one key shuffle, and a periodic
    * compaction (rewrite log → snapshot, exactly [[graft.store.KvTable
    * .compact]]'s role) bounds read amplification. Oracle = the source's
    * final state (sv11's SQL — same protocol, different sink). */
  /** sv16: streaming OHLC bars — ev12's streaming twin
    * ([[GraftStreaming.ohlcStream]]): the same one-aggregate bar under a
    * 10-minute watermark, append mode emitting each (type, hour) bar
    * exactly once when its window closes. The oracle recomputes ev12's
    * bars restricted to watermark-closed windows (sv6's closure pattern). */
  def sv16StreamOhlc(s: SparkSession, dir: String): DataFrame = {
    runToMemory(GraftStreaming.ohlcStream(eventStream(s, dir)),
      "sv16_out", "append")
    s.table("sv16_out").orderBy(col("ws"), col("event_type"))
  }

  val sv16Sql: String =
    """WITH b AS (
      |  SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
      |    count(*) AS n,
      |    arg_min(v, ord) AS open, max(v) AS high, min(v) AS low,
      |    arg_max(v, ord) AS close
      |  FROM (SELECT event_type, ts,
      |          CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v,
      |          lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
      |            || lpad(CAST(event_id AS VARCHAR), 10, '0') AS ord
      |        FROM events)
      |  GROUP BY 1, 2),
      |wmk AS (SELECT max(ts) - INTERVAL 10 MINUTE AS wm FROM events)
      |SELECT b.ws, b.event_type, b.n, b.open, b.high, b.low, b.close
      |FROM b, wmk WHERE b.ws + INTERVAL 1 HOUR <= wmk.wm
      |ORDER BY b.ws, b.event_type""".stripMargin

  private val sv17SourceCatalog =
    """{"table":{"namespace":"default", "name":"kv_cdc_docs"},
      |"rowkey":"key",
      |"columns":{
      |"doc_id":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"source":{"cf":"f", "col":"src", "type":"string"},
      |"text":{"cf":"f", "col":"text", "type":"string"}}}""".stripMargin

  /** sv17: incremental corpus statistics over the native CDC source —
    * [[GraftStreaming.mixtureDeltaStream]] run across two resumed drains:
    * generation 1 snapshots the corpus into the kv table; generation 2
    * rewrites every 5th doc's text, MOVES every 11th doc to a new source,
    * and inserts 10 brand-new docs. The stateful op emits only corrective
    * deltas into an append-only parquet log; summing the log reproduces
    * the batch per-source (n_docs, n_tokens) over the FINAL corpus state —
    * the incremental-materialized-view contract, with no corpus rescan. */
  def sv17StreamMixtureStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val base = Tables.documents(s, dir).select(
      col("doc_id").cast("long").as("doc_id"), col("source"), col("text"))
    val maxId = base.agg(max(col("doc_id"))).head().getLong(0)
    def writeGen(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> sv17SourceCatalog, "newtable" -> "4",
          "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    val sink = tempWorkDir(s, "graft-sv17-sink").toString
    val ckpt = tempWorkDir(s, "graft-sv17-ckpt").toString
    def drain(): Unit = withStreamShuffle(s) {
      // tombstones=true surfaces `_cell_ts` as a real column — the CDC
      // stamp mixtureDeltaStream uses to apply versions newest-wins,
      // independent of within-batch arrival order (no deletes occur in
      // this protocol; the _deleted filter is belt-and-braces)
      val stream = s.readStream.format("graft-kv")
        .option("catalog", sv17SourceCatalog).option("tombstones", "true")
        .load().filter(!col("_deleted"))
      val q = GraftStreaming.mixtureDeltaStream(stream).writeStream
        .outputMode("append").format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    writeGen(base, ts = 1000, overwrite = true)
    drain()
    val gen2 = base.filter(col("doc_id") % 5 === 0 || col("doc_id") % 11 === 0)
      .withColumn("text", when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" extra extra extra"))).otherwise(col("text")))
      .withColumn("source", when(col("doc_id") % 11 === 0, lit("moved"))
        .otherwise(col("source")))
      .unionByName(s.range(maxId + 1, maxId + 11).select(
        col("id").as("doc_id"), lit("newsrc").as("source"),
        concat(lit("brand new doc "), col("id").cast("string")).as("text")))
    writeGen(gen2, ts = 2000, overwrite = false)
    drain()
    s.read.parquet(sink)
      .groupBy(col("source"))
      .agg(sum(col("d_docs")).as("n_docs"), sum(col("d_tokens")).as("n_tokens"))
      .orderBy(col("source"))
  }

  val sv17Sql: String =
    """WITH mx AS (SELECT max(CAST(doc_id AS BIGINT)) AS m FROM documents),
      |fin AS (
      |  SELECT CASE WHEN doc_id % 11 = 0 THEN 'moved' ELSE source END AS source,
      |         CASE WHEN doc_id % 5 = 0 THEN text || ' extra extra extra'
      |              ELSE text END AS text
      |  FROM documents
      |  UNION ALL
      |  SELECT 'newsrc', 'brand new doc ' || CAST(m + u AS VARCHAR)
      |  FROM mx CROSS JOIN (SELECT unnest(range(1, 11)) AS u))
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
      |FROM fin GROUP BY source ORDER BY source""".stripMargin

  def sv15StreamCdcLakehouse(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.events(s, dir).select(
      col("event_id").cast("long").as("event_id"),
      col("user_id").cast("long").as("user_id"),
      col("event_type"),
      col("value").cast("double").as("value"))
    val maxId = base.agg(max(col("event_id"))).head().getLong(0)
    val srcParsed = graft.catalog.GraftCatalog.parse(sv15SourceCatalog, Map.empty)
    def writeGen(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> sv15SourceCatalog, "newtable" -> "4",
          "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    val logDir = tempWorkDir(s, "graft-sv15-log").toString
    val ckpt = tempWorkDir(s, "graft-sv15-ckpt").toString
    def appendLog(): Unit = {
      withDrainAqe(s) { // per-batch jobs are broadcasts/slivers: AQE only re-plans (see helper)
      val q = s.readStream.format("graft-kv")
        .option("catalog", sv15SourceCatalog).option("tombstones", "true").load()
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.write.mode("append").parquet(logDir); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      } // withDrainAqe
    }
    writeGen(base, ts = 1000, overwrite = true)
    appendLog()
    val hrf = graft.datasource.FilterCompiler.compileAll(srcParsed, Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("event_id", 100L),
      org.apache.spark.sql.sources.LessThanOrEqual("event_id", 499L))).exactOrThrow("CDC DELETE")
    graft.store.KvStore.table(srcParsed.qualifiedName)
      .delete(hrf.ranges, hrf.pred, stamp = 2000)
    appendLog()
    writeGen(base.filter(col("event_id") % 7 === 0)
      .withColumn("value", col("value") + 1000000.0d), ts = 3000, overwrite = false)
    appendLog()
    // merge-on-read: newest log row per key wins; tombstones suppress
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("_cell_ts").desc, col("_deleted").asc)
    s.read.parquet(logDir)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col("_deleted"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  /** Same final state as sv11 — identical source protocol, lakehouse sink. */
  val sv15Sql: String = sv11Sql

  private[graft] val sv12SrcCatalog =
    """{"table":{"namespace":"default", "name":"kv_idx_src"},
      |"rowkey":"key",
      |"columns":{
      |"doc_id":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"text":{"cf":"f", "col":"t", "type":"string"}}}""".stripMargin
  private[graft] val sv12FwdCatalog = sv12SrcCatalog
    .replace("\"kv_idx_src\"", "\"kv_idx_fwd\"")
  private[graft] val sv12IdxCatalog =
    """{"table":{"namespace":"default", "name":"kv_idx_inv"},
      |"rowkey":"key",
      |"columns":{
      |"ik":{"cf":"rowkey", "col":"key", "type":"string"},
      |"term":{"cf":"f", "col":"term", "type":"string"},
      |"doc_id":{"cf":"f", "col":"doc", "type":"bigint"}}}""".stripMargin

  /** sv12: CDC-maintained secondary index — the consumer the tombstone
    * stream exists FOR. One `tombstones=true` stream over a documents kv
    * table drives TWO mirrors through foreachBatch: a forward mirror
    * (doc_id → text, the "old state" lookup) and an inverted index keyed
    * `term NUL doc_id` (a literal 0x00 separator). Every change first retires the doc's OLD index
    * entries — their keys are recomputed by tokenizing the forward mirror's
    * copy, the standard CDC index-maintenance move (a tombstone carries no
    * values, so the old state must come from somewhere) — then upserts
    * insert the new pairs and refresh the forward mirror. Source phases:
    * full corpus, ranged DELETE (docs 100-199), and an update wave
    * (doc_id % 9 = 0 gets a new token appended — including resurrections
    * inside the deleted range). The final answer aggregates the index table
    * into px26's capped-postings form, so the oracle is px26's SQL over the
    * corpus's FINAL state. */
  /** One CDC drain of inverted-index maintenance — the per-batch protocol
    * of [[sv12StreamCdcIndex]], factored out so the randomized differential
    * can drive arbitrary put/delete/resurrect schedules through the exact
    * production path with its own catalogs. */
  private[graft] def maintainCdcIndex(s: SparkSession, srcCatalog: String,
      fwdCatalog: String, idxCatalog: String, maxId: Long, ckpt: String,
      phaseStamp: Long): Unit = {
    import graft.store.KvStore
    val sep = "\u0000" // tokens are whitespace-split, so NUL can't collide
    val fwdName = graft.catalog.GraftCatalog.parse(fwdCatalog, Map.empty).qualifiedName
    /** (doc_id, term, ik) pairs of a (doc_id, text) frame — MUST tokenize
      * exactly like px26 ([[graft.pipeline.TextOps.tokens]]). */
    def pairsOf(docs: DataFrame): DataFrame = docs
      .select(col("doc_id"),
        explode(array_distinct(graft.pipeline.TextOps.tokens(col("text")))).as("term"))
      .filter(length(col("term")) > 0)
      .withColumn("ik", concat(col("term"), lit(sep),
        format_string("%012d", col("doc_id"))))
    val stream = s.readStream.format("graft-kv")
      .option("catalog", srcCatalog).option("tombstones", "true").load()
    withDrainAqe(s) { // per-batch jobs are broadcasts/slivers: AQE only re-plans (see helper)
    val q = stream.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val changed = df.select(col("doc_id"), col("text"), col("_deleted")).cache()
        // before the first batch no mirror exists — nothing old to retire
        val haveMirror = KvStore.exists(fwdName)
        if (!changed.isEmpty) {
          // 1. retire the OLD index entries of every touched doc,
          //    DISTRIBUTED end to end: the changed-id set (bounded by
          //    maxRowsPerBatch) broadcasts into a leftsemi probe of the
          //    forward mirror, whose tokenization re-derives the exact
          //    old posting keys — and those keys die through the
          //    delete-mode writer, each task against its own region
          //    slice. Nothing per-term ever visits the driver: a batch
          //    of long documents fans out to millions of postings, and
          //    the old collect-then-In path materialized every one of
          //    them driver-side.
          if (haveMirror) {
            val oldDocs = s.read.format("graft-kv")
              .option("catalog", fwdCatalog).load()
              .join(broadcast(changed.select("doc_id").distinct()),
                Seq("doc_id"), "leftsemi")
            pairsOf(oldDocs).select(col("ik"))
              .write.format("graft-kv")
              .options(Map("catalog" -> idxCatalog, "delete" -> "true",
                "timestamp" -> phaseStamp.toString))
              .mode("append").save()
            // 2. forward mirror: deleted docs die the same way
            changed.filter(col("_deleted")).select(col("doc_id"))
              .write.format("graft-kv")
              .options(Map("catalog" -> fwdCatalog, "delete" -> "true",
                "timestamp" -> phaseStamp.toString))
              .mode("append").save()
          }
          val ups = changed.filter(!col("_deleted")).select(col("doc_id"), col("text"))
          ups.write.format("graft-kv")
            .options(Map("catalog" -> fwdCatalog, "newtable" -> "4",
              "timestamp" -> phaseStamp.toString,
              "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
            .mode("append").save()
          // 3. insert the new index pairs
          pairsOf(ups).select(col("ik"), col("term"), col("doc_id"))
            .write.format("graft-kv")
            .options(Map("catalog" -> idxCatalog, "newtable" -> "4",
              "timestamp" -> phaseStamp.toString))
            .mode("append").save()
        }
        changed.unpersist()
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    } // withDrainAqe
  }

  def sv12StreamCdcIndex(s: SparkSession, dir: String): DataFrame = {
    import graft.datasource.FilterCompiler
    import graft.store.KvStore
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(s, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val maxId = base.agg(max(col("doc_id"))).head().getLong(0)
    val fwdParsed = graft.catalog.GraftCatalog.parse(sv12FwdCatalog, Map.empty)
    val idxParsed = graft.catalog.GraftCatalog.parse(sv12IdxCatalog, Map.empty)
    def writeSrc(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> sv12SrcCatalog, "newtable" -> "4",
          "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    val ckpt = tempWorkDir(s, "graft-sv12-ckpt").toString
    def applyBatch(phaseStamp: Long): Unit =
      maintainCdcIndex(s, sv12SrcCatalog, sv12FwdCatalog, sv12IdxCatalog,
        maxId, ckpt, phaseStamp)
    // fresh run every invocation
    KvStore.drop(fwdParsed.qualifiedName)
    KvStore.drop(idxParsed.qualifiedName)
    writeSrc(base, ts = 1000, overwrite = true)
    applyBatch(phaseStamp = 10)
    val hrf = FilterCompiler.compileAll(
      graft.catalog.GraftCatalog.parse(sv12SrcCatalog, Map.empty), Seq(
        org.apache.spark.sql.sources.GreaterThanOrEqual("doc_id", 100L),
        org.apache.spark.sql.sources.LessThanOrEqual("doc_id", 199L))).exactOrThrow("CDC DELETE")
    KvStore.table("default:kv_idx_src").delete(hrf.ranges, hrf.pred, stamp = 2000)
    applyBatch(phaseStamp = 20)
    writeSrc(base.filter(col("doc_id") % 9 === 0)
      .withColumn("text", concat(col("text"), lit(" zzznewterm"))), ts = 3000,
      overwrite = false)
    applyBatch(phaseStamp = 30)
    // the answer: the maintained index aggregated into px26's capped form
    val pairs = s.read.format("graft-kv")
      .option("catalog", sv12IdxCatalog).load()
      .select(col("term"), col("doc_id"))
    val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("df", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("df") >= 2 && col("rn") <= 20)
      .groupBy(col("term"))
      .agg(max(col("df")).as("df"),
        array_join(sort_array(collect_list(col("doc_id"))), ",").as("postings"),
        (max(col("df")) > 20).cast("int").as("truncated"))
      .orderBy(col("term"))
  }

  val sv12Sql: String =
    """WITH final AS (
      |  SELECT doc_id, text || ' zzznewterm' AS text FROM documents WHERE doc_id % 9 = 0
      |  UNION ALL
      |  SELECT doc_id, text FROM documents
      |  WHERE doc_id % 9 <> 0 AND doc_id NOT BETWEEN 100 AND 199),
      |t AS (SELECT doc_id,
      |         unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS term
      |       FROM final),
      |w AS (SELECT term, doc_id,
      |        row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn,
      |        count(*) OVER (PARTITION BY term) AS df
      |      FROM t WHERE length(term) > 0)
      |SELECT term, CAST(max(df) AS BIGINT) AS df,
      |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings,
      |  CAST(max(df) > 20 AS INTEGER) AS truncated
      |FROM w WHERE df >= 2 AND rn <= 20
      |GROUP BY term ORDER BY term""".stripMargin

  private val sv13SrcCatalog = sv10SourceCatalog
    .replace("\"kv_cdc_events\"", "\"kv_cap_src\"")
  private val sv13MirCatalog = sv10SourceCatalog
    .replace("\"kv_cdc_events\"", "\"kv_cap_mirror\"")

  /** sv13: ADMISSION-CONTROLLED catch-up — the bounded-backlog drain sv10
    * cannot show (its drains run after every write, so no multi-stamp
    * backlog ever accumulates). Three stamped generations land BEFORE the
    * stream ever starts; one `maxRowsPerBatch=1` AvailableNow run must then
    * drain the backlog as THREE stamp-ordered micro-batches (whole stamps
    * admit atomically, so budget 1 means exactly one stamp generation per
    * batch — see [[graft.datasource.GraftMicroBatchStream]]). The
    * foreachBatch consumer upserts each batch into a mirror at an
    * increasing stamp (10 + batchId), so the mirror's latest-merge read
    * equals "newest generation per key" ONLY if the capped batches replayed
    * history oldest-first with no skips and no duplicates — that ordering
    * contract is exactly what the oracle hashes. */
  def sv13StreamCappedCatchup(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir).select(
      col("event_id").cast("long").as("event_id"),
      col("user_id").cast("long").as("user_id"),
      col("event_type"),
      col("value").cast("double").as("value"))
    val maxId = base.agg(max(col("event_id"))).head().getLong(0)
    def writeGen(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> sv13SrcCatalog, "newtable" -> "4",
          "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    // fresh run every invocation
    graft.store.KvStore.drop("default:kv_cap_mirror")
    writeGen(base, ts = 1000, overwrite = true)
    writeGen(base.filter(col("event_id") % 5 === 0)
      .withColumn("value", col("value") + 1000000.0d), ts = 2000, overwrite = false)
    writeGen(base.filter(col("event_id") % 11 === 0)
      .withColumn("value", col("value") + 2000000.0d), ts = 3000, overwrite = false)
    val ckpt = tempWorkDir(s, "graft-sv13-ckpt").toString
    withDrainAqe(s) { // per-batch jobs are broadcasts/slivers: AQE only re-plans (see helper)
    val q = s.readStream.format("graft-kv")
      .option("catalog", sv13SrcCatalog)
      .option("maxRowsPerBatch", "1") // one stamp generation per micro-batch
      .load()
      .writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        df.write.format("graft-kv")
          .options(Map("catalog" -> sv13MirCatalog, "newtable" -> "4",
            "timestamp" -> (10 + batchId).toString,
            "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
          .mode("append").save()
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    } // withDrainAqe
    s.read.format("graft-kv").option("catalog", sv13MirCatalog).load()
      .orderBy(col("event_id"))
  }

  val sv13Sql: String =
    """WITH base AS (
      |  SELECT CAST(event_id AS BIGINT) AS event_id,
      |         CAST(user_id AS BIGINT) AS user_id,
      |         event_type, CAST(value AS DOUBLE) AS value
      |  FROM events)
      |SELECT event_id, user_id, event_type,
      |       CASE WHEN event_id % 11 = 0 THEN value + 2000000
      |            WHEN event_id % 5 = 0 THEN value + 1000000
      |            ELSE value END AS value
      |FROM base
      |ORDER BY event_id""".stripMargin

  private[graft] val sv14SrcCatalog =
    """{"table":{"namespace":"default", "name":"kv_nd_src"},
      |"rowkey":"key",
      |"columns":{
      |"doc_id":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"text":{"cf":"f", "col":"t", "type":"string"}}}""".stripMargin
  private[graft] val sv14FwdCatalog = sv14SrcCatalog
    .replace("\"kv_nd_src\"", "\"kv_nd_fwd\"")
  private[graft] val sv14IdxCatalog =
    """{"table":{"namespace":"default", "name":"kv_nd_idx"},
      |"rowkey":"key",
      |"columns":{
      |"ik":{"cf":"rowkey", "col":"key", "type":"string"},
      |"band":{"cf":"f", "col":"band", "type":"int"},
      |"bh":{"cf":"f", "col":"bh", "type":"bigint"},
      |"doc_id":{"cf":"f", "col":"doc", "type":"bigint"}}}""".stripMargin
  private[graft] val sv14PairsCatalog =
    """{"table":{"namespace":"default", "name":"kv_nd_pairs"},
      |"rowkey":"key",
      |"columns":{
      |"pk":{"cf":"rowkey", "col":"key", "type":"string"},
      |"id_a":{"cf":"f", "col":"a", "type":"bigint"},
      |"id_b":{"cf":"f", "col":"b", "type":"bigint"},
      |"jaccard":{"cf":"f", "col":"j", "type":"double"}}}""".stripMargin

  /** sv14: INCREMENTAL near-dup detection over CDC — the "incremental dedup"
    * capability a training-data pipeline wants from a streaming source. The
    * corpus lands in three disjoint stamped generations (doc_id % 3) before
    * the stream starts; a `maxRowsPerBatch=1` AvailableNow run then replays
    * them as three stamp-ordered micro-batches. Each batch LSH-indexes ONLY
    * its new documents: band keys ([[graft.functions.HashExprs.minhashBands]],
    * px7's exact parameters) join against the PERSISTED band index (new×old
    * candidates) and against themselves (new×new), the exact shingle-Jaccard
    * rerank pulls old text from a forward mirror, accepted pairs upsert into
    * a pairs table keyed `a:b` (idempotent re-discovery), and the batch's
    * band entries + docs are appended to index + mirror. Every qualifying
    * pair is found exactly when its LATER document arrives — so the final
    * pair set must equal the BATCH px7 answer, and the oracle IS px7's SQL
    * (all-pairs exact Jaccard ≥ 0.8). Per batch the work is proportional to
    * new-docs × bucket-mates — never a corpus re-scan: the batch's distinct
    * (band, bh) pairs (≤ new-docs × bands, batch-proportional by
    * construction) compile to `ik` PREFIX ranges via [[bandIndexLookup]],
    * so the persisted index scan plans only the matching key slivers and
    * scanned rows scale with the batch's bucket population, never with
    * index size (StreamingSpec pins this with the scan's rows-scanned
    * metric). */
  /** Past this many distinct (band, bh) prefixes the batch's buckets cover
    * so much of the index that a full scan is the better plan (and a deeper
    * pushed Or-tree would only slow planning) — an unselective-predicate
    * fallback, same judgment as the index consult's cap. Sized for
    * steady-state CDC batches: a W-doc wave emits ≤ W × 16 prefixes, so
    * 32768 keeps waves up to ~2k docs on the pushed-sliver path (the
    * 100k-state proxy showed a 500-doc wave's 8000 prefixes overflowing
    * the old 4096 cap straight into per-batch full index scans — the
    * silent degradation this constant exists to prevent). The collect this
    * caps stays control-sized (≈1 MB of prefix strings at the cap). */
  private[graft] val MaxPushedBandPrefixes = 32768

  /** Below this many persisted-state rows the sliver machinery LOSES to a
    * plain full scan, so the lookups skip it entirely — including the
    * driver-side `distinct().limit().collect()` that derives the
    * prefix/id set, which is itself a Spark job. Measured at sf0.1
    * (round 10, warm, local[32]): the prefix-set collect costs ~0.25 s
    * per micro-batch and the ids collect ~0.2 s, while a full scan of a
    * ≤64k-row in-memory table is <0.05 s — the sliver path only pays for
    * itself once the state it avoids reading is materially larger than
    * that. 2 × [[MaxPushedBandPrefixes]] keeps the constant in the same
    * family as the per-call ratio gate (`slivers × 4 ≥ rows` → scan),
    * and sits BELOW the 100k-row proxy state
    * ([[streaming.StreamingScaleProxySpec]]'s mirrors) — proxy scale and
    * above keep the sliver path and its wave-proportional bounds, while
    * sf0.1's ≤8k-row mirrors and early index generations take the plain
    * scan without paying the driver round-trip. */
  private[graft] val SmallStateRows: Long = 2L * MaxPushedBandPrefixes

  /** Total live rows of a store table by catalog json (an O(regions)
    * region-counter sum — the same consult the reference's region-size
    * heuristics make), 0 if absent. */
  private def storeRows(catalogJson: String): Long = {
    import graft.store.KvStore
    val name = graft.catalog.GraftCatalog.parse(catalogJson, Map.empty).qualifiedName
    if (KvStore.exists(name)) KvStore.table(name).regions.map(_.rowCount.get()).sum
    else 0L
  }

  /** Batch-proportional band-index lookup: a batch's distinct
    * `"%02d:%021d:"`-formatted (band, bh) prefixes ship as the
    * `keyPrefixes` read option, which the scan compiles STRAIGHT to a
    * union of key-prefix ScanRanges (one O(n log n) sort+sweep) — regions
    * without a matching sliver plan NO partition and scanned rows scale
    * with the batch's bucket population, not index size. The option path
    * exists because the same set as a pushed Catalyst Or-tree does not
    * scale: a 26k-prefix predicate tree cost ~60 s of analyzer/optimizer
    * walks PER MICRO-BATCH at sf0.1 (caught by the round-9 bench).
    *
    * `prefixes` is BY-NAME because deriving it is itself a Spark job (the
    * batch's `distinct().limit().collect()`): at or below `smallStateRows`
    * live index rows the lookup returns the plain full scan WITHOUT
    * evaluating the prefix set at all — at that size the collect job
    * costs more wall than the scan it would avoid (see [[SmallStateRows]]'s
    * measured cost model), and callers re-join on (band, bh) either way.
    * Two further fallbacks also return the full scan: past
    * [[MaxPushedBandPrefixes]], and when the sliver union would not be
    * materially smaller than the index itself (prefixes × 4 ≥ index
    * rows — an O(regions) row-count consult, the same judgment as the
    * secondary-index consult's cap). Above the small-state gate an empty
    * prefix set returns an empty result without touching the store; at or
    * below it the gate wins and the FULL scan is returned before the
    * prefix thunk is ever forced, so callers must not count the result
    * directly — they re-join on (band, bh), which keeps the answer
    * identical either way. */
  private[graft] def bandIndexLookup(s: SparkSession, idxCatalog: String,
      prefixes: => Array[String],
      smallStateRows: Long = SmallStateRows): DataFrame = {
    def idx(extra: Map[String, String]) = s.read.format("graft-kv")
      .options(Map("catalog" -> idxCatalog) ++ extra).load()
    val idxRows = storeRows(idxCatalog)
    if (idxRows <= smallStateRows) return idx(Map.empty)
    val p = prefixes
    if (p.isEmpty) idx(Map.empty).filter(lit(false))
    else if (p.length > MaxPushedBandPrefixes ||
        p.length.toLong * 4 >= idxRows) idx(Map.empty)
    else idx(Map("keyPrefixes" -> p.mkString("\u0001")))
  }

  /** One CDC drain of incremental near-dup maintenance — the per-batch
    * protocol of [[sv14StreamIncrNeardup]], factored out so the proxy-scale
    * spec can drive arbitrary corpora through the exact production path.
    * Per micro-batch (one stamp generation each, `maxRowsPerBatch=1`):
    * LSH-index ONLY the new documents; bucket mates come from the
    * persisted index as pushed `ik` prefix slivers ([[bandIndexLookup]]);
    * the exact-Jaccard rerank pulls OLD candidate text from the forward
    * mirror as a capped-In point sliver on the `doc_id` rowkey
    * ([[mirrorLookup]] — batch-proportional, never a mirror scan, with the
    * broadcast-leftsemi fallback past the cap); accepted pairs, index
    * entries, and mirror rows upsert per batch. */
  private[graft] def maintainNearDupIndex(s: SparkSession, srcCatalog: String,
      fwdCatalog: String, idxCatalog: String, pairsCatalog: String,
      maxId: Long, ckpt: String): Unit = {
    def kvWrite(df: DataFrame, cat: String, ts: Long): Unit = {
      // numeric presplits for the doc_id-keyed mirror; byte-interpolated
      // string presplits ('0'..'z' covers the digit-formatted keys) for the
      // string-keyed index and pairs tables
      val splits =
        if (cat == fwdCatalog) Map("minSplitNum" -> "0", "maxSplitNum" -> maxId.toString)
        else Map("minSplit" -> "0", "maxSplit" -> "z")
      df.write.format("graft-kv")
        .options(Map("catalog" -> cat, "newtable" -> "4",
          "timestamp" -> ts.toString) ++ splits)
        .mode("append").save()
    }
    withDrainAqe(s) { // per-batch jobs are broadcasts/slivers: AQE only re-plans (see helper)
    val q = s.readStream.format("graft-kv")
      .option("catalog", srcCatalog)
      .option("maxRowsPerBatch", "1") // one stamp generation per micro-batch
      .load()
      .writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        // The batch frames below are each consumed by SEVERAL actions /
        // plan branches (newBands feeds the prefix collect, both sides of
        // the new×new self-join, the new×old join, and the index append;
        // docs feeds the sketch, the rerank union, and the mirror append;
        // sh joins twice into the rerank; candIds gates the mirror sliver
        // and the rerank semi-join). All are BATCH-proportional —
        // ≤ new-docs × bands rows — so pinning them trades bounded memory
        // for not re-tokenizing / re-minhashing the batch up to 5×.
        val docs = b.select(col("doc_id"), col("text")).persist()
        val toks = docs
          .select(col("doc_id").as("id"), graft.pipeline.TextOps.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) > 0)
        val newBands = toks
          .select(col("id"),
            posexplode(graft.functions.HashExprs.minhashBands(col("toks"), 32, 16)))
          .withColumnsRenamed(Map("pos" -> "band", "col" -> "bh"))
          .persist()
        // Steady-state CDC batches are small: their distinct (band, bh)
        // pairs (≤ new-docs × 16, bounded by BATCH size, never corpus
        // size) collect cheaply and compile into pushed ik prefix ranges,
        // so the persisted index scan reads only the batch's bucket
        // slivers. The prefix set is BY-NAME: for a small index the
        // lookup answers with the full scan without even running the
        // prefix job. When it does run, ONE bounded job decides both the
        // guard and the prefix set: limit(cap + 1) caps driver memory,
        // and a result past the cap means the batch's buckets blanket
        // the index — the full scan it falls back to is the right plan
        // there. The lookup self-decides sliver-vs-full-scan (state
        // size + cap + index-size ratio) — callers re-join on (band, bh)
        // either way.
        val oldIdx = bandIndexLookup(s, idxCatalog, newBands
            .select(format_string("%02d:%021d:", col("band"), col("bh")).as("p"))
            .distinct().limit(MaxPushedBandPrefixes + 1)
            .collect().map(_.getString(0)))
          .select(col("band"), col("bh"), col("doc_id").as("old_id"))
        val nn = newBands.as("x").join(newBands.as("y"), Seq("band", "bh"))
          .filter(col("x.id") < col("y.id"))
          .select(col("x.id").as("ida"), col("y.id").as("idb"))
        val no = newBands.join(oldIdx, Seq("band", "bh"))
          .select(least(col("id"), col("old_id")).as("ida"),
            greatest(col("id"), col("old_id")).as("idb"))
        // cand feeds candIds AND the accepted-pair join — pinned so the
        // index-sliver read and the bucket joins run once per batch
        val cand = nn.union(no).distinct().persist()
        // rerank shingles ONLY for candidate docs — a semi-join restriction
        // before the sketch, not after: at scale the corpus+mirror union is
        // everything ever ingested, and sketching it per batch would be a
        // full re-read; the candidate sliver is what the LSH stage exists
        // to produce
        val candIds = cand.select(col("ida").as("doc_id"))
          .union(cand.select(col("idb").as("doc_id"))).distinct().persist()
        // OLD candidates' text comes from the mirror as a capped-In POINT
        // sliver on its doc_id rowkey — the mirror is everything ever
        // ingested, and scanning it per batch would be the one
        // corpus-proportional term left in the protocol
        val oldCandIds = candIds
          .join(docs.select(col("doc_id")), Seq("doc_id"), "leftanti")
        val fwdSliver = mirrorLookup(s, fwdCatalog, "", oldCandIds,
          idCol = "doc_id").select(col("doc_id"), col("text"))
        val sh = docs.unionByName(fwdSliver)
          .join(candIds, Seq("doc_id"), "leftsemi")
          .select(col("doc_id").as("id"), graft.pipeline.TextOps.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) > 0)
          .select(col("id"), graft.functions.HashExprs.sortedShingles(col("toks")).as("sh"))
          .persist()
        val accepted = cand
          .join(sh.select(col("id").as("ida"), col("sh").as("sh_a")), Seq("ida"))
          .join(sh.select(col("id").as("idb"), col("sh").as("sh_b")), Seq("idb"))
          .withColumn("jaccard", graft.pipeline.Dedup.jaccard(col("sh_a"), col("sh_b")))
          .filter(col("jaccard") >= 0.8)
          .select(format_string("%012d:%012d", col("ida"), col("idb")).as("pk"),
            col("ida").as("id_a"), col("idb").as("id_b"), col("jaccard"))
        kvWrite(accepted, pairsCatalog, ts = 10 + batchId)
        kvWrite(newBands.select(
          format_string("%02d:%021d:%012d", col("band"), col("bh"), col("id")).as("ik"),
          col("band"), col("bh"), col("id").as("doc_id")), idxCatalog, ts = 10 + batchId)
        kvWrite(docs, fwdCatalog, ts = 10 + batchId)
        Seq(sh, newBands, docs, cand, candIds).foreach(_.unpersist())
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    } // withDrainAqe
  }

  def sv14StreamIncrNeardup(s: SparkSession, dir: String): DataFrame = {
    import graft.store.KvStore
    val base = Tables.documents(s, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val maxId = base.agg(max(col("doc_id"))).head().getLong(0)
    def writeSrc(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> sv14SrcCatalog, "newtable" -> "4",
          "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    // fresh run every invocation
    Seq("default:kv_nd_fwd", "default:kv_nd_idx", "default:kv_nd_pairs")
      .foreach(KvStore.drop)
    (0 to 2).foreach { g =>
      writeSrc(base.filter(col("doc_id") % 3 === g), ts = 1000L * (g + 1),
        overwrite = g == 0)
    }
    def kvInit(df: DataFrame, cat: String): Unit = {
      val splits =
        if (cat == sv14FwdCatalog) Map("minSplitNum" -> "0", "maxSplitNum" -> maxId.toString)
        else Map("minSplit" -> "0", "maxSplit" -> "z")
      df.write.format("graft-kv")
        .options(Map("catalog" -> cat, "newtable" -> "4", "timestamp" -> "1") ++ splits)
        .mode("append").save()
    }
    // pre-create the mirror/index/pairs tables (empty): the FIRST batch
    // already reads them for its index lookup
    kvInit(base.limit(0), sv14FwdCatalog)
    kvInit(s.range(0).select(lit("").as("ik"), lit(0).as("band"),
      lit(0L).as("bh"), lit(0L).as("doc_id")), sv14IdxCatalog)
    kvInit(s.range(0).select(lit("").as("pk"), lit(0L).as("id_a"),
      lit(0L).as("id_b"), lit(0.0d).as("jaccard")), sv14PairsCatalog)
    val ckpt = tempWorkDir(s, "graft-sv14-ckpt").toString
    maintainNearDupIndex(s, sv14SrcCatalog, sv14FwdCatalog, sv14IdxCatalog,
      sv14PairsCatalog, maxId, ckpt)
    s.read.format("graft-kv").option("catalog", sv14PairsCatalog).load()
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Avro schema of the embedding column in the sv18 kv tables — vectors
    * round-trip bit-exactly as `array<float>`, so cosine scores computed
    * against store-resident vectors equal scores against the parquet
    * originals. */
  private[graft] val sv18AvroVec = """{"type":"array","items":"float"}"""

  private[graft] val sv18SrcCatalog =
    """{"table":{"namespace":"default", "name":"kv_ann_src"},
      |"rowkey":"key",
      |"columns":{
      |"vec_id":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"embedding":{"cf":"f", "col":"v", "avro":"annVec"}}}""".stripMargin

  private[graft] val sv18FwdCatalog =
    sv18SrcCatalog.replace("\"kv_ann_src\"", "\"kv_ann_fwd\"")

  /** Inverted-file table: one entry per (cell, vector), keyed `cell ‖
    * vec_id` so a cell's posting list is ONE contiguous key sliver; the
    * vector rides as a covered column, so probes never touch another
    * table. */
  private[graft] val sv18IdxCatalog =
    """{"table":{"namespace":"default", "name":"kv_ann_idx"},
      |"rowkey":"cell:vid",
      |"columns":{
      |"cell":{"cf":"rowkey", "col":"cell", "type":"int"},
      |"vec_id":{"cf":"rowkey", "col":"vid", "type":"bigint"},
      |"v":{"cf":"f", "col":"v", "avro":"annVec"}}}""".stripMargin

  /** Forward-mirror lookup for retirement: the changed-id frame (a
    * `vec_id` column, batch-bounded by construction) compiles into In
    * point-ranges on the `vec_id` ROWKEY, so each CDC batch point-reads
    * exactly its touched rows instead of scanning the corpus-sized mirror
    * — the same batch-proportionality contract as [[bandIndexLookup]].
    * ONE bounded job decides both the guard and the id set (limit(cap+1)
    * caps driver memory); empty batches read nothing, and past
    * [[MaxPushedBandPrefixes]] ids (where a scan genuinely competes) the
    * lookup keeps its touched-rows contract by falling back to a
    * broadcast leftsemi over the full scan — never the raw mirror. */
  private[graft] def mirrorLookup(s: SparkSession, catalog: String,
      avroJson: String, idsDf: DataFrame, idCol: String = "vec_id",
      smallStateRows: Long = SmallStateRows,
      extraOpts: Map[String, String] = Map.empty): DataFrame = {
    val opts = Map("catalog" -> catalog) ++ extraOpts ++
      (if (avroJson.nonEmpty) Map("annVec" -> avroJson) else Map.empty)
    val mirror = s.read.format("graft-kv").options(opts).load()
    val mirRows = storeRows(catalog)
    // below the measured small-state threshold the ids collect (a Spark
    // job) costs more wall than scanning the whole mirror — skip straight
    // to the broadcast-leftsemi shape, which keeps the touched-rows
    // answer without the driver round-trip (see [[SmallStateRows]])
    if (mirRows <= smallStateRows)
      return mirror.join(broadcast(idsDf.select(col(idCol)).distinct()),
        Seq(idCol), "leftsemi")
    val ids = idsDf.select(col(idCol)).distinct()
      .limit(MaxPushedBandPrefixes + 1).collect().map(_.getLong(0))
    // same cost model as [[bandIndexLookup]]: pushed point-gets pay an
    // O(ids) plan cost, which only wins when the batch is much smaller
    // than the mirror — a catch-up batch rivaling the corpus takes the
    // scan + broadcast leftsemi instead (touched-rows contract either way)
    if (ids.isEmpty) mirror.filter(lit(false))
    else if (ids.length > MaxPushedBandPrefixes ||
        ids.length.toLong * 4 >= mirRows)
      mirror.join(broadcast(idsDf.select(col(idCol)).distinct()),
        Seq(idCol), "leftsemi")
    else mirror.filter(col(idCol).isInCollection(ids.toSeq))
  }

  /** IVF probe read over an inverted-file table keyed `cell ‖ vec_id`: the
    * probed-cell set (≤ queries × nprobe, driver-bounded by construction)
    * compiles into In point-ranges on the LEADING `cell` key part — each
    * cell's posting list is one contiguous key sliver, so only probed
    * slivers are planned and regions without a probed cell plan no
    * partition (StreamingSpec pins scanned rows = probed-cell population).
    * An empty set scans nothing; an oversized set falls back to the
    * (correct) full scan rather than compiling a degenerate range union. */
  private[graft] def annIndexProbe(s: SparkSession, idxCatalog: String,
      avroJson: String, cells: Array[Int]): DataFrame = {
    val idx = s.read.format("graft-kv")
      .options(Map("catalog" -> idxCatalog, "annVec" -> avroJson)).load()
    if (cells.isEmpty) idx.filter(lit(false))
    else if (cells.length > MaxPushedBandPrefixes) idx
    else idx.filter(col("cell").isInCollection(cells.toSeq))
  }

  /** sv18: INCREMENTAL ANN INDEX MAINTENANCE over CDC — the streaming twin
    * of px13's IVF, and the "vectors keep arriving" path every
    * embedding-backed curation pipeline needs (the Faiss/Milvus
    * train-offline / insert-online architecture). The coarse quantizer is
    * px13's own memoized centroid matrix (trained ONCE per dataset,
    * batch-side — exactly how production IVF deploys); the stream maintains
    * the inverted file: each CDC batch assigns its changed vectors to their
    * nearest cell and upserts `cell ‖ vec_id → vector` entries, retiring
    * every touched vector's OLD entry first by re-deriving its cell from a
    * forward mirror (a tombstone carries no vector, and an UPDATED vector
    * may move to a DIFFERENT cell — the re-keying case). Source phases
    * exercise all three maintenance moves: a corrupted first generation
    * (reversed vectors — wrong cells), a correcting overwrite wave
    * (re-keying), a ranged DELETE (retirement), and a resurrection wave.
    *
    * The final probe is the IVF read path over the MAINTAINED index: each
    * query's `nprobe` cells, collected as a bounded cell set (≤ nlist,
    * ∝ √corpus at scale — a few hundred KB of ints at 100 TB) and pushed
    * as an In filter on the LEADING key part, so the scan plans ONLY the
    * probed cells' key slivers — regions without a probed cell plan no
    * partition (StreamingSpec pins scanned rows = probed-cell population).
    * Exact-rerank within the probed entries reproduces px13's answer
    * bit-for-bit (same centroids, same float vectors, same tie-breaks), so
    * the oracle IS px13's dynamically-rendered SQL. Per batch the work is
    * proportional to CHANGED vectors (mirror retirement point-reads only
    * the touched ids via [[mirrorLookup]] + two batch-sized writes), never
    * to index or mirror size. */
  /** One CDC drain of ANN inverted-file maintenance — the per-batch
    * protocol of [[sv18StreamAnnIvf]], factored out so the differential
    * spec can drive ARBITRARY insert/update/delete sequences through the
    * exact production path: per micro-batch, retire every touched
    * vector's OLD index entry (old cell re-derived from the forward
    * mirror, point-read via [[mirrorLookup]]), drop tombstoned ids from
    * the mirror, then land the new mirror rows and `cell ‖ vec_id`
    * entries one stamp later (the deletes-at-T / puts-at-T+1 convention:
    * an updated vector whose old and new cell COINCIDE would otherwise
    * put at the same (key, stamp) its retirement just tombstoned). */
  /** REPLAY SAFETY (why this protocol needs no as-of reads, unlike
    * sv21/sv22): the retirement runs FIRST, against the pre-batch mirror,
    * and both mirror mutations come after it. Whatever the torn point, a
    * replay converges: torn before/inside the retire — the mirror is
    * still pristine, the replay recomputes the identical retire
    * (idempotent deletes); torn after the mirror writes — the FIRST
    * attempt's retire already removed the old index entries, so the
    * replay's retire (now reading post-batch vectors) probes cells whose
    * entries either were already retired or were never inserted — no-ops
    * both — and the re-writes land identically. The crash spec pins the
    * worst window (mirror overwritten, index insert missing). */
  private[graft] def maintainAnnIndex(s: SparkSession, srcCatalog: String,
      fwdCatalog: String, idxCatalog: String, cents: Array[Array[Double]],
      maxId: Long, ckpt: String, phaseStamp: Long,
      crashPoint: () => Unit = () => ()): Unit =
    maintainCellKeyedIndex(s, srcCatalog, fwdCatalog, idxCatalog, cents,
      maxId, ckpt, phaseStamp,
      covered = vec => Seq(vec.as("v")),
      idxOpts = Map("annVec" -> sv18AvroVec), crashPoint)

  /** The SHARED cell-keyed inverted-file maintenance core behind sv18
    * (covered column = the raw vector) and sv25 (covered column = the m PQ
    * codes): retire-old-cell-first via the forward mirror's point-read
    * sliver, deletes-at-T / puts-at-T+1, batch-proportional throughout.
    * One body means a protocol fix (stamp scheme, retire ordering) cannot
    * silently diverge between the two maintainers, and sv18's torn-batch
    * crash spec exercises the hazard window for BOTH (the `crashPoint`
    * seam sits between the mirror overwrite and the index insert). */
  private def maintainCellKeyedIndex(s: SparkSession, srcCatalog: String,
      fwdCatalog: String, idxCatalog: String, cents: Array[Array[Double]],
      maxId: Long, ckpt: String, phaseStamp: Long,
      covered: org.apache.spark.sql.Column => Seq[org.apache.spark.sql.Column],
      idxOpts: Map[String, String],
      crashPoint: () => Unit = () => ()): Unit = {
    import graft.store.KvStore
    val fwdName = graft.catalog.GraftCatalog.parse(fwdCatalog, Map.empty).qualifiedName
    def cellOf(vec: org.apache.spark.sql.Column) =
      element_at(graft.functions.VectorExprs.nearestCentroids(vec, cents, 1), 1)
    withDrainAqe(s) { // per-batch jobs are broadcasts/slivers: AQE only re-plans (see helper)
    val q = s.readStream.format("graft-kv")
      .options(Map("catalog" -> srcCatalog, "annVec" -> sv18AvroVec,
        "tombstones" -> "true"))
      .load()
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        // three consumers (retirement probe, mirror writes, index
        // insert) — pin the batch-proportional frame once
        val changed = df.select(col("vec_id"), col("embedding"),
          col("_deleted")).persist()
        val haveMirror = KvStore.exists(fwdName)
        if (!changed.isEmpty) {
          if (haveMirror) {
            // retire every touched vector's OLD entry: the changed-id
            // set (control-sized — ids only, capped like sv14's band
            // prefixes) compiles into In POINT-RANGES on the mirror's
            // rowkey, so retirement reads the touched rows' point-gets,
            // never the corpus-sized mirror (oversized batches keep the
            // touched-rows contract via mirrorLookup's leftsemi fallback)
            val old = mirrorLookup(s, fwdCatalog, sv18AvroVec, changed)
            old.select(cellOf(col("embedding")).as("cell"), col("vec_id"))
              .write.format("graft-kv")
              .options(Map("catalog" -> idxCatalog,
                "delete" -> "true", "timestamp" -> phaseStamp.toString) ++ idxOpts)
              .mode("append").save()
            changed.filter(col("_deleted")).select(col("vec_id"))
              .write.format("graft-kv")
              .options(Map("catalog" -> fwdCatalog, "annVec" -> sv18AvroVec,
                "delete" -> "true", "timestamp" -> phaseStamp.toString))
              .mode("append").save()
          }
          val ups = changed.filter(!col("_deleted"))
            .select(col("vec_id"), col("embedding"))
          ups.write.format("graft-kv")
            .options(Map("catalog" -> fwdCatalog, "annVec" -> sv18AvroVec,
              "newtable" -> "4", "timestamp" -> (phaseStamp + 1).toString,
              "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
            .mode("append").save()
          crashPoint() // worst torn window: mirror overwritten, index insert missing
          // the new inverted-file entries: presplit across CELL space, so
          // cells (and their probe slivers) spread over regions
          ups.select(cellOf(col("embedding")).as("cell") +: col("vec_id") +:
              covered(col("embedding")): _*)
            .write.format("graft-kv")
            .options(Map("catalog" -> idxCatalog,
              "newtable" -> "4", "timestamp" -> (phaseStamp + 1).toString,
              "minSplitNum" -> "0", "maxSplitNum" -> cents.length.toString) ++ idxOpts)
            .mode("append").save()
        }
        changed.unpersist()
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    } // withDrainAqe
  }

  def sv18StreamAnnIvf(s: SparkSession, dir: String): DataFrame = {
    import graft.datasource.FilterCompiler
    import graft.store.KvStore
    import org.apache.spark.sql.expressions.Window
    val cents = Pipeline.ivfCentroidsFor(s, dir)
    // a NULL vec_id cannot key the store and a NULL vector cannot be
    // assigned a cell — px13's read path drops both through its expression
    // null semantics, so excluding them up front keeps the streamed corpus
    // equal to the corpus the shared oracle sees (and keeps the row-key
    // writer from a hard null-key error on a hostile fixture)
    val base = Tables.embeddings(s, dir)
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val maxId = base.agg(max(col("vec_id"))).head().getLong(0)
    val srcParsed = graft.catalog.GraftCatalog.parse(sv18SrcCatalog, Map.empty)
    val fwdParsed = graft.catalog.GraftCatalog.parse(sv18FwdCatalog, Map.empty)
    val idxParsed = graft.catalog.GraftCatalog.parse(sv18IdxCatalog, Map.empty)
    def writeSrc(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> sv18SrcCatalog, "annVec" -> sv18AvroVec,
          "newtable" -> "4", "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    val ckpt = tempWorkDir(s, "graft-sv18-ckpt").toString
    def applyBatch(phaseStamp: Long): Unit =
      maintainAnnIndex(s, sv18SrcCatalog, sv18FwdCatalog, sv18IdxCatalog,
        cents, maxId, ckpt, phaseStamp)
    // fresh run every invocation
    Seq(fwdParsed, idxParsed).foreach(p => KvStore.drop(p.qualifiedName))
    // g0: a corrupted first generation — reversed vectors land in WRONG
    // cells, so the later correction must re-key, not just overwrite
    writeSrc(base.filter(col("vec_id") % 3 === 0)
      .withColumn("embedding", reverse(col("embedding"))), ts = 1000, overwrite = true)
    applyBatch(phaseStamp = 10)
    // g1: second generation + the corrected first generation (re-keying)
    writeSrc(base.filter(col("vec_id") % 3 <= 1), ts = 2000, overwrite = false)
    applyBatch(phaseStamp = 20)
    // ranged DELETE — tombstones retire index entries
    val hrf = FilterCompiler.compileAll(srcParsed, Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("vec_id", 30L),
      org.apache.spark.sql.sources.LessThanOrEqual("vec_id", 90L))).exactOrThrow("CDC DELETE")
    KvStore.table(srcParsed.qualifiedName).delete(hrf.ranges, hrf.pred, stamp = 3000)
    applyBatch(phaseStamp = 30)
    // g2: last generation + resurrection of the deleted range
    writeSrc(base.filter(col("vec_id") % 3 === 2 ||
      (col("vec_id") >= 30 && col("vec_id") <= 90)), ts = 4000, overwrite = false)
    applyBatch(phaseStamp = 40)
    // IVF probe over the maintained index — px13's read path, but the
    // candidate slivers come from PUSHED key ranges on the probed cells
    val queries = Tables.embeddings(s, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").cast("long").as("query_id"), col("embedding").as("qv"))
    val q = queries.withColumn("cell",
      explode(graft.functions.VectorExprs.nearestCentroids(col("qv"), cents, 4)))
    // the probed-cell set is bounded by nlist (∝ √corpus), so it collects
    // cheaply and compiles into In point-ranges on the index's leading key
    // part — only the probed cells' slivers are ever scanned
    val probedCells = q.select(col("cell")).distinct().collect().map(_.getInt(0))
    val idx = annIndexProbe(s, sv18IdxCatalog, sv18AvroVec, probedCells)
    val scored = idx.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("score", graft.pipeline.Similarity.cosine(col("qv"), col("v")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("score"),
        col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  private[graft] val sv19SrcCatalog =
    """{"table":{"namespace":"default", "name":"kv_ctm_src"},
      |"rowkey":"key",
      |"columns":{
      |"doc_id":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"text":{"cf":"f", "col":"t", "type":"string"}}}""".stripMargin

  /** Contamination-pairs mirror, keyed `train_id ‖ eval_id` — a train
    * doc's pairs are ONE contiguous key sliver, so per-batch retirement
    * compiles the changed-id set into leading-key-part ranges and reads
    * exactly the touched slivers, never the mirror. */
  private[graft] val sv19MirCatalog =
    """{"table":{"namespace":"default", "name":"kv_ctm_mirror"},
      |"rowkey":"tid:eid",
      |"columns":{
      |"train_id":{"cf":"rowkey", "col":"tid", "type":"bigint"},
      |"eval_id":{"cf":"rowkey", "col":"eid", "type":"bigint"},
      |"n_shared":{"cf":"f", "col":"n", "type":"bigint"}}}""".stripMargin

  /** sv19: STREAMING DECONTAMINATION over CDC — the continuous-ingestion
    * twin of px17: as crawl batches land (and get corrected or retracted),
    * a contamination-pairs mirror `(train_id ‖ eval_id) → n_shared` stays
    * current against a STATIC eval/benchmark set, so "is this doc
    * benchmark-contaminated?" is a point lookup at admission time instead
    * of a corpus-wide recheck before every training run.
    *
    * Per micro-batch the work is CHANGED-DOC-proportional, never
    * corpus-proportional:
    *  1. retire: the batch's doc ids compile into leading-key-part ranges
    *     on the mirror (each train doc's pairs are one contiguous sliver —
    *     see [[sv19MirCatalog]]); the touched pairs die through the
    *     delete-mode writer (oversized batches keep the touched-rows
    *     contract via a broadcast leftsemi, the [[mirrorLookup]] shape);
    *  2. recompute: [[graft.pipeline.Dedup.contaminationWithEvalGrams]]
    *     runs batch × eval — the eval GRAM frame is STATIC, tokenized and
    *     exploded exactly once via [[contamEvalGrams]] (an eager
    *     localCheckpoint truncates its lineage, so a micro-batch
    *     physically cannot re-derive it), and each batch pays only its own
    *     explode (StreamingSpec pins eval-side tokenization at one pass
    *     across a multi-wave stream);
    *  3. upsert the fresh pairs one stamp later (the deletes-at-T /
    *     puts-at-T+1 convention: an updated doc that KEEPS a contamination
    *     pair re-puts the very key its retirement just tombstoned).
    *
    * Source phases: full train corpus; a ranged DELETE (docs 100-199 —
    * their pairs must vanish); a final wave with resurrections (even ids
    * of the deleted range), an append-marker update (`zzznewterm` — every
    * new n-gram contains the marker token, so provably contamination-
    * neutral: the mirror machinery must churn without the answer moving),
    * and a quarantine wave (text replaced entirely — those docs' pairs
    * must vanish without a tombstone). The final answer reads the mirror;
    * the oracle is px17's SQL over the corpus's FINAL state. */
  /** The STATIC eval-side gram frame of the decontamination protocol,
    * tokenized + exploded ONCE and pinned by an eager localCheckpoint —
    * lineage truncation makes per-batch re-derivation impossible by
    * construction, which is what lets [[maintainContamMirror]] promise
    * batch-×-eval-GRAMS work per drain with zero eval re-tokenization.
    * Callers release the blocks with `unpersist()` when the stream ends. */
  private[graft] def contamEvalGrams(evalDocs: DataFrame, n: Int): DataFrame =
    graft.pipeline.Dedup.evalGrams(evalDocs, "doc_id", "text", n)
      .localCheckpoint(true)

  /** One CDC drain of contamination-mirror maintenance — the per-batch
    * protocol of [[sv19StreamDecontam]], factored out so the differential
    * and crash-recovery specs can drive arbitrary put/delete sequences
    * (and checkpoint-resumed restarts at the deletes-at-T / puts-at-T+1
    * boundary) through the exact production path. `evalG` is the
    * [[contamEvalGrams]] frame: already exploded, already materialized —
    * this function never tokenizes the eval side. `crashPoint` is a
    * fault-injection seam invoked between the retirement (deletes-at-T)
    * and the fresh-pair upsert (puts-at-T+1): a throwing hook simulates a
    * mid-batch crash exactly at the convention's hazard window, and the
    * recovery spec asserts a checkpoint-resumed replay converges. */
  private[graft] def maintainContamMirror(s: SparkSession, srcCatalog: String,
      mirCatalog: String, evalG: DataFrame, maxId: Long, ckpt: String,
      phaseStamp: Long, n: Int = 5, crashPoint: () => Unit = () => ()): Unit = {
    import graft.store.KvStore
    val mirName = graft.catalog.GraftCatalog.parse(mirCatalog, Map.empty).qualifiedName
    withDrainAqe(s) { // per-batch jobs are broadcasts/slivers: AQE only re-plans (see helper)
    val q = s.readStream.format("graft-kv")
      .option("catalog", srcCatalog).option("tombstones", "true").load()
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val changed = df.select(col("doc_id"), col("text"), col("_deleted"))
          .persist()
        if (!changed.isEmpty) {
          if (KvStore.exists(mirName)) {
            // 1. retire the touched docs' OLD pairs: changed ids → In
            //    ranges on the LEADING key part (capped, leftsemi
            //    fallback past the cap) — batch-sized point slivers.
            //    Same small-state gate as [[mirrorLookup]]: below
            //    [[SmallStateRows]] the ids collect costs more than
            //    scanning the mirror, so skip straight to the leftsemi.
            val mirror = s.read.format("graft-kv")
              .option("catalog", mirCatalog).load()
            def idsLeftsemi = mirror.join(broadcast(changed.select(
                col("doc_id").as("train_id")).distinct()),
              Seq("train_id"), "leftsemi")
            val oldPairs =
              if (storeRows(mirCatalog) <= SmallStateRows) idsLeftsemi
              else {
                val ids = changed.select(col("doc_id")).distinct()
                  .limit(MaxPushedBandPrefixes + 1).collect().map(_.getLong(0))
                if (ids.length > MaxPushedBandPrefixes) idsLeftsemi
                else mirror.filter(col("train_id").isInCollection(ids.toSeq))
              }
            oldPairs.select(col("train_id"), col("eval_id"))
              .write.format("graft-kv")
              .options(Map("catalog" -> mirCatalog, "delete" -> "true",
                "timestamp" -> phaseStamp.toString))
              .mode("append").save()
          }
          crashPoint() // fault-injection seam: deletes-at-T landed, puts-at-T+1 have not
          // 2. fresh pairs for the upserted docs, against the static
          //    PRE-EXPLODED eval grams — batch × eval, never corpus × eval,
          //    and never a repeat of the eval-side tokenize
          val ups = changed.filter(!col("_deleted"))
            .select(col("doc_id"), col("text"))
          graft.pipeline.Dedup.contaminationWithEvalGrams(ups, evalG,
            "doc_id", "text", n = n, minShared = 1)
            .write.format("graft-kv")
            .options(Map("catalog" -> mirCatalog, "newtable" -> "4",
              "timestamp" -> (phaseStamp + 1).toString,
              "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
            .mode("append").save()
        }
        changed.unpersist()
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    } // withDrainAqe
  }

  def sv19StreamDecontam(s: SparkSession, dir: String): DataFrame = {
    import graft.datasource.FilterCompiler
    import graft.store.KvStore
    val base = Tables.documents(s, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val train = base.filter(col("doc_id") % 10 =!= 0)
    val evalDocs = base.filter(col("doc_id") % 10 === 0)
    // the static eval work happens HERE, once — the drains below reuse the
    // materialized gram frame
    val evalG = contamEvalGrams(evalDocs, n = 5)
    val maxId = base.agg(max(col("doc_id"))).head().getLong(0)
    val srcParsed = graft.catalog.GraftCatalog.parse(sv19SrcCatalog, Map.empty)
    val mirParsed = graft.catalog.GraftCatalog.parse(sv19MirCatalog, Map.empty)
    def writeSrc(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> sv19SrcCatalog, "newtable" -> "4",
          "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    val ckpt = tempWorkDir(s, "graft-sv19-ckpt").toString
    def applyBatch(phaseStamp: Long): Unit =
      maintainContamMirror(s, sv19SrcCatalog, sv19MirCatalog, evalG,
        maxId, ckpt, phaseStamp)
    // fresh run every invocation
    KvStore.drop(mirParsed.qualifiedName)
    writeSrc(train, ts = 1000, overwrite = true)
    applyBatch(phaseStamp = 10)
    val hrf = FilterCompiler.compileAll(srcParsed, Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("doc_id", 100L),
      org.apache.spark.sql.sources.LessThanOrEqual("doc_id", 199L))).exactOrThrow("CDC DELETE")
    KvStore.table(srcParsed.qualifiedName).delete(hrf.ranges, hrf.pred, stamp = 2000)
    applyBatch(phaseStamp = 20)
    val inDel = col("doc_id").between(100, 199)
    writeSrc(
      train.filter(inDel && col("doc_id") % 2 === 0)
        .unionAll(train.filter(!inDel && col("doc_id") % 9 === 0)
          .withColumn("text", concat(col("text"), lit(" zzznewterm"))))
        .unionAll(train.filter(!inDel && col("doc_id") % 9 =!= 0 &&
            col("doc_id") % 50 === 7)
          .withColumn("text", lit("quarantine removed"))),
      ts = 3000, overwrite = false)
    applyBatch(phaseStamp = 30)
    evalG.unpersist()
    s.read.format("graft-kv").option("catalog", sv19MirCatalog).load()
      .select(col("train_id"), col("eval_id"), col("n_shared"))
      .orderBy(col("train_id"), col("eval_id"))
  }

  /** px17 over the corpus's FINAL state (resurrected evens of the deleted
    * range; append-marker and quarantine waves applied outside it). */
  val sv19Sql: String =
    """WITH final AS (
      |  SELECT doc_id, CASE
      |      WHEN doc_id NOT BETWEEN 100 AND 199 AND doc_id % 9 = 0
      |        THEN text || ' zzznewterm'
      |      WHEN doc_id NOT BETWEEN 100 AND 199 AND doc_id % 50 = 7
      |        THEN 'quarantine removed'
      |      ELSE text END AS text
      |  FROM documents
      |  WHERE doc_id % 10 <> 0
      |    AND (doc_id NOT BETWEEN 100 AND 199 OR doc_id % 2 = 0)),
      |ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
      |ta AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM final),
      |tb AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM ev),
      |ga AS (SELECT doc_id, CASE WHEN len(toks) < 5 THEN CAST([] AS VARCHAR[])
      |        ELSE list_distinct(list_transform(range(1, len(toks) - 3),
      |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
      |               toks[i+3] || ' ' || toks[i+4])) END AS gs
      |      FROM ta),
      |gb AS (SELECT doc_id, CASE WHEN len(toks) < 5 THEN CAST([] AS VARCHAR[])
      |        ELSE list_distinct(list_transform(range(1, len(toks) - 3),
      |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
      |               toks[i+3] || ' ' || toks[i+4])) END AS gs
      |      FROM tb),
      |ua AS (SELECT doc_id, unnest(gs) AS ngram FROM ga),
      |ub AS (SELECT doc_id, unnest(gs) AS ngram FROM gb)
      |SELECT a.doc_id AS train_id, b.doc_id AS eval_id, count(*) AS n_shared
      |FROM ua a JOIN ub b ON a.ngram = b.ngram
      |GROUP BY 1, 2 HAVING count(*) >= 1
      |ORDER BY train_id, eval_id""".stripMargin

  /** Avro schema of the PQ code column: m small ints per vector. */
  private[graft] val sv20AvroCodes = """{"type":"array","items":"int"}"""

  private[graft] val sv20SrcCatalog =
    """{"table":{"namespace":"default", "name":"kv_pq_src"},
      |"rowkey":"key",
      |"columns":{
      |"vec_id":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"embedding":{"cf":"f", "col":"v", "avro":"annVec"}}}""".stripMargin

  private[graft] val sv20CodesCatalog =
    """{"table":{"namespace":"default", "name":"kv_pq_codes"},
      |"rowkey":"key",
      |"columns":{
      |"vec_id":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"codes":{"cf":"f", "col":"c", "avro":"pqCodes"}}}""".stripMargin

  /** One CDC drain of PQ code-table maintenance — the per-batch protocol
    * of [[sv20StreamPqCodes]], factored out so the proxy-scale spec can
    * drive arbitrary corpora through the exact production path. MAP-ONLY
    * plus two batch-sized writes per micro-batch: tombstoned ids die by
    * key through the distributed delete-mode writer, upserts re-encode
    * against the broadcast codebooks and overwrite in place — the batch
    * never READS the code table at all. */
  private[graft] def maintainPqCodes(s: SparkSession, srcCatalog: String,
      codesCatalog: String, books: Array[Array[Array[Double]]], maxId: Long,
      ckpt: String, phaseStamp: Long): Unit = {
    import graft.store.KvStore
    val codesName = graft.catalog.GraftCatalog.parse(codesCatalog, Map.empty).qualifiedName
    withDrainAqe(s) { // per-batch jobs are broadcasts/slivers: AQE only re-plans (see helper)
    val q = s.readStream.format("graft-kv")
      .options(Map("catalog" -> srcCatalog, "annVec" -> sv18AvroVec,
        "tombstones" -> "true")).load()
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val changed = df.select(col("vec_id"), col("embedding"), col("_deleted"))
          .persist()
        if (!changed.isEmpty) {
          // retirement: tombstoned ids die by key through the
          // delete-mode writer — distributed, batch-sized, no reads
          if (KvStore.exists(codesName))
            changed.filter(col("_deleted")).select(col("vec_id"))
              .write.format("graft-kv")
              .options(Map("catalog" -> codesCatalog,
                "pqCodes" -> sv20AvroCodes,
                "delete" -> "true", "timestamp" -> phaseStamp.toString))
              .mode("append").save()
          // re-encode + overwrite: updates re-code in place one stamp
          // later (key = vec_id, version cap 1 keeps the latest)
          changed.filter(!col("_deleted"))
            .select(col("vec_id"),
              graft.pipeline.Similarity.pqCodes(col("embedding"), books).as("codes"))
            .write.format("graft-kv")
            .options(Map("catalog" -> codesCatalog,
              "pqCodes" -> sv20AvroCodes,
              "newtable" -> "4", "timestamp" -> (phaseStamp + 1).toString,
              "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
            .mode("append").save()
        }
        changed.unpersist()
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    } // withDrainAqe
  }

  /** sv20: INCREMENTAL PQ CODE-TABLE MAINTENANCE over CDC — the streaming
    * twin of px57, completing the compression story: sv18 keeps the IVF
    * structure current as vectors arrive; this keeps the PQ COMPRESSION
    * current (the m-byte-per-vector structure a 100 TB deployment actually
    * serves searches from). Each micro-batch is MAP-ONLY plus two
    * batch-sized writes: tombstoned ids die through the delete-mode
    * writer, and upserted vectors re-encode to m codes against the
    * broadcast codebooks and overwrite in place (the table is keyed by
    * vec_id — no re-keying, and the batch never READS the code table at
    * all: the strictest batch-proportionality of the sv protocols).
    * Source phases exercise the maintenance moves: a corrupted first
    * generation (reversed vectors → wrong codes), a correcting overwrite,
    * a ranged DELETE, and a resurrection wave. The final answer searches
    * the MAINTAINED code table via [[graft.pipeline.Similarity
    * .pqTopKFromCodes]] and must equal px56's answer bit-for-bit — the
    * oracle IS px56's rendered SQL: neither compressing the corpus nor
    * maintaining the compression incrementally may change what the
    * search returns. */
  def sv20StreamPqCodes(s: SparkSession, dir: String): DataFrame = {
    import graft.datasource.FilterCompiler
    import graft.store.KvStore
    val books = Pipeline.pqCodebooksFor(s, dir)
    val base = Tables.embeddings(s, dir)
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val maxId = base.agg(max(col("vec_id"))).head().getLong(0)
    val srcParsed = graft.catalog.GraftCatalog.parse(sv20SrcCatalog, Map.empty)
    val codesParsed = graft.catalog.GraftCatalog.parse(sv20CodesCatalog, Map.empty)
    def writeSrc(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> sv20SrcCatalog, "annVec" -> sv18AvroVec,
          "newtable" -> "4", "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    val ckpt = tempWorkDir(s, "graft-sv20-ckpt").toString
    def drain(phaseStamp: Long): Unit =
      maintainPqCodes(s, sv20SrcCatalog, sv20CodesCatalog, books, maxId,
        ckpt, phaseStamp)
    // fresh run every invocation
    KvStore.drop(codesParsed.qualifiedName)
    writeSrc(base.filter(col("vec_id") % 3 === 0)
      .withColumn("embedding", reverse(col("embedding"))), ts = 1000, overwrite = true)
    drain(phaseStamp = 10)
    writeSrc(base.filter(col("vec_id") % 3 <= 1), ts = 2000, overwrite = false)
    drain(phaseStamp = 20)
    val hrf = FilterCompiler.compileAll(srcParsed, Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("vec_id", 30L),
      org.apache.spark.sql.sources.LessThanOrEqual("vec_id", 90L))).exactOrThrow("CDC DELETE")
    KvStore.table(srcParsed.qualifiedName).delete(hrf.ranges, hrf.pred, stamp = 3000)
    drain(phaseStamp = 30)
    writeSrc(base.filter(col("vec_id") % 3 === 2 ||
      (col("vec_id") >= 30 && col("vec_id") <= 90)), ts = 4000, overwrite = false)
    drain(phaseStamp = 40)
    // search the MAINTAINED code table — px56's answer, served from codes
    val codeTable = s.read.format("graft-kv")
      .options(Map("catalog" -> sv20CodesCatalog, "pqCodes" -> sv20AvroCodes)).load()
    val queries = Tables.embeddings(s, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    graft.pipeline.Similarity.pqTopKFromCodes(books, queries, codeTable,
      "vec_id", "embedding", k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  private[graft] val sv21SrcCatalog = sv14SrcCatalog
    .replace("\"kv_nd_src\"", "\"kv_lm_src\"")
  private[graft] val sv21MirrorCatalog = sv14SrcCatalog
    .replace("\"kv_nd_src\"", "\"kv_lm_mirror\"")
  /** Bigram count table, keyed by the gram string `"w1 w2"` (tokens are
    * whitespace-split, so the single-space join is unambiguous); w1/w2 ride
    * as covered columns so the LM readback never re-splits keys. */
  private[graft] val sv21CountsCatalog =
    """{"table":{"namespace":"default", "name":"kv_lm_counts"},
      |"rowkey":"key",
      |"columns":{
      |"gram":{"cf":"rowkey", "col":"key", "type":"string"},
      |"w1":{"cf":"f", "col":"w1", "type":"string"},
      |"w2":{"cf":"f", "col":"w2", "type":"string"},
      |"cnt":{"cf":"f", "col":"c", "type":"bigint"}}}""".stripMargin

  /** Exact-key lookup into a STRING-rowkey table — [[mirrorLookup]]'s
    * contract (batch-proportional point-gets, ratio-gated broadcast-leftsemi
    * fallback, small-state full-scan gate) for string keys: the key frame
    * (batch-bounded by construction) compiles into In point-ranges on the
    * rowkey, so each CDC batch point-reads exactly its touched rows instead
    * of scanning the (vocabulary²-scale) table. Same cost model, same
    * bounded `limit(cap+1)` driver job deciding guard + key set at once. */
  private[graft] def stringKeyLookup(s: SparkSession, catalog: String,
      keysDf: DataFrame, keyCol: String,
      smallStateRows: Long = SmallStateRows,
      extraOpts: Map[String, String] = Map.empty): DataFrame = {
    val tbl = s.read.format("graft-kv")
      .options(Map("catalog" -> catalog) ++ extraOpts).load()
    val rows = storeRows(catalog)
    if (rows <= smallStateRows)
      return tbl.join(broadcast(keysDf.select(col(keyCol)).distinct()),
        Seq(keyCol), "leftsemi")
    val keys = keysDf.select(col(keyCol)).distinct()
      .limit(MaxPushedBandPrefixes + 1).collect().map(_.getString(0))
    if (keys.isEmpty) tbl.filter(lit(false))
    else if (keys.length > MaxPushedBandPrefixes ||
        keys.length.toLong * 4 >= rows)
      tbl.join(broadcast(keysDf.select(col(keyCol)).distinct()),
        Seq(keyCol), "leftsemi")
    else tbl.filter(col(keyCol).isInCollection(keys.toSeq))
  }

  /** Signed per-document bigram multiset — [[graft.pipeline.TextOps
    * .bigramLm]]'s exact tokenization and pairing (empty tokens dropped,
    * docs under 2 tokens contribute nothing), each pair carrying weight
    * `w` so old text (−1) and new text (+1) cancel in one aggregation. */
  private def signedBigrams(docs: DataFrame, w: Int): DataFrame = {
    val toks = filter(graft.pipeline.TextOps.tokens(col("text")),
      t => length(t) > 0)
    docs.select(toks.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"),
        lit(w.toLong).as("w"))
  }

  /** One CDC drain of incremental bigram-count maintenance — the per-batch
    * protocol of [[sv21StreamBigramLm]], factored out for proxy-scale
    * reuse. This is the first AGGREGATE incremental-view-maintenance
    * protocol of the sv family: the maintained state is not per-row (codes,
    * index entries) but a COUNT a deletion must *decrement* — so each batch
    * (1) point-reads the OLD text of every changed id from the forward
    * mirror ([[mirrorLookup]] — the batch-proportional sliver; its gates
    * may answer with a scan-plus-semi-join below the small-state
    * threshold or past the cap, where that IS the cheaper plan), (2)
    * folds old text at −1 and new text at +1 into one signed gram
    * aggregation (cancellation makes unchanged-text rewrites free), (3)
    * reads ONLY the affected grams' current counts ([[stringKeyLookup]]
    * — keyed by ≤ the batch's token count, never the vocabulary, same
    * gate caveat), and (4) writes counts back: zero-crossers become
    * LOGICAL zeros, the rest overwrite in place. Touched rows and writes
    * are batch-proportional at every state size the gates route to the
    * sliver path — which is every size where it matters.
    *
    * REPLAY SAFETY: foreachBatch is at-least-once, and a read-modify-write
    * aggregate is the one protocol shape where naive replay CORRUPTS
    * (counts written, crash before the mirror lands, replay adds the
    * delta again). Three rules make any replay idempotent: (a) both state
    * reads are AS-OF `maxStamp = phaseStamp`, strictly below everything
    * this batch writes (all puts land at `phaseStamp + 1`); (b) both
    * state tables retain TWO versions, so the crashed attempt's write
    * never evicts the pre-batch cell the as-of read needs; (c) the
    * protocol never physically deletes — a dead gram is a cnt=0 cell and
    * a dead doc is empty mirror text (both logically dead to every
    * reader, both leaving the prior version readable below the window;
    * physical reclamation belongs to an explicit compaction, the LSM
    * discipline). A replayed batch therefore recomputes the identical
    * delta against pre-batch state and re-writes identical cells at
    * identical stamps, whatever the torn point.
    *
    * STAMPS ARE PER-BATCH, derived from the micro-batch id:
    * `stamp(b) = (b + 1) × 10`, reads as-of `stamp(b)`, writes at
    * `stamp(b) + 1`. The batch id is checkpoint-stable (a replayed batch
    * keeps its id, so the replay re-derives the identical stamp), and
    * per-batch stamps are what make MULTI-batch drains correct: a
    * capped catch-up (`maxRowsPerBatch`) chunks a backlog into batches
    * b, b+1, ... whose as-of reads each see every PRIOR batch's writes
    * (`stamp(b) ≥ stamp(b−1) + 2 > ` the prior write stamp) while still
    * excluding their own crashed attempt's. A fixed per-drain stamp —
    * the previous design — silently double-applied the first batch's
    * deltas in exactly that scenario. Single-batch drains derive the
    * same 10/20/30... stamps the per-drain design produced, so existing
    * state layouts replay unchanged. Within one batch, the CDC window is
    * a latest-merge read: at most ONE row per doc_id reaches the fold
    * (an upsert superseded by a newer in-window delete arrives only as
    * the tombstone; stacked upserts arrive as the newest), so the +1
    * side can never count a superseded generation. `crashPoint` runs
    * between the counts write and the mirror write — the worst torn
    * window — for the replay spec. A NEGATIVE merged count can only mean
    * the decrement stream diverged from what was ever added (a protocol
    * bug, or state edited behind the maintainer's back) — fail loudly,
    * never COMMIT it: the guard rides inside the write's cnt expression
    * (no extra job), so the refused batch is a permanently torn batch —
    * partial sibling-task puts may land, the checkpoint never commits,
    * and once the corruption is repaired a re-drain replays against the
    * same as-of state and overwrites them (the recovery spec pins this).
    *
    * Returns the highest stamp written (the compaction fence input), or
    * Long.MinValue when the drain admitted nothing. */
  private[graft] def maintainBigramCounts(s: SparkSession, srcCatalog: String,
      mirrorCatalog: String, countsCatalog: String, maxId: Long,
      ckpt: String, maxRowsPerBatch: Option[Long] = None,
      crashPoint: () => Unit = () => ()): Long = {
    val highWrite = new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
    val srcOpts = Map("catalog" -> srcCatalog, "tombstones" -> "true") ++
      maxRowsPerBatch.map(n => "maxRowsPerBatch" -> n.toString)
    withDrainAqe(s) { // per-batch jobs are broadcasts/slivers: AQE only re-plans (see helper)
    val q = s.readStream.format("graft-kv").options(srcOpts).load()
      .writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val stamp = (batchId + 1) * 10
        val asOf = Map("maxStamp" -> stamp.toString)
        val changed = b.select(col("doc_id"), col("text"), col("_deleted"))
          .persist()
        if (!changed.isEmpty) {
          // OLD text of every changed id (upsert OR tombstone), as of
          // pre-batch state — stable even if this batch's own mirror
          // writes landed before a crash-and-replay
          val olds = mirrorLookup(s, mirrorCatalog, "",
            changed.select(col("doc_id")), idCol = "doc_id",
            extraOpts = asOf)
            .select(col("doc_id"), col("text"))
          val delta = signedBigrams(olds, -1)
            .unionByName(signedBigrams(changed.filter(!col("_deleted")), 1))
            .groupBy(col("w1"), col("w2"))
            .agg(sum(col("w")).as("d"))
            .filter(col("d") =!= 0)
            .withColumn("gram", concat(col("w1"), lit(" "), col("w2")))
            .persist()
          val current = stringKeyLookup(s, countsCatalog,
            delta.select(col("gram")), "gram", extraOpts = asOf)
            .select(col("gram"), col("cnt").as("old_cnt"))
          // The negative-count guard rides INSIDE the cnt expression (a
          // conditional raise_error evaluated by the write tasks) instead
          // of a separate driver-blocking filter+isEmpty job per batch: a
          // count going negative means the decrement stream no longer
          // matches what was added (protocol bug or out-of-band state
          // edit). The failing write makes the refused batch a
          // PERMANENTLY TORN batch — sibling tasks' puts may have landed
          // (the kv writer appends eagerly, there is no staging), but the
          // checkpoint never commits, so once the out-of-band corruption
          // is repaired a re-drain replays the batch against the same
          // as-of state and overwrites the partial cells at the same
          // stamps — the exact discipline every torn window here already
          // rests on (the recovery spec pins it end to end). merged is
          // NOT persisted: the counts write is its only consumer.
          val rawCnt = coalesce(col("old_cnt"), lit(0L)) + col("d")
          val merged = delta
            .join(current, Seq("gram"), "left")
            .select(col("gram"), col("w1"), col("w2"),
              when(rawCnt < 0, raise_error(concat(
                lit("maintainBigramCounts: merged count went NEGATIVE for gram '"),
                col("gram"), lit("' — refusing to persist corrupted counts"))))
                .otherwise(rawCnt).as("cnt"))
          // zero-crossers write a LOGICAL zero (a regular versioned cell),
          // never the physical delete-mode writer: a physical delete is
          // unrecoverable under the as-of replay read, while a cnt=0 cell
          // leaves the previous version visible below the batch stamp (the
          // LSM discipline — logical death now, physical reclamation by
          // an explicit compaction). Readers treat cnt=0 as dead: it adds
          // nothing to any marginal and never passes a minCount filter.
          merged
            .write.format("graft-kv")
            .options(Map("catalog" -> countsCatalog, "newtable" -> "4",
              "maxVersions" -> "2",
              "timestamp" -> (stamp + 1).toString,
              "minSplit" -> "0", "maxSplit" -> "z"))
            .mode("append").save()
          crashPoint()
          // mirror maintenance LAST, by the same logical-tombstone rule:
          // a dead doc becomes EMPTY text (bigram-identical to deletion —
          // no gram survives tokenization) so its previous version stays
          // readable below the batch stamp for the replay's decrements
          changed.select(col("doc_id"),
              when(col("_deleted"), lit("")).otherwise(col("text")).as("text"))
            .write.format("graft-kv")
            .options(Map("catalog" -> mirrorCatalog, "newtable" -> "4",
              "maxVersions" -> "2",
              "timestamp" -> (stamp + 1).toString,
              "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
            .mode("append").save()
          highWrite.accumulateAndGet(stamp + 1, math.max)
          delta.unpersist(); ()
        }
        changed.unpersist()
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    } // withDrainAqe
    highWrite.get()
  }

  /** Physical reclamation of LOGICAL tombstones — the compaction half of
    * the replay-safe maintenance discipline (sv21 writes cnt=0 cells and
    * empty mirror text instead of physical deletes so torn batches can
    * replay against as-of state; those dead rows then accumulate until
    * THIS pass). Scans the table for rows that are logically dead
    * (`isDead`) and whose newest cell is older than `horizon`, and kills
    * exactly those keys through the distributed delete-mode writer.
    *
    * `horizon` is a SAFETY FENCE, not a tuning knob: it must be ≤ every
    * phase stamp that could still replay (i.e., at or below the stream's
    * committed watermark). Under that fence, no future as-of read can
    * need a reclaimed row's history — a replaying batch has
    * `phaseStamp ≥ horizon`, its as-of window still sees the tombstone's
    * absence as cnt-missing, and `coalesce(old_cnt, 0)` makes missing and
    * zero indistinguishable, which is exactly why cnt=0 was the logical
    * tombstone in the first place. A row resurrected after reclamation
    * starts from scratch with a put above `horizon`.
    *
    * Cost shape: ONE full scan of the state table (value predicates don't
    * prune key ranges) + a dead-set-sized delete write; the fence's
    * high-water consult rides the same scan as an observe() metric, so
    * enforcement costs no second pass. That is inherent to compaction —
    * it runs on a schedule and amortizes over thousands of
    * wave-proportional batches, never inside one.
    *
    * The fence is ENFORCED, not caller-trusted: the pass refuses a
    * horizon above the committed watermark's best available evidence —
    * the table's own max `_cell_ts` (every committed batch's writes land
    * at `stamp + 1`, so the high-water bounds every stamp a committed
    * phase wrote to THIS table) raised by `committedStamp` when the
    * caller tracks the drain schedule (a committed batch may legitimately
    * write NOTHING to this table — empty delta, delete-only wave — and
    * the table high-water alone would then falsely refuse the
    * drain-derived fence). A horizon past both exceeds every write any
    * committed phase made and could reclaim rows an un-run phase still
    * needs under its as-of read — the silent corruption the fence exists
    * to stop. The refusal fires BEFORE the delete write, so a refused
    * pass deletes nothing. The residual caller obligation (don't reclaim
    * between a TORN batch's partial write and its replay with a horizon
    * inside that batch's stamp window) is unreachable through the
    * maintenance entries, which only compact between successfully
    * completed drains. */
  private[graft] def reclaimLogicalDead(s: SparkSession, catalog: String,
      keyCol: String, isDead: org.apache.spark.sql.Column,
      horizon: Long, committedStamp: Option[Long] = None,
      extraKeyCols: Seq[String] = Nil): Long = {
    val state = s.read.format("graft-kv").option("catalog", catalog).load()
    val obs = org.apache.spark.sql.Observation()
    val dead = state
      .observe(obs,
        coalesce(max(col("_cell_ts")), lit(Long.MinValue)).as("hw"))
      .filter(isDead && col("_cell_ts") < horizon)
      // composite-keyed tables (extraKeyCols) must carry EVERY key part —
      // the delete-mode writer re-derives the rowkey from them
      .select((keyCol +: extraKeyCols).map(col): _*)
      .persist()
    try {
      val n = dead.count() // the one scan: the high-water metric rides it
      val highWater = graft.pipeline.GraftMetrics.observedLongOr(obs, "hw") {
        Option(state.agg(max(col("_cell_ts"))).head().get(0))
          .map(_.asInstanceOf[Long]).getOrElse(Long.MinValue)
      }
      val fence = math.max(highWater, committedStamp.getOrElse(Long.MinValue))
      require(fence == Long.MinValue || horizon <= fence + 1,
        s"reclaimLogicalDead($catalog): horizon $horizon exceeds the " +
          s"committed watermark's evidence (table high-water $highWater, " +
          s"caller-committed ${committedStamp.getOrElse("none")}) + 1 — a " +
          "horizon above every committed write can reclaim rows an un-run " +
          "phase still needs under its as-of read; pass a fence at or " +
          "below the last successfully drained write stamp")
      if (n > 0)
        dead.write.format("graft-kv")
          .options(Map("catalog" -> catalog, "delete" -> "true",
            "timestamp" -> horizon.toString))
          .mode("append").save()
      n
    } finally dead.unpersist()
  }

  /** sv21: INCREMENTAL BIGRAM-LM MAINTENANCE over CDC — the streaming twin
    * of px30, and the family's first incrementally-maintained AGGREGATE: a
    * (w1, w2) → count table kept current as documents arrive, change, and
    * die, with deletions *decrementing* counts via mirror-sourced old text
    * (see [[maintainBigramCounts]] for the per-batch shape). Source phases
    * exercise every maintenance move: a corrupted first generation (extra
    * trailing grams that must later go logically DEAD — the zero-crossing
    * path), a correcting overwrite, a ranged DELETE, and a resurrection
    * wave restoring the original corpus. The final answer renders px30's
    * LM (c12 ≥ 3, per-w1 conditional probability in exact micro-units)
    * from the MAINTAINED counts and must equal the batch recomputation
    * bit-for-bit — the oracle IS px30's SQL. */
  def sv21StreamBigramLm(s: SparkSession, dir: String): DataFrame = {
    import graft.datasource.FilterCompiler
    import graft.store.KvStore
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(s, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val maxId = base.agg(max(col("doc_id"))).head().getLong(0)
    val srcParsed = graft.catalog.GraftCatalog.parse(sv21SrcCatalog, Map.empty)
    def writeSrc(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> sv21SrcCatalog, "newtable" -> "4",
          "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    // fresh run every invocation; pre-create mirror + counts (the FIRST
    // batch already point-reads both)
    Seq("default:kv_lm_mirror", "default:kv_lm_counts").foreach(KvStore.drop)
    base.limit(0).write.format("graft-kv")
      .options(Map("catalog" -> sv21MirrorCatalog, "newtable" -> "4",
        "maxVersions" -> "2", "timestamp" -> "1", "minSplitNum" -> "0",
        "maxSplitNum" -> maxId.toString))
      .mode("append").save()
    s.range(0).select(lit("").as("gram"), lit("").as("w1"),
        lit("").as("w2"), lit(0L).as("cnt"))
      .write.format("graft-kv")
      .options(Map("catalog" -> sv21CountsCatalog, "newtable" -> "4",
        "maxVersions" -> "2", "timestamp" -> "1",
        "minSplit" -> "0", "maxSplit" -> "z"))
      .mode("append").save()
    val ckpt = tempWorkDir(s, "graft-sv21-ckpt").toString
    // the compaction fence derives from the drain schedule: each drain
    // returns the highest stamp it wrote (per-batch stamps, see
    // maintainBigramCounts), and everything at or below the last returned
    // stamp is committed — never hard-code the fence
    var committedWrite = 0L
    def drain(): Unit = {
      val w = maintainBigramCounts(s, sv21SrcCatalog, sv21MirrorCatalog,
        sv21CountsCatalog, maxId, ckpt)
      if (w != Long.MinValue) committedWrite = math.max(committedWrite, w)
    }
    // phase 1: a corrupted first generation — grams that must later vanish
    writeSrc(base.filter(col("doc_id") % 3 === 0)
      .withColumn("text", concat(col("text"), lit(" zzcorrupt zzcorrupt"))),
      ts = 1000, overwrite = true)
    drain()
    // phase 2: correcting overwrite (%3==0 back to original) + new docs
    writeSrc(base.filter(col("doc_id") % 3 <= 1), ts = 2000, overwrite = false)
    drain()
    // phase 3: ranged DELETE — counts of [100,300]'s grams must decrement
    val hrf = FilterCompiler.compileAll(srcParsed, Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("doc_id", 100L),
      org.apache.spark.sql.sources.LessThanOrEqual("doc_id", 300L))).exactOrThrow("CDC DELETE")
    KvStore.table(srcParsed.qualifiedName).delete(hrf.ranges, hrf.pred, stamp = 3000)
    drain()
    // scheduled compaction mid-stream: reclaim logical tombstones behind
    // the committed watermark (phase 1/2's zero-crossers — the corrupted
    // generation's grams — die physically here; phase 3's zeros at stamp
    // 31 sit AT the horizon and survive until the next pass). The pass
    // runs INSIDE the driver's hash-gate: the final LM must be untouched
    // by when compaction fires (from-scratch resurrection of a reclaimed
    // key is pinned separately in StreamingSpec's reclamation case).
    // The fence is DERIVED from the drain schedule (the last drain's
    // returned write stamp — 31 here) and re-checked against the state
    // table's high-water inside reclaimLogicalDead — never a literal.
    reclaimLogicalDead(s, sv21CountsCatalog, "gram", col("cnt") === 0L,
      horizon = committedWrite, committedStamp = Some(committedWrite))
    reclaimLogicalDead(s, sv21MirrorCatalog, "doc_id",
      length(col("text")) === 0, horizon = committedWrite,
      committedStamp = Some(committedWrite))
    // phase 4: resurrection + the last generation — final corpus = original
    writeSrc(base.filter(col("doc_id") % 3 === 2 ||
      (col("doc_id") >= 100 && col("doc_id") <= 300)), ts = 4000, overwrite = false)
    drain()
    // px30's LM rendered from the MAINTAINED counts
    s.read.format("graft-kv").option("catalog", sv21CountsCatalog).load()
      .select(col("w1"), col("w2"), col("cnt").as("c12"))
      .filter(col("c12") > 0) // logical zeros are dead rows
      .withColumn("c1", sum(col("c12")).over(Window.partitionBy(col("w1"))))
      .filter(col("c12") >= 3)
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        expr("CAST(c12 AS DECIMAL(38,0)) * 1000000 div c1").as("p_micro"))
      .orderBy(col("w1"), col("w2"))
  }

  private[graft] val sv22SrcCatalog = sv14SrcCatalog
    .replace("\"kv_nd_src\"", "\"kv_sh_src\"")
  /** Epoch-shard manifest: doc_id → (shuffle key, shard, position). The
    * training-order structure a data loader reads shard-by-shard
    * ([[graft.pipeline.Sampling.shardShuffle]]'s batch output), here
    * MAINTAINED as docs arrive and die. */
  private[graft] val sv22ManifestCatalog =
    """{"table":{"namespace":"default", "name":"kv_sh_manifest"},
      |"rowkey":"key",
      |"columns":{
      |"doc_id":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"skey":{"cf":"f", "col":"s", "type":"bigint"},
      |"shard":{"cf":"f", "col":"h", "type":"int"},
      |"pos":{"cf":"f", "col":"p", "type":"bigint"}}}""".stripMargin
  /** Per-shard high-water counters — `shards` rows TOTAL (constant-size at
    * any corpus scale), read whole and broadcast each batch. Positions are
    * monotone per shard: deletions leave holes, never shift survivors. */
  private[graft] val sv22CountersCatalog =
    """{"table":{"namespace":"default", "name":"kv_sh_counters"},
      |"rowkey":"key",
      |"columns":{
      |"shard":{"cf":"rowkey", "col":"key", "type":"int"},
      |"n":{"cf":"f", "col":"n", "type":"bigint"}}}""".stripMargin

  /** One CDC drain of epoch-shard manifest maintenance — the per-batch
    * protocol of [[sv22StreamShardManifest]]. The manifest is APPEND-ONLY
    * in position space: a new/updated doc is assigned `pos = shard
    * high-water + its (skey, doc_id) rank within the batch` and the
    * high-water advances; a deleted/re-put doc's old manifest row dies by
    * key but its position slot is never reused and survivors never shift —
    * the stability contract that lets a resumable data loader keep its
    * (shard, pos) cursors across corpus edits. Per batch: one wave-sized
    * rank window, one broadcast of the `shards`-row counter table
    * (constant at any corpus scale), and batch-sized writes — the
    * manifest itself is never read, let alone re-ranked.
    *
    * REPLAY SAFETY: the counter advance is a read-modify-write, so the
    * counters are read AS-OF `maxStamp = phaseStamp` (below this batch's
    * writes at `phaseStamp`/`phaseStamp + 1`) and the counter table
    * retains TWO versions (a crashed attempt's advance must not evict the
    * pre-batch cell the as-of read needs): a replayed batch sees the
    * pre-batch high-waters, assigns the identical positions, and
    * re-writes identical cells at identical stamps — idempotent whatever
    * the torn point. The manifest needs no such care: the protocol never
    * READS it, so its physical retire/re-put replays verbatim.
    * Stamps are PER-BATCH, derived from the checkpoint-stable micro-batch
    * id exactly as in [[maintainBigramCounts]] — that is what makes a
    * capped multi-batch catch-up assign non-colliding positions: each
    * batch's counter read (as-of its own stamp) sees every prior batch's
    * advance, while a replayed batch re-derives its identical stamp.
    * `crashPoint` runs between the manifest append and the counter
    * advance — the worst torn window — for the replay spec. Returns the
    * highest stamp written, or Long.MinValue when nothing was admitted. */
  private[graft] def maintainShardManifest(s: SparkSession, srcCatalog: String,
      manifestCatalog: String, countersCatalog: String, shards: Int,
      maxId: Long, ckpt: String, maxRowsPerBatch: Option[Long] = None,
      crashPoint: () => Unit = () => ()): Long = {
    import org.apache.spark.sql.expressions.Window
    val highWrite = new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
    val srcOpts = Map("catalog" -> srcCatalog, "tombstones" -> "true") ++
      maxRowsPerBatch.map(n => "maxRowsPerBatch" -> n.toString)
    withDrainAqe(s) { // per-batch jobs are broadcasts/slivers: AQE only re-plans (see helper)
    val q = s.readStream.format("graft-kv").options(srcOpts).load()
      .writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val stamp = (batchId + 1) * 10
        val changed = b.select(col("doc_id"), col("_deleted")).persist()
        if (!changed.isEmpty) {
          // retire every changed id's row — an update re-appends at the
          // tail below; a tombstone just dies (position slot stays burned).
          // Pure inserts leave a no-op tombstone cell here: telling an
          // insert from an update apart would take a manifest point-read
          // the protocol otherwise never makes, and a marker cell is
          // cheaper than a read — compaction reclaims them wholesale.
          changed.select(col("doc_id"))
            .write.format("graft-kv")
            .options(Map("catalog" -> manifestCatalog,
              "delete" -> "true", "timestamp" -> stamp.toString))
            .mode("append").save()
          val ins = changed.filter(!col("_deleted"))
            .select(col("doc_id"),
              graft.functions.HashExprs.md5NumberLower(
                concat(lit("epoch0|"), col("doc_id").cast("string")))
                .bitwiseAND(lit(0x3fffffffffffffffL)).as("skey"))
            .withColumn("shard", (col("skey") % shards).cast("int"))
          // counter table: <= `shards` live rows — read whole (as of
          // pre-batch state, see REPLAY SAFETY above) and broadcast
          val ctr = s.read.format("graft-kv")
            .options(Map("catalog" -> countersCatalog,
              "maxStamp" -> stamp.toString)).load()
            .select(col("shard"), col("n"))
          // ranked feeds the manifest append AND the counter advance
          val ranked = ins
            .withColumn("r", row_number().over(
              Window.partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))))
            .join(broadcast(ctr), Seq("shard"), "left")
            .select(col("doc_id"), col("skey"), col("shard"),
              (coalesce(col("n"), lit(0L)) + col("r")).as("pos"))
            .persist()
          ranked.write.format("graft-kv")
            .options(Map("catalog" -> manifestCatalog, "newtable" -> "4",
              "timestamp" -> (stamp + 1).toString,
              "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
            .mode("append").save()
          crashPoint()
          // two retained versions: a crash AFTER this write must leave the
          // pre-batch high-water readable below the as-of window on replay
          ranked.groupBy(col("shard")).agg(max(col("pos")).as("n"))
            .write.format("graft-kv")
            .options(Map("catalog" -> countersCatalog, "newtable" -> "4",
              "maxVersions" -> "2",
              "timestamp" -> (stamp + 1).toString,
              "minSplitNum" -> "0", "maxSplitNum" -> (shards - 1).toString))
            .mode("append").save()
          highWrite.accumulateAndGet(stamp + 1, math.max)
          ranked.unpersist()
        }
        changed.unpersist()
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    } // withDrainAqe
    highWrite.get()
  }

  /** sv22: STREAMING EPOCH-SHARD MANIFEST over CDC — px63's loader-facing
    * twin: the deterministic training order, maintained as the corpus
    * changes instead of recomputed per epoch build. New docs append at
    * their shard's tail in (skey, doc_id) order; updates retire the old
    * row and re-append; deletions burn their position slot (holes, never
    * shifts — a loader's (shard, pos) cursor stays valid across edits).
    * Phases: %3==0 docs, then %3==1, a ranged delete of [100, 300], and a
    * final wave (%3==2 + resurrection of the deleted range). Every
    * assignment is deterministic — the md5 shuffle key, the per-phase
    * batch membership, and the within-batch rank — so a static SQL oracle
    * replays the WHOLE history: it unions the append events per phase,
    * ranks each shard's events by (phase, skey, doc_id) — burned slots
    * included — and keeps each doc's LAST event's position. */
  def sv22StreamShardManifest(s: SparkSession, dir: String): DataFrame = {
    import graft.datasource.FilterCompiler
    import graft.store.KvStore
    val shards = 16
    val base = Tables.documents(s, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val maxId = base.agg(max(col("doc_id"))).head().getLong(0)
    val srcParsed = graft.catalog.GraftCatalog.parse(sv22SrcCatalog, Map.empty)
    def writeSrc(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> sv22SrcCatalog, "newtable" -> "4",
          "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    Seq("default:kv_sh_manifest", "default:kv_sh_counters").foreach(KvStore.drop)
    // pre-create manifest + counters (the first batch reads the counters)
    s.range(0).select(col("id").as("doc_id"), col("id").as("skey"),
        lit(0).as("shard"), col("id").as("pos"))
      .write.format("graft-kv")
      .options(Map("catalog" -> sv22ManifestCatalog, "newtable" -> "4",
        "timestamp" -> "1", "minSplitNum" -> "0",
        "maxSplitNum" -> maxId.toString))
      .mode("append").save()
    s.range(0).select(col("id").cast("int").as("shard"), col("id").as("n"))
      .write.format("graft-kv")
      .options(Map("catalog" -> sv22CountersCatalog, "newtable" -> "4",
        "maxVersions" -> "2", "timestamp" -> "1", "minSplitNum" -> "0",
        "maxSplitNum" -> (shards - 1).toString))
      .mode("append").save()
    val ckpt = tempWorkDir(s, "graft-sv22-ckpt").toString
    var committedWrite = 0L
    def drain(): Unit = {
      val w = maintainShardManifest(s, sv22SrcCatalog, sv22ManifestCatalog,
        sv22CountersCatalog, shards, maxId, ckpt)
      if (w != Long.MinValue) committedWrite = math.max(committedWrite, w)
    }
    writeSrc(base.filter(col("doc_id") % 3 === 0), ts = 1000, overwrite = true)
    drain()
    writeSrc(base.filter(col("doc_id") % 3 === 1), ts = 2000, overwrite = false)
    drain()
    val hrf = FilterCompiler.compileAll(srcParsed, Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("doc_id", 100L),
      org.apache.spark.sql.sources.LessThanOrEqual("doc_id", 300L))).exactOrThrow("CDC DELETE")
    KvStore.table(srcParsed.qualifiedName).delete(hrf.ranges, hrf.pred, stamp = 3000)
    drain()
    // scheduled compaction mid-stream (sv21's discipline, manifest flavor):
    // the retire-first write burns a no-op delete MARKER per pure insert
    // (cheaper than the manifest point-read that would tell inserts from
    // updates — see maintainShardManifest); markers live outside the row
    // space, so reclaiming those behind the committed watermark can never
    // move a position. expireBefore stays MinValue — manifest row cells
    // are current state, not versions to expire. Runs inside the driver's
    // hash gate: the final manifest must be byte-identical either way.
    KvStore.table(graft.catalog.GraftCatalog.parse(sv22ManifestCatalog,
        Map.empty).qualifiedName)
      .compact(expireBefore = Long.MinValue, cdcHorizon = committedWrite)
    writeSrc(base.filter(col("doc_id") % 3 === 2 ||
      (col("doc_id") >= 100 && col("doc_id") <= 300)), ts = 4000, overwrite = false)
    drain()
    s.read.format("graft-kv").option("catalog", sv22ManifestCatalog).load()
      .select(col("doc_id"), col("skey"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  /** The whole maintained-manifest history replayed in SQL: append events
    * per phase (the ranged delete burns [100,300]'s slots — their P1/P2
    * events still rank, their docs just re-appear as phase-4 events),
    * per-shard rank over (phase, skey, doc_id), last event per doc wins. */
  val sv22Sql: String =
    """WITH k AS (SELECT doc_id,
      |    CAST(md5_number_lower('epoch0|' || CAST(doc_id AS VARCHAR))
      |         & 4611686018427387903 AS BIGINT) AS skey
      |  FROM documents),
      |ev AS (
      |  SELECT doc_id, skey, 1 AS ph FROM k WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT doc_id, skey, 2 FROM k WHERE doc_id % 3 = 1
      |  UNION ALL
      |  SELECT doc_id, skey, 4 FROM k
      |  WHERE doc_id % 3 = 2
      |     OR (doc_id BETWEEN 100 AND 300 AND doc_id % 3 <= 1)),
      |r AS (SELECT doc_id, skey, ph,
      |        CAST(skey % 16 AS INTEGER) AS shard,
      |        row_number() OVER (PARTITION BY skey % 16
      |          ORDER BY ph, skey, doc_id) AS pos
      |      FROM ev),
      |last AS (SELECT doc_id, max(ph) AS ph FROM ev GROUP BY doc_id)
      |SELECT r.doc_id, r.skey, r.shard, CAST(r.pos AS BIGINT) AS pos
      |FROM r JOIN last ON r.doc_id = last.doc_id AND r.ph = last.ph
      |ORDER BY shard, pos""".stripMargin

  /** Run `body` with adaptive query execution OFF, restoring the prior
    * setting after. Streaming micro-batches are WAVE-sized by admission
    * control (`maxRowsPerBatch` caps what a batch can hold), and the CDC
    * protocols' plans are already hand-shaped (broadcast semi-joins,
    * sliver reads); at that scale AQE's per-shuffle QueryStage
    * materialization barriers cost more scheduling wall than its
    * re-planning saves. Measured at sf0.1 (round 10, warm, local[32]):
    * sv14 11.9 s → 8.2 s (116 → 75 stages), sv4 4.1 → 3.0 s, sv6
    * 2.7 → 1.9 s. Batch analytics keep AQE (skew joins, coalescing
    * genuinely help at corpus scale); this wrapper scopes the trade to
    * the streaming entries only.
    *
    * Scope: only work that executes INSIDE `f` — the stream drains, which
    * are where all the micro-batch planning happens — runs AQE-off. The
    * returned DataFrame is the post-stream batch readback; when the caller
    * later executes it (Verify's write, Bench's count) AQE is back on,
    * which is the setting batch reads want anyway. The restore mutates
    * session conf, so entries must not run concurrently on one session —
    * Verify and Bench both run queries sequentially. */
  private def withoutAqe(
      f: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, dir) => {
      val k = "spark.sql.adaptive.enabled"
      val prev = s.conf.getOption(k)
      s.conf.set(k, "false")
      try f(s, dir)
      finally prev match {
        case Some(v) => s.conf.set(k, v)
        case None => s.conf.unset(k)
      }
    }

  private[graft] val sv23OrdSrcCatalog =
    """{"table":{"namespace":"default", "name":"kv_jv_ord_src"},
      |"rowkey":"key",
      |"columns":{
      |"o_orderkey":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"o_custkey":{"cf":"f", "col":"c", "type":"bigint"},
      |"price_c":{"cf":"f", "col":"p", "type":"bigint"}}}""".stripMargin
  private[graft] val sv23CustSrcCatalog =
    """{"table":{"namespace":"default", "name":"kv_jv_cust_src"},
      |"rowkey":"key",
      |"columns":{
      |"c_custkey":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"seg":{"cf":"f", "col":"s", "type":"string"}}}""".stripMargin
  /** Orders forward mirror: orderkey → custkey, the "which view row does
    * this order live under" lookup a tombstone (no payload) and a
    * custkey MOVE (old key unknowable from the new row) both need.
    * Logical death = custkey −1 (real custkeys are ≥ 0). */
  private[graft] val sv23OrdMirrorCatalog = sv23OrdSrcCatalog
    .replace("\"kv_jv_ord_src\"", "\"kv_jv_ord_mirror\"")
  /** Customer forward mirror: custkey → segment, the enrich lookup for
    * arriving orders. Logical death = empty segment. */
  private[graft] val sv23CustMirrorCatalog = sv23CustSrcCatalog
    .replace("\"kv_jv_cust_src\"", "\"kv_jv_cust_mirror\"")
  /** THE MAINTAINED VIEW — `orders ⋈ customer`, keyed `custkey ‖ orderkey`
    * (both Phoenix-coded, order-preserving). The key order is the
    * protocol's load-bearing decision: every customer-side delta touches
    * exactly its custkeys' PREFIX SLIVERS (an In pushdown on the leading
    * key part plans only those ranges), and every orders-side delta
    * addresses single rows by full key — so BOTH maintenance directions
    * are key-addressable and no delta ever scans the view. `seg` uses ''
    * as the logical NULL (the kv writer skips null cells, so a real null
    * could never overwrite a stale segment); `alive` 0 marks logically
    * dead rows (replay-safe retirement — physical deletes are
    * unrecoverable under as-of replay reads; compaction reclaims). */
  private[graft] val sv23ViewCatalog =
    """{"table":{"namespace":"default", "name":"kv_jv_view"},
      |"rowkey":"key1:key2",
      |"columns":{
      |"c_custkey":{"cf":"rowkey", "col":"key1", "type":"bigint", "coder":"Phoenix"},
      |"o_orderkey":{"cf":"rowkey", "col":"key2", "type":"bigint", "coder":"Phoenix"},
      |"price_c":{"cf":"f", "col":"p", "type":"bigint"},
      |"seg":{"cf":"f", "col":"s", "type":"string"},
      |"alive":{"cf":"f", "col":"a", "type":"int"}}}""".stripMargin

  /** Per-segment rollup of the maintained join — sv24's state: segment →
    * (n_orders, revenue_c), '' mapped to the `(none)` null bucket (an
    * empty rowkey is a region-boundary hazard, and the render wants a
    * printable bucket anyway). Two versions + logical zeros, like every
    * read-modify-write table here. */
  private[graft] val sv24AggCatalog =
    """{"table":{"namespace":"default", "name":"kv_jv_agg"},
      |"rowkey":"key",
      |"columns":{
      |"segment":{"cf":"rowkey", "col":"key", "type":"string"},
      |"n_orders":{"cf":"f", "col":"n", "type":"bigint"},
      |"revenue_c":{"cf":"f", "col":"r", "type":"bigint"}}}""".stripMargin

  /** Fold a batch's SIGNED per-segment deltas (`seg`, `dn` order count,
    * `dr` revenue cents) into the rollup table — sv21's count-merge
    * discipline applied to the join's GROUP BY: read current values
    * as-of `stamp` (≤ #segments rows, [[stringKeyLookup]] gates), add,
    * refuse NEGATIVE results inside the write expression (a negative
    * count or revenue means the decrement stream diverged from what was
    * added — the refused batch stays torn and replays after repair),
    * write zero-crossers as LOGICAL zeros at `stamp + 1`. */
  private def mergeSegDeltas(s: SparkSession, aggCatalog: String,
      deltas: DataFrame, stamp: Long): Unit = {
    val keyed = deltas
      .withColumn("segment",
        when(col("seg") === "", lit("(none)")).otherwise(col("seg")))
      .groupBy(col("segment"))
      .agg(sum(col("dn")).as("dn"), sum(col("dr")).as("dr"))
      .filter(col("dn") =!= 0 || col("dr") =!= 0)
      .persist()
    if (!keyed.isEmpty) {
      val current = stringKeyLookup(s, aggCatalog,
        keyed.select(col("segment")), "segment",
        extraOpts = Map("maxStamp" -> stamp.toString))
        .select(col("segment"), col("n_orders").as("cur_n"),
          col("revenue_c").as("cur_r"))
      val n = coalesce(col("cur_n"), lit(0L)) + col("dn")
      val r = coalesce(col("cur_r"), lit(0L)) + col("dr")
      keyed.join(current, Seq("segment"), "left")
        .select(col("segment"),
          when(n < 0 || r < 0, raise_error(concat(
            lit("mergeSegDeltas: rollup went NEGATIVE for segment '"),
            col("segment"),
            lit("' — refusing to persist corrupted aggregates"))))
            .otherwise(n).as("n_orders"),
          r.as("revenue_c"))
        .write.format("graft-kv")
        .options(Map("catalog" -> aggCatalog, "newtable" -> "4",
          "maxVersions" -> "2", "timestamp" -> (stamp + 1).toString,
          "minSplit" -> "0", "maxSplit" -> "z"))
        .mode("append").save()
    }
    keyed.unpersist(); ()
  }

  /** One CDC drain of the ORDERS side of join-view maintenance — half of
    * [[sv23StreamJoinView]]'s protocol (see there for the view design).
    * Per batch, everything is batch-proportional:
    *  1. the touched orders' OLD custkeys point-read from the orders
    *     mirror ([[mirrorLookup]] gates — never a corpus scan);
    *  2. rows whose view ADDRESS died (tombstone) or MOVED (custkey
    *     changed) retire as `alive = 0` cells at the old
    *     `(old_custkey, orderkey)` key;
    *  3. upserts enrich from the customer mirror (same gated point-read;
    *     an absent/dead customer enriches to the '' logical null — the
    *     LEFT-join semantics that let a later customer arrival repair
    *     the row in place) and land at `(custkey, orderkey)`;
    *  4. the orders mirror advances (tombstones become custkey −1).
    *
    * REPLAY SAFETY is [[maintainBigramCounts]]'s discipline verbatim:
    * state reads as-of `stamp`, writes at `stamp + 1`, two retained
    * versions on every read-back table, logical tombstones only. STAMPS
    * span TWO streams here, so per-batch ids alone cannot order them:
    * each drain gets a caller-allocated `drainBase` (monotone across the
    * interleaved schedule, constant across replays of the same drain —
    * the coordinator's epoch contract) and `stamp = drainBase +
    * (batchId + 1) × 10` keeps multi-batch catch-ups ordered within it.
    * `crashPoint` fires between the view write and the mirror advance —
    * the worst torn window (view already shows the new world, mirror
    * still claims the old). Returns the highest stamp written, or
    * Long.MinValue if nothing was admitted. */
  private[graft] def maintainJoinViewOrders(s: SparkSession, drainBase: Long,
      ckpt: String,
      srcCatalog: String = sv23OrdSrcCatalog,
      ordMirrorCatalog: String = sv23OrdMirrorCatalog,
      custMirrorCatalog: String = sv23CustMirrorCatalog,
      viewCatalog: String = sv23ViewCatalog,
      aggCatalog: Option[String] = None,
      maxRowsPerBatch: Option[Long] = None,
      crashPoint: () => Unit = () => ()): Long = {
    val highWrite = new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
    val srcOpts = Map("catalog" -> srcCatalog, "tombstones" -> "true") ++
      maxRowsPerBatch.map(n => "maxRowsPerBatch" -> n.toString)
    withDrainAqe(s) { // per-batch jobs are broadcasts/slivers: AQE only re-plans (see helper)
    val q = s.readStream.format("graft-kv").options(srcOpts).load()
      .writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val stamp = drainBase + (batchId + 1) * 10
        val asOf = Map("maxStamp" -> stamp.toString)
        val changed = b.select(col("o_orderkey"), col("o_custkey"),
          col("price_c"), col("_deleted")).persist()
        if (!changed.isEmpty) {
          val olds = mirrorLookup(s, ordMirrorCatalog, "",
            changed.select(col("o_orderkey")), idCol = "o_orderkey",
            extraOpts = asOf)
            .filter(col("o_custkey") >= 0) // −1 = logically dead (no view row)
            .select(col("o_orderkey"), col("o_custkey").as("old_custkey"))
          val j = changed.join(olds, Seq("o_orderkey"), "left").persist()
          // retire rows whose view ADDRESS vanished: deletes, and moves
          // (old address ≠ new — the re-keying case)
          val retire = j.filter(col("old_custkey").isNotNull &&
              (col("_deleted") || col("old_custkey") =!= col("o_custkey")))
            .select(col("old_custkey").as("c_custkey"), col("o_orderkey"),
              lit(0L).as("price_c"), lit("").as("seg"), lit(0).as("alive"))
          val ups = j.filter(!col("_deleted"))
          val segs = mirrorLookup(s, custMirrorCatalog, "",
            ups.select(col("o_custkey").as("c_custkey")), idCol = "c_custkey",
            extraOpts = asOf)
            .filter(length(col("seg")) > 0) // '' = logically dead customer
            .select(col("c_custkey").as("o_custkey"), col("seg"))
          val inserts = ups.join(segs, Seq("o_custkey"), "left")
            .select(col("o_custkey").as("c_custkey"), col("o_orderkey"),
              col("price_c"), coalesce(col("seg"), lit("")).as("seg"),
              lit(1).as("alive"))
          retire.unionByName(inserts)
            .write.format("graft-kv")
            .options(Map("catalog" -> viewCatalog, "newtable" -> "4",
              "maxVersions" -> "2", "timestamp" -> (stamp + 1).toString))
            .mode("append").save()
          // sv24's rollup delta: every touched order's OLD (price, seg)
          // decrements, every upsert's NEW increments. The old values'
          // only current truth is the VIEW row at the old address — read
          // as-of (so this batch's own view write above is invisible),
          // custkey prefix slivers pruned to the exact rows by the
          // address semi-join; cost is bounded by the wave's customers'
          // order fan-in, the inherent decrement cost of aggregate IVM
          // over a join
          aggCatalog.foreach { aggCat =>
            val oldAddr = j.filter(col("old_custkey").isNotNull)
              .select(col("old_custkey").as("c_custkey"), col("o_orderkey"))
            val oldRows = mirrorLookup(s, viewCatalog, "",
              oldAddr.select(col("c_custkey")), idCol = "c_custkey",
              extraOpts = asOf)
              .filter(col("alive") === 1)
              .join(oldAddr, Seq("c_custkey", "o_orderkey"), "leftsemi")
              .select(col("seg"), lit(-1L).as("dn"),
                (-col("price_c")).as("dr"))
            val newRows = inserts.select(col("seg"), lit(1L).as("dn"),
              col("price_c").as("dr"))
            mergeSegDeltas(s, aggCat, oldRows.unionByName(newRows), stamp)
          }
          crashPoint()
          changed.select(col("o_orderkey"),
              when(col("_deleted"), lit(-1L)).otherwise(col("o_custkey"))
                .as("o_custkey"))
            .write.format("graft-kv")
            .options(Map("catalog" -> ordMirrorCatalog, "newtable" -> "4",
              "maxVersions" -> "2", "timestamp" -> (stamp + 1).toString))
            .mode("append").save()
          highWrite.accumulateAndGet(stamp + 1, math.max)
          j.unpersist()
        }
        changed.unpersist()
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    } // withDrainAqe
    highWrite.get()
  }

  /** One CDC drain of the CUSTOMER side of join-view maintenance — the
    * other half of [[sv23StreamJoinView]]. A customer delta must repair
    * every view row under its custkey, and the view's `custkey ‖
    * orderkey` key makes that a PREFIX SLIVER read, not a scan: the
    * batch's custkeys push down as In point-ranges on the leading key
    * part ([[mirrorLookup]] gates), the affected rows rewrite in place
    * with the new segment, and a customer DEATH rewrites them to the ''
    * logical null (LEFT-join semantics — the orders survive their
    * customer, exactly what a later resurrection needs to repair). The
    * customer mirror advances last ([[maintainJoinViewOrders]]'s torn
    * window, same discipline, same `drainBase` stamp contract). */
  private[graft] def maintainJoinViewCustomer(s: SparkSession, drainBase: Long,
      ckpt: String,
      srcCatalog: String = sv23CustSrcCatalog,
      custMirrorCatalog: String = sv23CustMirrorCatalog,
      viewCatalog: String = sv23ViewCatalog,
      aggCatalog: Option[String] = None,
      maxRowsPerBatch: Option[Long] = None,
      crashPoint: () => Unit = () => ()): Long = {
    val highWrite = new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
    val srcOpts = Map("catalog" -> srcCatalog, "tombstones" -> "true") ++
      maxRowsPerBatch.map(n => "maxRowsPerBatch" -> n.toString)
    withDrainAqe(s) { // per-batch jobs are broadcasts/slivers: AQE only re-plans (see helper)
    val q = s.readStream.format("graft-kv").options(srcOpts).load()
      .writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val stamp = drainBase + (batchId + 1) * 10
        val asOf = Map("maxStamp" -> stamp.toString)
        val changed = b.select(col("c_custkey"), col("seg"), col("_deleted"))
          .persist()
        if (!changed.isEmpty) {
          // the affected view rows: THIS batch's custkey prefix slivers,
          // as-of pre-batch state (alive only — dead rows stay dead).
          // The rows carry their OLD segment — sv24's decrement side
          // comes for free from the repair read.
          val aff = mirrorLookup(s, viewCatalog, "",
            changed.select(col("c_custkey")), idCol = "c_custkey",
            extraOpts = asOf)
            .filter(col("alive") === 1)
            .select(col("c_custkey"), col("o_orderkey"), col("price_c"),
              col("seg").as("old_seg"))
          val segs = changed.select(col("c_custkey"),
            when(col("_deleted"), lit("")).otherwise(col("seg")).as("seg"))
          val rep = aff.join(segs, Seq("c_custkey")).persist()
          rep.select(col("c_custkey"), col("o_orderkey"), col("price_c"),
              col("seg"), lit(1).as("alive"))
            .write.format("graft-kv")
            .options(Map("catalog" -> viewCatalog, "newtable" -> "4",
              "maxVersions" -> "2", "timestamp" -> (stamp + 1).toString))
            .mode("append").save()
          // sv24's rollup: a segment change MOVES each repaired row's
          // contribution old_seg → seg; rows whose segment didn't change
          // cancel inside the merge's per-segment sum
          aggCatalog.foreach { aggCat =>
            mergeSegDeltas(s, aggCat,
              rep.select(col("old_seg").as("seg"), lit(-1L).as("dn"),
                  (-col("price_c")).as("dr"))
                .unionByName(rep.select(col("seg"), lit(1L).as("dn"),
                  col("price_c").as("dr"))), stamp)
          }
          crashPoint()
          segs.write.format("graft-kv")
            .options(Map("catalog" -> custMirrorCatalog, "newtable" -> "4",
              "maxVersions" -> "2", "timestamp" -> (stamp + 1).toString))
            .mode("append").save()
          highWrite.accumulateAndGet(stamp + 1, math.max)
          rep.unpersist()
        }
        changed.unpersist()
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    } // withDrainAqe
    highWrite.get()
  }

  /** sv23: INCREMENTALLY-MAINTAINED JOIN VIEW over TWO CDC streams — the
    * classic IVM problem (Δ(A ⋈ B) = ΔA ⋈ B ∪ A ⋈ ΔB, with deletes), as
    * a kv-backed materialized `orders ⋈ customer` view no delta ever
    * scans. Every prior sv protocol maintains state from ONE stream;
    * this is the two-stream class, and its whole design hangs on the
    * view key `custkey ‖ orderkey`: the orders side addresses single
    * rows by full key (old address from the orders mirror — the ΔA ⋈ B
    * direction enriches from the customer mirror's point-reads), while
    * the customer side repairs whole custkey PREFIX SLIVERS in place
    * (the A ⋈ ΔB direction — its "A" probe is the view itself, already
    * co-keyed, so no orders scan and no secondary index). LEFT-join
    * semantics (orders survive their customer as ''-segment rows) are
    * what make customer deletion and resurrection key-addressable too.
    *
    * Phases exercise every IVM move: customer load → orders load (enrich
    * on arrival) → an orders wave that MOVES %7 orders to new custkeys
    * (+1¢ — the re-keying case: retire old address, insert new) → a
    * ranged orders DELETE → a customer wave (segment updates + a ranged
    * customer DELETE orphaning its orders) → a partial customer
    * RESURRECTION (repairing orphans in place; custkeys 25–29 stay dead,
    * so the final answer keeps real orphans). Mid-schedule, compaction
    * ([[reclaimLogicalDead]]) reclaims retired view rows and dead mirror
    * rows behind the drain-derived fence. The final render reads the
    * alive view rows — the oracle recomputes the join from each table's
    * FINAL state, so maintenance must equal recomputation bit-for-bit. */
  /** The shared phase schedule of the join-view family (sv23's view,
    * sv24's rollup): customer load -> orders load -> %7 custkey MOVES
    * (+1 cent) -> ranged orders DELETE [100, 299] -> customer wave (%5
    * re-segmentations + custkey [10, 29] deaths) -> mid-schedule
    * compaction behind the drain-derived fence -> partial resurrection
    * ([10, 24] return; [25, 29] stay dead, keeping real LEFT-join
    * orphans). Tables are caller-named so sv23 and sv24 run isolated. */
  private def runJoinViewPhases(s: SparkSession, dir: String,
      ordCat: String, custCat: String, ordMir: String, custMir: String,
      viewCat: String, aggCat: Option[String]): Unit = {
    // the drains' shuffles are WAVE-sized (changed-order joins, per-batch
    // seg rollups) — 32 near-empty shuffle partitions per stage cost more
    // task-scheduling wall than they buy across 5 drains × ~30 jobs; 8 is
    // the same pin the memory-sink streams use. NEW in round 14: AQE off
    // for the same span — every one of the suite's ~100 batch jobs is
    // wave-sized (hinted broadcasts, bounded sliver reads, ≤ corpus/50
    // rows), so AdaptiveSparkPlan's per-job stage materialization and
    // re-planning buys nothing; measured on sv24 (the heaviest drain
    // suite): 27.8 → 18.5 s warm at sf0.1. This pin is deliberately NOT
    // applied to the other maintainers (sv12/14/18-22/25/26): their FIRST
    // batch is a corpus-sized load with real compute (shingling, PQ
    // encoding, bigram counting) where the 32-partition + AQE default is
    // the right plan — a blanket pin measured 2-6x slower there. A
    // production deployment sizes these to its wave volume via the
    // graft.stream.* confs, not its corpus.
    val shufK = "spark.sql.shuffle.partitions"
    val aqeK = "spark.sql.adaptive.enabled"
    val shufPrev = s.conf.getOption(shufK)
    val aqePrev = s.conf.get(aqeK)
    s.conf.set(shufK, s.conf.get("graft.stream.shufflePartitions", "8"))
    s.conf.set(aqeK, s.conf.get("graft.stream.aqe", "false"))
    try runJoinViewPhasesInner(s, dir, ordCat, custCat, ordMir, custMir,
      viewCat, aggCat)
    finally {
      s.conf.set(aqeK, aqePrev)
      shufPrev match {
        case Some(v) => s.conf.set(shufK, v)
        case None => s.conf.unset(shufK)
      }
    }
  }

  private def runJoinViewPhasesInner(s: SparkSession, dir: String,
      ordCat: String, custCat: String, ordMir: String, custMir: String,
      viewCat: String, aggCat: Option[String]): Unit = {
    import graft.datasource.FilterCompiler
    import graft.store.KvStore
    val ordBase = Tables.orders(s, dir).select(
      col("o_orderkey").cast("long").as("o_orderkey"),
      col("o_custkey").cast("long").as("o_custkey"),
      round(col("o_totalprice") * 100).cast("long").as("price_c"))
    val custBase = Tables.customer(s, dir).select(
      col("c_custkey").cast("long").as("c_custkey"),
      col("c_mktsegment").as("seg"))
    val maxOrd = ordBase.agg(max(col("o_orderkey"))).head().getLong(0)
    val maxCust = custBase.agg(max(col("c_custkey"))).head().getLong(0)
    val ordParsed = graft.catalog.GraftCatalog.parse(ordCat, Map.empty)
    val custParsed = graft.catalog.GraftCatalog.parse(custCat, Map.empty)
    def writeOrd(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> ordCat, "newtable" -> "4",
          "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> maxOrd.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    def writeCust(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> custCat, "newtable" -> "4",
          "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> maxCust.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    // fresh run; pre-create the state tables (first batches read all)
    (Seq(ordCat, custCat, ordMir, custMir, viewCat) ++ aggCat)
      .foreach(c => KvStore.drop(
        graft.catalog.GraftCatalog.parse(c, Map.empty).qualifiedName))
    ordBase.limit(0).select(col("o_orderkey"), col("o_custkey"))
      .write.format("graft-kv")
      .options(Map("catalog" -> ordMir, "newtable" -> "4",
        "maxVersions" -> "2", "timestamp" -> "1",
        "minSplitNum" -> "0", "maxSplitNum" -> maxOrd.toString))
      .mode("append").save()
    custBase.limit(0)
      .write.format("graft-kv")
      .options(Map("catalog" -> custMir, "newtable" -> "4",
        "maxVersions" -> "2", "timestamp" -> "1",
        "minSplitNum" -> "0", "maxSplitNum" -> maxCust.toString))
      .mode("append").save()
    s.range(0).select(lit(0L).as("c_custkey"), lit(0L).as("o_orderkey"),
        lit(0L).as("price_c"), lit("").as("seg"), lit(1).as("alive"))
      .write.format("graft-kv")
      .options(Map("catalog" -> viewCat, "newtable" -> "4",
        "maxVersions" -> "2", "timestamp" -> "1"))
      .mode("append").save()
    aggCat.foreach { ac =>
      s.range(0).select(lit("").as("segment"), lit(0L).as("n_orders"),
          lit(0L).as("revenue_c"))
        .write.format("graft-kv")
        .options(Map("catalog" -> ac, "newtable" -> "4",
          "maxVersions" -> "2", "timestamp" -> "1",
          "minSplit" -> "0", "maxSplit" -> "z"))
        .mode("append").save()
    }
    val ckptO = tempWorkDir(s, "graft-jv-ord-ckpt").toString
    val ckptC = tempWorkDir(s, "graft-jv-cust-ckpt").toString
    // the coordinator's epoch contract: each drain (either stream) gets a
    // monotone base; a replayed drain re-runs with ITS base
    var nextBase = 0L
    var committedWrite = 0L
    def drainO(): Unit = {
      nextBase += 100000L
      val w = maintainJoinViewOrders(s, nextBase, ckptO,
        ordCat, ordMir, custMir, viewCat, aggCat)
      if (w != Long.MinValue) committedWrite = math.max(committedWrite, w)
    }
    def drainC(): Unit = {
      nextBase += 100000L
      val w = maintainJoinViewCustomer(s, nextBase, ckptC,
        custCat, custMir, viewCat, aggCat)
      if (w != Long.MinValue) committedWrite = math.max(committedWrite, w)
    }
    // phase 1: customer dimension loads first
    writeCust(custBase, ts = 1000, overwrite = true)
    drainC()
    // phase 2: orders arrive, enriching from the customer mirror
    writeOrd(ordBase, ts = 2000, overwrite = true)
    drainO()
    // phase 3: %7 orders MOVE custkey (re-key: retire + insert) and gain
    // 1 cent; then a ranged orders DELETE [100, 299]. BOTH waves ride ONE
    // drain: the CDC window latest-merges per key, so a moved order inside
    // the deleted range arrives only as its tombstone (delete wins — the
    // exact mixed-batch path a real change feed produces), and the batch
    // carries moves, plain updates, and deletes at once
    writeOrd(ordBase.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), ((col("o_custkey") % 50) + 1).as("o_custkey"),
        (col("price_c") + 1).as("price_c")), ts = 3000, overwrite = false)
    val hrfO = FilterCompiler.compileAll(ordParsed, Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("o_orderkey", 100L),
      org.apache.spark.sql.sources.LessThanOrEqual("o_orderkey", 299L))).exactOrThrow("CDC DELETE")
    KvStore.table(ordParsed.qualifiedName).delete(hrfO.ranges, hrfO.pred, stamp = 4000)
    drainO()
    // phase 5: customer wave — %5 segments change; custkeys [10, 29] DIE
    // (their orders orphan to ''-segment rows, LEFT-join style)
    writeCust(custBase.filter(col("c_custkey") % 5 === 0)
      .withColumn("seg", lit("MOVED")), ts = 5000, overwrite = false)
    val hrfC = FilterCompiler.compileAll(custParsed, Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("c_custkey", 10L),
      org.apache.spark.sql.sources.LessThanOrEqual("c_custkey", 29L))).exactOrThrow("CDC DELETE")
    KvStore.table(custParsed.qualifiedName).delete(hrfC.ranges, hrfC.pred, stamp = 5100)
    drainC()
    // mid-schedule compaction behind the drain-derived fence: retired view
    // rows, dead mirror rows, and zero-crossed rollup rows die physically;
    // [25, 29]'s orphan rows are ALIVE ''-segment rows — compaction must
    // not touch them
    reclaimLogicalDead(s, viewCat, "c_custkey", col("alive") === 0,
      horizon = committedWrite, committedStamp = Some(committedWrite),
      extraKeyCols = Seq("o_orderkey"))
    reclaimLogicalDead(s, ordMir, "o_orderkey",
      col("o_custkey") < 0, horizon = committedWrite,
      committedStamp = Some(committedWrite))
    reclaimLogicalDead(s, custMir, "c_custkey",
      length(col("seg")) === 0, horizon = committedWrite,
      committedStamp = Some(committedWrite))
    aggCat.foreach { ac =>
      reclaimLogicalDead(s, ac, "segment", col("n_orders") === 0L,
        horizon = committedWrite, committedStamp = Some(committedWrite)); ()
    }
    // phase 6: partial resurrection — [10, 24] return with their original
    // segments and repair their orphaned orders in place; [25, 29] stay
    // dead, so the final answer keeps real LEFT-join orphans
    writeCust(custBase.filter(col("c_custkey") >= 10 && col("c_custkey") <= 24),
      ts = 6000, overwrite = false)
    drainC()
  }

  def sv23StreamJoinView(s: SparkSession, dir: String): DataFrame = {
    runJoinViewPhases(s, dir, sv23OrdSrcCatalog, sv23CustSrcCatalog,
      sv23OrdMirrorCatalog, sv23CustMirrorCatalog, sv23ViewCatalog,
      aggCat = None)
    // the maintained view, rendered: '' is the logical NULL segment
    s.read.format("graft-kv").option("catalog", sv23ViewCatalog).load()
      .filter(col("alive") === 1)
      .select(col("c_custkey"), col("o_orderkey"), col("price_c"),
        nullif(col("seg"), lit("")).as("segment"))
      .orderBy(col("c_custkey"), col("o_orderkey"))
  }

  /** sv24: INCREMENTALLY-MAINTAINED AGGREGATE over the maintained JOIN —
    * the full IVM stack: sv21 introduced the signed-delta aggregate, sv23
    * the two-stream join view; sv24 composes them into the rollup every
    * revenue dashboard actually serves (segment -> n_orders, revenue),
    * kept current as BOTH base tables change. Each orders batch
    * decrements the OLD (price, segment) — point-read from the view at
    * the old address, the only current truth once customers move — and
    * increments the new; each customer batch MOVES its repaired rows'
    * contributions between segments (the decrement rides the same prefix
    * sliver the repair already reads). Same phases as sv23 over its own
    * tables ([[runJoinViewPhases]]); the oracle recomputes the rollup
    * from final state, so maintenance must equal recomputation
    * bit-for-bit — including the `(none)` bucket of orders whose
    * customer stayed dead. */
  def sv24StreamJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val suf = "_rg"
    runJoinViewPhases(s, dir,
      sv23OrdSrcCatalog.replace("\"kv_jv_ord_src\"", s""""kv_jv_ord_src$suf""""),
      sv23CustSrcCatalog.replace("\"kv_jv_cust_src\"", s""""kv_jv_cust_src$suf""""),
      sv23OrdMirrorCatalog.replace("\"kv_jv_ord_mirror\"", s""""kv_jv_ord_mirror$suf""""),
      sv23CustMirrorCatalog.replace("\"kv_jv_cust_mirror\"", s""""kv_jv_cust_mirror$suf""""),
      sv23ViewCatalog.replace("\"kv_jv_view\"", s""""kv_jv_view$suf""""),
      aggCat = Some(sv24AggCatalog))
    s.read.format("graft-kv").option("catalog", sv24AggCatalog).load()
      .filter(col("n_orders") > 0)
      .select(col("segment"), col("n_orders"), col("revenue_c"))
      .orderBy(col("segment"))
  }

  /** sv24's oracle: the rollup recomputed from final state. */
  val sv24Sql: String =
    """WITH fo AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 7 = 0 THEN (o_custkey % 50) + 1
      |         ELSE o_custkey END AS c_custkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT)
      |      + CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END AS price_c
      |  FROM orders WHERE o_orderkey NOT BETWEEN 100 AND 299),
      |fc AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 5 = 0 AND c_custkey NOT BETWEEN 10 AND 24
      |         THEN 'MOVED' ELSE c_mktsegment END AS seg
      |  FROM customer WHERE c_custkey NOT BETWEEN 25 AND 29)
      |SELECT coalesce(fc.seg, '(none)') AS segment,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(fo.price_c) AS BIGINT) AS revenue_c
      |FROM fo LEFT JOIN fc USING (c_custkey)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** The final join recomputed from each table's FINAL state — maintenance
    * must equal recomputation bit-for-bit. */
  val sv23Sql: String =
    """WITH fo AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 7 = 0 THEN (o_custkey % 50) + 1
      |         ELSE o_custkey END AS c_custkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT)
      |      + CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END AS price_c
      |  FROM orders WHERE o_orderkey NOT BETWEEN 100 AND 299),
      |fc AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 5 = 0 AND c_custkey NOT BETWEEN 10 AND 24
      |         THEN 'MOVED' ELSE c_mktsegment END AS seg
      |  FROM customer WHERE c_custkey NOT BETWEEN 25 AND 29)
      |SELECT fo.c_custkey, fo.o_orderkey, fo.price_c, fc.seg AS segment
      |FROM fo LEFT JOIN fc USING (c_custkey)
      |ORDER BY fo.c_custkey, fo.o_orderkey""".stripMargin

  private[graft] val sv25SrcCatalog =
    sv18SrcCatalog.replace("\"kv_ann_src\"", "\"kv_ivfpq_src\"")
  private[graft] val sv25FwdCatalog =
    sv18SrcCatalog.replace("\"kv_ann_src\"", "\"kv_ivfpq_fwd\"")

  /** The LIVE IVF-PQ inverted file: kv32's layout under maintenance —
    * keyed `cell ‖ vec_id` so a probe list prunes the SCAN, covered by the
    * m PQ codes so a probe never touches another table and reads m ints
    * per candidate instead of the full vector (the IVFADC storage shape). */
  private[graft] val sv25CodesCatalog =
    """{"table":{"namespace":"default", "name":"kv_ivfpq_live"},
      |"rowkey":"cell:vid",
      |"columns":{
      |"cell":{"cf":"rowkey", "col":"cell", "type":"int"},
      |"vec_id":{"cf":"rowkey", "col":"vid", "type":"bigint"},
      |"codes":{"cf":"f", "col":"c", "avro":"pqCodes"}}}""".stripMargin

  /** One CDC drain of IVF-PQ inverted-file maintenance — [[maintainAnnIndex]]'s
    * protocol (retire-old-cell-first via the forward mirror, deletes-at-T /
    * puts-at-T+1) with the covered column PQ-ENCODED instead of raw: an
    * updated vector may move cell (re-key) AND re-code, a tombstone retires
    * its `cell ‖ vec_id` row by re-deriving the old cell from the mirror.
    * Same replay-safety argument as sv18 (retirement runs first against the
    * pre-batch mirror; re-running a torn batch no-ops the retire and lands
    * identical writes). Factored so the randomized differential drives
    * arbitrary schedules with its own catalogs. */
  private[graft] def maintainIvfPqIndex(s: SparkSession, srcCatalog: String,
      fwdCatalog: String, codesCatalog: String, cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]], maxId: Long, ckpt: String,
      phaseStamp: Long, crashPoint: () => Unit = () => ()): Unit =
    maintainCellKeyedIndex(s, srcCatalog, fwdCatalog, codesCatalog, cents,
      maxId, ckpt, phaseStamp,
      // the fresh inverted-file rows carry cell assignment + m PQ codes,
      // one map-only pass against broadcast centroid/codebook literals
      covered = vec => Seq(
        graft.pipeline.Similarity.pqCodes(vec, books).as("codes")),
      idxOpts = Map("pqCodes" -> sv20AvroCodes), crashPoint)

  /** sv25: INCREMENTAL IVF-PQ MAINTENANCE over CDC — the streaming twin of
    * kv32 and the composition closing the ANN-maintenance family: sv18
    * maintains the coarse inverted file (full vectors), sv20 maintains the
    * flat PQ code table (no cells); sv25 maintains the COMPOSED layout a
    * production billion-vector service actually serves from — `cell ‖
    * vec_id → m codes` — under inserts, corrections that MOVE cells, ranged
    * deletes, and resurrections (sv18's four phases verbatim). The final
    * search is kv32's read path over the MAINTAINED table: probe cells
    * pushed as leading-key In slivers, reconstruction from the covered
    * codes, px61's arithmetic — so maintenance must equal the one-shot
    * snapshot bit-for-bit and the oracle IS px61's rendered SQL (the
    * kv32/px57 shared-string precedent). */
  def sv25StreamIvfPq(s: SparkSession, dir: String): DataFrame = {
    import graft.datasource.FilterCompiler
    import graft.store.KvStore
    val cents = Pipeline.ivfCentroidsFor(s, dir)
    val books = Pipeline.pqCodebooksFor(s, dir)
    val base = Tables.embeddings(s, dir)
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val maxId = base.agg(max(col("vec_id"))).head().getLong(0)
    val srcParsed = graft.catalog.GraftCatalog.parse(sv25SrcCatalog, Map.empty)
    val fwdParsed = graft.catalog.GraftCatalog.parse(sv25FwdCatalog, Map.empty)
    val codesParsed = graft.catalog.GraftCatalog.parse(sv25CodesCatalog, Map.empty)
    def writeSrc(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
      df.write.format("graft-kv")
        .options(Map("catalog" -> sv25SrcCatalog, "annVec" -> sv18AvroVec,
          "newtable" -> "4", "timestamp" -> ts.toString,
          "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
        .mode(if (overwrite) "overwrite" else "append").save()
    val ckpt = tempWorkDir(s, "graft-sv25-ckpt").toString
    def applyBatch(phaseStamp: Long): Unit =
      maintainIvfPqIndex(s, sv25SrcCatalog, sv25FwdCatalog, sv25CodesCatalog,
        cents, books, maxId, ckpt, phaseStamp)
    // fresh run every invocation
    Seq(fwdParsed, codesParsed).foreach(p => KvStore.drop(p.qualifiedName))
    // g0: corrupted first generation — reversed vectors land in wrong
    // cells WITH wrong codes, so the correction must re-key and re-code
    writeSrc(base.filter(col("vec_id") % 3 === 0)
      .withColumn("embedding", reverse(col("embedding"))), ts = 1000, overwrite = true)
    applyBatch(phaseStamp = 10)
    // g1: second generation + the corrected first generation (re-keying)
    writeSrc(base.filter(col("vec_id") % 3 <= 1), ts = 2000, overwrite = false)
    applyBatch(phaseStamp = 20)
    // ranged DELETE — tombstones retire inverted-file rows
    val hrf = FilterCompiler.compileAll(srcParsed, Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("vec_id", 30L),
      org.apache.spark.sql.sources.LessThanOrEqual("vec_id", 90L))).exactOrThrow("CDC DELETE")
    KvStore.table(srcParsed.qualifiedName).delete(hrf.ranges, hrf.pred, stamp = 3000)
    applyBatch(phaseStamp = 30)
    // g2: last generation + resurrection of the deleted range
    writeSrc(base.filter(col("vec_id") % 3 === 2 ||
      (col("vec_id") >= 30 && col("vec_id") <= 90)), ts = 4000, overwrite = false)
    applyBatch(phaseStamp = 40)
    // kv32's serving read over the MAINTAINED table: probe cells pushed as
    // leading-key In slivers (<= queries x nprobe ids, control-sized)
    val queries = Tables.embeddings(s, dir).filter(col("vec_id") < 10)
    val probed = queries
      .select(explode(graft.functions.VectorExprs.nearestCentroids(
        col("embedding"), cents, 4)).as("cell"))
      .distinct().collect().map(_.getInt(0)).sorted
    val kv = s.read.format("graft-kv")
      .options(Map("catalog" -> sv25CodesCatalog, "pqCodes" -> sv20AvroCodes)).load()
      .filter(col("cell").isin(probed.map(Int.box): _*))
    graft.pipeline.Similarity.ivfPqTopK(cents, books, queries, kv,
      "vec_id", "embedding", k = 5, nprobe = 4)
      .orderBy(col("query_id"), col("rank"))
  }

  // ---- sv26: CDC-maintained transitive-closure view (q27 in the store) ----

  private[graft] val sv26SrcCatalog =
    """{"table":{"namespace":"default", "name":"kv_sess_src"},
      |"rowkey":"key",
      |"columns":{
      |"event_id":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"user_id":{"cf":"f", "col":"u", "type":"bigint"},
      |"tu":{"cf":"f", "col":"t", "type":"bigint"}}}""".stripMargin
  private[graft] val sv26FwdCatalog =
    """{"table":{"namespace":"default", "name":"kv_sess_fwd"},
      |"rowkey":"key",
      |"columns":{
      |"event_id":{"cf":"rowkey", "col":"key", "type":"bigint"},
      |"user_id":{"cf":"f", "col":"u", "type":"bigint"}}}""".stripMargin
  private[graft] val sv26ViewCatalog =
    """{"table":{"namespace":"default", "name":"kv_sess_view"},
      |"rowkey":"key1:key2",
      |"columns":{
      |"user_id":{"cf":"rowkey", "col":"key1", "type":"bigint"},
      |"event_id":{"cf":"rowkey", "col":"key2", "type":"bigint"},
      |"tu":{"cf":"f", "col":"t", "type":"bigint"},
      |"session_root":{"cf":"f", "col":"r", "type":"bigint"}}}""".stripMargin

  /** One CDC drain of session-root maintenance — the per-batch protocol of
    * [[sv26StreamSessionRoots]], factored out so the randomized
    * differential drives arbitrary put/move/delete/resurrect schedules
    * through the exact production path.
    *
    * The maintained state is q27's TRANSITIVE CLOSURE (event → session
    * root), kept current from the batch delta and the view itself — the
    * maintainer never re-reads the source corpus:
    *  1. touched users = every batch event's OLD owner (forward-mirror
    *     lookup — a user MOVE retires the old chain too) plus every put's
    *     new owner; both lookups go through [[mirrorLookup]], so
    *     wave-sized key sets push as In (point gets / prefix slivers)
    *     under its shared small-state and cost-model gates, and
    *     oversized ones semi-join;
    *  2. the touched users' current chains load from the VIEW (user-led
    *     composite key: the pushed user-In plans one prefix sliver per
    *     touched user), batch keys are dropped, puts merged in; the
    *     sliver is LOCAL-CHECKPOINTED eagerly — the retire below deletes
    *     the very rows it came from, and a lazily-cached block that fell
    *     out under memory pressure would silently recompute `kept` from
    *     the post-retire (emptied) table;
    *  3. per-user chains are LINEAR, so each touched user's closure is ONE
    *     window pass: a session head is an event with no ≤12h predecessor
    *     and every event's root is the latest head at or before it — the
    *     same fixpoint q27's recursive UnionLoop reaches, reduced to a
    *     single pass by the chain shape (recursion earns its keep on DAGs;
    *     maintenance earns its keep by touching only changed chains);
    *  4. retire-at-T / rewrite-at-T+1 (the sv18 discipline) for both the
    *     view slivers and the forward-mirror rows.
    * Work is proportional to the touched users' event counts — at 100 TB a
    * wave touches a sliver of users and the view read prunes to their key
    * prefixes; nothing corpus-sized moves and nothing rides the driver. */
  private[graft] def maintainSessionRoots(s: SparkSession, srcCat: String,
      fwdCat: String, viewCat: String, ckpt: String, phaseStamp: Long,
      smallStateRows: Long = SmallStateRows): Unit = {
    import graft.store.KvStore
    import org.apache.spark.sql.expressions.Window
    val fwdName = graft.catalog.GraftCatalog.parse(fwdCat, Map.empty).qualifiedName
    val viewName = graft.catalog.GraftCatalog.parse(viewCat, Map.empty).qualifiedName
    val stream = s.readStream.format("graft-kv")
      .option("catalog", srcCat).option("tombstones", "true").load()
    withDrainAqe(s) { // per-batch jobs are broadcasts/slivers: AQE only re-plans (see helper)
    val q = stream.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val changed = df.select(col("event_id"), col("user_id"), col("tu"),
          col("_deleted")).cache()
        if (!changed.isEmpty) {
          val haveFwd = KvStore.exists(fwdName)
          val haveView = KvStore.exists(viewName)
          val batchKeys = changed.select("event_id").distinct()
          val puts = changed.filter(!col("_deleted"))
          // the wave's mirror rows, read ONCE through the shared bounded-In
          // lookup (point gets for wave-sized batches, semi-join fallback)
          // and local-checkpointed: both the owner derivation AND the
          // retire below read these rows, and the retire destroys them —
          // eager materialization makes read-before-delete actual instead
          // of cache-dependent
          val fwdHits =
            if (haveFwd) mirrorLookup(s, fwdCat, "", batchKeys, "event_id",
              smallStateRows).localCheckpoint()
            else null
          val owners =
            if (fwdHits != null) fwdHits.select("user_id")
            else puts.select("user_id").limit(0)
          val touched = puts.select("user_id").union(owners).distinct()
          val oldView =
            if (haveView) mirrorLookup(s, viewCat, "", touched, "user_id",
              smallStateRows).localCheckpoint()
            else null
          val kept =
            if (oldView == null) puts.select("user_id", "event_id", "tu").limit(0)
            else oldView.select("user_id", "event_id", "tu")
              .join(broadcast(batchKeys), Seq("event_id"), "left_anti")
              // a using-join REORDERS output columns (join key first) —
              // re-pin the order; the union below is by NAME anyway,
              // belt-and-braces after this exact swap bit once
              .select("user_id", "event_id", "tu")
          val merged = kept.unionByName(puts.select("user_id", "event_id", "tu"))
          val w = Window.partitionBy(col("user_id")).orderBy(col("tu"), col("event_id"))
          val roots = merged
            .withColumn("gap", col("tu") - lag(col("tu"), 1).over(w))
            .withColumn("head",
              when(col("gap").isNull || col("gap") > 43200L, col("event_id")))
            .withColumn("session_root", last(col("head"), ignoreNulls = true)
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .select(col("user_id"), col("event_id"), col("tu"), col("session_root"))
          if (oldView != null) {
            oldView.select("user_id", "event_id")
              .write.format("graft-kv")
              .options(Map("catalog" -> viewCat, "delete" -> "true",
                "timestamp" -> phaseStamp.toString))
              .mode("append").save()
          }
          roots.write.format("graft-kv")
            .options(Map("catalog" -> viewCat, "newtable" -> "4",
              "maxVersions" -> "2", "timestamp" -> (phaseStamp + 1).toString))
            .mode("append").save()
          if (fwdHits != null) {
            fwdHits.select("event_id")
              .write.format("graft-kv")
              .options(Map("catalog" -> fwdCat, "delete" -> "true",
                "timestamp" -> phaseStamp.toString))
              .mode("append").save()
          }
          puts.select("event_id", "user_id")
            .write.format("graft-kv")
            .options(Map("catalog" -> fwdCat, "newtable" -> "4",
              "maxVersions" -> "2", "timestamp" -> (phaseStamp + 1).toString))
            .mode("append").save()
          // fwdHits/oldView are local checkpoints — their blocks release
          // with the dataset (ContextCleaner), no unpersist to call
          ()
        }
        changed.unpersist()
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    } // withDrainAqe
  }

  /** sv26: the MAINTAINED transitive closure — q27's session-root view
    * lifted into the store and kept current under CDC (the composition the
    * r13 verdict's stretch item names). Waves: full load → time-shift of
    * the %11 events (chains re-link) → ONE mixed batch of a ranged delete
    * [300, 599] with %5 resurrections (latest-merge: survivors arrive as
    * puts, the rest as tombstones; deleting chain middles HEALS or SPLITS
    * sessions depending on the bridged gap). The oracle recomputes session
    * roots from the final state with q27's RECURSIVE SQL — maintenance
    * must equal the recursive fixpoint bit-for-bit. */
  def sv26StreamSessionRoots(s: SparkSession, dir: String): DataFrame = {
    import graft.datasource.FilterCompiler
    import graft.store.KvStore
    // wave-sized drains: same shuffle pin as the other CDC maintainers
    val shufK = "spark.sql.shuffle.partitions"
    val shufPrev = s.conf.getOption(shufK)
    s.conf.set(shufK, "8")
    try {
      val base = Tables.events(s, dir).select(
        col("event_id").cast("long").as("event_id"),
        col("user_id").cast("long").as("user_id"),
        unix_seconds(col("ts")).cast("long").as("tu"))
      val maxId = base.agg(max(col("event_id"))).head().getLong(0)
      val srcParsed = graft.catalog.GraftCatalog.parse(sv26SrcCatalog, Map.empty)
      def writeSrc(df: DataFrame, ts: Long, overwrite: Boolean): Unit =
        df.write.format("graft-kv")
          .options(Map("catalog" -> sv26SrcCatalog, "newtable" -> "4",
            "timestamp" -> ts.toString,
            "minSplitNum" -> "0", "maxSplitNum" -> maxId.toString))
          .mode(if (overwrite) "overwrite" else "append").save()
      val ckpt = tempWorkDir(s, "graft-sv26-ckpt").toString
      def drain(stamp: Long): Unit = maintainSessionRoots(s, sv26SrcCatalog,
        sv26FwdCatalog, sv26ViewCatalog, ckpt, stamp)
      // fresh run every invocation
      Seq(sv26SrcCatalog, sv26FwdCatalog, sv26ViewCatalog).foreach(c =>
        KvStore.drop(graft.catalog.GraftCatalog.parse(c, Map.empty).qualifiedName))
      writeSrc(base, ts = 1000, overwrite = true)
      drain(10)
      // wave 2: %11 events move +50000 s — their users' chains re-link
      writeSrc(base.filter(col("event_id") % 11 === 0)
        .withColumn("tu", col("tu") + 50000L), ts = 2000, overwrite = false)
      drain(30)
      // wave 3, ONE mixed batch: ranged delete + partial resurrection
      val hrf = FilterCompiler.compileAll(srcParsed, Seq(
        org.apache.spark.sql.sources.GreaterThanOrEqual("event_id", 300L),
        org.apache.spark.sql.sources.LessThanOrEqual("event_id", 599L)))
        .exactOrThrow("CDC DELETE")
      KvStore.table(srcParsed.qualifiedName).delete(hrf.ranges, hrf.pred, stamp = 3000)
      writeSrc(base
        .filter(col("event_id").between(300L, 599L) && col("event_id") % 5 === 0)
        .withColumn("tu", when(col("event_id") % 11 === 0, col("tu") + 50000L)
          .otherwise(col("tu"))), ts = 4000, overwrite = false)
      drain(50)
      s.read.format("graft-kv").option("catalog", sv26ViewCatalog).load()
        .select(col("event_id"), col("session_root"))
        .orderBy(col("event_id"))
    } finally shufPrev match {
      case Some(v) => s.conf.set(shufK, v)
      case None => s.conf.unset(shufK)
    }
  }

  /** sv26's oracle: q27's RECURSIVE closure over the reconstructed final
    * state — the maintained view must equal the recursive fixpoint. */
  val sv26Sql: String =
    """WITH RECURSIVE ev AS (
      |  SELECT event_id, user_id,
      |    CASE WHEN event_id % 11 = 0 THEN tu0 + 50000 ELSE tu0 END AS tu
      |  FROM (SELECT event_id, user_id,
      |          CAST(floor(epoch(ts)) AS BIGINT) AS tu0 FROM events) b
      |  WHERE event_id < 300 OR event_id > 599 OR event_id % 5 = 0),
      |e AS (SELECT event_id AS a,
      |        lag(event_id) OVER (PARTITION BY user_id ORDER BY tu, event_id) AS b,
      |        tu - lag(tu) OVER (PARTITION BY user_id ORDER BY tu, event_id) AS gap
      |      FROM ev),
      |edges AS (SELECT a, b FROM e WHERE b IS NOT NULL AND gap <= 43200),
      |reach(a, root) AS (
      |  SELECT a, b FROM edges
      |  UNION ALL
      |  SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.root = e2.a),
      |comp AS (
      |  SELECT r.a, r.root FROM reach r
      |  LEFT JOIN edges h ON r.root = h.a WHERE h.a IS NULL)
      |SELECT ev.event_id, coalesce(c.root, ev.event_id) AS session_root
      |FROM ev LEFT JOIN comp c ON ev.event_id = c.a
      |ORDER BY ev.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map[
      String, (SparkSession, String) => DataFrame](
    "sv1_stream_dedup"      -> (sv1StreamDedup _),
    "sv2_stream_sessionize" -> (sv2StreamSessionize _),
    "sv3_stream_kv_sink"    -> (sv3StreamKvSink _),
    "sv4_stream_interval_join" -> (sv4StreamIntervalJoin _),
    "sv5_stream_static_join" -> (sv5StreamStaticJoin _),
    "sv6_stream_window_agg" -> (sv6StreamWindowAgg _),
    "sv7_stream_anomaly"    -> (sv7StreamAnomaly _),
    "sv8_stream_transitions" -> (sv8StreamTransitions _),
    "sv9_stream_funnel"     -> (sv9StreamFunnel _),
    "sv10_stream_kv_source" -> (sv10StreamKvSource _),
    "sv11_stream_cdc_tombstones" -> (sv11StreamCdcTombstones _),
    "sv12_stream_cdc_index"     -> (sv12StreamCdcIndex _),
    "sv13_stream_capped_catchup" -> (sv13StreamCappedCatchup _),
    "sv14_stream_incr_neardup"   -> (sv14StreamIncrNeardup _),
    "sv15_stream_cdc_lakehouse"  -> (sv15StreamCdcLakehouse _),
    "sv16_stream_ohlc"           -> (sv16StreamOhlc _),
    "sv17_stream_mixture_stats"  -> (sv17StreamMixtureStats _),
    "sv18_stream_ann_ivf"        -> (sv18StreamAnnIvf _),
    "sv19_stream_decontam"       -> (sv19StreamDecontam _),
    "sv20_stream_pq_codes"       -> (sv20StreamPqCodes _),
    "sv21_stream_bigram_lm"      -> (sv21StreamBigramLm _),
    "sv22_stream_shard_manifest" -> (sv22StreamShardManifest _),
    "sv23_stream_join_view"      -> (sv23StreamJoinView _),
    "sv24_stream_join_agg"       -> (sv24StreamJoinAgg _),
    "sv25_stream_ivfpq"          -> (sv25StreamIvfPq _),
    "sv26_stream_session_roots"  -> (sv26StreamSessionRoots _),
  ).view.mapValues(withoutAqe).toMap

  val oracles: Map[String, String] = Map(
    "sv1_stream_dedup"      -> sv1Sql,
    "sv2_stream_sessionize" -> sv2Sql,
    "sv3_stream_kv_sink"    -> sv3Sql,
    "sv4_stream_interval_join" -> sv4Sql,
    "sv5_stream_static_join" -> sv5Sql,
    "sv6_stream_window_agg" -> sv6Sql,
    "sv7_stream_anomaly"    -> sv7Sql,
    "sv8_stream_transitions" -> sv8Sql,
    "sv9_stream_funnel"     -> sv9Sql,
    "sv10_stream_kv_source" -> sv10Sql,
    "sv11_stream_cdc_tombstones" -> sv11Sql,
    "sv12_stream_cdc_index"     -> sv12Sql,
    "sv13_stream_capped_catchup" -> sv13Sql,
    "sv14_stream_incr_neardup"   -> Pipeline.px7Sql,
    "sv15_stream_cdc_lakehouse"  -> sv15Sql,
    "sv16_stream_ohlc"           -> sv16Sql,
    "sv17_stream_mixture_stats"  -> sv17Sql,
    "sv19_stream_decontam"       -> sv19Sql,
    // sv21's phases converge to the ORIGINAL corpus, so incremental
    // maintenance must reproduce the batch LM exactly — px30's SQL is
    // the oracle, same pattern as sv14 → px7
    "sv21_stream_bigram_lm"      -> Pipeline.px30Sql,
    "sv22_stream_shard_manifest" -> sv22Sql,
    "sv23_stream_join_view"      -> sv23Sql,
    "sv24_stream_join_agg"       -> sv24Sql,
    "sv26_stream_session_roots"  -> sv26Sql,
  )
}
