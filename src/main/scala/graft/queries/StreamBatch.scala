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

  /** Stream the events parquet through a fresh file-source dir (the parquet
    * file is copied so the source directory contains exactly one file). */
  private def eventStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = Files.createTempDirectory("graft-sv-src")
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      src.resolve("events.parquet"))
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    Tables.normalizeEventTs(s.readStream.schema(schema).parquet(src.toString))
  }

  private def runToMemory(df: DataFrame, name: String, mode: String): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sv1_stream_dedup"      -> (sv1StreamDedup _),
    "sv2_stream_sessionize" -> (sv2StreamSessionize _),
  )

  val oracles: Map[String, String] = Map(
    "sv1_stream_dedup"      -> sv1Sql,
    "sv2_stream_sessionize" -> sv2Sql,
  )
}
