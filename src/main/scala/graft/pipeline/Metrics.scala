package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Logging bridge for in-plan observability: operators attach named metric
  * aggregates with `Dataset.observe` (computed inline by the CollectMetrics
  * operator — ZERO extra Spark jobs, unlike a driver-side pre-count), and
  * this listener logs any non-zero `graft.*` metrics when the consuming
  * action finishes. This is how the LSH bucket caps stay "never silent"
  * without paying a separate statistics job per operator invocation. */
object GraftMetrics {

  /** Bounded wait on an [[org.apache.spark.sql.Observation]]'s value —
    * the shared guard against Spark's async listener bus DROPPING events
    * under saturation (logged, non-fatal), where a bare `obs.get` after
    * the action would block forever. The caller must have already run
    * the observed action; 10 s is orders beyond listener-bus latency, so
    * the fallback only fires on a genuinely dropped event. Lives here
    * (the observability module) because it has nothing to do with any
    * one consumer — dedup's collapse census and the compaction fence
    * both ride it. */
  private[graft] def observedLongOr(obs: org.apache.spark.sql.Observation,
      key: String)(fallback: => Long): Long =
    try {
      import scala.concurrent.duration._
      val row = scala.concurrent.Await.result(obs.future, 10.seconds)
      row.getAs[Long](row.fieldIndex(key))
    } catch { case _: java.util.concurrent.TimeoutException => fallback }

  @transient private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotently register the metrics-logging listener on a session. */
  def ensureListener(s: SparkSession): Unit = if (registered.add(s)) {
    s.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft.capBuckets.")) {
            val hot = row.getAs[Long]("hot_buckets")
            val dropped = row.getAs[Long]("dropped_entries")
            if (hot > 0) log.warn(
              s"$name: capped $hot hot buckets (${dropped} entries dropped — " +
                "likely boilerplate collisions; raise maxBucket to trade " +
                "candidate volume for recall)")
          }
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    })
  }
}
