package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  * All query entry points take an `sfDir` like `/root/testdata/sf0.01`.
  */
object Tables {
  /** Resolved-relation cache: `spark.read.parquet` re-runs file listing and
    * a driver-side schema-inference job (a visible 35-50 ms single-task
    * stage) on EVERY call, which the round-13 phase profile measured as
    * 100-200 ms of fixed per-query cost — the dominant driver-side share
    * of a cheap query's wall. The corpus parquet is immutable within a
    * run, so the resolved DataFrame (an immutable logical plan) is reused
    * per (session, dir, table). Keyed on the session so test suites with
    * their own sessions never share plans. LRU-BOUNDED: each entry pins
    * its session's whole state graph (SessionState, catalog, file index)
    * through the cached plan, so an unbounded map would leak every
    * stopped test session — the cap holds the ~10 corpus tables for a
    * handful of live sessions and quietly evicts dead ones (the same
    * discipline as Dedup's plan-keyed stat cache). */
  private val CacheMax = 64
  private val resolved = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(SparkSession, String, String), DataFrame](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String, String), DataFrame]): Boolean =
        size() > CacheMax
    })

  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    resolved.computeIfAbsent((s, dir, name),
      _ => s.read.parquet(s"$dir/$name.parquet"))

  /** events.ts has shifted representation across corpus generations:
    * TIMESTAMP(NANOS) (Spark 4 refuses natively — read as nanos-long under
    * `nanosAsLong` and truncated to micros by exact integer division), and
    * naive micros (TIMESTAMP_NTZ). Both normalize to a session-TZ TIMESTAMP
    * carrying the same epoch micros: the container and the DuckDB oracle's
    * naive-timestamp interpretation are both UTC (pinned on the session in
    * [[events]]), so the NTZ→LTZ cast is epoch-exact. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", df.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def lineitem(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = apply(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "region")
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    normalizeEventTs(apply(s, dir, "events"))
  }
  def documents(s: SparkSession, dir: String): DataFrame = apply(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = apply(s, dir, "embeddings")
}
