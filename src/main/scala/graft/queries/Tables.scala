package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  * All query entry points take an `sfDir` like `/root/testdata/sf0.01`.
  */
object Tables {
  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

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
