package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  * All query entry points take an `sfDir` like `/root/testdata/sf0.01`.
  */
object Tables {
  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses natively:
    * read it as nanos-long and truncate to a microsecond timestamp (exact
    * integer division — no double rounding). */
  def normalizeEventTs(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df

  def lineitem(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = apply(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "region")
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(apply(s, dir, "events"))
  }
  def documents(s: SparkSession, dir: String): DataFrame = apply(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = apply(s, dir, "embeddings")
}
