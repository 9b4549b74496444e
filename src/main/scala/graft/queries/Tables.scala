package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  * All query entry points take an `sfDir` like `/root/testdata/sf0.01`.
  */
object Tables {
  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = apply(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "region")
  def events(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "events")
  def documents(s: SparkSession, dir: String): DataFrame = apply(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = apply(s, dir, "embeddings")
}
