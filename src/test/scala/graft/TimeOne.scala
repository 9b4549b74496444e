package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: runMain graft.TimeOne <sfDir> <name> [name...]
  * (test scope — not part of the shipped library). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions) // parity with Verify/Bench
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    try SparkEntry.queries("q9_count")(spark, sfDir).count() catch { case _: Throwable => }
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIMED $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
