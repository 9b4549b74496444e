package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` plans for named queries to files —
  * the plans/r{N}/ optimization-round deliverable.
  * runMain graft.PlanDump <sfDir> <outDir> <name> [name...]
  * (test scope — not part of the shipped library). Queries that execute
  * eagerly inside their builder (q27's checkpointed recursion) dump the
  * underlying lazy frame so the file shows the plan that actually ran. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    Files.createDirectories(Paths.get(outDir))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).foreach { name =>
      val df = name match {
        case "q27_recursive_cte" =>
          graft.queries.Relational.q27Recursion(spark, sfDir)
        case n => SparkEntry.queries(n)(spark, sfDir)
      }
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"$name.txt"), plan)
      println(s"PLAN $name -> $outDir/$name.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
