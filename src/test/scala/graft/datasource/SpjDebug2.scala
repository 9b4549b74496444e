package graft.datasource

import org.apache.spark.sql.SparkSession

object SpjDebug2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.catalog.graft", classOf[GraftTableCatalog].getName)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("""CREATE TABLE graft.default.spj_a (k BIGINT, a STRING)
      |TBLPROPERTIES ('rowkey' = 'k', 'saltBuckets' = '8')""".stripMargin)
    spark.range(0, 500).selectExpr("id AS k", "concat('a', CAST(id AS STRING)) AS a")
      .createOrReplaceTempView("src")
    spark.sql("INSERT INTO graft.default.spj_a SELECT * FROM src")
    val agg = spark.sql("SELECT k, count(*) AS n, max(a) AS ma FROM graft.default.spj_a GROUP BY k")
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val qe = agg.queryExecution
    println("=== optimized ===\n" + qe.optimizedPlan.treeString.take(1500))
    val scans = qe.executedPlan.collect { case b: BatchScanExec => b } ++
      (qe.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.inputPlan.collect { case b: BatchScanExec => b }
        case _ => Nil
      })
    scans.foreach { b =>
      println("scan: " + b.scan.description())
      println("reported: " + b.scan.asInstanceOf[GraftScan].outputPartitioning())
      println("keyGroupedPartitioning: " + b.keyGroupedPartitioning)
      println("exec outputPartitioning: " + b.outputPartitioning)
    }
    spark.stop()
  }
}
