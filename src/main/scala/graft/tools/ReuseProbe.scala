package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: does the executed (AQE-final) plan of a query reuse
  * exchanges/stages? Prints the relevant node names.
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    val ep = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(ep).length
    val reused = "ReusedExchange".r.findAllIn(ep).length +
      "ReusedQueryStage".r.findAllIn(ep).length
    println(s"[reuse] $name: scans=$scans reusedNodes=$reused")
    spark.stop()
  }
}
