package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev helper: run a single SparkEntry query with timing + formatted plan.
  * Usage: runMain graft.tools.RunOne <queryName> [sfDir] [explain]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    if (args.length > 2 && args(2) == "explain") df.explain("formatted")
    var last = 0L
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      last = df.count()
      println(s"[runone] pass $i: ${(System.nanoTime() - t0) / 1e9}%s sec, $last rows")
    }
    spark.stop()
  }
}
