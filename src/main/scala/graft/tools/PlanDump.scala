package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for every query matching a regex into
  * <outDir>/<name>.txt — the before/after plan evidence files the
  * optimization rounds commit under plans/rNN/.
  * Usage: runMain graft.tools.PlanDump <nameRegex> <outDir> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val nameFilter = args(0)
    val outDir = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(_.matches(nameFilter)).foreach { name =>
        try {
          val df = graft.SparkEntry.queries(name)(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(outDir, s"$name.txt"), plan)
          println(s"[plandump] wrote $outDir/$name.txt")
        } catch {
          case e: Throwable =>
            println(s"[plandump] $name FAILED: $e")
        }
      }
    spark.stop()
  }
}
