package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the Bench calibration probe (see graft.Bench) in isolation so
  * its quiet-host anchor can be recorded. Usage:
  *   SPARK_GRAFT_CPUS=32 runMain graft.tools.CalibProbe
  */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val times = (1 to 6).map { _ =>
      val t0 = System.nanoTime()
      graft.Bench.calibOnce(spark)
      (System.nanoTime() - t0) / 1e9
    }
    println(s"calib cpus=$cpus runs=${times.map(t => f"$t%.3f").mkString(",")} min=${times.min}")
    spark.stop()
  }
}
