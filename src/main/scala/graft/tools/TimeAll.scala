package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: time EVERY SparkEntry query once (cold, cleared state)
  * at the given sfDir and print a sorted table — finds scale-killers
  * hiding outside the stable bench set.
  * Usage: runMain graft.tools.TimeAll [sfDir] [nameRegex]
  */
object TimeAll {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nameFilter = if (args.length > 1) args(1) else ".*"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val times = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(_.matches(nameFilter)).map { name =>
      graft.ops.DedupOps.clear()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val ok = try { graft.SparkEntry.queries(name)(spark, sfDir).count(); true }
      catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    times.sortBy(-_._2).foreach { case (n, t) =>
      println(f"[timeall] $t%8.2f  $n")
    }
    println(f"[timeall] ${times.map(_._2).sum}%8.2f  TOTAL (${times.size} queries)")
    spark.stop()
  }
}
