package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: replicate graft.Bench's exact timing methodology
  * (one warm-up pass, clearState before every timed pass, min of N) for
  * a regex-selected subset of the bench queries — so a single query's
  * bench number can be reproduced and attacked without paying for the
  * whole 65-entry run. Does NOT replace Bench: the driver contract
  * lives there; this is the optimization-loop microscope.
  * Usage: runMain graft.tools.BenchSubset <nameRegex> [sfDir] [passes]
  */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val nameFilter = if (args.nonEmpty) args(0) else ".*"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = (graft.SparkEntry.benchQueries ++ graft.SparkEntry.benchQueries2)
      .filter(_.matches(nameFilter))
    def clearState(): Unit = {
      graft.ops.DedupOps.clear()
      graft.ops.MLOps.clear()
      spark.catalog.clearCache()
    }
    // Same warm-up discipline as Bench: prime codegen/classloading (and
    // the surviving model caches) before any timed pass.
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    names.foreach { name =>
      val ps = (1 to passes).map { _ =>
        clearState()
        val t0 = System.nanoTime()
        val ok = try { graft.SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case e: Throwable => println(s"[benchsub] $name FAILED: $e"); false }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val minOk = ps.filter(_ >= 0)
      println(f"[benchsub] ${if (minOk.nonEmpty) minOk.min else -1.0}%8.3f  $name  passes=${ps.map(p => f"$p%.3f").mkString("[", ",", "]")}")
    }
    spark.stop()
  }
}
