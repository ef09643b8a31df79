package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch probe (round 18): per-JOB wall times for one query — shows
  * whether a slow query is one big job or death by a thousand barriers.
  * Usage: runMain graft.tools.JobProbe <queryName> [sfDir]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm-up
    try graft.SparkEntry.queries(name)(spark, d).count() catch { case _: Throwable => () }
    graft.ops.DedupOps.clear(); graft.ops.MLOps.clear(); spark.catalog.clearCache()
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    val rows = scala.collection.mutable.ListBuffer.empty[(Int, Double, String)]
    val l = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts(e.jobId) = (e.time,
          Option(e.properties.getProperty("spark.job.description")).getOrElse(""))
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        starts.remove(e.jobId).foreach { case (t0, desc) =>
          rows += ((e.jobId, (e.time - t0) / 1e3, desc))
        }
    }
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, d).count()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(l)
    Thread.sleep(500)
    var acc = 0.0
    rows.sortBy(_._1).foreach { case (id, s, desc) =>
      acc += s
      println(f"[jobprobe] job $id%4d  $s%7.3f s  ${desc.take(80)}")
    }
    println(f"[jobprobe] TOTAL jobs=${rows.size} jobSum=$acc%.3f wall=$wall%.3f (gap=${wall - acc}%.3f = planning/driver)")
    spark.stop()
  }
}
