package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe (round 18): where do lda_em_topics' seconds go?
  * Times the fit's phases by forcing materialization boundaries the
  * real chain also has (dw checkpoint, per-round resp checkpoints,
  * final read). Uses the public query surface only.
  */
object EmStageProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[emprobe2] ${(System.nanoTime() - t0) / 1e9}%7.3f  $label")
      r
    }
    // warm-up (classload/codegen) then timed runs
    graft.SparkEntry.queries("lda_em_topics")(spark, d).count()
    (1 to 2).foreach { i =>
      graft.ops.MLOps.clear()
      spark.catalog.clearCache()
      t(s"full lda_em_topics pass $i") {
        graft.SparkEntry.queries("lda_em_topics")(spark, d).count()
      }
    }
    // doc_topics reads theta instead of phi: same fit, different tail
    graft.ops.MLOps.clear(); spark.catalog.clearCache()
    t("lda_em_doc_topics (same fit, theta tail)") {
      graft.SparkEntry.queries("lda_em_doc_topics")(spark, d).count()
    }
    // with a warm emCache: the tail alone
    t("lda_em_topics tail only (warm emCache)") {
      graft.SparkEntry.queries("lda_em_topics")(spark, d).count()
    }
    spark.stop()
  }
}
