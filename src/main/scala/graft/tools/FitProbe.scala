package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: time the seeded MLlib LDA fit on the FULL prepared
  * corpus vs the hash-sampled stratum (the round-14 fit-on-sample path),
  * same k/maxIter, fresh model each — quantifies what the sampling
  * actually buys at a given SF and how much of the fit constant is
  * per-iteration scheduling overhead (invariant to input size).
  * Usage: runMain graft.tools.FitProbe [sfDir] [k] [maxIter]
  */
object FitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else graft.ops.MLOps.K
    val maxIter = if (args.length > 2) args(2).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val (_, vec) = graft.ops.MLOps.preparedInput(spark, sfDir)
    val sample = vec.filter(pmod(graft.functions.PolyHash.poly_hash(
      col("doc_id").cast("string")), lit(graft.ops.MLOps.FitSampleMod)) === 0)
      .coalesce(1).persist()
    val (nAll, nSmp) = (vec.count(), sample.count())
    def fit(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      // one throwaway fit first so JIT/codegen don't bias the first tag
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        new org.apache.spark.ml.clustering.LDA().setK(k)
          .setSeed(graft.ops.MLOps.Seed + pass) // distinct → no cache reuse
          .setMaxIter(maxIter).setFeaturesCol("tf").fit(df)
        println(f"[fitprobe] $tag pass$pass ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    println(s"[fitprobe] docs full=$nAll sampled=$nSmp k=$k maxIter=$maxIter")
    fit(vec, "full   ")
    fit(sample, "sampled")
    spark.stop()
  }
}
