package graft.tools

import org.apache.spark.ml.clustering.LDA
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: is the EM optimizer run-deterministic on a seeded
  * multi-partition fit? (decides whether the single-partition online fit
  * can be replaced)
  */
object EmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = "/root/testdata/sf0.01"
    val (cv, _) = graft.ops.MLOps.preparedInput(spark, d)
    val toks = graft.ops.Tables.documents(spark, d)
      .repartition(8)
      .select($"doc_id", filter(split(lower($"text"), "\\s+"),
        t => length(t) >= 3).as("toks"))
    val vec = cv.transform(toks).select("doc_id", "tf") // 8 partitions
    def fitOnce(opt: String, parts: Boolean): Seq[Seq[Any]] = {
      val in = if (parts) vec else vec.coalesce(1)
      new LDA().setK(4).setSeed(42L).setMaxIter(10).setOptimizer(opt)
        .setFeaturesCol("tf").fit(in)
        .describeTopics(8).collect().map(_.toSeq).toSeq
    }
    for (opt <- Seq("em", "online")) {
      val a = fitOnce(opt, parts = true)
      val b = fitOnce(opt, parts = true)
      println(s"[emprobe] $opt multi-partition deterministic: ${a == b}")
    }
    val a1 = fitOnce("em", parts = false)
    val b1 = fitOnce("em", parts = false)
    println(s"[emprobe] em single-partition deterministic: ${a1 == b1}")
    spark.stop()
  }
}
