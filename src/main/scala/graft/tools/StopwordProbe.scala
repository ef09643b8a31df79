package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (round 18): array_contains over the 120-word stopword
  * literal vs isin/InSet, inside the tokenize HOF lambda, over sf0.1.
  */
object StopwordProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sw = graft.functions.Lexicons.stopwordsEn
    val swCol = array(sw.map(lit): _*)
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def run(label: String)(tok: org.apache.spark.sql.Column): Unit = {
      val df = docs.select($"doc_id", tok.as("toks"))
        .select(explode($"toks").as("w"))
        .agg(count(lit(1)), sum(length($"w")))
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.collect()
        println(f"[swprobe] ${(System.nanoTime() - t0) / 1e9}%7.3f  $label pass $i")
      }
    }
    run("array_contains")(filter(split(lower($"text"), "\\s+"),
      t => length(t) >= 3 && !array_contains(swCol, t)))
    run("isin")(filter(split(lower($"text"), "\\s+"),
      t => length(t) >= 3 && !t.isin(sw: _*)))
    // plan check: does InSet survive inside the lambda?
    val p = docs.select(filter(split(lower($"text"), "\\s+"),
      t => length(t) >= 3 && !t.isin(sw: _*)).as("toks"))
      .queryExecution.executedPlan.toString
    println("[swprobe] plan contains INSET: " + p.contains("INSET"))
    println(p.linesIterator.filter(l => l.contains("filter") || l.contains("INSET")).take(3).mkString("\n"))
    spark.stop()
  }
}
