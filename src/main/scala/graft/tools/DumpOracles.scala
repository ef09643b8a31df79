package graft.tools

/** Dev helper: rewrite oracle_sql.json in an existing Verify dump dir
  * (oracle-side-only iteration without re-running the Spark dump).
  */
object DumpOracles {
  def main(a: Array[String]): Unit = {
    val outDir = if (a.nonEmpty) a(0) else "target/verify_sf0.01"
    val m = graft.SparkEntry.oracleSql
    val json = m.toSeq.sortBy(_._1).map { case (k, v) =>
      val esc = v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\t", "\\t")
      s""""$k": "$esc""""
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    println(s"[dumporacles] wrote ${m.size} oracles to $outDir/oracle_sql.json")
  }
}
