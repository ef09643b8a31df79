package graft.tools
/** Dev helper: print query/oracle counts for README bookkeeping. */
object CountQ {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size} no_oracle=${(q -- o).toSeq.sorted.mkString(",")}")
    val stray = o -- q
    if (stray.nonEmpty) println(s"STRAY ORACLES (no query): ${stray.toSeq.sorted.mkString(",")}")
  }
}
