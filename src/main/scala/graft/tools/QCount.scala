package graft.tools

/** Dev helper: print query/oracle counts (keeps README numbers honest). */
object QCount {
  def main(a: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"[count] queries=${q.size} oracles=${o.size} " +
      s"no-oracle=${(q -- o).toSeq.sorted.mkString(",")}")
  }
}
