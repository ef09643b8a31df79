package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GroupTopK whole-operator plan: result equivalence with the window
  * form, the partial/final physical shape with the exchange between, and
  * the partial exec's per-partition output bound (the property that makes
  * the shuffle volume ∝ answer size).
  */
class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  private def docs =
    graft.ops.Tables.documents(spark, sf)
      .select($"source", $"lang", $"doc_id", $"n_chars")

  test("GroupTopK equals the row_number window form") {
    val viaExec = graft.plans.GroupTopK
      .topK(docs, Seq("source", "lang"), Seq(("n_chars", true), ("doc_id", false)), 3)
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy($"source", $"lang")
      .orderBy(desc("n_chars"), asc("doc_id"))
    val viaWindow = docs.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).drop("rn")
      .collect().map(_.toSeq).toSet
    assert(viaExec == viaWindow && viaExec.nonEmpty)
  }

  test("plan is partial GroupTopK -> exchange -> final GroupTopK, no sort") {
    val df = graft.plans.GroupTopK
      .topK(docs, Seq("source"), Seq(("n_chars", true), ("doc_id", false)), 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GroupTopK(partial)"), p)
    assert(p.contains("GroupTopK(final)"), p)
    val between = p.substring(p.indexOf("GroupTopK(final)"),
      p.indexOf("GroupTopK(partial)"))
    assert(between.contains("Exchange hashpartitioning(source"), p)
    assert(!p.contains("Sort "), p)
  }

  test("final output has exactly min(k, group size) rows per group") {
    val k = 2
    val res = graft.plans.GroupTopK
      .topK(docs, Seq("source"), Seq(("n_chars", true), ("doc_id", false)), k)
      .groupBy($"source").agg(count(lit(1)).as("n"))
    val sizes = docs.groupBy($"source").agg(count(lit(1)).as("total"))
    val rows = res.join(sizes, "source").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == math.min(k.toLong, r.getLong(2)), r.toString)
    }
  }

  test("ties beyond k are broken exactly like row_number (total order)") {
    // duplicate n_chars values exist across docs; k=1 must pick the
    // unique (n_chars desc, doc_id asc) minimum per group both runs
    val a = graft.plans.GroupTopK
      .topK(docs, Seq("source"), Seq(("n_chars", true), ("doc_id", false)), 1)
      .collect().map(_.toSeq).toSet
    val b = graft.plans.GroupTopK
      .topK(docs.repartition(7), Seq("source"), Seq(("n_chars", true), ("doc_id", false)), 1)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }
}
