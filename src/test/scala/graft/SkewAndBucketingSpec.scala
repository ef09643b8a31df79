package graft

import org.apache.spark.sql.functions._
import graft.ops.{Skew, Tables}

/** Skew-mitigation result-equivalence + bucketed co-located join plan
  * shape (the two scale techniques the synthetic data can't stress but
  * whose correctness and plan effects are pinnable locally).
  */
class SkewAndBucketingSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
    val ord = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice")
      .toDF("l_orderkey", "o_totalprice") // rename for shared key name
    val plain = li.join(ord, Seq("l_orderkey"))
      .agg(count("*"), round(sum($"l_quantity"), 2)).collect().toSeq
    val salted = Skew.saltedJoin(li, ord, "l_orderkey", 8)
      .agg(count("*"), round(sum($"l_quantity"), 2)).collect().toSeq
    assert(salted == plain)
  }

  test("salted two-phase count equals plain groupBy count") {
    val ev = Tables.events(spark, sf)
    val plain = ev.groupBy($"event_type").count()
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    val salted = Skew.saltedCount(ev, "event_type", 16)
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("hot-key detector finds the dominant keys") {
    val hot = Skew.hotKeys(Tables.events(spark, sf), "event_type", 1L)
    assert(hot.count() == 5)
  }

  test("bucketed tables co-locate the join (no Exchange above the scans)") {
    // tables land in ./spark-warehouse (gitignored; static conf). The
    // in-memory catalog forgets tables between JVMs while the directory
    // persists, so clear both.
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Seq("li_b", "ord_b").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }
    Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")
    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), $"l_orderkey" === $"o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: the join must not re-shuffle either bucketed side
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    // and the result matches the unbucketed join
    val expect = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey").count()
    assert(joined.count() == expect)
  }
}
