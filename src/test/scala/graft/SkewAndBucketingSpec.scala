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

  test("AQE splits the planted skew-join partition without manual salting") {
    // Evidence for SCALE.md's salting-vs-AQE boundary: JOIN-stage skew is
    // handled for free by AQE's OptimizeSkewedJoin (this test), so
    // Skew.saltedJoin is only needed where AQE can't see or act —
    // skewed AGGREGATIONS (two-phase salted groupBy) and stateful
    // streaming keys. Thresholds are scaled down so the planted hot key
    // trips detection on test-sized data; the assertions are on the
    // FINAL adaptive plan, after execution.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 80% of 400k rows land on key 0 → one shuffle partition ~10× the
      // median, well past factor 2 × 1MB
      val left = spark.range(0, 400000)
        .select(when($"id" % 5 =!= 0, lit(0L))
          .otherwise(pmod($"id", lit(100L))).as("k"), $"id".as("v"))
      val right = spark.range(0, 100).select($"id".as("k"), $"id".as("w"))
      val q = left.join(right, "k").agg(sum($"v" + $"w").as("s"))
      val got = q.collect()
      assert(got.length == 1 && !got.head.isNullAt(0))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not fire in the final plan:\n$plan")
    } finally {
      saved.foreach { case (k, vOpt) =>
        vOpt match {
          case Some(v) => spark.conf.set(k, v)
          case None => spark.conf.unset(k)
        }
      }
    }
  }
}
