package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter injection (Spark's runtime row-level semi-join
  * pruning): with a selective filter on the creation side of a shuffle
  * join, the optimizer inserts bloom_filter_agg / BloomFilterMightContain
  * on the probe side, pruning shuffle input before the join — at 100 TB
  * this is the difference between shuffling the whole fact table and
  * shuffling the matching slice.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("selective shuffle join injects a bloom runtime filter on the probe side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      val orders = graft.ops.Tables.orders(spark, sf)
        .filter($"o_totalprice" > 400000.0) // selective creation side
      val li = graft.ops.Tables.lineitem(spark, sf)
      val j = li.join(orders, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilter"),
        s"no runtime bloom filter in plan:\n${plan.take(2000)}")
      // and it still computes the right thing
      val viaFilter = j.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "10GB")
      val plain = li.join(orders, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(viaFilter == plain)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
