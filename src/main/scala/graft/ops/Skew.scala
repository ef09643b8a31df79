package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (the 100 TB toolbox the harness data can't
  * exercise at scale; SkewSpec pins result-equivalence with the plain
  * forms).
  */
object Skew {

  /** Salted inner equi-join: replicate the (small-ish) right side
    * saltFactor times, scatter the left side's hot keys across salts, join
    * on (key, salt). Result set is identical to a plain inner join; the
    * hot key's rows land on saltFactor reducers instead of one.
    *
    * AQE's skew-join split handles sort-merge cases adaptively; explicit
    * salting remains the tool for aggregate-then-join shapes and for
    * engines/plans AQE can't split.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = right
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial-then-final) aggregation with an explicit salt on
    * the group key — the manual form of map-side combine for aggregates
    * whose partial state is large (e.g. collect-style) where the built-in
    * partial aggregation degenerates.
    */
  def saltedCount(df: DataFrame, key: String, saltFactor: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    salted.groupBy(col(key), col("__salt")).count()
      .groupBy(col(key)).agg(sum("count").as("count"))
  }

  def hotKeys(df: DataFrame, key: String, threshold: Long): DataFrame =
    df.groupBy(col(key)).count().filter(col("count") >= threshold)
}
