package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see /root/repo/TESTDATA.md).
  *
  * All operators take an `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * parquet files directly with `spark.read.parquet` — schema comes from the
  * parquet footer, and Catalyst pushes column pruning + predicates into the
  * scan. At cluster scale these would be partitioned/bucketed table paths;
  * the API surface is identical.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Artifact path for sink/roundtrip queries, suffixed by the sfDir
    * hash: a Verify run and a spec/bench run on DIFFERENT sfDirs in the
    * same working directory must not interleave writes on one shared
    * path (round 8: a concurrent sf0.001 suite corrupted the sf0.01
    * verify dump of sink_training_shards mid-write). Same-sfDir
    * concurrency remains tolerated-but-confined, as before.
    */
  def artifactDir(name: String, sfDir: String): String =
    s"target/tmp/${name}_${Integer.toHexString(sfDir.hashCode)}"

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** Schema-adaptive events reader. The generator has shipped `ts` in two
    * layouts across rounds: TIMESTAMP(NANOS) — which Spark's parquet reader
    * only loads as a nanosecond LongType under the legacy `nanosAsLong`
    * conf — and plain TIMESTAMP_MICROS, which loads as TimestampType
    * directly. Branch on the loaded dtype instead of assuming either:
    * LongType means nanos-as-long (convert to micros; generator instants
    * are micro-precision so `div 1000` is lossless), Timestamp(NTZ) passes
    * through (NTZ cast to session-zoned for uniform downstream semantics).
    * The `nanosAsLong` conf is set unconditionally: it only affects
    * TIMESTAMP(NANOS) columns and is a no-op for micros files, and setting
    * it up front means a future nanos regeneration loads instead of
    * throwing at analysis.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
