package graft

import java.io.File

import org.apache.spark.sql.types._

import graft.ops.Tables

/** Schema-drift canary. Round 9 lost 51 queries, 21 tests, and 16 bench
  * entries because the testdata generator silently switched `events.ts`
  * from TIMESTAMP(NANOS) to TIMESTAMP_MICROS and the reader assumed one
  * layout. This spec pins the contract at build time for every sf dir
  * present under /root/testdata: each table loads, and the temporal /
  * payload columns the operators depend on resolve to the dtypes the
  * engine expects AFTER the adaptive readers in [[graft.ops.Tables]]
  * normalize them. If the generator flips layout again, this fails with
  * the observed dtype in the message instead of 51 queries dying at
  * driver time.
  */
class SchemaCanarySpec extends SparkSpec {

  private val sfDirs: Seq[String] = {
    val root = new File("/root/testdata")
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("sf"))
      .map(_.getAbsolutePath).toSeq.sorted
  }

  private val tables = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  test("at least one sf dir exists") {
    assert(sfDirs.nonEmpty, "no sf* dirs under /root/testdata")
  }

  test("every table loads and has rows in every sf dir") {
    for (d <- sfDirs; t <- tables) {
      val df = Tables.table(spark, d, t)
      assert(df.limit(1).count() == 1L, s"$d/$t.parquet is empty or unreadable")
    }
  }

  test("events.ts normalizes to TimestampType in every sf dir") {
    for (d <- sfDirs) {
      // Raw layout, for the failure message: what the parquet footer says.
      val raw = Tables.table(spark, d, "events").schema("ts").dataType
      val normalized = Tables.events(spark, d).schema("ts").dataType
      assert(normalized == TimestampType,
        s"$d/events.parquet: ts loads as $raw, normalizes to $normalized " +
          "(expected TimestampType) — generator layout changed; " +
          "extend the dtype match in Tables.events")
    }
  }

  test("events.ts values are sane instants after normalization") {
    // A wrong nanos/micros branch is off by 1000x, landing centuries away.
    import org.apache.spark.sql.functions._
    for (d <- sfDirs) {
      val yr = Tables.events(spark, d)
        .agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
        .head()
      val (lo, hi) = (yr.getInt(0), yr.getInt(1))
      assert(lo >= 1990 && hi <= 2100,
        s"$d/events.parquet: ts year range [$lo, $hi] out of [1990, 2100] — " +
          "unit mismatch in the nanos/micros conversion branch")
    }
  }

  test("Tables.events normalizes all three ts layouts to the same instants") {
    // The live testdata only ever exercises ONE branch of the adaptive
    // reader; this test synthesizes the other layouts so every branch
    // stays covered whatever the generator currently emits. The nanos
    // layout is simulated by a LongType column of epoch-nanos — exactly
    // what a TIMESTAMP(NANOS) file becomes under `nanosAsLong`, which is
    // the only form that branch ever sees.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = graft.ops.Tables.artifactDir("schema_canary_layouts", sf)
    val base = Seq(
      (1L, "2024-03-01 12:34:56.789012"),
      (2L, "2025-12-31 23:59:59.000001")
    ).toDF("id", "s").withColumn("want", to_timestamp($"s")).select($"id", $"want")

    val asNanosLong = base.select($"id",
      (unix_micros($"want") * 1000L).as("ts"))
    val asNtz = base.select($"id",
      $"want".cast(TimestampNTZType).as("ts"))
    val asMicros = base.select($"id", $"want".as("ts"))

    val cases = Seq("long_nanos" -> asNanosLong, "ntz" -> asNtz, "micros" -> asMicros)
    for ((label, df) <- cases) {
      // Tables.events reads "$sfDir/events.parquet"; write each layout
      // under a root laid out the same way.
      val fake = s"$dir/${label}_root"
      val eventsPath = new File(s"$fake/events.parquet")
      eventsPath.getParentFile.mkdirs()
      df.write.mode("overwrite").parquet(eventsPath.getPath)
      val got = graft.ops.Tables.events(spark, fake)
      assert(got.schema("ts").dataType == TimestampType,
        s"layout $label: normalized dtype is ${got.schema("ts").dataType}")
      val joined = got.join(base, "id")
        .filter($"ts" =!= $"want").count()
      assert(joined == 0L, s"layout $label: normalized instants diverge from source")
    }
  }

  test("key typed columns keep their expected dtypes") {
    val expected: Seq[(String, String, DataType => Boolean, String)] = Seq(
      ("lineitem", "l_shipdate", dt => dt == DateType || dt == TimestampType || dt == TimestampNTZType, "Date/Timestamp"),
      ("orders", "o_orderdate", dt => dt == DateType || dt == TimestampType || dt == TimestampNTZType, "Date/Timestamp"),
      ("lineitem", "l_quantity", dt => dt.isInstanceOf[NumericType], "numeric"),
      ("events", "value", dt => dt.isInstanceOf[NumericType], "numeric"),
      ("documents", "text", dt => dt == StringType, "String"),
      ("embeddings", "embedding", {
        case ArrayType(et, _) => et == FloatType || et == DoubleType
        case _                => false
      }, "Array[Float/Double]")
    )
    for (d <- sfDirs; (t, c, ok, want) <- expected) {
      val schema = Tables.table(spark, d, t).schema
      assert(schema.fieldNames.contains(c), s"$d/$t.parquet: missing column $c")
      val dt = schema(c).dataType
      assert(ok(dt), s"$d/$t.parquet: $c is $dt, expected $want")
    }
  }
}
