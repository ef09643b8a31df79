package graft

/** Meta-checks on the differential fuzz surface (FuzzQueries): the
  * generator's output is well-formed and stable within a run, the
  * rendered Spark shapes execute deterministically, and the generated
  * space is non-degenerate (most shapes produce rows at the smallest
  * SF). The actual Spark-vs-DuckDB equality of every generated pair is
  * held by the Verify/check.py hash-compare, same as every hand-written
  * oracle — these tests guard the machinery, not the answers.
  */
class FuzzSpec extends SparkSpec {
  import graft.FuzzQueries.{NumAgg, NumWin, NumJoin, NumTok, NumFrame,
    NumStream, NumSJoin, NumSJoinOuter, NumExists, NumFSJoin}

  test("fuzz surface: every generated query has an oracle and vice versa") {
    val q = FuzzQueries.queries.keySet
    val o = FuzzQueries.oracleSql.keySet
    assert(q == o, s"query/oracle key drift: ${(q diff o) ++ (o diff q)}")
    assert(q.size == NumAgg + NumWin + NumJoin + NumTok + NumFrame
      + NumStream + NumSJoin + NumSJoinOuter + NumExists + NumFSJoin)
    assert(q.count(_.startsWith("fuzz_sjoin_")) == NumSJoin)
    assert(q.count(_.startsWith("fuzz_osjoin_")) == NumSJoinOuter)
    assert(q.count(_.startsWith("fuzz_fsjoin_")) == NumFSJoin)
    assert(q.count(_.startsWith("fuzz_exists_")) == NumExists)
    assert(q.count(_.startsWith("fuzz_agg_")) == NumAgg)
    assert(q.count(_.startsWith("fuzz_win_")) == NumWin)
    assert(q.count(_.startsWith("fuzz_join_")) == NumJoin)
    assert(q.count(_.startsWith("fuzz_tok_")) == NumTok)
    assert(q.count(_.startsWith("fuzz_frame_")) == NumFrame)
    assert(q.count(_.startsWith("fuzz_stream_")) == NumStream)
    // names must not collide with any hand-written query
    val hand = SparkEntry.queries.keySet diff q
    assert(hand.forall(!_.startsWith("fuzz_")), "reserved prefix collision")
  }

  test("fuzz shapes run twice identically and are mostly non-empty") {
    // a fixed sample re-runs bit-identically (run-to-run determinism of
    // the rendered chains — the same property the relational meta-test
    // pins for hand-written queries)
    Seq("fuzz_agg_000", "fuzz_agg_037", "fuzz_agg_099",
      "fuzz_win_000", "fuzz_win_019", "fuzz_join_000",
      "fuzz_join_029", "fuzz_tok_000", "fuzz_tok_019",
      "fuzz_frame_000", "fuzz_frame_019",
      "fuzz_exists_000", "fuzz_exists_007").foreach { name =>
      val fn = FuzzQueries.queries(name)
      val a = fn(spark, sf).collect().map(_.toSeq).toSeq
      val b = fn(spark, sf).collect().map(_.toSeq).toSeq
      assert(a == b, s"$name not deterministic")
    }
    // the generated space is non-degenerate: at the smallest SF, most
    // aggregate shapes still select rows (a handful of tight
    // predicate-stacks may legitimately filter everything out)
    val counts = (0 until NumAgg).map { i =>
      FuzzQueries.queries(f"fuzz_agg_$i%03d")(spark, sf).count()
    }
    val nonEmpty = counts.count(_ > 0L)
    assert(nonEmpty >= (NumAgg * 8) / 10,
      s"only $nonEmpty/$NumAgg fuzz shapes returned rows")
  }

  test("fuzz stream shapes: MemoryStream replay equals the batch twin") {
    // The watermark/state-machine divergence class (round-15 VERDICT
    // #6): every generated streaming shape runs TWICE — the batch twin
    // (oracle-checked by Verify/check.py like every other pair) and the
    // genuine Structured Streaming plan built by the SAME streamPlan
    // function over a MemoryStream, with the shape's watermark declared.
    // Windowed aggs replay in COMPLETE mode fed two unordered halves
    // (late rows must still merge — complete mode never evicts);
    // session shapes replay in APPEND mode fed three CHRONOLOGICAL
    // batches plus a far-future sentinel that pushes the watermark past
    // every real session's end (the sentinel's own session never
    // finalizes, so it cannot pollute the output).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batchEvents = graft.ops.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[(Long, Timestamp, Long, String, Double)].collect()
    val maxTs = batchEvents.map(_._2.getTime).max
    (0 until FuzzQueries.NumStream).foreach { i =>
      val sentinel = FuzzQueries.streamSentinel(i, maxTs + 86400000L * 40)
      val name = f"fuzz_stream_$i%03d"
      val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val plan = FuzzQueries.streamPlan(i)(stream.toDF()
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .withWatermark("ts", FuzzQueries.streamWatermarkDelay(i)))
      val session = FuzzQueries.streamIsSession(i)
      val mode = if (session) "append" else "complete"
      val q = plan.writeStream.outputMode(mode)
        .format("memory").queryName(s"t_fz_stream_$i").start()
      try {
        val feed =
          if (session) batchEvents.sortBy(r => (r._2.getTime, r._1))
          else batchEvents
        val batches =
          feed.grouped((feed.length + 2) / 3).map(_.toSeq).toSeq ++
            (if (session) Seq(Seq(sentinel)) else Nil)
        batches.foreach { b => stream.addData(b); q.processAllAvailable() }
        val cols = plan.columns.map(col)
        def canon(df: org.apache.spark.sql.DataFrame) =
          df.select(cols: _*).collect().map(_.toSeq).toSeq
            .sortBy(_.mkString("|"))
        val got = canon(spark.table(s"t_fz_stream_$i"))
        val want = canon(SparkEntry.queries(name)(spark, sf))
        assert(got == want,
          s"$name diverged: ${FuzzQueries.describe(name)}")
        assert(want.nonEmpty, s"$name batch twin is empty — degenerate shape")
      } finally q.stop()
    }
  }

  test("fuzz sjoin shapes: two-MemoryStream replay equals the batch twin") {
    // the interval-join streaming fuzz kind: inner joins emit a match
    // SET (no ordering ambiguity), so each shape's match plan — built by
    // the SAME function as the batch twin — replays through two
    // watermarked MemoryStreams fed chronological halves, and the
    // emitted matches' per-anchor aggregate must equal the batch twin.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, count, lit, max}
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ordered = graft.ops.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[(Long, Timestamp, Long, String, Double)].collect()
      .sortBy(e => (e._2.getTime, e._1))
    val (b1, b2) = ordered.splitAt(ordered.length / 2)
    (0 until FuzzQueries.NumSJoin).foreach { i =>
      val name = f"fuzz_sjoin_$i%03d"
      val lStream = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val aStream = MemoryStream[(Long, Timestamp, Long, String, Double)]
      def side(st: MemoryStream[(Long, Timestamp, Long, String, Double)]) =
        st.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
          .withWatermark("ts", FuzzQueries.sjoinWatermarkDelay(i))
      val plan = FuzzQueries.sjoinPlan(i)(side(lStream), side(aStream))
      val q = plan.writeStream.outputMode("append")
        .format("memory").queryName(s"t_fz_sjoin_$i").start()
      try {
        Seq(b1, b2).foreach { b =>
          lStream.addData(b.toSeq); aStream.addData(b.toSeq)
          q.processAllAvailable()
        }
        val got = spark.table(s"t_fz_sjoin_$i")
          .groupBy(col("anchor_id"), col("user_id"), col("anchor_ts"))
          .agg(count(lit(1)).as("n_left"), max(col("l_ts")).as("last_left_ts"))
          .collect().map(_.toSeq).toSet
        val want = SparkEntry.queries(name)(spark, sf)
          .collect().map(_.toSeq).toSet
        assert(got == want,
          s"$name diverged: ${FuzzQueries.describe(name)}")
        assert(want.nonEmpty, s"$name batch twin empty — degenerate shape")
      } finally q.stop()
    }
  }

  test("fuzz OUTER sjoin shapes: two-MemoryStream replay equals the batch twin") {
    // the LEFT OUTER interval-join kind: unmatched anchors emit a null
    // l_ts row, and in streaming that row only appears at state
    // EVICTION — i.e. after the watermark proves no in-window left can
    // still arrive. So the replay feeds the corpus chronologically,
    // then a far-future sentinel pair (one event per side, surviving
    // the type filters — a filtered sentinel never advances the
    // watermark) to flush the tail evictions, and compares the emitted
    // set's per-anchor aggregate (COUNT of non-null l_ts = 0 for
    // unmatched) against the batch left-outer twin. Chronological feed
    // order guarantees no real match is ever dropped as late: a null
    // row for anchor A evicts only once watermark > A.ts, and every
    // unfed left match has l_ts <= A.ts <= watermark < the next batch's
    // min ts — contradiction.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, count, max}
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ordered = graft.ops.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[(Long, Timestamp, Long, String, Double)].collect()
      .sortBy(e => (e._2.getTime, e._1))
    val (b1, b2) = ordered.splitAt(ordered.length / 2)
    val farFuture = ordered.map(_._2.getTime).max + 30L * 86400000L
    (0 until FuzzQueries.NumSJoinOuter).foreach { i =>
      val name = f"fuzz_osjoin_$i%03d"
      val lStream = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val aStream = MemoryStream[(Long, Timestamp, Long, String, Double)]
      def side(st: MemoryStream[(Long, Timestamp, Long, String, Double)]) =
        st.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
          .withWatermark("ts", FuzzQueries.sjoinOuterWatermarkDelay(i))
      val plan = FuzzQueries.sjoinOuterPlan(i)(side(lStream), side(aStream))
      val q = plan.writeStream.outputMode("append")
        .format("memory").queryName(s"t_fz_osjoin_$i").start()
      try {
        val Seq(sentL, sentA) = FuzzQueries.sjoinOuterSentinels(i, farFuture)
        Seq(b1.toSeq, b2.toSeq).foreach { b =>
          lStream.addData(b); aStream.addData(b)
          q.processAllAvailable()
        }
        // sentinel pair → watermark passes every real anchor → all
        // remaining unmatched anchors evict their null rows
        lStream.addData(Seq(sentL)); aStream.addData(Seq(sentA))
        q.processAllAvailable()
        val got = spark.table(s"t_fz_osjoin_$i")
          .filter(col("anchor_id") =!= -1L)
          .groupBy(col("anchor_id"), col("user_id"), col("anchor_ts"))
          .agg(count(col("l_ts")).as("n_left"), max(col("l_ts")).as("last_left_ts"))
          .collect().map(_.toSeq).toSet
        val want = SparkEntry.queries(name)(spark, sf)
          .collect().map(_.toSeq).toSet
        assert(got == want,
          s"$name diverged: ${FuzzQueries.describe(name)}")
        // non-degenerate BOTH ways: the shape must exercise matches AND
        // null emissions, else it never tests the outer semantics
        assert(want.exists(r => r(3) == 0L),
          s"$name has no unmatched anchor — outer path unexercised")
        assert(want.exists(r => r(3) != 0L),
          s"$name has no matched anchor — degenerate shape")
      } finally q.stop()
    }
  }

  test("fuzz FULL OUTER sjoin shapes: two-MemoryStream replay equals the batch twin") {
    // the round-18 both-side null-emission kind: unmatched ANCHORS emit
    // a null-left row at watermark > anchor_ts, and unmatched LEFTS emit
    // a null-anchor row at watermark > l_ts + lookback — two different
    // eviction deadlines on one operator (the hand-written
    // stream_interval_join_full spec pins the asymmetry on a planted
    // fixture; here 10 generated (type pair, lookback, watermark)
    // configs replay the corpus through the same plan function the
    // batch twin renders). Chronological feed + a far-future sentinel
    // pair flush the tail evictions on BOTH sides; comparison is the
    // shared per-user reconciliation aggregate.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{coalesce, col}
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ordered = graft.ops.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[(Long, Timestamp, Long, String, Double)].collect()
      .sortBy(e => (e._2.getTime, e._1))
    val (b1, b2) = ordered.splitAt(ordered.length / 2)
    val farFuture = ordered.map(_._2.getTime).max + 30L * 86400000L
    (0 until FuzzQueries.NumFSJoin).foreach { i =>
      val name = f"fuzz_fsjoin_$i%03d"
      val lStream = MemoryStream[(Long, Timestamp, Long, String, Double)]
      val aStream = MemoryStream[(Long, Timestamp, Long, String, Double)]
      def side(st: MemoryStream[(Long, Timestamp, Long, String, Double)]) =
        st.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
          .withWatermark("ts", FuzzQueries.sjoinFullWatermarkDelay(i))
      val plan = FuzzQueries.sjoinFullPlan(i)(side(lStream), side(aStream))
      val q = plan.writeStream.outputMode("append")
        .format("memory").queryName(s"t_fz_fsjoin_$i").start()
      try {
        val Seq(sentL, sentA) = FuzzQueries.sjoinFullSentinels(i, farFuture)
        Seq(b1.toSeq, b2.toSeq).foreach { b =>
          lStream.addData(b); aStream.addData(b)
          q.processAllAvailable()
        }
        lStream.addData(Seq(sentL)); aStream.addData(Seq(sentA))
        q.processAllAvailable()
        val got = FuzzQueries.sjoinFullAggregate(
          spark.table(s"t_fz_fsjoin_$i")
            .filter(coalesce(col("user_id"), col("l_user")) =!= -1L))
          .collect().map(_.toSeq).toSet
        val want = SparkEntry.queries(name)(spark, sf)
          .collect().map(_.toSeq).toSet
        assert(got == want,
          s"$name diverged: ${FuzzQueries.describe(name)}")
        // non-degenerate THREE ways: matches, unmatched anchors AND
        // unmatched lefts must all occur, else a null path went untested
        assert(want.exists(r => r(3).asInstanceOf[Long] > 0L),
          s"$name has no unmatched anchor — anchor null path unexercised")
        assert(want.exists(r => r(4).asInstanceOf[Long] > 0L),
          s"$name has no unmatched left — left null path unexercised")
        assert(want.exists(r => r(1).asInstanceOf[Long] > 0L &&
          r(3).asInstanceOf[Long] < r(1).asInstanceOf[Long]),
          s"$name has no matched pair — degenerate shape")
      } finally q.stop()
    }
  }

  test("fuzz shapes share one AST: SQL text embeds the Spark constants") {
    // spot-guard against a drifted double-render: the SQL string for a
    // shape must mention the same aggregate aliases its DataFrame
    // rendering produces, column for column
    (FuzzQueries.queries.keys.toSeq.sorted.take(30) ++
      (0 until NumTok).map(i => f"fuzz_tok_$i%03d") ++
      (0 until NumFrame).map(i => f"fuzz_frame_$i%03d")).foreach { name =>
      val cols = FuzzQueries.queries(name)(spark, sf).columns.toSet
      val sql = FuzzQueries.oracleSql(name)
      cols.foreach(c => assert(sql.contains(c),
        s"$name: column $c missing from the oracle SQL"))
    }
  }
}
