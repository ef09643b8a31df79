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
  import graft.FuzzQueries.{NumAgg, NumWin, NumJoin, NumTok, NumFrame}

  test("fuzz surface: every generated query has an oracle and vice versa") {
    val q = FuzzQueries.queries.keySet
    val o = FuzzQueries.oracleSql.keySet
    assert(q == o, s"query/oracle key drift: ${(q diff o) ++ (o diff q)}")
    assert(q.size == NumAgg + NumWin + NumJoin + NumTok + NumFrame)
    assert(q.count(_.startsWith("fuzz_agg_")) == NumAgg)
    assert(q.count(_.startsWith("fuzz_win_")) == NumWin)
    assert(q.count(_.startsWith("fuzz_join_")) == NumJoin)
    assert(q.count(_.startsWith("fuzz_tok_")) == NumTok)
    assert(q.count(_.startsWith("fuzz_frame_")) == NumFrame)
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
      "fuzz_frame_000", "fuzz_frame_019").foreach { name =>
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
