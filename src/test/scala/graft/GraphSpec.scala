package graft

/** Graph-analytics family invariants: PageRank is a probability
  * distribution and iterations reuse one edge aggregate (the property
  * that keeps the raw fact table to a single scan at 100 TB); triangle
  * counts match a brute-force check on the same core edge set.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank sums to 1 and every nation appears") {
    val rows = graft.ops.GraphOps.queries("graph_pagerank")(spark, sf)
      .collect()
    assert(rows.length == 25)
    val mass = rows.map(_.getDouble(1)).sum
    assert(math.abs(mass - 1.0) < 1e-4, s"PR mass $mass")
    // damping floor: nothing below (1-d)/N
    assert(rows.forall(_.getDouble(1) >= 0.15 / 25 - 1e-9))
  }

  test("pagerank reuses the edge-aggregate exchange across iterations") {
    // Round 19 note: this is a RUNTIME property only — the compiled plan
    // carries four full aggregate copies (plans/r19/graph_pagerank_before
    // has 44 parquet scans and no ReusedExchange; the out-strength window
    // between aggregate and join breaks compile-time subtree reuse), and
    // AQE's stage dedup is what collapses them at execution. A
    // localCheckpoint pin of the transition table was tried and measured
    // ~40% slower same-window (materialization barrier + stat-less
    // ExistingRDD joins), so the runtime-reuse form stays — and this
    // assertion is the only thing standing between the 4-iteration unroll
    // and four fact scans at 100 TB.
    val df = graft.ops.GraphOps.queries("graph_pagerank")(spark, sf)
    df.collect() // AQE only materializes ReusedExchange in the final plan
    val plan = df.queryExecution.executedPlan.toString
    val reuses = "ReusedExchange".r.findAllIn(plan).length +
      "ReusedQueryStage".r.findAllIn(plan).length
    assert(reuses >= 3, s"expected >=3 reused exchange/stage nodes, got $reuses\n$plan")
  }

  /** The thresholded undirected core, reconstructed exactly as the
    * queries build it (exact decimal pair sums, double mean threshold).
    */
  private lazy val coreEdges: Set[(Long, Long)] = {
    import graft.ops.Tables
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val raw =
      Tables.customer(spark, sf).select($"c_custkey", $"c_nationkey".as("src"))
        .join(Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey"),
          $"o_custkey" === $"c_custkey")
        .join(Tables.lineitem(spark, sf).select($"l_orderkey", $"l_suppkey",
          ($"l_extendedprice".cast("decimal(12,2)") *
            (lit(1).cast("decimal(12,2)") - $"l_discount".cast("decimal(4,2)"))).as("r")),
          $"l_orderkey" === $"o_orderkey")
        .join(Tables.supplier(spark, sf).select($"s_suppkey", $"s_nationkey".as("dst")),
          $"s_suppkey" === $"l_suppkey")
        .filter($"src" =!= $"dst")
        .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"), $"r")
        .collect().map(r => (r.getAs[Number](0).longValue(),
          r.getAs[Number](1).longValue()) -> BigDecimal(r.getDecimal(2)))
    // exact decimal per-pair sums (like the query), double only at the end
    val uw = raw.groupBy(_._1).view.mapValues(_.map(_._2).sum.toDouble).toMap
    val mean = uw.values.sum / uw.size
    uw.filter(_._2 > mean).keySet
  }

  test("triangle counts match brute force over the same core") {
    import graft.ops.Tables
    val out = graft.ops.GraphOps.queries("graph_triangles")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // brute-force: enumerate all node triples over the reconstructed core
    val e = graft.ops.GraphOps.queries("graph_degree_stats")(spark, sf)
    assert(e.count() == 25) // degree stats cover the full node domain
    val nations = Tables.nation(spark, sf)
      .select($"n_nationkey", $"n_name").collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getString(1)).toMap
    val core = coreEdges
    val nodes = core.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    var triPerNode = Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.length; k <- (j + 1) until nodes.length
      a = nodes(i); b = nodes(j); c = nodes(k)
      if core((a, b)) && core((b, c)) && core((a, c))
    } {
      triPerNode = triPerNode.updated(a, triPerNode(a) + 1)
        .updated(b, triPerNode(b) + 1).updated(c, triPerNode(c) + 1)
    }
    assert(triPerNode.values.sum > 0, "threshold left no triangles — vacuous")
    triPerNode.foreach { case (node, cnt) =>
      assert(out(nations(node)) == cnt, s"node $node: ${out(nations(node))} != $cnt")
    }
  }

  test("harmonic centrality matches driver BFS over the same core") {
    import graft.ops.Tables
    val out = graft.ops.GraphOps.queries("graph_harmonic")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val nations = Tables.nation(spark, sf)
      .select($"n_nationkey", $"n_name").collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getString(1)).toMap
    val adj = coreEdges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    nations.keys.foreach { s =>
      // BFS to depth 4
      var dist = Map(s -> 0)
      var frontier = Set(s)
      for (d <- 1 to 4) {
        val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
          .filterNot(dist.contains)
        dist = dist ++ next.map(_ -> d)
        frontier = next
      }
      val reached = dist.filter { case (v, dd) => dd > 0 }
      val h = reached.values.map(dd => 1.0 / dd).sum
      val (gotH, gotN) = out(nations(s))
      assert(gotN == reached.size,
        s"node $s: reached $gotN vs ${reached.size}")
      assert(math.abs(gotH - h) < 1e-5, s"node $s: harmonic $gotH vs $h")
    }
    assert(out.values.exists(_._1 > 0), "no node reaches anything — vacuous")
  }

  test("betweenness matches the local pair-dependency identity over the same core") {
    import graft.ops.Tables
    val out = graft.ops.GraphOps.queries("graph_betweenness")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val nations = Tables.nation(spark, sf)
      .select($"n_nationkey", $"n_name").collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getString(1)).toMap
    val adj = coreEdges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = nations.keys.toSeq.sorted
    // capped BFS with path counting: (s, v) -> (dist, sigma), same
    // 4-round convention as the engine query
    val ds = scala.collection.mutable.Map.empty[(Long, Long), (Int, Long)]
    nodes.foreach { s =>
      ds((s, s)) = (0, 1L)
      var frontier = Set(s)
      for (d <- 1 to 4) {
        val cand = scala.collection.mutable.Map.empty[Long, Long]
          .withDefaultValue(0L)
        frontier.foreach { u =>
          val su = ds((s, u))._2
          adj.getOrElse(u, Set.empty).foreach { v =>
            if (!ds.contains((s, v))) cand(v) += su
          }
        }
        cand.foreach { case (v, sig) => ds((s, v)) = (d, sig) }
        frontier = cand.keySet.toSet
      }
    }
    def rh(x: Double): Long = math.floor(x + 0.5).toLong // terms are >= 0
    val tnano = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for {
      s <- nodes; v <- nodes; t <- nodes
      if s != t && v != s && v != t
      (dsv, ssv) <- ds.get((s, v))
      (dvt, svt) <- ds.get((v, t))
      (dst, sst) <- ds.get((s, t))
      if dsv + dvt == dst
    } tnano(v) += rh(ssv * svt * 1e9 / sst)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    nodes.foreach { v =>
      val want = r6(tnano(v).toDouble / 2e9)
      assert(out(nations(v)) == want,
        s"node $v: betweenness ${out(nations(v))} vs local $want")
    }
    assert(out.values.exists(_ > 0), "no interior node — vacuous threshold")
  }

  test("HyperBall estimate tracks exact harmonic within HLL error") {
    val exact = graft.ops.GraphOps.queries("graph_harmonic")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val hb = graft.ops.GraphOps.queries("graph_hyperball")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(hb.map(_._1).toSet == exact.keySet)
    hb.foreach { case (name, est, ball) =>
      val ex = exact(name)
      // n ≤ 25 nodes sits in the linear-counting regime — much tighter
      // than the 26% HLL rse (measured at sf0.01: max abs err 2.75,
      // mean 1.15 on exact values 13–24). Isolated nodes must be exact 0
      // (their counter never changes, so every delta is 0).
      if (ex == 0.0) assert(est == 0.0, s"$name: isolated node est $est")
      else assert(math.abs(est - ex) <= math.max(2.0, 0.35 * ex) + 1.0,
        s"$name: hb $est vs exact $ex")
      assert(ball > 0.0)
    }
    // the counter-difference accumulation must preserve the broad ranking:
    // the exact-top node sits in the HyperBall top 3
    val exTop = exact.maxBy(_._2)._1
    val hbTop3 = hb.sortBy(-_._2).take(3).map(_._1).toSet
    assert(hbTop3.contains(exTop), s"$exTop not in HyperBall top-3 $hbTop3")
  }

  test("k-core membership matches local peeling run to fixpoint") {
    val rows = graft.ops.GraphOps.queries("graph_kcore")(spark, sf)
      .as[(String, Long, Boolean, Boolean)].collect()
    assert(rows.length == 25)
    // local peeling to convergence over the same symmetrized core
    val adj0 = (coreEdges.toSeq ++ coreEdges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def peelFix(k: Int): (Set[Long], Int) = {
      var alive = adj0.keySet
      var r = 0
      var changed = true
      while (changed) {
        val next = alive.filter(v => adj0(v).count(alive) >= k)
        changed = next != alive
        alive = next
        r += 1
      }
      (alive, r)
    }
    val names = graft.ops.Tables.nation(spark, sf)
      .select($"n_nationkey", $"n_name").as[(Long, String)].collect()
      .map(_.swap).toMap
    val (c2, r2) = peelFix(2)
    val (c3, r3) = peelFix(3)
    // the unrolled round budget covers the true fixpoint
    assert(r2 <= graft.ops.GraphOps.PeelRounds &&
      r3 <= graft.ops.GraphOps.PeelRounds, s"fixpoint at $r2/$r3 rounds")
    rows.foreach { case (name, deg, in2, in3) =>
      val node = names(name)
      assert(deg == adj0.getOrElse(node, Set.empty).size.toLong, s"$name deg")
      assert(in2 == c2(node), s"$name 2-core")
      assert(in3 == c3(node), s"$name 3-core")
    }
  }

  test("assortativity matches a local Pearson over the same core") {
    val row = graft.ops.GraphOps.queries("graph_assortativity")(spark, sf)
      .as[(Long, Double)].head()
    val sym = coreEdges.toSeq ++ coreEdges.toSeq.map(e => (e._2, e._1))
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val (m, pairs) = (sym.length.toLong, sym.map { case (a, b) => (deg(a), deg(b)) })
    assert(row._1 == m)
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val r = (m * sxy - sx * sy).toDouble /
      math.sqrt((m * sxx - sx * sx).toDouble * (m * syy - sy * sy).toDouble)
    assert(math.abs(row._2 - r) < 1e-6, s"${row._2} vs $r")
    assert(row._2 >= -1.0 - 1e-9 && row._2 <= 1.0 + 1e-9)
  }

  test("LPA labels every nation and communities coarsen the id partition") {
    val rows = SparkEntry.queries("graph_lpa_communities")(spark, sf)
      .as[(String, Long)].collect()
    assert(rows.length == 25)
    assert(rows.map(_._1).distinct.length == 25)
    val communities = rows.map(_._2).distinct
    // labels are node ids, and propagation must have merged SOME nodes
    // (the trade core is densely connected)
    assert(communities.forall(c => c >= 0 && c <= 24))
    assert(communities.length < 25, "no label propagated at all")
    assert(communities.nonEmpty)
  }

  test("SCC matches a local Floyd-Warshall closure over the same edges") {
    val edges = graft.ops.Tables.customer(spark, sf)
      .select($"c_custkey", $"c_nationkey".as("src"))
      .join(graft.ops.Tables.orders(spark, sf)
        .select($"o_orderkey", $"o_custkey"), $"o_custkey" === $"c_custkey")
      .join(graft.ops.Tables.lineitem(spark, sf)
        .select($"l_orderkey", $"l_suppkey"), $"l_orderkey" === $"o_orderkey")
      .join(graft.ops.Tables.supplier(spark, sf)
        .select($"s_suppkey", $"s_nationkey".as("dst")),
        $"s_suppkey" === $"l_suppkey")
      .select($"src", $"dst").distinct()
      .as[(Long, Long)].collect().filter(e => e._1 != e._2)
    val nodes = graft.ops.Tables.nation(spark, sf)
      .select($"n_nationkey").as[Long].collect().sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    val reach = Array.fill(n, n)(false)
    nodes.indices.foreach(i => reach(i)(i) = true)
    edges.foreach { case (a, b) => reach(idx(a))(idx(b)) = true }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    val expScc = nodes.indices.map { i =>
      val comp = nodes.indices.filter(j => reach(i)(j) && reach(j)(i))
      nodes(i) -> (nodes(comp.min), comp.length.toLong)
    }.toMap
    val got = SparkEntry.queries("graph_scc")(spark, sf)
      .select($"node", $"scc_id", $"scc_size")
      .as[(Long, Long, Long)].collect()
    assert(got.length == n, "every nation assigned to one SCC")
    got.foreach { case (node, id, size) =>
      assert(expScc(node) == (id, size), s"node $node: ($id, $size)")
    }
    // the component relation partitions the nodes: sizes sum to |V|
    assert(got.map(r => r._2 -> r._3).distinct.map(_._2).sum == n.toLong)
  }

  test("Adamic-Adar matches a local recompute over the same core") {
    val nbr = coreEdges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = nbr.view.mapValues(_.size.toLong).toMap
    val exp = (for {
      x <- nbr.keys; y <- nbr.keys
      if x < y && !nbr(x).contains(y)
      common = nbr(x) intersect nbr(y)
      if common.nonEmpty
    } yield {
      // mirror the engine's nano-quantize-then-sum exactness device
      val nano = common.toSeq.map(z =>
        math.round(1e9 / math.log(deg(z).toDouble))).sum
      (x, y) -> (common.size.toLong, nano)
    }).toMap
    val got = SparkEntry.queries("graph_adamic_adar")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
    assert(got.length == exp.size, s"${got.length} pairs vs ${exp.size}")
    got.foreach { case (x, y, common, dx, dy, jac, aa) =>
      val (ec, enano) = exp((x, y))
      assert(common == ec && dx == deg(x) && dy == deg(y))
      assert(common <= math.min(dx, dy))
      assert(math.abs(jac - common.toDouble / (dx + dy - common)) < 1e-6)
      assert(math.abs(aa - enano / 1e9) < 1e-6, s"($x,$y): $aa vs $enano")
    }
  }
}
