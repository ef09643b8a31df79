package graft

import org.apache.spark.sql.functions._
import graft.functions.MisraGries

/** Misra-Gries sketch guarantees + the two-pass heavy-hitter query built
  * on it, and the incremental-dedup batch semantics.
  */
class MGSpec extends SparkSpec {
  import spark.implicits._

  test("MG summary: superset of true heavy hitters, counts within N/(m+1)") {
    // skewed synthetic stream: item i appears (50-i)^2 times, shuffled
    // deterministically so partitions interleave items
    val raw = (0 until 50).flatMap(i => Seq.fill((50 - i) * (50 - i))(s"it$i"))
    val stream = new scala.util.Random(7).shuffle(raw)
    val n = stream.size.toLong
    val m = 16
    val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val summary = stream.toDF("tok").repartition(8).as[String]
      .select(new MisraGries(m).toColumn).head().toMap
    // every true heavy hitter (> N/(m+1)) present
    val bound = n.toDouble / (m + 1)
    exact.filter(_._2 > bound).keys.foreach { k =>
      assert(summary.contains(k), s"heavy hitter $k missing from MG summary")
    }
    // kept counts never overestimate and undershoot by at most N/(m+1)
    summary.foreach { case (k, c) =>
      val t = exact(k)
      assert(c <= t, s"$k overcounted: $c > $t")
      assert(t - c <= bound, s"$k undercounted beyond bound: $t - $c > $bound")
    }
    assert(summary.size <= m)
  }

  test("a_heavy_hitters equals the direct exact computation") {
    val got = SparkEntry.queries("a_heavy_hitters")(spark, sf)
      .as[(String, Long)].collect().toSeq
    val toks = ops.Tables.documents(spark, sf)
      .select(explode(filter(split(lower($"text"), "\\s+"),
        t => length(t) > 0)).as("tok"))
    val n = toks.count()
    val want = toks.groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" > n / 200.0)
      .orderBy(desc("cnt"), asc("tok"))
      .as[(String, Long)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("dedup_incremental: planted copies flagged dup, novelty preserved") {
    val rows = SparkEntry.queries("dedup_incremental")(spark, sf)
      .as[(Long, String, Long, Option[Long])].collect()
    val byId = rows.map(r => r._1 -> r).toMap
    // every planted re-keyed copy (source doc_id % 25 == 7, % 10 != 0) is
    // a dup of exactly its source (possibly among other matches)
    val planted = rows.filter(_._1 >= 2000000)
    assert(planted.nonEmpty)
    planted.foreach { case (id, status, nm, first) =>
      assert(status == "dup", s"planted copy $id not flagged dup")
      assert(nm >= 1 && first.isDefined)
      assert(first.get <= id - 2000000,
        s"first_match ${first.get} should be <= source ${id - 2000000}")
    }
    // statuses partition the batch; novel docs report no match
    rows.foreach { case (_, status, nm, first) =>
      if (status == "novel") assert(nm == 0 && first.isEmpty)
      else assert(nm >= 1 && first.isDefined)
    }
    assert(rows.exists(_._2 == "novel"))
  }

  test("count-min probe: one-sided guarantee, with real collisions") {
    val rows = SparkEntry.queries("a_countmin_probe")(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.length == 30)
    // CM never underestimates
    rows.foreach { case (bg, t, est) =>
      assert(est >= t, s"$bg: est $est < true $t")
    }
    // the 1k-key bigram domain into 4x64 cells must actually collide —
    // if every estimate were exact the sketch would be vacuously wide
    assert(rows.exists { case (_, t, est) => est > t }, "no collisions — sketch too wide to test anything")
  }

  test("quantile sketch: rank error within the compaction bound") {
    import org.apache.spark.sql.functions._
    val est = SparkEntry.queries("a_quantile_sketch")(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(est.nonEmpty)
    val vals = graft.ops.Tables.events(spark, sf)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    est.foreach { case (tpe, nRows, nSketch, p50, p95) =>
      val v = vals(tpe)
      assert(nRows == v.length)
      // survivor count stayed within the k..2k compactor band
      assert(nSketch >= 32 && nSketch <= 128)
      // each estimate's TRUE rank must sit within n/(2k)·rounds of its
      // target — use the loose practical bound 5% of n (k=64 ⇒ ~1.6%
      // per the halving-error sum, headroom for parity drift)
      def rankOf(x: Double): Long = v.count(_ <= x)
      assert(math.abs(rankOf(p50) - 0.5 * nRows) <= 0.05 * nRows,
        s"$tpe p50 rank off: ${rankOf(p50)} vs ${0.5 * nRows}")
      assert(math.abs(rankOf(p95) - 0.95 * nRows) <= 0.05 * nRows,
        s"$tpe p95 rank off: ${rankOf(p95)} vs ${0.95 * nRows}")
      // estimates are genuine corpus values (order statistics, not math)
      assert(v.contains(p50) && v.contains(p95))
    }
  }

  test("HLL shard-merge equals the direct global build (mergeability)") {
    val direct = SparkEntry.queries("a_hll_probe")(spark, sf)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val merged = SparkEntry.queries("a_hll_shard_merge")(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(merged.nonEmpty)
    val days = graft.ops.Tables.events(spark, sf)
      .select($"event_type", org.apache.spark.sql.functions.to_date($"ts").as("d"))
      .distinct().as[(String, java.sql.Date)].collect()
      .groupBy(_._1).view.mapValues(_.length).toMap
    merged.foreach { case (tpe, exact, nShards, est) =>
      // register max is associative: merging day shards must reproduce
      // the direct estimate bit-for-bit, and the exact count alongside
      assert((exact, est) == direct(tpe), s"$tpe merge != direct")
      assert(nShards == days(tpe))
    }
  }

  test("Bloom contamination: no false negatives, bounded overshoot") {
    val bloom = SparkEntry.queries("dedup_bloom_contamination")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(bloom.nonEmpty)
    val exact = SparkEntry.queries("dedup_contamination")(spark, sf)
      .select($"doc_id", $"n_shared").as[(Long, Long)].collect().toMap
    // one-sided guarantee: every exactly-contaminated doc is flagged,
    // with n_maybe >= its exact overlap; and n_maybe never exceeds the
    // doc's shingle count
    val byId = bloom.map(r => r._1 -> r).toMap
    exact.foreach { case (id, nShared) =>
      val hit = byId.get(id)
      assert(hit.nonEmpty, s"doc $id missed by the Bloom probe")
      assert(hit.get._3 >= nShared && hit.get._4 == nShared)
    }
    bloom.foreach { case (id, nShingles, nMaybe, nExact) =>
      assert(nMaybe >= nExact && nMaybe <= nShingles, s"doc $id bounds")
    }
  }

  test("semantic dedup keeps the least-prototypical member of each dup pair") {
    val dropped = SparkEntry.queries("dedup_semantic")(spark, sf)
      .as[(Long, Int, Double)].collect().map(_._1).toSet
    assert(dropped.nonEmpty)
    // rebuild pairs: for every within-label pair above tau, at least one
    // side must be dropped (coverage), and never both sides kept
    val emb = graft.ops.Tables.embeddings(spark, sf)
      .collect().map { r =>
        val e = r.getSeq[Float](1).map(_.toDouble).toArray
        (r.getLong(0), r.getInt(2), e)
      }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    var pairs = 0
    for {
      i <- emb.indices; j <- (i + 1) until emb.length
      if emb(i)._2 == emb(j)._2
      if math.rint(cos(emb(i)._3, emb(j)._3) * 1e6) / 1e6 >= 0.3
    } {
      pairs += 1
      assert(dropped(emb(i)._1) || dropped(emb(j)._1),
        s"pair (${emb(i)._1}, ${emb(j)._1}) above tau but neither dropped")
    }
    assert(pairs > 0, "no qualifying pairs — vacuous")
  }
}
