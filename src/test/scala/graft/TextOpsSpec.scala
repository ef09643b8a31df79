package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Text-cleaning semantics (SURVEY §2.8 F1-F9) + seeded property checks
  * (SURVEY §5 strategy #3).
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("t").select(TextOps.cleanText($"t").as("c"))
      .as[String].collect().head

  test("cleaning strips URLs, HTML tags, punctuation, digits, single letters") {
    assert(clean("Visit https://x.com/page NOW!") == "visit now")
    assert(clean("<b>Bold</b> move") == "bold move")
    assert(clean("born in 1984 c") == "born in")
    assert(clean("keep a1b mixed42tokens") == "keep a1b mixed42tokens")
    assert(clean("  many    spaces  ") == "many spaces")
    assert(clean("UPPER lower") == "upper lower")
  }

  test("cleaning output alphabet is [0-9a-z ]") {
    val out = clean("Ünïcode!? <tag> 99 x @#$")
    assert(out.matches("[0-9a-z ]*"))
  }

  test("cleaning is idempotent (seeded property, 100 samples)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcXYZ0189 !<>/:.\t-_https"
    val samples = Seq.fill(100)(
      Seq.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val once = samples.toDF("t").select(TextOps.cleanText($"t").as("c"))
      .as[String].collect()
    val twice = once.toSeq.toDF("t").select(TextOps.cleanText($"t").as("c"))
      .as[String].collect()
    assert(once.toSeq == twice.toSeq)
  }

  test("n_words_clean <= n_words on real docs") {
    val bad = SparkEntry.queries("f_word_counts")(spark, sf)
      .filter($"n_words_clean" > $"n_words").count()
    assert(bad == 0)
  }

  test("repetition ratios are bounded and cover every tokenized doc") {
    val rows = SparkEntry.queries("text_repetition")(spark, sf)
      .as[(Long, Int, Double, Double)].collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == docs) // every doc has >= 1 token in this corpus
    assert(rows.forall { case (_, n, dup, bg) =>
      n >= 1 && dup >= 0.0 && dup < 1.0 && bg >= 0.0 && bg <= 1.0
    })
    // synthetic docs repeat words heavily: the signal must be non-trivial
    assert(rows.exists(_._3 > 0.1))
  }

  test("BM25 returns 15 positive scores in strict rank order") {
    val rows = SparkEntry.queries("text_bm25_topk")(spark, sf)
      .as[(Long, Double)].collect()
    assert(rows.length == 15)
    assert(rows.forall(_._2 > 0.0))
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.reverse.toSeq)
  }

  test("MaxScore pruning is lossless and actually prunes") {
    val qTerms = Seq("spark", "table", "merge", "model", "stream")
    val K = 15
    // rebuild the posting weight table exactly as the query does
    val t = graft.ops.Tables.documents(spark, sf)
      .select($"doc_id", graft.ops.TextOps.tokens($"text").as("t"))
    val dl = t.select($"doc_id", size($"t").as("dl"))
    val st = dl.agg(count(lit(1)).as("n_docs"), avg($"dl").as("avgdl"))
    val tf = t.select($"doc_id", explode($"t").as("word"))
      .filter($"word".isin(qTerms: _*))
      .groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy($"word").agg(count(lit(1)).as("df"))
    val wtab = tf.join(broadcast(df_), "word").join(dl, "doc_id")
      .crossJoin(broadcast(st))
      .withColumn("w",
        log(($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5)) + lit(1.0)) *
          $"tf" * lit(2.2) /
          ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) *
            ($"dl".cast("double") / $"avgdl"))))
      .select($"doc_id", $"word",
        round($"w" * 1e6, 0).cast("long").as("wm"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // exhaustive local ground truth
    val full = wtab.groupBy(_._1).view.mapValues(_.map(_._3).sum).toSeq
      .sortBy { case (id, sc) => (-sc, id) }
    val want = full.take(K).zipWithIndex
      .map { case ((id, sc), i) => (i + 1, id, sc) }
    val got = SparkEntry.queries("retrieval_maxscore_topk")(spark, sf)
      .as[(Int, Long, Long)].collect().toSeq
    assert(got == want, "pruned top-k diverged from the exhaustive scorer")
    // pruning FIRES: replay the threshold logic locally and check the
    // essential-candidate set is strictly smaller than all matching docs
    val ub = wtab.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    val champ = ub.toSeq.sortBy { case (w, u) => (-u, w) }.head._1
    val champDocs = wtab.filter(_._2 == champ).map(_._1).toSet
    val champScores = full.filter(f => champDocs(f._1)).map(_._2)
      .sorted.reverse
    val theta = if (champScores.length >= K) champScores(K - 1) else 0L
    val byUbAsc = ub.toSeq.sortBy { case (w, u) => (u, w) }
    val cums = byUbAsc.scanLeft(0L)(_ + _._2).drop(1)
    val essential = byUbAsc.zip(cums).filter(_._2 >= theta).map(_._1._1).toSet
    val candDocs = wtab.filter(r => essential(r._2)).map(_._1).toSet
    val allDocs = wtab.map(_._1).toSet
    assert(essential.size < ub.size,
      s"no term pruned (theta=$theta, ubs=$ub)")
    assert(candDocs.size < allDocs.size,
      s"pruning never skipped a doc (${candDocs.size} of ${allDocs.size})")
  }

  test("boilerplate strip fully covers exact-duplicate docs, spares unique ones") {
    val rows = SparkEntry.queries("text_boilerplate_strip")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.nonEmpty)
    rows.values.foreach { case (id, n, boiler, kept, ratio) =>
      assert(boiler + kept == n && boiler >= 0 && kept >= 0, s"doc $id")
      assert(ratio >= 0.0 && ratio <= 1.0, s"doc $id ratio")
    }
    // and the strip is selective, not corpus-wide
    assert(rows.values.count(_._3 == 0L) > rows.size / 2,
      "boilerplate flagged in most docs — threshold too loose")
    // planted fixture: an exact-duplicate pair shares EVERY window with
    // its twin (full coverage); a shared 10-token prefix on otherwise
    // unique docs strips exactly the prefix intervals; a fully unique
    // doc is untouched (sf0.001 plants no exact doc dups, so this
    // property is pinned on a constructed corpus)
    val dir = java.nio.file.Files.createTempDirectory("graft_boiler").toString
    val shared = (0 until 10).map(k => s"hdr$k").mkString(" ")
    val docs = Seq(
      (0L, (0 until 20).map(k => s"dupa$k").mkString(" ")),
      (1L, (0 until 20).map(k => s"dupa$k").mkString(" ")),
      (2L, shared + " " + (0 until 15).map(k => s"tailb$k").mkString(" ")),
      (3L, shared + " " + (0 until 15).map(k => s"tailc$k").mkString(" ")),
      (4L, (0 until 20).map(k => s"uniq$k").mkString(" ")))
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fx"))
      .withColumn("n_chars", length($"text"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fx = SparkEntry.queries("text_boilerplate_strip")(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(fx(0L)._5 == 1.0 && fx(1L)._5 == 1.0, "dup pair not fully covered")
    // shared 10-token prefix: flagged windows start at p=0..2, union
    // covers tokens 0..9 (the prefix), nothing of the unique tails
    assert(fx(2L)._3 == 10L && fx(3L)._3 == 10L,
      s"prefix strip: ${fx(2L)._3}/${fx(3L)._3}")
    assert(fx(4L)._3 == 0L, "unique doc stripped")
  }

  test("calibration bins partition the NB test split; ECE consistent") {
    val rows = SparkEntry.queries("ml_calibration_bins")(spark, sf)
      .as[(Long, Long, Double, Double, Long, Double)].collect()
    assert(rows.nonEmpty)
    // bins cover exactly the classifier's test split
    val nTest = SparkEntry.queries("text_nb_classifier")(spark, sf)
      .agg(sum($"n_docs")).as[Long].head()
    assert(rows.map(_._2).sum == nTest)
    rows.foreach { case (b, n, conf, acc, nc, _) =>
      assert(b >= 1 && b <= 10)
      // bin means live inside their bin interval (bin 10 includes 1.0)
      assert(conf >= (b - 1) / 10.0 - 1e-6 &&
        (conf < b / 10.0 + 1e-6 || b == 10L), s"bin $b conf $conf")
      assert(acc >= 0.0 && acc <= 1.0 && nc <= n)
    }
    // the reported ECE matches a recompute from the bin rows
    val n = rows.map(_._2).sum.toDouble
    val eceLocal = rows.map { case (_, nb, conf, acc, _, _) =>
      math.abs(acc - conf) * nb }.sum / n
    assert(math.abs(rows.head._6 - eceLocal) < 1e-4,
      s"ece ${rows.head._6} vs $eceLocal")
  }

  test("KN bigram LM: local replay + exact per-history normalization") {
    def q(v: Double, s: Double): Long =
      BigDecimal(v * s).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toLongExact
    val D = 0.75
    val raw = graft.ops.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        (id, t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq) }
    val buckets = graft.ops.Tables.documents(spark, sf)
      .select($"doc_id", (graft.functions.PolyHash.poly_hash(
        $"doc_id".cast("string")) % 10).as("b"))
      .as[(Long, Long)].collect().toMap
    val train = raw.filter(r => buckets(r._1) < 8)
    val test = raw.filter(r => buckets(r._1) == 9)
    val bi = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    train.foreach { case (_, t) =>
      t.sliding(2).filter(_.length == 2).foreach(p => bi((p(0), p(1))) += 1) }
    val ch = bi.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val n1f = bi.toSeq.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val n1b = bi.toSeq.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val nbt = bi.size.toLong
    val vocab = train.flatMap(_._2).distinct
    val v = vocab.length.toLong
    def pcont(w2: String): Double =
      (n1b.getOrElse(w2, 0L) + 1).toDouble / (nbt + v).toDouble
    def p(w1: String, w2: String): Double = ch.get(w1) match {
      case Some(c) =>
        math.max(bi((w1, w2)).toDouble - D, 0.0) / c +
          (D * n1f(w1).toDouble / c) * pcont(w2)
      case None => pcont(w2)
    }
    // interpolated KN normalizes EXACTLY over the vocab for seen
    // histories (the discount mass equals the continuation mass)
    ch.keys.take(3).foreach { w1 =>
      val tot = vocab.map(w2 => p(w1, w2)).sum
      assert(math.abs(tot - 1.0) < 1e-9, s"history '$w1' sums to $tot")
    }
    val exp = test.flatMap { case (id, t) =>
      val grams = t.sliding(2).filter(_.length == 2).toSeq
      if (grams.isEmpty) None
      else {
        val snll = grams.map(g => q(-math.log(p(g(0), g(1))), 1e6)).sum
        Some(id -> (grams.length.toLong, snll))
      }
    }.toMap
    val got = SparkEntry.queries("text_kn_bigram")(spark, sf)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.length == exp.size, "one row per scoreable held-out doc")
    got.foreach { case (id, n, nll, ppl) =>
      val (en, esnll) = exp(id)
      assert(n == en, s"doc $id bigram count")
      assert(math.abs(nll - esnll / 1e6 / en) < 1e-6, s"doc $id nll")
      assert(nll > 0.0 && math.abs(ppl - math.exp(esnll / 1e6 / en)) < 1e-3,
        s"doc $id ppl")
    }
  }

  test("conformal sets: rank formula, threshold monotonicity, coverage") {
    val rows = SparkEntry.queries("ml_conformal_split")(spark, sf)
      .as[(Double, Long, Long, Double, Long, Double, Double)].collect()
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0.1, 0.2))
    val nClasses = SparkEntry.queries("text_nb_classifier")(spark, sf)
      .select($"true_lang").distinct().count()
    rows.foreach { case (alpha, nCal, k, qhat, nEval, avgSz, cov) =>
      // k = ceil((n+1)(1-alpha)) replayed locally in exact rationals
      val (num, den) = if (alpha == 0.1) (9L, 10L) else (4L, 5L)
      assert(k == ((nCal + 1) * num + den - 1) / den, s"alpha $alpha rank")
      assert(qhat >= 0.0 && qhat <= 1.0 && nEval > 0)
      assert(avgSz >= 0.0 && avgSz <= nClasses.toDouble,
        s"set size $avgSz vs $nClasses classes")
      // finite-sample slack: the 1-alpha guarantee is marginal over
      // calibration draws; allow 3 binomial sigmas on this fixed split
      val slack = 3.0 * math.sqrt(alpha * (1 - alpha) / nEval)
      assert(cov >= 1.0 - alpha - slack,
        s"alpha $alpha coverage $cov below ${1 - alpha} - $slack")
    }
    // lower alpha demands MORE coverage -> larger threshold and sets
    assert(rows(0)._4 >= rows(1)._4, "qhat not monotone in coverage level")
    assert(rows(0)._6 >= rows(1)._6, "set size not monotone")
    assert(rows(0)._7 >= rows(1)._7, "coverage not monotone")
  }

  test("Zipf fit matches an exact local OLS over the same rank table") {
    val rows = SparkEntry.queries("text_zipf_slope")(spark, sf)
      .as[(Long, String, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to math.min(10, rows.length)))
    assert(rows.map(r => (r._4, r._5)).distinct.length == 1)
    // frequencies non-increasing by rank; local micro-int OLS replay
    rows.sliding(2).foreach { case Array(a, b) => assert(b._3 <= a._3) }
    val freqs = graft.ops.Tables.documents(spark, sf)
      .select(explode(graft.ops.TextOps.tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("f"))
      .as[(String, Long)].collect()
      .sortBy { case (w, f) => (-f, w) }.take(10000).zipWithIndex
    def q(v: Double): Long =
      BigDecimal(v * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toLongExact
    val pts = freqs.map { case ((_, f), i) =>
      (q(math.log((i + 1).toDouble)), q(math.log(f.toDouble))) }
    val n = pts.length.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    assert(math.abs(rows.head._4 - slope) < 1e-6, s"${rows.head._4} vs $slope")
    assert(rows.head._4 < 0.0, "rank-frequency slope must be negative")
  }

  test("Heaps curve checkpoints match exact local totals") {
    val rows = SparkEntry.queries("text_heaps_law")(spark, sf)
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 10L))
    // cumulative and final totals agree with a direct local recompute
    val toks = graft.ops.Tables.documents(spark, sf)
      .select(graft.ops.TextOps.tokens($"text").as("t"))
      .as[Seq[String]].collect()
    assert(rows.last._2 == toks.map(_.length.toLong).sum, "total tokens")
    assert(rows.last._3 == toks.flatten.distinct.length.toLong, "vocab size")
    // monotone growth curve; one shared (beta, K) fit on every row
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 > a._2 && b._3 >= a._3, s"curve not monotone at ${b._1}") }
    assert(rows.map(r => (r._4, r._5)).distinct.length == 1)
  }

  test("LM scores are log-probabilities (<= 0) over every multi-token doc") {
    val rows = SparkEntry.queries("text_lm_score")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, n, lp) => n >= 1 && lp <= 1e-9 })
    // corpus-typical docs must score strictly better than ln of the
    // rarest possible transition (a bigram seen once after a common word)
    assert(rows.exists(_._3 > -5.0))
  }

  test("VADER threshold boundaries at exactly ±0.05") {
    val labeled = Seq(0.05, 0.049999, -0.05, -0.049999, 0.0).toDF("s")
      .withColumn("label",
        when($"s" >= 0.05, "positive")
          .when($"s" <= -0.05, "negative")
          .otherwise("neutral"))
      .as[(Double, String)].collect().toMap
    assert(labeled(0.05) == "positive")
    assert(labeled(0.049999) == "neutral")
    assert(labeled(-0.05) == "negative")
    assert(labeled(-0.049999) == "neutral")
    assert(labeled(0.0) == "neutral")
  }

  test("vader compound is bounded in (-1, 1) and neutral docs score 0") {
    val scored = SparkEntry.queries("u3_vader_sentiment")(spark, sf)
    assert(scored.filter(abs($"sentiment_score") >= 1.0).count() == 0)
  }

  test("langid confidence is a ratio in [0,1]") {
    val out = SparkEntry.queries("text_langid")(spark, sf)
    assert(out.filter($"confidence" < 0 || $"confidence" > 1).count() == 0)
  }

  test("tfidf returns exactly top-15 with positive scores") {
    val out = SparkEntry.queries("u7_tfidf_top_terms")(spark, sf).collect()
    assert(out.length == 15)
    assert(out.forall(_.getDouble(1) > 0))
  }

  test("fingerprint is order-sensitive") {
    val q = (s: String) => {
      Seq(s).toDF("text")
        .select(aggregate(
          transform(filter(split(lower($"text"), "\\s+"), t => length(t) > 0),
            t => graft.functions.PolyHash.poly_hash(t)),
          lit(0L), (acc, x) => pmod(acc * 31L + x, lit(1000000007L))).as("fp"))
        .as[Long].collect().head
    }
    assert(q("alpha beta") != q("beta alpha"))
    assert(q("alpha beta") == q("alpha beta"))
  }

  test("PII redaction finds every planted item and strips them all") {
    val rows = SparkEntry.queries("text_pii_redact")(spark, sf)
      .as[(Long, Int, Int, Int, String)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (id, ne, np, ni, red) =>
      ne == (if (id % 2 == 0) 1 else 0) &&
        np == (if (id % 3 == 0) 1 else 0) &&
        ni == 1 &&
        !red.contains("@") && !red.contains("+1-555") &&
        red.contains("<IP>")
    })
    // non-vacuous: both redaction branches must actually fire somewhere
    assert(rows.exists(_._2 == 1) && rows.exists(_._3 == 1))
  }

  test("sequence packing conserves docs/tokens and packs contiguously") {
    val packs = SparkEntry.queries("pack_sequences")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val t = SparkEntry.queries("text_token_count")(spark, sf)
      .select($"doc_id", $"ws_tokens".cast("long")).as[(Long, Long)].collect()
    // conservation: every doc lands in exactly one pack
    assert(packs.map(_._3).sum == t.length)
    assert(packs.map(_._4).sum == t.map(_._2).sum)
    // a pack's first token offset is below (seq+1)*budget by construction;
    // consecutive seqs within a bucket never skip more than a doc overrun
    packs.groupBy(_._1).foreach { case (_, ps) =>
      val seqs = ps.map(_._2).sorted
      assert(seqs.head >= 0)
      // multiple packs per bucket: the corpus is far larger than one budget
      assert(seqs.length > 1)
    }
    // doc ranges within a bucket must not interleave across seqs
    packs.groupBy(_._1).foreach { case (_, ps) =>
      val ordered = ps.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._6 < b._5) // last_doc < next first_doc
        case _           =>
      }
    }
  }

  test("pretrain pipeline: planted dups die, sample rate lands near 80%") {
    val shards = SparkEntry.queries("pipeline_pretrain_corpus")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(shards.length == 8)
    // keep-first dedup always keeps the lower-id original, so no planted
    // (+1000000) copy may survive into any shard
    assert(shards.map(_._5).max < 1000000)
    val kept = shards.map(_._2).sum
    val eligible = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
      .withColumn("n", size(split(lower($"text"), "\\s+")))
      .filter($"n" >= 30).count()
    val rate = kept.toDouble / eligible
    assert(rate > 0.7 && rate < 0.9, s"sample rate $rate")
  }

  test("weighted WOR sample: conservation, no repeats, matches local A-ES") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("sample_weighted_ares")(spark, sf)
      .as[(String, Int, Long, Int, Double)].collect()
    assert(got.nonEmpty)
    // local ground truth: same hash-uniform, same exponential key, same
    // rounding, top-10 smallest per stratum — an independent replay of
    // the Efraimidis–Spirakis draw
    def round9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val corpus = graft.ops.Tables.documents(spark, sf)
      .select($"source", $"doc_id",
        size(filter(split(lower($"text"), "\\s+"), t => length(t) > 0)).as("w"))
      .as[(String, Long, Int)].collect()
    val want = corpus.filter(_._3 >= 1).groupBy(_._1).toSeq
      .flatMap { case (src, rows) =>
        rows.toSeq.map { case (_, id, w) =>
          val u = (graft.functions.PolyHash.hashString(id.toString) + 1) / 1000000008.0
          (round9(-math.log(u) / w), id, w)
        }.sortBy(r => (r._1, r._2)).take(10).zipWithIndex
          .map { case ((k, id, w), i) => (src, i + 1, id, w, k) }
      }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == want)
    // conservation: exactly min(10, stratum size) picks per stratum
    val bySrc = corpus.filter(_._3 >= 1).groupBy(_._1).view.mapValues(_.length)
    got.groupBy(_._1).foreach { case (src, picks) =>
      assert(picks.length == math.min(10, bySrc(src)))
      assert(picks.map(_._3).distinct.length == picks.length, "WOR violated")
    }
  }

  test("ngram novelty: covers exactly the test split, bounded, exact on a probe") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("text_ngram_novelty")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, novel, ratio) =>
      assert(novel >= 0 && novel <= n && ratio >= 0.0 && ratio <= 1.0)
    }
    // the report covers exactly the hash-split test docs with >= 8 tokens
    val toks = graft.ops.Tables.documents(spark, sf)
      .select($"doc_id", filter(split(lower($"text"), "\\s+"),
        t => length(t) > 0).as("tk"))
      .as[(Long, Seq[String])].collect()
    def bucket(id: Long): Long =
      graft.functions.PolyHash.hashString(id.toString) % 10
    val wantIds = toks.filter { case (id, tk) =>
      bucket(id) >= 8 && tk.length >= 8
    }.map(_._1).toSet
    assert(rows.map(_._1).toSet == wantIds)
    // local recompute of one doc's novelty — an independent probe of the
    // anti-membership arithmetic
    val trainGrams = toks.filter(t => bucket(t._1) < 8).flatMap { case (_, tk) =>
      tk.sliding(8).filter(_.length == 8).map(_.mkString(" "))
    }.toSet
    val (pid, ptk) = toks.filter(t => wantIds.contains(t._1)).head
    val probe = ptk.sliding(8).filter(_.length == 8).map(_.mkString(" ")).toSeq
    val wantNovel = probe.count(g => !trainGrams.contains(g))
    val got = rows.find(_._1 == pid).get
    assert(got._2 == probe.size && got._3 == wantNovel)
  }

  test("epoch shuffle: true permutations, uncorrelated across epochs") {
    val rows = SparkEntry.queries("sink_epoch_shuffle")(spark, sf)
      .as[(Int, Int, Long)].collect()
    val docs = graft.ops.Tables.documents(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(0, 1))
    byEpoch.foreach { case (_, es) =>
      // each epoch covers every doc exactly once at contiguous positions
      assert(es.map(_._3).toSet == docs)
      assert(es.map(_._2).sorted.toSeq == (1 to docs.size))
    }
    // the two epoch orderings genuinely differ (hash-decorrelated)
    val o0 = byEpoch(0).sortBy(_._2).map(_._3).toSeq
    val o1 = byEpoch(1).sortBy(_._2).map(_._3).toSeq
    assert(o0 != o1)
    val agree = o0.zip(o1).count { case (a, b) => a == b }
    assert(agree < docs.size / 10, s"epoch orders too correlated: $agree")
  }

  test("DoReMi weights follow the closed form from the LM scores") {
    // replay the closed form locally from text_lm_score + the source map
    // with the same micro-integer quantization, and compare every output
    val srcOf = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val perDoc = SparkEntry.queries("text_lm_score")(spark, sf)
      .select($"doc_id", $"avg_logprob").as[(Long, Double)].collect()
    val bySrc = perDoc.groupBy { case (id, _) => srcOf(id) }
      .map { case (src, rows) =>
        src -> (rows.length.toLong,
          rows.map { case (_, lp) => math.round(lp * -1e6) }.sum)
      }
    val tn = bySrc.values.map(_._1).sum
    val tsnll = bySrc.values.map(_._2).sum
    val refNll = tsnll.toDouble / tn / 1e6
    val wm = bySrc.map { case (src, (n, snll)) =>
      val excess = math.max(0.0, snll.toDouble / n / 1e6 - refNll)
      src -> math.round((n.toDouble / tn) * math.exp(excess) * 1e6)
    }
    val tw = wm.values.sum
    val mw = wm.values.max
    val got = SparkEntry.queries("corpus_doremi_weights")(spark, sf)
      .as[(String, Long, Double, Double, Double, Long)].collect()
    assert(got.map(_._1).toSet == bySrc.keySet)
    got.foreach { case (src, n, _, excess, weight, rate) =>
      assert(n == bySrc(src)._1)
      assert(math.abs(weight - wm(src).toDouble / tw) < 1e-6, src)
      assert(rate == wm(src) * 1000 / mw, src)
      assert(excess >= 0.0)
    }
    // weights normalize and the upweighting is real: every zero-excess
    // source keeps exactly its baseline share of the tilted mass
    assert(math.abs(got.map(_._5).sum - 1.0) < 1e-4)
    assert(got.map(_._6).max == 1000L)
  }

  test("BM25 self-retrieval eval: every query doc found, strong MRR") {
    val rows = SparkEntry.queries("text_bm25_eval")(spark, sf)
      .as[(Long, Int, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { case (_, rank, rr) =>
      assert(rank >= 1)
      assert(math.abs(rr - math.floor(1e6 / rank) / 1e6) < 2e-6 ||
        math.abs(rr - 1.0 / rank) < 1e-6)
    }
    // a doc queried by its own top terms must rank highly — only planted
    // exact duplicates (doc_id ties) push self past rank 1 (measured MRR
    // 0.78 at sf0.001)
    val mrr = rows.map(_._3).sum / rows.length
    assert(mrr >= 0.5, s"MRR $mrr")
    assert(rows.exists(_._2 == 1), "no query retrieved itself at rank 1")
  }

  test("NB classifier covers every test doc and beats the chance rate") {
    val rows = SparkEntry.queries("text_nb_classifier")(spark, sf)
      .as[(String, String, Long)].collect()
    assert(rows.nonEmpty)
    val total = rows.map(_._3).sum
    // every test-bucket (8,9) doc classified exactly once
    val testDocs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id").as[Long].collect()
      .count(id => math.floorMod(
        graft.functions.PolyHash.hashString(id.toString), 10L) >= 8)
    assert(total == testDocs, s"classified $total of $testDocs test docs")
    // the synthetic langs are only weakly separable (shared template
    // vocabulary) — measured 0.40 accuracy at sf0.01 vs 0.20 chance;
    // the classifier must at least beat chance
    val acc = rows.filter(r => r._1 == r._2).map(_._3).sum.toDouble / total
    assert(acc > 0.2, s"accuracy $acc not above the 5-class chance rate")
  }

  test("corpus stats card is a consistent datasheet") {
    val rows = SparkEntry.queries("corpus_stats_card")(spark, sf)
      .as[(String, String, Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_._3).sum == docs)
    assert(rows.forall { case (_, _, n, u, tok, ch, avg, dup) =>
      u <= n && tok > 0 && ch > 0 && avg > 0 &&
        dup >= 0.0 && dup < 1.0 &&
        math.abs(dup - (1.0 - u.toDouble / n)) < 1e-5
    })
  }

  test("PRF expansion returns dense top-5 lists with genuine new terms") {
    val rows = SparkEntry.queries("retrieval_prf_expansion")(spark, sf)
      .as[(Long, Int, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.size == 10, s"expected 10 query docs, got ${byQuery.size}")
    byQuery.foreach { case (qdoc, qRows) =>
      val sorted = qRows.sortBy(_._2)
      // dense 1..5 ranks with non-increasing scores, self excluded
      assert(sorted.map(_._2).toSeq == (1 to 5),
        s"qdoc $qdoc ranks ${sorted.map(_._2).mkString(",")}")
      assert(sorted.sliding(2).forall(p => p(0)._4 >= p(1)._4),
        s"qdoc $qdoc scores not non-increasing")
      assert(sorted.forall(_._3 != qdoc), s"qdoc $qdoc retrieved itself")
      // the expansion really fired: 2 distinct informative terms mined
      // from the feedback docs, none of them a stopword
      val terms = sorted.head._5.split(" ").filter(_.nonEmpty)
      assert(terms.length == 2 && terms.distinct.length == 2,
        s"qdoc $qdoc expansion terms '${sorted.head._5}'")
      assert(terms.forall(t => t.length >= 4 &&
        !graft.functions.Lexicons.stopwordsEn.contains(t)),
        s"qdoc $qdoc expansion terms '${sorted.head._5}' fail the filter")
      assert(sorted.forall(_._5 == sorted.head._5),
        s"qdoc $qdoc expansion terms differ across ranks")
    }
  }

  test("per-source KL drift matches a local recompute and is nonnegative") {
    val rows = SparkEntry.queries("text_drift_kl")(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, nTok, nTypes, klE9, kl) =>
      assert(nTok > 0 && nTypes > 0)
      // KL >= 0 in exact math; quantization error is < nTypes/2 nanounits
      assert(klE9 > -nTypes, s"$src: kl_e9 $klE9")
      assert(math.abs(kl - klE9 / 1e9) < 1e-5)
    }
    // exact integer recompute for one source, same quantization
    val docs = graft.ops.Tables.documents(spark, sf)
      .select($"source", $"text").as[(String, String)].collect()
    val toks = docs.flatMap { case (s, t) =>
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).map(s -> _)
    }
    val corpus = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nAll = toks.length.toLong
    val src0 = rows.map(_._1).min
    val mine = toks.filter(_._1 == src0).map(_._2)
    val nS = mine.length.toLong
    val klLocal = mine.groupBy(identity).map { case (w, ws) =>
      val c = ws.length.toLong
      val term = (c.toDouble / nS) *
        math.log((c.toDouble / nS) / (corpus(w).toDouble / nAll))
      BigDecimal(term * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    }.sum
    val row0 = rows.find(_._1 == src0).get
    assert(row0._2 == nS && row0._4 == klLocal,
      s"$src0: engine (${row0._2}, ${row0._4}) vs local ($nS, $klLocal)")
  }

  test("OOV rate is a genuine rate and the vocab covers most tokens") {
    val rows = SparkEntry.queries("text_oov_rate")(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, nTok, nOov, rate) =>
      assert(nOov >= 0 && nOov <= nTok, src)
      assert(math.abs(rate - nOov.toDouble / nTok) < 1e-5)
    }
    // the DF>=5 vocab covers the shared synthetic vocabulary: the
    // corpus-wide OOV mass stays a small minority of all tokens
    val totTok = rows.map(_._2).sum
    val totOov = rows.map(_._3).sum
    assert(totOov < totTok / 2, s"OOV mass $totOov of $totTok")
  }

  test("char entropy matches a local recompute and sits in [0, log2|A|]") {
    val rows = SparkEntry.queries("text_char_entropy")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, alpha, _, ent) =>
      assert(n > 0 && alpha > 0, s"doc $id")
      // ln-based entropy is bounded by ln of the alphabet size
      assert(ent >= 0.0 && ent <= math.log(alpha.toDouble) + 1e-6,
        s"doc $id: entropy $ent vs ln($alpha)")
    }
    // exact integer recompute for the first doc, same quantization
    val (id0, _, _, ent0, _) = rows.minBy(_._1)
    val text = graft.ops.Tables.documents(spark, sf)
      .filter($"doc_id" === id0).select($"text").as[String].collect().head
    val chars = text.toLowerCase.split("").filter(_.nonEmpty)
    val n = chars.length.toDouble
    val local = chars.distinct.map { c =>
      val p = chars.count(_ == c) / n
      BigDecimal(-p * math.log(p) * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    }.sum
    assert(ent0 == local, s"doc $id0: engine $ent0 vs local $local")
  }

  test("curriculum phases are equal-depth, exhaustive, and quality-ordered") {
    val rows = SparkEntry.queries("corpus_curriculum_phases")(spark, sf)
      .as[(Int, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 4))
    val nDocs = graft.ops.Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum == nDocs)
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1, "not equal depth")
    // phases ascend in quality; boundaries may share one tied score
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._5 <= b._4 + 1e-9,
        s"phase ${a._1} hi ${a._5} > phase ${b._1} lo ${b._4}")
      case _ =>
    }
  }

  test("keyword tags cover only taxonomy terms with hits >= doc reach") {
    val rows = SparkEntry.queries("text_keyword_tag")(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    val tax = graft.ops.TextOps.KeywordTaxonomy.toSet
    rows.foreach { case (tag, nDocs, nHits) =>
      assert(tax.contains(tag), s"tag $tag not in taxonomy")
      assert(nHits >= nDocs && nDocs > 0)
    }
    // exact recompute for one tag
    val tag0 = rows.head._1
    val docs = graft.ops.Tables.documents(spark, sf)
      .select($"text").as[String].collect()
      .map(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
    val withTag = docs.filter(_.contains(tag0))
    assert(withTag.length.toLong == rows.head._2)
    assert(withTag.map(_.count(_ == tag0).toLong).sum == rows.head._3)
  }

  // ---------------------------------------------------------------
  // Heavy-tail fixture for the corpus-card trio (round-11 VERDICT #6).
  // The driver testdata draws from a ~31-word bank, so Heaps/Zipf/
  // boilerplate are trivially saturated there (β = 0, slope −0.18 —
  // the correct verdict for a template corpus, spec'd above as such).
  // This fixture is the distribution those ops will actually meet: a
  // deterministic splitmix64 + Zipf(s=1) sampler over a 50k-word
  // domain, 600 docs × 1000 tokens (600k tokens keeps rank 10000 at
  // freq ≈ 5, so the fit range sits above the freq-1 plateau that
  // would flatten the slope), with a fixed 40-token boilerplate band
  // planted at the head of every EVEN doc.
  // ---------------------------------------------------------------

  test("watermark detector flags a planted green-chain doc, and only it") {
    // greedy construction of a WATERMARKED doc: pick each next token so
    // the bigram hash lands green (parity 0) — exactly what a
    // watermarking LLM's sampler does with its green-list bias turned
    // all the way up (γ=0.5, δ→∞). T=40 all-green pairs → z = √40 ≈
    // 6.3 > 4; an anti-chain (all red) must read z ≈ −6.3 and NOT flag
    // (the test is one-sided); a normal doc sits |z| ~ 1.
    val dir = "target/tmp/watermark_fixture"
    def chain(parity: Long, n: Int): String = {
      val toks = scala.collection.mutable.ListBuffer("wmseed")
      while (toks.length <= n) {
        val prev = toks.last
        val next = (0 until 10000).map(k => s"tk$k").find(c =>
          ((graft.functions.PolyHash.hashString(s"$prev#$c") % 2) + 2) % 2
            == parity).get
        toks += next
      }
      toks.mkString(" ")
    }
    val docs = Seq(
      (1L, chain(0L, 40)), // watermarked: every pair green
      (2L, chain(1L, 40)), // anti-chain: every pair red
      (3L, (0 until 41).map(k => s"plain$k word$k").mkString(" ")))
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("fx"))
      .withColumn("n_chars", length($"text"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("text_watermark_greenlist")(spark, dir)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(1L)._3 == rows(1L)._2, "green chain not fully green")
    assert(rows(1L)._5, s"watermarked doc not flagged: z=${rows(1L)._4}")
    assert(rows(1L)._4 > 6.0)
    assert(rows(2L)._3 == 0L && !rows(2L)._5, "red chain misread")
    assert(rows(2L)._4 < -6.0)
    assert(!rows(3L)._5, s"plain doc false-flagged: z=${rows(3L)._4}")
    // the live corpus is all-human: nothing at sf0.001 may trip the flag
    val corpus = SparkEntry.queries("text_watermark_greenlist")(spark, sf)
      .filter($"watermarked").count()
    assert(corpus == 0L, s"$corpus human docs false-flagged at sf0.001")
  }

  private lazy val heavyTailDir: String = {
    val dir = "target/tmp/heavytail_fixture"
    val V = 50000
    val cum = new Array[Double](V)
    var acc = 0.0
    var r = 0
    while (r < V) { acc += 1.0 / (r + 1); cum(r) = acc; r += 1 }
    val h = acc
    var state = 0x5DEECE66DL
    def nextU(): Double = {
      // splitmix64: full-period, no low-bit structure
      state += 0x9E3779B97F4A7C15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (z >>> 11).toDouble / 9007199254740992.0
    }
    def nextWord(): String = {
      val u = nextU() * h
      var lo = 0; var hi = V - 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cum(mid) < u) lo = mid + 1 else hi = mid
      }
      "w" + (lo + 1)
    }
    val boiler = (1 to 40).map(i => s"boilerband$i").mkString(" ")
    val docs = (1 to 600).map { id =>
      val body = Array.fill(1000)(nextWord()).mkString(" ")
      val text = if (id % 2 == 0) boiler + " " + body else body
      (id.toLong, text, "en", "fixture", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("zipf slope recovers ~ -1 on a sampled Zipf(1) corpus") {
    val rows = SparkEntry.queries("text_zipf_slope")(spark, heavyTailDir)
      .collect()
    assert(rows.length == 10)
    val slope = rows.head.getAs[Double]("zipf_slope")
    // −1 is the generator's truth; the band excludes both the flat
    // synthetic verdict (−0.18) and a plateau-dragged underfit.
    assert(slope > -1.35 && slope < -0.70, s"zipf_slope $slope not ~ -1")
    // rank-1 fitted frequency must be the right order of magnitude:
    // N/H = 600000/ln-ish(50k) ≈ 5.5e4
    val c = rows.head.getAs[Double]("zipf_c")
    assert(c > 1e4 && c < 3e5, s"zipf_c $c implausible for N=600k")
  }

  test("heaps beta shows sustained vocab growth on the heavy-tail fixture") {
    val rows = SparkEntry.queries("text_heaps_law")(spark, heavyTailDir)
      .collect()
    assert(rows.length == 10)
    val beta = rows.head.getAs[Double]("beta")
    // saturated template corpus reads ~0 (spec'd above); a heavy-tail
    // draw must keep discovering vocabulary in every decile
    assert(beta > 0.35 && beta < 0.95, s"beta $beta not heavy-tail growth")
    val last = rows.last
    assert(last.getAs[Long]("cum_vocab") > 10000,
      "50k-domain Zipf draw should surface >10k distinct words")
  }

  test("ngram novelty is exact on the heavy-tail fixture (wide-hash pin)") {
    // Unique held-out content must read novelty = 1.0 EXACTLY. This
    // pins the round-12 wide-hash fix: with the old single ~30-bit
    // gram hash, the ~480k-gram train set gives each held-out gram a
    // ~5e-4 false "seen" probability — ≈0.5 phantom matches per
    // 993-gram doc, so a large fraction of clean docs dipped below 1.
    val rows = SparkEntry.queries("text_ngram_novelty")(spark, heavyTailDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty")))
    assert(rows.nonEmpty)
    val (odd, even) = rows.partition(_._1 % 2 == 1)
    assert(odd.nonEmpty && even.nonEmpty)
    odd.foreach { case (id, (_, _, nov)) =>
      assert(nov == 1.0, s"held-out doc $id: unique body scored $nov")
    }
    even.foreach { case (id, (ng, nn, _)) =>
      // 1033 grams; starts 0..32 sit inside the shared boiler band
      // (always seen), starts 33..39 span into the body and are seen
      // only when a train doc shares the same leading body tokens
      assert(ng == 1033L, s"doc $id n_grams $ng")
      assert(nn >= 993L && nn <= 1000L, s"doc $id n_novel $nn")
    }
  }

  test("substring spans flag only genuine shares on the heavy-tail fixture") {
    // dedup_substring_spans reports per-doc shared 20-token windows —
    // bucket sharing IS the output, so this is the second wide-hash pin:
    // pre-fix, ~180 phantom collisions across the fixture's ~600k
    // windows put clean odd docs into the report. Genuine shares here:
    // the 40-token boiler band (even docs: window starts 0..20 fully
    // inside, up to 39 via matching leading body tokens) and the op's
    // own planted half-doc copies (id % 50 == 0 → +2000000 twins share
    // every window with their source).
    val rows = SparkEntry.queries("dedup_substring_spans")(spark, heavyTailDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared"))
      .toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, shared) =>
      val base = if (id >= 2000000) id - 2000000 else id
      if (base % 50 == 0)
        assert(shared >= 400L, s"planted half-copy pair $id: $shared")
      else if (id % 2 == 0)
        assert(shared >= 21L && shared <= 40L, s"band-only doc $id: $shared")
      else
        fail(s"clean odd doc $id reported $shared shared windows")
    }
    // non-vacuous on both classes
    assert(rows.keys.exists(id => id % 50 == 0))
    assert(rows.keys.exists(id => id % 2 == 0 && id % 50 != 0))
  }

  test("boilerplate strip: exact recall and precision on planted bands") {
    val rows = SparkEntry.queries("text_boilerplate_strip")(spark, heavyTailDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("boiler_tokens")))
      .toMap
    assert(rows.size == 600)
    rows.foreach { case (id, (n, b)) =>
      if (id % 2 == 0) {
        // full recall: windows starting at 0..32 sit inside the band,
        // so the island covers at least max-min+W = 40 tokens. Up to 7
        // boundary windows (band tail + first body tokens) can ALSO be
        // genuinely shared when two planted docs draw the same leading
        // body token(s) — those are real cross-doc repeats, so the
        // precision bound is 40+7, not 40.
        assert(n == 1040L, s"doc $id n_tokens $n")
        assert(b >= 40L && b <= 47L,
          s"doc $id: planted 40 boiler tokens, stripped $b")
      } else {
        assert(n == 1000L, s"doc $id n_tokens $n")
        assert(b == 0L, s"doc $id: clean doc stripped $b tokens")
      }
    }
  }
  test("gopher rules: verdict consistent with its reported signals; planted fixture separates") {
    val rows = SparkEntry.queries("text_gopher_rules")(spark, sf)
      .as[(Long, Long, Double, Double, Double, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, mwl, ar, sr, ns, p) =>
      val want = n >= 50L && n <= 100000L && mwl >= 3.0 && mwl <= 10.0 &&
        sr <= 0.1 && ar >= 0.8 && ns >= 2L
      assert(p == want, s"doc $id verdict $p vs recomputed $want")
    }
    // the synthetic corpus legitimately fails the battery (its 31-word
    // vocab carries only 'the' from the required-stopword list and docs
    // top out at 99 words) — non-vacuity of BOTH verdicts is proven on a
    // planted fixture instead: one doc engineered to pass every rule,
    // one too short
    val dir = "target/tmp/gopher_fixture"
    val passTxt = (Seq("the", "and", "that") ++ Seq.fill(57)("word"))
      .mkString(" ")
    Seq((1L, passTxt, "en", "src0", passTxt.length.toLong),
      (2L, "tiny doc", "en", "src0", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fx = SparkEntry.queries("text_gopher_rules")(spark, dir)
      .as[(Long, Long, Double, Double, Double, Long, Boolean)].collect()
      .map(r => r._1 -> r._7).toMap
    assert(fx(1L) && !fx(2L), s"fixture verdicts $fx")
  }

  test("unimax allocation equals the sequential greedy; budget conserved") {
    def check(dir: String, wantBothRegimes: Boolean): Unit = {
      val rows = SparkEntry.queries("corpus_unimax_weights")(spark, dir)
        .as[(String, Long, Long, Boolean, Double, Double)].collect()
      assert(rows.nonEmpty)
      val caps = rows.map(r => r._1 -> r._3).sortBy(r => (r._2, r._1))
      val budget = caps.map(_._2).sum / 2
      var remaining = budget.toDouble
      val k = caps.length
      val greedy = caps.zipWithIndex.map { case ((src, cap), i) =>
        val a = math.min(cap.toDouble, remaining / (k - i))
        remaining -= a
        src -> a
      }.toMap
      rows.foreach { case (src, _, _, _, alloc, _) =>
        assert(math.abs(alloc - greedy(src)) < 1e-4,
          s"$dir: $src alloc $alloc vs greedy ${greedy(src)}")
      }
      // waterfilling exhausts the budget exactly
      assert(math.abs(rows.map(_._5).sum - budget) < 1e-2, s"$dir budget")
      if (wantBothRegimes)
        assert(rows.exists(_._4) && rows.exists(!_._4),
          s"$dir should exercise both cap-bound and equal-share regimes")
    }
    // the real corpus (uniform sources => typically all equal-share)
    check(sf, wantBothRegimes = false)
    // skewed planted fixture: caps (4, 8, 16, 400), budget 214 => the
    // three small sources cap-bound, the big one equal-share at 186
    val dir = "target/tmp/unimax_fixture"
    val rows = Seq.tabulate(1)(i => (100L + i, "a b", "en", "s_a", 3L)) ++
      Seq.tabulate(2)(i => (200L + i, "a b", "en", "s_b", 3L)) ++
      Seq.tabulate(4)(i => (300L + i, "a b", "en", "s_c", 3L)) ++
      Seq.tabulate(100)(i => (400L + i, "a b", "en", "s_d", 3L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    check(dir, wantBothRegimes = true)
    val fx = SparkEntry.queries("corpus_unimax_weights")(spark, dir)
      .as[(String, Long, Long, Boolean, Double, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(fx("s_a") == 4.0 && fx("s_b") == 8.0 && fx("s_c") == 16.0 &&
      fx("s_d") == 186.0, s"fixture allocations $fx")
  }

}
