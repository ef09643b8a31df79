package graft.ops

import org.apache.spark.ml.clustering.LDA
import org.apache.spark.ml.feature.CountVectorizerModel
import org.apache.spark.ml.linalg.{Vector => MLVector}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML layer (SURVEY §2.10 U5/U6/U8, §7.1 M7): CountVectorizer bag-of-words,
  * seeded LDA topic modeling (reference: Gensim LdaModel k=12/32/auto,
  * random_state=42 — topic_modeling.py:161-206), describeTopics as the
  * (topic_id, rank, word, weight) table (W1 shape — topic_modeling.py:25-40),
  * per-doc dominant-topic argmax (A7 — topic_modeling.py:251-254), and the
  * model-selection scan (U6 — logPerplexity stands in for c_v coherence,
  * divergence documented in SURVEY §7.4).
  *
  * These are NOT SQL-expressible — no DuckDB oracle; the driver records
  * rows-only checks, and MLSpec asserts seeded determinism + shape.
  *
  * Scale notes: CountVectorizer and LDA (online optimizer) are the
  * distributed MLlib implementations — counting is a map-side aggregate,
  * LDA's online variational Bayes processes mini-batches of documents per
  * iteration; nothing collects the corpus to the driver.
  */
object MLOps {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  val K = 5
  val TopWords = 10
  val Seed = 42L

  /** tokens minus stopwords, as the LDA input column. */
  private def docTokens(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sw = graft.functions.Lexicons.stopwordsEn.toSet
    val swCol = array(sw.toSeq.sorted.map(lit): _*)
    documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select($"doc_id", filter(split(lower($"text"), "\\s+"),
        t => length(t) >= 3 && !array_contains(swCol, t)).as("toks"))
  }

  /** Deterministic vectorizer: CountVectorizer.fit breaks corpus-count
    * ties arbitrarily (vocab order — and therefore every downstream LDA
    * topic — changed between fits under concurrent scheduling). Build the
    * vocabulary relationally with a total order (tf desc, word asc), apply
    * the same minDF >= 5 bound, and construct the model from it.
    */
  private def fitVectorizer(df: DataFrame): CountVectorizerModel = {
    import df.sparkSession.implicits._
    val vocab = df
      .select($"doc_id", explode($"toks").as("word"))
      .groupBy($"word")
      .agg(count("*").as("tf"), countDistinct($"doc_id").as("df"))
      .filter($"df" >= 5)
      .orderBy(desc("tf"), asc("word"))
      .limit(50000)
      .select("word").as[String].collect()
    new CountVectorizerModel(vocab)
      .setInputCol("toks").setOutputCol("tf")
  }

  /** LDA input vectors on ONE partition: seeded online VB is only
    * reproducible when the treeAggregate merge order is fixed — with
    * multiple partitions, scheduling order + float non-associativity
    * shift topics between runs (observed). The reference's Gensim run is
    * single-threaded for the same reason it is reproducible. Fit-time
    * parallelism is a documented trade-off here; transform stays parallel.
    */
  private def ldaInput(cv: org.apache.spark.ml.feature.CountVectorizerModel,
      toks: DataFrame): DataFrame =
    cv.transform(toks).select("doc_id", "tf").coalesce(1)

  val queries: Map[String, Q] = Map(
    // U8/A11: the learned vocabulary with corpus counts (deterministic
    // output order by term).
    "u8_bow_vocabulary" -> ((s, d) => {
      import s.implicits._
      val toks = docTokens(s, d)
      val cv = fitVectorizer(toks)
      cv.vocabulary.zipWithIndex.toSeq.toDF("word", "vocab_index")
        .orderBy("word")
    }),

    // U5+W1: LDA topics as the ranked top-10 words table. Seeded; weights
    // rounded to keep the dump stable.
    "u5_lda_topics" -> ((s, d) => {
      import s.implicits._
      val toks = docTokens(s, d)
      val cv = fitVectorizer(toks)
      val vec = ldaInput(cv, toks)
      val lda = new LDA().setK(K).setSeed(Seed).setMaxIter(20)
        .setFeaturesCol("tf")
      val model = lda.fit(vec)
      val vocab = cv.vocabulary
      model.describeTopics(TopWords)
        .select($"topic", posexplode(arrays_zip($"termIndices", $"termWeights")))
        .select($"topic".as("topic_id"),
          ($"pos" + 1).as("rank"),
          element_at(typedLit(vocab.toSeq), ($"col.termIndices" + 1)).as("word"),
          round($"col.termWeights", 4).as("weight"))
        .orderBy("topic_id", "rank")
    }),

    // U5+A7: per-doc dominant topic (argmax of the topic distribution),
    // aggregated to the topic histogram (stats.py:16 shape).
    "u5_lda_doc_topics" -> ((s, d) => {
      import s.implicits._
      val toks = docTokens(s, d)
      val cv = fitVectorizer(toks)
      val vec = ldaInput(cv, toks)
      val model = new LDA().setK(K).setSeed(Seed).setMaxIter(20)
        .setFeaturesCol("tf").fit(vec)
      val argmaxUdf = udf((v: MLVector) => v.argmax)
      model.transform(vec)
        .select($"doc_id", argmaxUdf($"topicDistribution").as("main_topic"))
        .groupBy($"main_topic").agg(count("*").as("n_docs"))
        .orderBy("main_topic")
    }),

    // U6: model-selection scan — k in {2,4,6}, cheap fits, pick by
    // logPerplexity (stands in for the reference's c_v coherence scan over
    // k in 10..40; divergence documented).
    "u6_lda_model_scan" -> ((s, d) => {
      import s.implicits._
      val toks = docTokens(s, d)
      val cv = fitVectorizer(toks)
      val vec = ldaInput(cv, toks).cache()
      val rows = Seq(2, 4, 6).map { k =>
        val m = new LDA().setK(k).setSeed(Seed).setMaxIter(5)
          .setFeaturesCol("tf").fit(vec)
        (k, math.round(m.logPerplexity(vec) * 100) / 100.0)
      }
      vec.unpersist()
      rows.toDF("k", "log_perplexity").orderBy("k")
    }),
  )

  /** Not SQL-expressible — rows-only checks. */
  val oracles: Map[String, String] = Map()
}
