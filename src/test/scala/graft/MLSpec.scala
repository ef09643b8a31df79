package graft

/** ML-layer shape + seeded-determinism checks (no SQL oracle exists for
  * these — SURVEY §5 strategy #4).
  */
class MLSpec extends SparkSpec {
  import spark.implicits._

  test("LDA topics table has k topics × 10 ranked words, seeded-stable") {
    val a = SparkEntry.queries("u5_lda_topics")(spark, sf).collect()
    assert(a.length == graft.ops.MLOps.K * graft.ops.MLOps.TopWords)
    val ranks = a.map(r => (r.getInt(0), r.getInt(1)))
    assert(ranks.distinct.length == a.length)
    val b = SparkEntry.queries("u5_lda_topics")(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("LDA doc-topic histogram covers all docs") {
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    val sum = SparkEntry.queries("u5_lda_doc_topics")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum($"n_docs")).as[Long].collect().head
    assert(sum == total)
  }

  test("vocabulary respects minDF bound") {
    import org.apache.spark.sql.functions._
    val vocab = SparkEntry.queries("u8_bow_vocabulary")(spark, sf)
      .select("word").as[String].collect().toSet
    // every vocab word must appear in >= 5 documents
    val df = graft.ops.Tables.documents(spark, sf)
      .select($"doc_id", explode(array_distinct(
        filter(split(lower($"text"), "\\s+"), t => length(t) >= 3))).as("w"))
      .groupBy($"w").count()
      .filter($"w".isin(vocab.toSeq: _*))
      .filter($"count" < 5).count()
    assert(df == 0)
  }

  test("model sink: LDA save/load round-trip preserves topics (S11)") {
    import org.apache.spark.ml.clustering.{LDA, LocalLDAModel}
    import org.apache.spark.sql.functions._
    val toks = graft.ops.Tables.documents(spark, sf)
      .select($"doc_id", filter(split(lower($"text"), "\\s+"),
        t => length(t) >= 3).as("toks"))
    val cv = new org.apache.spark.ml.feature.CountVectorizerModel(
      Array("spark", "data", "query", "table", "join", "merge", "batch"))
      .setInputCol("toks").setOutputCol("tf")
    val vec = cv.transform(toks).select("doc_id", "tf").coalesce(1)
    val model = new LDA().setK(2).setSeed(42L).setMaxIter(3)
      .setFeaturesCol("tf").fit(vec)
    val path = "target/tmp/lda_model_roundtrip"
    model.write.overwrite().save(path)
    val loaded = LocalLDAModel.load(path)
    assert(loaded.describeTopics(3).collect().map(_.toSeq).toSeq ==
      model.describeTopics(3).collect().map(_.toSeq).toSeq)
  }

  test("model scan returns one row per candidate k") {
    val rows = SparkEntry.queries("u6_lda_model_scan")(spark, sf)
      .as[(Int, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq(2, 4, 6))
  }
}
