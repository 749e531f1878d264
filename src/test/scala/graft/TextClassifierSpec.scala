package graft

import org.apache.spark.sql.functions._

import graft.operators.TextClassifier

/** Trained Naive Bayes text classifier — model math pinned by hand on
  * a corpus small enough to count trigrams on paper, plus the edge
  * rules (unseen trigrams, sub-trigram docs, vocab cap) and the
  * store round-trip. */
class TextClassifierSpec extends SparkSpec {

  import spark.implicits._

  private def df(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lab")

  test("train: counts, priors, defaults match hand math; lp rounds to DECIMAL(18,6)") {
    // class a: "aaaa" -> trigrams aaa, aaa (tot 2); class b: "abab" ->
    // aba, bab (tot 2). V = 3 distinct (aaa, aba, bab). docs: 1 + 1.
    val m = TextClassifier.train(df((1L, "aaaa", "a"), (2L, "abab", "b")),
      "text", "lab")
    val stats = m.classStats.orderBy("label").collect()
    assert(stats.map(_.getAs[String]("label")).toSeq == Seq("a", "b"))
    assert(stats.map(_.getAs[Long]("docs")).toSeq == Seq(1L, 1L))
    assert(stats.map(_.getAs[Long]("tot")).toSeq == Seq(2L, 2L))
    val prior = BigDecimal(math.log(0.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(stats.forall(r => r.getAs[java.math.BigDecimal]("prior")
      .compareTo(prior.bigDecimal) == 0))
    val dlp = BigDecimal(math.log(1.0 / 5)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(stats.forall(r => r.getAs[java.math.BigDecimal]("dlp")
      .compareTo(dlp.bigDecimal) == 0))
    val rows = m.rows.orderBy("label", "tri").collect()
      .map(r => (r.getAs[String]("label"), r.getAs[String]("tri"),
        r.getAs[java.math.BigDecimal]("lp")))
    assert(rows.map(t => (t._1, t._2)).toSeq ==
      Seq(("a", "aaa"), ("b", "aba"), ("b", "bab")))
    // lp(aaa|a) = ln((2+1)/(2+3)); lp(aba|b) = lp(bab|b) = ln((1+1)/(2+3))
    def lp6(x: Double) =
      BigDecimal(math.log(x)).setScale(6, BigDecimal.RoundingMode.HALF_UP).bigDecimal
    assert(rows(0)._3.compareTo(lp6(3.0 / 5)) == 0)
    assert(rows(1)._3.compareTo(lp6(2.0 / 5)) == 0)
    assert(rows(2)._3.compareTo(lp6(2.0 / 5)) == 0)
  }

  test("classify: argmax picks the trained class; unseen trigrams charge the default arithmetically") {
    val m = TextClassifier.train(df(
      (1L, "the quick brown fox", "en"), (2L, "the lazy brown dog", "en"),
      (3L, "der schnelle braune", "de"), (4L, "der faule braune hund", "de")),
      "text", "lab")
    val out = TextClassifier.classify(
      Seq((10L, "the quick dog"), (11L, "der schnelle hund"),
        (12L, "zzzz qqqq xxxx")). // all-unseen: priors + defaults decide
        toDF("doc_id", "text"), m, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).take(2).toSeq ==
      Seq((10L, "en"), (11L, "de")))
    // the all-unseen doc must still get exactly one deterministic row
    assert(out.length == 3 && out(2).getLong(0) == 12L)
  }

  test("classify: a sub-trigram doc has no tokens and classifies by prior alone (tie -> class name)") {
    // priors: en 2/3, de 1/3 -> "ab" (no trigrams) goes to en
    val m = TextClassifier.train(df(
      (1L, "aaaa", "en"), (2L, "bbbb", "en"), (3L, "cccc", "de")),
      "text", "lab")
    val out = TextClassifier.classify(Seq((9L, "ab")).toDF("doc_id", "text"),
      m, "doc_id", "text").collect()
    assert(out.toSeq.map(r => (r.getLong(0), r.getString(1))) == Seq((9L, "en")))
  }

  test("maxVocabPerClass caps model rows by count (tie: trigram asc) but keeps the class mass uncapped") {
    // class a text "aaabaaab": trigrams aaa,aab,aba,baa,aaa,aab (tot 6)
    // counts: aaa 2, aab 2, aba 1, baa 1 -> cap 2 keeps aaa, aab
    val full = TextClassifier.train(df((1L, "aaabaaab", "a")), "text", "lab")
    val capped = TextClassifier.train(df((1L, "aaabaaab", "a")), "text", "lab",
      maxVocabPerClass = Some(2))
    assert(full.rows.count() == 4 && capped.rows.count() == 2)
    assert(capped.rows.select("tri").as[String].collect().toSet == Set("aaa", "aab"))
    // tot (the smoothing denominator) must be the UNCAPPED token count
    assert(capped.classStats.select("tot").as[Long].head() == 6L)
    // capped lp values equal the full model's for the surviving rows
    val f = full.rows.filter(col("tri").isin("aaa", "aab"))
      .orderBy("tri").select("lp").collect().toSeq
    val cp = capped.rows.orderBy("tri").select("lp").collect().toSeq
    assert(f == cp)
  }

  test("append is bit-identical to retraining on the union corpus; new classes join") {
    val all = df(
      (1L, "the quick brown fox", "en"), (2L, "the lazy brown dog", "en"),
      (3L, "der schnelle braune", "de"), (4L, "le renard brun rapide", "fr"))
    val retrained = TextClassifier.train(all, "text", "lab")
    // fr is a NEW class at append time
    val appended = TextClassifier.append(
      TextClassifier.train(df(
        (1L, "the quick brown fox", "en"), (3L, "der schnelle braune", "de")),
        "text", "lab"),
      df((2L, "the lazy brown dog", "en"), (4L, "le renard brun rapide", "fr")),
      "text", "lab")
    def dump(m: TextClassifier.NaiveBayes) = (
      m.rows.orderBy("label", "tri").collect().toSeq,
      m.classStats.orderBy("label").collect().toSeq)
    assert(dump(appended) == dump(retrained))
    assert(appended.classStats.count() == 3)
  }

  test("append refuses a capped model typed (pruned counts would under-count the class mass)") {
    val capped = TextClassifier.train(df((1L, "aaabaaab", "a")), "text", "lab",
      maxVocabPerClass = Some(2))
    val e = intercept[IllegalArgumentException](TextClassifier.append(
      capped, df((2L, "aaac", "a")), "text", "lab"))
    assert(e.getMessage.contains("UNCAPPED"), e.getMessage)
  }

  test("model round-trips through the store and classifies identically") {
    val c = tempCollection("nb_roundtrip")
    val m = TextClassifier.train(df(
      (1L, "the quick brown fox", "en"), (2L, "der schnelle braune", "de")),
      "text", "lab")
    m.save(c, "m")
    val loaded = TextClassifier.NaiveBayes.load(c, "m")
    val docs = Seq((5L, "the brown fox"), (6L, "der braune")).toDF("doc_id", "text")
    val a = TextClassifier.classify(docs, m, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = TextClassifier.classify(docs, loaded, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.map(r => (r.getLong(0), r.getString(1))) ==
      Seq((5L, "en"), (6L, "de")))
    cleanup(c)
  }
}
