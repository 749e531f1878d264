package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a document corpus — the lexical-search
  * counterpart to the embedding operators in [[Similarity]] (a curation
  * run uses both: ANN for semantic near-dups, BM25 for targeted
  * inspection/decontamination probes against known benchmark strings).
  *
  * Plan shape (the classic distributed inverted-index probe):
  * postings = (term, doc, tf) from one explode+groupBy of the corpus;
  * the query-term table is broadcast and SEMI-JOINS the postings first,
  * so only matching postings rows flow into scoring — at 100 TB the
  * scored set is O(matching postings), never O(corpus). Document
  * length norms ride on a skinny (doc, dl) table; corpus stats (N,
  * Σdl) are a one-row broadcast. Scoring is pure per-row arithmetic;
  * the only shuffles are the postings groupBy and the final per-query
  * top-k window — both on high-cardinality keys.
  *
  * Determinism contract (for the DuckDB oracle): per-term BM25 terms
  * are IEEE doubles computed with the same operation order as the SQL
  * replica; the per-document sum runs in DECIMAL(38,12) so aggregation
  * order cannot perturb the hash; ties rank by doc id.
  */
object Search {

  /** Lucene-style BM25 idf: ln(1 + (N − df + 0.5)/(df + 0.5)) —
    * never negative, unlike the classic formulation. */
  private def idf(nDocs: Column, df: Column): Column =
    log(lit(1.0) + (nDocs.cast("double") - df + 0.5) / (df.cast("double") + 0.5))

  /** Top-k documents per keyword query.
    *
    * @param docs       corpus with `idCol` and `textCol`
    * @param queryTerms (query_id, term) rows — normalized terms, one
    *                   row per query term; must be broadcast-small
    *                   (queries are human-sized, corpora are not)
    * @param k          results per query
    */
  def bm25TopK(docs: DataFrame,
               queryTerms: DataFrame,
               k: Int,
               k1: Double = 1.2,
               b: Double = 0.75,
               textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(TextAnalysis.normalize(col(textCol))).as("t"))
    val postings = tok.select(col("doc_id"), explode(col("t")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // dl derives FROM the postings (Σ tf per doc ≡ token count — split
    // always yields ≥1 token, so no doc is lost): one corpus tokenize
    // feeds everything. Catalyst does not reuse the postings exchange
    // across consumers (measured: 7 corpus scans in the naive shape),
    // so the corpus-wide subplan must appear as few times as possible.
    val dl = postings.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    // distinct: a repeated term in one query must not double its
    // contribution (classic BM25 treats query terms as a set)
    val qt = queryTerms.select(col("query_id"), col("term")).distinct()
    // inverted-index probe: only query-term postings survive
    val matched = postings.join(broadcast(qt.select(col("term")).distinct()),
      Seq("term"), "left_semi")

    // LOCALIZE the broadcast-sized aggregates (per-term df + one-row
    // corpus stats — both bounded by the query size) in ONE driver
    // round-trip, the same pattern as ivfSearch's probe table: the
    // returned plan then touches the corpus-wide postings subplan
    // exactly twice (scoring + dl) instead of re-deriving df/avgdl
    // from scratch per consumer.
    val dfreq = matched.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val dfRows = dfreq.crossJoin(stats)
      .select(col("term"), col("df"), col("n_docs"), col("sum_dl"))
      .collect()
    val outSchema = Seq("query_id", "rank", "doc_id", "n_terms", "score")
    if (dfRows.isEmpty) {
      // no query term matches any document
      return Seq.empty[(Long, Int, Long, Long, Double)].toDF(outSchema: _*)
    }
    val nDocs = dfRows.head.getLong(2)
    val sumDl = dfRows.head.getLong(3)
    val dfLit = dfRows.map(r => (r.getString(0), r.getLong(1)))
      .toSeq.toDF("term", "df")

    val avgdl = lit(sumDl).cast("double") / lit(nDocs).cast("double")
    val tfn = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    val contrib = idf(lit(nDocs), col("df")) * tfn

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_exact").desc, col("doc_id"))
    matched
      .join(broadcast(qt), Seq("term"))
      .join(broadcast(dfLit), Seq("term"))
      .join(dl, Seq("doc_id"))
      .withColumn("contrib", contrib)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("contrib").cast("decimal(38,12)")).as("score_exact"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("n_terms"), round(col("score_exact").cast("double"), 6).as("score"))
  }

  /** The `n` globally most frequent non-stopword terms, deterministic
    * tie-break by term — a data-derived probe workload for the shipped
    * query (real query logs are not available in a test corpus). */
  def topTerms(docs: DataFrame,
               n: Int,
               stopwords: Seq[String],
               textCol: String = "text"): DataFrame = {
    // orderBy+limit → TakeOrderedAndProject (per-partition heaps, no
    // global sort); the rank window then runs over n rows only
    val top = docs.select(explode(TextAnalysis.tokens(
        TextAnalysis.normalize(col(textCol)))).as("term"))
      .filter(!col("term").isin(stopwords: _*) && col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(n)
    val w = Window.orderBy(col("cnt").desc, col("term"))
    top.withColumn("r", row_number().over(w)).select(col("term"), col("r"))
  }
}
