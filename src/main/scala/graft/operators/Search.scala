package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a document corpus — the lexical-search
  * counterpart to the embedding operators in [[Similarity]] (a curation
  * run uses both: ANN for semantic near-dups, BM25 for targeted
  * inspection/decontamination probes against known benchmark strings).
  *
  * Architecture (the classic distributed inverted index, split into
  * build and search): `buildBm25Index` runs the corpus-wide work ONCE
  * — tokenize, postings aggregation, per-doc lengths (denormalized
  * onto the postings), term dictionary, corpus stats — and `save`
  * persists it term-indexed through the store. `bm25SearchTopK` then
  * reads O(matching postings) bytes per query batch: the term
  * predicate prunes parquet row groups, df comes from the pruned
  * dictionary, and scoring is pure per-row arithmetic with one
  * (query, doc) groupBy and a per-query top-k window. At 100 TB the
  * index builds once per corpus snapshot and every search is
  * independent of corpus size in all but the matching-postings term.
  */
object Search {

  /** Lucene-style BM25 idf: ln(1 + (N − df + 0.5)/(df + 0.5)) —
    * never negative, unlike the classic formulation. */
  private def idf(nDocs: Column, df: Column): Column =
    log(lit(1.0) + (nDocs.cast("double") - df + 0.5) / (df.cast("double") + 0.5))

  /** A BUILT inverted index — the build-once/search-many split (the
    * IVF lesson applied to text: at 100 TB the corpus tokenize +
    * postings aggregation must run once and persist, never inside the
    * timed query).
    *
    * `postings` is (term, doc_id, tf, dl) — dl DENORMALIZED onto every
    * posting (one long per row) so a search touches no corpus-sized
    * side table at all: the per-doc length norm rides with the posting
    * (the norms-next-to-postings layout Lucene uses). `terms` is the
    * per-term dictionary (term, df, cnt) — df = document frequency for
    * idf, cnt = total occurrences (the data-derived probe workload
    * ranks by it). Corpus stats (n_docs, sum_dl) are scalars.
    *
    * `save` persists both through the store term-indexed, so a search's
    * `term IN (...)` predicate prunes parquet row groups before the
    * scan starts — the searched bytes are O(matching postings), not
    * O(index). */
  final case class Bm25Index(postings: DataFrame, terms: DataFrame,
                             nDocs: Long, sumDl: Long) {
    def save(c: graft.store.Collection, name: String,
             overwrite: Boolean = true,
             extraMetadata: Map[String, Any] = Map.empty): Unit =
      Similarity.parallelWrites(Seq(
        () => c.write(s"${name}__postings", postings, indexCols = Seq("term"),
          overwrite = overwrite),
        () => c.write(s"${name}__terms", terms, indexCols = Seq("term"),
          metadata = Map("bm25_n_docs" -> nDocs, "bm25_sum_dl" -> sumDl) ++ extraMetadata,
          overwrite = overwrite)))
  }

  object Bm25Index {
    def load(c: graft.store.Collection, name: String): Bm25Index = {
      val meta = c.metadata(s"${name}__terms")
      def longOf(key: String): Long = meta.get(key) match {
        case Some(org.json4s.JInt(i)) => i.toLong
        case other => throw new IllegalStateException(s"bad $key in bm25 metadata: $other")
      }
      Bm25Index(c.item(s"${name}__postings").data, c.item(s"${name}__terms").data,
        longOf("bm25_n_docs"), longOf("bm25_sum_dl"))
    }
  }

  /** ONE tokenize pass over the corpus builds everything: postings
    * (with the per-doc length denormalized on), the term dictionary,
    * and the corpus stats. dl derives FROM the postings (Σ tf per doc
    * ≡ token count — split always yields ≥1 token, so no doc is lost).
    * The corpus-wide shuffles (postings groupBy, dl groupBy, the
    * dl-onto-postings join) all happen HERE, once, at build time. */
  /** Core build with the bare-postings cache still HELD — the returned
    * second element must be unpersisted by the caller once the index
    * DataFrames have been materialized (saved or searched). */
  private def buildBm25IndexRetained(docs: DataFrame,
                                     textCol: String,
                                     idCol: String): (Bm25Index, DataFrame) = {
    val tok = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(TextAnalysis.normalize(col(textCol))).as("t"))
    val bare = tok.select(col("doc_id"), explode(col("t")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dl = bare.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val statsRow = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")).head()
    val postings = bare.join(dl, Seq("doc_id"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
    val terms = bare.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cnt"))
    (Bm25Index(postings, terms, statsRow.getLong(0), statsRow.getLong(1)), bare)
  }

  def buildBm25Index(docs: DataFrame,
                     textCol: String = "text",
                     idCol: String = "doc_id"): Bm25Index = {
    val (idx, bare) = buildBm25IndexRetained(docs, textCol, idCol)
    bare.unpersist(blocking = false)
    idx
  }

  /** Build + persist in one step, holding the bare-postings cache
    * through the (parallel) item writes so the corpus is tokenized
    * exactly ONCE end to end — the shape `text_bm25_build` ships. */
  def buildAndSaveBm25Index(docs: DataFrame,
                            c: graft.store.Collection,
                            name: String,
                            overwrite: Boolean = true,
                            textCol: String = "text",
                            idCol: String = "doc_id",
                            extraMetadata: Map[String, Any] = Map.empty): Bm25Index = {
    val (idx, bare) = buildBm25IndexRetained(docs, textCol, idCol)
    idx.save(c, name, overwrite, extraMetadata)
    bare.unpersist(blocking = false)
    idx
  }

  /** Top-k documents per keyword query through a built index — the hot
    * path. The query-term list (human-sized by contract) is localized
    * once and pushed into the postings scan as a `term IN (...)`
    * predicate (parquet row-group pruning on the term-indexed store
    * item); per-term df comes from the equally-pruned dictionary. No
    * corpus-sized shuffle remains: matching postings already carry
    * their dl, so the plan is scan-pruned postings → broadcast joins →
    * one groupBy on (query_id, doc_id) → per-query top-k window.
    *
    * Determinism contract (for the DuckDB oracle): per-term BM25 terms
    * are IEEE doubles computed with the same operation order as the SQL
    * replica; the per-document sum runs in DECIMAL(38,12) so
    * aggregation order cannot perturb the hash; ties rank by doc id. */
  def bm25SearchTopK(index: Bm25Index,
                     queryTerms: DataFrame,
                     k: Int,
                     k1: Double = 1.2,
                     b: Double = 0.75): DataFrame = {
    val spark = index.postings.sparkSession
    import spark.implicits._
    // distinct: a repeated term in one query must not double its
    // contribution (classic BM25 treats query terms as a set)
    val qt = queryTerms.select(col("query_id"), col("term")).distinct()
    val termList = qt.select(col("term")).distinct().as[String].collect().toSeq
    val outSchema = Seq("query_id", "rank", "doc_id", "n_terms", "score")
    if (termList.isEmpty)
      return Seq.empty[(Long, Int, Long, Long, Double)].toDF(outSchema: _*)
    // df for the probed terms: from the caller when queryTerms already
    // carries a `df` column (a workload derived FROM the dictionary —
    // e.g. text_bm25_search — already paid that read), else one pruned
    // read of the dictionary item: bounded by the query size either
    // way, localized for a broadcast literal
    val dfRows: Array[(String, Long)] =
      if (queryTerms.columns.contains("df"))
        queryTerms.select(col("term"), col("df").cast("long")).distinct()
          .as[(String, Long)].collect()
      else
        index.terms.filter(col("term").isin(termList: _*))
          .select(col("term"), col("df")).as[(String, Long)].collect()
    if (dfRows.isEmpty)
      return Seq.empty[(Long, Int, Long, Long, Double)].toDF(outSchema: _*)
    val dfLit = dfRows.toSeq.toDF("term", "df")
    // pruned postings scan: the IN predicate reaches the parquet scan
    val matched = index.postings.filter(col("term").isin(termList: _*))

    val avgdl = lit(index.sumDl).cast("double") / lit(index.nDocs).cast("double")
    val tfn = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    val contrib = idf(lit(index.nDocs), col("df")) * tfn

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_exact").desc, col("doc_id"))
    matched
      .join(broadcast(qt), Seq("term"))
      .join(broadcast(dfLit), Seq("term"))
      .withColumn("contrib", contrib)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("contrib").cast("decimal(38,12)")).as("score_exact"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("n_terms"), round(col("score_exact").cast("double"), 6).as("score"))
  }

  /** Incrementally add documents to a PERSISTED BM25 index — the
    * Lucene-segment analogue of the ANN indexes' `appendTo*`: the new
    * docs' postings (with their own denormalized lengths) APPEND to the
    * term-indexed postings item (same terms legitimately repeat — the
    * store's KeepAll overlap strategy), the term dictionary merges by
    * summed (df, cnt), and the corpus stats update in metadata. Cost is
    * O(new docs + dictionary), independent of existing postings size.
    * Existing postings stay bit-identical on disk; only scores change,
    * exactly as BM25 semantics require (idf and avgdl are corpus-level
    * by definition). Caller contract: doc ids are new. */
  def appendToBm25Index(newDocs: DataFrame,
                        c: graft.store.Collection,
                        name: String,
                        textCol: String = "text",
                        idCol: String = "doc_id",
                        extraMetadata: Map[String, Any] = Map.empty): Bm25Index = {
    val (delta, bare) = buildBm25IndexRetained(newDocs, textCol, idCol)
    val old = Bm25Index.load(c, name)
    c.append(s"${name}__postings", delta.postings,
      graft.store.DuplicateHandling.KeepAll)
    val merged = old.terms.unionByName(delta.terms)
      .groupBy(col("term"))
      .agg(sum(col("df")).as("df"), sum(col("cnt")).as("cnt"))
    c.write(s"${name}__terms", merged, indexCols = Seq("term"),
      metadata = Map("bm25_n_docs" -> (old.nDocs + delta.nDocs),
        "bm25_sum_dl" -> (old.sumDl + delta.sumDl)) ++ extraMetadata,
      overwrite = true)
    bare.unpersist(blocking = false)
    Bm25Index.load(c, name)
  }

  /** One-shot convenience: build the index in-memory (not persisted)
    * and search it — for ad-hoc probes and tests. Production and the
    * shipped queries go through build + save + load (`text_bm25_build`
    * / `text_bm25_search`). */
  def bm25TopK(docs: DataFrame,
               queryTerms: DataFrame,
               k: Int,
               k1: Double = 1.2,
               b: Double = 0.75,
               textCol: String = "text",
               idCol: String = "doc_id"): DataFrame =
    bm25SearchTopK(buildBm25Index(docs, textCol, idCol), queryTerms, k, k1, b)

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
