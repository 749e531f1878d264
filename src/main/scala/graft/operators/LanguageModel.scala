package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet/KenLM-style
  * perplexity filter a pretraining pipeline runs after rule-based
  * quality scoring: fit token co-occurrence counts on a (clean) corpus
  * ONCE, then score every candidate document by its average negative
  * log-likelihood under the model; documents far from the reference
  * distribution (boilerplate, gibberish, wrong register) score high
  * and get filtered or bucketed.
  *
  * Architecture follows the repo's build/search split (the IVF/BM25
  * lesson): `buildBigramLm` runs the corpus-wide work once — tokenize,
  * unigram + bigram count aggregation — and persists both dictionaries
  * through the store, gram-indexed. The bigram row DENORMALIZES its
  * left-context unigram count (`cnt_w1`, the norms-next-to-postings
  * layout), so scoring needs exactly TWO dictionary joins: doc bigrams
  * ⟕ bigram table (conditional probability in one row), then w2 ⟕
  * unigram table (stupid-backoff mass for unseen bigrams). Both
  * dictionaries are vocabulary-sized — orders of magnitude smaller
  * than the corpus — so at 100 TB the joins broadcast or shuffle a
  * skinny table while the corpus streams through in one pass, and the
  * model fits once per corpus snapshot, never inside a scoring run.
  *
  * Scoring math (stupid backoff, Brants et al. 2007 — public
  * literature):
  *   p(w2|w1) = cnt(w1 w2) / cnt(w1)            when the bigram is known
  *            = 0.4 · (cnt(w2)+1) / (T+V)        otherwise
  * with T = total tokens, V = vocabulary size (the +1/(T+V) keeps OOV
  * tokens finite). Per-document score = −Σ ln p / n_bigrams.
  *
  * Determinism contract (DuckDB oracle): probabilities are IEEE double
  * ratios of exact BIGINT counts with the same operation order in both
  * engines; each ln term is rounded to 6 decimals and summed in
  * DECIMAL(38,6) so aggregation order cannot perturb the hash.
  */
object LanguageModel {

  /** Stupid-backoff discount (Brants et al. 2007). */
  val Alpha = 0.4

  /** A fitted bigram LM. `bigrams` is (bg, cnt, cnt_w1) keyed by the
    * space-joined bigram string with the left-context unigram count
    * denormalized on; `unigrams` is (w, cnt); `totalTokens` and
    * `vocab` are the corpus scalars the backoff mass needs. */
  final case class BigramLm(bigrams: DataFrame, unigrams: DataFrame,
                            totalTokens: Long, vocab: Long) {
    /** `parallel = false` forces bigrams-before-unigrams sequential
      * writes — required when the frames' lineage READS the store
      * items being replaced (appendToLm): a parallel unigram commit
      * could swap out the old `__unigrams` files while the bigram
      * job is still recomputing partitions over them. */
    def save(c: graft.store.Collection, name: String,
             overwrite: Boolean = true,
             extraMetadata: Map[String, Any] = Map.empty,
             parallel: Boolean = true): Unit = {
      val ops: Seq[() => Unit] = Seq(
        () => c.write(s"${name}__bigrams", bigrams, indexCols = Seq("bg"),
          overwrite = overwrite),
        () => c.write(s"${name}__unigrams", unigrams, indexCols = Seq("w"),
          metadata = Map("lm_total_tokens" -> totalTokens, "lm_vocab" -> vocab)
            ++ extraMetadata,
          overwrite = overwrite))
      if (parallel) Similarity.parallelWrites(ops) else ops.foreach(_())
    }
  }

  object BigramLm {
    def load(c: graft.store.Collection, name: String): BigramLm = {
      val meta = c.metadata(s"${name}__unigrams")
      def longOf(key: String): Long = meta.get(key) match {
        case Some(org.json4s.JInt(i)) => i.toLong
        case other => throw new IllegalStateException(s"bad $key in lm metadata: $other")
      }
      BigramLm(c.item(s"${name}__bigrams").data, c.item(s"${name}__unigrams").data,
        longOf("lm_total_tokens"), longOf("lm_vocab"))
    }
  }

  private def tok(textCol: String) =
    TextAnalysis.tokens(TextAnalysis.normalize(col(textCol)))

  /** Core fit with the exploded-unigram cache still HELD — the caller
    * unpersists once the dictionaries are materialized (saved or
    * scored), so the corpus is tokenized exactly once end to end. */
  private def buildBigramLmRetained(docs: DataFrame,
                                    textCol: String): (BigramLm, DataFrame) = {
    val toks = docs.select(tok(textCol).as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val statsRow = uni.agg(sum(col("cnt")).as("total"), count(lit(1)).as("vocab")).head()
    if (statsRow.isNullAt(0))
      throw new IllegalArgumentException(
        "buildBigramLm: empty corpus — a language model needs at least one token")
    val bg = toks
      .select(explode(graft.functions.expressions.ngram_list(col("t"), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
    // denormalize the left-context count at BUILD time (w1 = everything
    // before the last space: tokens are whitespace-split, no internal
    // spaces) — scoring then never needs a third join
    val bigrams = bg
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(uni.select(col("w").as("w1"), col("cnt").as("cnt_w1")), Seq("w1"))
      .select(col("bg"), col("cnt"), col("cnt_w1"))
    (BigramLm(bigrams, uni, statsRow.getLong(0), statsRow.getLong(1)), uni)
  }

  def buildBigramLm(docs: DataFrame, textCol: String = "text"): BigramLm = {
    val (lm, uni) = buildBigramLmRetained(docs, textCol)
    uni.unpersist(blocking = false)
    lm
  }

  /** Fit + persist in one step — the shape `text_lm_build` ships. */
  def buildAndSaveBigramLm(docs: DataFrame,
                           c: graft.store.Collection,
                           name: String,
                           overwrite: Boolean = true,
                           textCol: String = "text",
                           extraMetadata: Map[String, Any] = Map.empty): BigramLm = {
    val (lm, uni) = buildBigramLmRetained(docs, textCol)
    lm.save(c, name, overwrite, extraMetadata)
    uni.unpersist(blocking = false)
    lm
  }

  /** Score documents under a fitted LM: (id, n_bigrams, nll) where nll
    * is the average negative ln-likelihood per bigram (nats/token —
    * the perplexity filter's threshold axis; ppl = e^nll, monotone, so
    * thresholding nll IS thresholding perplexity without the extra
    * transcendental). Documents shorter than 2 tokens score 0 with
    * n_bigrams = 0 — kept, because a length filter is a different
    * rule's job.
    *
    * Plan shape: corpus streams once (tokenize → explode bigrams);
    * two equi-joins against vocabulary-sized dictionaries (broadcast
    * when small, skinny shuffle otherwise); one groupBy(id). */
  def scoreDocs(lm: BigramLm,
                docs: DataFrame,
                textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val ids = docs.select(col(idCol).as("id"))
    val bg = docs
      .select(col(idCol).as("id"),
        explode(graft.functions.expressions.ngram_list(tok(textCol), 2)).as("bg"))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
    val scored = bg
      .join(lm.bigrams, Seq("bg"), "left")
      .join(lm.unigrams.select(col("w").as("w2"), col("cnt").as("cnt_w2")),
        Seq("w2"), "left")
      .withColumn("lp", round(log(
        when(col("cnt").isNotNull,
          col("cnt").cast("double") / col("cnt_w1").cast("double"))
          .otherwise(lit(Alpha) * (coalesce(col("cnt_w2"), lit(0L)) + lit(1L)).cast("double") /
            lit(lm.totalTokens + lm.vocab).cast("double"))), 6))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp").cast("decimal(38,6)")).as("lp_sum"))
    ids.join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(round(-col("lp_sum").cast("double") / col("n_bigrams").cast("double"), 6),
          lit(0.0)).as("nll"))
  }

  /** Incrementally grow a PERSISTED LM with new corpus documents —
    * count tables merge by summed counts (both vocabulary-sized, so
    * the merge cost is O(vocab), independent of all corpus text ever
    * ingested), and the denormalized `cnt_w1` is re-derived from the
    * MERGED unigrams (a denormalized value must refresh with its
    * source or scoring drifts from the true conditional). */
  def appendToLm(newDocs: DataFrame,
                 c: graft.store.Collection,
                 name: String,
                 textCol: String = "text",
                 extraMetadata: Map[String, Any] = Map.empty): BigramLm = {
    val (delta, uniCache) = buildBigramLmRetained(newDocs, textCol)
    val old = BigramLm.load(c, name)
    val mergedUni = old.unigrams.unionByName(delta.unigrams)
      .groupBy(col("w")).agg(sum(col("cnt")).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mergedBg = old.bigrams.select(col("bg"), col("cnt"))
      .unionByName(delta.bigrams.select(col("bg"), col("cnt")))
      .groupBy(col("bg")).agg(sum(col("cnt")).as("cnt"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(mergedUni.select(col("w").as("w1"), col("cnt").as("cnt_w1")), Seq("w1"))
      .select(col("bg"), col("cnt"), col("cnt_w1"))
    val statsRow = mergedUni.agg(sum(col("cnt")), count(lit(1))).head()
    val merged = BigramLm(mergedBg, mergedUni, statsRow.getLong(0), statsRow.getLong(1))
    // sequential: both frames' lineage reads the OLD store items being
    // replaced (persist is evictable, so "cached" is not "decoupled")
    merged.save(c, name, overwrite = true, extraMetadata, parallel = false)
    mergedUni.unpersist(blocking = false)
    uniCache.unpersist(blocking = false)
    BigramLm.load(c, name)
  }

  /** One-shot convenience: fit in memory and score — ad-hoc probes and
    * tests. Production goes through build + save + load. */
  def perplexityScore(corpus: DataFrame,
                      docs: DataFrame,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame =
    scoreDocs(buildBigramLm(corpus, textCol), docs, textCol, idCol)
}
