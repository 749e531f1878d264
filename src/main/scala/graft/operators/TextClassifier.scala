package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trained text classification — the fastText-style supervised filter
  * a pretraining pipeline runs when rule-based heuristics run out:
  * fit a multinomial Naive Bayes over character trigrams on a LABELED
  * corpus slice (language tags, quality grades, domain buckets), then
  * classify the unlabeled remainder in one distributed pass. This
  * complements [[TextAnalysis.langId]] (zero-shot script/stopword
  * heuristic) and [[LanguageModel]] (unsupervised perplexity): here the
  * labels teach the model, so it separates classes the heuristics
  * cannot (e.g. es vs pt, formal vs boilerplate REGISTER of the same
  * language).
  *
  * Model (all quantities from exact distributed counts; Laplace +1
  * smoothing; public textbook math — Manning et al., IIR ch. 13):
  *   lp(tri|c)  = ln((cnt(c,tri) + 1) / (tot(c) + V))   per class c
  *   dlp(c)     = ln(1 / (tot(c) + V))                   unseen trigram
  *   prior(c)   = ln(docs(c) / docs)
  *   score(d,c) = prior(c) + Σ_matched lp + (n_d − matched_d) · dlp(c)
  * The unseen-mass term is ARITHMETIC, not a join: scoring joins the
  * document's trigram tokens to the model once (per matching class
  * row), counts what matched, and charges the remaining `n_d − matched`
  * tokens the class default — no test-tokens × classes blow-up.
  *
  * Architecture follows the repo's build/score split: `train` runs the
  * corpus-wide count aggregation once (one shuffle, map-side combined)
  * and yields two skinny frames — the (class, tri, lp) model, vocab ×
  * classes rows, and per-class stats (prior, dlp), classes rows — both
  * orders of magnitude smaller than the corpus, persistable through the
  * store like the BM25/LM dictionaries. `classify` streams documents
  * through one explode + one join on `tri` (the model side is skinny;
  * at 100 TB the hot-trigram skew is AQE's skew-join case) + one
  * per-(doc, class) sum, then an argmax window per doc. classes ≤
  * dozens, so the stats frame broadcasts.
  *
  * Determinism contract (DuckDB oracle, same as [[LanguageModel]]):
  * every ln is an IEEE double of exact BIGINT-count ratios with the
  * same operation order in both engines, rounded to 6 decimals and
  * CAST to DECIMAL(18,6) at MODEL BUILD; scores are then exact decimal
  * sums, so aggregation order cannot perturb the argmax, and ties
  * break on the class name.
  */
object TextClassifier {

  /** Scale shared by every log-probability in the model. */
  private val Lp = DecimalType(18, 6)

  /** Character-trigram tokens (with multiplicity) of lowercased text:
    * one row per position 1..len−2. Documents shorter than 3 chars
    * yield no tokens (they classify by prior alone). */
  private def trigramTokens(df: DataFrame, textCol: String,
                            keepExprs: Seq[Column], keepNames: Seq[String]): DataFrame = {
    val named = keepNames.map(col)
    df.select(keepExprs :+ lower(col(textCol)).as("__t"): _*)
      .filter(length(col("__t")) >= 3)
      .select(named :+ explode(sequence(lit(1), length(col("__t")) - 2)).as("__i") :+ col("__t"): _*)
      .select(named :+ col("__t").substr(col("__i"), lit(3)).as("tri"): _*)
  }

  /** A fitted model: `rows` = (label, tri, c, lp DECIMAL(18,6)) — the
    * raw count `c` rides along so [[TextClassifier.append]] can merge
    * new labeled evidence EXACTLY (count addition), not approximately;
    * `classStats` = (label, docs, tot, prior, dlp) — classes rows,
    * always broadcastable. */
  final case class NaiveBayes(rows: DataFrame, classStats: DataFrame) {
    def save(c: graft.store.Collection, name: String,
             overwrite: Boolean = true): Unit = {
      c.write(s"${name}__nb_rows", rows, indexCols = Seq("tri"),
        overwrite = overwrite)
      c.write(s"${name}__nb_stats", classStats, indexCols = Seq("label"),
        overwrite = overwrite)
    }
  }

  object NaiveBayes {
    def load(c: graft.store.Collection, name: String): NaiveBayes =
      NaiveBayes(c.item(s"${name}__nb_rows").data,
        c.item(s"${name}__nb_stats").data)
  }

  /** Fit on labeled documents. `maxVocabPerClass` (scale knob) keeps
    * only each class's top-N trigrams by count (ties: trigram asc) so
    * the model stays broadcast-sized on an arbitrarily large corpus;
    * None keeps the full vocabulary (the oracle-checked setting). */
  def train(docs: DataFrame, textCol: String, labelCol: String,
            maxVocabPerClass: Option[Int] = None): NaiveBayes = {
    val lab = col(labelCol).as("label")
    val tok = trigramTokens(docs, textCol, Seq(lab), Seq("label"))
    // ONE corpus pass: everything else derives from the vocabulary-
    // sized counts frame — class totals are sum(c) per label (equal to
    // the token count by construction) and V is its distinct trigrams,
    // so the corpus explode is never re-scanned for bookkeeping.
    val counts0 = tok.groupBy("label", "tri").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // cut the explode lineage: 3 consumers
    val counts = maxVocabPerClass match {
      case None => counts0
      case Some(n) =>
        import org.apache.spark.sql.expressions.Window
        counts0.withColumn("__rk", row_number().over(
            Window.partitionBy("label").orderBy(col("c").desc, col("tri"))))
          .filter(col("__rk") <= n).drop("__rk")
    }
    // class totals over the UNCAPPED counts (the cap prunes rare
    // trigrams from the table, it must not re-normalize the class mass).
    // Classes are bounded by contract (≤ dozens), so the per-class
    // scalars are COLLECTED once — the old plan kept them as lazy
    // frames, which re-scanned the labeled docs at every consumer
    // (the nDocs head, then again when classStats was written).
    val totals = counts0.groupBy("label").agg(sum("c").as("tot"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    val vocabV = counts0.select("tri").distinct().count()
    val classCounts = docs.groupBy(lab).agg(count(lit(1)).as("docs"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    derive(counts, totals, classCounts, vocabV)
  }

  /** Materialize log-probs from exact counts — shared by [[train]] and
    * [[append]] so an appended model is BIT-IDENTICAL to a retrain on
    * the union corpus. The per-class scalars arrive as driver rows
    * (classes-bounded); prior/dlp are still computed by the SAME Spark
    * round/log/cast expressions, over a literal frame, so the stored
    * decimals are bit-identical to the old scan-derived ones. */
  private def derive(counts: DataFrame, totals: Seq[(String, Long)],
                     classCounts: Seq[(String, Long)], vocabV: Long): NaiveBayes = {
    val spark = counts.sparkSession
    import spark.implicits._
    val totalsDF = totals.toDF("label", "tot")
    val rows = counts.join(broadcast(totalsDF), "label")
      .select(col("label"), col("tri"), col("c"),
        round(log((col("c") + lit(1).cast("double")) /
          (col("tot") + lit(vocabV).cast("double"))), 6).cast(Lp).as("lp"))
    val nDocs = classCounts.map(_._2).sum
    val totMap = totals.toMap
    // inner-join semantics: a class whose docs produced no tokens has
    // no totals row and drops from classStats, exactly as before
    val statsBase = classCounts.flatMap { case (l, d) =>
      totMap.get(l).map(t => (l, d, t)) }
    val classStats = statsBase.toDF("label", "docs", "tot")
      .select(col("label"), col("docs"), col("tot"),
        round(log(col("docs").cast("double") / lit(nDocs).cast("double")), 6)
          .cast(Lp).as("prior"),
        round(log(lit(1).cast("double") /
          (col("tot") + lit(vocabV).cast("double"))), 6).cast(Lp).as("dlp"))
    NaiveBayes(rows, classStats)
  }

  /** Fold NEW labeled documents into a fitted model: merge trigram
    * counts (full outer on (label, tri)), re-total per class, re-derive
    * every log-prob from the merged exact counts. The result is
    * bit-identical to retraining on the union corpus at the cost of the
    * NEW slice's aggregation plus one model-sized merge — the corpus
    * already folded in is never re-read. New classes join with their
    * own counts. Requires an UNCAPPED model (`maxVocabPerClass` prunes
    * rows, so a capped model's merge would under-count pruned mass);
    * cap at serving time instead. */
  def append(model: NaiveBayes, docs: DataFrame, textCol: String,
             labelCol: String): NaiveBayes = {
    // refuse a capped model TYPED rather than silently under-counting:
    // per class, sum(rows.c) == tot holds iff no row was pruned — one
    // model-sized aggregation, cheap next to the merge itself
    val capped = model.rows.groupBy("label").agg(sum("c").as("rowMass"))
      .join(model.classStats.select("label", "tot"), "label")
      .filter(col("rowMass") =!= col("tot"))
      .select("label").limit(1).collect()
    if (capped.nonEmpty)
      throw new IllegalArgumentException(
        s"append requires an UNCAPPED model, but class '${capped.head.getString(0)}' " +
          "has pruned rows (maxVocabPerClass was set at train time) — merging " +
          "pruned counts would silently under-count the class mass; retrain " +
          "uncapped and cap at serving time instead")
    val lab = col(labelCol).as("label")
    val tok = trigramTokens(docs, textCol, Seq(lab), Seq("label"))
    val newCounts = tok.groupBy("label", "tri").agg(count(lit(1)).as("c2"))
    // localCheckpoint: the merged counts feed THREE consumers (totals,
    // vocab, the derived rows) — without it the full-outer merge (and
    // the new slice's corpus explode) re-executed once per consumer
    val counts = model.rows.select("label", "tri", "c")
      .join(newCounts, Seq("label", "tri"), "full_outer")
      .select(col("label"), col("tri"),
        (coalesce(col("c"), lit(0L)) + coalesce(col("c2"), lit(0L))).as("c"))
      .localCheckpoint(true)
    val totals = counts.groupBy("label").agg(sum("c").as("tot"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    // driver-side full-outer merge of the classes-bounded doc counts
    val oldDocs = model.classStats.select(col("label"), col("docs"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1))).toMap
    val newDocs = docs.groupBy(lab).agg(count(lit(1)).as("docs2"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1))).toMap
    val classCounts = (oldDocs.keySet ++ newDocs.keySet).toSeq.sorted
      .map(l => (l, oldDocs.getOrElse(l, 0L) + newDocs.getOrElse(l, 0L)))
    val vocabV = counts.select("tri").distinct().count()
    derive(counts, totals, classCounts, vocabV)
  }

  /** Classify documents: one row per input doc with the argmax label.
    * `idCol` must be unique per document. */
  def classify(docs: DataFrame, model: NaiveBayes,
               idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val tok = trigramTokens(docs, textCol, Seq(id), Seq(idCol))
    val nTri = tok.groupBy(idCol).agg(count(lit(1)).as("n"))
    // one join on tri: each token row matches its trigram's rows across
    // every class that saw it; per-(doc, class) exact-decimal sum
    val matched = tok.join(model.rows, "tri")
      .groupBy(idCol, "label")
      .agg(sum("lp").as("msum"), count(lit(1)).as("mcnt"))
    val scored = docs.select(id)
      .crossJoin(broadcast(model.classStats.select("label", "prior", "dlp")))
      .join(nTri, Seq(idCol), "left")
      .join(matched, Seq(idCol, "label"), "left")
      .select(id, col("label"),
        (col("prior") + coalesce(col("msum"), lit(0).cast(Lp)) +
          (coalesce(col("n"), lit(0L)) - coalesce(col("mcnt"), lit(0L))) * col("dlp"))
          .as("score"))
    // argmax as a map-side-combinable min_by over (−score, label) —
    // identical ordering to the old row_number(score desc, label)
    // window (scores are exact decimals, so negation is exact), one
    // partial-aggregated exchange instead of a full sort shuffle
    scored.groupBy(idCol)
      .agg(min_by(col("label"), struct((-col("score")).as("ns"), col("label")))
        .as("pred"))
      .select(id, col("pred"))
  }
}
