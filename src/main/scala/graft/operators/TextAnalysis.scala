package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, quality scoring, language ID, fingerprinting
  * (BASELINE.json north star — beyond the reference's own surface).
  *
  * Everything is built from codegen'd `functions._` column expressions
  * (split/regexp/higher-order functions) — no UDFs — so the operators
  * run inside WholeStageCodegen and scale linearly with executors; no
  * shuffles at all (all per-row).
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  val Stopwords = Seq(
    "the", "a", "an", "of", "to", "in", "and", "is", "it", "for",
    "on", "with", "as", "at", "by")

  /** Single-pass token stats struct (native TextStats kernel): the
    * higher-order-function formulation re-evaluated the token split
    * per ELEMENT — quadratic per document. */
  private def ts(text: Column): Column =
    graft.functions.expressions.text_stats(tokens(text), Stopwords)

  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(ts(text).getField("n_tokens"))

  /** BPE-ish subword count estimate: long words cost extra tokens
    * (≈ len/4 pieces, the common BPE rule of thumb). */
  def subwordCountEstimate(text: Column): Column =
    when(length(trim(text)) === 0, 0L).otherwise(ts(text).getField("n_subwords"))

  def stopwordRatio(text: Column): Column = {
    val t = ts(text)
    t.getField("stop_hits").cast("double") / t.getField("n_tokens").cast("double")
  }

  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
        length(text).cast("double"))

  def avgWordLen(text: Column): Column = {
    val t = ts(text)
    t.getField("word_len_sum").cast("double") / t.getField("n_tokens").cast("double")
  }

  /** Composite quality score in [0,1] from length / punctuation /
    * stopword signals — the standard "is this prose" heuristic family
    * (C4/Gopher-style rules, re-expressed as closed-form arithmetic).
    * Deterministic + SQL-expressible so the oracle can replicate it. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthScore = least(nTok / 50.0, lit(1.0))          // saturates at 50 tokens
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0)) // prose has stopwords
    val wordLenOk = when(avgWordLen(text).between(2.0, 12.0), 1.0).otherwise(0.5)
    round((lengthScore * 0.3 + punctScore * 0.2 + stopScore * 0.3 + wordLenOk * 0.2), 6)
  }

  /** Gopher-style repetition signals over the whitespace tokens, as a
    * per-doc row: `distinct_ratio` (unique tokens / tokens),
    * `top_bigram_share` (fraction of bigram positions holding the
    * modal bigram), `dup_trigram_share` (fraction of trigram positions
    * whose trigram occurs more than once). One native-kernel pass per
    * row (RepetitionStats), no shuffle; all ratios closed-form so the
    * oracle replicates them from the same tokenization. */
  def repetition(df: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val r = graft.functions.expressions.repetition_stats(tokens(col(textCol)))
    val empty = length(trim(col(textCol))) === 0
    val n = when(empty, 0).otherwise(r.getField("n_tokens"))
    df.select(col(idCol), n.as("n_tokens"),
      when(n === 0, 0.0).otherwise(round(
        r.getField("n_distinct").cast("double") / n.cast("double"), 6))
        .as("distinct_ratio"),
      when(n < 2, 0.0).otherwise(round(
        r.getField("top_bigram").cast("double") / (n - 1).cast("double"), 6))
        .as("top_bigram_share"),
      when(n < 3, 0.0).otherwise(round(
        r.getField("dup_trigram_pos").cast("double") / (n - 2).cast("double"), 6))
        .as("dup_trigram_share"))
  }

  /** Per-language marker-word profiles for the n-gram/stopword language
    * heuristic. Tiny on purpose: broadcast as literals into codegen.
    * The it/pt/nl profiles use distinctive markers only (no overlap
    * with the es/fr function words), so adding them can't flip the
    * label of a text the shorter profiles already classify. */
  private[graft] val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "que", "de", "un", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "des", "une", "dans", "pour"),
    "it" -> Seq("il", "della", "nel", "sono", "anche", "più", "gli", "perché", "questo", "essere"),
    "pt" -> Seq("não", "uma", "são", "também", "já", "você", "mais", "como", "pelo", "isso"),
    "nl" -> Seq("het", "een", "niet", "ook", "maar", "voor", "zijn", "wordt", "deze", "heeft"))

  /** Script-range detectors checked before the marker argmax:
    * (lang, codepoint range, min share of characters). Kana precedes
    * the CJK/zh check because Japanese text mixes kana with kanji. */
  private[graft] val ScriptRanges: Seq[(String, String, Double)] = Seq(
    ("ja", "\\u3040-\\u30ff", 0.05),
    ("ko", "\\uac00-\\ud7af", 0.20),
    ("ru", "\\u0400-\\u04ff", 0.20),
    ("ar", "\\u0600-\\u06ff", 0.20),
    ("hi", "\\u0900-\\u097f", 0.20))

  /** Language-ID heuristic: writing-script codepoint shares decide the
    * script-bound languages (ja/ko/ru/ar/hi, then zh); otherwise the
    * language whose marker-word hit-count is highest (ties broken by
    * profile order, 'und' when nothing matches). One pass, no shuffle;
    * the real-world upgrade path is n-gram profiles via the same
    * argmax shape. */
  def langId(text: Column): Column = {
    def share(range: String): Column =
      length(regexp_replace(text, s"[^$range]", "")).cast("double") /
        greatest(length(text), lit(1)).cast("double")
    val cjk = share("\\u4e00-\\u9fff")
    // All marker profiles counted in ONE native pass over the tokens;
    // argmax via array_max + array_position (first occurrence = earliest
    // profile wins ties). NOT a (bestLang, bestScore) when-fold: that
    // shape references its accumulator twice per level, doubling the
    // inlined expression tree per language — 2^7 copies of the count
    // subtree made language ID ~3.5 ms/doc.
    val counts = graft.functions.expressions.marker_counts(
      tokens(lower(text)), LangMarkers.map(_._2))
    val mx = array_max(counts)
    val markerLang = when(mx > 0,
      element_at(lit(LangMarkers.map(_._1).toArray), array_position(counts, mx).cast("int")))
      .otherwise("und")
    ScriptRanges.foldRight(when(cjk > 0.2, "zh").otherwise(markerLang)) {
      case ((lang, range, min), rest) => when(share(range) > min, lang).otherwise(rest)
    }
  }

  /** Canonical-form document fingerprint: md5 of the normalized text
    * (lowercase, punctuation stripped, whitespace collapsed). Two docs
    * that differ only in case/punct/spacing collide — the cheap
    * first-tier dedup key. */
  def fingerprint(text: Column): Column =
    md5(normalize(text))

  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[\\p{Punct}]", " "), "\\s+", " "))

  /** PII patterns (public-literature standard shapes: email, SSN-form
    * id, US phone, IPv4), RE2-compatible so the DuckDB oracle runs the
    * SAME regexes. Sequence order IS the redaction order (SSN before
    * phone: both are digit-dash shapes and redaction must not consume
    * the other's match). */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ssn"   -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "phone" -> "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b",
    "ipv4"  -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")

  /** Per-type PII match counts over the ORIGINAL text (counted before
    * any redaction, so the types are independent): struct
    * (n_email, n_ssn, n_phone, n_ipv4). Pure per-row regex — no
    * shuffle, codegen'd by Spark's native regexp_count. */
  def piiCounts(text: Column): Column =
    struct(PiiPatterns.map { case (n, p) =>
      regexp_count(text, lit(p)).as(s"n_$n")
    }: _*)

  /** Redact every PII match with its `[TYPE]` token, applied in
    * PiiPatterns order — the scrubbing transform a production pipeline
    * runs before training-data export. Deterministic and engine-
    * replicable (the oracle md5-pins the redacted text). */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (n, p)) =>
      regexp_replace(acc, p, s"[${n.toUpperCase}]")
    }

  /** Winnowing fingerprint (rolling polynomial k-gram hash + sliding
    * window-min selection): shift-resistant document signature, the
    * standard local-fingerprint dedup key. The hash arithmetic is
    * public (Σ codepoint·257^i mod 2³¹−1) so the DuckDB oracle
    * replicates the whole pipeline in SQL. Returns a struct
    * (n_grams, n_fp, fp_sum). */
  def winnowFingerprint(text: Column, k: Int = 5, w: Int = 4): Column =
    graft.functions.expressions.winnow_fp(tokens(normalize(text)), k, w)

  /** Document chunking for embedding/RAG pipelines: fixed-size
    * overlapping token windows (size/stride in tokens; chunking stops
    * once a window reaches the document end — Kernels.tokenChunks).
    * Emits (idCol, chunk_idx, chunk, n_tokens) — one row per chunk,
    * position-indexed so a downstream embed-then-store step keys on
    * (doc, chunk_idx). Per-row native kernel + posexplode: no shuffle,
    * scales linearly with executors like every other per-row text
    * op. Raw whitespace tokens, NOT normalized — chunk text must stay
    * verbatim for the model that consumes it. */
  def chunk(df: DataFrame,
            size: Int,
            stride: Int,
            textCol: String = "text",
            idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol),
        posexplode(graft.functions.expressions.token_chunks(
          tokens(col(textCol)), size, stride)).as(Seq("chunk_idx", "chunk")))
      .withColumn("n_tokens", size_(split(col("chunk"), "\\s+")))

  // functions.size is shadowed by the `size` parameter name above
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)

  /** Full per-document stats frame. */
  def stats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_subwords", subwordCountEstimate(t))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 6))
      .withColumn("punct_ratio", round(punctRatio(t), 6))
      .withColumn("avg_word_len", round(avgWordLen(t), 6))
      .withColumn("quality", qualityScore(t))
  }
}
