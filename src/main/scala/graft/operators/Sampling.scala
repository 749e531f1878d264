package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `rand()`-based sampling (Spark's `sample`/`sampleBy`) is
  * engine-specific and run-order-dependent — unusable when the same
  * split must be reproducible across engines, re-runs, and backfills.
  * Hash sampling keys the decision on the ROW: keep iff the first 8
  * hex chars of md5(key) sort below the fraction's threshold. The hex
  * prefix is uniform over [0, 2³²), lowercase-hex string order equals
  * numeric order, and md5 is identical everywhere — so the sample is a
  * pure row property (stable under repartition, incremental appends,
  * and engine swaps) and a DuckDB oracle can replicate it exactly.
  * Per-row, no shuffle; the stratified variant broadcasts the tiny
  * (stratum → threshold) table.
  */
object Sampling {

  /** Threshold for `fraction` as an 8-char lowercase hex string. */
  def hashThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    f"${math.min((fraction * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  private def hashKey(keyCol: String) =
    substring(md5(col(keyCol).cast("string")), 1, 8)

  /** Keep ≈`fraction` of rows, decided per row by key hash. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(hashKey(keyCol) < lit(hashThreshold(fraction)))

  /** Deterministic shuffle-shard + sequence-packing accounting — the
    * last step of a training-data pipeline: spread documents across
    * `nShards` output shards, pseudo-randomly order each shard (md5
    * order — the deterministic global shuffle; hex string order is
    * identical in every engine), then run concat-and-chunk packing:
    * each document is assigned to the `contextTokens`-sized pack in
    * which its first token lands (running-token-count division — the
    * standard packing bookkeeping). Emits one row per document:
    * (shard, pack, doc id, its token count).
    *
    * Shape: one hash-partitioned window per shard (running sum) — a
    * single shuffle on the shard key; shards are the parallel unit at
    * any scale. The window per shard is sequential by nature — that is
    * packing's own data dependency, and nShards bounds it. */
  def packShards(df: DataFrame,
                 nShards: Int,
                 contextTokens: Long,
                 textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0 && contextTokens > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("shard", pmod(col(idCol), lit(nShards)).cast("int"))
      .withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("pack",
        floor((col("__cum") - col("n_tokens")) / contextTokens).cast("long"))
      .select(col("shard"), col("pack"), col(idCol), col("n_tokens"))
  }

  /** Token-budget MIXTURE sampling — the data-mixing step of a
    * training run: given a target token budget B and per-source
    * mixture weights w (taken as-is; the caller normalizes), each
    * source's sampling rate is min(1, B·w_s / tokens_s) and documents
    * are kept by the deterministic md5-threshold rule at that rate.
    * Sources without a weight are dropped (rate 0).
    *
    * Shape: ONE aggregation pass computes per-source token totals (the
    * only corpus-wide work — map-side combined, grouped on the
    * low-cardinality source key), the rate table is driver-sized and
    * broadcast back, and the keep decision is a pure row property —
    * stable under repartition, appends, and engine swaps, so a DuckDB
    * oracle replicates the realized sample exactly. The budget is
    * hit in expectation per source; exact-budget division is
    * `packShards`'s job downstream.
    *
    * Returns the kept rows with `n_tokens` and the source `rate`. */
  def tokenBudgetSample(df: DataFrame,
                        budgetTokens: Long,
                        weights: Map[String, Double],
                        sourceCol: String = "source",
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val withTok = df.withColumn("n_tokens",
      TextAnalysis.tokenCount(col(textCol)).cast("long"))
    val totals = withTok.groupBy(col(sourceCol))
      .agg(sum(col("n_tokens")).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val rates = totals.map { case (s, t) =>
      val w = weights.getOrElse(s, 0.0)
      (s, math.min(1.0, budgetTokens.toDouble * w / math.max(t, 1L).toDouble))
    }
    val rateDf = rates.toSeq.map { case (s, r) => (s, r, hashThreshold(r)) }
      .toDF(sourceCol, "rate", "__th")
    withTok.join(broadcast(rateDf), Seq(sourceCol))
      .filter(hashKey(idCol) < col("__th"))
      .drop("__th")
  }

  /** Temperature-scaled mixture sampling — the multilingual/
    * multi-domain rebalancing rule (mBERT/XLM-R lineage): target
    * mixture weight w_s ∝ tokens_s^(1/T), so T = 1 reproduces the
    * corpus proportions and T > 1 flattens toward uniform, upweighting
    * small sources without hand-tuned weights. Rates then follow the
    * token-budget rule: rate_s = min(1, B·w_s / tokens_s).
    *
    * Determinism contract (what lets a DuckDB oracle replicate the
    * realized sample): each pow term is rounded to 6 decimals and the
    * normalizer summed EXACTLY (BigDecimal here, DECIMAL in SQL) so
    * summation order cannot perturb it; the final rate is rounded to 9
    * decimals BEFORE the %08x threshold is derived. Same plan shape as
    * [[tokenBudgetSample]]: one map-side-combined aggregation for the
    * totals, a broadcast rate table, and a pure-row-property keep
    * decision. */
  def temperatureSample(df: DataFrame,
                        budgetTokens: Long,
                        temperature: Double,
                        sourceCol: String = "source",
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(temperature > 0.0, "temperature must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val inv = 1.0 / temperature
    val withTok = df.withColumn("n_tokens",
      TextAnalysis.tokenCount(col(textCol)).cast("long"))
    val totals = withTok.groupBy(col(sourceCol))
      .agg(sum(col("n_tokens")).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val powR = totals.map { case (s, t) =>
      (s, t, BigDecimal(math.pow(math.max(t, 1L).toDouble, inv))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }
    val sumPow = powR.map(_._3).sum // exact decimal sum — order-free
    val rates = powR.map { case (s, t, p) =>
      val r = math.min(1.0,
        budgetTokens.toDouble * (p.toDouble / sumPow.toDouble) / t.toDouble)
      (s, BigDecimal(r).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val rateDf = rates.toSeq.map { case (s, r) => (s, r, hashThreshold(r)) }
      .toDF(sourceCol, "rate", "__th")
    withTok.join(broadcast(rateDf), Seq(sourceCol))
      .filter(hashKey(idCol) < col("__th"))
      .drop("__th")
  }

  /** Leakage-free train/validation/test split: near-duplicate
    * documents must land in the SAME split, or held-out evaluation
    * leaks training data through its near-copies (the contamination
    * failure mode eval suites get audited for). Membership is decided
    * per near-dup CLUSTER, not per document: connected components over
    * the supplied pair frame give each doc a cluster id (singletons
    * are their own cluster), and the md5-threshold rule assigns the
    * CLUSTER to the first split whose cumulative-fraction threshold
    * its hash sorts under — deterministic across engines, re-runs,
    * and appends, like every sampler here. `splits` is ordered
    * (name → fraction, fractions summing to ≤ 1; a remainder falls in
    * the last split).
    *
    * Plan shape: the pair frame is near-dup-sized, the component join
    * is one shuffle on doc id, the split decision is a pure row
    * property. At 100 TB the expensive part is the pair GENERATION,
    * which is whichever dedup operator the caller already ran. */
  def leakageFreeSplit(docs: DataFrame,
                       pairs: DataFrame,
                       splits: Seq[(String, Double)],
                       idCol: String = "doc_id"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.map(_._2).sum <= 1.0 + 1e-9, "split fractions must sum to <= 1")
    // connectedComponents keys on long ids; a non-numeric id would cast
    // to null and silently dump every singleton into the last split
    require(docs.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"leakageFreeSplit needs a numeric '$idCol' column (connectedComponents " +
        "keys on long ids); hash string ids to longs first (e.g. xxhash64)")
    val spark = docs.sparkSession
    import spark.implicits._
    val cc = Dedup.connectedComponents(pairs)
      .withColumnsRenamed(Map("id" -> idCol, "cluster" -> "__cluster"))
    val clustered = docs.join(cc, Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("__cluster"), col(idCol).cast("long")))
      .drop("__cluster")
    // cumulative thresholds: split i owns hashes in [th(i-1), th(i));
    // the remainder joins the LAST split so every doc is assigned
    val cum = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val bounds = splits.map(_._1).zip(cum.map(hashThreshold))
    val splitCol = bounds.init.reverse.foldLeft(
      lit(bounds.last._1): org.apache.spark.sql.Column) {
      case (acc, (name, th)) => when(col("__h") < lit(th), lit(name)).otherwise(acc)
    }
    clustered.withColumn("__h", hashKey("cluster"))
      .withColumn("split", splitCol)
      .drop("__h")
  }

  /** Stratified deterministic sampling: per-stratum fractions with a
    * default for unlisted strata — the eval-set carving recipe (e.g.
    * oversample rare languages, downsample dominant sources). */
  def stratifiedHashSample(df: DataFrame,
                           stratumCol: String,
                           keyCol: String,
                           fractions: Map[String, Double],
                           default: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val th = fractions.toSeq.map { case (s, f) => (s, hashThreshold(f)) }
      .toDF(stratumCol, "__th")
    df.join(broadcast(th), Seq(stratumCol), "left")
      .withColumn("__th", coalesce(col("__th"), lit(hashThreshold(default))))
      .filter(hashKey(keyCol) < col("__th"))
      .drop("__th")
  }
}
