package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Deduplication operators for training-data pipelines — exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine
  * (BASELINE.json north star).
  *
  * Scale architecture: every variant avoids the O(n²) all-pairs join.
  * Candidate generation goes through an equi-join on a bucket key
  * (band hash / simhash chunk / hyperplane bucket) that Spark executes
  * as a shuffle hash join on that key, then only candidate pairs pay
  * the exact similarity verification. At 100 TB the bucket join's key
  * cardinality grows with the data, so partitions stay balanced; the
  * only skew risk is a degenerate bucket (e.g. empty docs), which the
  * shingle guard filters out up front.
  */
object Dedup {

  // ------------------------------------------------------------- exact

  /** Exact dedup: keep the smallest id per identical text. One hash
    * aggregate, shuffling only (key-hash, id) after map-side partial
    * min — never the full payload. Group on a 128-bit fingerprint of
    * the text rather than the text itself so shuffle rows stay tiny
    * even for MB-sized documents. */
  def exact(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.groupBy(md5(col(textCol)).as("__fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .drop("__fp")

  // ---------------------------------------------------------- shingles

  /** Word k-gram shingles of the normalized text. */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = TextAnalysis.tokens(TextAnalysis.normalize(text))
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(array_distinct(transform(sequence(lit(0), size(toks) - k), i =>
        concat_ws(" ", slice(toks, i + 1, lit(k))))))
  }

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(a) + size(b) - size(array_intersect(a, b))
    when(uni === 0, 0.0).otherwise(inter / uni.cast("double"))
  }

  // ------------------------------------------------- n-gram Jaccard join

  /** Exact n-gram Jaccard similarity join: all pairs with jaccard ≥
    * threshold. Candidates come from sharing at least one shingle
    * (inverted-index equi-join on the shingle — no cross join), then
    * the exact jaccard filters. Prefix filtering note: at larger scale
    * add the standard prefix-filter (only index each doc's
    * ceil((1-τ)·|S|)+1 rarest shingles) to shrink the candidate set;
    * the join shape is unchanged. */
  def ngramJaccardPairs(df: DataFrame,
                        threshold: Double,
                        k: Int = 3,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val withSh = df.select(col(idCol).as("id"), shingles(col(textCol), k).as("sh"))
    val inv = withSh.select(col("id"), explode(col("sh")).as("shingle"))
    val candidates = inv.as("a").join(inv.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    candidates
      .join(withSh.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), Seq("id_a"))
      .join(withSh.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ------------------------------------------------------- MinHash LSH

  /** MinHash signatures: k independent permutations approximated by
    * seeded xxhash64 over each shingle; the signature entry i is the
    * min hash under seed i. Computed by exploding shingles once and
    * taking k partial mins in ONE aggregation pass (map-side combine
    * keeps shuffle rows at k longs per doc). */
  def minhashSignature(df: DataFrame,
                       numHashes: Int,
                       shingleK: Int = 3,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val exploded = df
      .select(col(idCol).as("id"), explode(shingles(col(textCol), shingleK)).as("shingle"))
    val minCols = (0 until numHashes).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    exploded.groupBy(col("id")).agg(minCols.head, minCols.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** MinHash+LSH near-dup pairs: band the signature (bands × rowsPerBand
    * = numHashes), bucket-join on (band index, band hash), verify exact
    * Jaccard on the candidates. With b=16, r=4 the probability of
    * missing a pair at jaccard 0.8 is (1-0.8⁴)¹⁶ ≈ 2·10⁻⁴.
    *
    * The band join is the scale path: shuffle keys are (band, hash) —
    * uniformly distributed by construction — and only same-bucket pairs
    * are ever materialized. */
  def minhashLshPairs(df: DataFrame,
                      threshold: Double,
                      numHashes: Int = 64,
                      bands: Int = 16,
                      shingleK: Int = 3,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = minhashSignature(df, numHashes, shingleK, textCol, idCol)

    val banded = sig.select(col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"), xxhash64(array_join(
          transform(slice(col("sig"), b * lit(r) + 1, lit(r)), h => h.cast("string")), ",")).as("bh"))))
        .as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bh").as("bh"))

    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    val withSh = df.select(col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh"))
    candidates
      .join(withSh.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), Seq("id_a"))
      .join(withSh.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ----------------------------------------------------------- SimHash

  /** 64-bit SimHash: per token-hash bit, sum +1/-1 across the document,
    * take signs. Computed per-row with higher-order functions (no
    * explode, no shuffle). */
  def simhash(text: Column): Column = {
    val hashes = transform(TextAnalysis.tokens(TextAnalysis.normalize(text)),
      w => xxhash64(w))
    val bitCols = (0 until 64).map { i =>
      val votes = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(h.bitwiseAND(lit(1L << i)) =!= 0L, 1L).otherwise(-1L))
      when(votes > 0, lit(1L << i)).otherwise(0L)
    }
    bitCols.reduce(_ bitwiseOR _)
  }

  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within a Hamming radius. Candidates via the
    * pigeonhole banding trick: split the 64-bit hash into (radius+1)
    * chunks — any pair within `radius` bit flips must agree exactly on
    * at least one chunk, so an equi-join per chunk finds all candidates
    * without a cross join. */
  def simhashPairs(df: DataFrame,
                   radius: Int = 3,
                   textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val chunks = radius + 1
    val width = 64 / chunks
    val sh = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sim"))
    val banded = sh.select(col("id"), col("sim"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("sim"), c * width)
            .bitwiseAND(lit((1L << width) - 1)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("sim"), col("bk.chunk").as("chunk"), col("bk.key").as("key"))
    banded.as("a").join(banded.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming64(col("a.sim"), col("b.sim")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= radius)
  }

  // ------------------------------------------- embedding cosine near-dup

  /** Near-duplicate pairs by embedding cosine ≥ threshold. The exact
    * variant joins on an LSH hyperplane bucket first (probability of a
    * ≥0.95-cosine pair differing in all `bits` signs is tiny), then
    * verifies exact cosine. `exhaustive=true` skips the bucket filter
    * (the oracle-checkable form; O(n²) — sf-test sized only). */
  def embeddingCosinePairs(df: DataFrame,
                           threshold: Double,
                           vecCol: String = "embedding",
                           idCol: String = "vec_id",
                           exhaustive: Boolean = false,
                           lshBits: Int = 8): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val pairs =
      if (exhaustive)
        base.as("a").join(base.as("b"), col("a.id") < col("b.id"))
      else {
        val sig = base.withColumn("bucket", VectorOps.hyperplaneSignature(col("v"), lshBits))
        sig.as("a").join(sig.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      }
    pairs.select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        VectorOps.cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"))
  }
}
