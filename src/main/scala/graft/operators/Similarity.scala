package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over an embedding column
  * (BASELINE.json north star).
  *
  * Two tiers:
  *  - `bruteForceTopK` — exact cosine top-k: broadcast the (small)
  *    query set against the corpus, rank per query. The corpus side
  *    streams through executors once; per-partition partial top-k
  *    happens inside the window's sort. This is the correctness
  *    baseline the oracle checks.
  *  - `lshTopK` — scale path: hyperplane-LSH bucket the corpus once
  *    (signature = `bits`-bit sign pattern), probe each query's bucket
  *    plus all 1-bit-flip neighbors (multi-probe), exact-rank inside
  *    the probed candidates. At 100 TB the corpus signature table is
  *    computed once and reused across query batches; each query
  *    touches ~(bits+1)/2^bits of the data.
  */
object Similarity {

  /** Exact cosine top-k neighbors for each query vector.
    * Ranking key is (round(cos,9) DESC, id ASC) — rounded so that
    * float summation differences can't flip ranks between engines. */
  def bruteForceTopK(corpus: DataFrame,
                     queries: DataFrame,
                     k: Int,
                     vecCol: String = "embedding",
                     idCol: String = "vec_id"): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .withColumn("cos", round(graft.functions.expressions.cosine_sim(col("cv"), col("qv")), 9))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nbr_id"), col("cos"))
  }

  /** IVF (inverted-file) ANN: a coarse quantizer of `nlist` centroids
    * partitions the corpus into lists; queries probe their `nprobe`
    * nearest lists and rank exactly within them.
    *
    * Centroid selection here is deterministic sampling (first nlist
    * vectors by id) — the plumbing (assignment join, probe fan-out,
    * within-list exact ranking) is the scale architecture; swapping in
    * k-means centroids changes recall, not the plan. At 100 TB the
    * assignment is computed once and stored alongside the embeddings
    * (a bucketed/partitioned column), so query cost is
    * nprobe/nlist of the corpus. */
  def ivfTopK(corpus: DataFrame,
              queries: DataFrame,
              k: Int,
              nlist: Int = 16,
              nprobe: Int = 4,
              vecCol: String = "embedding",
              idCol: String = "vec_id"): DataFrame = {
    import graft.functions.expressions.cosine_sim
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"))
    val cents = corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).as("cid"), col(vecCol).as("centroid"))

    // corpus → nearest centroid (rank-1 over a broadcast cross join;
    // at scale this is precomputed and persisted with the corpus)
    val wAssign = Window.partitionBy(col("nbr_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val assigned = c.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine_sim(col("cv"), col("centroid")))
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") === 1)
      .select(col("nbr_id"), col("cv"), col("cid"))

    // queries → nprobe nearest centroids
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine_sim(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(wProbe))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid"))

    // exact ranking within probed lists only
    val wRank = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nbr_id"))
    assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", round(cosine_sim(col("cv"), col("qv")), 9))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nbr_id"), col("cos"))
  }

  /** Multi-probe hyperplane-LSH top-k. Exact ranking within probed
    * buckets; recall < 1 by construction (rows-only check). */
  def lshTopK(corpus: DataFrame,
              queries: DataFrame,
              k: Int,
              bits: Int = 8,
              vecCol: String = "embedding",
              idCol: String = "vec_id"): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"))
      .withColumn("bucket", VectorOps.hyperplaneSignature(col("cv"), bits))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qsig", VectorOps.hyperplaneSignature(col("qv"), bits))
      // probe own bucket + every 1-bit flip (multi-probe)
      .withColumn("bucket", explode(array(
        (col("qsig") +: (0 until bits).map(i => col("qsig").bitwiseXOR(lit(1L << i)))): _*)))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", round(graft.functions.expressions.cosine_sim(col("cv"), col("qv")), 9))
      .dropDuplicates("query_id", "nbr_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nbr_id"), col("cos"))
  }
}
