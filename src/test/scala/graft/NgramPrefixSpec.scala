package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Prefix-filtered similarity join must produce EXACTLY the same pairs
  * as the plain inverted-index formulation (prefix filtering is a
  * candidate-reduction, never a semantics change). */
class NgramPrefixSpec extends SparkSpec {

  test("prefix-filtered and plain ngram joins agree on sf0.001 documents") {
    import spark.implicits._
    val d = sf("documents").select($"doc_id", $"text")
    val w = split($"text", " ")
    val aug = d.unionByName(d.filter($"doc_id" < 20)
      .withColumn("doc_id", $"doc_id" + 100000L)
      .withColumn("text", concat_ws(" ", slice(w, lit(1), size(w) - 1))))
    val plain = Dedup.ngramJaccardPairs(aug, 0.5, usePrefixFilter = Some(false))
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val prefixed = Dedup.ngramJaccardPairs(aug, 0.5, usePrefixFilter = Some(true))
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(plain.nonEmpty)
    assert(plain == prefixed)
  }
}
