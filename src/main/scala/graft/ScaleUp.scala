package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives a larger benchmark tier from the driver-generated testdata
  * (TESTDATA.md tops out at sf0.1) WITHOUT touching `/root/testdata`:
  * reads `SPARK_GRAFT_SCALE_SRC` (default `/root/testdata/sf0.1`) and
  * writes `SPARK_GRAFT_SCALE` (default 10) key-shifted replicas per
  * table to `SPARK_GRAFT_SCALE_OUT` (default `/tmp/graft_sf1`) — a
  * deterministic sf1.0-equivalent set for validating that the
  * stats-adaptive branches (prefix-filter switch, probe localization,
  * monthly salt spread) pick the big-corpus paths on real data.
  *
  * Naive ×N replication would be WRONG for the dedup/ANN families: an
  * exact copy of every document/vector would put N colliding twins in
  * every LSH band bucket, inflating candidate pairs by N² — a skew
  * artifact, not scale. So replicas decorrelate content while keeping
  * each replica's INTERNAL structure bit-identical to sf0.1:
  *   - every key domain shifts by `rep * (max(key)+1)`, and foreign
  *     keys shift by their referenced table's span, so join fan-outs
  *     and group cardinalities scale linearly;
  *   - document tokens get a per-replica suffix (replica r>0 rewrites
  *     token `w` to `w<r>`), so cross-replica shingle/minhash overlap
  *     drops to ~0 while within-replica duplicate rates, lengths and
  *     token counts match sf0.1;
  *   - embeddings cyclically rotate by `rep` positions — norm-exact,
  *     and rotations of these near-random vectors are near-orthogonal,
  *     so cosine cluster structure replicates instead of collapsing;
  *   - timestamps and dates are NOT shifted: the same 1992-2001 /
  *     event-window range at ×N per-period density is precisely the
  *     "fatter periods" case the monthly salt machinery exists for.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src   = sys.env.getOrElse("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
    val out   = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "/tmp/graft_sf1")
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    require(scale >= 1 && scale <= 64, s"scale $scale outside [1,64] (embedding rotation needs rep < dim)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is TIMESTAMP(NANOS): surface it as a raw Long (the
      // same flag every graft session sets); it rewrites as plain
      // INT64, which the readers' ns→µs div treats identically
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def table(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    // Key-domain spans, one tiny aggregate each (index-only at scale).
    val orderSpan = span(table("orders"), "o_orderkey")
    val custSpan  = span(table("customer"), "c_custkey")
    val partSpan  = span(table("part"), "p_partkey")
    val suppSpan  = span(table("supplier"), "s_suppkey")
    val eventSpan = span(table("events"), "event_id")
    val userSpan  = span(table("events"), "user_id")
    val docSpan   = span(table("documents"), "doc_id")
    val vecSpan   = span(table("embeddings"), "vec_id")

    /** One scan → N output rows per input row via a generated replica
      * column; no shuffle, stays in whole-stage codegen. `shift` maps
      * key column → its domain span. */
    def replicate(df: DataFrame, shift: Map[String, Long]): DataFrame = {
      val reps = df.withColumn("__rep", explode(sequence(lit(0), lit(scale - 1))))
      shift.foldLeft(reps) { case (d, (k, s)) =>
        d.withColumn(k, col(k) + col("__rep") * lit(s))
      }
    }

    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.drop("__rep").repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")

    // Dimension tables shared across replicas — verbatim copies.
    write(table("region"), "region", 1)
    write(table("nation"), "nation", 1)

    write(replicate(table("supplier"), Map("s_suppkey" -> suppSpan)), "supplier", 1)
    write(replicate(table("part"), Map("p_partkey" -> partSpan)), "part", 2)
    write(replicate(table("customer"), Map("c_custkey" -> custSpan)), "customer", 2)
    write(replicate(table("orders"),
      Map("o_orderkey" -> orderSpan, "o_custkey" -> custSpan)), "orders", 8)
    write(replicate(table("lineitem"),
      Map("l_orderkey" -> orderSpan, "l_partkey" -> partSpan, "l_suppkey" -> suppSpan)),
      "lineitem", 32)
    write(replicate(table("events"),
      Map("event_id" -> eventSpan, "user_id" -> userSpan)), "events", 16)

    // Documents: per-replica token suffix decorrelates shingles across
    // replicas; replica 0 is the sf0.1 corpus verbatim. n_chars tracks
    // the rewritten text.
    val docs = replicate(table("documents"), Map("doc_id" -> docSpan))
      .withColumn("text",
        when(col("__rep") === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "),
              w => concat(w, col("__rep").cast("string"))), " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    write(docs, "documents", 8)

    // Embeddings: cyclic rotation by `rep` positions (norm-preserving;
    // near-orthogonal to the original for these near-random vectors).
    val dim = table("embeddings").select(size(col("embedding"))).head().getInt(0)
    val embs = replicate(table("embeddings"), Map("vec_id" -> vecSpan))
      .withColumn("embedding",
        when(col("__rep") === 0, col("embedding"))
          .otherwise(concat(
            slice(col("embedding"), col("__rep") + 1, lit(dim) - col("__rep")),
            slice(col("embedding"), lit(1), col("__rep")))))
    write(embs, "embeddings", 4)

    val counts = Seq("lineitem", "orders", "events", "documents", "embeddings")
      .map(t => s"$t=${spark.read.parquet(s"$out/$t.parquet").count()}")
    println(s"[scaleup] wrote scale=$scale tier to $out: ${counts.mkString(", ")}")
    spark.stop()
  }
}
