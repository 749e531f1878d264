package graft.store

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pure equivalence check for the advisor's O(n log n) overlap sweep
  * (FileStatsIndex.overlapOf): on randomized interval sets across all
  * three comparator domains it must equal the O(n^2) pairwise
  * DEFINITION — mean over files f of |{g : g.lo <= f.lo <= g.hi}| / n
  * — exactly (same double arithmetic: a ratio of small integers per
  * file, then one mean). Fixed seed: deterministic, no flake. Lives in
  * package graft.store for access to the private[store] helper. */
class FileStatsSweepSpec extends AnyFunSuite {

  private def pairwise(bounded: Seq[FileStatsIndex.Bounds],
                       cmp: (Any, Any) => Int): Double =
    if (bounded.size <= 1) 0.0
    else bounded.map { f =>
      bounded.count(g =>
        cmp(g.lo, f.lo) <= 0 && cmp(g.hi, f.lo) >= 0).toDouble / bounded.size
    }.sum / bounded.size

  // the same comparator overlapOf uses, re-stated for the oracle side
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long)     => java.lang.Long.compare(x, y)
    case (x: java.lang.Double, y: java.lang.Double) => java.lang.Double.compare(x, y)
    case (x: UTF8String, y: UTF8String)             => x.compareTo(y)
    case _ => throw new IllegalStateException(s"unordered pair: $a / $b")
  }

  private def intervalsOf(rnd: scala.util.Random, n: Int,
                          mk: () => Any): Seq[FileStatsIndex.Bounds] =
    Seq.fill(n) {
      val (a, b) = (mk(), mk())
      if (cmp(a, b) <= 0) FileStatsIndex.Bounds(a, b)
      else FileStatsIndex.Bounds(b, a)
    }

  test("sweep == pairwise definition on randomized Long/Double/String interval sets") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 200) {
      val n = 1 + rnd.nextInt(40)
      // small value domains on purpose: heavy lo/hi ties exercise the
      // binary-search boundary arms (<= vs <) that a wide domain never hits
      val domain = 1 + rnd.nextInt(8)
      val gens: Seq[() => Any] = Seq(
        () => Long.box(rnd.nextInt(domain).toLong),
        () => Double.box(rnd.nextInt(domain).toDouble / 2.0),
        () => UTF8String.fromString(('a' + rnd.nextInt(domain)).toChar.toString))
      val mk = gens(trial % gens.size)
      val bounded = intervalsOf(rnd, n, mk)
      val sweep = FileStatsIndex.overlapOf(bounded)
      val brute = pairwise(bounded, cmp)
      assert(sweep == brute,
        s"trial $trial (n=$n, domain=$domain): sweep=$sweep pairwise=$brute bounds=$bounded")
    }
  }

  test("edge shapes: empty, singleton, identical intervals, disjoint points") {
    assert(FileStatsIndex.overlapOf(Nil) == 0.0)
    assert(FileStatsIndex.overlapOf(
      Seq(FileStatsIndex.Bounds(Long.box(1L), Long.box(5L)))) == 0.0)
    val same = Seq.fill(6)(FileStatsIndex.Bounds(Long.box(3L), Long.box(3L)))
    assert(FileStatsIndex.overlapOf(same) == 1.0)
    val points = (0 until 8).map(i =>
      FileStatsIndex.Bounds(Long.box(i.toLong), Long.box(i.toLong)))
    assert(FileStatsIndex.overlapOf(points) == 0.125)
  }
}
