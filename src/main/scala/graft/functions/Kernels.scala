package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Static per-row kernels behind the native hash expressions.
  *
  * Two jobs: (1) hold the loop bodies in ONE place so the expressions'
  * interpreted `eval` and their generated code run the same bytes —
  * `doGenCode` emits a single static call (Scala object static
  * forwarders are Janino-visible), which keeps the surrounding stage
  * in whole-stage codegen WITHOUT the CodegenFallback detour
  * (fallback materializes an InternalRow and boxes the result per
  * call); (2) make the minhash loop cheap: ONE strong 64-bit string
  * hash per shingle, with the k "permutations" derived by a splitmix64
  * stream over it (the standard one-hash/k-derived minhash recipe) —
  * the per-seed formulation re-ran two Murmur passes over the shingle
  * bytes for every one of the 64 seeds, ~64× the string hashing.
  */
object Kernels {

  /** xxhash-style 64-bit string hash built from Spark's unsafe Murmur3
    * plus a 64-bit finalizer — stable, seedable, no allocation. */
  def hash64(s: UTF8String, seed: Long): Long = {
    val h1 = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed.toInt)
    val h2 = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, (seed >>> 32).toInt ^ 0x9e3779b9)
    var x = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** splitmix64 finalizer — the per-seed derivation. */
  @inline private def mix64(v: Long): Long = {
    var z = v
    z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L
    z ^= z >>> 27; z *= 0x94d049bb133111ebL
    z ^= z >>> 31
    z
  }

  private def minhashInto(arr: ArrayData, sig: Array[Long]): Unit = {
    java.util.Arrays.fill(sig, Long.MaxValue)
    val k = sig.length
    var j = 0
    while (j < arr.numElements()) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        val base = hash64(s, 0L)
        var i = 0
        while (i < k) {
          val h = mix64(base + (i + 1).toLong * 0x9e3779b97f4a7c15L)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      j += 1
    }
  }

  def minhashSignature(arr: ArrayData, numHashes: Int): ArrayData = {
    val sig = new Array[Long](numHashes)
    minhashInto(arr, sig)
    ArrayData.toArrayData(sig)
  }

  def minhashBands(arr: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val r = numHashes / bands
    val sig = new Array[Long](numHashes)
    minhashInto(arr, sig)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var x = 0x9e3779b97f4a7c15L ^ b.toLong
      var i = 0
      while (i < r) {
        x ^= sig(b * r + i)
        x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
        x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
        x ^= x >>> 33
        i += 1
      }
      out(b) = x
      b += 1
    }
    ArrayData.toArrayData(out)
  }

  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var j = 0
    while (j < arr.numElements()) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        val h = hash64(s, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) != 0L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var out = 0L; var i = 0
    while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  /** 128-bit SimHash: two independent 64-bit token hashes (seeds 42 /
    * 1337) vote per bit; result = [bits 0–63, bits 64–127]. Twice the
    * signature width doubles the expected Hamming distance of UNRELATED
    * pairs (≈64 vs ≈32) while near-dup distances stay proportional to
    * the changed-token share — the wider gap is what lets a fixed
    * radius cover every qualifying pair at sf0.1, where the 64-bit
    * radius-6 scheme left a 12-of-311 recall tail. */
  def simhash128(arr: ArrayData): ArrayData = {
    val votes = new Array[Int](128)
    var j = 0
    while (j < arr.numElements()) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        val h0 = hash64(s, 42L)
        val h1 = hash64(s, 1337L)
        var i = 0
        while (i < 64) {
          if (((h0 >>> i) & 1L) != 0L) votes(i) += 1 else votes(i) -= 1
          if (((h1 >>> i) & 1L) != 0L) votes(64 + i) += 1 else votes(64 + i) -= 1
          i += 1
        }
      }
      j += 1
    }
    val out = new Array[Long](2)
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out(0) |= (1L << i)
      if (votes(64 + i) > 0) out(1) |= (1L << i)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Multi-band hyperplane-LSH signatures — the loop body of
    * expressions.HyperplaneBands as a static call, so the banding scan
    * stays inside whole-stage codegen. `typeCode` fixes the array
    * element type at plan time: 0=double, 1=float, 2=long, 3=int.
    * Arithmetic is bit-identical to the former interpreted eval
    * (splitmix64 finalizer over a linear combine of (seed, plane,
    * element index); top-53-bit weight uniform in [-1, 1)). */
  def hyperplaneBands(arr: ArrayData, typeCode: Int, bits: Int,
                      bands: Int, seed: Int): ArrayData = {
    val m = bands * bits
    val proj = new Array[Double](m)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val x = typeCode match {
        case 0 => arr.getDouble(j)
        case 1 => arr.getFloat(j).toDouble
        case 2 => arr.getLong(j).toDouble
        case _ => arr.getInt(j).toDouble
      }
      var p = 0
      while (p < m) {
        var z = seed.toLong * 0x9e3779b97f4a7c15L +
          p.toLong * 0xbf58476d1ce4e5b9L + j.toLong * 0x94d049bb133111ebL
        z ^= z >>> 30; z *= 0xbf58476d1ce4e5b9L
        z ^= z >>> 27; z *= 0x94d049bb133111ebL
        z ^= z >>> 31
        proj(p) += x * ((z >>> 11).toDouble / (1L << 52).toDouble - 1.0)
        p += 1
      }
      j += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L; var i = 0
      while (i < bits) {
        if (proj(b * bits + i) >= 0.0) sig |= (1L << i)
        i += 1
      }
      out(b) = sig
      b += 1
    }
    ArrayData.toArrayData(out)
  }

  /** PQ asymmetric-distance (ADC) score: Σ_m lut[m·ksub + codes[m]].
    * `lut` is a query's flattened (subspace-major) lookup table of
    * partial dot products against every codebook centroid; `codes` is a
    * corpus vector's per-subspace centroid ids. One add per subspace —
    * the whole point of PQ is that the scan never touches vectors. */
  def pqAdc(codes: ArrayData, lut: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    val n = lut.numElements()
    var acc = 0.0
    var i = 0
    while (i < m) {
      val c = codes.getInt(i)
      val j = i * ksub + c
      // bounds-checked: UnsafeArrayData.getDouble would silently read
      // arbitrary memory for a code >= ksub or an undersized lut (the
      // function is SQL-exposed as graft_pq_adc — garbage in must
      // error, not produce plausible wrong scores)
      if (c < 0 || c >= ksub || j >= n)
        throw new IllegalArgumentException(
          s"pq_adc: code $c at subspace $i out of range (ksub=$ksub, lut size=$n)")
      acc += lut.getDouble(j)
      i += 1
    }
    acc
  }

  /** Morton/Z-order interleave: bit i of dimension j lands at position
    * i·d + j, so a sort by the result alternates locality across ALL
    * dimensions (the space-filling-curve layout multi-column row-group
    * pruning needs). Caller contract: ranks are non-negative and fit
    * in `bits`; d·bits ≤ 63. */
  def interleaveBits(ranks: ArrayData, bits: Int): Long = {
    val d = ranks.numElements()
    var z = 0L
    var j = 0
    while (j < d) {
      val v = ranks.getLong(j)
      var i = 0
      while (i < bits) {
        z |= ((v >>> i) & 1L) << (i * d + j)
        i += 1
      }
      j += 1
    }
    z
  }

  private val ShingleSpace = UTF8String.fromString(" ")

  def shingles(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (n < k) {
      out.add(UTF8String.concatWs(ShingleSpace, toks: _*))
    } else {
      var s = 0
      while (s + k <= n) {
        val parts = new Array[UTF8String](k)
        var j = 0
        while (j < k) { parts(j) = toks(s + j); j += 1 }
        out.add(UTF8String.concatWs(ShingleSpace, parts: _*))
        s += 1
      }
    }
    ArrayData.toArrayData(out.toArray(new Array[UTF8String](out.size())))
  }
}
