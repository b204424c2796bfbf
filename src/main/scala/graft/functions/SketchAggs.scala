package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass sketch aggregators for the dedup pipeline.
  *
  * Round 1 computed MinHash/SimHash signatures as 32/64 independent
  * aggregate columns (`min(xxhash64(lit(i), shingle))` /
  * `sum(when((h >> i) & 1 ...)))`). Catalyst generates one code path
  * per aggregate column, so those plans produced enormous generated
  * functions — JIT-hostile and the two slowest queries in BENCH_r01.
  * These typed [[Aggregator]]s keep the whole signature in ONE
  * fixed-size buffer updated in a tight primitive loop: one aggregate
  * column, map-side partial combine, O(k) memory per group, no
  * per-lane codegen. The input is a single 64-bit base hash per
  * token/shingle; per-lane hashes are derived inside the loop with a
  * splitmix64 finalizer (a public-domain mixing constant set), which
  * also removes the k-fold per-row hash expression evaluation the old
  * plan paid.
  */
object SketchAggs {

  /** splitmix64 finalizer — full-avalanche 64-bit mixer. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private[functions] def longArrayEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

/** SimHash bit-vote aggregation: input = one 64-bit token hash per
  * row; buffer = 64 vote counters (+1 when the token's bit is set,
  * −1 otherwise, weighted by token frequency as in the classic
  * Charikar construction); output = the packed 64-bit signature whose
  * bit i is set iff votes(i) > 0.
  *
  * Replaced in the engine by the per-row codegen'd
  * [[SimHashPack]] expression (a document's tokens are one row — no
  * explode/shuffle needed); retained as the independent reference
  * implementation TextDedupSpec checks the expression against.
  */
object SimHashAgg extends Aggregator[Long, Array[Long], Long] {
  override def zero: Array[Long] = new Array[Long](64)

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < 64) {
      b(i) += ((h >>> i) & 1L) * 2L - 1L
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(votes: Array[Long]): Long = {
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Long]] = SketchAggs.longArrayEncoder
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** MinHash signature aggregation: input = one 64-bit base shingle hash
  * per row; buffer = k running minima, lane i tracking
  * min(mix64(h ^ seed_i)) — k independent pseudo-random permutations
  * approximated by seeded avalanche mixing. Output = the k-element
  * signature array (banded downstream for LSH candidate generation).
  *
  * Replaced in the engine by the per-row codegen'd [[MinHashPack]]
  * expression (identical lanes, no explode/shuffle); retained as the
  * independent reference implementation TextDedupSpec checks the
  * expression against.
  */
final class MinHashAgg(numHashes: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  private val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => SketchAggs.mix64(0x9E3779B97F4A7C15L * (i + 1)))

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val hi = SketchAggs.mix64(h ^ seeds(i))
      if (hi < b(i)) b(i) = hi
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = SketchAggs.longArrayEncoder
  override def outputEncoder: Encoder[Array[Long]] = SketchAggs.longArrayEncoder
}
