package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Elementwise mean of fixed-width `array<double>` vectors per group, as a
  * typed Aggregator.
  *
  * This is the centroid-update kernel for Lloyd's k-means and the PQ
  * codebook step (Similarity.scala). The naive spelling — posexplode each
  * vector and aggregate (group, pos) cells — shuffles one row per ELEMENT:
  * n·dim rows per iteration, 64 TB-class exchanges at corpus scale with
  * dim ≈ 1024. Here the partial aggregation sums whole vectors in-place
  * inside each map task (ObjectHashAggregate keeps the buffer as a JVM
  * object; serialization happens only at the exchange), so the update
  * shuffle carries ONE (sum[dim], count) row per partition per group —
  * rows ∝ partitions·k, payload ∝ k·dim, independent of n.
  *
  * Determinism note: elementwise addition order differs from the
  * per-(group, pos) avg only in summation sequence; all registered
  * consumers round to ≤ 4 decimals before pinning goldens, which absorbs
  * the ulp-level difference (verified: q98/q125/q130 goldens unchanged).
  */
object VecMean {

  /** Mutable (sum, count) buffer — a product type so the exchange row is a
    * plain (array<double>, bigint) struct. */
  case class Buf(var sum: Array[Double], var n: Long)

  private object Agg extends Aggregator[Seq[Double], Buf, Seq[Double]] {
    def zero: Buf = Buf(Array.emptyDoubleArray, 0L)

    def reduce(b: Buf, v: Seq[Double]): Buf =
      if (v == null) b
      else if (b.n == 0L) { b.sum = v.toArray; b.n = 1L; b }
      else {
        val s = b.sum
        require(v.length == s.length,
          s"vec_mean: ragged input — got width ${v.length}, expected ${s.length}")
        var i = 0
        while (i < s.length) { s(i) += v(i); i += 1 }
        b.n += 1
        b
      }

    def merge(a: Buf, c: Buf): Buf =
      if (a.n == 0L) c
      else if (c.n == 0L) a
      else {
        val s = a.sum
        val t = c.sum
        require(t.length == s.length,
          s"vec_mean: ragged input — got width ${t.length}, expected ${s.length}")
        var i = 0
        while (i < s.length) { s(i) += t(i); i += 1 }
        a.n += c.n
        a
      }

    def finish(b: Buf): Seq[Double] = {
      val n = b.n.toDouble
      scala.collection.immutable.ArraySeq.unsafeWrapArray(b.sum.map(_ / n))
    }

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** `vec_mean(v)` — aggregate an `array<double>` column to its elementwise
    * mean. All input vectors in a group must share one width (the fixed-dim
    * embedding contract; ragged input fails loudly via the explicit length
    * checks in reduce/merge — both shorter AND longer vectors throw, never
    * silently truncate). */
  val vec_mean: UserDefinedFunction = udaf(Agg)
}
