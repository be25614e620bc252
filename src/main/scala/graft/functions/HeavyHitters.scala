package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequent-items sketch as a typed `Aggregator` — the engine's
  * custom-UDAF surface (SURVEY §2B "UDF/UDAF", brief: "a novel sketch").
  *
  * Guarantee: with `k` counters, every key whose true frequency exceeds
  * n/(k+1) is present in the final candidate set (undercount per key is at
  * most n/(k+1)). The sketch is NOT an exact counter, so the operator that
  * uses it (Relational6.q65) runs the standard two-pass shape: sketch the
  * candidates in one global aggregation, then recount exactly with an
  * ordinary groupBy restricted to the candidates — output is exact and
  * deterministic, hence DuckDB-oracle-checkable, while the corpus is never
  * fully grouped when the key space is huge.
  *
  * Scale shape: the buffer is a bounded map (≤ 2k entries), merged
  * associatively — Spark runs it as partial aggregation per partition plus
  * a k-sized final merge, i.e. the classic mergeable-summary pattern. The
  * amortized compress step (subtract the k-th largest count, drop ≤0) keeps
  * per-row cost O(1) instead of the textbook O(k) decrement-all.
  */
class MisraGries(k: Int) extends Aggregator[Long, Map[Long, Long], Seq[Long]]
    with Serializable {

  private def compress(m: Map[Long, Long]): Map[Long, Long] =
    if (m.size <= 2 * k) m
    else {
      // subtract the (k+1)-th largest count from everything; at most k
      // entries survive. Total decrement stays within the MG error budget.
      val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      m.collect { case (key, c) if c > cut => key -> (c - cut) }
    }

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(b: Map[Long, Long], key: Long): Map[Long, Long] =
    compress(b.updated(key, b.getOrElse(key, 0L) + 1L))

  override def merge(b1: Map[Long, Long], b2: Map[Long, Long]): Map[Long, Long] = {
    val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
    compress(small.foldLeft(big) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    })
  }

  override def finish(b: Map[Long, Long]): Seq[Long] = b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

/** [[MisraGries]] variant that finishes to the sketch MAP (key → residual
  * count) instead of the candidate key set — the mergeable-summary form a
  * streaming consumer needs: per-micro-batch sketches merged with
  * [[MisraGries.mergeSketches]] carry the SAME n/(k+1) guarantee over the
  * union of the batches (Agarwal et al. 2012, "Mergeable Summaries" —
  * MG merge is associative and the total decrement stays within one error
  * budget), so a foreachBatch sink can fold an unbounded stream into a
  * ≤2k-entry driver map and never hold per-key state
  * (StreamingPipeline q65c). */
class MisraGriesSketch(k: Int)
    extends Aggregator[Long, Map[Long, Long], Map[Long, Long]]
    with Serializable {
  private val inner = new MisraGries(k)
  override def zero: Map[Long, Long] = inner.zero
  override def reduce(b: Map[Long, Long], key: Long): Map[Long, Long] =
    inner.reduce(b, key)
  override def merge(b1: Map[Long, Long], b2: Map[Long, Long]): Map[Long, Long] =
    inner.merge(b1, b2)
  override def finish(b: Map[Long, Long]): Map[Long, Long] = b
  override def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
}

object MisraGries {
  /** Column form: `heavy_hitter_candidates(col)` — candidate keys whose
    * frequency may exceed n/(k+1), as a sorted array. */
  def candidates(c: Column, k: Int): Column = udaf(new MisraGries(k)).apply(c)

  /** Column form of the map-valued sketch (see [[MisraGriesSketch]]). */
  def sketch(c: Column, k: Int): Column = udaf(new MisraGriesSketch(k)).apply(c)

  /** Driver-side associative merge of two sketch maps under the same k —
    * add counts, then apply the same ≤2k compress the Aggregator uses. */
  def mergeSketches(a: Map[Long, Long], b: Map[Long, Long], k: Int): Map[Long, Long] =
    new MisraGries(k).merge(a, b)

  /** Driver-side reference implementation for specs. */
  def reference(xs: Seq[Long], k: Int): Set[Long] = {
    var m = Map.empty[Long, Long]
    xs.foreach { x =>
      if (m.contains(x)) m = m.updated(x, m(x) + 1)
      else if (m.size < k) m = m.updated(x, 1L)
      else m = m.collect { case (key, c) if c > 1 => key -> (c - 1) }
    }
    m.keySet
  }
}
