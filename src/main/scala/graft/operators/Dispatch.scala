package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.queries.{GraftQuery, Relational11}

/** Pick-by-size dispatch for the registered lever pairs (VERDICT r09
  * "What's missing #3"): the q182/q182b, q169/q169b, q203/q203b, q65b/q65c
  * pairs are measured levers whose crossover was, until round 10, a human
  * reading BASELINE.md. This operator makes the 100 TB story executable:
  * it chooses the variant from PLANNER statistics — the same signal AQE
  * uses for join-strategy selection, lifted to whole-operator granularity.
  *
  * First instance: label propagation (q182 broadcast vs q182b
  * co-partitioned). The decision input is the per-phase label-frame size
  * estimate vs the session's `spark.sql.autoBroadcastJoinThreshold`:
  * q182 force-broadcasts the node-sized (node, lbl) frame into all ten
  * phase joins, so the moment that frame stops being broadcast-sized the
  * broadcast plan is wrong BY THE SESSION'S OWN definition of
  * broadcast-sized. Measured bracket (BASELINE.md): q182 wins at sf0.1
  * (9.5 s vs 14.5 s — the label frame is ~1 MB in-memory, far under the
  * default 10 MB threshold) and OOMs outright at sf10/8 GiB where q182b
  * completes (~100 MB hashed relation, far over). The default threshold
  * puts the flip at ~160k nodes (≈ sf1) — inside the measured bracket.
  *
  * The estimate is a ROW COUNT, not the planner's compressed-bytes stat:
  * `stats.sizeInBytes` on parquet prices the label frame at its
  * compressed-column size (~1.4 MB at sf10), while the thing that
  * actually OOMs is the in-memory HashedRelation the broadcast builds —
  * ~64 bytes/row with UnsafeRow + map overhead, ~100 MB at sf10's 1.6M
  * nodes. So the dispatcher counts rows (a parquet count(*) is
  * footer-metadata-cheap — no column is materialized) and prices them at
  * [[BroadcastBytesPerRow]]. Like AQE's, the estimate is decade-accurate,
  * which is all a 5-decade crossover needs. A cluster operator tunes ONE
  * knob — the broadcast threshold it already tunes — and the dispatcher
  * follows.
  */
object Dispatch {

  /** In-memory HashedRelation cost per broadcast label row: 16-byte
    * two-long UnsafeRow + row header + LongToUnsafeRowMap slot/array
    * overhead ≈ 48–80 B measured; 64 is the decade-accurate middle. */
  val BroadcastBytesPerRow = 64L

  /** Upper-bound estimate of the LPA label frame in bytes. Nodes ≤
    * |customer| + |supplier| (the graph's node population is
    * custkey ⊎ suppkey); counts come from parquet footers — no column
    * data is read. */
  def lpaLabelFrameBytes(s: SparkSession, d: String): BigInt =
    BigInt(Tables.customer(s, d).count() + Tables.supplier(s, d).count()) *
      BroadcastBytesPerRow

  /** The session's broadcast threshold in bytes (≤0, e.g. "-1" =
    * broadcast disabled, which forces the co-partitioned plan — the
    * right degenerate case). Accepts both plain-number and "10MB"-style
    * spellings, like the conf itself. */
  def broadcastThresholdBytes(s: SparkSession): Long = {
    val raw = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try raw.trim.toLong
    catch { case _: NumberFormatException =>
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
    }
  }

  /** Which LPA plan the dispatcher would run — exposed for the flip spec
    * and for plan audits. */
  def chooseLabelProp(s: SparkSession, d: String): String = {
    val t = broadcastThresholdBytes(s)
    if (t > 0 && lpaLabelFrameBytes(s, d) <= t) "broadcast" else "copart"
  }

  /** q182c — label propagation with automatic plan selection, gated by
    * q182's own unrolled-CTE oracle (both variants are oracle-equal, so
    * whichever side the dispatcher picks must hash-match). */
  def labelPropAuto(s: SparkSession, d: String): DataFrame =
    if (chooseLabelProp(s, d) == "broadcast") Relational11.q182(s, d)
    else Relational11.q182b(s, d)

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q182c_label_prop_auto", labelPropAuto _,
      Some(Relational11.q182Sql)))
}
