package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the skewed (large) side's key into
  * `factor` shards and explode the build side across all shards, so one hot
  * key's rows spread over `factor` tasks instead of landing in a single
  * straggler partition.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`) already
  * handles sort-merge skew at runtime; this helper is for the cases AQE
  * can't rewrite — aggregation-under-join pipelines and deterministic
  * pre-partitioning — and as the explicit form of the pattern for 100 TB
  * plans. Semantics are exactly `left.join(right, leftKey === rightKey)`
  * (inner).
  */
object SaltedJoin {

  def inner(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      factor: Int = 8): DataFrame = {
    // deterministic salt: spreads a hot key without rand()'s replay hazard
    val salted = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(factor)).cast("int"))
    val exploded = right.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(exploded,
        salted(leftKey) === exploded(rightKey) &&
        salted("__salt") === exploded("__salt"))
      .drop("__salt")
  }
}
