package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.GraftQuery

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

  /** q150 — the salted join under the driver's oracle gate: orders ⋈
    * customer through the salt, aggregated per market segment. The
    * aggregation keeps the compared result compact while proving bag
    * semantics end-to-end — per-key match multiplicities survive the
    * salt-and-explode only if every left row meets exactly its own salt's
    * copy of the right side. The oracle states the plain join; any salt
    * leakage (dup or dropped pairs) breaks the counts. */
  private def q150(s: SparkSession, d: String): DataFrame =
    inner(Tables.orders(s, d), Tables.customer(s, d),
        "o_custkey", "c_custkey", factor = 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
           round(sum("o_totalprice"), 2).as("sum_price"))

  private val q150Sql =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
      |       round(sum(o_totalprice), 2) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q150_salted_join", q150 _, Some(q150Sql)))
}
