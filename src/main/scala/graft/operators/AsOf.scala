package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.queries.GraftQuery

/** As-of join (nearest right row with right.ts <= left.ts, per key).
  *
  * Spark has no built-in as-of join; a range-join formulation degenerates to
  * a nested loop. This composition is the scalable pattern: union the two
  * sides tagged, sort within each key partition by (ts, side) via a window,
  * and carry the most recent right payload forward with
  * `last(ignoreNulls=true)`. One shuffle on the key, O(n log n) per
  * partition, no pair blowup — the plan survives arbitrarily long histories
  * per key (state is one row), unlike a windowed range join.
  */
object AsOf {

  /** Backward as-of join on `keyCol`, ordered by `tsCol`. `payload` columns
    * from `right` are attached to every `left` row as the values of the most
    * recent right row at-or-before the left row's timestamp. */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payload: Seq[String]): DataFrame = {
    val l = left.withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          payload.map(p => org.apache.spark.sql.types.StructField(p, right.schema(p).dataType)))))
    val r = right.withColumn("__side", lit(0))
      .withColumn("__p", struct(payload.map(col): _*))
    val lCols = left.columns
    val unioned = l.select((lCols.map(col) :+ col("__side") :+ col("__p")): _*)
      .unionByName(r.select((lCols.map(c => if (r.columns.contains(c)) col(c) else lit(null).cast(left.schema(c).dataType).as(c)) :+ col("__side") :+ col("__p")): _*))
    // right rows sort before left rows at equal ts ⇒ inclusive (<=) semantics
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__p")
  }

  /** Q41 — for every click event, the most recent at-or-before purchase by
    * the same user (left as-of semantics: clicks without a prior purchase
    * keep nulls). Oracle: DuckDB's native ASOF LEFT JOIN. */
  def clickToPurchase(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
              col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    asofBackward(clicks, purchases, "user_id", "ts", Seq("purchase_id", "purchase_value"))
      .select(col("event_id").as("click_id"), col("user_id"),
              col("__match.purchase_id").as("purchase_id"),
              round(col("__match.purchase_value"), 2).as("purchase_value"))
  }

  val clickToPurchaseSql: String =
    """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
      |c AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'click'),
      |p AS (SELECT event_id, user_id, ts, value FROM ev WHERE event_type = 'purchase')
      |SELECT c.event_id AS click_id, c.user_id,
      |       p.event_id AS purchase_id, round(p.value, 2) AS purchase_value
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q41_asof_join", clickToPurchase _, Some(clickToPurchaseSql)))
}
