package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Round-3 final widening: the `DataFrameStatFunctions` exploration surface
  * and the remaining window-function completions.
  */
object Relational8 {

  // ---------------------------------------------------------------- q79
  /** Contingency table via `df.stat.crosstab` — the two-column frequency
    * matrix as one pass (internally a groupBy on the pair then a local
    * pivot; distinct-pair cardinality must be driver-small, which a
    * status×priority matrix is at any corpus size — 15 cells here whether
    * the table is 60 k or 100 TB rows). */
  private def q79(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).stat.crosstab("o_orderstatus", "o_orderpriority")

  private val q79Sql =
    """SELECT o_orderstatus AS o_orderstatus_o_orderpriority,
      |  count(*) FILTER (o_orderpriority = '1-URGENT') AS "1-URGENT",
      |  count(*) FILTER (o_orderpriority = '2-HIGH') AS "2-HIGH",
      |  count(*) FILTER (o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
      |  count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
      |  count(*) FILTER (o_orderpriority = '5-LOW') AS "5-LOW"
      |FROM orders GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q80
  /** Window completions: nth_value over the running frame, lag with an
    * explicit default, multi-step lead. The unique o_orderkey tiebreak in
    * the ordering makes RANGE and ROWS frames coincide, so both engines
    * agree row-for-row. */
  private def q80(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"),
      nth_value(col("o_totalprice"), 2).over(w).as("second_price"),
      lag(col("o_totalprice"), 1, -1.0).over(w).as("prev_price"),
      lead(col("o_totalprice"), 2).over(w).as("next2_price"))
  }

  private val q80Sql =
    """SELECT o_orderkey, o_custkey,
      |  nth_value(o_totalprice, 2) OVER w AS second_price,
      |  lag(o_totalprice, 1, -1.0) OVER w AS prev_price,
      |  lead(o_totalprice, 2) OVER w AS next2_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  // ---------------------------------------------------------------- q81
  /** XML scalar family (new in Spark 4 — the HL7v3/CDA path of q62 at
    * expression granularity): `to_xml(struct(...))` serializes per row,
    * `from_xml` parses back with an explicit schema, and `xpath_*` extracts
    * single fields. The oracle is the identity the round-trip must satisfy —
    * DuckDB never sees XML. */
  private def q81(s: SparkSession, d: String): DataFrame = {
    val xml = to_xml(struct(col("n_nationkey").as("key"), col("n_name").as("name")))
    Tables.nation(s, d)
      .withColumn("xml", xml)
      .select(
        col("n_nationkey"),
        expr("from_xml(xml, 'key INT, name STRING')").getField("name").as("rt_name"),
        xpath_int(col("xml"), lit("/ROW/key")).as("xp_key"),
        xpath_string(col("xml"), lit("/ROW/name")).as("xp_name"))
  }

  private val q81Sql =
    """SELECT n_nationkey, n_name AS rt_name,
      |       CAST(n_nationkey AS INT) AS xp_key, n_name AS xp_name
      |FROM nation""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q79_crosstab", q79, Some(q79Sql)),
    GraftQuery("q80_window_extra", q80, Some(q80Sql)),
    GraftQuery("q81_xml_scalars", q81, Some(q81Sql)),
  )
}
