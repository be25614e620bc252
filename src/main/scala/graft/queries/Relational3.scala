package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Third relational batch: the last §2B gaps — JSON file source, the full
  * predicate family, right/full outer joins, range-frame windows, and
  * explicit null-ordering sorts. */
object Relational3 {

  // ---------------------------------------------------------------- q47
  /** JSON-lines source round-trip (the staged-zone interchange format:
    * A13 writes json documents; a consumer reads them schema-on-read). */
  private def q47(s: SparkSession, d: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-json").toString
    Tables.orders(s, d)
      .filter(col("o_totalprice") > 400000)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").json(tmp)
    s.read
      .schema("o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, o_totalprice DOUBLE")
      .json(tmp)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
           // decimal money sum: few-group giant-sum class (q02/q59 lesson)
           round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
             .cast("double").as("revenue"))
  }

  private val q47Sql =
    """SELECT o_orderstatus, count(*) AS n,
      |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
      |FROM orders WHERE o_totalprice > 400000 GROUP BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q48
  /** Predicate family: IN, BETWEEN, LIKE, RLIKE, disjunctions — all pushed
    * or codegen'd — plus an explicit nulls-last sort. */
  private def q48(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(
        col("p_brand").isin("Brand#1", "Brand#5", "Brand#13") &&
        col("p_size").between(5, 30) &&
        col("p_name").like("%widget%") &&
        col("p_type").rlike("^(ECONOMY|PROMO)$") ||
        col("p_retailprice") > 1090.0)
      .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
      .orderBy(col("p_brand").asc_nulls_last, col("p_partkey").asc)

  private val q48Sql =
    """SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
      |WHERE (p_brand IN ('Brand#1', 'Brand#5', 'Brand#13')
      |   AND p_size BETWEEN 5 AND 30
      |   AND p_name LIKE '%widget%'
      |   AND regexp_matches(p_type, '^(ECONOMY|PROMO)$'))
      |   OR p_retailprice > 1090.0
      |ORDER BY p_brand ASC NULLS LAST, p_partkey ASC""".stripMargin

  // ---------------------------------------------------------------- q49
  /** Right + full outer joins with null-side aggregation. The supplier/
    * lineitem pairing leaves both unmatched sides populated. */
  private def q49(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_quantity") > 45).select("l_suppkey", "l_extendedprice")
    val supp = Tables.supplier(s, d)
    li.join(supp, col("l_suppkey") === col("s_suppkey"), "full_outer")
      .select(
        coalesce(col("s_suppkey"), col("l_suppkey")).as("suppkey"),
        when(col("s_suppkey").isNull, "lineitem_only")
          .when(col("l_suppkey").isNull, "supplier_only")
          .otherwise("matched").as("side"))
      .groupBy("side")
      .agg(count(lit(1)).as("n"), countDistinct(col("suppkey")).as("n_supp"))
  }

  private val q49Sql =
    """WITH li AS (SELECT l_suppkey, l_extendedprice FROM lineitem WHERE l_quantity > 45)
      |SELECT CASE WHEN s_suppkey IS NULL THEN 'lineitem_only'
      |            WHEN l_suppkey IS NULL THEN 'supplier_only'
      |            ELSE 'matched' END AS side,
      |       count(*) AS n,
      |       count(DISTINCT coalesce(s_suppkey, l_suppkey)) AS n_supp
      |FROM li FULL OUTER JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q50
  /** Range-frame window: 30-day trailing revenue per customer (rangeBetween
    * over epoch seconds — a value-based frame, not a row count). */
  private def q50(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("epoch"))
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(s, d)
      .withColumn("epoch", unix_timestamp(col("o_orderdate")))
      .withColumn("trailing_30d",
        round(sum(col("o_totalprice")).over(w), 2))
      .select("o_custkey", "o_orderkey", "o_orderdate", "trailing_30d")
  }

  private val q50Sql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  round(sum(o_totalprice) OVER (
      |    PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
      |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2) AS trailing_30d
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------- q53
  /** ORC source round-trip — the other columnar format Spark ships a
    * vectorized reader for; same lossless-write-read contract as q28/q47. */
  private def q53(s: SparkSession, d: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-orc").toString
    Tables.supplier(s, d)
      .write.mode("overwrite").orc(tmp)
    s.read.orc(tmp)
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_suppliers"),
           round(sum("s_acctbal"), 2).as("total_bal"))
  }

  private val q53Sql =
    """SELECT n_name, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_bal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  // ---------------------------------------------------------------- q62
  /** XML source round-trip (Spark 4 native XML data source — the remaining
    * interchange format after parquet/csv/json/orc/text; HL7 v3 and CDA are
    * XML, so a healthcare lake needs the path even though the v2 corpus is
    * ER7). Same lossless-write-read contract as q28/q47/q53. */
  private def q62(s: SparkSession, d: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-xml").toString
    Tables.nation(s, d)
      .write.mode("overwrite").option("rowTag", "nation").xml(tmp)
    s.read
      .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .option("rowTag", "nation").xml(tmp)
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_nations"),
           min(col("n_name")).as("first_nation"))
  }

  private val q62Sql =
    """SELECT r_name, count(*) AS n_nations, min(n_name) AS first_nation
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q53_orc_roundtrip", q53, Some(q53Sql)),
    GraftQuery("q62_xml_roundtrip", q62, Some(q62Sql)),
    GraftQuery("q47_json_roundtrip", q47, Some(q47Sql)),
    GraftQuery("q48_predicates", q48, Some(q48Sql)),
    GraftQuery("q49_full_outer", q49, Some(q49Sql)),
    GraftQuery("q50_range_frame", q50, Some(q50Sql)),
  )
}
