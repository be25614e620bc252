package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Round-3 continuation: SQL-surface completions — modern SQL sugar
  * (GROUP/ORDER BY ALL), exact inverse-distribution percentiles, the regexp
  * scalar family, width_bucket histograms, remaining string scalars,
  * parse_url/str_to_map extraction, and EXISTS/NOT EXISTS decorrelation.
  * Everything is a Spark built-in; oracles are DuckDB translations (DuckDB
  * lacks some function names — those oracles emulate the exact semantics
  * with arithmetic/substr, noted per query).
  */
object Relational9 {

  // ---------------------------------------------------------------- q91
  /** GROUP BY ALL + ORDER BY ALL (modern SQL sugar, Spark 4 + DuckDB both
    * support it natively — same text runs on both engines). Semantics:
    * group by every non-aggregate select item, order by the full select
    * list. The plan is identical to the explicit q02 grouping — sugar must
    * not change the physical aggregation. */
  private def q91(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gba")
    s.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       round(sum(l_quantity), 2) AS total_qty
        |FROM lineitem_gba GROUP BY ALL ORDER BY ALL""".stripMargin)
  }

  private val q91Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |       round(sum(l_quantity), 2) AS total_qty
      |FROM lineitem GROUP BY ALL ORDER BY ALL""".stripMargin

  // ---------------------------------------------------------------- q92
  /** Exact inverse-distribution percentiles (SQL:2008 WITHIN GROUP):
    * percentile_cont interpolates, percentile_disc picks the first value at
    * or past the rank — plus Spark's exact `percentile` aggregate, which is
    * percentile_cont by another name (oracle: quantile_cont). Exact
    * percentiles are a full sort per group at scale — the approx_percentile
    * sketch (q26) is the 100 TB default; this is the exact-answer path. */
  private def q92(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_pct")
    s.sql(
      """SELECT l_returnflag,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 4) AS p50,
        |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity), 4) AS p90,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25_disc,
        |  round(percentile(l_extendedprice, 0.5), 4) AS p50_price
        |FROM lineitem_pct GROUP BY l_returnflag""".stripMargin)
  }

  private val q92Sql =
    """SELECT l_returnflag,
      |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 4) AS p50,
      |  round(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity), 4) AS p90,
      |  percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25_disc,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q93
  /** Regexp scalar family beyond q16's extract/replace: regexp_count,
    * regexp_substr (NULL on miss), regexp_extract_all. DuckDB spells these
    * len(regexp_extract_all), nullif(regexp_extract, '') — the semantics
    * line up exactly for non-empty-match patterns. Pure map-side codegen'd
    * work — the scan (pruned to p_name) dominates at any scale. */
  private def q93(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      regexp_count(col("p_name"), lit("o")).as("n_o"),
      regexp_substr(col("p_name"), lit("[a-z]*ol[a-z]*")).as("first_ol"),
      array_join(regexp_extract_all(col("p_name"), lit("[a-z]{5,}"), lit(0)), ",")
        .as("long_words"))

  private val q93Sql =
    """SELECT p_partkey,
      |  len(regexp_extract_all(p_name, 'o')) AS n_o,
      |  nullif(regexp_extract(p_name, '[a-z]*ol[a-z]*'), '') AS first_ol,
      |  coalesce(array_to_string(regexp_extract_all(p_name, '[a-z]{5,}'), ','), '')
      |    AS long_words
      |FROM part""".stripMargin

  // ---------------------------------------------------------------- q94
  /** Equi-width histogram via width_bucket over a bigint measure (integer
    * input keeps the bucket-boundary float math exact on both engines; the
    * oracle emulates with floor arithmetic since DuckDB has no
    * width_bucket). The grouped count collapses map-side — the shuffle
    * carries ≤ n_buckets+2 rows per partition regardless of table size. */
  private def q94(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(width_bucket(col("o_totalprice").cast("bigint"),
        lit(0), lit(600000), lit(8)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_orders"))

  private val q94Sql =
    """SELECT CASE WHEN v < 0 THEN 0
      |            WHEN v >= 600000 THEN 9
      |            ELSE CAST(floor(v / 75000.0) AS BIGINT) + 1 END AS bucket,
      |       count(*) AS n_orders
      |FROM (SELECT CAST(o_totalprice AS BIGINT) AS v FROM orders)
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q95
  /** String scalar completions: initcap, overlay, locate, left/right.
    * DuckDB has none of initcap/overlay/locate under those names — the
    * oracle emulates each with substr/strpos arithmetic (exact semantics
    * for these single-word/fixed-position uses). */
  private def q95(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey"),
      initcap(lower(col("c_mktsegment"))).as("seg_title"),
      overlay(col("c_name"), lit("XX"), lit(3), lit(2)).as("masked_name"),
      locate("1", col("c_name")).as("pos_1"),
      substring(col("c_name"), 1, 3).as("name_prefix"),
      expr("left(c_name, 5)").as("name_l5"),
      expr("right(c_name, 4)").as("name_r4"))

  private val q95Sql =
    """SELECT c_custkey,
      |  upper(substr(lower(c_mktsegment), 1, 1)) || substr(lower(c_mktsegment), 2)
      |    AS seg_title,
      |  substr(c_name, 1, 2) || 'XX' || substr(c_name, 5) AS masked_name,
      |  strpos(c_name, '1') AS pos_1,
      |  substr(c_name, 1, 3) AS name_prefix,
      |  left(c_name, 5) AS name_l5,
      |  right(c_name, 4) AS name_r4
      |FROM customer""".stripMargin

  // ---------------------------------------------------------------- q96
  /** URL + key:value-string extraction (web-corpus normalization ops):
    * parse_url picks HOST/PATH/QUERY-param, str_to_map parses a kv string
    * and element_at projects one key. The oracle rebuilds both with
    * regexp_extract/CAST — DuckDB has neither function. Map-side only. */
  private def q96(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .withColumn("url",
        concat(lit("https://ex.com/parts/"), col("p_partkey"),
          lit("?sz="), col("p_size"),
          lit("&type="), regexp_replace(col("p_type"), " ", "_")))
      .select(
        col("p_partkey"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("type")).as("type_q"),
        element_at(
          str_to_map(concat(lit("key:"), col("p_partkey"), lit(",size:"), col("p_size")),
            lit(","), lit(":")),
          "size").as("size_kv"))

  private val q96Sql =
    """SELECT p_partkey,
      |  'ex.com' AS host,
      |  '/parts/' || p_partkey AS path,
      |  replace(p_type, ' ', '_') AS type_q,
      |  CAST(p_size AS VARCHAR) AS size_kv
      |FROM part""".stripMargin

  // ---------------------------------------------------------------- q97
  /** EXISTS / NOT EXISTS correlated subqueries in SQL form — the analyzer
    * decorrelates both into a left-semi and a left-anti join against the
    * same orders scan (q07/q08 proved the DataFrame spellings; this proves
    * the SQL path planner-level). Identical text runs on DuckDB. */
  private def q97(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_ex")
    Tables.orders(s, d).createOrReplaceTempView("orders_ex")
    s.sql(
      """SELECT c_custkey, c_name
        |FROM customer_ex c
        |WHERE EXISTS (SELECT 1 FROM orders_ex o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
        |  AND NOT EXISTS (SELECT 1 FROM orders_ex o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |""".stripMargin)
  }

  private val q97Sql =
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q91_group_by_all", q91, Some(q91Sql)),
    GraftQuery("q92_percentile_exact", q92, Some(q92Sql)),
    GraftQuery("q93_regexp_family", q93, Some(q93Sql)),
    GraftQuery("q94_width_bucket", q94, Some(q94Sql)),
    GraftQuery("q95_string_scalars", q95, Some(q95Sql)),
    GraftQuery("q96_url_kv_extract", q96, Some(q96Sql)),
    GraftQuery("q97_exists_subquery", q97, Some(q97Sql)))
}
