package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{GraftQuery, Relational, Relational2, Relational3, Relational4}
import graft.hl7.Pipeline

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator surface (SURVEY.md §2B); each
  * entry with an oracle is hash-checked against DuckDB on the same parquet
  * tables by the driver's Verify → CORRECTNESS gate.
  */
object SparkEntry {

  /** Precomputed pipeline goldens as constant oracle SQL (SURVEY §2B Q21:
    * "oracle: precomputed expected counts") — upgrades the corpus-replay
    * queries from rows-only checks to full hash compares, and doubles as a
    * parser-regression tripwire. */
  private val pipelineOracles: Map[String, String] = Map(
    "q21_pipeline_zones" ->
      """SELECT * FROM (VALUES ('ingestion', 'er7', CAST(11 AS BIGINT)),
        |                      ('staging', 'json', CAST(11 AS BIGINT)))
        |  AS t(zone, format, n_messages)""".stripMargin,
    "q21_pid_sex" ->
      """SELECT * FROM (VALUES ('M', CAST(7 AS BIGINT)), ('F', CAST(4 AS BIGINT)))
        |  AS t(sex, n_patients)""".stripMargin,
    "q21_segment_profile" ->
      """SELECT segment_id, CAST(n AS BIGINT) AS n_segments FROM (VALUES
        |  ('ADD', 29), ('DG1', 3), ('EVN', 7), ('FTS', 1), ('GT1', 4),
        |  ('IN1', 4), ('MRG', 1), ('MSH', 11), ('NK1', 7), ('NTE', 8),
        |  ('OBR', 7), ('OBX', 110), ('PD1', 1), ('PID', 11), ('PV1', 6),
        |  ('PV2', 1)) AS t(segment_id, n)""".stripMargin,
    "q21_obx_value_types" ->
      """SELECT value_type, CAST(a AS BIGINT) AS n_obs, CAST(b AS BIGINT) AS n_codes
        |FROM (VALUES ('CE', 9, 3), ('FT', 2, 1), ('NM', 63, 63),
        |             ('ST', 32, 26), ('TS', 2, 1), ('TX', 2, 1)) AS t(value_type, a, b)""".stripMargin,
    "q54_map_funcs" ->
      """SELECT segment_id, CAST(a AS BIGINT) AS n_keys, CAST(b AS BIGINT) AS n_values,
        |       CAST(c AS BIGINT) AS n_first_elems, CAST(e AS BIGINT) AS n_keys_plus
        |FROM (VALUES
        |  ('ADD', 28, 28, 28, 57), ('DG1', 21, 21, 6, 24), ('EVN', 18, 18, 6, 25),
        |  ('FTS', 2, 2, 1, 3), ('GT1', 74, 74, 15, 78), ('IN1', 69, 69, 15, 73),
        |  ('MRG', 1, 1, 0, 2), ('MSH', 154, 154, 27, 165), ('NK1', 58, 58, 17, 65),
        |  ('NTE', 24, 24, 8, 32), ('OBR', 114, 114, 21, 121), ('OBX', 966, 966, 216, 1076),
        |  ('PD1', 4, 4, 1, 5), ('PID', 261, 317, 48, 272), ('PV1', 61, 61, 15, 67),
        |  ('PV2', 2, 2, 0, 3)) AS t(segment_id, a, b, c, e)""".stripMargin)

  /** Every registered query, in declaration order. */
  def registry: Seq[GraftQuery] =
    Relational.all ++
    Relational2.all ++
    Relational3.all ++
    Relational4.all ++
    Pipeline.queries.map { case (n, f) => GraftQuery(n, f, pipelineOracles.get(n)) } ++
    graft.hl7.Views.queries.map { case (n, f) => GraftQuery(n, f, pipelineOracles.get(n)) } ++
    graft.llm.TextAnalysis.queries ++
    graft.llm.Dedup.queries ++
    graft.llm.Similarity.queries ++
    graft.llm.Multimodal.queries ++
    graft.operators.AsOf.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.find(_.name == "q04_star_join").get.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
