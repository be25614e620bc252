package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{GraftQuery, Relational, Relational2, Relational3, Relational4, Relational5, Relational6, Relational7, Relational8, Relational9, Relational10, Relational11, Relational12}
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
    "q21_pipeline_zones" -> Pipeline.q21ZonesOracleSql,
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
    "q21_patient_roster" ->
      """SELECT * FROM (VALUES
        |  ('1072f823357ad96f4a62cf0c9e8fca41c1da68a369ece7c71673610d378ccc7b', '000395122', 'LEVERKUHN', 'ADRIAN', '19880517180606', 'M'),
        |  ('240b7a5ccb6df15d0c74c742b9ccf48fd783d4c05def68a0016c4775892d9b44', '299202', 'TEST', 'SPEC', '19900101', 'F'),
        |  ('4274c688c64c90b4b8aa2478d3f0855eca5d018d74c41c6cb1c9e638a6f2613a', '900001', 'DOE', 'JOHN', '19601111', 'M'),
        |  ('50be00bcd3b203104d7c44493e62990babd4ce6ee7c9c6ab2ebb8a3e281aea27', '456789', 'LASTNAME', 'FIRSTNAME', '19900101', 'M'),
        |  ('691d730971add877b3da513e820a537d21843d103bdb89d0b65fe1252b7cd1bc', '299202', 'TEST', 'SPEC', '19900101', 'F'),
        |  ('84c736ccdd6692b5faaa04779582e6592306e8d6cd49cfc0cbc94b00409ae575', '999999999', 'TEST', 'PATIENT', '18450101', 'F'),
        |  ('8e5b3964ac86109d085a05dda8507ead7b5029511cdda638d0f33d7b928c41cc', '456789', 'LASTNAME', 'FIRSTNAME', '19900101', 'M'),
        |  ('a87eb542002e1b6df88dcc259987474cad1b190984a8db37c823cb6bcc8deacc', '123456', 'PATIENTLASTNAME', 'PATIENTFIRSTNAME', '19900101', 'M'),
        |  ('b568d604835830102d08bd0ced636daaf74e7d3333aa6396a41780cce74bc0ea', 'P410000', '""', '', '196505', 'M'),
        |  ('ba1dda4f745ec83255a05c6274c08692d4112d92cda0530874c53a8db8f2945c', '999999999', 'TEST', 'PATIENT', '18450101', 'F'),
        |  ('f16ffbd7ade613da299c015ea5dce61eddf90c61b9779ba093603dd014893867', '108512373', 'SAMPLES', 'JUNIOR', '01/10/1948^53 Y', 'M'))
        |  AS t(message_id, patient_id, family_name, given_name, birth_date, sex)""".stripMargin,
    "q21_er7_source" ->
      """SELECT * FROM (VALUES
        |  ('adt01', CAST(2 AS BIGINT), CAST(806 AS BIGINT)),
        |  ('adt02', CAST(1 AS BIGINT), CAST(458 AS BIGINT)),
        |  ('adt03_AthenaHealth', CAST(5 AS BIGINT), CAST(4093 AS BIGINT)),
        |  ('lab01', CAST(1 AS BIGINT), CAST(1408 AS BIGINT)),
        |  ('lab02', CAST(1 AS BIGINT), CAST(7949 AS BIGINT)),
        |  ('lab03', CAST(1 AS BIGINT), CAST(1435 AS BIGINT)))
        |  AS t(source, n_messages, total_bytes)""".stripMargin,
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
    Relational5.all ++
    Relational6.all ++
    Relational7.all ++
    Relational8.all ++
    Relational9.all ++
    Relational10.all ++
    Relational11.all ++
    Relational12.all ++
    Pipeline.queries.map { case (n, f) => GraftQuery(n, f, pipelineOracles.get(n)) } ++
    graft.hl7.Views.queries.map { case (n, f) => GraftQuery(n, f, pipelineOracles.get(n)) } ++
    graft.llm.TextAnalysis.queries ++
    graft.llm.Dedup.queries ++
    graft.llm.Similarity.queries ++
    graft.llm.Retrieval.queries ++
    graft.llm.Embeddings.queries ++
    graft.llm.Multimodal.queries ++
    graft.llm.Curation.queries ++
    graft.llm.Tokenizer.queries ++
    graft.operators.AsOf.queries ++
    graft.operators.SaltedJoin.queries ++
    graft.operators.SemiJoin.queries ++
    graft.operators.Dispatch.queries ++
    graft.streaming.StreamingPipeline.queries

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
