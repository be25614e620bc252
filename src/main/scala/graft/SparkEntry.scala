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

  /** Every registered query, in declaration order. */
  def registry: Seq[GraftQuery] =
    Relational.all ++
    Relational2.all ++
    Relational3.all ++
    Relational4.all ++
    Pipeline.queries.map { case (n, f) => GraftQuery(n, f, None) } ++
    graft.hl7.Views.queries.map { case (n, f) => GraftQuery(n, f, None) } ++
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
