package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.hl7.Pipeline

/** DataSourceV2 front door (`format("er7")`): row parity with the composed
  * text-scan reader, column pruning, and predicate-driven file skipping. */
class Er7SourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def er7 = spark.read.format("er7").load(Pipeline.MessagesDir)

  test("er7 source rows == Pipeline.readMessages rows") {
    val v2 = er7.select("source", "msg").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val composed = Pipeline.readMessages(spark).select("source", "msg").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(v2 == composed, "V2 source diverged from the composed reader")
    assert(v2.nonEmpty)
  }

  test("n_bytes matches the UTF-8 payload length") {
    er7.collect().foreach { r =>
      assert(r.getAs[Long]("n_bytes") == r.getAs[String]("msg").getBytes("UTF-8").length)
    }
  }

  test("column pruning reaches the scan") {
    val df = er7.select("source")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("columns=[source]"), s"scan not pruned:\n$scan")
  }

  test("source predicate prunes whole files from the scan") {
    val df = er7.filter(col("source") === "lab01")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("files=1"), s"file skipping did not happen:\n$scan")
    val all = er7.filter(col("source").isin("lab01", "adt01"))
    assert(all.queryExecution.executedPlan.toString.contains("files=2"))
    // and the results are still exactly right
    assert(df.select("source").distinct().collect().map(_.getString(0)).toSeq == Seq("lab01"))
    assert(df.count() == Pipeline.readMessages(spark)
      .filter(col("source") === "lab01").count())
  }

  test("unsupported predicates are evaluated post-scan, not dropped") {
    val long = er7.filter(length(col("msg")) > 500)
    val composed = Pipeline.readMessages(spark).filter(length(col("msg")) > 500)
    assert(long.count() == composed.count())
  }
}
