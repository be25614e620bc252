package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All tables are plain parquet scans — Catalyst pushes filters/pruning into
  * the scan, so loaders stay dumb on purpose. The one normalization we own:
  * `events.ts` must surface as session-zone TIMESTAMP regardless of how the
  * generator wrote it. Generators have produced both TIMESTAMP(NANOS) (which
  * Spark's vectorized reader rejects — read as long via the legacy flag and
  * floor ns→µs, matching DuckDB's `CAST(ts AS TIMESTAMP)` truncation) and
  * TIMESTAMP(MICROS) (reads natively as TIMESTAMP_NTZ with the legacy flag
  * on — cast to TIMESTAMP, a wall-clock-preserving no-op under the UTC
  * session zone). We sniff the materialized dtype and normalize either way.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      df.schema("ts").dataType match {
        // integer `div` (not `/`): double division loses ulps at 1.7e18 ns
        case LongType      => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampType => df
        // TIMESTAMP_NTZ (µs-precision generator): the cast re-interprets the
        // wall-clock fields in the SESSION zone, so it is only the identity
        // the oracle comparison needs under UTC — assert that precondition
        // instead of silently producing shifted instants elsewhere.
        case TimestampNTZType =>
          val tz = spark.conf.get("spark.sql.session.timeZone")
          require(tz == "UTC",
            s"events.ts NTZ→TIMESTAMP normalization requires session timeZone=UTC, got $tz")
          df.withColumn("ts", col("ts").cast(TimestampType))
        // Anything else is generator schema drift — fail loudly rather than
        // cast-and-corrupt the oracle comparison (the r05 q20b/q51b micros
        // break was exactly this class of silent coercion).
        case other =>
          throw new IllegalStateException(
            s"events.ts has unexpected dtype $other; expected ns-long, TIMESTAMP or TIMESTAMP_NTZ")
      }
    } else df
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every table as a temp view (SQL surface / ad-hoc exploration). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}

/** Session factory with the scale-aware defaults used across the engine. */
object Sessions {
  def local(appName: String = "graft", cores: String = "32"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      // r13: r12's sort-writer forcing reverted — see Bench.scala (the
      // clean-window A/B showed the Spark default wins wall and CPU)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
