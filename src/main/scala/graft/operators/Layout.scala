package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical data layout for scan pruning — the write-side half of "push
  * down and prune". Directory partitioning (`Pipeline.writeLake`) prunes
  * whole directories by partition value; for high-cardinality ORDER keys
  * (dates, ids) the complementary tool is range-clustering: sample-based
  * `repartitionByRange` makes files cover DISJOINT key ranges and
  * `sortWithinPartitions` makes parquet row-group min/max stats tight, so
  * a range predicate at read time skips whole files/row-groups from
  * footer stats alone — no data pages read. At 100 TB this is the
  * difference between a date-bounded query scanning ~1/Nth of the lake
  * and scanning all of it; the same layout is what makes the compaction
  * rewrite (`Pipeline.compactLake`) worth sorting. */
object Layout {

  /** Write `df` range-clustered into `n` files on `keys`. */
  def sortedWrite(df: DataFrame, path: String, n: Int, keys: String*): Unit = {
    val cols = keys.map(col)
    df.repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Partition backfill via DYNAMIC partition overwrite: rewrite ONLY the
    * Hive partitions present in `df`, leaving every other partition of the
    * table untouched. With the default STATIC mode an `overwrite` of one
    * zone's reprocessed messages would drop the whole table first — at
    * 100 TB the difference between rewriting one day/zone directory and
    * re-materializing the lake. The conf is set per-write (option), not
    * session-wide, so concurrent static-overwrite callers keep their
    * semantics. */
  def overwritePartitions(df: DataFrame, path: String, partitionKeys: String*): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionKeys: _*)
      .parquet(path)

  /** Z-order (Morton) clustered write — the two-dimensional complement of
    * `sortedWrite`: a linear sort gives perfect file-skipping on ONE key
    * and none on the other; interleaving the bits of both keys' normalized
    * ranks gives good (≈√) skipping on EACH. Per column, values map to a
    * 16-bit code by min/max scaling (two tiny driver-side scalars — rank
    * quantiles would resist outliers, same plan shape), the codes
    * interleave into a 32-bit z-value with a folded shift/or expression
    * (pure codegen'd map work), and files come from
    * repartitionByRange(zvalue) + sortWithinPartitions — so parquet
    * footers carry tight min/max on BOTH columns. */
  def zorderWrite(df: DataFrame, path: String, n: Int,
                  colA: String, colB: String): Unit = {
    val stats = df.agg(
      min(colA), max(colA), min(colB), max(colB)).head()
    // empty input / all-null key: no range to interleave — degrade to a
    // plain write rather than NPE on the null min/max
    if (stats.isNullAt(0) || stats.isNullAt(2)) {
      df.write.mode("overwrite").parquet(path)
      return
    }
    def code(c: String, lo: Double, hi: Double): Column = {
      val span = if (hi > lo) hi - lo else 1.0
      least(greatest(((col(c) - lo) / span * 65535.0).cast("long"), lit(0L)),
        lit(65535L))
    }
    val a = code(colA, stats.getAs[Number](0).doubleValue, stats.getAs[Number](1).doubleValue)
    val b = code(colB, stats.getAs[Number](2).doubleValue, stats.getAs[Number](3).doubleValue)
    val z = (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i))
    }
    df.withColumn("__z", z)
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Dense global row ids ordered by `keys`, WITHOUT funneling the table
    * through one task: `monotonically_increasing_id` leaves gaps
    * (partition-local counters) and a `row_number()` over an un-partitioned
    * window sorts the whole table on a single executor — the classic scale
    * trap. Here: range-repartition on the keys (cluster-wide sort into `n`
    * disjoint ranges), then `zipWithIndex` — which runs one tiny count job
    * per partition and adds prefix-sum offsets map-side. Two passes over
    * the data, no global funnel; ids are 0..n-1, dense, in key order.
    *
    * CONTRACT: `keys` must be a total order (unique per row — add a
    * tiebreak column if not); with duplicate keys the order within a tie,
    * and therefore the ids, can differ between the count pass and the map
    * pass if the input is recomputed. This is the documented
    * "mapPartitions/RDD as a last resort" case — no DataFrame-only plan
    * expresses the prefix-sum without the single-task window. */
  def stableRowIds(df: DataFrame, n: Int, keys: String*): DataFrame = {
    val cols = keys.map(col)
    val sorted = df.repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("row_id",
        org.apache.spark.sql.types.LongType, nullable = false) +: sorted.schema.fields)
    val withIds = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(i +: r.toSeq)
    }
    sorted.sparkSession.createDataFrame(withIds, schema)
  }

  /** Bounded-file write: cap rows per output file so a skewed writer task
    * can't emit a multi-GB file (parquet readers parallelize across files
    * and row groups; one giant file serializes the scan's planning split
    * and any later compaction move). Spark splits a task's output into
    * multiple files after `maxRecordsPerFile` rows — this composes with the
    * range clustering above (disjoint key ranges AND bounded file sizes). */
  def boundedWrite(df: DataFrame, path: String, maxRecordsPerFile: Long): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
}

/** Pipeline observability: `Dataset.observe` attaches named aggregate
  * metrics that are computed DURING an action (accumulator-style, one pass,
  * zero extra jobs — unlike a separate `.count()` which rescans) and read
  * back on the driver afterwards. The streaming twin surfaces the same
  * metrics per micro-batch in QueryProgress events. This is the engine's
  * answer to the reference's CloudWatch per-Lambda counters (invocations /
  * errors / rejected messages). */
object Metrics {
  /** Attach named metrics; returns the instrumented frame and the handle to
    * read after the next action completes. */
  def observed(df: DataFrame, name: String, metrics: Seq[Column]): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
