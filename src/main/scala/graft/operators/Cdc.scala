package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-management operators as reusable functions (q104/q105 are their
  * registered query forms over the events table; these take any changelog
  * frame so the semantics are property-testable on synthetic data).
  *
  * Changelog contract: one row per change with a key, a total-order pair
  * (ts, seq) within the key, an `op` column ('U' upsert / 'D' delete), and
  * arbitrary payload columns.
  */
object Cdc {

  /** `op` must be a non-null 'U' or 'D'; anything else fails the job loudly
    * (raise_error) instead of acting as a silent tombstone — a NULL op
    * would otherwise null the `=!= "D"` predicate, drop the key from
    * applyChangelog, and still close the predecessor's valid_to in scd2. */
  private def validatedOp(op: String): Column =
    when(col(op).isin("U", "D"), col(op))
      .otherwise(raise_error(concat(
        lit(s"malformed changelog: op must be 'U' or 'D', got "),
        coalesce(col(op), lit("NULL")))))

  /** Apply a changelog: last change per key wins, terminal delete removes
    * the key. One window (rank by change order desc) + filter — the
    * "deduplicate the CDC feed then MERGE" backfill shape; incremental
    * per-batch application has the same plan over only the batch's keys. */
  def applyChangelog(log: DataFrame, key: String, ts: String, seq: String,
                     op: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts).desc, col(seq).desc)
    log.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1 && validatedOp(op) =!= "D")
      .drop("__rk", op)
  }

  /** SCD Type-2: each upsert opens a version; the next change for the same
    * key closes it. A delete ('D') is a tombstone: it CLOSES the previous
    * version (its ts becomes that version's valid_to) but emits no version
    * itself — so a key whose history ends in a delete has NO current row,
    * consistent with `applyChangelog` removing the key. Adds (valid_from,
    * valid_to, is_current). */
  def scd2(log: DataFrame, key: String, ts: String, seq: String,
           op: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col(seq).asc)
    // lead runs over ALL rows (tombstones included) so a delete's ts closes
    // its predecessor; tombstone rows are then dropped from the output
    log.withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .filter(validatedOp(op) =!= "D")
      .drop(op)
  }
}
