package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Lakehouse change-management operators: CDC changelog application and
  * SCD Type-2 history construction. The reference's lake is append-only
  * (every message immutable, dedup up front) — these are the operators a
  * user needs the moment upstream rows can change, and both reduce to
  * window functions over the change stream (no table-format machinery
  * required; a format with a commit log makes them transactional, not
  * different). The `events` table stands in as the changelog: key =
  * user_id, change-time = ts, op derived from event_type.
  */
object Relational10 {

  /** The events table as a deterministic changelog: purchase ⇒ delete (the
    * "account closed" stand-in), anything else ⇒ upsert carrying `value`.
    * Tiebreak equal timestamps by event_id — a changelog needs a total
    * order per key. */
  private def changelog(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("user_id"), col("ts"), col("event_id"),
      when(col("event_type") === "purchase", "D").otherwise("U").as("op"),
      col("value"))

  // ---------------------------------------------------------------- q104
  /** CDC merge — apply a changelog to produce final table state: the last
    * change per key wins; a terminal delete removes the key. One window
    * over the changelog (rank by change-time desc) + a filter — the
    * standard "deduplicate the CDC feed, then MERGE" shape. At 100 TB the
    * window partitions by key across the cluster (hash shuffle on user_id,
    * no global sort), and in practice runs incrementally per batch over
    * only the keys present in the batch — the full-history form here is
    * the backfill/bootstrap path. */
  private def q104(s: SparkSession, d: String): DataFrame =
    graft.operators.Cdc
      .applyChangelog(changelog(s, d), "user_id", "ts", "event_id", "op")
      .select(col("user_id"), col("ts").as("last_change"),
        round(col("value"), 4).as("value"))

  private val q104Sql =
    """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
      |log AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN event_type = 'purchase' THEN 'D' ELSE 'U' END AS op,
      |         value
      |  FROM ev)
      |SELECT user_id, ts AS last_change, round(value, 4) AS value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |                                   ORDER BY ts DESC, event_id DESC) AS rk
      |      FROM log)
      |WHERE rk = 1 AND op <> 'D'""".stripMargin

  // ---------------------------------------------------------------- q105
  /** SCD Type-2 — turn the change stream into validity intervals: each
    * upsert opens a version (valid_from = its ts) and the next change for
    * the same key closes it (valid_to = lead(ts), null ⇒ current); a
    * delete closes its predecessor without opening anything, so keys whose
    * history ends in a delete have no current row (consistent with q104).
    * The whole dimension history is one lead() window per key — same
    * shuffle profile as q104. Emitted for a bounded key slice to keep the
    * correctness artifact small; the operator itself is unbounded. */
  private def q105(s: SparkSession, d: String): DataFrame =
    graft.operators.Cdc
      .scd2(changelog(s, d).filter(col("user_id") < 50),
        "user_id", "ts", "event_id", "op")
      .select(col("user_id"), col("event_id"),
        col("valid_from"), col("valid_to"), col("is_current"),
        round(col("value"), 4).as("value"))

  private val q105Sql =
    """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
      |log AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN event_type = 'purchase' THEN 'D' ELSE 'U' END AS op,
      |         value
      |  FROM ev WHERE user_id < 50),
      |vers AS (
      |  SELECT user_id, event_id, op, ts AS valid_from,
      |         lead(ts, 1) OVER w AS valid_to,
      |         (lead(ts, 1) OVER w IS NULL) AS is_current,
      |         round(value, 4) AS value
      |  FROM log
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
      |SELECT user_id, event_id, valid_from, valid_to, is_current, value
      |FROM vers WHERE op <> 'D'""".stripMargin

  // ---------------------------------------------------------------- q106
  /** Time-series gap fill — resample each user's sparse purchase history
    * onto a dense hourly spine (per-user `sequence(min, max, 1h)` explode:
    * spine rows are generated, not shuffled in), then repair the holes
    * three standard ways in ONE window pass each: LOCF (last observation
    * carried forward), backfill, and linear interpolation between the
    * surrounding observations (index arithmetic over the same windows —
    * no self-join, no per-gap subquery). Edge gaps stay null by design.
    * Per-key windows hash-partition by user at scale; the spine multiplies
    * rows by the gap density, not the corpus. */
  private def q106(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .filter(col("user_id") < 5 && col("event_type") === "purchase")
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(round(sum("value"), 4).as("v"))
    val spine = hourly.groupBy("user_id")
      .agg(min("h").as("lo"), max("h").as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("h"))
    val w = Window.partitionBy("user_id").orderBy("h")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsIdx = when(col("v").isNotNull, col("idx"))
    spine.join(hourly, Seq("user_id", "h"), "left")
      .withColumn("idx", row_number().over(w))
      .withColumn("locf", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("bfill", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("prev_idx", max(obsIdx).over(wPrev))
      .withColumn("next_idx", min(obsIdx).over(wNext))
      // explicit floor(x·10⁴ + ½)/10⁴ rather than round(): interpolated
      // midpoints of 4-decimal inputs land EXACTLY on the rounding boundary,
      // where Spark (BigDecimal HALF_UP on the binary expansion) and DuckDB
      // disagree — spelling the arithmetic out runs the same double ops on
      // both engines, so ties break identically
      .withColumn("interp",
        when(col("v").isNotNull, col("v")).otherwise(
          floor((col("locf") + (col("bfill") - col("locf")) *
            (col("idx") - col("prev_idx")) / (col("next_idx") - col("prev_idx")))
            * 10000 + 0.5) / 10000.0))
      .select(col("user_id"), col("h"), col("v"), col("locf"), col("bfill"),
        col("interp"))
  }

  private val q106Sql =
    """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
      |hourly AS (
      |  SELECT user_id, date_trunc('hour', ts) AS h, round(sum(value), 4) AS v
      |  FROM ev WHERE user_id < 5 AND event_type = 'purchase' GROUP BY 1, 2),
      |spine AS (
      |  SELECT user_id, unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
      |  FROM hourly GROUP BY user_id),
      |joined AS (
      |  SELECT s.user_id, s.h, hourly.v FROM spine s
      |  LEFT JOIN hourly ON s.user_id = hourly.user_id AND s.h = hourly.h),
      |idx1 AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY h) AS idx
      |  FROM joined),
      |idxed AS (
      |  SELECT *,
      |    last_value(v IGNORE NULLS) OVER wp AS locf,
      |    first_value(v IGNORE NULLS) OVER wn AS bfill,
      |    max(CASE WHEN v IS NOT NULL THEN idx END) OVER wp AS prev_idx,
      |    min(CASE WHEN v IS NOT NULL THEN idx END) OVER wn AS next_idx
      |  FROM idx1
      |  WINDOW wp AS (PARTITION BY user_id ORDER BY h
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         wn AS (PARTITION BY user_id ORDER BY h
      |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT user_id, h, v, locf, bfill,
      |  CASE WHEN v IS NOT NULL THEN v
      |       ELSE floor((locf + (bfill - locf) * (idx - prev_idx)
      |                   / (next_idx - prev_idx)) * 10000 + 0.5) / 10000.0
      |  END AS interp
      |FROM idxed""".stripMargin

  // ---------------------------------------------------------------- q168
  /** Snapshot diff (the change-data-feed a table format would emit,
    * computed from plain snapshots): full-outer join on the key with
    * content-hash comparison classifies every row added / removed /
    * changed / unchanged, rolled up per source. The two "snapshot
    * versions" are carved deterministically from the documents table —
    * v1 = doc_id%10 < 8, v2 = doc_id%10 ≥ 2 with doc_id%5 == 2 texts
    * uppercased (a simulated edit) — so all four classes are exercised
    * and the oracle can rebuild both sides. One co-partitioned full-outer
    * join on the key (both sides shuffle-hash on doc_id); at scale this
    * is THE diff shape — hash first (8-byte compare), never the payload,
    * and bucketed snapshots co-locate the join entirely. */
  private def q168(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val v1 = docs.filter(pmod(col("doc_id"), lit(10)) < 8)
      .select(col("doc_id"), col("source").as("src1"),
        sha2(col("text"), 256).as("h1"))
    val v2 = docs.filter(pmod(col("doc_id"), lit(10)) >= 2)
      .withColumn("text2",
        when(pmod(col("doc_id"), lit(5)) === 2, upper(col("text")))
          .otherwise(col("text")))
      .select(col("doc_id"), col("source").as("src2"),
        sha2(col("text2"), 256).as("h2"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("h1").isNull, "added")
          .when(col("h2").isNull, "removed")
          .when(col("h1") === col("h2"), "unchanged")
          .otherwise("changed"))
      .groupBy(coalesce(col("src1"), col("src2")).as("source"))
      .agg(
        count_if(col("status") === "added").as("n_added"),
        count_if(col("status") === "removed").as("n_removed"),
        count_if(col("status") === "changed").as("n_changed"),
        count_if(col("status") === "unchanged").as("n_unchanged"))
  }

  private val q168Sql =
    """WITH v1 AS (
      |  SELECT doc_id, source AS src1, sha256(text) AS h1
      |  FROM documents WHERE doc_id % 10 < 8),
      |v2 AS (
      |  SELECT doc_id, source AS src2,
      |         sha256(CASE WHEN doc_id % 5 = 2 THEN upper(text) ELSE text END) AS h2
      |  FROM documents WHERE doc_id % 10 >= 2),
      |d AS (
      |  SELECT COALESCE(src1, src2) AS source,
      |    CASE WHEN h1 IS NULL THEN 'added'
      |         WHEN h2 IS NULL THEN 'removed'
      |         WHEN h1 = h2 THEN 'unchanged'
      |         ELSE 'changed' END AS status
      |  FROM v1 FULL OUTER JOIN v2 USING (doc_id))
      |SELECT source,
      |  CAST(count(*) FILTER (status = 'added') AS BIGINT) AS n_added,
      |  CAST(count(*) FILTER (status = 'removed') AS BIGINT) AS n_removed,
      |  CAST(count(*) FILTER (status = 'changed') AS BIGINT) AS n_changed,
      |  CAST(count(*) FILTER (status = 'unchanged') AS BIGINT) AS n_unchanged
      |FROM d GROUP BY source""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q168_snapshot_diff", q168, Some(q168Sql)),
    GraftQuery("q104_cdc_merge", q104, Some(q104Sql)),
    GraftQuery("q105_scd2", q105, Some(q105Sql)),
    GraftQuery("q106_gap_fill", q106, Some(q106Sql)))
}
