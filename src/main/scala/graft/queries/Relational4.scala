package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Fourth batch: batch sessionization (the declarative twin of streaming
  * session windows) and keep-first dedup semantics. */
object Relational4 {

  // ---------------------------------------------------------------- q51
  /** Batch sessionization with a 5-minute inactivity gap, via the classic
    * lag → gap-flag → running-sum-session-id composition. One shuffle
    * (by user), sessions of any length in O(1) memory per row — this is
    * the 100 TB formulation; `session_window` in graft.streaming is the
    * streaming twin. Oracle states the identical window algebra. */
  private def q51(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select("user_id", "event_id", "ts")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
             unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 300, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"))
      .select(col("user_id"), col("session_id").cast("long").as("session_id"),
              col("n_events"), col("session_start"), col("session_end"))
  }

  // private[graft]: the streaming twin (q51b, StreamingPipeline) registers
  // under the same oracle, pinning batch/stream sessionization parity.
  private[graft] val q51Sql =
    """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch(ts) - epoch(lag(ts) OVER w) > 300 THEN 1 ELSE 0 END AS new_session
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, event_id, ts,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |       count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end
      |FROM sessions GROUP BY user_id, session_id""".stripMargin

  // ---------------------------------------------------------------- q52
  /** Keep-first dedup: earliest event per (user, type) via min_by — the
    * ordered flavor of dropDuplicates (which keeps an arbitrary row). */
  private def q52(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id", "event_type")
      .agg(min_by(col("event_id"), struct(col("ts"), col("event_id"))).as("first_event_id"),
           min(col("ts")).as("first_ts"),
           count(lit(1)).as("n_total"))

  private val q52Sql =
    """WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
      |ranked AS (
      |  SELECT user_id, event_type, event_id, ts,
      |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn,
      |    count(*) OVER (PARTITION BY user_id, event_type) AS n_total,
      |    min(ts) OVER (PARTITION BY user_id, event_type) AS first_ts
      |  FROM ev)
      |SELECT user_id, event_type, event_id AS first_event_id, first_ts, n_total
      |FROM ranked WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------- q171
  /** Interval-overlap join: user sessions (q51's intervals, reused by
    * construction) against a campaign-window dimension, overlap predicate
    * s.start < c.end AND c.start < s.end, with clipped overlap seconds —
    * per-campaign exposure accounting (sessions touched, distinct users,
    * total overlapped time). The 4-row campaign side broadcasts (a
    * BroadcastNestedLoopJoin, bounded by the dimension — whitelisted);
    * when BOTH sides are large the q09 banding applies: slice intervals
    * to a time grid, equi-join on the band, dedup pairs. Endpoints are
    * floor-second on both engines (unix_timestamp / floor(epoch)) so the
    * overlap arithmetic is integer-exact. */
  private def q171(s: SparkSession, d: String): DataFrame = {
    val campaigns = s.sql(
      """SELECT * FROM VALUES
        |  ('c1', TIMESTAMP'2024-01-03 00:00:00', TIMESTAMP'2024-01-07 00:00:00'),
        |  ('c2', TIMESTAMP'2024-01-10 12:00:00', TIMESTAMP'2024-01-15 12:00:00'),
        |  ('c3', TIMESTAMP'2024-01-18 00:00:00', TIMESTAMP'2024-01-19 00:00:00'),
        |  ('c4', TIMESTAMP'2024-01-25 06:00:00', TIMESTAMP'2024-01-31 00:00:00')
        |  AS t(campaign, c_start, c_end)""".stripMargin)
    q51(s, d)
      .join(broadcast(campaigns),
        col("session_start") < col("c_end") && col("c_start") < col("session_end"))
      .withColumn("overlap_sec",
        unix_timestamp(least(col("session_end"), col("c_end"))) -
          unix_timestamp(greatest(col("session_start"), col("c_start"))))
      .groupBy("campaign")
      .agg(count(lit(1)).as("n_sessions"),
           countDistinct("user_id").as("n_users"),
           sum("overlap_sec").as("total_overlap_sec"))
  }

  /** Nests q51's full oracle (its own WITH chain) as the `sess` CTE body —
    * any change to session semantics propagates to both oracles. */
  private val q171Sql: String = {
    s"""WITH sess AS ($q51Sql),
      |campaigns(campaign, c_start, c_end) AS (VALUES
      |  ('c1', TIMESTAMP '2024-01-03 00:00:00', TIMESTAMP '2024-01-07 00:00:00'),
      |  ('c2', TIMESTAMP '2024-01-10 12:00:00', TIMESTAMP '2024-01-15 12:00:00'),
      |  ('c3', TIMESTAMP '2024-01-18 00:00:00', TIMESTAMP '2024-01-19 00:00:00'),
      |  ('c4', TIMESTAMP '2024-01-25 06:00:00', TIMESTAMP '2024-01-31 00:00:00'))
      |SELECT campaign, count(*) AS n_sessions,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(sum(CAST(floor(epoch(least(session_end, c_end))) AS BIGINT)
      |         - CAST(floor(epoch(greatest(session_start, c_start))) AS BIGINT))
      |       AS BIGINT) AS total_overlap_sec
      |FROM sess JOIN campaigns
      |  ON session_start < c_end AND c_start < session_end
      |GROUP BY campaign""".stripMargin
  }

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q51_sessionize", q51, Some(q51Sql)),
    GraftQuery("q52_dedup_keep_first", q52, Some(q52Sql)),
    GraftQuery("q171_campaign_overlap", q171, Some(q171Sql)),
  )
}
