package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Cdc

/** Property-based invariants of the CDC/SCD2 operators against a
  * driver-side fold over the same random changelogs — the registered
  * queries (q104/q105) are these functions over the events table; here the
  * semantics are pinned independent of any fixed dataset. */
class CdcPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** (key, ts, seq, op, payload) — seq is globally unique so (ts, seq) is a
    * total order even with colliding timestamps. */
  private def changelog(seed: Long, n: Int): Seq[(Long, Long, Long, String, Double)] = {
    val gen = for {
      key <- Gen.chooseNum(0L, 9L)
      ts <- Gen.chooseNum(0L, 20L) // dense range → many ts collisions
      op <- Gen.frequency(4 -> Gen.const("U"), 1 -> Gen.const("D"))
      v <- Gen.chooseNum(0, 1000).map(_ / 10.0)
    } yield (key, ts, op, v)
    (0 until n).flatMap { i =>
      gen(Gen.Parameters.default, Seed(seed * 10007 + i))
        .map { case (k, t, o, v) => (k, t, i.toLong, o, v) }
    }
  }

  test("applyChangelog == driver-side fold in (ts, seq) order, any input order") {
    import spark.implicits._
    for (seed <- 0L until 8L) {
      val log = changelog(seed, 200)
      val df = Cdc.applyChangelog(
        log.toDF("key", "ts", "seq", "op", "v"), "key", "ts", "seq", "op")
      val got = df.select("key", "ts", "seq", "v").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val expect = log.groupBy(_._1).flatMap { case (k, rows) =>
        val last = rows.maxBy(r => (r._2, r._3))
        if (last._4 == "D") None else Some(k -> ((last._2, last._3, last._5)))
      }
      assert(got == expect, s"seed $seed: CDC state diverged from the fold")
    }
  }

  test("scd2 intervals tile each key's timeline with exactly one open version") {
    import spark.implicits._
    for (seed <- 100L until 104L) {
      val log = changelog(seed, 150)
      val rows = Cdc.scd2(log.toDF("key", "ts", "seq", "op", "v"),
          "key", "ts", "seq")
        .select("key", "ts", "seq", "valid_from", "valid_to", "is_current")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getBoolean(5)))
      assert(rows.length == log.length, "SCD2 must keep every change row")
      rows.groupBy(_._1).foreach { case (k, versions) =>
        val ordered = versions.sortBy(v => (v._2, v._3))
        // exactly one current version: the last in change order
        assert(ordered.count(_._6) == 1, s"key $k: open-version count != 1")
        assert(ordered.last._6, s"key $k: current version is not the last")
        // every non-final valid_to equals the NEXT version's valid_from
        ordered.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._5.contains(b._4),
              s"key $k: interval gap between seq ${a._3} and ${b._3}")
          case _ => ()
        }
        // valid_from is the row's own change time
        ordered.foreach(v => assert(v._4 == v._2))
      }
    }
  }
}
