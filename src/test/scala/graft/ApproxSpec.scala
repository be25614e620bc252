package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch-based operators (no SQL oracle). */
class ApproxSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("approx_count_distinct within 5% of exact (q10 contract)") {
    val exact = SparkEntry.queries("q10_count_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q10_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (flag, n) =>
      val a = approx(flag)
      assert(math.abs(a - n).toDouble / n <= 0.05,
        s"flag=$flag approx=$a exact=$n off by more than 5%")
    }
  }

  test("approx_percentile median within 5% of exact per group") {
    SparkEntry.queries("q26_approx_percentile")(spark, sf).collect().foreach { r =>
      val approxMedian = r.getDouble(2) // approx_p50
      val exact = r.getDouble(4)
      assert(math.abs(approxMedian - exact) / exact <= 0.05,
        s"flag=${r.getString(0)}: approx=$approxMedian exact=$exact")
    }
  }
}
