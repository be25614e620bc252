package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.operators.Dispatch

/** Pick-by-size dispatch (operators/Dispatch): the lever-pair selection
  * must flip at the session's broadcast threshold, and the dispatched
  * result must equal BOTH variants (they share one oracle). */
class DispatchSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def withThreshold[T](t: String)(body: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, t)
    try body finally spark.conf.set(key, old)
  }

  test("estimate is positive and decade-plausible at sf0.001") {
    val b = Dispatch.lpaLabelFrameBytes(spark, sf)
    // sf0.001: 150 customers + 10 suppliers — the label frame estimate
    // must land well under a MB and above nothing
    assert(b > 0 && b < (1 << 20), s"implausible label-frame estimate: $b")
  }

  test("selection flips exactly at the broadcast threshold") {
    val est = Dispatch.lpaLabelFrameBytes(spark, sf)
    withThreshold((est * 2).toString) {
      assert(Dispatch.chooseLabelProp(spark, sf) == "broadcast")
    }
    withThreshold(((est / 2).max(BigInt(1))).toString) {
      assert(Dispatch.chooseLabelProp(spark, sf) == "copart")
    }
    withThreshold("-1") { // broadcast disabled → never pick the broadcast plan
      assert(Dispatch.chooseLabelProp(spark, sf) == "copart")
    }
  }

  test("calibration: default threshold picks broadcast at sf0.1, copart at sf10") {
    // the measured bracket (BASELINE.md): q182 wins at sf0.1, OOMs at
    // sf10/8 GiB — the default 10 MB threshold must put the flip between
    withThreshold("10MB") {
      assert(Dispatch.chooseLabelProp(spark, "/root/testdata/sf0.1") == "broadcast")
      val sf10 = "testdata/sf10"
      if (new java.io.File(sf10).isDirectory)
        assert(Dispatch.chooseLabelProp(spark, sf10) == "copart")
    }
  }

  test("dispatched result equals both variants (either side of the flip)") {
    def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet
    val broadcastSide = withThreshold("1GB") {
      assert(Dispatch.chooseLabelProp(spark, sf) == "broadcast")
      canon(Dispatch.labelPropAuto(spark, sf))
    }
    val copartSide = withThreshold("1") {
      assert(Dispatch.chooseLabelProp(spark, sf) == "copart")
      canon(Dispatch.labelPropAuto(spark, sf))
    }
    assert(broadcastSide.nonEmpty)
    assert(broadcastSide == copartSide,
      "q182 and q182b disagree through the dispatcher")
  }
}
