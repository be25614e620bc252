package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Tokenizer

/** BPE induction semantics: the distributed trainer must reproduce a
  * plain-Scala reference implementation exactly (same merges, same order,
  * same weights), independent of partition layout, with standard greedy
  * leftmost merge application. */
class TokenizerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Reference BPE over a word-frequency map: exact integer pair counts,
    * argmax with (count DESC, left ASC, right ASC) tie-break, greedy
    * leftmost merge application. */
  private def refBpe(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var segs: Map[Vector[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toVector }(_._2)(_ + _)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (round <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- segs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.nonEmpty) {
        val ((l, r), w) = counts.minBy { case ((l, r), w) => (-w, l, r) }
        out += ((round, l, r, w))
        segs = segs.groupMapReduce { case (syms, _) => applyMerge(syms, l, r) }(_._2)(_ + _)
      }
    }
    out.result()
  }

  private def applyMerge(syms: Vector[String], l: String, r: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
      else acc :+ x
    }

  test("greedy leftmost merge: 'aaa' under (a,a) becomes [aa, a], no re-pairing") {
    import spark.implicits._
    val got = Seq(Seq("a", "a", "a")).toDF("syms")
      .select(Tokenizer.mergeAdjacent(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].head()
    assert(got == Seq("aa", "a"))
    // and the merged token does not chain with a following exact pair
    val got2 = Seq(Seq("a", "a", "a", "a")).toDF("syms")
      .select(Tokenizer.mergeAdjacent(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].head()
    assert(got2 == Seq("aa", "aa"))
  }

  test("distributed trainer matches the plain-Scala reference, any layout") {
    import spark.implicits._
    val corpus = Seq.tabulate(60) { i =>
      Seq("lower", "lowest", "newer", "newest", "wider", "widest", "low", "new")
        .drop(i % 3).take(5).mkString(" ")
    }
    val wordFreq = corpus.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val expect = refBpe(wordFreq, 6)
    for (parts <- Seq(1, 7)) {
      val wc = corpus.toDF("text")
        .select(explode(split(col("text"), " ")).as("word"))
        .repartition(parts)
        .groupBy("word").agg(count(lit(1)).as("wc"))
      val (merges, encoded) = Tokenizer.train(spark, wc, 6)
      assert(merges.map(m => (m.rank, m.left, m.right, m.weight)) == expect,
        s"merge table diverged from reference at $parts partitions")
      // final segmentation reassembles every word exactly
      val broken = encoded
        .filter(concat_ws("", col("syms")) =!= col("word")).count()
      assert(broken == 0L)
    }
  }

  test("trainer stops cleanly when no pairs remain (single-char vocab)") {
    import spark.implicits._
    val wc = Seq(("a", 5L), ("b", 3L)).toDF("word", "wc")
    val (merges, encoded) = Tokenizer.train(spark, wc, 4)
    assert(merges.isEmpty)
    assert(encoded.select(max(size(col("syms")))).head().getInt(0) == 1)
  }
}
