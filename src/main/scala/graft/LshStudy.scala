package graft

import org.apache.spark.sql.SparkSession

/** Empirical study of the LSH capacity levers (bits B, tables L) — the
  * evidence behind the "deployments raise B as n grows" scaling rule in
  * knnLsh/hardNegativesLsh's docs.
  *
  * For each (B, L) config this measures, at the given scale factor:
  *  - candidate fraction: |candidates| / (n−1) for the q56 single-query
  *    probe and |pairs| / (queries·(n−1)) for the q139b batch probe —
  *    the quantity that must stay ~constant as n grows for the probe cost
  *    to stay linear (uniform-bucket expectation ≈ min(1, L/2^B));
  *  - wall of the full eager query at those parameters;
  *  - recall vs the brute-force baseline at the same sf (top-5 overlap
  *    for q56; (query, neighbor) pair overlap for q139b) — raising B only
  *    counts if L holds recall while the fraction flattens.
  *
  * Usage: `runMain graft.LshStudy <sfDir> [B1xL1,B2xL2,...]`
  * (default grid 4x16,6x24,8x32). One JSON line per (op, config).
  */
object LshStudy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val grid = args.lift(1).getOrElse("4x16,6x24,8x32").split(",").toSeq
      .map { s => val a = s.split("x"); (a(0).toInt, a(1).toInt) }
    val spark = graft.core.Sessions.local("lsh-study")
    spark.sparkContext.setLogLevel("WARN")

    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val bruteTop = llm.Similarity.knnBrute(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val bruteNeg = llm.Similarity.hardNegatives(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet

    def r3(x: Double) = math.round(x * 1000) / 1000.0
    for ((b, l) <- grid) {
      val t0 = System.nanoTime()
      val top = llm.Similarity.knnLsh(spark, sfDir, b, l)
        .collect().map(_.getLong(0)).toSet
      val w56 = (System.nanoTime() - t0) / 1e9
      val (cand, buckets) = llm.Similarity.knnLshParts(spark, sfDir, b, l)
      val nCand = try cand.count() finally buckets.unpersist(false)
      val rec56 = top.intersect(bruteTop).size.toDouble / bruteTop.size
      println(s"""{"op":"q56_knn_lsh","sf":"$sfDir","bits":$b,"tables":$l,"n":$n,""" +
        s""""cand":$nCand,"cand_frac":${r3(nCand.toDouble / (n - 1))},""" +
        s""""wall_sec":${r3(w56)},"recall":${r3(rec56)}}""")

      val t1 = System.nanoTime()
      val neg = llm.Similarity.hardNegativesLsh(spark, sfDir, b, l)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val w139 = (System.nanoTime() - t1) / 1e9
      val (pairs, pBuckets) = llm.Similarity.hardNegativesLshParts(spark, sfDir, b, l)
      val nPairs = try pairs.count() finally pBuckets.unpersist(false)
      val recNeg = neg.intersect(bruteNeg).size.toDouble / bruteNeg.size
      println(s"""{"op":"q139b_hard_negatives_lsh","sf":"$sfDir","bits":$b,"tables":$l,"n":$n,""" +
        s""""cand":$nPairs,"cand_frac":${r3(nPairs.toDouble / (3.0 * (n - 1)))},""" +
        s""""wall_sec":${r3(w139)},"recall":${r3(recNeg)}}""")
    }
    spark.stop()
  }
}
