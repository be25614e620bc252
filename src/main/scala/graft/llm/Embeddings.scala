package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.GraftQuery

/** Embedding preprocessing: distributed PCA (and the whitening/projection
  * it enables) — the dimensionality step a training-data pipeline runs
  * before IVF/LSH indexing or dedup at scale.
  *
  * Scale shape: the covariance matrix is accumulated in ONE pass with
  * per-partition dense accumulators (`mapPartitions` — the documented
  * imperative last-resort case: a (dim × dim) running outer-product sum has
  * no DataFrame spelling that avoids exploding n·dim² rows). Each partition
  * emits exactly one (n, Σv, Σvvᵀ) triple — at 1000 executors that is 1000
  * small records to reduce, independent of corpus size. The
  * eigendecomposition runs driver-side on the dim×dim matrix (64×64 here;
  * at any realistic embedding width this is microseconds — the driver-side
  * step scales with dim², never with rows), via breeze's symmetric solver
  * (on Spark's own classpath). Projection is a broadcast of the k×dim
  * component matrix folded per row — map-side, codegen-adjacent work. */
object Embeddings {

  /** PCA model: column means, descending eigenvalues, and the matching
    * eigenvectors as rows (k × dim, row i = component i). */
  final case class PcaModel(
      mean: Array[Double],
      eigenvalues: Array[Double],
      components: Array[Array[Double]])

  /** Neumaier compensated add: folds `x` into `(hi(k), lo(k))`. The
    * residual after collapsing hi+lo is O(n·ε²)·Σ|x| ≈ 1e-27 relative at
    * n=10⁶ — some 10¹¹ times smaller than the final double's ulp — so the
    * collapsed sum is the correctly-rounded exact sum for ANY partition
    * layout or reduce order (a boundary flip needs the exact sum within
    * ~1e-11 ulps of a rounding boundary). This is what makes the fitted
    * covariance — and q117's eigenvalue profile — bit-stable across
    * 2/8/32-CPU runs at every scale decade, i.e. golden-pinnable at sf10,
    * where the plain-double fold's ~√n·ulp(S) reduce-order drift is not. */
  @inline private def cadd(hi: Array[Double], lo: Array[Double], k: Int, x: Double): Unit = {
    val h = hi(k)
    val t = h + x
    lo(k) += (if (math.abs(h) >= math.abs(x)) (h - t) + x else (x - t) + h)
    hi(k) = t
  }

  /** Fit PCA over an `(… , v: array<double>)` frame in ONE data pass —
    * the vector width is taken from each partition's first row (no
    * up-front `first()` job re-reading the source). Throws on an empty
    * frame (PCA of nothing is undefined). Accumulation is compensated
    * (see `cadd`) so the model is layout-independent bit-for-bit. */
  def fitPca(e: DataFrame): PcaModel = {
    val rdd = e.select(col("v")).rdd.map(_.getSeq[Double](0).toArray)
    val (n, sum, sumC, scatter, scatterC) = rdd
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val head = it.next()
          val dim = head.length
          var n = 0L
          val s = new Array[Double](dim)
          val sc = new Array[Double](dim)
          val m = new Array[Double](dim * dim) // lower triangle accumulated
          val mc = new Array[Double](dim * dim)
          (Iterator(head) ++ it).foreach { v =>
            n += 1
            var i = 0
            while (i < dim) {
              cadd(s, sc, i, v(i))
              var j = 0
              // v is float32-sourced: each 24-bit×24-bit product is EXACT
              // in double, so the only rounding lives in the (compensated)
              // accumulation.
              while (j <= i) { cadd(m, mc, i * dim + j, v(i) * v(j)); j += 1 }
              i += 1
            }
          }
          Iterator((n, s, sc, m, mc))
        }
      }
      .reduce { case ((n1, s1, sc1, m1, mc1), (n2, s2, sc2, m2, mc2)) =>
        var i = 0
        while (i < s1.length) { cadd(s1, sc1, i, s2(i)); sc1(i) += sc2(i); i += 1 }
        var j = 0
        while (j < m1.length) { cadd(m1, mc1, j, m2(j)); mc1(j) += mc2(j); j += 1 }
        (n1 + n2, s1, sc1, m1, mc1)
      }
    val dim = sum.length
    var k = 0
    while (k < dim) { sum(k) += sumC(k); k += 1 }
    k = 0
    while (k < dim * dim) { scatter(k) += scatterC(k); k += 1 }
    val mean = sum.map(_ / n)
    val cov = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
    for (i <- 0 until dim; j <- 0 to i) {
      val c = scatter(i * dim + j) / n - mean(i) * mean(j)
      cov(i, j) = c
      cov(j, i) = c
    }
    val es = breeze.linalg.eigSym(cov) // ascending eigenvalues
    val order = (0 until dim).sortBy(i => -es.eigenvalues(i))
    PcaModel(
      mean,
      order.map(es.eigenvalues(_)).toArray,
      order.map(i => (0 until dim).map(r => es.eigenvectors(r, i)).toArray).toArray)
  }

  /** Project onto the top-k components (means removed): map-side fold of a
    * broadcast k×dim matrix per row; output `proj: array<double>` (len k). */
  def project(e: DataFrame, model: PcaModel, k: Int): DataFrame = {
    val spark = e.sparkSession
    val bMean = spark.sparkContext.broadcast(model.mean)
    val bComp = spark.sparkContext.broadcast(model.components.take(k))
    val proj = udf { v: Seq[Double] =>
      val mean = bMean.value
      bComp.value.map { c =>
        var acc = 0.0
        var i = 0
        while (i < c.length) { acc += c(i) * (v(i) - mean(i)); i += 1 }
        acc
      }
    }
    e.withColumn("proj", proj(col("v")))
  }

  /** PCA whitening: project onto the top-k components and scale each
    * coordinate to unit variance (÷√eigenvalue) — the standard embedding
    * normalization before cosine/inner-product indexes when the corpus has
    * anisotropic spread. Components with vanishing variance are dropped
    * rather than amplified (1/√ε noise blow-up). Same broadcast-fold shape
    * as `project`. */
  def whiten(e: DataFrame, model: PcaModel, k: Int, minVar: Double = 1e-12): DataFrame = {
    val kept = model.eigenvalues.take(k).count(_ > minVar)
    val scales = model.eigenvalues.take(kept).map(ev => 1.0 / math.sqrt(ev))
    val spark = e.sparkSession
    val bScales = spark.sparkContext.broadcast(scales)
    val scaleUdf = udf { p: Seq[Double] =>
      val s = bScales.value
      Array.tabulate(s.length)(i => p(i) * s(i))
    }
    project(e, model, kept).withColumn("proj", scaleUdf(col("proj")))
  }

  /** q117 — explained-variance profile of the corpus embeddings: top-8
    * components' eigenvalues and the cumulative variance ratio. The
    * covariance fold is COMPENSATED (see `cadd`), so the model — and this
    * profile — is bit-identical across partition layouts and scales:
    * the sf0.01/sf1/sf10 outputs all pin as goldens (pre-compensation the
    * plain-double fold's reduce-order drift blocked the sf10 pin). NOTE
    * the golden (like the other pinned ANN goldens) is data-dependent:
    * the driver's gate always runs at sf0.01;
    * a local Verify at another SF will report a q117 mismatch that means
    * "wrong fixture", not "wrong code" (see SKILL.md). The semantic checks (variance-of-projection
    * == eigenvalue, orthonormal components) live in RetrievalSpec. */
  def pcaVariance(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val model = fitPca(e)
    val total = model.eigenvalues.sum
    val rows = model.eigenvalues.take(8).zipWithIndex.map { case (ev, i) =>
      (i + 1, BigDecimal(ev).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(model.eigenvalues.take(i + 1).sum / total)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    rows.toSeq.toDF("component", "eigenvalue", "cum_ratio")
  }

  // ---------------------------------------------------------------- q148
  /** Per-label embedding drift: cosine of each label's centroid against
    * the corpus centroid — the embedding-space twin of q147's word-level
    * KL (a label whose centroid swings away from the corpus signals a
    * shifted source or a bad embedding batch). Centroids are element-wise
    * means built from ONE posexplode pass partially aggregated on
    * (label, pos) — the per-(label,pos) relation is |labels|·dim rows, so
    * the corpus-sized shuffle happens exactly once and everything after is
    * broadcast-sized. The global centroid is re-aggregated from the same
    * relation (no second scan of the vectors). Rounding uses the q89
    * floor-spelling contract. */
  /** Unrounded drift frame for BoundarySpec (the q190 float-boundary
    * lesson): raw per-label cosine before the floor-round-4 spelling. */
  private[graft] def embeddingDriftRaw(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("v", col("v").cast("double"))
    val byLabel = ev.groupBy("label", "pos")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
      .withColumn("m", col("sv") / col("n"))
    val global = byLabel.groupBy("pos")
      .agg((sum("sv") / sum("n")).as("g"))
    byLabel.join(broadcast(global), "pos")
      .groupBy("label")
      .agg(max("n").as("n_vecs"),
           (sum(col("m") * col("g"))
               / (sqrt(sum(col("m") * col("m"))) * sqrt(sum(col("g") * col("g")))))
             .as("cosine_to_corpus"))
      .select("label", "n_vecs", "cosine_to_corpus")
  }

  def embeddingDrift(s: SparkSession, d: String): DataFrame =
    embeddingDriftRaw(s, d).select(
      col("label"), col("n_vecs"),
      ((floor(col("cosine_to_corpus") * 10000 + 0.5)) / 10000.0)
        .as("cosine_to_corpus"))

  private val embeddingDriftSql =
    """WITH ev AS (
      |  SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
      |         generate_subscripts(embedding, 1) AS pos
      |  FROM embeddings
      |), bl AS (
      |  SELECT label, pos, sum(v) AS sv, count(*) AS n FROM ev GROUP BY 1, 2
      |), blm AS (SELECT label, pos, sv / n AS m, n FROM bl),
      |g AS (SELECT pos, sum(sv) / sum(n) AS g FROM bl GROUP BY 1)
      |SELECT blm.label, CAST(max(blm.n) AS BIGINT) AS n_vecs,
      |       floor(sum(m * g.g)
      |             / (sqrt(sum(m * m)) * sqrt(sum(g.g * g.g)))
      |             * 10000 + 0.5) / 10000.0 AS cosine_to_corpus
      |FROM blm JOIN g USING (pos)
      |GROUP BY blm.label""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q117_pca_variance", pcaVariance _, pcaVarianceGolden),
    GraftQuery("q148_embedding_drift", embeddingDrift _, Some(embeddingDriftSql)))

  /** Pinned sf0.01 golden (see pcaVariance determinism note; identical
    * output measured at 4/8/32-thread layouts). */
  private lazy val pcaVarianceGolden: Option[String] = Some(
    """SELECT * FROM (VALUES
      |  (1, 0.02751, 0.0276), (2, 0.02717, 0.0548), (3, 0.02662, 0.0815),
      |  (4, 0.02559, 0.1071), (5, 0.02537, 0.1326), (6, 0.02508, 0.1577),
      |  (7, 0.02394, 0.1817), (8, 0.02317, 0.2049))
      |  AS t(component, eigenvalue, cum_ratio)""".stripMargin)
}
