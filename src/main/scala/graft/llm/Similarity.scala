package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.queries.GraftQuery

/** Similarity search over the `embeddings` table (`Array[Float]` vectors):
  * brute-force cosine as the correctness baseline, IVF-bucketed search as
  * the scale path, and an embedding-cosine near-dup join with label
  * blocking. Vector math is `zip_with`/`aggregate` over double-cast arrays —
  * codegen'd builtins, element-order folds that match DuckDB's
  * `list_cosine_similarity` bit-for-bit.
  */
object Similarity {

  /** Dot product of two array<double> columns. Same left-to-right fold as
    * `aggregate(zip_with(...))` but via the codegen'd native expression —
    * the higher-order form runs interpreted and allocates per row. */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot_product(a, b)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))

  // ---------------------------------------------------------------- near-dup
  /** Embedding-cosine near-dup pairs with label blocking: the O(n²) pair
    * space is cut to within-label groups by an equi-join on `label` — the
    * blocking pattern that keeps near-dup joins feasible at scale (blocks
    * shuffle-partition independently; no global cross join). */
  def cosineNearDup(s: SparkSession, d: String): DataFrame = {
    // precompute each vector's norm once (map-side, n rows) instead of
    // folding dot(a,a)/dot(b,b) again for every one of the n² pairs
    val e = vecs(s, d).withColumn("norm", sqrt(dot(col("v"), col("v"))))
    val a = e.select(col("label"), col("vec_id").as("a_id"),
                     col("v").as("va"), col("norm").as("na"))
    val b = e.select(col("label"), col("vec_id").as("b_id"),
                     col("v").as("vb"), col("norm").as("nb"))
    a.join(b, "label")
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .filter(col("cos") >= 0.35)
      .select(col("label"), col("a_id"), col("b_id"), col("cos"))
  }

  val cosineNearDupSql: String =
    """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings)
      |SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
      |       round(list_cosine_similarity(a.v, b.v), 4) AS cos
      |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.35""".stripMargin

  // ---------------------------------------------------------------- knn brute
  /** Exact top-5 cosine neighbors of vec_id=0: broadcast the single query
    * vector (map-side compare), TakeOrderedAndProject for the top-k — no
    * global sort, no shuffle of the corpus at any scale. */
  def knnBrute(s: SparkSession, d: String): DataFrame = {
    val e = vecs(s, d)
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val scored = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("cosine", round(cosine(col("v"), col("qv")), 4))
    // top-k via orderBy+limit (TakeOrderedAndProject: per-partition heaps,
    // k-row merge) — a global row_number window here would funnel the whole
    // scored corpus through one sort task; the rank window runs on 5 rows
    scored.orderBy(col("cosine").desc, col("vec_id").asc).limit(5)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cosine").desc, col("vec_id").asc)))
      .select(col("vec_id").as("neighbor_id"), col("cosine"), col("rank"))
  }

  val knnBruteSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      |q AS (SELECT v FROM e WHERE vec_id = 0),
      |scored AS (
      |  SELECT e.vec_id, round(list_cosine_similarity(e.v, q.v), 4) AS cosine
      |  FROM e, q WHERE e.vec_id != 0)
      |SELECT vec_id AS neighbor_id, cosine,
      |       CAST(rank AS INT) AS rank
      |FROM (SELECT *, row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank FROM scored)
      |WHERE rank <= 5""".stripMargin

  // ---------------------------------------------------------------- knn IVF
  /** IVF-bucketed approximate top-5 for the same query — the 100 TB path.
    *
    * "Training" is deterministic: every 25th vector is a centroid. Vectors
    * are assigned to their nearest centroid via a broadcast join (centroid
    * set is tiny by construction — map-side, no shuffle of the corpus);
    * the query probes only its 4 nearest centroids' buckets, so the scored
    * candidate set is ~4/k of the corpus. SimilaritySpec asserts recall vs
    * the brute-force baseline instead of a SQL oracle. */
  def knnIvf(s: SparkSession, d: String): DataFrame = {
    val e = vecs(s, d).cache()
    val cents = e.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    // nearest-centroid assignment via min_by aggregation: one partial-agg
    // pass, no per-vector sort (a row_number window would shuffle + sort the
    // whole corpus); deterministic tiebreak on cent_id
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("cdist", -cosine(col("v"), col("cv")))
      .groupBy("vec_id")
      .agg(min_by(col("cent_id"), struct(col("cdist"), col("cent_id"))).as("cent_id"),
           first(col("v")).as("v"))
    val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val probes = cents.crossJoin(broadcast(q))
      .withColumn("qdist", -cosine(col("qv"), col("cv")))
      .orderBy(col("qdist").asc, col("cent_id").asc)
      .limit(4)
      .select("cent_id")
    val candidates = assigned.join(broadcast(probes), "cent_id")
    candidates.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("cosine", round(cosine(col("v"), col("qv")), 4))
      .orderBy(col("cosine").desc, col("vec_id").asc).limit(5) // TakeOrdered
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cosine").desc, col("vec_id").asc)))
      .select(col("vec_id").as("neighbor_id"), col("cosine"), col("rank"))
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q38_cosine_neardup", cosineNearDup _, Some(cosineNearDupSql)),
    GraftQuery("q39_knn_brute", knnBrute _, Some(knnBruteSql)),
    GraftQuery("q40_knn_ivf", knnIvf _, None))
}
