package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType}
import graft.core.Tables

/** Fifth batch: the remaining array/JSON scalar-family surface as scalar
  * outputs (the driver's comparer can't sort array cells — round-1 lesson),
  * and deterministic hash-based dataset splitting (the train/test-split
  * primitive of a training-data pipeline).
  */
object Relational5 {

  // ---------------------------------------------------------------- q57
  /** Array function family beyond q19: slice/flatten/reverse/sort_array/
    * array_position/array_distinct/filter/zip_with — each collapsed to a
    * scalar so the result stays comparer-friendly. All map-side codegen'd
    * built-ins; zero shuffles. */
  private def q57(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .withColumn("v", col("embedding").cast("array<double>"))
      .select(
        col("vec_id"),
        size(col("v")).as("dim"),
        round(array_max(col("v")), 4).as("mx"),
        round(array_min(col("v")), 4).as("mn"),
        round(element_at(sort_array(col("v")), 2), 4).as("second_smallest"),
        round(aggregate(zip_with(col("v"), reverse(col("v")), (x, y) => x * y),
                        lit(0.0), (acc, x) => acc + x), 4).as("rev_dot"),
        size(filter(col("v"), x => x > 0)).as("n_pos"),
        size(array_distinct(col("v"))).as("n_distinct"),
        round(aggregate(flatten(array(slice(col("v"), 1, 2), slice(col("v"), 3, 2))),
                        lit(0.0), (acc, x) => acc + x), 4).as("head4_sum"),
        array_position(col("v"), array_max(col("v"))).as("pos_max"))

  private val q57Sql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings)
      |SELECT vec_id, CAST(len(v) AS INT) AS dim,
      |  round(list_max(v), 4) AS mx,
      |  round(list_min(v), 4) AS mn,
      |  round(list_sort(v)[2], 4) AS second_smallest,
      |  round(list_dot_product(v, list_reverse(v)), 4) AS rev_dot,
      |  CAST(len(list_filter(v, x -> x > 0)) AS INT) AS n_pos,
      |  CAST(len(list_distinct(v)) AS INT) AS n_distinct,
      |  round(list_sum(flatten([v[1:2], v[3:4]])), 4) AS head4_sum,
      |  CAST(list_position(v, list_max(v)) AS BIGINT) AS pos_max
      |FROM e""".stripMargin

  // ---------------------------------------------------------------- q58
  /** JSON function family beyond q18/q29: json_tuple (generator form),
    * to_json∘struct → get_json_object round-trip, from_json over an array,
    * schema_of_json (schema inference as data). The round-trip column proves
    * serialize∘extract is lossless on doubles; the oracle states the
    * identity directly. */
  private def q58(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"), col("props"),
        json_tuple(col("props"), "k").as("k_str"))
      .select(
        col("event_id"),
        col("k_str"),
        get_json_object(to_json(struct(col("event_type"), col("value"))), "$.value")
          .cast("double").as("value_rt"),
        size(from_json(lit("[1,2,3]"), ArrayType(IntegerType))).as("arr_len"),
        schema_of_json(lit("""{"k": 1}""")).as("props_schema"))

  private val q58Sql =
    """SELECT event_id, props->>'$.k' AS k_str, value AS value_rt,
      |  CAST(json_array_length('[1,2,3]') AS INT) AS arr_len,
      |  'STRUCT<k: BIGINT>' AS props_schema
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- q59
  /** Deterministic hash-based train/test split — the reproducible sampling
    * primitive of a training-data pipeline (same row → same split on any
    * cluster, any run, any engine; no seeded RNG drift). The split predicate
    * is a pure map-side function of the row key (md5 first hex nibble:
    * 2/16 → test), so at 100 TB it costs one hash per row, no shuffle, and
    * composes with partition pruning. */
  private def q59(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("h", md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"))))
      .withColumn("split",
        when(substring(col("h"), 1, 1).isin("0", "1"), "test").otherwise("train"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_rows"),
           countDistinct(col("l_orderkey")).as("n_orders"),
           // associative DECIMAL(18,2) sum + one IEEE division for the avg
           // (q02/q04 technique): the float sum drifted to CLOSE at sf10
           round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)
             .cast("double").as("sum_price"),
           round(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
             / count(lit(1)), 4).as("avg_qty"))

  private val q59Sql =
    """WITH keyed AS (
      |  SELECT *, md5(concat_ws('-', l_orderkey, l_linenumber)) AS h FROM lineitem)
      |SELECT CASE WHEN substring(h, 1, 1) IN ('0', '1') THEN 'test' ELSE 'train' END AS split,
      |       count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders,
      |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price,
      |       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty
      |FROM keyed GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q60
  /** Seeded stratified sampling (`sampleBy`): per-stratum Bernoulli
    * fractions — downsample dominant languages, keep the rare ones whole,
    * the class-rebalancing primitive of corpus construction. Map-side
    * (a seeded hash draw per row, no shuffle before the profile agg).
    * The seeded draw sequence is engine-specific so DuckDB can't recompute
    * it: hash-checked against a pinned sf0.01 golden (seed 42, bit-stable
    * across partition counts — see graft.core.Goldens); the spec bounds
    * each stratum's realized fraction and asserts run-to-run determinism. */
  private def q60(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .stat.sampleBy("lang",
        Map("en" -> 0.5, "es" -> 0.5, "fr" -> 1.0, "de" -> 1.0, "zh" -> 1.0),
        42L)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"))

  // ---------------------------------------------------------------- q126
  /** Quality-weighted deterministic sampling — the bucketized importance-
    * sampling shape (DSIR-style: per-example keep probability from a quality
    * proxy, here length tiers long/mid/short → 0.9/0.5/0.1). The uniform
    * draw is the first 48 bits of md5("dsir|" + doc_id) compared against the
    * tier cutoff ⌊w·2⁴⁸⌋ AS 12-char lowercase hex — equal-length lowercase
    * hex compares lexicographically in numeric order, and both engines
    * produce the identical digest string, so the sampled SET (not just its
    * size) is engine-independent and fully oracle-checked. Pure map-side:
    * one hash + one string compare per row, no shuffle, no seeded-RNG
    * partition-order drift — the q59 contract extended from split
    * assignment to weighted acceptance. */
  private def q126(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("tier",
        when(col("n_chars") > 400, "long")
          .when(col("n_chars") >= 200, "mid")
          .otherwise("short"))
      .withColumn("cut",
        when(col("tier") === "long", "e66666666666")   // ⌊0.9·2⁴⁸⌋
          .when(col("tier") === "mid", "800000000000") // ⌊0.5·2⁴⁸⌋
          .otherwise("199999999999"))                  // ⌊0.1·2⁴⁸⌋
      .withColumn("u", substring(md5(concat_ws("|", lit("dsir"), col("doc_id"))), 1, 12))
      .filter(col("u") < col("cut"))
      .select("doc_id", "tier")

  private val q126Sql =
    """WITH t AS (
      |  SELECT doc_id,
      |         CASE WHEN n_chars > 400 THEN 'long'
      |              WHEN n_chars >= 200 THEN 'mid'
      |              ELSE 'short' END AS tier,
      |         substring(md5('dsir|' || doc_id), 1, 12) AS u
      |  FROM documents)
      |SELECT doc_id, tier FROM t
      |WHERE u < CASE tier WHEN 'long' THEN 'e66666666666'
      |                    WHEN 'mid' THEN '800000000000'
      |                    ELSE '199999999999' END""".stripMargin

  // ---------------------------------------------------------------- q129
  /** Corpus mixture rebalancing — the data-mixing step of a training
    * pipeline: compute per-language acceptance probabilities that equalize
    * language shares (p_lang = min(1, (T/k) / n_lang): over-represented
    * languages are down-sampled toward the uniform cap, minority languages
    * kept whole), then draw deterministically. The uniform draw is the
    * Knuth multiplicative hash u = (doc_id · 2654435761) mod 2³², and the
    * acceptance test u < p·2³² is evaluated in EXACT integer arithmetic —
    * u·k·n_lang < T·2³² — so there is no float boundary for the two engines
    * to disagree on, and the sampled SET is engine-independent (the q59/q126
    * determinism contract, extended to data-dependent rates). Fits 64-bit
    * as long as u·k·n_lang < 2⁶³, i.e. per-language counts below ~2²⁶; past
    * that, drop u to 20 bits (same guarantee, coarser grid).
    *
    * Plan shape: two tiny aggregates (per-language counts, corpus totals)
    * broadcast back onto the fact scan; the acceptance filter is map-side;
    * one final partial-agg groupBy(lang). No wide join, no window. */
  private def q129(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "lang")
    val perLang = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val totals = docs.agg(count(lit(1)).as("t_total"),
      countDistinct(col("lang")).as("k_langs"))
    val sampled = docs
      .join(broadcast(perLang), "lang")
      .crossJoin(broadcast(totals))
      .withColumn("u", pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)))
      .filter(col("u") * col("k_langs") * col("n_docs") <
        col("t_total") * lit(4294967296L))
      .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
    perLang.join(sampled, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        // floor-spelled rounding — see wordEntropy (Retrieval.scala)
        (floor(coalesce(col("n_sampled"), lit(0L)).cast("double") / col("n_docs")
          * 10000 + 0.5) / 10000.0).as("sampled_frac"))
  }

  private val q129Sql =
    """WITH pl AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
      |t AS (SELECT count(*) AS t_total, count(DISTINCT lang) AS k_langs FROM documents),
      |acc AS (
      |  SELECT d.lang
      |  FROM documents d JOIN pl ON d.lang = pl.lang CROSS JOIN t
      |  WHERE ((d.doc_id * 2654435761) % 4294967296) * t.k_langs * pl.n_docs
      |        < t.t_total * 4294967296),
      |sm AS (SELECT lang, count(*) AS n_sampled FROM acc GROUP BY lang)
      |SELECT pl.lang, CAST(pl.n_docs AS BIGINT) AS n_docs,
      |       CAST(coalesce(sm.n_sampled, 0) AS BIGINT) AS n_sampled,
      |       floor(coalesce(sm.n_sampled, 0)::DOUBLE / pl.n_docs * 10000 + 0.5)
      |         / 10000.0 AS sampled_frac
      |FROM pl LEFT JOIN sm ON pl.lang = sm.lang""".stripMargin

  // ---------------------------------------------------------------- q131
  /** Per-source document cap — the "domain cap" curation op: no single
    * source may contribute more than CapN documents, and which documents
    * survive is a deterministic, engine-independent draw (md5 order, doc_id
    * tiebreak — the q126 hex-compare contract), not head-of-file bias or a
    * seeded RNG. Complements q129: that one equalizes SHARES
    * probabilistically, this one enforces a hard per-group COUNT.
    *
    * Plan shape: one window partitioned by source (hash-partitioned
    * shuffle, parallel across sources; a hot source bounds one partition —
    * at 100 TB cap-per-(source, shard-of-source) first, then re-cap, the
    * standard two-level refinement) and a map-side hash; no join, no
    * global window. */
  private val CapN = 10

  private def q131(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(col("u"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        md5(concat_ws("|", lit("cap"), col("doc_id"))).as("u"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= CapN)
      .select(col("source"), col("doc_id"), col("rk").cast("int").as("rk"))
  }

  private val q131Sql =
    """WITH u AS (
      |  SELECT doc_id, source, md5('cap|' || doc_id) AS u FROM documents),
      |rk AS (
      |  SELECT source, doc_id,
      |         CAST(row_number() OVER (PARTITION BY source ORDER BY u, doc_id)
      |              AS INT) AS rk
      |  FROM u)
      |SELECT source, doc_id, rk FROM rk WHERE rk <= 10""".stripMargin

  // ---------------------------------------------------------------- q61
  /** Map explode (§2B map family): parse `events.props` schema-on-read into
    * MapType, explode to (key, value) rows, aggregate per key — the generic
    * attribute-bag pattern for semi-structured payloads whose keys aren't
    * known at compile time. */
  private def q61(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      // explode_outer + null-key filter ≡ explode, but plain explode's
      // inferred constraints push below the generate and re-run the
      // expensive from_json 2 extra times per row (see Dedup.ngramJaccard)
      .select(explode_outer(from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.IntegerType))).as(Seq("key", "value")))
      .filter(col("key").isNotNull)
      .groupBy("key")
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("long")).as("sum_value"),
           min(col("value")).as("min_value"),
           max(col("value")).as("max_value"))

  private val q61Sql =
    """SELECT 'k' AS key, count(*) AS n,
      |  CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_value,
      |  CAST(min(CAST(props->>'$.k' AS INT)) AS INT) AS min_value,
      |  CAST(max(CAST(props->>'$.k' AS INT)) AS INT) AS max_value
      |FROM events WHERE props->>'$.k' IS NOT NULL""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q57_array_extra", q57, Some(q57Sql)),
    GraftQuery("q58_json_extra", q58, Some(q58Sql)),
    GraftQuery("q59_hash_split", q59, Some(q59Sql)),
    GraftQuery("q60_stratified_sample", q60,
      Some(graft.core.Goldens.load("q60_stratified_sample"))),
    GraftQuery("q61_map_explode", q61, Some(q61Sql)),
    GraftQuery("q126_importance_sample", q126, Some(q126Sql)),
    GraftQuery("q129_mixture_rebalance", q129, Some(q129Sql)),
    GraftQuery("q131_source_cap", q131, Some(q131Sql)),
  )
}
