package graft.hl7

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed patient demographics projected from PID segments. */
case class Patient(
    message_id: String,
    patient_id: String,
    family_name: String,
    given_name: String,
    birth_date: String,
    sex: String)

/** Typed views over the canonical parse (SURVEY.md §1.3 step 2): ordinary
  * select/explode projections from the generic segments array into
  * segment-specific shapes — no second parse, no schema registry. These are
  * what an analyst of the reference's lake would actually query: patients,
  * observations, diagnoses.
  */
object Views {

  /** One row per occurrence of `segId`, fields map exposed. */
  def segment(staged: DataFrame, segId: String): DataFrame =
    staged.filter(col("error").isNull)
      .select(col("message_id"), col("version"), explode(col("segments")).as("seg"))
      .filter(col("seg.segment_id") === segId)
      .select(col("message_id"), col("version"),
              col("seg.seq").as("seq"), col("seg.fields").as("fields"))

  private def f(field: String): org.apache.spark.sql.Column =
    element_at(col("fields")(field), 1)

  /** PID → typed Dataset[Patient]. */
  def patients(staged: DataFrame): Dataset[Patient] = {
    import staged.sparkSession.implicits._
    segment(staged, "PID").select(
      col("message_id"),
      coalesce(f("PID-3-1"), f("PID-3"), lit("")).as("patient_id"),
      coalesce(f("PID-5-1"), f("PID-5"), lit("")).as("family_name"),
      coalesce(f("PID-5-2"), lit("")).as("given_name"),
      coalesce(f("PID-7"), lit("")).as("birth_date"),
      coalesce(f("PID-8"), lit("")).as("sex")
    ).as[Patient]
  }

  /** OBX → observations: set id, value type, coded observation, value, units. */
  def observations(staged: DataFrame): DataFrame =
    segment(staged, "OBX").select(
      col("message_id"),
      f("OBX-1").cast("int").as("set_id"),
      f("OBX-2").as("value_type"),
      coalesce(f("OBX-3-1"), f("OBX-3")).as("code"),
      f("OBX-3-2").as("label"),
      f("OBX-5").as("value"),
      coalesce(f("OBX-6-1"), f("OBX-6")).as("units"))

  /** DG1 → diagnoses. */
  def diagnoses(staged: DataFrame): DataFrame =
    segment(staged, "DG1").select(
      col("message_id"),
      coalesce(f("DG1-3-1"), f("DG1-3")).as("code"),
      f("DG1-3-2").as("description"),
      f("DG1-6").as("diagnosis_type"))

  // ------------------------------------------------------------------
  /** OBX value-type profile over the corpus (ST/NM/CE/TS/TX/FT…) — the
    * "what kinds of observations flow through this lake" question. */
  def q21ObxTypes(s: SparkSession, d: String): DataFrame =
    observations(Pipeline.corpusCached(s)._2)
      .groupBy("value_type")
      .agg(count(lit(1)).as("n_obs"),
           countDistinct(col("code")).as("n_codes"))

  /** Typed patient roster (one row per PID across the corpus). */
  def q21Patients(s: SparkSession, d: String): DataFrame =
    patients(Pipeline.corpusCached(s)._2).toDF()

  /** Map-function family over the canonical `fields` map (§2B Map row):
    * map_keys, map_values (+ aggregate over them), map_filter, map_concat.
    * PID's n_values > n_keys exposes the repetition arrays. Oracle: golden
    * VALUES constants (SparkEntry.pipelineOracles). */
  def q54MapFuncs(s: SparkSession, d: String): DataFrame =
    Pipeline.corpusCached(s)._2
      .filter(col("error").isNull)
      .select(explode(col("segments")).as("seg"))
      .select(col("seg.segment_id").as("segment_id"), col("seg.fields").as("fields"))
      .groupBy("segment_id")
      .agg(
        sum(size(map_keys(col("fields")))).as("n_keys"),
        sum(aggregate(map_values(col("fields")), lit(0), (acc, x) => acc + size(x)))
          .as("n_values"),
        sum(size(map_filter(col("fields"), (k, _) => k.endsWith("-1"))))
          .as("n_first_elems"),
        sum(size(map_concat(col("fields"), map(lit("__seg"), array(col("segment_id"))))))
          .as("n_keys_plus"))

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q21_obx_value_types" -> q21ObxTypes _,
    "q21_patient_roster" -> q21Patients _,
    "q54_map_funcs" -> q54MapFuncs _)
}
