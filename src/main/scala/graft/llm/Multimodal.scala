package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.GraftQuery

/** One media item: opaque binary payload + typed metadata — the multimodal
  * column pattern (image/audio/video as `binary` with a metadata struct). */
case class MediaRow(
    media_id: Long,
    kind: String,
    payload: Array[Byte],
    width: Int,
    height: Int)

/** Stub-decoded features. The decode itself is a deterministic fake (no
  * image/audio codecs in this environment — see builder brief); the Spark
  * plumbing (binary column, typed Dataset, partition-batched extraction,
  * schema) is real and tested. */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    n_frames: Int,
    checksum: Long)

/** Multimodal-column operators: binary payloads with typed metadata, and a
  * partition-batched feature-extraction stage.
  *
  * `extractFeatures` is `mapPartitions` over a typed Dataset — the Scala
  * analog of `mapInPandas` batch plumbing: one decoder instantiation per
  * partition (where a real codec would be loaded once per task), rows
  * streamed through it. Narrow transformation — at 100 TB this is pure
  * map-side work that scales with partition count.
  */
object Multimodal {

  /** Derive a deterministic media table from `documents`: payload = UTF-8
    * bytes of the text (stands in for real image/audio bytes), kind cycles
    * image/audio/video, metadata derived from doc_id. */
  def media(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
                 (col("doc_id") % 3).cast("int") + 1).as("kind"),
      col("text").cast("binary").as("payload"),
      (col("doc_id") % 640).cast("int").as("width"),
      (col("doc_id") % 480).cast("int").as("height"))

  /** Raw-file multimodal ingest — Spark's native `binaryFile` source: one
    * row per file with (path, modificationTime, length, content: binary).
    * This is how real image/audio corpora enter the lake (the reference's
    * A1 front door, for opaque payloads); downstream the content column is
    * exactly the `payload` the feature extractors consume. The source
    * supports predicate pushdown on the metadata columns (e.g. a `length`
    * filter prunes without reading file bodies). */
  def readBinaryDir(s: SparkSession, dir: String, glob: String = "*"): DataFrame =
    s.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  /** STUB decode: byte length, fake frame count (1 frame per 100 bytes), and
    * a rolling byte checksum. A real deployment swaps `decode` for an actual
    * codec call; everything around it (batching, schema, partitioning) stays. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec handle, model, …)
      rows.map { m =>
        val decoded = decode(m.payload)
        MediaFeatures(m.media_id, m.kind, m.payload.length,
          m.payload.length / 100 + 1, decoded)
      }
    }
  }

  /** STUB resize: a real implementation decodes, scales to target
    * dimensions, re-encodes. The stub deterministically truncates/extends
    * the payload proportional to the pixel-count change so downstream size
    * accounting behaves like a real resize; metadata is updated for real. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val srcPixels = math.max(1, m.width * m.height)
        val scale = (w.toLong * h).toDouble / srcPixels
        val newLen = math.max(1, math.min((m.payload.length * scale).toInt, 1 << 20))
        m.copy(payload = java.util.Arrays.copyOf(m.payload, newLen),
               width = w, height = h)
      }
    }
  }

  /** STUB frame sampling for video-kind rows: emit every `stride`-th
    * 100-byte "frame" of the payload as its own row (media_id, frame_idx,
    * frame bytes) — the explode shape a real video pipeline needs, with the
    * codec swapped for deterministic slicing. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val frames = m.payload.grouped(100).toSeq
      frames.indices.collect {
        case i if i % stride == 0 => (m.media_id, i, frames(i))
      }
    }.toDF("media_id", "frame_idx", "frame")
  }

  /** Deterministic fake decoder (polynomial byte hash). */
  private def decode(payload: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xff); i += 1 }
    h
  }

  /** Q42 — feature-extraction profile per kind. Byte/frame columns are
    * oracle-checked (payload length is observable to DuckDB via
    * `encode(text)`); the checksum exercises the stub decoder end-to-end and
    * is verified in MultimodalSpec. */
  def featureProfile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val feats = extractFeatures(media(s, d).as[MediaRow])
    feats.groupBy("kind")
      .agg(count(lit(1)).as("n_items"),
           round(avg(col("n_bytes")), 4).as("avg_bytes"),
           sum(col("n_frames")).as("total_frames"))
  }

  val featureProfileSql: String =
    """SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |  count(*) AS n_items,
      |  round(avg(octet_length(encode(text))), 4) AS avg_bytes,
      |  CAST(sum(octet_length(encode(text)) // 100 + 1) AS BIGINT) AS total_frames
      |FROM documents GROUP BY 1""".stripMargin

  /** q119 — frame-sampling profile: every 3rd 100-byte "frame" of each
    * video payload (stub codec, real explode shape — see sampleFrames).
    * The sampled-frame count per video is ⌈⌈bytes/100⌉/3⌉, which DuckDB
    * can state from the text length — so the stub pipeline is
    * oracle-checked end-to-end, not just spec'd. */
  def frameSampleProfile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = media(s, d)
    val frames = sampleFrames(m.as[MediaRow], 3)
    // count videos from the MEDIA table, not the frame output: a zero-byte
    // payload emits no frames and would otherwise vanish from n_videos
    // while the oracle (which counts documents) still sees it
    val vids = m.filter(col("kind") === "video").select("media_id")
    vids.join(frames.groupBy("media_id").agg(count(lit(1)).as("n_sampled")),
        Seq("media_id"), "left")
      .agg(count(lit(1)).as("n_videos"),
        sum(coalesce(col("n_sampled"), lit(0L))).as("total_sampled"),
        max(coalesce(col("n_sampled"), lit(0L))).as("max_sampled"))
  }

  val frameSampleProfileSql: String =
    """SELECT count(*) AS n_videos,
      |  CAST(sum(ceil(ceil(octet_length(encode(text)) / 100.0) / 3.0)) AS BIGINT)
      |    AS total_sampled,
      |  CAST(max(ceil(ceil(octet_length(encode(text)) / 100.0) / 3.0)) AS BIGINT)
      |    AS max_sampled
      |FROM documents WHERE doc_id % 3 = 2""".stripMargin

  /** q120 — resize accounting: run the (stub) 320×240 resize over the
    * media table and profile the payload-size change per kind. The stub's
    * length arithmetic (len·(320·240)/max(1, w·h), clamped to [1, 1 MiB],
    * truncated) is restated exactly in the oracle from the documents
    * columns, so the typed mapPartitions path is hash-checked end-to-end. */
  def resizeProfile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    resize(media(s, d).as[MediaRow], 320, 240)
      .groupBy("kind")
      .agg(count(lit(1)).as("n_items"),
        sum(length(col("payload"))).as("total_bytes"),
        max(length(col("payload"))).cast("long").as("max_bytes"))
  }

  val resizeProfileSql: String =
    """WITH m AS (
      |  SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |              ELSE 'video' END AS kind,
      |         GREATEST(1, LEAST(CAST(trunc(octet_length(encode(text)) *
      |             (76800.0 / GREATEST(1, (doc_id % 640) * (doc_id % 480)))) AS BIGINT),
      |           1048576)) AS n_bytes
      |  FROM documents)
      |SELECT kind, count(*) AS n_items,
      |       CAST(sum(n_bytes) AS BIGINT) AS total_bytes, max(n_bytes) AS max_bytes
      |FROM m GROUP BY kind""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q42_multimodal_features", featureProfile _, Some(featureProfileSql)),
    GraftQuery("q119_frame_sample", frameSampleProfile _, Some(frameSampleProfileSql)),
    GraftQuery("q120_resize_profile", resizeProfile _, Some(resizeProfileSql)))
}
