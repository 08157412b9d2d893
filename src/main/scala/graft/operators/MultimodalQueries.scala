package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** North-star multimodal columns (BASELINE.json): media as opaque
  * `binary` columns + typed metadata, with decode / feature-extract /
  * frame-sample stages.
  *
  * The decode step is STUBBED (no image/audio codecs in this
  * environment — see [[MultimodalQueries.stubDecode]]): it produces
  * deterministic fake dimensions from the byte stream. Everything
  * around it — the binary column plumbing, the typed metadata schema,
  * the partition-wise batch processing shape, frame-sampling arithmetic
  * — is real and tested. Swapping the stub for a JNI/codec call changes
  * no plan shape.
  *
  * Scale: media blobs never pass through a shuffle here — metadata is
  * derived in the scan stage and only (id, meta) tuples move. At 100 TB
  * that's the difference between shuffling kilobyte rows and petabyte
  * blobs.
  */
object MultimodalQueries {

  /** Typed metadata extracted from a media blob. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
      n_frames: Int, format: String)

  /** STUB decode ??? — deterministic fake: real codecs are absent in
    * this container (prompt contract). Derives plausible dimensions
    * from byte length + id; replace the body with an actual decoder
    * (e.g. javax.imageio / ffmpeg JNI) without touching any caller. */
  def stubDecode(docId: Long, data: Array[Byte]): MediaMeta = {
    val n = data.length.toLong
    MediaMeta(
      doc_id  = docId,
      n_bytes = n,
      width   = (64 + n % 193).toInt,
      height  = (64 + (n * 7) % 129).toInt,
      n_frames = (1 + docId % 24).toInt,
      format  = if (docId % 3 == 0) "jpeg" else if (docId % 3 == 1) "png" else "webm")
  }

  /** The media table: documents' text re-encoded as opaque binary blobs
    * (stand-in for image/audio bytes) + pass-through metadata. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("data"),
        col("source"), col("lang"))

  /** Partition-wise decode — the `mapPartitions` shape a real codec
    * needs (per-partition library init, batched I/O), typed end to end. */
  def decodeAll(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { case (id, bytes) => stubDecode(id, bytes) }
      }
  }

  /** `mm_decode_meta`: decode metadata + frame sampling, expressed in
    * pure column arithmetic (mirrors [[stubDecode]]) so the oracle can
    * replay it — every-⌈n/8⌉th frame is sampled, aspect ratio rounded
    * stably. */
  val mmDecodeMeta: Q = (spark, dir) =>
    mediaTable(spark, dir)
      .select(col("doc_id"), octet_length(col("data")).as("n_bytes"))
      .withColumn("width", (lit(64) + col("n_bytes") % 193).cast("int"))
      .withColumn("height", (lit(64) + (col("n_bytes") * 7) % 129).cast("int"))
      .withColumn("n_frames", (lit(1) + col("doc_id") % 24).cast("int"))
      .withColumn("frame_step",
        greatest(lit(1), floor(col("n_frames") / lit(8)).cast("int")))
      .withColumn("n_sampled",
        (floor((col("n_frames") - 1) / col("frame_step")).cast("int") + 1))
      .withColumn("aspect",
        Tables.round6(col("width").cast("double") / col("height")))
      .orderBy(col("doc_id"))

  /** `mm_frame_explode`: frame-sampling fan-out — one row per sampled
    * frame (the videoframe → image pipeline step), with a per-frame
    * deterministic content fingerprint. */
  val mmFrameExplode: Q = (spark, dir) =>
    mmDecodeMeta(spark, dir)
      .select(col("doc_id"), col("n_frames"), col("frame_step"),
        explode(sequence(lit(0), col("n_frames") - 1, col("frame_step")))
          .as("frame_idx"))
      .withColumn("frame_key",
        concat(col("doc_id").cast("string"), lit("#"),
          col("frame_idx").cast("string")))
      .select("doc_id", "frame_idx", "frame_key")
      .orderBy(col("doc_id"), col("frame_idx"))

  def queries: Map[String, Q] = Map(
    "mm_decode_meta"   -> mmDecodeMeta,
    "mm_frame_explode" -> mmFrameExplode,
  )

  def oracles: Map[String, String] = Map(
    "mm_decode_meta" ->
      """SELECT doc_id, n_bytes,
        |  CAST(64 + n_bytes % 193 AS INT) AS width,
        |  CAST(64 + (n_bytes * 7) % 129 AS INT) AS height,
        |  CAST(1 + doc_id % 24 AS INT) AS n_frames,
        |  greatest(1, CAST(floor((1 + doc_id % 24) / 8) AS INT)) AS frame_step,
        |  CAST(floor(((1 + doc_id % 24) - 1)
        |       / greatest(1, CAST(floor((1 + doc_id % 24) / 8) AS INT))) AS INT) + 1 AS n_sampled,
        |  floor((CAST(64 + n_bytes % 193 AS INT) * 1.0
        |         / CAST(64 + (n_bytes * 7) % 129 AS INT)) * 1000000.0 + 0.5)
        |    / 1000000.0 AS aspect
        |FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes
        |      FROM documents) t
        |ORDER BY doc_id""".stripMargin,
    "mm_frame_explode" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(1 + doc_id % 24 AS INT) AS n_frames,
        |    greatest(1, CAST(floor((1 + doc_id % 24) / 8) AS INT)) AS frame_step
        |  FROM documents)
        |SELECT doc_id, unnest(range(0, n_frames, frame_step)) AS frame_idx,
        |  CAST(doc_id AS VARCHAR) || '#' ||
        |    CAST(unnest(range(0, n_frames, frame_step)) AS VARCHAR) AS frame_key
        |FROM m ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
