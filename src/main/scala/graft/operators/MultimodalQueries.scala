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

  /** `mm_resize_plan`: aspect-preserving resize planning to a 224×224
    * letterbox — scale factor, scaled dims, and pad offsets per image.
    * This is the metadata half of a real resize stage (the pixel
    * resample itself lives behind the stubbed codec); at 100 TB the
    * plan is computed in the scan stage so the shuffle-free decode →
    * resize pipeline stays one codegen span. Double arithmetic is the
    * same op sequence in the oracle — bit-identical. */
  val mmResizePlan: Q = (spark, dir) => {
    val target = lit(224.0)
    mmDecodeMeta(spark, dir)
      .select(col("doc_id"), col("width"), col("height"))
      .withColumn("scale", Tables.round6(
        least(target / col("width"), target / col("height"))))
      .withColumn("out_w",
        floor(col("width") * least(target / col("width"),
          target / col("height"))).cast("int"))
      .withColumn("out_h",
        floor(col("height") * least(target / col("width"),
          target / col("height"))).cast("int"))
      .withColumn("pad_x", ((lit(224) - col("out_w")) / 2).cast("int"))
      .withColumn("pad_y", ((lit(224) - col("out_h")) / 2).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** `mm_patch_grid`: ViT-style feature-extraction bookkeeping — the
    * 16×16 patch grid per image and the resulting sequence length
    * (+1 class token), aggregated to per-format training-token totals.
    * The corpus-level roll-up is the number a data pipeline actually
    * schedules on (total visual tokens ≈ compute budget). */
  val mmPatchGrid: Q = (spark, dir) =>
    mmDecodeMeta(spark, dir)
      .select(col("doc_id"), col("width"), col("height"), col("n_frames"),
        when(col("doc_id") % 3 === 0, "jpeg")
          .when(col("doc_id") % 3 === 1, "png").otherwise("webm")
          .as("format"))
      .withColumn("patches_x", ceil(col("width") / lit(16.0)).cast("int"))
      .withColumn("patches_y", ceil(col("height") / lit(16.0)).cast("int"))
      .withColumn("seq_len",
        (col("patches_x") * col("patches_y") + lit(1)).cast("int"))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("seq_len").cast("long") * col("n_frames")).cast("long")
          .as("total_visual_tokens"),
        max(col("seq_len")).as("max_seq_len"))
      .orderBy(col("format"))

  /** `mm_dedup_phash`: perceptual-hash near-dup detection over the
    * media table — the image-pipeline sibling of dedup_simhash. A real
    * pHash thresholds DCT coefficients of the decoded pixels into a
    * 64-bit fingerprint whose hamming distance tracks visual
    * similarity; with decode stubbed (no codecs here), the fingerprint
    * is a simhash over the blob's stride-4 character trigrams — the
    * same feature→majority-vote→bit construction, content-derived and
    * locality-sensitive (measured at sf0.01: 18 of 1.1M pairs land at
    * hamming ≤ 3), and oracle-replayable. Swapping in a real
    * pixel-domain hash touches neither the blocking nor the verify
    * stage. Pigeonhole blocking: 4 × 15-bit chunks (hamming ≤ 3 ⇒ at
    * least one chunk equal), so candidates come from an EQUI-join on
    * (chunk_idx, chunk_val) and exact hamming runs on candidates only.
    * Blobs never shuffle — only (doc_id, 8-byte fingerprint) moves,
    * and the trigram explosion collapses inside the per-doc vote
    * aggregate (map-side partial). */
  val mmDedupPhash: Q = (spark, dir) => {
    val tri = Tables.documents(spark, dir)
      .where(length(col("text")) >= 3) // no trigram fingerprint below 3 chars
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - 2, lit(4))).as("i"))
      .select(col("doc_id"),
        conv(substring(md5(expr("cast(substring(text, i, 3) as binary)")),
          1, 15), 16, 10).cast("long").as("h"))
    val bitVotes = (0 until 60).map { j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L))).as(s"v_$j")
    }
    val votes = tri.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tg"), bitVotes: _*)
    val phash = (0 until 60).map { j =>
      when(col(s"v_$j") * 2 > col("n_tg"), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val ph = votes.select(col("doc_id"), phash.as("phash"))
    val chunks = ph.select(col("doc_id"), col("phash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("phash"), c * 15).bitwiseAND(lit(0x7FFFL))): _*))
        .as(Seq("chunk_idx", "chunk_val")))
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def queries: Map[String, Q] = Map(
    "mm_decode_meta"   -> mmDecodeMeta,
    "mm_frame_explode" -> mmFrameExplode,
    "mm_resize_plan"   -> mmResizePlan,
    "mm_patch_grid"    -> mmPatchGrid,
    "mm_dedup_phash"   -> mmDedupPhash,
  )

  def oracles: Map[String, String] = Map(
    "mm_dedup_phash" ->
      """WITH pos AS (
        |  SELECT doc_id, text,
        |    unnest(range(1, length(text) - 1, 4)) AS i
        |  FROM documents WHERE length(text) >= 3),
        |tg AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(substr(text, CAST(i AS INT), 3)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM pos),
        |bits AS (SELECT unnest(range(0, 60)) AS j),
        |v AS (
        |  SELECT doc_id, j, SUM((h >> CAST(j AS INT)) & 1) AS vote
        |  FROM tg CROSS JOIN bits GROUP BY 1, 2),
        |n AS (SELECT doc_id, count(*) AS n_tg FROM tg GROUP BY 1),
        |ph AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN vote * 2 > n_tg
        |      THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END)
        |      AS BIGINT) AS phash
        |  FROM v JOIN n USING (doc_id) GROUP BY 1),
        |ch AS (
        |  SELECT doc_id, phash, c,
        |    (phash >> CAST(c * 15 AS INT)) & 32767 AS val
        |  FROM ph CROSS JOIN (SELECT unnest(range(0, 4)) AS c) t),
        |p AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    bit_count(xor(a.phash, b.phash)) AS hamming
        |  FROM ch a JOIN ch b
        |    ON a.c = b.c AND a.val = b.val AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, hamming FROM p
        |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,
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
    "mm_resize_plan" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(64 + n_bytes % 193 AS INT) AS width,
        |    CAST(64 + (n_bytes * 7) % 129 AS INT) AS height
        |  FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes
        |        FROM documents) t),
        |s AS (
        |  SELECT doc_id, width, height,
        |    least(224.0 / width, 224.0 / height) AS sc
        |  FROM d)
        |SELECT doc_id, width, height,
        |  floor(sc * 1000000.0 + 0.5) / 1000000.0 AS scale,
        |  CAST(floor(width * sc) AS INT) AS out_w,
        |  CAST(floor(height * sc) AS INT) AS out_h,
        |  CAST(floor((224 - CAST(floor(width * sc) AS INT)) / 2) AS INT) AS pad_x,
        |  CAST(floor((224 - CAST(floor(height * sc) AS INT)) / 2) AS INT) AS pad_y
        |FROM s ORDER BY doc_id""".stripMargin,
    "mm_patch_grid" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(64 + n_bytes % 193 AS INT) AS width,
        |    CAST(64 + (n_bytes * 7) % 129 AS INT) AS height,
        |    CAST(1 + doc_id % 24 AS INT) AS n_frames,
        |    CASE WHEN doc_id % 3 = 0 THEN 'jpeg'
        |         WHEN doc_id % 3 = 1 THEN 'png' ELSE 'webm' END AS format
        |  FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes
        |        FROM documents) t),
        |p AS (
        |  SELECT format, n_frames,
        |    CAST(ceil(width / 16.0) AS INT) * CAST(ceil(height / 16.0) AS INT)
        |      + 1 AS seq_len
        |  FROM d)
        |SELECT format, count(*) AS n_media,
        |  CAST(SUM(CAST(seq_len AS BIGINT) * n_frames) AS BIGINT)
        |    AS total_visual_tokens,
        |  max(seq_len) AS max_seq_len
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
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
