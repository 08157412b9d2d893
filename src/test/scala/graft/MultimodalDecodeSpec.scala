package graft

import org.scalatest.funsuite.AnyFunSuite

/** Phase-2 honesty probe for the multimodal decode seam: a tiny REAL
  * decoder (PNG IHDR header parse, pure JVM, no codec dependency)
  * swaps in behind the stubDecode seam via decodeFrameWith without
  * touching any caller — the identical pipeline runs under both
  * decoders, proving the "replace the body, keep the plumbing" claim
  * the stub's scaladoc makes. */
class MultimodalDecodeSpec extends AnyFunSuite {
  import TestSpark._

  /** A byte-for-byte valid PNG prefix: signature + IHDR chunk
    * (length, type, 13-byte payload, real CRC32). */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte))
    val payload = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    bos.write(java.nio.ByteBuffer.allocate(4).putInt(13).array())
    val typeAndData = "IHDR".getBytes("US-ASCII") ++ payload
    bos.write(typeAndData)
    val crc = new java.util.zip.CRC32()
    crc.update(typeAndData)
    bos.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt)
      .array())
    bos.toByteArray
  }

  test("pngHeaderDecode parses real IHDR dimensions, falls back to the " +
    "stub on non-PNG bytes, and drops into the decode pipeline without " +
    "touching callers") {
    import spark.implicits._
    val M = operators.MultimodalQueries
    val png = pngBytes(640, 480)
    val notPng = Array.tabulate(100)(i => (i * 7).toByte)
    val corrupt = png.clone(); corrupt(0) = 0x00 // broken signature

    // direct: real parse vs stub fallback
    val meta = M.pngHeaderDecode(7L, png)
    assert((meta.width, meta.height, meta.format, meta.n_frames) ==
      ((640, 480, "png", 1)), s"IHDR parse: $meta")
    assert(M.pngHeaderDecode(7L, notPng) == M.stubDecode(7L, notPng))
    assert(M.pngHeaderDecode(7L, corrupt) == M.stubDecode(7L, corrupt))

    // the IDENTICAL pipeline under both decoders — only the decoder
    // body differs, no caller changed
    val media = Seq((1L, png), (2L, notPng)).toDF("doc_id", "data")
    val underStub = M.decodeFrameWith(media, M.stubDecode)
      .collect().map(m => m.doc_id -> m).toMap
    val underPng = M.decodeFrameWith(media, M.pngHeaderDecode)
      .collect().map(m => m.doc_id -> m).toMap
    assert((underPng(1L).width, underPng(1L).height) == ((640, 480)))
    assert(underPng(2L) == underStub(2L),
      "non-PNG rows must decode identically under both decoders")
    assert(underStub(1L).width == M.stubDecode(1L, png).width)

    // decodeAll (the registered caller) still runs the stub, unchanged
    val ds = M.decodeAll(spark, sf)
    assert(ds.count() == Tables.documents(spark, sf).count())
  }
}
