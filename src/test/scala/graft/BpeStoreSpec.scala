package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persistence contract of the BPE vocabulary store: train → save →
  * load → re-tokenize is BIT-IDENTICAL to tokenizing off the fresh
  * in-memory training state, the merge table round-trips row-for-row,
  * and an incomplete save (no completion marker) is never trusted. */
class BpeStoreSpec extends AnyFunSuite {
  import TestSpark._

  private def sennrichDocs = {
    import spark.implicits._
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    Seq((1L, text), (2L, "low lower newest")).toDF("doc_id", "text")
  }

  test("save -> load -> re-tokenize is bit-identical to the fresh " +
    "training state; merge table round-trips; second access loads " +
    "without retraining") {
    val P = operators.PipelineOps
    val store = "target/tmp/test_bpe_store/roundtrip"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
    val docs = sennrichDocs

    // fresh in-memory state (the spec path)
    val freshTok = P.bpeTokenizeOn(docs, 4).collect().toSeq
    val freshMerges = P.bpeTrainOn(docs, 4).collect().toSeq

    // first access trains AND serves the reloaded artifact
    assert(P.bpeLoadState(spark, store).isEmpty)
    val (m1, v1) = P.bpeTrainedState(docs, 4, store)
    assert(P.bpeLoadState(spark, store).isDefined, "store not written")
    val storedTok = P.bpeTokenizeWith(docs, v1).collect().toSeq
    assert(storedTok == freshTok, "loaded vocab tokenizes differently")
    assert(m1.orderBy(col("merge_rank")).collect().toSeq == freshMerges,
      "merge table did not round-trip")

    // second access must serve the SAME artifact purely from disk:
    // poison-pill check — retraining on a different frame would differ,
    // loading ignores the frame entirely
    val (m2, v2) = P.bpeTrainedState(
      sennrichDocs.limit(1), 4, store) // different docs, same store
    assert(m2.orderBy(col("merge_rank")).collect().toSeq == freshMerges,
      "second access retrained instead of loading")
    assert(P.bpeTokenizeWith(docs, v2).collect().toSeq == freshTok)

    // an incomplete artifact (marker missing) is never trusted
    val broken = "target/tmp/test_bpe_store/broken"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(broken))
    m1.write.mode("overwrite").parquet(s"$broken/merges")
    assert(P.bpeLoadState(spark, broken).isEmpty,
      "incomplete save (no marker) was trusted")
  }

  test("store path embeds a corpus fingerprint: same dir+k is stable, " +
    "a regenerated (touched) corpus changes the key") {
    val P = operators.PipelineOps
    val dir = java.nio.file.Files
      .createTempDirectory("bpe_fp_test").toString
    val f = java.nio.file.Paths.get(s"$dir/documents.parquet")
    java.nio.file.Files.write(f, "x".getBytes)
    val p1 = P.bpeStorePath(dir, 4)
    assert(p1 == P.bpeStorePath(dir, 4), "fingerprint unstable")
    assert(p1 != P.bpeStorePath(dir, 5), "merge budget not in the key")
    java.nio.file.Files.write(f, "xy".getBytes) // regenerated corpus
    assert(P.bpeStorePath(dir, 4) != p1,
      "regenerated corpus mapped to the stale artifact")
  }
}
