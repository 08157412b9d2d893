package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the generalized corpus-artifact store and its
  * dedup_components consumer: load-or-derive serves the reloaded
  * artifact bit-identically, never re-derives once saved, and rejects
  * incomplete saves. */
class ArtifactStoreSpec extends AnyFunSuite {
  import TestSpark._

  test("cached(): derives once, serves the reloaded parquet afterwards " +
    "(poison-pill derive), rejects marker-less artifacts") {
    import spark.implicits._
    val path = "target/tmp/test_artifact_store/cc"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val df = Seq((1L, 10L), (2L, 10L), (3L, 3L)).toDF("doc_id", "component_id")
    var derives = 0
    def derive() = { derives += 1; df }
    val first = ArtifactStore.cached(spark, path)(derive())
      .orderBy(col("doc_id")).collect().toSeq
    assert(derives == 1)
    val second = ArtifactStore.cached(spark, path) {
      fail("second access must load, not re-derive"); df
    }.orderBy(col("doc_id")).collect().toSeq
    assert(second == first, "reloaded artifact differs from the fresh frame")

    val broken = "target/tmp/test_artifact_store/broken"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(broken))
    df.write.mode("overwrite").parquet(s"$broken/data")
    assert(ArtifactStore.load(spark, broken).isEmpty,
      "incomplete save (no marker) was trusted")
  }

  test("minhash band-posting store: loaded postings == fresh derivation " +
    "row-for-row, and both lsh + incremental_near consumers produce " +
    "identical results off the stored index") {
    val D = operators.DedupQueries
    val store = ArtifactStore.pathFor(
      "minhash_bands", sf, "documents.parquet", "h64b16")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
    val docs = Tables.documents(spark, sf)
    val fresh = D.minhashBandsOn(docs)
      .orderBy(col("doc_id"), col("band")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    val stored = D.minhashBands(spark, sf) // derives + saves
      .orderBy(col("doc_id"), col("band")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(stored == fresh, "stored band postings diverged")
    assert(new java.io.File(s"$store/_GRAFT_OK").exists)
    val viaStore = D.dedupMinhashLsh(spark, sf).collect() // pure load now
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaFresh = D.minhashLshOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaStore == viaFresh, "lsh pairs differ through the store")
    val nearStore = D.dedupIncrementalNear(spark, sf).collect().length
    val nearFresh = D.incrementalNearOn(docs).collect().length
    assert(nearStore == nearFresh)
  }

  test("dedup_components through the store: fresh derivation == loaded " +
    "artifact row-for-row; consumers (keep_best) read the same labels") {
    val store = ArtifactStore.pathFor(
      "components", sf, "documents.parquet", "ngram")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
    def run() = operators.DedupQueries.dedupComponents(spark, sf)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val fresh = run()   // derives + saves + serves reloaded
    assert(new java.io.File(s"$store/_GRAFT_OK").exists, "store not written")
    val loaded = run()  // pure load
    assert(loaded == fresh, "loaded component labels diverged")
    assert(fresh.forall { case (d, c) => c <= d },
      "min-label property violated through the store")
  }
}
