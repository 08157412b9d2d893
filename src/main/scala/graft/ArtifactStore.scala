package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corpus-derived artifact persistence — the ModelStore pattern
  * generalized (round 10). A production pipeline does not re-derive
  * corpus-level artifacts (the BPE vocabulary, the dup-graph label
  * table) on every query that consumes them: it materializes each once
  * per corpus version and maintains it incrementally (the
  * dedup_incremental_near / sim_index_upsert discipline). This store
  * gives engine queries the same behavior between runs in one
  * environment:
  *
  *  - keys embed a FINGERPRINT of the source parquet (file sizes +
  *    mtimes — filesystem metadata only, no scan), so a regenerated
  *    corpus can never be served a stale artifact;
  *  - the completion marker is written LAST, so a crash mid-save never
  *    looks like a complete artifact;
  *  - `SPARK_GRAFT_NO_ARTIFACT_CACHE=1` disables loads entirely —the
  *    ablation gates set it so interpreted/codegen parity runs exercise
  *    the full derivation, not a parquet read.
  *
  * Artifacts must be DETERMINISTIC frames (partition-invariant,
  * tie-broken) — everything in this repo is, by the oracle doctrine —
  * so serving the reloaded artifact is bit-identical to the fresh
  * derivation (each consumer's spec pins it). */
object ArtifactStore {

  private[graft] def cacheDisabled: Boolean =
    sys.env.get("SPARK_GRAFT_NO_ARTIFACT_CACHE").contains("1")

  /** Fingerprint of one parquet file-or-directory under `dir`. */
  private[graft] def fingerprint(dir: String, table: String): String = {
    import java.nio.file.{Files, Path, Paths}
    val src = Paths.get(s"$dir/$table")
    def sigOf(p: Path): String =
      s"${p.getFileName}:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}"
    try {
      val sig =
        if (Files.isDirectory(src)) {
          val s = Files.list(src)
          try s.sorted().toArray.map(p => sigOf(p.asInstanceOf[Path]))
            .mkString("|")
          finally s.close()
        } else sigOf(src)
      java.security.MessageDigest.getInstance("MD5")
        .digest(sig.getBytes("UTF-8")).take(6)
        .map(b => f"$b%02x").mkString
    } catch { case _: java.io.IOException => "nofp" }
  }

  /** Store path for artifact `kind` derived from `dir/table` at
    * parameterization `variant`. */
  def pathFor(kind: String, dir: String, table: String,
      variant: String): String =
    s"target/tmp/artifact_store/${kind}_" +
      s"${dir.replaceAll("[^a-zA-Z0-9]", "_")}_${variant}_" +
      fingerprint(dir, table)

  def save(df: DataFrame, path: String): Unit = {
    df.write.mode("overwrite").parquet(s"$path/data")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_GRAFT_OK"), Array.emptyByteArray)
  }

  def load(spark: SparkSession, path: String): Option[DataFrame] =
    if (cacheDisabled || !java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$path/_GRAFT_OK"))) None
    else Some(spark.read.parquet(s"$path/data"))

  /** Load-or-derive: serve the persisted artifact when present, else
    * derive, save, and serve the RELOADED copy — the first and every
    * later run read the same physical parquet. With the cache disabled
    * the fresh derivation is returned directly. */
  def cached(spark: SparkSession, path: String)
      (derive: => DataFrame): DataFrame =
    load(spark, path).getOrElse {
      val df = derive
      if (cacheDisabled) df
      else { save(df, path); load(spark, path).get }
    }
}
