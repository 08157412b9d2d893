package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corpus-derived artifact persistence — the ModelStore pattern
  * generalized (round 10), with an APPEND path (round 11). A production
  * pipeline does not re-derive corpus-level artifacts (the BPE
  * vocabulary, the dup-graph label table, the LSH band-posting index)
  * on every query that consumes them: it materializes each once per
  * corpus version and maintains it incrementally — an ingest batch is
  * signed ALONE and its rows appended as a delta, never a whole-corpus
  * re-derivation (the dedup_incremental_near / sim_index_upsert
  * discipline). This store gives engine queries the same behavior
  * between runs in one environment:
  *
  *  - keys embed a FINGERPRINT of the source parquet (file sizes +
  *    mtimes — filesystem metadata only, no scan), so a regenerated
  *    corpus can never be served a stale artifact; a source that cannot
  *    be fingerprinted (missing/renamed parquet) makes the key
  *    UNCACHEABLE — it is never saved and never served, instead of
  *    sharing a sentinel key with every other broken probe;
  *  - the completion marker is written LAST, so a crash mid-save never
  *    looks like a complete artifact;
  *  - [[appendedCached]] chains versions: the child artifact stores
  *    ONLY the ingest batch's derived rows plus a lineage pointer to
  *    its parent; readers resolve parent ∪ delta. Staleness stays
  *    detectable without re-deriving because the child's path inherits
  *    the parent's corpus fingerprint (regenerated corpus ⇒ new
  *    fingerprint ⇒ neither parent nor child resolves);
  *  - saving an artifact PRUNES stale siblings — same kind/source/
  *    variant, different fingerprint — so a long-lived environment does
  *    not hoard artifacts of corpora that no longer exist;
  *  - `SPARK_GRAFT_NO_ARTIFACT_CACHE=1` disables loads entirely — the
  *    ablation gates set it so interpreted/codegen parity runs exercise
  *    the full derivation, not a parquet read.
  *
  * Artifacts must be DETERMINISTIC frames (partition-invariant,
  * tie-broken) — everything in this repo is, by the oracle doctrine —
  * so serving the reloaded artifact is bit-identical to the fresh
  * derivation (each consumer's spec pins it; for the append path,
  * ArtifactStoreSpec pins `append(store(base), batch) ≡
  * derive(base ∪ batch)` row-for-row). */
object ArtifactStore {

  private[graft] def cacheDisabled: Boolean =
    sys.env.get("SPARK_GRAFT_NO_ARTIFACT_CACHE").contains("1")

  /** Key segment marking a source that could not be fingerprinted —
    * paths carrying it are never saved or loaded (fail-open to a fresh
    * derivation, never to a shared stale artifact). */
  private[graft] val Uncacheable = "UNCACHEABLE"

  /** Fingerprint of one parquet file-or-directory under `dir` —
    * filesystem metadata only (sizes + mtimes), no scan. None when the
    * source cannot be probed: the caller's key becomes uncacheable
    * rather than collapsing every broken probe onto one shared
    * sentinel (which would let regenerated corpora silently serve each
    * other's artifacts in exactly the error path). */
  private[graft] def fingerprint(dir: String, table: String): Option[String] = {
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
      Some(java.security.MessageDigest.getInstance("MD5")
        .digest(sig.getBytes("UTF-8")).take(6)
        .map(b => f"$b%02x").mkString)
    } catch { case _: java.io.IOException => None }
  }

  /** Store path for artifact `kind` derived from `dir/table` at
    * parameterization `variant`. Layout:
    * `{kind}_{dirTag}_{variant}_{fingerprint}` — everything before the
    * fingerprint is the PRUNE KEY (two paths with equal prune keys are
    * versions of the same artifact; [[save]] keeps only the newest). */
  def pathFor(kind: String, dir: String, table: String,
      variant: String): String =
    s"target/tmp/artifact_store/${kind}_" +
      s"${dir.replaceAll("[^a-zA-Z0-9]", "_")}_${variant}_" +
      fingerprint(dir, table).getOrElse(Uncacheable)

  /** Child (delta) path of an append chain: inherits the parent's full
    * path — corpus fingerprint included — so a regenerated corpus
    * invalidates parent and child together. */
  def childPathFor(parentPath: String, batchTag: String): String =
    s"$parentPath--$batchTag"

  private[graft] def isUncacheable(path: String): Boolean =
    path.contains(Uncacheable)

  /** Prune key of a store basename: the name minus its 12-hex-char
    * fingerprint segment (`kind_dir_variant` + any `--batchTag`
    * suffix). None for names not in store format. */
  private[graft] def pruneKeyOf(basename: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile("^(.*)_([0-9a-f]{12})((?:--.+)?)$").matcher(basename)
    if (m.matches) Some(m.group(1) + m.group(3)) else None
  }

  /** Delete sibling artifact versions of `path` — same prune key,
    * different fingerprint — so regenerating a corpus does not hoard
    * its predecessors' artifacts. Saving a BASE artifact additionally
    * sweeps the dead corpus version's DELTAS (prune keys extending the
    * base's with a `--tag`): a delta can never be served against a
    * different base fingerprint anyway, so once its base version is
    * superseded it is garbage. (A concurrent process still reading a
    * pruned version would have to re-derive — acceptable in this
    * single-host environment, and impossible to hit for a corpus that
    * no longer exists on disk.) */
  private def pruneSiblings(path: String): Unit = {
    val f = new java.io.File(path)
    val parent = f.getParentFile
    for {
      key <- pruneKeyOf(f.getName)
      sibs <- Option(parent.listFiles())
      s <- sibs
      sKey <- pruneKeyOf(s.getName)
      if s.getName != f.getName &&
        (sKey == key || (!key.contains("--") && sKey.startsWith(key + "--")))
      if !s.getName.startsWith(f.getName + "--") // never this version's own deltas
    } org.apache.commons.io.FileUtils.deleteQuietly(s)
  }

  def save(df: DataFrame, path: String): Unit =
    if (!isUncacheable(path)) {
      pruneSiblings(path)
      df.write.mode("overwrite").parquet(s"$path/data")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$path/_GRAFT_OK"), Array.emptyByteArray)
    }

  def load(spark: SparkSession, path: String): Option[DataFrame] =
    if (cacheDisabled || isUncacheable(path) ||
        !java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$path/_GRAFT_OK"))) None
    else Some(spark.read.parquet(s"$path/data"))

  /** Load-or-derive: serve the persisted artifact when present, else
    * derive, save, and serve the RELOADED copy — the first and every
    * later run read the same physical parquet. With the cache disabled
    * (or the path uncacheable) the fresh derivation is returned
    * directly. */
  def cached(spark: SparkSession, path: String)
      (derive: => DataFrame): DataFrame =
    load(spark, path).getOrElse {
      val df = derive
      if (cacheDisabled || isUncacheable(path)) df
      else { save(df, path); load(spark, path).get }
    }

  /** The lineage pointer a delta artifact carries: its parent's
    * basename. A delta whose pointer does not match the parent it is
    * being resolved against is not served (hand-moved store dirs). */
  private def parentPointer(childPath: String): Option[String] = {
    val p = java.nio.file.Paths.get(s"$childPath/_GRAFT_PARENT")
    if (java.nio.file.Files.exists(p))
      Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    else None
  }

  /** Every completed, lineage-verified delta of `parentPath`, sorted
    * by directory name for a deterministic resolve order (consumers
    * aggregate, so order is semantics-free — determinism is for plan
    * stability). */
  private def deltasOf(parentPath: String): Seq[String] = {
    val f = new java.io.File(parentPath)
    val prefix = f.getName + "--"
    Option(f.getParentFile.listFiles()).toSeq.flatten
      .filter(s => s.getName.startsWith(prefix))
      .map(_.getPath).sorted
      .filter(p => java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$p/_GRAFT_OK")) &&
        parentPointer(p).contains(f.getName))
  }

  /** Incremental maintenance — the append path the 100 TB ingest story
    * requires: the expensive derivation (a signature pass over TEXT)
    * runs over the ingest batch ALONE; the base corpus's artifact is a
    * parquet read. The delta is persisted under
    * [[childPathFor]]`(parentPath, batchTag)` with a lineage pointer,
    * and consumers are served parent ∪ ALL of the parent's completed
    * deltas — so REPEATED ingest (a new `batchTag` per batch) chains:
    * append(append(store(b0), b1), b2) resolves to b0 ∪ b1 ∪ b2 with
    * each batch signed exactly once (spec-pinned). Writing only the
    * delta is the local stand-in for a partition append to one
    * physical table — no base row is ever rewritten, let alone
    * re-signed. `parentPath` must be the BASE artifact (appending onto
    * a delta path would orphan its siblings — rejected loudly).
    *
    * First-ever run (no parent artifact) derives and saves the base
    * too — that is the initial index build, after which every run
    * re-signs nothing. With the cache disabled the full derivation
    * (base ∪ batch, both fresh) is returned, which is also the spec's
    * equivalence oracle: `appendedCached ≡ deriveParent ∪ deriveBatch`
    * row-for-row (ArtifactStoreSpec). */
  def appendedCached(spark: SparkSession, parentPath: String,
      batchTag: String)(deriveParent: => DataFrame)
      (deriveBatch: => DataFrame): DataFrame = {
    require(!new java.io.File(parentPath).getName.contains("--"),
      s"append parent must be a base artifact, not a delta: $parentPath")
    val childPath = childPathFor(parentPath, batchTag)
    def resolve(parent: DataFrame): DataFrame =
      deltasOf(parentPath).foldLeft(parent) { (acc, d) =>
        acc.unionByName(spark.read.parquet(s"$d/data"))
      }
    val served = for {
      parent <- load(spark, parentPath)
      _ <- load(spark, childPath)
      ptr <- parentPointer(childPath)
      if ptr == new java.io.File(parentPath).getName
    } yield resolve(parent)
    served.getOrElse {
      val parent = cached(spark, parentPath)(deriveParent)
      val delta = deriveBatch
      if (cacheDisabled || isUncacheable(childPath)) parent.unionByName(delta)
      else {
        save(delta, childPath)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$childPath/_GRAFT_PARENT"),
          new java.io.File(parentPath).getName.getBytes("UTF-8"))
        resolve(parent)
      }
    }
  }
}
