package graft.operators

import graft.{ArtifactStore, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** North-star similarity search over `embeddings` (BASELINE.json):
  * brute-force cosine top-k as the exactness baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path.
  *
  * Scale design: brute force is a broadcast of the (tiny) query set
  * against a full scan of the corpus — O(n·q·d) with no shuffle until
  * the final per-query top-k (ranked window over q partitions). The LSH
  * variant replaces the corpus scan with an equi-join on bucket
  * signatures: at 100 TB the corpus side is hash-partitioned by bucket,
  * candidates drop by ~2^bits, and only candidates pay the O(d) dot
  * product. Vector math uses higher-order functions (`zip_with` +
  * `aggregate`) — codegen'd, no UDF.
  */
object SimilarityQueries {

  val K = 10
  private val NQueries = 5

  /** Sequential left-fold dot product via the HOF composition — kept
    * ONLY as [[simKnnBrute]]'s deliberate baseline formulation (the
    * documented HOF-vs-native comparison pair with sim_knn_native).
    * ArrayAggregate is CodegenFallback (interpreted, one lambda frame
    * per element); every other call site uses the codegen'd
    * [[graft.functions.DotProduct]], which computes the identical
    * ascending left-fold bit-for-bit. */
  private def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot_product(a, b)

  private def withNorm(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("vec", col(vecCol).cast("array<double>"))
      .withColumn("norm", sqrt(dot(col("vec"), col("vec"))))

  /** Brute-force cosine top-k: query vectors (vec_id < 5) vs the whole
    * corpus. Cosine is rounded to 6 decimals BEFORE ranking so the
    * ordering (rounded sim desc, vec_id asc) is deterministic across
    * engines; the residual float noise (~1e-13) is far below the
    * rounding grain. */
  val simKnnBrute: Q = (spark, dir) => {
    val emb = withNorm(Tables.embeddings(spark, dir), "embedding")
      .select(col("vec_id"), col("label"), col("vec"), col("norm"))
    // the explicit limit is a semantic no-op (vec_id is unique, so the
    // filter already yields ≤ NQueries rows) but gives the plan a
    // PROVABLE maxRows bound: this frame broadcasts into a nested-loop
    // join (the ≠ predicate), and PlanProbe's BNLJ build-side audit
    // verifies the bound mechanically instead of by scaladoc — same at
    // every non-equi query-set broadcast in this file
    val queries = emb.where(col("vec_id") < NQueries).limit(NQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"),
        col("norm").as("qnorm"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id"), col("label"),
        Tables.round6(dotHof(col("vec"), col("qvec")) /
          (col("norm") * col("qnorm"))).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Same query as [[simKnnBrute]] through the native codegen'd
    * [[graft.functions.CosineSimilarity]] expression instead of the
    * zip_with/aggregate composition — bit-identical accumulation order,
    * so it shares the brute-force oracle. */
  val simKnnNative: Q = (spark, dir) => {
    graft.functions.VectorExpressions.register(spark)
    import graft.functions.VectorExpressions.cosine_similarity
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("vec"))
    // limit = provable BNLJ build bound (see simKnnBrute)
    val queries = emb.where(col("vec_id") < NQueries).limit(NQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        Tables.round6(cosine_similarity(col("vec"), col("qvec"))).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  // ---- random-hyperplane LSH ---------------------------------------

  /** Signature width trades recall against candidate-set size: for this
    * corpus the true top-10 neighbors sit at modest cosine (~0.3-0.5 —
    * per-bit agreement ~0.62), so short signatures across more tables
    * are needed for recall; a corpus with tight clusters (per-bit ~0.9)
    * would take 16+ bits. Measured by RecallProbe at sf0.001 with the
    * replayable integer hyperplanes: 4×8 → 0.70, 4×12 → 0.82,
    * 4×16 → 0.88 (pinned; spec floor 0.7; 3×16 reaches 0.98 at ~2×
    * the candidate volume). */
  val SigBits   = 4
  val NumTables = 16

  /** Deterministic, CROSS-ENGINE-REPLAYABLE hyperplane weight for
    * (table t, bit b, dim d): pure int64 arithmetic — s = (t·1009+b)·
    * 7919+d cubed mod the prime 1e9+7, folded to [-0.5, 0.5). The
    * cubing breaks linearity in d (weights across dims are
    * uncorrelated, hyperplanes span the full space); the formula is
    * replayed verbatim by the dedup_embedding_cosine DuckDB oracle.
    * Max intermediate ≈ 1.2e17 — no int64 overflow. Data-independent,
    * so weights are generated ONCE on the driver and inlined as
    * literal arrays: each sign test is then a single codegen'd
    * [[graft.functions.DotProduct]] over the vector instead of an
    * interpreted `zip_with`+`aggregate` fold per bit (ArrayAggregate
    * is CodegenFallback — measured ~8× on the signature stage). */
  private[graft] def hyperplaneWeight(t: Int, b: Int, d: Int): Double = {
    val P = 1000000007L
    val s = (t.toLong * 1009L + b) * 7919L + d
    val m = ((s * s) % P) * s % P
    (m % 10000L).toDouble / 10000.0 - 0.5
  }

  /** Per-table signature: sign pattern of `vec` against `bits` literal
    * hyperplanes, packed into a long. `dim` fixes the weight-array
    * length at plan time (one-row probe; embedding columns are
    * uniform-width). */
  private[graft] def signatureOf(t: Int, vec: Column, bits: Int,
      dim: Int): Column = {
    import graft.functions.VectorExpressions.dot_product
    (0 until bits).map { b =>
      val w = typedLit((0 until dim).map(d => hyperplaneWeight(t, b, d)))
      when(dot_product(vec, w) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Vector width from a one-row probe (NOT a full-column scan — at
    * 100 TB the dim is metadata, probed once). PRECONDITION: the
    * embedding column is uniform-width (dot products against the
    * literal hyperplanes truncate at the probed width otherwise) —
    * asserted over the full fixture in PipelineSpec, probed here.
    * Fails loud on an empty frame instead of NoSuchElementException. */
  private def vecDim(emb: DataFrame): Int = {
    val d = emb.select(size(col("vec")).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(
        throw new IllegalStateException(
          "embeddings frame is empty: cannot probe vector dimension"))
    require(d > 0, s"embedding vectors must be non-empty, probed dim $d")
    d
  }

  /** LSH-bucketed ANN: candidates = corpus vectors sharing any of the
    * [[NumTables]] table signatures with the query, then exact cosine +
    * top-k on the candidate set only. FULLY oracled: the integer
    * hyperplane rule, candidate join, and sequential-left-fold cosine
    * all replay bit-for-bit in DuckDB; recall vs brute force is
    * additionally asserted in PipelineSpec. */
  val simKnnLsh: Q = (spark, dir) => simKnnLshWith(spark, dir, SigBits, NumTables)

  /** Parameterized form of [[simKnnLsh]] (used by the recall-tuning
    * probe and the spec). */
  def simKnnLshWith(spark: SparkSession, dir: String, sigBits: Int,
      numTables: Int): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val emb = withNorm(Tables.embeddings(spark, dir), "embedding")
      .select(col("vec_id"), col("label"), col("vec"), col("norm"))
    val dim = vecDim(emb)
    val sigs = emb.select(col("vec_id"),
      posexplode(array((0 until numTables).map(t =>
        signatureOf(t, col("vec"), sigBits, dim)): _*)).as(Seq("table_id", "sig")))
    val qSigs = sigs.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("table_id"), col("sig"))
    // single fused LONG join key (see [[fusedSigKey]]): the corpus
    // posting side streams against a LongHashedRelation of the query
    // signatures instead of the slower byte-keyed two-column relation
    val candidates = sigs.as("a").join(broadcast(qSigs).as("b"),
        fusedSigKey("a") === fusedSigKey("b"))
      .where(col("a.vec_id") =!= col("b.query_id"))
      .select(col("b.query_id").as("query_id"), col("a.vec_id").as("vec_id"))
      .distinct()
    val scored = candidates
      .join(emb, Seq("vec_id"))
      .join(broadcast(emb.where(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("vec").as("qvec"),
          col("norm").as("qnorm"))), Seq("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        Tables.round6(dot(col("vec"), col("qvec")) / (col("norm") * col("qnorm")))
          .as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF ANN: k-means-style coarse quantization using the label
    * centroids as the codebook — corpus vectors are assigned to their
    * nearest centroid, queries probe their nearest centroids in csim
    * order until the probed clusters cover [[MassTargetBp]]/10⁴ of the
    * assigned corpus mass (capped at [[MaxProbe]] — see the adaptive
    * contract there), and exact cosine runs only on the probed
    * clusters' members.
    *
    * Scale shape: the codebook is tiny (|labels| × d) — it is collected
    * once and inlined as a LITERAL array of (centroid, norm) structs, so
    * assignment is a pure per-row projection (`array_max` over the
    * per-centroid scores): zero shuffle, zero sort, stays inside
    * whole-stage codegen. The candidate join is an equi-join on cluster
    * id. At 100 TB this is the standard trillion-vector layout:
    * partition the corpus BY assigned cluster so a probe reads only its
    * clusters' partitions. FULLY oracled: the integer-scaled centroid
    * means, deterministic (csim desc, cluster asc) argmax, probe
    * selection, and exact-cosine top-k replay in DuckDB; PipelineSpec
    * additionally bounds recall vs brute force and asserts the
    * assignment plan carries no Window/Sort. */
  val simKnnIvf: Q = (spark, dir) =>
    simKnnIvfAdaptiveWith(spark, dir, MassTargetBp, MaxProbe)

  /** Probe width of the FIXED-probe form, measured by RecallProbe at
    * sf0.001: 2 → 0.28, 4 → 0.58, 6 → 0.78 (spec floor 0.7). This
    * fixture's embeddings are near-uniform (max same-label cosine
    * ≈ 0.47), so neighbors scatter across the 10 label clusters and
    * probes must be wide; a corpus with real cluster structure keeps
    * nProbe at 1-2 with the same plan. Kept for the recall probe's
    * fixed-vs-adaptive frontier comparison; the registered query uses
    * the adaptive mass-targeted form below. */
  val NProbe = 6

  /** Adaptive probe target: probe clusters in (csim desc, cluster asc)
    * order until the probed clusters cover ≥ this fraction of the
    * ASSIGNED CORPUS MASS (in basis points — integer math, so the
    * stop rule replays exactly in SQL), bounded by [[MaxProbe]]. On
    * this near-uniform fixture 5500 bp lands at ~6 of 10 clusters —
    * the recall/cost point fixed-6 was pinned at — but the contract is
    * the better one at scale: a skewed corpus (real IVF indexes are
    * skewed) stops after FEW large clusters instead of always paying
    * nProbe probes, and a query landing in small clusters widens
    * automatically instead of starving at a fixed count. Cost is
    * bounded both ways: candidates ≤ maxProbe clusters, and expected
    * candidates ≈ massTarget · n regardless of skew. */
  val MassTargetBp = 5500
  val MaxProbe     = 8

  /** Fixed-probe parameterized form (recall-probe frontier baseline). */
  def simKnnIvfWith(spark: SparkSession, dir: String, nProbe: Int): DataFrame =
    ivfRank(ivfScored(spark, dir, Left(nProbe)))

  /** Mass-targeted adaptive form — the registered `sim_knn_ivf`. */
  def simKnnIvfAdaptiveWith(spark: SparkSession, dir: String, massBp: Int,
      maxProbe: Int): DataFrame =
    ivfRank(ivfScored(spark, dir, Right((massBp, maxProbe))))

  /** Fixed-probe form against the TRAINED codebook artifact (round 12:
    * the trained family joins RecallProbe's per-round sweep grid, so
    * trained-codebook retrieval decay is diffable round-over-round
    * exactly like the label-mean family). */
  def simKnnIvfTrainedWith(spark: SparkSession, dir: String,
      nProbe: Int): DataFrame =
    ivfRank(ivfScored(spark, dir, Left(nProbe),
      Some(trainedCodebook(spark, dir))))

  /** Candidate-pair count of an IVF setting (recall probe's cost axis:
    * rows scored BEFORE the top-k cut). */
  private[graft] def ivfCandidates(spark: SparkSession, dir: String,
      probe: Either[Int, (Int, Int)]): Long =
    ivfScored(spark, dir, probe).count()

  private def ivfRank(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Shared IVF retrieval core: centroid codebook → map-side argmax
    * assignment → probe selection (`Left(nProbe)` fixed /
    * `Right((massBp, maxProbe))` adaptive) → exact cosine on probed
    * clusters. Returns the scored candidate frame (query_id, vec_id,
    * label, cos_sim) before ranking. */
  /** Label-centroid codebook as collected literals: (cluster, centroid,
    * centroid norm) sorted by cluster — exact per-dimension integer-
    * scaled means assembled in dim order (the replayable IVF coarse
    * quantizer). The codebook is a bounded derivative (|labels| rows) —
    * collected once and inlined as literals, so assignment is a pure
    * map-side projection with no broadcast join, no crossJoin, no
    * Window. Shared by [[simKnnIvf]] and [[pipeSemDedup]]. */
  private def centroidCodebook(spark: SparkSession, dir: String)
      : Array[(Int, Seq[Double], Double)] =
    centroidCodebookOf(Tables.embeddings(spark, dir))

  private def centroidCodebookOf(embRaw: DataFrame)
      : Array[(Int, Seq[Double], Double)] = {
    val codebook = embRaw
      .select(col("label"), posexplode(col("embedding").cast("array<double>"))
        .as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg((sum(floor(col("x") * 1000000.0 + 0.5)) / 1000000.0 / count(lit(1)))
        .as("cx"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("cx")))),
        s => s("cx")).as("cvec"))
      .select(col("label").as("cluster"), col("cvec"))
    codebook.collect().map { r =>
      val cv = r.getSeq[Double](1)
      // same left-fold accumulation order as the aggregate() HOF
      (r.getAs[Number](0).intValue, cv,
        math.sqrt(cv.foldLeft(0.0)((acc, x) => acc + x * x)))
    }.sortBy(_._1)
  }

  /** Per-centroid (csim, −cluster) scores of `vec` — struct ordering
    * makes `array_max` ≡ argmax by (csim desc, cluster asc). */
  private def centroidScoresFor(centroids: Array[(Int, Seq[Double], Double)],
      vec: Column, norm: Column): Column =
    array(centroids.map { case (cl, cv, cn) =>
      struct((dot(vec, typedLit(cv)) / (norm * lit(cn))).as("csim"),
        lit(-cl).as("neg_cluster"))
    }: _*)

  private def ivfScored(spark: SparkSession, dir: String,
      probe: Either[Int, (Int, Int)],
      codebook: Option[Array[(Int, Seq[Double], Double)]] = None): DataFrame =
    ivfCandidateFrame(spark, dir, probe, codebook)
      .select(col("query_id"), col("vec_id"), col("label"),
        Tables.round6(dot(col("vec"), col("qvec")) /
          (col("norm") * col("qnorm"))).as("cos_sim"))

  /** IVF candidate frame — every (query, corpus-vector) pair whose
    * vector sits in one of the query's probed clusters, carrying both
    * sides' vectors/norms: [[ivfScored]] scores it with exact cosine
    * (sim_knn_ivf); [[simKnnIvfPq]] scores it with PQ ADC instead. */
  private def ivfCandidateFrame(spark: SparkSession, dir: String,
      probe: Either[Int, (Int, Int)],
      codebook: Option[Array[(Int, Seq[Double], Double)]] = None): DataFrame = {
    val emb = withNorm(Tables.embeddings(spark, dir), "embedding")
      .select(col("vec_id"), col("label"), col("vec"), col("norm"))
    val centroids = codebook.getOrElse(centroidCodebook(spark, dir))
    def centroidScores(vec: Column, norm: Column): Column =
      centroidScoresFor(centroids, vec, norm)
    // map-side argmax assignment of every corpus vector — a projection
    val assigned = emb.withColumn("cluster",
      -array_max(centroidScores(col("vec"), col("norm")))
        .getField("neg_cluster"))
    // per-query probe ranking: full sorted centroid-score array,
    // exploded to (query_id, prank, cluster) — ≤ NQueries × |clusters|
    // rows, a pure projection
    val pranked = emb.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"),
        col("norm").as("qnorm"),
        posexplode(reverse(array_sort(
          centroidScores(col("vec"), col("norm"))))).as(Seq("pos", "s")))
      .select(col("query_id"), col("qvec"), col("qnorm"),
        (-col("s.neg_cluster")).as("cluster"), (col("pos") + 1).as("prank"))
    val probes = probe match {
      case Left(nProbe) => pranked.where(col("prank") <= nProbe)
      case Right((massBp, maxProbe)) =>
        // adaptive stop rule in EXACT integer math: keep cluster at
        // prank k iff the mass BEFORE it (cum − csize) is still short
        // of massBp/10⁴ of the corpus — i.e. probe until coverage
        // crosses the target, never past maxProbe. Cluster sizes are a
        // second aggregate pass over the assignment projection here; a
        // production IVF index maintains them as build-time catalog
        // metadata (they are exactly the posting-list lengths). The
        // cumsum Window runs over ≤ NQueries × |clusters| rows.
        val sizes = assigned.groupBy(col("cluster"))
          .agg(count(lit(1)).as("csize"))
        val n = Tables.embeddings(spark, dir).count() // scalar metadata
        val cum = sum(col("csize")).over(
          Window.partitionBy(col("query_id")).orderBy(col("prank")))
        pranked.join(broadcast(sizes), Seq("cluster"))
          .withColumn("cum", cum)
          .where((col("cum") - col("csize")) * lit(10000L) <
            lit(massBp.toLong * n) && col("prank") <= maxProbe)
    }
    assigned.join(broadcast(probes.select(col("query_id"), col("qvec"),
        col("qnorm"), col("cluster"))), Seq("cluster"))
      .where(col("vec_id") =!= col("query_id"))
  }

  // ---- replayable random-hyperplane blocking (dedup) ----------------

  /** Number of hyperplane tables for embedding near-dup blocking. */
  val DedupTables = 16

  /** Cosine duplicate threshold for the embedding near-dup family —
    * calibrated to this fixture's top-similarity tail (the synthetic
    * corpus has no true duplicate vectors — max cosine ≈ 0.47); a
    * production corpus runs the same plan at ≥ 0.95 where per-bit
    * agreement ≈ 0.9 keeps recall ≈ 1. Shared by the full query, the
    * incremental admission, and the streaming dual; the DuckDB oracles
    * carry the same literal. */
  val EmbDupTau = 0.3

  /** Signature width for a corpus of `n` vectors: ceil(log₂(n)/2),
    * floored at 4 — so the per-table bucket count 2^bits ≈ √n GROWS
    * with the corpus and expected candidate pairs scale as
    * tables·n²/√n = O(n^1.5), sub-quadratic (vs the old fixed-10-label
    * block's O(n²/10)). At trillion-vector scale this yields ~20-bit
    * signatures; recall at a production dup threshold (≥0.95 cosine,
    * per-bit agreement ≈ 0.9) stays ≈ 1 across 16 tables.
    *
    * Computed in EXACT integer arithmetic — the smallest k in [4, 31]
    * with 4^k ≥ n — not via ceil(log2(n)/2): libm log drifts off the
    * exact value at 2^50+ boundaries (measured: n=2^50+1 → 25 via log
    * vs 26 exact, n=2^58 → 30 vs 29), where Spark's and DuckDB's libm
    * could each round differently and break the oracle replay. The
    * oracle SQL uses the same shift-based form. */
  def sigBitsFor(n: Long): Int = {
    var b = 4
    while (b < 31 && (1L << (2 * b)) < n) b += 1
    b
  }

  /** The LSH posting key pair (table_id, sig) FUSED into one LONG —
    * `table_id << 48 | sig` — the emb family's join key (round-18,
    * the [[graft.operators.DedupQueries.fusedChunkKey]] finding: a
    * two-column equi key builds a byte-keyed UnsafeHashedRelation
    * whose per-row probe cost dominates large-index probes; a single
    * long key builds a LongHashedRelation, measured 6–8× faster at
    * ×100). INJECTIVE by construction: [[sigBitsFor]] caps signature
    * width at 31 bits, so sig < 2^31 ≤ 2^48, and table_id is a small
    * table index (< 256) — the fields never overlap in the fusion, so
    * the fused equi-join is row-identical to the pair join. */
  private[graft] def fusedSigKey(side: String): Column =
    shiftleft(col(s"$side.table_id").cast("long"), 48)
      .bitwiseOR(col(s"$side.sig"))

  /** Embedding-cosine near-dup pairs — the vector-space member of the
    * dedup family: random-hyperplane LSH blocking (candidates = pairs
    * sharing any of [[DedupTables]] table signatures), exact cosine
    * verify on candidates only. The block-key cardinality scales with
    * the corpus ([[sigBitsFor]]: 2^bits ≈ √n buckets per table), so
    * candidate pairs grow O(n^1.5) — no all-pairs pass at any scale,
    * and only ids + signatures transit the candidate shuffle (vectors
    * join back in for ≤O(n^1.5) verifications). The 0.3 threshold is
    * calibrated to this fixture's top-similarity tail (the synthetic
    * corpus has no true duplicate vectors — max cosine ≈ 0.47); a
    * production corpus with real dups would run the same plan at
    * ≥ 0.95, where per-bit agreement ≈ 0.9 keeps recall ≈ 1. Fully
    * oracled: the signature rule is pure integer arithmetic that the
    * DuckDB SQL replays bit-for-bit. */
  val dedupEmbCosine: Q = (spark, dir) =>
    // signatures from the MAINTAINED posting store (round-18, the
    // round-13 containment precedent: the full operator re-projected
    // every corpus vector against the hyperplanes on every call while
    // [[embSigsStored]] serves the identical postings — width =
    // sigBitsFor(full count), append ≡ full derivation row-for-row,
    // spec-pinned). The serving path is now a store read + the
    // candidate join; the one hyperplane projection per corpus
    // version covers this family's full query too. Cache-off runs
    // fall through to the store's own fresh-derive thunks — the same
    // rows either way.
    dedupEmbCosineOfSigs(embSigsStored(spark, dir),
      Tables.embeddings(spark, dir))

  /** Core of [[dedupEmbCosine]] over any frame with (vec_id,
    * embedding) — exposed so specs can plant duplicate vectors
    * (identical vectors share every table signature by construction,
    * so a true dup is ALWAYS a candidate). */
  private[graft] def dedupEmbCosineOn(embRaw: DataFrame): DataFrame = {
    val emb = embRaw
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val bits = sigBitsFor(emb.count()) // O(1) scalar probe
    val dim = vecDim(emb)
    dedupEmbCosineOfSigs(embSigsOf(emb, bits, dim), embRaw)
  }

  /** [[dedupEmbCosine]] over explicit posting + vector frames — the
    * candidate join and exact-cosine verify shared by the store-served
    * Q form and the fresh-deriving spec form. */
  private[graft] def dedupEmbCosineOfSigs(sigs: DataFrame,
      embRaw: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.register(embRaw.sparkSession)
    import graft.functions.VectorExpressions.cosine_similarity
    val emb = embRaw
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val cand = sigs.as("a").join(sigs.as("b"),
        fusedSigKey("a") === fusedSigKey("b") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(emb.select(col("vec_id").as("vec_a"), col("vec").as("va")),
        Seq("vec_a"))
      .join(emb.select(col("vec_id").as("vec_b"), col("vec").as("vb")),
        Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        Tables.round6(cosine_similarity(col("va"), col("vb"))).as("cos_sim"))
      .where(col("cos_sim") >= EmbDupTau)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  // ---- incremental embedding ingest --------------------------------

  /** Ingest-batch predicate for the VECTOR corpus — the same mod-5
    * convention as [[operators.DedupQueries.isIngestBatch]], keyed on
    * vec_id. */
  private[graft] def isIngestBatchVec: Column =
    pmod(col("vec_id"), lit(5)) === 0

  /** (vec_id, table_id, sig) LSH signature postings of a vector frame
    * at a FIXED signature width — the row-local projection both the
    * full dedup and the incremental admission derive from. */
  private[graft] def embSigsOf(emb: DataFrame, bits: Int, dim: Int): DataFrame =
    emb.select(col("vec_id"),
      posexplode(array((0 until DedupTables).map(t =>
        signatureOf(t, col("vec"), bits, dim)): _*)).as(Seq("table_id", "sig")))

  private[graft] def embSigStorePath(dir: String): String =
    ArtifactStore.pathFor("emb_sigs", dir, "embeddings.parquet",
      s"rp${DedupTables}t_v1")

  /** The corpus's LSH signature postings as a maintained, APPENDED
    * artifact — the embedding family joins the incremental-ingest
    * roster (the [[operators.DedupQueries]] discipline): the existing
    * corpus's signatures are an artifact read; an ingest batch's
    * vectors are projected ALONE and appended as a fingerprint-chained
    * delta — no base vector is ever re-projected against the
    * hyperplanes. The signature width is [[sigBitsFor]] of the FULL
    * corpus count (the same width the full query and its oracle use —
    * width is fixed per corpus fingerprint, so base and delta rows are
    * mutually consistent and append ≡ full derivation row-for-row);
    * the width/dim probes sit INSIDE the by-name derive thunks, so the
    * load path runs neither. */
  private[graft] def embSigsStored(spark: SparkSession,
      dir: String): DataFrame = {
    def sigs(pred: Column): DataFrame = {
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      embSigsOf(emb.where(pred), sigBitsFor(emb.count()), vecDim(emb))
    }
    ArtifactStore.appendedCached(spark, embSigStorePath(dir),
      DedupQueries.IngestBatchTag)(
      sigs(!isIngestBatchVec))(sigs(isIngestBatchVec))
  }

  /** One maintained-width ingest step for an emb_sigs chain at `path`
    * (round-13 judge item — the signature-width analog of the simhash
    * family's store-metadata level): serves base ∪ batch postings with
    * EVERY row at sigBitsFor(total vectors).
    *
    * The emb_sigs signature width is a chain-wide parameter —
    * signatures are compared by equality, so base and delta rows must
    * share one width — fixed at build time as [[sigBitsFor]] of the
    * corpus count. Append-only growth would otherwise serve
    * stale-width postings forever: past a 4^k boundary the per-table
    * bucket count stops tracking √n and candidates drift from
    * O(n^1.5) toward O(n²) — the exact saturation the width rule
    * exists to prevent. So each append first reads the chain's
    * current size from store METADATA (no corpus scan:
    * rows/DedupTables — the maintained invariant below): when adding
    * the batch keeps sigBitsFor unchanged, the batch is projected
    * ALONE at that width and appended as a normal delta; when it
    * crosses a boundary, the chain is REBUILT at the new width
    * ([[graft.ArtifactStore.rebuildChain]] — compaction bookkeeping
    * with a re-derivation as content, the batch's tag registered
    * folded so it is never re-appended). Boundaries are
    * exponentially spaced (4^k), so the full re-projections amortize
    * to O(1) scans per vector over the corpus's lifetime.
    *
    * Invariant (spec-pinned across a planted boundary): the served
    * chain's width always equals sigBitsFor(storedRowCount /
    * DedupTables) — rebuilds run exactly when that expression would
    * change, so the built width never diverges from the metadata
    * formula and no width sidecar is needed. */
  private[graft] def embSigsMaintainedAppend(spark: SparkSession,
      path: String, baseVecs: DataFrame, batchVecs: DataFrame,
      batchTag: String): DataFrame = {
    def proj(df: DataFrame) = df.select(col("vec_id"),
      col("embedding").cast("array<double>").as("vec"))
    val batch = proj(batchVecs)
    ArtifactStore.storedRowCount(path).map(_ / DedupTables) match {
      case Some(nOld) if !ArtifactStore.foldedTags(path).contains(batchTag) &&
          ArtifactStore.load(spark,
            ArtifactStore.childPathFor(path, batchTag)).isEmpty =>
        val nNew = nOld + batch.count()
        if (sigBitsFor(nNew) != sigBitsFor(nOld)) {
          val all = proj(baseVecs).unionByName(batch)
          val rebuilt = ArtifactStore.rebuildChain(spark, path,
            extraFolded = Set(batchTag))(
            embSigsOf(all, sigBitsFor(nNew), vecDim(all)))
          if (rebuilt) ArtifactStore.load(spark, path).getOrElse(
            sys.error(s"rebuilt emb_sigs chain unloadable: $path"))
          else embSigsOf(all, sigBitsFor(nNew), vecDim(all)) // cache off
        } else
          ArtifactStore.appendedCached(spark, path, batchTag)(
            sys.error(s"emb_sigs base vanished under append: $path"))(
            embSigsOf(batch, sigBitsFor(nNew), vecDim(batch)))
      case _ =>
        // cold store / cache off / batch already chained or folded:
        // the embSigsStored convention — both thunks at the FULL
        // count's width, probes inside the by-name thunks
        lazy val w = sigBitsFor(proj(baseVecs).count() + batch.count())
        ArtifactStore.appendedCached(spark, path, batchTag)(
          { val b = proj(baseVecs); embSigsOf(b, w, vecDim(b)) })(
          embSigsOf(batch, w, vecDim(batch)))
    }
  }

  /** `dedup_embedding_incremental`: incremental ingest admission for
    * the vector-space near-dup family — with this, EVERY near-dup
    * family has an incremental form (exact digests, minhash bands,
    * ngram components, simhash, phash, and now embedding cosine). The
    * ingest batch's signature postings probe the existing corpus's
    * persisted postings plus the in-batch postings; candidates are
    * exact-cosine verified at the family's 0.3 threshold; output is
    * (vec_id [incoming], match_id, match_src 'corpus'|'batch',
    * cos_sim), in-batch matches pointing the LATER vector at the
    * earlier one. At 100 TB: the existing side is the maintained
    * posting store (ids + 16 signatures per vector — never the
    * vectors), the batch alone is projected against the hyperplanes,
    * the candidate join is equi on (table_id, sig), and full vectors
    * join back only for the ≤O(candidates) verifications. FULLY
    * oracled: the dedup_embedding_cosine integer-hyperplane replay
    * composed with the mod-5 base/batch split. */
  val dedupEmbIncremental: Q = (spark, dir) => {
    graft.functions.VectorExpressions.register(spark)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val sigs = embSigsStored(spark, dir)
    // probe side from the signature chain's own delta dir (round-17):
    // a width-boundary rebuild folds the tag, in which case the
    // filter fallback applies — row-identical either way. The
    // broadcast hint rides the delta only under the metadata row
    // budget (r17 advice: an unforced hint must not grow with the
    // corpus past the broadcast cap).
    incrementalEmbOfSigs(sigs.where(!isIngestBatchVec),
      ArtifactStore.deltaFrame(spark, embSigStorePath(dir),
        DedupQueries.IngestBatchTag)
        .map { d =>
          if (ArtifactStore.deltaRowCount(embSigStorePath(dir),
              DedupQueries.IngestBatchTag)
              .exists(_ <= DedupQueries.BatchBroadcastMaxRows)) broadcast(d)
          else d
        }
        .getOrElse(sigs.where(isIngestBatchVec)),
      emb)
  }

  /** Core of [[dedupEmbIncremental]] over explicit posting + vector
    * frames — the planted-fixture spec form. */
  private[graft] def incrementalEmbOfSigs(sigs: DataFrame,
      emb: DataFrame): DataFrame =
    incrementalEmbOfSigs(sigs.where(!isIngestBatchVec),
      sigs.where(isIngestBatchVec), emb)

  /** [[incrementalEmbOfSigs]] with the existing/batch split supplied
    * by the caller.
    *
    * VERIFY-JOIN SHAPE (round-19, guide §8 / §2.3 — the ×100 probe
    * decomposition measured the verify stage at 12–17 s of the 19 s
    * total): candidates are O(batch × √n) by design (~12M pairs at
    * ×100 for a 2k-vector batch), and the old
    * `distinct → join(va) → join(vb)` tail sort-merge-joined that pair
    * stream against the vector table TWICE — the second exchange
    * carried every pair WITH its 512-byte va array (≈6 GB shuffled and
    * sorted at ×100 for ~80 MB of actual vectors). Now the heavy bytes
    * move once and only at data grain:
    *
    *  - candidates stay KEYS-ONLY through dedup: one groupBy
    *    (match_id, match_src) with collect_set(vec_id) replaces the
    *    distinct — same set semantics, one keys-only exchange;
    *  - the CORPUS-side vector attaches once per matched id (the
    *    ≤n-row match grain), never per pair, and the pair set explodes
    *    back LOCALLY — no exchange ever carries a per-pair vector;
    *  - the BATCH-side vectors (the vector table semi-joined down to
    *    the probe's ids — batch-bounded by construction) attach
    *    map-side under the same gated broadcast decision the batch
    *    postings carry ([[graft.operators.DedupQueries.hasSpineHint]]
    *    re-raises the store-metadata gate onto the derived frame);
    *    ungated paths are planner/AQE-chosen, and AQE's runtime sizing
    *    converts the join to a broadcast anyway once the semi-join's
    *    true cardinality is visible.
    *
    * Measured ×100 (x100_ing, local[32]): 6.8–17.8 s → 2.5–4.5 s,
    * identical 421,663 rows; the DuckDB oracle pins row/hash equality
    * at the verify SFs. The grouped tail applies ONLY when the batch
    * side carries the gated broadcast (see the shape gate below);
    * ungated paths keep the classic two-join tail, which measures
    * faster there. */
  private[graft] def incrementalEmbOfSigs(exS: DataFrame,
      inS: DataFrame, emb: DataFrame): DataFrame = {
    import graft.functions.VectorExpressions.cosine_similarity
    // single fused LONG join key (see [[fusedSigKey]])
    val onKeys = fusedSigKey("a") === fusedSigKey("b")
    // batch signatures carry the store-delta broadcast hint when the
    // delta metadata says they fit (round-17 per_probe decomposition:
    // the corpus posting store streams map-side, no exchange; r17
    // advice: gated, not forced — fresh-frame callers get the
    // planner/AQE choice)
    val cross = DedupQueries.carryBroadcastHint(inS.as("a"))
      .join(exS.as("b"), onKeys)
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("match_id"),
        lit("corpus").as("match_src"))
    val inBatch = inS.as("a").join(DedupQueries.carryBroadcastHint(inS.as("b")),
        onKeys && col("a.vec_id") < col("b.vec_id"))
      .select(col("b.vec_id").as("vec_id"), col("a.vec_id").as("match_id"),
        lit("batch").as("match_src"))
    // SHAPE IS GATED BY THE SAME SIGNAL AS THE HINT (round-19): the
    // grouped tail only wins when the batch-side vectors can attach
    // map-side — i.e. exactly when the batch side carries the
    // store-metadata broadcast gate. On UNGATED paths (cache-off,
    // fresh frames, the rehearsal's r12 parquet-posting protocol) the
    // grouped form's exploded pair stream carries vb into a
    // sort-merge join and measured 4× SLOWER than the classic
    // distinct → join(va) → join(vb) tail (33.9 vs ~9 s at ×100), so
    // those paths keep the classic shape. Both shapes are
    // row-identical (same candidate set, same verify predicate —
    // StreamMlSpec pins the planted fixture through both, and the
    // oracle hashes the gated path).
    val verified =
      if (DedupQueries.hasSpineHint(inS)) {
        val grouped = cross.unionByName(inBatch)
          .groupBy(col("match_id"), col("match_src"))
          .agg(collect_set(col("vec_id")).as("vec_ids"))
        val pairsVb = grouped
          .join(emb.select(col("vec_id").as("match_id"), col("vec").as("vb")),
            Seq("match_id"))
          .select(col("match_id"), col("match_src"), col("vb"),
            explode(col("vec_ids")).as("vec_id"))
        val vaSide = broadcast(emb
          .join(inS.select(col("vec_id")).distinct(), Seq("vec_id"),
            "left_semi")
          .select(col("vec_id"), col("vec").as("va")))
        pairsVb.join(vaSide, Seq("vec_id"))
          .select(col("vec_id"), col("match_id"), col("match_src"),
            col("va"), col("vb"))
      } else
        cross.unionByName(inBatch).distinct()
          .join(emb.select(col("vec_id"), col("vec").as("va")), Seq("vec_id"))
          .join(emb.select(col("vec_id").as("match_id"), col("vec").as("vb")),
            Seq("match_id"))
          .select(col("vec_id"), col("match_id"), col("match_src"),
            col("va"), col("vb"))
    verified
      .select(col("vec_id"), col("match_id"), col("match_src"),
        Tables.round6(cosine_similarity(col("va"), col("vb"))).as("cos_sim"))
      .where(col("cos_sim") >= EmbDupTau)
      .orderBy(col("vec_id"), col("match_src"), col("match_id"))
  }

  /** The PRE-verify candidate frame of [[incrementalEmbOfSigs]] — the
    * blocked admission volume the scale rehearsal measures
    * (batch→corpus probes + in-batch pairs, distinct). */
  private[graft] def incrementalEmbCandidates(sigs: DataFrame): DataFrame = {
    val inS = sigs.where(isIngestBatchVec)
    val exS = sigs.where(!isIngestBatchVec)
    val onKeys = fusedSigKey("a") === fusedSigKey("b")
    DedupQueries.carryBroadcastHint(inS.as("a")).join(exS.as("b"), onKeys)
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("match_id"))
      .unionByName(inS.as("a").join(DedupQueries.carryBroadcastHint(inS.as("b")),
          onKeys && col("a.vec_id") < col("b.vec_id"))
        .select(col("b.vec_id").as("vec_id"), col("a.vec_id").as("match_id")))
      .distinct()
  }

  /** [[dedupEmbIncremental]] over an explicit (vec_id, embedding)
    * frame (no store) — the planted-fixture spec form: signature width
    * from the frame's own count, matching the store-fed path. */
  private[graft] def incrementalEmbOn(embRaw: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.register(embRaw.sparkSession)
    val emb = embRaw
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    incrementalEmbOfSigs(
      embSigsOf(emb, sigBitsFor(emb.count()), vecDim(emb)), emb)
  }

  /** SemDeDup duplicate threshold. This fixture has no true duplicate
    * vectors (max pairwise cosine ≈ 0.47), so τ is calibrated to its
    * within-cluster tail (~p99.8) to exercise the drop path; a
    * production corpus runs the same plan at ≥ 0.95. */
  val SemDedupTau = 0.35

  /** `pipe_semdedup`: SemDeDup-style semantic deduplication (Abbas et
    * al. 2023, arXiv:2303.09540) — the embedding-space member of the
    * keeper-policy family (vs [[operators.DedupQueries]]' lexical
    * members and `pipe_dedup_keep_best`'s quality rule): cluster the
    * corpus with the IVF coarse quantizer ([[centroidCodebook]] — same
    * map-side argmax assignment as sim_knn_ivf), find within-cluster
    * pairs with cosine ≥ [[SemDedupTau]], and KEEP the pair member
    * FARTHEST from its centroid (the paper's low-centroid-similarity
    * keeper — it preserves cluster-edge diversity while dropping
    * redundant cluster-core examples). The drop rule is pairwise
    * dominance — v drops iff some τ-partner has strictly lower
    * (csim_centroid, vec_id) — which is deterministic, local to the
    * cluster, and exactly SQL-replayable, unlike a greedy sequential
    * sweep. Emits every vector with its cluster, rounded centroid
    * similarity, and the keep/drop verdict.
    *
    * Determinism: assignment argmax uses the IVF doctrine (identical
    * unrounded expression trees + struct-ordered tie-break); the
    * τ-compare and the dominance compare both use 6-decimal-rounded
    * cosines so boundary pairs agree across engines.
    *
    * Scale: the within-cluster self-join is the published algorithm's
    * shape — quadratic PER CLUSTER, linear overall because k grows
    * with the corpus (the paper runs k = 50k on LAION so cluster size
    * stays ~constant; here k = |labels|). Vectors shuffle ONCE on the
    * cluster key (the IVF posting-list layout), and the pairwise
    * compare runs inside each cluster's partition — no all-pairs path
    * across clusters exists. FULLY oracled: codebook, assignment,
    * pairing, and dominance replay bit-for-bit in DuckDB. */
  val pipeSemDedup: Q = (spark, dir) =>
    semDedupOn(Tables.embeddings(spark, dir))

  /** [[pipeSemDedup]] over an explicit (vec_id, embedding, label) frame
    * — the spec plants identical vectors (always τ-partners: cosine 1)
    * and asserts exactly one survives, with the keeper being the
    * lower-(csim, vec_id) member. */
  /** Cluster-assigned corpus of [[pipeSemDedup]]: every vector with its
    * argmax cluster and rounded centroid similarity — exposed so the
    * scale rehearsal can measure cluster-size (bucket) statistics. */
  private[graft] def semDedupAssignedOn(embRaw: DataFrame): DataFrame =
    semDedupAssignedWith(embRaw, centroidCodebookOf(embRaw))

  /** [[semDedupAssignedOn]] with the codebook supplied explicitly —
    * the trained-quantizer variant passes the persisted Lloyd
    * codebook. */
  private[graft] def semDedupAssignedWith(embRaw: DataFrame,
      centroids: Array[(Int, Seq[Double], Double)]): DataFrame = {
    val emb = withNorm(embRaw, "embedding")
      .select(col("vec_id"), col("vec"), col("norm"))
    emb
      .withColumn("best",
        array_max(centroidScoresFor(centroids, col("vec"), col("norm"))))
      .select(col("vec_id"), col("vec"), col("norm"),
        (-col("best.neg_cluster")).as("cluster"),
        Tables.round6(col("best.csim")).as("csim_centroid"))
  }

  /** Unordered within-cluster candidate pairs of [[pipeSemDedup]] —
    * the pairs the exact-cosine verify stage must score (the rehearsal's
    * cost axis; the registered query's both-direction dominance join
    * compares exactly these, twice). */
  private[graft] def semDedupCandidatesOn(embRaw: DataFrame): DataFrame = {
    val a = semDedupAssignedOn(embRaw)
    a.as("a").join(a.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
  }

  private[graft] def semDedupOn(embRaw: DataFrame): DataFrame =
    semDedupOfAssigned(semDedupAssignedOn(embRaw))

  private[graft] def semDedupOfAssigned(assigned: DataFrame): DataFrame = {
    val dropped = assigned.as("a").join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .where(Tables.round6(dot(col("a.vec"), col("b.vec")) /
        (col("a.norm") * col("b.norm"))) >= SemDedupTau)
      .where(col("b.csim_centroid") < col("a.csim_centroid") ||
        (col("b.csim_centroid") === col("a.csim_centroid") &&
          col("b.vec_id") < col("a.vec_id")))
      .select(col("a.vec_id").as("vec_id")).distinct()
      .withColumn("dropped", lit(1))
    assigned.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("csim_centroid"),
        when(col("dropped").isNull, 1).otherwise(0).as("is_kept"))
      .orderBy(col("vec_id"))
  }

  /** `prof_embedding_stats`: per-dimension embedding-corpus profiler —
    * the QA panel a pipeline runs BEFORE building any vector index:
    * mean/sample-stddev per dimension (a near-zero stddev marks a
    * collapsed dimension that wastes index bits and distorts cosine),
    * min/max (scale drift / clipping), and the exact-zero fraction
    * (dead-ReLU columns). Values quantize to integer micro-units and
    * the power sums accumulate as exact Decimal(38,0) (the
    * agg_higher_moments doctrine ≙ DuckDB HUGEINT), so every statistic
    * is partition-invariant and replays bit-for-bit.
    *
    * Scale: one posexplode of the corpus into a hash aggregate keyed
    * by dim — map-side partials, d-row output, nothing data-sized
    * shuffles; the explode pipelines inside the scan stage. Decimal
    * headroom: Σm² ≤ 10³⁸ holds to ~10²⁶ values at |x| ≤ 1. */
  val profEmbeddingStats: Q = (spark, dir) =>
    embeddingStatsOn(Tables.embeddings(spark, dir))

  /** [[profEmbeddingStats]] over an explicit (vec_id, embedding) frame
    * — the spec plants a constant (collapsed) dimension, a dead-zero
    * dimension, and a hand-computable spread, and asserts partition
    * invariance of the exact-sum path. */
  private[graft] def embeddingStatsOn(embRaw: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val md = col("m").cast(dec)
    val nDec = col("n").cast(dec)
    val nd = col("n").cast("double")
    val mean = col("s1").cast("double") / nd / lit(1000000.0)
    val varSamp = ((nDec * col("s2") - col("s1") * col("s1")).cast("double")
      / (nDec * (nDec - lit(1).cast(dec))).cast("double")) / lit(1.0e12)
    val stddev = Tables.round6(sqrt(varSamp))
    embRaw
      .select(posexplode(col("embedding").cast("array<double>"))
        .as(Seq("dim", "x")))
      .select(col("dim"),
        floor(col("x") * lit(1000000.0) + lit(0.5)).cast("long").as("m"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(md).as("s1"), sum(md * md).as("s2"),
        min(col("m")).as("mn"), max(col("m")).as("mx"),
        count(when(col("m") === 0, 1)).as("n_zero"))
      .select(col("dim"), col("n"),
        Tables.round6(mean).as("mean"),
        stddev.as("stddev"),
        (col("mn").cast("double") / lit(1000000.0)).as("min_val"),
        (col("mx").cast("double") / lit(1000000.0)).as("max_val"),
        Tables.round6(col("n_zero").cast("double") / nd).as("zero_frac"),
        (stddev < lit(0.001)).cast("int").as("is_collapsed"))
      .orderBy(col("dim"))
  }

  /** Symmetric int8 quantization of the embedding column — the storage
    * path for large vector corpora (4× smaller than float32, 8× smaller
    * than the double working form). Per-vector scale = max|x|;
    * q = floor(x/scale·127 + .5); reported per vector: the scale, the
    * dequantization error (max-abs and MSE) and the cosine between the
    * original and dequantized vector. Pure element-wise HOF arithmetic,
    * bit-replayed by the oracle. */
  val simQuantizeInt8: Q = (spark, dir) => {
    val v = col("embedding").cast("array<double>")
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), v.as("v"))
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))))
    val dq = transform(col("v"),
      x => floor(x / col("scale") * lit(127.0) + lit(0.5)) * col("scale") / lit(127.0))
    val withDq = emb.withColumn("dq", dq)
      .withColumn("err", zip_with(col("v"), col("dq"), (a, b) => a - b))
    withDq.select(
        col("vec_id"),
        Tables.round6(col("scale")).as("scale"),
        Tables.round6(array_max(transform(col("err"), e => abs(e))))
          .as("max_abs_err"),
        Tables.round6(
          aggregate(col("err"), lit(0.0), (acc, e) => acc + e * e) / size(col("v")))
          .as("mse"),
        Tables.round6(dot(col("v"), col("dq")) /
          (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("dq"), col("dq")))))
          .as("cos_orig_dq"))
      .orderBy(col("vec_id"))
  }

  /** Two-stage retrieval: coarse top-30 on the int8-quantized
    * (dequantized) vectors, exact full-precision cosine rerank for the
    * final top-k — the production retrieval shape: at 100 TB the coarse
    * stage scans only the quantized bytes (4-8× less IO than float64)
    * and full vectors are touched for ≤ 30 candidates per query. Both
    * stages are deterministic arithmetic (the [[simQuantizeInt8]]
    * quantizer + round6 + explicit tie-breaks), so the ENTIRE two-stage
    * pipeline is oracled — including the approximation. */
  val simKnnRerank: Q = (spark, dir) => {
    graft.functions.VectorExpressions.register(spark)
    import graft.functions.VectorExpressions.cosine_similarity
    val coarseK = 30
    val v = col("embedding").cast("array<double>")
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), v.as("v"))
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))))
      .withColumn("dq", transform(col("v"),
        x => floor(x / col("scale") * lit(127.0) + lit(0.5)) * col("scale") / lit(127.0)))
    // limit = provable BNLJ build bound (see simKnnBrute)
    val qry = base.where(col("vec_id") < NQueries).limit(NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("dq").as("qdq"))
    val coarse = base.join(broadcast(qry), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"), col("v"),
        Tables.round6(cosine_similarity(col("dq"), col("qdq"))).as("csim"))
    val wC = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("vec_id"))
    val cand = coarse.withColumn("crank", row_number().over(wC))
      .where(col("crank") <= coarseK)
    val exact = cand
      .join(broadcast(qry.select(col("query_id"), col("qv"))), Seq("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        Tables.round6(cosine_similarity(col("v"), col("qv"))).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Subspace count for product quantization: d=64 splits into 8
    * subvectors of 8 dims — each encoded independently against its own
    * codebook, so a vector stores m=8 small codes (8 bytes) instead of
    * 64 doubles (512 bytes): the 64× compression PQ exists for. */
  val PqSubspaces = 8

  /** Centroids per subspace codebook. Production PQ uses 256 (one
    * byte per code); 64 here keeps the literal argmin expression
    * proportionate to the 500-vector fixture (at which 256 would be
    * half the corpus) — the plan is IDENTICAL at any k, only the
    * literal array is longer. */
  val PqCodebookK = 64

  /** PQ shortlist width before exact re-rank (see [[simKnnPq]]). */
  val PqShortlist = 50

  /** Product-quantization ANN (the remaining classic ANN family next
    * to LSH/IVF/int8-rerank): per-subspace codebooks, each corpus
    * vector encoded as m=[[PqSubspaces]] centroid codes, queries
    * scored by ADC — asymmetric distance computation — against the PQ
    * RECONSTRUCTION (the concatenation of each subspace's chosen
    * centroid), then the [[PqShortlist]]-wide shortlist re-ranked with
    * exact cosine (compressed-scan shortlist + exact re-rank: the
    * production PQ serving shape; pure-PQ ordering on this
    * near-uniform fixture ranks at ~0.1 recall — compression distortion
    * dominates when neighbors are barely closer than noise — while the
    * re-ranked form measures 0.82, spec floor 0.7). Codebooks are
    * seeded from a deterministic hash-ordered corpus sample (k sample
    * subvectors per subspace — replayable where production would
    * k-means offline; the plumbing is identical).
    *
    * Scale shape: codebooks are bounded (m × k × subDim) and inlined
    * as LITERALS, so encoding is a pure map-side projection (argmin
    * over k structs per subspace — no shuffle, no window); at 100 TB
    * the corpus stores ONLY the m byte-codes column, the PQ scan reads
    * codes not vectors, the 5-row query set broadcasts, and the exact
    * re-rank touches [[PqShortlist]] vectors per query fetched by an
    * equi-join on vec_id. FULLY oracled: both engines score
    * cos(q, reconstruction) as ONE 64-element sequential-left-fold dot
    * product over the flattened centroid concatenation, so every float
    * bit matches through both ranking stages.
    *
    * Determinism: per-subspace argmin breaks distance ties by centroid
    * id ascending (struct array_min); shortlist by (pq_sim desc,
    * vec_id asc) after round6; final rank by (cos_sim desc, vec_id). */
  val simKnnPq: Q = (spark, dir) => {
    import graft.functions.VectorExpressions.dot_product
    val emb = withNorm(Tables.embeddings(spark, dir), "embedding")
      .select(col("vec_id"), col("label"), col("vec"), col("norm"))
    val decoded = pqDecodedOn(emb)
    // limit = provable BNLJ build bound (see simKnnBrute)
    val queries = emb.where(col("vec_id") < NQueries).limit(NQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"),
        col("norm").as("qnorm"))
    val pqScored = decoded.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Tables.round6(dot_product(col("qvec"), col("rv")) /
          (col("qnorm") * col("rnorm"))).as("pq_sim"))
    val wPq = Window.partitionBy(col("query_id"))
      .orderBy(col("pq_sim").desc, col("vec_id"))
    val shortlist = pqScored.withColumn("crank", row_number().over(wPq))
      .where(col("crank") <= PqShortlist)
      .select(col("query_id"), col("vec_id"))
    // exact re-rank: fetch the shortlist's true vectors (5×50 rows) by
    // equi-join and score exact cosine
    val exact = shortlist
      .join(emb, Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        Tables.round6(dot_product(col("vec"), col("qvec")) /
          (col("norm") * col("qnorm"))).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** PQ-decoded corpus — every vector's codeword reconstruction `rv`
    * and its norm `rnorm` (plus vec_id/label), built from the
    * deterministic hash-ordered codebook sample. Shared by
    * [[simKnnPq]] and [[simKnnIvfPq]].
    *
    * Every dot here is the codegen'd DotProduct expression, NOT the
    * zip_with+aggregate HOF: ArrayAggregate is CodegenFallback, and
    * the encode evaluates 8×64 sub-vector dots PER ROW — interpreted,
    * that was 5.4 s steady-state at sf0.1 (BenchOne); the tight-loop
    * expression computes the identical left-fold, bit-for-bit. */
  private def pqDecodedOn(emb: DataFrame): DataFrame = {
    import graft.functions.VectorExpressions.dot_product
    val d = vecDim(emb)
    require(d % PqSubspaces == 0,
      s"dim $d must split evenly into $PqSubspaces subspaces")
    val subDim = d / PqSubspaces
    // codebook seeds: the first PqCodebookK corpus vectors in
    // replayable integer-hash order (same Knuth multiplier rule the
    // samplers use) — bounded, collected once, inlined as literals
    val sampled: Array[Seq[Double]] = emb
      .orderBy((col("vec_id") * lit(2654435761L)) % lit(4294967296L),
        col("vec_id"))
      .limit(PqCodebookK)
      .select(col("vec"))
      .collect().map(_.getSeq[Double](0))
    val k = sampled.length
    // cbVecs(s)(j): subspace s of sample j; the per-centroid squared
    // norm folds inside PqEncode with the same ascending accumulation
    // order the engines use for list_dot_product
    val cbVecs = Array.tabulate(PqSubspaces, k)((s, j) =>
      sampled(j).slice(s * subDim, (s + 1) * subDim))
    // encode: per subspace, argmin_{centroid} ‖sub − c‖² with ties to
    // the lower code id — dist² = sn2 − 2·⟨sub,c⟩ + cn2, each term a
    // left-fold dot, so the float profile replays in SQL. All 8 codes
    // come from ONE PqEncode expression: the composed
    // array_min(array(512 × struct)) form exceeded Janino's 64 KB
    // method limit, silently disabling whole-stage codegen for the
    // stage (5.4 s → 0.9 s steady-state at sf0.1, BenchOne;
    // VectorExpressions documents the bit-identical float contract)
    val cbFlat: Seq[Seq[Double]] =
      (0 until PqSubspaces).flatMap(s => (0 until k).map(j => cbVecs(s)(j).toSeq))
    val codes = graft.functions.VectorExpressions.pq_encode(
      col("vec"), typedLit(cbFlat), lit(PqSubspaces))
    val encoded = emb
      .select(col("vec_id"), col("label"), codes.as("codes"))
      .select(
        (Seq(col("vec_id"), col("label")) ++
          (0 until PqSubspaces).map(s =>
            element_at(col("codes"), s + 1).as(s"code_$s"))): _*)
    // reconstruction: concatenate each subspace's chosen centroid —
    // the decoded codeword ADC scores against
    val recon = concat((0 until PqSubspaces).map { s =>
      element_at(typedLit(cbVecs(s).toSeq), col(s"code_$s") + 1)
    }: _*)
    // decode BEFORE the query fan-out: the reconstruction concat and its
    // norm depend only on the codes, so they are computed once per corpus
    // vector, not once per vector × query pair — decode cost stays flat
    // as |queries| grows (measured neutral at NQueries=5/sf0.1, where the
    // 8×64-centroid ENCODE scan dominates; the fan-out independence is
    // what matters at serving query rates)
    encoded
      .withColumn("rv", recon)
      .withColumn("rnorm", sqrt(dot_product(col("rv"), col("rv"))))
  }

  /** `sim_knn_ivfpq`: the composed IVF×PQ index — THE production
    * billion-scale ANN layout (Jégou et al. 2011's IVFADC): the IVF
    * coarse quantizer restricts each query to its probed clusters'
    * posting lists, PQ ADC ranks those candidates from 8-byte codes
    * without touching a float vector, and only the
    * [[PqShortlist]]-wide shortlist pays an exact-cosine re-rank.
    * Pure composition of the two proven stages — [[ivfCandidateFrame]]
    * (mass-targeted adaptive probes) scored by [[pqDecodedOn]]'s
    * reconstructions instead of exact cosine.
    *
    * Scale shape: at 100 TB the corpus is partitioned by assigned
    * cluster and stores only codes in the scan path (the IVF posting +
    * PQ compression multiply: probes cut candidates ~mass-target×,
    * codes cut bytes 64×); full vectors are fetched by equi-join for
    * ≤ shortlist × queries rows. FULLY oracled — the probe selection,
    * the ADC scores, and both rankings replay bit-for-bit in DuckDB
    * (the sim_knn_ivf and sim_knn_pq replay rules composed). */
  val simKnnIvfPq: Q = (spark, dir) => {
    import graft.functions.VectorExpressions.dot_product
    val emb = withNorm(Tables.embeddings(spark, dir), "embedding")
      .select(col("vec_id"), col("label"), col("vec"), col("norm"))
    val decoded = pqDecodedOn(emb).select(col("vec_id"), col("rv"), col("rnorm"))
    val cand = ivfCandidateFrame(spark, dir, Right((MassTargetBp, MaxProbe)))
      .select(col("query_id"), col("qvec"), col("qnorm"), col("vec_id"))
    val adc = cand.join(decoded, Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        Tables.round6(dot_product(col("qvec"), col("rv")) /
          (col("qnorm") * col("rnorm"))).as("pq_sim"))
    val wPq = Window.partitionBy(col("query_id"))
      .orderBy(col("pq_sim").desc, col("vec_id"))
    val shortlist = adc.withColumn("crank", row_number().over(wPq))
      .where(col("crank") <= PqShortlist)
      .select(col("query_id"), col("vec_id"))
    val queries = emb.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"),
        col("norm").as("qnorm"))
    val exact = shortlist
      .join(emb, Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        Tables.round6(dot_product(col("vec"), col("qvec")) /
          (col("norm") * col("qnorm"))).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    exact.withColumn("rank", row_number().over(w))
      .where(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Delta-batch boundary for [[simIndexUpsert]]: vec_id ≥ 90% of the
    * corpus plays the freshly-arrived batch (deterministic, so the
    * oracle replays the split). */
  val UpsertDeltaPct = 90

  /** `sim_index_upsert`: incremental ANN-index maintenance — the
    * dataflow that keeps an IVF index SERVING while the corpus grows:
    * the newest batch (top decile of vec_id here; in production the
    * day's arrivals) is assigned with the EXISTING index's codebook —
    * centroids built from the base corpus only, the crucial
    * discipline: re-deriving centroids per batch would silently
    * reshuffle old postings and invalidate every stored assignment —
    * and the per-cluster posting-list counts update by addition.
    * Emits the catalog row per cluster: base postings, added postings,
    * new total, and the growth share. The posting counts are exactly
    * the adaptive probe rule's mass metadata (sim_knn_ivf), so this
    * IS that query's catalog-maintenance step.
    *
    * Scale: assignment is the same map-side literal-codebook argmax as
    * [[simKnnIvf]] (zero shuffle); counts are a |clusters|-row hash
    * aggregate. A 100 TB index absorbs a batch by scanning ONLY the
    * batch — made literal in round 11: the registered query serves
    * the codebook AND base posting counts from the persisted
    * [[ivfCatalogStore]], so the serving plan's one corpus scan is
    * the delta assignment (plan-asserted). FULLY oracled: base-only
    * codebook, both assignments, and the count algebra replay in
    * DuckDB — unaffected by which path supplies the catalog, since
    * the persisted doubles/longs round-trip bit-exactly. */
  val simIndexUpsert: Q = (spark, dir) =>
    indexUpsertOfCatalog(Tables.embeddings(spark, dir),
      ivfCatalogStore(spark, dir))

  /** The IVF index CATALOG (coarse codebook + posting-list lengths) as
    * a maintained artifact — round 11 makes the "absorbs a batch by
    * scanning ONLY the batch" claim literal: the base corpus's
    * centroids AND per-cluster posting counts persist once per index
    * version ((cluster, cvec, n_base, cut) rows, zero-count clusters
    * kept so the codebook is complete), and the serving path reads
    * them back instead of re-deriving from a base scan. The CUT (the
    * base/delta vec_id boundary) is persisted explicitly (round-11
    * advice: reconstructing it as Σ n_base equals the count-based cut
    * only when vec_ids are dense from 0 — with gapped or 1-based ids
    * the catalog-served split would silently shift relative to the
    * fresh derivation and the oracle). Doubles round-trip
    * parquet bit-exactly, counts are longs — the served upsert is
    * bit-identical to the fresh derivation (spec-pinned; oracle
    * replay unaffected). */
  private[graft] def ivfCatalogStore(spark: SparkSession,
      dir: String): DataFrame =
    ArtifactStore.cached(spark,
      ArtifactStore.pathFor("ivf_catalog", dir, "embeddings.parquet",
        s"labelmeans_base${UpsertDeltaPct}_cut")) {
      val embRaw = Tables.embeddings(spark, dir)
      val cutDf = embRaw.agg(
        expr(s"(count(1) * $UpsertDeltaPct) div 100").as("cut"))
      val base = embRaw.crossJoin(broadcast(cutDf))
        .where(col("vec_id") < col("cut")).drop("cut")
      val centroids = centroidCodebookOf(base)
      val counts = withNorm(base, "embedding")
        .select(col("vec_id"), col("vec"), col("norm"))
        .withColumn("best",
          array_max(centroidScoresFor(centroids, col("vec"), col("norm"))))
        .select((-col("best.neg_cluster")).as("cluster"))
        .groupBy(col("cluster")).agg(count(lit(1)).as("n_base"))
      import spark.implicits._
      centroids.map { case (c, v, _) => (c, v) }.toSeq
        .toDF("cluster", "cvec")
        .join(counts, Seq("cluster"), "left")
        .crossJoin(broadcast(cutDf))
        .select(col("cluster"), col("cvec"),
          coalesce(col("n_base"), lit(0L)).as("n_base"), col("cut"))
    }

  /** [[simIndexUpsert]] serving from the persisted catalog: the
    * codebook and base posting counts are catalog reads, the
    * delta-batch boundary is the PERSISTED cut (a 1-row catalog
    * aggregate over the constant cut column — round-11 advice: the
    * previous Σ n_base reconstruction was only id-density-correct),
    * and the ONLY corpus scan in the plan is the delta assignment
    * (plan-asserted in ArtifactStoreSpec). Base posting counts
    * restrict to n_base > 0 so the output row set is identical to the
    * fresh derivation's full-join semantics. */
  private[graft] def indexUpsertOfCatalog(embRaw: DataFrame,
      catalog: DataFrame): DataFrame = {
    val centroids = catalog.select(col("cluster"), col("cvec"))
      .collect() // |clusters| rows — catalog metadata, the codebook discipline
      .map { r =>
        val cv = r.getSeq[Double](1)
        // same left-fold accumulation order as centroidCodebookOf
        (r.getAs[Number](0).intValue, cv,
          math.sqrt(cv.foldLeft(0.0)((acc, x) => acc + x * x)))
      }.sortBy(_._1)
    val cutDf = catalog.agg(max(col("cut")).as("cut"))
    val delta = embRaw.crossJoin(broadcast(cutDf))
      .where(col("vec_id") >= col("cut")).drop("cut")
    val deltaCounts = withNorm(delta, "embedding")
      .select(col("vec_id"), col("vec"), col("norm"))
      .withColumn("best",
        array_max(centroidScoresFor(centroids, col("vec"), col("norm"))))
      .select((-col("best.neg_cluster")).as("cluster"))
      .groupBy(col("cluster")).agg(count(lit(1)).as("n_added"))
    val baseCounts = catalog.where(col("n_base") > 0)
      .select(col("cluster"), col("n_base"))
    baseCounts.join(deltaCounts, Seq("cluster"), "full")
      .select(col("cluster"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_added"), lit(0L)).as("n_added"))
      .withColumn("n_total", col("n_base") + col("n_added"))
      .withColumn("growth_pct",
        Tables.round6(col("n_added").cast("double") / col("n_total")))
      .orderBy(col("cluster"))
  }

  /** [[simIndexUpsert]] over an explicit (vec_id, embedding, label)
    * frame — the spec plants a delta vector nearest to a base centroid
    * and asserts it lands there without moving any base posting. */
  private[graft] def indexUpsertOn(embRaw: DataFrame): DataFrame = {
    // base/delta cut derived RELATIONALLY (the oracle's tot/cut CTEs):
    // a 1-row count aggregate broadcast into the split predicates, so
    // building this query stays lazy — the earlier eager .count() here
    // made a mere explain() trigger a full corpus scan job. (The one
    // construction-time action left in this family is the codebook
    // collect — bounded catalog metadata by the codebook discipline.)
    val cutDf = embRaw.agg(
      expr(s"(count(1) * $UpsertDeltaPct) div 100").as("cut"))
    val base = embRaw.crossJoin(broadcast(cutDf))
      .where(col("vec_id") < col("cut")).drop("cut")
    val delta = embRaw.crossJoin(broadcast(cutDf))
      .where(col("vec_id") >= col("cut")).drop("cut")
    // codebook from the BASE only — the existing index's quantizer
    val centroids = centroidCodebookOf(base)
    def assigned(part: DataFrame): DataFrame =
      withNorm(part, "embedding")
        .select(col("vec_id"), col("vec"), col("norm"))
        .withColumn("best",
          array_max(centroidScoresFor(centroids, col("vec"), col("norm"))))
        .select(col("vec_id"), (-col("best.neg_cluster")).as("cluster"))
    val baseCounts = assigned(base).groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_base"))
    val deltaCounts = assigned(delta).groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_added"))
    baseCounts.join(deltaCounts, Seq("cluster"), "full")
      .select(col("cluster"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_added"), lit(0L)).as("n_added"))
      .withColumn("n_total", col("n_base") + col("n_added"))
      .withColumn("growth_pct",
        Tables.round6(col("n_added").cast("double") / col("n_total")))
      .orderBy(col("cluster"))
  }

  /** Centroid aggregation per label — the IVF coarse-quantizer step
    * (element-wise mean of vectors via posexplode + group). Exactness:
    * per-dimension sums of doubles are shuffled — kept deterministic by
    * scaling each component to integer micro-units before summing (the
    * integral sum is exact and add-order-independent), and the
    * micro-units stay integral THROUGH the cross-dimension total: the
    * earlier form summed 64 already-divided doubles, whose
    * order-dependent ulps landed a round6 argument exactly on a .5
    * boundary at sf0.001 (1e-6 oracle flicker, caught by a
    * different-SF gate run); the integral total makes the two final
    * divisions the only float ops, bit-identical in both engines at
    * any SF. */
  val simLabelCentroids: Q = (spark, dir) => {
    val e = Tables.embeddings(spark, dir)
      .select(col("label"), col("vec_id"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim", "x")))
    // order-independent exact sum: scale to integer micro-units
    e.groupBy(col("label"), col("dim"))
      .agg(sum(floor(col("x") * 1000000.0 + 0.5)).as("s_micro"),
        count(lit(1)).as("n_vecs"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_dims"),
        sum(col("s_micro")).as("total_micro"),
        max(col("n_vecs")).as("n_vecs")) // identical across dims
      .select(col("label"), col("n_dims"),
        Tables.round6(col("total_micro") / lit(1000000.0) / col("n_vecs"))
          .as("centroid_sum"))
      .orderBy(col("label"))
  }

  /** `sim_kmeans_iter`: ONE Lloyd iteration over the embedding corpus
    * — the clustering primitive the semantic-dedup / curriculum /
    * mixture pipelines run to build their cluster structure (SemDeDup
    * §3 runs exactly this loop to convergence). Init = the label
    * means (the IVF coarse codebook, [[simLabelCentroids]]' aggregate);
    * assignment = the PROVEN replayable argmax (cosine desc, cluster
    * asc — the sim_knn_ivf / sim_index_upsert machinery); update =
    * per-dim micro-unit means. Emits per surviving cluster:
    * n_members, the new centroid's component sum, and the L1 centroid
    * shift — the convergence statistic a driver loop tests.
    *
    * Exactness: both centroid generations live as EXACT integer
    * micro-sums; the shift Σ_d |new_d − old_d| is computed from the
    * integer numerators |s_n·n_o − s_o·n_n| (longs, overflow-safe at
    * corpus scale: ≤ n·m·10^6 per dim) with ONE division by
    * (10^6·n·m) at the end — add-order-invariant, bit-replayable in
    * DuckDB. Scale: one codebook collect (catalog discipline), one
    * vector scan for assignment, per-dim hash aggregates — vectors
    * shuffle once on the cluster key; the loop this iterates is
    * bounded by k·dims per round, corpus-independent state. */
  val simKmeansIter: Q = (spark, dir) =>
    kmeansIterOn(Tables.embeddings(spark, dir))

  /** [[simKmeansIter]] over an explicit (vec_id, embedding, label)
    * frame — the spec plants a mislabeled vector that must flip
    * cluster in one iteration, moving both centroids. */
  private[graft] def kmeansIterOn(embRaw: DataFrame): DataFrame = {
    val centroids = centroidCodebookOf(embRaw)
    val assigned = withNorm(embRaw, "embedding")
      .select(col("vec_id"), col("vec"), col("norm"))
      .withColumn("best",
        array_max(centroidScoresFor(centroids, col("vec"), col("norm"))))
      .select(col("vec_id"), col("vec"),
        (-col("best.neg_cluster")).as("cluster"))
    val nd = assigned
      .select(col("cluster"), posexplode(col("vec")).as(Seq("dim", "x")))
      .groupBy(col("cluster"), col("dim"))
      .agg(sum(floor(col("x") * 1000000.0 + 0.5)).as("s_n"),
        count(lit(1)).as("n_n"))
    val od = embRaw
      .select(col("label").as("cluster"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim", "x")))
      .groupBy(col("cluster"), col("dim"))
      .agg(sum(floor(col("x") * 1000000.0 + 0.5)).as("s_o"),
        count(lit(1)).as("n_o"))
    nd.join(od, Seq("cluster", "dim"))
      .groupBy(col("cluster"))
      .agg(max(col("n_n")).as("n_members"),
        Tables.round6(sum(col("s_n")) / lit(1000000.0) / max(col("n_n")))
          .as("centroid_sum"),
        Tables.round6(
          sum(abs(col("s_n") * col("n_o") - col("s_o") * col("n_n")))
            / (lit(1000000.0) * max(col("n_n")) * max(col("n_o"))))
          .as("shift_l1"))
      .orderBy(col("cluster"))
  }

  /** `sim_kmeans_train`: Lloyd's loop to convergence — the full
    * k-means training [[simKmeansIter]] is one step of, run until the
    * L1 centroid shift drops under tolerance or the iteration budget
    * is spent. Emits the converged per-cluster summary plus the
    * iteration count and final shift (the numbers a pipeline logs per
    * clustering job).
    *
    * Scale: the corpus is scanned once per iteration (assignment +
    * per-dim micro-mean aggregate); everything collected is the
    * k·dims codebook (catalog metadata, the BPE/codebook discipline),
    * so driver state is corpus-independent and the loop count bounds
    * total work. Determinism: the argmax tie-break and integer
    * micro-unit means make every iteration partition-invariant, so
    * the trajectory — not just the fixed point — is reproducible.
    * Rows-only BY CONTRACT (the iterative loop has no SQL replay —
    * the BPE-training category), anchored by the fully-oracled
    * [[simKmeansIter]] and a planted-clusters convergence spec. */
  val simKmeansTrain: Q = (spark, dir) =>
    kmeansTrainOn(Tables.embeddings(spark, dir), maxIter = 5, tolL1 = 1e-4)

  /** Converged training outcome of [[kmeansFitOn]]: the final codebook
    * (with norms — ready for [[centroidScoresFor]]), per-cluster
    * membership stats, iterations run, and the last L1 shift. */
  private[graft] final case class KmeansFit(
      codebook: Array[(Int, Seq[Double], Double)],
      members: Array[(Int, Seq[Double], Long)],
      nIter: Int, finalShift: Double)

  /** Lloyd's loop to convergence — the core [[simKmeansTrain]] reports
    * on and [[trainedCodebook]] persists.
    *
    * The normalized vector frame is `persist()`ed for the duration of
    * the loop and unpersisted after (round-11 advice: each iteration
    * re-scanned the un-cached projection — correct, but on a real
    * cluster you pin the loop's working set; the codebook collected
    * per iteration stays k·dims catalog metadata either way).
    *
    * A cluster that loses every member VANISHES from the new
    * generation; such an iteration counts as an INFINITE shift
    * (round-11 advice: summing movement only over surviving clusters
    * let a discontinuous codebook change read as "converged" when the
    * survivors happened to sit still). The loop therefore always runs
    * at least one more iteration after a vanish, and a final_shift of
    * Infinity in the output makes an at-budget vanish visible instead
    * of silent; convergence at the REDUCED k is then an honest
    * fixed-point of the surviving clusters. */
  private[graft] def kmeansFitOn(embRaw: DataFrame, maxIter: Int,
      tolL1: Double): KmeansFit = {
    val emb = withNorm(embRaw, "embedding")
      .select(col("vec_id"), col("vec"), col("norm"))
      .persist() // pinned for the Lloyd loop; released below
    def assignedWith(cb: Array[(Int, Seq[Double], Double)]): DataFrame =
      emb.withColumn("best", array_max(centroidScoresFor(cb, col("vec"), col("norm"))))
        .select(col("vec_id"), col("vec"), (-col("best.neg_cluster")).as("cluster"))
    def meansOf(assigned: DataFrame): Array[(Int, Seq[Double], Long)] =
      assigned
        .select(col("cluster"), posexplode(col("vec")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg(sum(floor(col("x") * 1000000.0 + 0.5)).as("s"),
          count(lit(1)).as("n"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("dim"),
            (col("s") / 1000000.0 / col("n")).as("cx")))), e => e("cx"))
          .as("cvec"), max(col("n")).as("n"))
        .collect() // k·dims codebook — catalog metadata
        .map(r => (r.getAs[Number](0).intValue, r.getSeq[Double](1),
          r.getLong(2)))
        .sortBy(_._1)
    try {
      var cb = centroidCodebookOf(embRaw)
      var iter = 0
      var shift = Double.MaxValue
      var members: Array[(Int, Seq[Double], Long)] = Array.empty
      while (iter < maxIter && shift > tolL1) {
        val nm = meansOf(assignedWith(cb))
        val old = cb.map(c => c._1 -> c._2).toMap
        val vanished = old.keySet -- nm.iterator.map(_._1).toSet
        shift =
          if (vanished.nonEmpty) Double.PositiveInfinity
          else nm.iterator.map { case (c, v, _) =>
            old.get(c).map(o => v.zip(o).map { case (a, b) =>
              math.abs(a - b) }.sum).getOrElse(0.0)
          }.sum
        members = nm
        cb = nm.map { case (c, v, _) =>
          (c, v, math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x)))
        }
        iter += 1
      }
      KmeansFit(cb, members, iter, shift)
    } finally emb.unpersist()
  }

  /** [[simKmeansTrain]] over an explicit frame with injectable
    * iteration budget / tolerance — the spec plants separable
    * clusters under adversarial labels and asserts convergence to the
    * ideal partition with shift exactly 0, plus a vanishing-cluster
    * fixture that must NOT read as converged in the vanish
    * iteration. */
  private[graft] def kmeansTrainOn(embRaw: DataFrame, maxIter: Int,
      tolL1: Double): DataFrame = {
    val spark = embRaw.sparkSession
    val fit = kmeansFitOn(embRaw, maxIter, tolL1)
    import spark.implicits._
    fit.members.map { case (c, v, n) =>
      (c, n, Tables.round6Val(v.sum), fit.nIter.toLong,
        Tables.round6Val(fit.finalShift))
    }.toSeq.toDF("cluster", "n_members", "centroid_sum", "n_iter",
      "final_shift").orderBy(col("cluster"))
  }

  /** The CONVERGED k-means codebook as a corpus artifact — round 11's
    * "train → index → assign" production loop closed: until now
    * sim_kmeans_train's output went nowhere; this persists the
    * converged (cluster, cvec) rows through [[graft.ArtifactStore]]
    * (corpus-fingerprinted, pruned, ablation kill-switch) so index
    * consumers quantize against TRAINED centroids instead of label
    * means. The store variant embeds the training parameters (the
    * components-key discipline); norms are recomputed on load with
    * the same ascending fold every call site uses — bit-identical to
    * the fresh fit's. Training is deterministic end to end (micro-
    * unit means, tie-broken argmax), so the loaded codebook equals
    * the in-memory one row-for-row (spec-pinned). */
  private[graft] def trainedCodebookDf(spark: SparkSession,
      dir: String): DataFrame =
    ArtifactStore.cached(spark,
      ArtifactStore.pathFor("kmeans_codebook", dir, "embeddings.parquet",
        "lloyd_i5_tol1em4_v1")) {
      import spark.implicits._
      kmeansFitOn(Tables.embeddings(spark, dir), maxIter = 5, tolL1 = 1e-4)
        .codebook.map { case (c, v, _) => (c, v) }.toSeq
        .toDF("cluster", "cvec")
    }

  private[graft] def trainedCodebook(spark: SparkSession,
      dir: String): Array[(Int, Seq[Double], Double)] =
    trainedCodebookDf(spark, dir)
      .collect() // k·dims codebook — catalog metadata
      .map { r =>
      val cv = r.getSeq[Double](1)
      // same left-fold accumulation order as centroidCodebookOf
      (r.getAs[Number](0).intValue, cv,
        math.sqrt(cv.foldLeft(0.0)((acc, x) => acc + x * x)))
    }.sortBy(_._1)

  /** `sim_knn_ivf_trained`: the adaptive IVF retrieval of
    * [[simKnnIvf]] running against the TRAINED codebook artifact —
    * the production loop (train → persist codebook → build index →
    * serve) rather than the label-mean coarse quantizer. Same plan
    * shape: collected codebook inlined as literals, map-side argmax
    * assignment, mass-targeted probes, exact cosine on probed
    * clusters. Rows-only BY CONTRACT (the Lloyd loop upstream has no
    * SQL replay — the sim_kmeans_train category), anchored by the
    * fully-oracled [[simKmeansIter]] step, the ArtifactStore
    * round-trip spec, and the RecallFloorSpec floor (≥ the same 0.9
    * the label-mean IVF must clear on the planted fixture). */
  val simKnnIvfTrained: Q = (spark, dir) =>
    ivfRank(ivfScored(spark, dir, Right((MassTargetBp, MaxProbe)),
      Some(trainedCodebook(spark, dir))))

  /** `pipe_semdedup_trained`: [[pipeSemDedup]] quantizing against the
    * TRAINED codebook artifact instead of label means — the other
    * consumer of the round-11 train → index → serve loop (SemDeDup's
    * published form clusters with k-means, not labels; the label-mean
    * registered query stays the fully-oracled anchor). Same plan:
    * collected codebook as literals, map-side argmax, one
    * cluster-keyed shuffle, within-cluster dominance. Rows-only BY
    * CONTRACT (Lloyd loop upstream), anchored by the fully-oracled
    * pipe_semdedup + sim_kmeans_iter and the codebook round-trip spec;
    * the planted-duplicate keeper property is re-asserted under the
    * trained quantizer in PipelineSpec. */
  val pipeSemDedupTrained: Q = (spark, dir) =>
    semDedupOfAssigned(semDedupAssignedWith(
      Tables.embeddings(spark, dir), trainedCodebook(spark, dir)))

  def queries: Map[String, Q] = Map(
    "pipe_semdedup_trained" -> pipeSemDedupTrained,
    "sim_kmeans_iter"     -> simKmeansIter,
    "sim_kmeans_train"    -> simKmeansTrain,
    "sim_knn_ivf_trained" -> simKnnIvfTrained,
    "sim_knn_brute"       -> simKnnBrute,
    "sim_knn_native"      -> simKnnNative,
    "sim_knn_lsh"         -> simKnnLsh,
    "sim_knn_ivf"         -> simKnnIvf,
    "sim_knn_pq"          -> simKnnPq,
    "sim_quantize_int8"   -> simQuantizeInt8,
    "sim_label_centroids" -> simLabelCentroids,
    "dedup_embedding_cosine" -> dedupEmbCosine,
    "dedup_embedding_incremental" -> dedupEmbIncremental,
    "sim_knn_rerank"      -> simKnnRerank,
    "pipe_semdedup"       -> pipeSemDedup,
    "prof_embedding_stats" -> profEmbeddingStats,
    "sim_knn_ivfpq"       -> simKnnIvfPq,
    "sim_index_upsert"    -> simIndexUpsert,
  )

  def oracles: Map[String, String] = baseOracles +
    ("sim_knn_native" -> baseOracles("sim_knn_brute")) +
    // Replays the upsert end-to-end: the 90% vec_id split, the
    // BASE-ONLY integer-scaled codebook, both argmax assignments, and
    // the full-outer count merge.
    ("sim_index_upsert" ->
      s"""WITH tot AS (SELECT count(*) AS n FROM embeddings),
         |cut AS (SELECT n * $UpsertDeltaPct // 100 AS c FROM tot),
         |e AS (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                          CAST(embedding AS DOUBLE[]))) AS norm
         |  FROM embeddings),
         |x AS (
         |  SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
         |    generate_subscripts(embedding, 1) - 1 AS dim
         |  FROM embeddings WHERE vec_id < (SELECT c FROM cut)),
         |cm AS (
         |  SELECT label AS cluster, dim,
         |    SUM(floor(x * 1000000.0 + 0.5)) / 1000000.0 / count(*) AS cx
         |  FROM x GROUP BY 1, 2),
         |cb AS (
         |  SELECT cluster, list(cx ORDER BY dim) AS cvec FROM cm GROUP BY 1),
         |cbn AS (
         |  SELECT cluster, cvec, sqrt(list_dot_product(cvec, cvec)) AS cn
         |  FROM cb),
         |cs AS (
         |  SELECT e.vec_id, cbn.cluster,
         |    list_dot_product(e.vec, cbn.cvec) / (e.norm * cbn.cn) AS csim
         |  FROM e CROSS JOIN cbn),
         |assigned AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY csim DESC, cluster) AS rn FROM cs) t
         |  WHERE rn = 1),
         |b AS (
         |  SELECT cluster, count(*) AS n_base FROM assigned
         |  WHERE vec_id < (SELECT c FROM cut) GROUP BY 1),
         |d AS (
         |  SELECT cluster, count(*) AS n_added FROM assigned
         |  WHERE vec_id >= (SELECT c FROM cut) GROUP BY 1)
         |SELECT coalesce(b.cluster, d.cluster) AS cluster,
         |  coalesce(n_base, 0) AS n_base,
         |  coalesce(n_added, 0) AS n_added,
         |  coalesce(n_base, 0) + coalesce(n_added, 0) AS n_total,
         |  floor(CAST(coalesce(n_added, 0) AS DOUBLE)
         |        / (coalesce(n_base, 0) + coalesce(n_added, 0))
         |        * 1000000.0 + 0.5) / 1000000.0 AS growth_pct
         |FROM b FULL OUTER JOIN d ON b.cluster = d.cluster
         |ORDER BY cluster""".stripMargin) +
    // One Lloyd iteration: the sim_index_upsert assignment replay
    // without the cut (codebook = label means over ALL vectors),
    // then per-dim micro-sums of the NEW assignment joined against
    // the OLD label sums; shift from exact integer numerators.
    ("sim_kmeans_iter" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                          CAST(embedding AS DOUBLE[]))) AS norm
         |  FROM embeddings),
         |x AS (
         |  SELECT vec_id, label, unnest(CAST(embedding AS DOUBLE[])) AS x,
         |    generate_subscripts(embedding, 1) - 1 AS dim
         |  FROM embeddings),
         |cm AS (
         |  SELECT label AS cluster, dim,
         |    SUM(floor(x * 1000000.0 + 0.5)) AS s_o, count(*) AS n_o
         |  FROM x GROUP BY 1, 2),
         |cb AS (
         |  SELECT cluster,
         |    list(s_o / 1000000.0 / n_o ORDER BY dim) AS cvec
         |  FROM cm GROUP BY 1),
         |cbn AS (
         |  SELECT cluster, cvec, sqrt(list_dot_product(cvec, cvec)) AS cn
         |  FROM cb),
         |cs AS (
         |  SELECT e.vec_id, cbn.cluster,
         |    list_dot_product(e.vec, cbn.cvec) / (e.norm * cbn.cn) AS csim
         |  FROM e CROSS JOIN cbn),
         |assigned AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY csim DESC, cluster) AS rn FROM cs) t
         |  WHERE rn = 1),
         |nd AS (
         |  SELECT a.cluster, x.dim,
         |    SUM(floor(x.x * 1000000.0 + 0.5)) AS s_n, count(*) AS n_n
         |  FROM assigned a JOIN x ON a.vec_id = x.vec_id
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT nd.cluster, nd.dim, nd.s_n, nd.n_n, cm.s_o, cm.n_o
         |  FROM nd JOIN cm ON nd.cluster = cm.cluster AND nd.dim = cm.dim)
         |SELECT cluster, MAX(n_n) AS n_members,
         |  floor(SUM(s_n) / 1000000.0 / MAX(n_n) * 1000000.0 + 0.5)
         |    / 1000000.0 AS centroid_sum,
         |  floor(SUM(ABS(s_n * n_o - s_o * n_n))
         |      / (1000000.0 * MAX(n_n) * MAX(n_o)) * 1000000.0 + 0.5)
         |    / 1000000.0 AS shift_l1
         |FROM j GROUP BY cluster ORDER BY cluster""".stripMargin) +
    // Exact micro-unit power sums as HUGEINT (≙ Spark Decimal(38,0)),
    // identical variance/mean expression trees cast to DOUBLE at the
    // same points.
    ("prof_embedding_stats" ->
      """WITH x AS (
        |  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
        |    CAST(floor(unnest(CAST(embedding AS DOUBLE[])) * 1000000.0 + 0.5)
        |         AS BIGINT) AS m
        |  FROM embeddings),
        |a AS (
        |  SELECT dim, count(*) AS n,
        |    SUM(CAST(m AS HUGEINT)) AS s1,
        |    SUM(CAST(m AS HUGEINT) * m) AS s2,
        |    min(m) AS mn, max(m) AS mx,
        |    count(CASE WHEN m = 0 THEN 1 END) AS n_zero
        |  FROM x GROUP BY 1),
        |r AS (
        |  SELECT dim, n,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0 AS mean_raw,
        |    floor(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
        |               / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE) / 1.0e12)
        |          * 1000000.0 + 0.5) / 1000000.0 AS stddev,
        |    CAST(mn AS DOUBLE) / 1000000.0 AS min_val,
        |    CAST(mx AS DOUBLE) / 1000000.0 AS max_val,
        |    CAST(n_zero AS DOUBLE) / CAST(n AS DOUBLE) AS zero_frac_raw
        |  FROM a)
        |SELECT dim, n,
        |  floor(mean_raw * 1000000.0 + 0.5) / 1000000.0 AS mean,
        |  stddev, min_val, max_val,
        |  floor(zero_frac_raw * 1000000.0 + 0.5) / 1000000.0 AS zero_frac,
        |  CAST(stddev < 0.001 AS INT) AS is_collapsed
        |FROM r ORDER BY dim""".stripMargin) +
    // Replays SemDeDup end-to-end: the IVF codebook + argmax assignment
    // (identical CTEs to sim_knn_ivf), rounded centroid similarity, the
    // within-cluster τ-pairing, and the pairwise dominance drop rule.
    ("pipe_semdedup" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                          CAST(embedding AS DOUBLE[]))) AS norm
         |  FROM embeddings),
         |x AS (
         |  SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
         |    generate_subscripts(embedding, 1) - 1 AS dim
         |  FROM embeddings),
         |cm AS (
         |  SELECT label AS cluster, dim,
         |    SUM(floor(x * 1000000.0 + 0.5)) / 1000000.0 / count(*) AS cx
         |  FROM x GROUP BY 1, 2),
         |cb AS (
         |  SELECT cluster, list(cx ORDER BY dim) AS cvec FROM cm GROUP BY 1),
         |cbn AS (
         |  SELECT cluster, cvec, sqrt(list_dot_product(cvec, cvec)) AS cn
         |  FROM cb),
         |cs AS (
         |  SELECT e.vec_id, cbn.cluster,
         |    list_dot_product(e.vec, cbn.cvec) / (e.norm * cbn.cn) AS csim
         |  FROM e CROSS JOIN cbn),
         |assigned AS (
         |  SELECT vec_id, cluster,
         |    floor(csim * 1000000.0 + 0.5) / 1000000.0 AS csim_centroid
         |  FROM (
         |    SELECT vec_id, cluster, csim, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY csim DESC, cluster) AS rn
         |    FROM cs) t
         |  WHERE rn = 1),
         |av AS (
         |  SELECT a.vec_id, a.cluster, a.csim_centroid, e.vec, e.norm
         |  FROM assigned a JOIN e USING (vec_id)),
         |dropped AS (
         |  SELECT DISTINCT a.vec_id
         |  FROM av a JOIN av b
         |    ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
         |  WHERE floor((list_dot_product(a.vec, b.vec) / (a.norm * b.norm))
         |          * 1000000.0 + 0.5) / 1000000.0 >= $SemDedupTau
         |    AND (b.csim_centroid < a.csim_centroid
         |         OR (b.csim_centroid = a.csim_centroid
         |             AND b.vec_id < a.vec_id)))
         |SELECT a.vec_id, a.cluster, a.csim_centroid,
         |  CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS is_kept
         |FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
         |ORDER BY a.vec_id""".stripMargin) +
    // Replays the full LSH retrieval: the 4-bit × 16-table hyperplane
    // signatures (same replayable integer weight rule as
    // dedup_embedding_cosine), the (table, sig) candidate join, and the
    // exact-cosine top-k — sequential-left-fold dots keep every float
    // bit-identical across engines.
    ("sim_knn_lsh" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                          CAST(embedding AS DOUBLE[]))) AS norm
         |  FROM embeddings),
         |tb AS (SELECT gt.t AS t, ub.b AS b
         |       FROM generate_series(0, ${NumTables - 1}) gt(t),
         |            unnest(range(0, $SigBits)) ub(b)),
         |proj AS (
         |  SELECT e.vec_id, tb.t, tb.b,
         |    list_dot_product(e.vec,
         |      list_transform(range(0, len(e.vec)),
         |        d -> ((((((tb.t * 1009 + tb.b) * 7919 + d) * ((tb.t * 1009 + tb.b) * 7919 + d)) % 1000000007)
         |               * ((tb.t * 1009 + tb.b) * 7919 + d)) % 1000000007) % 10000 / 10000.0 - 0.5)) AS pr
         |  FROM e, tb),
         |sigs AS (
         |  SELECT vec_id, t AS table_id,
         |    SUM(CASE WHEN pr > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS sig
         |  FROM proj GROUP BY 1, 2),
         |q AS (SELECT vec_id AS query_id, vec AS qvec, norm AS qnorm
         |      FROM e WHERE vec_id < $NQueries),
         |qs AS (SELECT vec_id AS query_id, table_id, sig FROM sigs
         |       WHERE vec_id < $NQueries),
         |cand AS (
         |  SELECT DISTINCT s.vec_id, qs.query_id
         |  FROM sigs s JOIN qs ON s.table_id = qs.table_id AND s.sig = qs.sig
         |  WHERE s.vec_id <> qs.query_id),
         |scored AS (
         |  SELECT c.query_id, c.vec_id, e.label,
         |    floor((list_dot_product(e.vec, q.qvec) / (e.norm * q.qnorm))
         |          * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
         |  FROM cand c JOIN e ON c.vec_id = e.vec_id
         |              JOIN q ON c.query_id = q.query_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, vec_id) AS rank
         |  FROM scored)
         |SELECT query_id, vec_id, label, cos_sim, rank FROM ranked
         |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin) +
    // Replays IVF end-to-end: integer-scaled exact centroid means, the
    // deterministic (csim desc, cluster asc) argmax assignment, the
    // ADAPTIVE mass-targeted probe selection (exact integer stop rule:
    // probe clusters in csim order until covered assigned mass crosses
    // MassTargetBp/10⁴ of the corpus, capped at MaxProbe), and the
    // exact-cosine top-k on probed clusters.
    ("sim_knn_ivf" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                          CAST(embedding AS DOUBLE[]))) AS norm
         |  FROM embeddings),
         |x AS (
         |  SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
         |    generate_subscripts(embedding, 1) - 1 AS dim
         |  FROM embeddings),
         |cm AS (
         |  SELECT label AS cluster, dim,
         |    SUM(floor(x * 1000000.0 + 0.5)) / 1000000.0 / count(*) AS cx
         |  FROM x GROUP BY 1, 2),
         |cb AS (
         |  SELECT cluster, list(cx ORDER BY dim) AS cvec FROM cm GROUP BY 1),
         |cbn AS (
         |  SELECT cluster, cvec,
         |    sqrt(list_dot_product(cvec, cvec)) AS cn
         |  FROM cb),
         |cs AS (
         |  SELECT e.vec_id, cbn.cluster,
         |    list_dot_product(e.vec, cbn.cvec) / (e.norm * cbn.cn) AS csim
         |  FROM e CROSS JOIN cbn),
         |assigned AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY csim DESC, cluster) AS rn FROM cs) t
         |  WHERE rn = 1),
         |sizes AS (
         |  SELECT cluster, count(*) AS csize FROM assigned GROUP BY 1),
         |tot AS (SELECT count(*) AS n FROM e),
         |pr AS (
         |  SELECT vec_id AS query_id, cluster,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY csim DESC, cluster) AS prank
         |  FROM cs WHERE vec_id < $NQueries),
         |prc AS (
         |  SELECT p.query_id, p.cluster, p.prank, s.csize,
         |    SUM(s.csize) OVER (PARTITION BY p.query_id
         |      ORDER BY p.prank) AS cum
         |  FROM pr p JOIN sizes s USING (cluster)),
         |probes AS (
         |  SELECT query_id, cluster FROM prc, tot
         |  WHERE (cum - csize) * 10000 < $MassTargetBp * tot.n
         |    AND prank <= $MaxProbe),
         |q AS (SELECT vec_id AS query_id, vec AS qvec, norm AS qnorm
         |      FROM e WHERE vec_id < $NQueries),
         |scored AS (
         |  SELECT p.query_id, a.vec_id, e.label,
         |    floor((list_dot_product(e.vec, q.qvec) / (e.norm * q.qnorm))
         |          * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
         |  FROM assigned a JOIN probes p ON a.cluster = p.cluster
         |       JOIN e ON a.vec_id = e.vec_id
         |       JOIN q ON p.query_id = q.query_id
         |  WHERE a.vec_id <> p.query_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, vec_id) AS rank
         |  FROM scored)
         |SELECT query_id, vec_id, label, cos_sim, rank FROM ranked
         |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin) +
    // Replays PQ end-to-end: the hash-ordered codebook sample, the
    // (dist² asc, code asc) argmin encoding with dist² = sn2 − 2⟨sub,c⟩
    // + cn2 (every term a left-fold dot), the flattened
    // centroid-concatenation reconstruction, the ADC cosine as ONE
    // 64-element list_dot_product, the shortlist cut, and the exact
    // re-rank — bit-identical to the Spark folds at every stage.
    ("sim_knn_pq" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                          CAST(embedding AS DOUBLE[]))) AS norm
         |  FROM embeddings),
         |dims AS (SELECT len(vec) // $PqSubspaces AS sd FROM e LIMIT 1),
         |sel AS (
         |  SELECT vec, row_number() OVER (
         |      ORDER BY (vec_id * 2654435761) % 4294967296, vec_id) - 1
         |    AS code
         |  FROM e
         |  ORDER BY (vec_id * 2654435761) % 4294967296, vec_id
         |  LIMIT $PqCodebookK),
         |cbn AS (
         |  SELECT sel.code, gs.sub,
         |    list_slice(sel.vec, gs.sub * (SELECT sd FROM dims) + 1,
         |      (gs.sub + 1) * (SELECT sd FROM dims)) AS cvec,
         |    list_dot_product(
         |      list_slice(sel.vec, gs.sub * (SELECT sd FROM dims) + 1,
         |        (gs.sub + 1) * (SELECT sd FROM dims)),
         |      list_slice(sel.vec, gs.sub * (SELECT sd FROM dims) + 1,
         |        (gs.sub + 1) * (SELECT sd FROM dims))) AS cn2
         |  FROM sel, generate_series(0, ${PqSubspaces - 1}) gs(sub)),
         |subv AS (
         |  SELECT e.vec_id, gs.sub,
         |    list_slice(e.vec, gs.sub * (SELECT sd FROM dims) + 1,
         |      (gs.sub + 1) * (SELECT sd FROM dims)) AS sv
         |  FROM e, generate_series(0, ${PqSubspaces - 1}) gs(sub)),
         |dist AS (
         |  SELECT s.vec_id, s.sub, c.code,
         |    list_dot_product(s.sv, s.sv)
         |      - 2.0 * list_dot_product(s.sv, c.cvec) + c.cn2 AS dist2
         |  FROM subv s JOIN cbn c ON s.sub = c.sub),
         |codes AS (
         |  SELECT vec_id, sub, code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
         |      ORDER BY dist2 ASC, code ASC) AS rn FROM dist) t
         |  WHERE rn = 1),
         |recon AS (
         |  SELECT co.vec_id, flatten(list(c.cvec ORDER BY co.sub)) AS rv
         |  FROM codes co JOIN cbn c ON co.sub = c.sub AND co.code = c.code
         |  GROUP BY co.vec_id),
         |q AS (SELECT vec_id AS query_id, vec AS qvec, norm AS qnorm
         |      FROM e WHERE vec_id < $NQueries),
         |pq AS (
         |  SELECT q.query_id, e.vec_id,
         |    floor((list_dot_product(q.qvec, r.rv)
         |           / (q.qnorm * sqrt(list_dot_product(r.rv, r.rv))))
         |          * 1000000.0 + 0.5) / 1000000.0 AS pq_sim
         |  FROM e JOIN recon r ON e.vec_id = r.vec_id CROSS JOIN q
         |  WHERE e.vec_id <> q.query_id),
         |short AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY pq_sim DESC, vec_id) AS crank FROM pq) t
         |  WHERE crank <= $PqShortlist),
         |ex AS (
         |  SELECT s.query_id, s.vec_id, e.label,
         |    floor((list_dot_product(e.vec, q.qvec) / (e.norm * q.qnorm))
         |          * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
         |  FROM short s JOIN e ON s.vec_id = e.vec_id
         |       JOIN q ON s.query_id = q.query_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, vec_id) AS rank
         |  FROM ex)
         |SELECT query_id, vec_id, label, cos_sim, rank FROM ranked
         |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin) +
    // Replays the composed IVF×PQ index: the sim_knn_ivf probe CTEs
    // (codebook icb, assignment, adaptive mass-targeted probes) feeding
    // the sim_knn_pq decode CTEs (codebook pcb, argmin codes, flattened
    // reconstruction), ADC on candidates only, shortlist, exact re-rank.
    ("sim_knn_ivfpq" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                          CAST(embedding AS DOUBLE[]))) AS norm
         |  FROM embeddings),
         |x AS (
         |  SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x,
         |    generate_subscripts(embedding, 1) - 1 AS dim
         |  FROM embeddings),
         |cm AS (
         |  SELECT label AS cluster, dim,
         |    SUM(floor(x * 1000000.0 + 0.5)) / 1000000.0 / count(*) AS cx
         |  FROM x GROUP BY 1, 2),
         |cb AS (
         |  SELECT cluster, list(cx ORDER BY dim) AS cvec FROM cm GROUP BY 1),
         |icb AS (
         |  SELECT cluster, cvec, sqrt(list_dot_product(cvec, cvec)) AS cn
         |  FROM cb),
         |cs AS (
         |  SELECT e.vec_id, icb.cluster,
         |    list_dot_product(e.vec, icb.cvec) / (e.norm * icb.cn) AS csim
         |  FROM e CROSS JOIN icb),
         |assigned AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT vec_id, cluster, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY csim DESC, cluster) AS rn FROM cs) t
         |  WHERE rn = 1),
         |sizes AS (
         |  SELECT cluster, count(*) AS csize FROM assigned GROUP BY 1),
         |tot AS (SELECT count(*) AS n FROM e),
         |pr AS (
         |  SELECT vec_id AS query_id, cluster,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY csim DESC, cluster) AS prank
         |  FROM cs WHERE vec_id < $NQueries),
         |prc AS (
         |  SELECT p.query_id, p.cluster, p.prank, s.csize,
         |    SUM(s.csize) OVER (PARTITION BY p.query_id
         |      ORDER BY p.prank) AS cum
         |  FROM pr p JOIN sizes s USING (cluster)),
         |probes AS (
         |  SELECT query_id, cluster FROM prc, tot
         |  WHERE (cum - csize) * 10000 < $MassTargetBp * tot.n
         |    AND prank <= $MaxProbe),
         |q AS (SELECT vec_id AS query_id, vec AS qvec, norm AS qnorm
         |      FROM e WHERE vec_id < $NQueries),
         |dims AS (SELECT len(vec) // $PqSubspaces AS sd FROM e LIMIT 1),
         |sel AS (
         |  SELECT vec, row_number() OVER (
         |      ORDER BY (vec_id * 2654435761) % 4294967296, vec_id) - 1
         |    AS code
         |  FROM e
         |  ORDER BY (vec_id * 2654435761) % 4294967296, vec_id
         |  LIMIT $PqCodebookK),
         |pcb AS (
         |  SELECT sel.code, gs.sub,
         |    list_slice(sel.vec, gs.sub * (SELECT sd FROM dims) + 1,
         |      (gs.sub + 1) * (SELECT sd FROM dims)) AS cvec,
         |    list_dot_product(
         |      list_slice(sel.vec, gs.sub * (SELECT sd FROM dims) + 1,
         |        (gs.sub + 1) * (SELECT sd FROM dims)),
         |      list_slice(sel.vec, gs.sub * (SELECT sd FROM dims) + 1,
         |        (gs.sub + 1) * (SELECT sd FROM dims))) AS cn2
         |  FROM sel, generate_series(0, ${PqSubspaces - 1}) gs(sub)),
         |subv AS (
         |  SELECT e.vec_id, gs.sub,
         |    list_slice(e.vec, gs.sub * (SELECT sd FROM dims) + 1,
         |      (gs.sub + 1) * (SELECT sd FROM dims)) AS sv
         |  FROM e, generate_series(0, ${PqSubspaces - 1}) gs(sub)),
         |dist AS (
         |  SELECT s.vec_id, s.sub, c.code,
         |    list_dot_product(s.sv, s.sv)
         |      - 2.0 * list_dot_product(s.sv, c.cvec) + c.cn2 AS dist2
         |  FROM subv s JOIN pcb c ON s.sub = c.sub),
         |codes AS (
         |  SELECT vec_id, sub, code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
         |      ORDER BY dist2 ASC, code ASC) AS rn FROM dist) t
         |  WHERE rn = 1),
         |recon AS (
         |  SELECT co.vec_id, flatten(list(c.cvec ORDER BY co.sub)) AS rv
         |  FROM codes co JOIN pcb c ON co.sub = c.sub AND co.code = c.code
         |  GROUP BY co.vec_id),
         |cand AS (
         |  SELECT p.query_id, a.vec_id
         |  FROM assigned a JOIN probes p ON a.cluster = p.cluster
         |  WHERE a.vec_id <> p.query_id),
         |adc AS (
         |  SELECT c.query_id, c.vec_id,
         |    floor((list_dot_product(q.qvec, r.rv)
         |           / (q.qnorm * sqrt(list_dot_product(r.rv, r.rv))))
         |          * 1000000.0 + 0.5) / 1000000.0 AS pq_sim
         |  FROM cand c JOIN recon r ON c.vec_id = r.vec_id
         |       JOIN q ON c.query_id = q.query_id),
         |short AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY pq_sim DESC, vec_id) AS crank FROM adc) t
         |  WHERE crank <= $PqShortlist),
         |ex AS (
         |  SELECT s.query_id, s.vec_id, e.label,
         |    floor((list_dot_product(e.vec, q.qvec) / (e.norm * q.qnorm))
         |          * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
         |  FROM short s JOIN e ON s.vec_id = e.vec_id
         |       JOIN q ON s.query_id = q.query_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, vec_id) AS rank
         |  FROM ex)
         |SELECT query_id, vec_id, label, cos_sim, rank FROM ranked
         |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin) +
    ("sim_knn_rerank" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |s AS (SELECT vec_id, label, v,
         |        list_max(list_transform(v, x -> abs(x))) AS scale FROM e),
         |q0 AS (SELECT vec_id, label, v,
         |        list_transform(v, x -> floor(x / scale * 127.0 + 0.5) * scale / 127.0) AS dq
         |      FROM s),
         |qry AS (SELECT vec_id AS query_id, v AS qv, dq AS qdq FROM q0 WHERE vec_id < $NQueries),
         |coarse AS (
         |  SELECT query_id, c.vec_id, c.label, c.v,
         |    floor((list_dot_product(c.dq, qdq)
         |           / (sqrt(list_dot_product(c.dq, c.dq)) * sqrt(list_dot_product(qdq, qdq))))
         |          * 1000000.0 + 0.5) / 1000000.0 AS csim
         |  FROM q0 c CROSS JOIN qry WHERE c.vec_id <> query_id),
         |cr AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |         ORDER BY csim DESC, vec_id) AS crank FROM coarse),
         |cand AS (SELECT * FROM cr WHERE crank <= 30),
         |ex AS (
         |  SELECT c.query_id, c.vec_id, c.label,
         |    floor((list_dot_product(c.v, q.qv)
         |           / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.qv, q.qv))))
         |          * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
         |  FROM cand c JOIN qry q USING (query_id)),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY cos_sim DESC, vec_id) AS rank FROM ex)
         |SELECT query_id, vec_id, label, cos_sim, rank FROM r WHERE rank <= $K
         |ORDER BY query_id, rank""".stripMargin) ++
    embeddingDedupOracles

  /** Shared DuckDB replay of the random-hyperplane signature postings
    * (`e` → `sigs`) — the common prefix of the dedup_embedding_cosine
    * and dedup_embedding_incremental oracles. Replays the full blocking
    * rule: bits = min k in [4,31] with 4^k ≥ n (exact shift arithmetic,
    * matching sigBitsFor bit-for-bit at any n), weight(t,b,d) =
    * (((s²%P)·s)%P)%10⁴/10⁴ − 0.5 with s=(t·1009+b)·7919+d and P=1e9+7
    * — pure int64 arithmetic, bit-identical to the Spark side. */
  private lazy val EmbSigReplayPrefixSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
       |p AS (SELECT coalesce(min(k), 31) AS bits
       |      FROM range(4, 32) r(k), (SELECT count(*) AS n FROM e) c
       |      WHERE (CAST(1 AS BIGINT) << CAST(2*k AS INT)) >= c.n),
       |tb AS (SELECT gt.t AS t, ub.b AS b
       |       FROM generate_series(0, ${DedupTables - 1}) gt(t), p,
       |            unnest(range(0, p.bits)) ub(b)),
       |proj AS (
       |  SELECT e.vec_id, tb.t, tb.b,
       |    list_dot_product(e.vec,
       |      list_transform(range(0, len(e.vec)),
       |        d -> ((((((tb.t * 1009 + tb.b) * 7919 + d) * ((tb.t * 1009 + tb.b) * 7919 + d)) % 1000000007)
       |               * ((tb.t * 1009 + tb.b) * 7919 + d)) % 1000000007) % 10000 / 10000.0 - 0.5)) AS pr
       |  FROM e, tb),
       |sigs AS (
       |  SELECT vec_id, t AS table_id,
       |    SUM(CASE WHEN pr > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS sig
       |  FROM proj GROUP BY 1, 2)""".stripMargin

  /** [[EmbSigReplayPrefixSql]] without the leading `WITH ` — the form
    * the pipe_admit_full composition renames and splices. */
  private[operators] lazy val EmbSigReplayCtesSql: String =
    EmbSigReplayPrefixSql.stripPrefix("WITH ")

  /** The embedding-admission match CTEs (batch→corpus + in-batch
    * blocked candidates) — shared by the dedup_embedding_incremental
    * oracle and the pipe_admit_full composition. References `sigs`. */
  private[operators] lazy val EmbIncCtesSql: String =
    """cr AS (
      |  SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS match_id,
      |    'corpus' AS match_src
      |  FROM sigs a JOIN sigs b
      |    ON a.table_id = b.table_id AND a.sig = b.sig
      |  WHERE a.vec_id % 5 = 0 AND b.vec_id % 5 <> 0),
      |ib AS (
      |  SELECT DISTINCT b.vec_id AS vec_id, a.vec_id AS match_id,
      |    'batch' AS match_src
      |  FROM sigs a JOIN sigs b
      |    ON a.table_id = b.table_id AND a.sig = b.sig
      |      AND a.vec_id < b.vec_id
      |  WHERE a.vec_id % 5 = 0 AND b.vec_id % 5 = 0),
      |u AS (SELECT * FROM cr UNION ALL SELECT * FROM ib)""".stripMargin

  /** The exact-cosine verify select of the embedding admission —
    * references `u` and `e`. No ORDER BY so it can wrap as a CTE. */
  private[operators] lazy val EmbIncSelectSql: String =
    s"""SELECT vec_id, match_id, match_src, cos_sim FROM (
      |  SELECT u.vec_id, u.match_id, u.match_src,
      |    floor((list_dot_product(ea.vec, eb.vec)
      |           / (sqrt(list_dot_product(ea.vec, ea.vec))
      |              * sqrt(list_dot_product(eb.vec, eb.vec))))
      |          * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
      |  FROM u JOIN e ea ON u.vec_id = ea.vec_id
      |         JOIN e eb ON u.match_id = eb.vec_id) t
      |WHERE cos_sim >= $EmbDupTau""".stripMargin

  private lazy val embeddingDedupOracles: Map[String, String] = Map(
    ("dedup_embedding_cosine" ->
      s"""$EmbSigReplayPrefixSql,
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM sigs a JOIN sigs b
         |    ON a.table_id = b.table_id AND a.sig = b.sig AND a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, cos_sim FROM (
         |  SELECT c.vec_a, c.vec_b,
         |    floor((list_dot_product(ea.vec, eb.vec)
         |           / (sqrt(list_dot_product(ea.vec, ea.vec))
         |              * sqrt(list_dot_product(eb.vec, eb.vec))))
         |          * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
         |  FROM cand c JOIN e ea ON c.vec_a = ea.vec_id
         |              JOIN e eb ON c.vec_b = eb.vec_id) t
         |WHERE cos_sim >= $EmbDupTau ORDER BY vec_a, vec_b""".stripMargin),
    // the dedup_embedding_cosine replay composed with the mod-5
    // base/batch split: batch->corpus blocked candidates + in-batch
    // pairs, exact cosine verify on candidates at the same threshold.
    ("dedup_embedding_incremental" ->
      s"""$EmbSigReplayPrefixSql,
         |$EmbIncCtesSql
         |$EmbIncSelectSql
         |ORDER BY vec_id, match_src, match_id""".stripMargin),
    ("sim_quantize_int8" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (
        |  SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) AS scale
        |  FROM e),
        |q AS (
        |  SELECT vec_id, v, scale,
        |    list_transform(v, x -> floor(x / scale * 127.0 + 0.5) * scale / 127.0) AS dq
        |  FROM s),
        |err AS (
        |  SELECT vec_id, v, scale, dq,
        |    [v[i] - dq[i] FOR i IN range(1, len(v) + 1)] AS e
        |  FROM q)
        |SELECT vec_id,
        |  floor(scale * 1000000.0 + 0.5) / 1000000.0 AS scale,
        |  floor(list_max(list_transform(e, x -> abs(x))) * 1000000.0 + 0.5)
        |    / 1000000.0 AS max_abs_err,
        |  floor((list_sum(list_transform(e, x -> x * x)) / len(v)) * 1000000.0 + 0.5)
        |    / 1000000.0 AS mse,
        |  floor((list_dot_product(v, dq)
        |         / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(dq, dq))))
        |        * 1000000.0 + 0.5) / 1000000.0 AS cos_orig_dq
        |FROM err ORDER BY vec_id""".stripMargin))

  private lazy val baseOracles: Map[String, String] = Map(
    "sim_knn_brute" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                          CAST(embedding AS DOUBLE[]))) AS norm
         |  FROM embeddings),
         |q AS (SELECT vec_id AS query_id, vec AS qvec, norm AS qnorm
         |      FROM e WHERE vec_id < $NQueries),
         |scored AS (
         |  SELECT query_id, vec_id, label,
         |    floor((list_dot_product(vec, qvec) / (norm * qnorm)) * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
         |  FROM e CROSS JOIN q WHERE vec_id <> query_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos_sim DESC, vec_id) AS rank
         |  FROM scored)
         |SELECT query_id, vec_id, label, cos_sim, rank FROM ranked
         |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin,
    "sim_label_centroids" ->
      """WITH x AS (
        |  SELECT label, vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
        |    generate_subscripts(embedding, 1) - 1 AS dim
        |  FROM embeddings),
        |c AS (
        |  SELECT label, dim,
        |    SUM(floor(x * 1000000.0 + 0.5)) AS s_micro,
        |    count(*) AS n_vecs
        |  FROM x GROUP BY 1, 2)
        |SELECT label, count(*) AS n_dims,
        |  floor((SUM(s_micro) / 1000000.0 / MAX(n_vecs)) * 1000000.0 + 0.5)
        |    / 1000000.0 AS centroid_sum
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
