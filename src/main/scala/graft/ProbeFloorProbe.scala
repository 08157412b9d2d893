package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: decomposes the admission probes' corpus-side INDEX-SCAN
  * floor (the r17 verdict's one `weak`: per-family probe cost grows
  * O(index bytes) across ×1→×100 — simhash 0.92→11.4 s) into its
  * parts, per family: the raw posting-store chain scan (noop sink,
  * guide §1.4), the same scan minus payload columns, and the full
  * incremental probe — so an optimization lands on the term that
  * actually costs (decode bytes vs join probe vs post-aggregation).
  *
  * Usage: `sbt "runMain graft.ProbeFloorProbe [ingDir] [cpus] [reps]"`
  * against a warm-store rehearsal dir (ScaleRehearsal's x{k}_ing).
  */
object ProbeFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x100_ing")
    val cpus = args.lift(1).getOrElse("32")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-floor")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftConf(spark)
    val D = operators.DedupQueries
    val S = operators.SimilarityQueries
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      f
      println(f"[floor] $label%-42s #$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.range(100000).selectExpr("sum(id)").collect() // warmup

    if (args.lift(3).contains("deep")) {
      // deep decomposition of the simhash cross-probe: which term of
      // the 13 s costs — the corpus scan (1 s alone), the broadcast
      // BUILD of the 1.28M-row batch delta, or the per-row PROBE?
      val (exC, inC) = D.simhashChunksSplit(spark, dir)
      def ham = bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
      def crossOf(a: DataFrame, b: DataFrame) =
        D.carryBroadcastHint(a.as("a")).join(b.as("b"),
            col("a.chunk_idx") === col("b.chunk_idx") &&
              col("a.chunk_val") === col("b.chunk_val"))
          .select(col("a.doc_id").as("doc_id"),
            col("b.doc_id").as("match_id"), ham.as("hamming"))
      time("deep: build 1-row, probe full corpus") {
        noop(crossOf(broadcast(inC.limit(1)), exC))
      }
      time("deep: build full batch, probe 1k rows") {
        noop(crossOf(inC, exC.limit(1000)))
      }
      time("deep: build full batch, probe full corpus") {
        noop(crossOf(inC, exC))
      }
      println("[floor] cross matches: " + crossOf(inC, exC).count())
      // synthetic floor: same cardinalities, bare columns
      val synthB = spark.range(1280000).select(
        (col("id") % 256).cast("int").as("chunk_idx"),
        xxhash64(col("id")).as("chunk_val"), col("id").as("doc_id"),
        xxhash64(col("id") + 7).as("simhash"))
      val synthC = spark.range(102400000).select(
        (col("id") % 256).cast("int").as("chunk_idx"),
        xxhash64(col("id") + 1000000000L).as("chunk_val"),
        col("id").as("doc_id"), xxhash64(col("id") + 13).as("simhash"))
      time("deep: synthetic same-shape BHJ") {
        noop(crossOf(broadcast(synthB), synthC))
      }
      def fuse(p: String) = shiftleft(col(s"$p.chunk_idx").cast("long"), 48)
        .bitwiseOR(col(s"$p.chunk_val"))
      def crossFused(a: DataFrame, b: DataFrame) =
        D.carryBroadcastHint(a.as("a")).join(b.as("b"), fuse("a") === fuse("b"))
          .select(col("a.doc_id").as("doc_id"),
            col("b.doc_id").as("match_id"), ham.as("hamming"))
      for (i <- 1 to 3)
        time("deep: FUSED-key store probe (noop)") {
          noop(crossFused(inC, exC))
        }
      println("[floor] fused cross matches: " + crossFused(inC, exC).count())
      crossOf(inC, exC).explain("formatted")
      spark.stop(); return
    }

    if (args.lift(3).contains("synth")) {
      // machinery floor, no stores: BHJ probe throughput vs row count,
      // task counts, and codegen markers
      def synth(n: Long, salt: Long) = spark.range(n).select(
        (col("id") % 256).cast("int").as("chunk_idx"),
        xxhash64(col("id") + salt).as("chunk_val"), col("id").as("doc_id"),
        xxhash64(col("id") + salt + 13).as("simhash"))
      val b = synth(1280000L, 0L)
      def probe(n: Long) = broadcast(b.as("a")).join(synth(n, 1e9.toLong).as("b"),
          col("a.chunk_idx") === col("b.chunk_idx") &&
            col("a.chunk_val") === col("b.chunk_val"))
        .select(col("a.doc_id"), col("b.doc_id").as("m"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("h"))
      time("synth: noop stream side alone (102.4M)") {
        noop(synth(102400000L, 1e9.toLong))
      }
      for (n <- Seq(12800000L, 102400000L))
        time(s"synth: BHJ probe n=$n") { noop(probe(n)) }
      println("[floor] probe partitions: " + probe(102400000L).rdd.getNumPartitions)
      println(probe(102400000L).queryExecution.executedPlan.toString
        .linesIterator.take(12).mkString("\n"))
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      time("synth: BHJ probe n=102.4M, WSCG OFF") { noop(probe(102400000L)) }
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      // single fused LONG key (LongHashedRelation path) vs the 2-col key
      def probeFused(n: Long) = {
        def fuse(p: String) = shiftleft(col(s"$p.chunk_idx").cast("long"), 48)
          .bitwiseOR(col(s"$p.chunk_val"))
        broadcast(b.as("a")).join(synth(n, 1e9.toLong).as("b"),
            fuse("a") === fuse("b"))
          .select(col("a.doc_id"), col("b.doc_id").as("m"),
            bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("h"))
      }
      for (i <- 1 to 3)
        time(s"synth: BHJ FUSED-long-key probe n=102.4M") {
          noop(probeFused(102400000L))
        }
      println(probeFused(102400000L).queryExecution.executedPlan.toString
        .linesIterator.take(8).mkString("\n"))
      spark.stop(); return
    }

    if (args.lift(3).contains("cont")) {
      // deep decomposition of the containment probe: scan vs the sub
      // term's full-index explode vs candidates vs the verify joins
      val sh = D.containmentShOfShingles(D.shingleStore(spark, dir))
      time("cont: sh frame (noop)") { noop(sh) }
      time("cont: full-index explode (noop)") {
        noop(sh.select(col("doc_id").as("b"), col("sz").as("sz_b"),
          explode(col("hs")).as("h")))
      }
      time("cont: sup probe only (count)") {
        D.containmentSupProbe(sh).count(); ()
      }
      time("cont: candidates only (count)") {
        D.incrementalContainmentCandidates(sh).count(); ()
      }
      time("cont: full incremental probe (count)") {
        D.dedupContainmentIncremental(spark, dir).count(); ()
      }
      // variant: verify joins with SHUFFLE_HASH on the array side (no
      // sort of the pair stream or the array table)
      val cand = D.incrementalContainmentCandidates(sh)
      def verifyOf(candF: DataFrame, shF: DataFrame) = candF
        .join(shF.hint("shuffle_hash").select(col("doc_id").as("a"),
          col("hs").as("hs_a"), col("sz").as("sz_a")), Seq("a"))
        .join(shF.hint("shuffle_hash").select(col("doc_id").as("b"),
          col("hs").as("hs_b")), Seq("b"))
        .select(col("a"), col("b"),
          (size(array_intersect(col("hs_a"), col("hs_b"))).cast("double")
            / col("sz_a").cast("double")).as("containment"))
        .where(col("containment") >= lit(D.ContainT))
      time("cont: verify w/ SHUFFLE_HASH (count)") {
        verifyOf(cand, sh).count(); ()
      }
      // variant: grouped-first attach (the emb shape) — group pairs by
      // a, attach hs_a at a-grain (broadcastable), explode locally,
      // then one hash join attaches hs_b
      val grouped = cand.groupBy(col("a")).agg(collect_set(col("b")).as("bs"))
      val pairsA = sh.select(col("doc_id").as("a"), col("hs").as("hs_a"),
          col("sz").as("sz_a"))
        .join(grouped, Seq("a"))
        .select(col("a"), col("hs_a"), col("sz_a"),
          explode(col("bs")).as("b"))
      time("cont: grouped verify (count)") {
        pairsA
          .join(sh.hint("shuffle_hash").select(col("doc_id").as("b"),
            col("hs").as("hs_b")), Seq("b"))
          .select(col("a"), col("b"),
            (size(array_intersect(col("hs_a"), col("hs_b"))).cast("double")
              / col("sz_a").cast("double")).as("containment"))
          .where(col("containment") >= lit(D.ContainT))
          .count(); ()
      }
      spark.stop(); return
    }

    // ---- simhash family -------------------------------------------------
    time("simhash: chain scan (all cols, noop)") {
      noop(D.simhashChunksStored(spark, dir))
    }
    time("simhash: chain scan (keys only, noop)") {
      noop(D.simhashChunksStored(spark, dir)
        .select(col("doc_id"), col("chunk_idx"), col("chunk_val")))
    }
    time("simhash: candidates (fused key, noop)") {
      val (exC, inC) = D.simhashChunksSplit(spark, dir)
      def ham = bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
      noop(D.carryBroadcastHint(inC.as("a")).join(exC.as("b"),
          D.fusedChunkKey("a") === D.fusedChunkKey("b"))
        .select(col("a.doc_id").as("doc_id"),
          col("b.doc_id").as("match_id"), ham.as("hamming")))
    }
    time("simhash: full incremental probe (count)") {
      D.dedupSimhashIncremental(spark, dir).count(); ()
    }

    // ---- containment family ---------------------------------------------
    time("containment: shingle chain scan (noop)") {
      noop(D.shingleStore(spark, dir))
    }
    time("containment: full incremental probe (count)") {
      D.dedupContainmentIncremental(spark, dir).count(); ()
    }

    // ---- embedding family -----------------------------------------------
    time("emb: sig chain scan (noop)") {
      noop(S.embSigsStored(spark, dir))
    }
    time("emb: candidates only (count)") {
      S.incrementalEmbCandidates(S.embSigsStored(spark, dir)).count(); ()
    }
    time("emb: full incremental probe (count)") {
      S.dedupEmbIncremental(spark, dir).count(); ()
    }

    // ---- ngram family ---------------------------------------------------
    time("ngram: fpost chain scan (noop)") {
      noop(D.ngramFilteredStore(spark, dir))
    }
    time("ngram: full incremental probe (count)") {
      D.dedupNgramIncremental(spark, dir).count(); ()
    }

    // ---- spans family ---------------------------------------------------
    time("spans: anchor chain scan (noop)") {
      noop(D.spanAnchorStore(spark, dir))
    }
    time("spans: full incremental probe (count)") {
      D.dedupSpansIncremental(spark, dir).count(); ()
    }
    spark.stop()
  }
}
