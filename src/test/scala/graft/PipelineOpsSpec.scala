package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the sampling / mixture / chunking / packing operators
  * (PipelineOps) and the sliding-window aggregate — properties the
  * DuckDB oracle can't express (coverage, budget, double-counting). */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("BPE training recovers the hand-derived merge sequence on the " +
    "classic low/lower/newest/widest corpus, ties break (count, left, " +
    "right), and the sequence is partition-invariant") {
    import spark.implicits._
    // Sennrich et al. 2016's worked example: weighted pair counts give
    // e-s:9 s-t:9 (tie → 'e' first), then es-t:9, then l-o:7 o-w:7
    // (tie → 'l' first), then lo-w:7
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      operators.PipelineOps.bpeTrainOn(df, 4).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toList
    val got = run(docs)
    assert(got == List((1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L)), s"merge sequence: $got")
    // wordFreq counts survive any partitioning; so must the merges
    val repart = run(docs.as[(Long, String)]
      .flatMap { case (_, t) => t.split(" ").zipWithIndex
        .map { case (w, i) => (i.toLong, w) } }
      .toDF("doc_id", "text").repartition(7))
    assert(repart == got, "merge sequence is partition-variant")
    // tokenize under the trained vocab: low→[low](1), lower→[low,e,r](3),
    // newest→[n,e,w,est](4), widest→[w,i,d,est](4) ⇒ 16 words, 79 chars,
    // 5·1+2·3+6·4+3·4 = 47 BPE tokens
    val tok = operators.PipelineOps.bpeTokenizeOn(docs, 4).collect()
    assert(tok.length == 1)
    assert((tok.head.getLong(1), tok.head.getLong(2), tok.head.getLong(3))
      == ((16L, 79L, 47L)), s"tokenize stats: ${tok.head}")
  }

  test("token-budget selection: the bucket decomposition equals the naive " +
    "per-language cumulative rule and never exceeds the budget") {
    val docs = Tables.documents(spark, sf)
    val got = operators.PipelineOps.tokenBudgetOn(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // deliberate-naive-oracle: independent naive replication — ONE
    // big window per language, the formulation the production
    // decomposition exists to avoid; any window-shape noise this spec
    // emits is the ORACLE side, not the plan under test
    val t = docs
      .select(col("doc_id"), col("lang"),
        size(functions.TextFunctions.tokens(col("text"))).cast("long").as("nt"),
        operators.PipelineOps.hash10k(col("doc_id")).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val naive = t
      .join(t.groupBy(col("lang")).agg(sum(col("nt")).as("ct"))
        .withColumn("budget",
          expr(s"ct div ${operators.PipelineOps.TokenBudgetDenom}")), Seq("lang"))
      .withColumn("cum", sum(col("nt")).over(w))
      .where(col("cum") <= col("budget"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("nt")).as("st"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty && got.keySet == naive.keySet)
    got.foreach { case (lang, (budget, nSel, selTokens)) =>
      assert(selTokens <= budget, s"$lang: $selTokens over budget $budget")
      assert((nSel, selTokens) == naive(lang),
        s"$lang: decomposed ($nSel, $selTokens) != naive ${naive(lang)}")
    }
  }

  test("quality-weighted sample: deterministic, the best document always " +
    "survives, and the kept set's mean quality exceeds the corpus mean") {
    val s1 = operators.PipelineOps.smpQualityWeighted(spark, sf).collect()
    val s2 = operators.PipelineOps.smpQualityWeighted(spark, sf).collect()
    assert(s1.toSeq == s2.toSeq, "sampling must be replay-stable")
    val total = Tables.documents(spark, sf).count()
    assert(s1.length > 0 && s1.length < total)
    // the argmax-quality doc has rate_bp = 10000 and hash10k < 10000
    // always holds, so it can never be dropped
    val qmax = s1.map(_.getDouble(1)).max
    val corpusQmax = operators.TextQueries.txtQuality(spark, sf)
      .agg(max(col("quality_score"))).head().getDouble(0)
    assert(qmax == corpusQmax, "the best document was dropped")
    val keptMean = s1.map(_.getDouble(1)).sum / s1.length
    val corpusMean = operators.TextQueries.txtQuality(spark, sf)
      .agg(avg(col("quality_score"))).head().getDouble(0)
    assert(keptMean > corpusMean,
      s"importance sampling must raise mean quality: $keptMean vs $corpusMean")
  }

  test("stratified sample is a deterministic subset; strata rates bound it") {
    val total = Tables.documents(spark, sf).count()
    val s1 = operators.PipelineOps.smpStratified(spark, sf).collect()
    val s2 = operators.PipelineOps.smpStratified(spark, sf).collect()
    assert(s1.toSeq == s2.toSeq, "sampling must be replay-stable")
    assert(s1.length > 0 && s1.length < total)
    val ids = s1.map(_.getLong(0)).toSet
    assert(ids.size == s1.length, "no duplicate sampled rows")
  }

  test("chunking covers every token exactly: strided starts, bounded " +
    "length, tail chunk short iff the stride leaves a remainder") {
    val chunks = operators.PipelineOps.txtChunkOverlap(spark, sf)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        max(col("n_chunk_tokens")).as("max_len"),
        sum(col("n_chunk_tokens")).as("sum_len"))
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(functions.TextFunctions.tokens(col("text"))).as("n"))
    val joined = chunks.join(toks, Seq("doc_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nChunks, maxLen, n) =
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("max_len"), r.getAs[Int]("n"))
      assert(maxLen <= 64)
      // starts 0, 48, … while < n  ⇒  nChunks = ceil(max(n,1)/48) exactly
      assert(nChunks == (n - 1) / 48 + 1, s"doc ${r.getLong(0)}: $nChunks chunks for $n tokens")
    }
  }

  test("sequence packing conserves tokens and starts every shard under " +
    "the budget boundary") {
    val shards = operators.PipelineOps.pipePackSequences(spark, sf).collect()
    val totalTokens = Tables.documents(spark, sf)
      .select(size(functions.TextFunctions.tokens(col("text"))).as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(shards.map(_.getAs[Long]("n_tokens")).sum == totalTokens,
      "every token lands in exactly one shard")
    assert(shards.forall(_.getAs[Long]("n_docs") >= 1))
    // The documented contract, derived independently from the corpus:
    // a document belongs to shard floor((cum − n)/budget) of its hash
    // bucket, where cum is the doc_id-ordered running token total.
    // (Shard ids need NOT be dense: a doc longer than the budget makes
    // its successor skip ids — asserting density would encode a
    // fixture accident.)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(functions.TextFunctions.tokens(col("text"))).as("n"))
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong)
    def h10k(x: Long): Long = {
      val P = 1000000007L
      val s = (x % P * 2654435761L + 104729L) % P
      s * s % P * s % P % 10000L
    }
    val perDoc: Seq[((Long, Long), Long)] = docs.toSeq
      .map { case (id, n) => (h10k(id) % 16, id, n) }
      .groupBy(_._1).toSeq
      .flatMap { case (bucket, rs) =>
        var cum = 0L
        rs.sortBy(_._2).map { case (_, _, n) =>
          cum += n
          ((bucket, (cum - n) / 2048L), n)
        }
      }
    val expected: Map[(Long, Long), (Long, Long)] = perDoc
      .groupBy(_._1)
      .map { case (k, vs) => k -> ((vs.size.toLong, vs.map(_._2).sum)) }
    val actual = shards.map(r =>
      (r.getAs[Long]("bucket"), r.getAs[Long]("shard")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    assert(actual == expected,
      "shard assignment must equal the prefix-sum derivation")
  }

  test("chunking a zero-token document emits no chunks (ANSI-safe) and " +
    "per-token coverage holds on a hand-built frame") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""),                       // zero tokens — must vanish
      (2L, "?!. ,,,"),                // punctuation only — zero tokens
      (3L, (1 to 100).map(i => s"t$i").mkString(" ")) // 100 tokens → 3 chunks
    ).toDF("doc_id", "text")
    val out = operators.PipelineOps.chunkedOn(docs).collect()
    assert(!out.exists(r => r.getLong(0) == 1L || r.getLong(0) == 2L),
      "token-free documents must emit zero chunks, not throw under ANSI")
    val c3 = out.filter(_.getLong(0) == 3L)
    assert(c3.map(_.getAs[Int]("chunk_idx")).toSeq == Seq(0, 1, 2))
    assert(c3.map(_.getAs[Number]("n_chunk_tokens").longValue).toSeq ==
      Seq(64L, 52L, 4L), "starts 0/48/96 over 100 tokens, capped at 64")
    assert(c3.map(_.getAs[String]("head_token")).toSeq ==
      Seq("t1", "t49", "t97"))
  }

  test("embedding vectors are uniform-width (vecDim one-row probe " +
    "precondition)") {
    val widths = Tables.embeddings(spark, sf)
      .select(size(col("embedding")).as("d")).distinct().collect()
    assert(widths.length == 1 && widths.head.getInt(0) > 0,
      s"expected one positive vector width, got ${widths.toSeq}")
  }

  test("sliding windows double-count exactly: Σ sliding n_events = 2 × events") {
    val nEvents = Tables.events(spark, sf).count()
    val slid = streaming.EventStreams.evtSlidingWindow(spark, sf)
      .agg(sum(col("n_events"))).head.getLong(0)
    assert(slid == 2 * nEvents)
  }

  test("fixed-k sample: exact size (or whole corpus if smaller), " +
    "deterministic, subset of corpus ids") {
    val total = Tables.documents(spark, sf).count()
    val s1 = operators.PipelineOps.smpFixedK(spark, sf).collect()
    val s2 = operators.PipelineOps.smpFixedK(spark, sf).collect()
    assert(s1.toSeq == s2.toSeq)
    assert(s1.length == math.min(operators.PipelineOps.SampleK, total))
    assert(s1.map(_.getLong(0)).distinct.length == s1.length)
    // the scaladoc's scale claim, plan-asserted: per-partition top-k +
    // driver merge, not a global sort
    val plan = operators.PipelineOps.smpFixedK(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("approx percentiles track the exact oracled percentiles: p50 " +
    "within one sketch step of exact per product") {
    val exact = operators.AggQueries.aggPercentiles(spark, sf)
      .select(col("product"), col("p50"), col("p90")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = operators.AggQueries.aggApproxPercentiles(spark, sf)
      .select(col("product"), col("p50"), col("p90")).collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    approx.foreach { r =>
      val (e50, e90) = exact(r.getString(0))
      val (a50, a90) = (r.getDouble(1), r.getDouble(2))
      // approx returns an actual data value; exact interpolates —
      // bound the gap by a generous relative margin at these group sizes
      assert(math.abs(a50 - e50) <= math.max(1.0, 0.25 * math.abs(e50)),
        s"${r.getString(0)}: approx p50 $a50 vs exact $e50")
      assert(math.abs(a90 - e90) <= math.max(1.0, 0.25 * math.abs(e90)),
        s"${r.getString(0)}: approx p90 $a90 vs exact $e90")
    }
  }

  test("mixture composition: fractions sum to 1 and web outweighs curated") {
    val rows = operators.PipelineOps.pipeMixture(spark, sf).collect()
    assert(rows.map(_.getAs[String]("corpus")).toSet == Set("web", "curated"))
    val pct = rows.map(_.getAs[Double]("pct_docs")).sum
    assert(math.abs(pct - 1.0) < 1e-5, s"pct sum $pct")
    val byCorpus = rows.map(r =>
      r.getAs[String]("corpus") -> r.getAs[Long]("n_docs")).toMap
    assert(byCorpus("web") > byCorpus("curated"),
      "80% of 10 web sources must outweigh 30% of 10 curated")
  }

  test("leak-free split: byte-identical texts co-assign regardless of " +
    "doc_id, and the corpus-level leak audit is zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the same exact document"),
      (999L, "the same exact document"),   // duplicate, distant id
      (2L, "a different document"),
      (3L, "yet another one entirely"),
    ).toDF("doc_id", "text")
    val assigned = operators.PipelineOps.splitAssign(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("split")).toMap
    assert(assigned(1L) == assigned(999L),
      "duplicates must land in the same split")
    val out = operators.PipelineOps.smpSplitLeakfree(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("n_leaked_groups") == 0L))
    // every split must actually receive documents at this sf
    assert(out.map(_.getAs[String]("split")).toSet ==
      Set("train", "val", "test"))
  }
}
