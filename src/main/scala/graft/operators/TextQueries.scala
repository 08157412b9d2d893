package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** North-star text-analysis operators over `documents` (BASELINE.json
  * north_star; beyond the reference's surface, as required for a
  * training-data pipeline): token stats, quality scoring, n-gram
  * language ID, and document fingerprinting.
  *
  * Scale: all four are embarrassingly parallel scans (no shuffle except
  * final ordering); at 100 TB they pipeline entirely inside one
  * WholeStageCodegen over the parquet scan.
  */
object TextQueries {

  /** Token counting (whitespace/regex tokenizer): totals, uniques,
    * type-token ratio. Integer counts + one division → exact. */
  val txtTokens: Q = (spark, dir) => {
    val t = tokens(col("text"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(t).as("n_tokens"),
        size(array_distinct(t)).as("n_unique_tokens"))
      .withColumn("type_token_ratio",
        col("n_unique_tokens").cast("double") / col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Quality scoring: length/alpha/stopword signals combined into a
    * [0,1] score — the standard pre-training corpus filter shape. */
  val txtQuality: Q = (spark, dir) => {
    val t = tokens(col("text"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_actual"),
        size(t).as("n_tokens"),
        length(regexp_replace(col("text"), "[^a-z]", "")).as("n_alpha"),
        stopwordCount(t, EN_STOP).as("n_stopwords"))
      .withColumn("alpha_ratio",
        col("n_alpha").cast("double") / col("n_chars_actual"))
      .withColumn("stopword_ratio",
        col("n_stopwords").cast("double") / col("n_tokens"))
      .withColumn("quality_score",
        Tables.round6(
          least(col("n_tokens").cast("double") / lit(100.0), lit(1.0)) * lit(0.4)
            + col("alpha_ratio") * lit(0.4)
            + least(col("stopword_ratio") * lit(5.0), lit(1.0)) * lit(0.2)))
      .orderBy(col("doc_id"))
  }

  /** The [[txtQuality]] score as a reusable scalar over (text, tokens) —
    * term-identical to the query (and its oracle), so composed pipelines
    * (pipe_corpus_clean) filter on the exact same rounded value. */
  private[graft] def qualityScoreCol(text: Column, t: Column): Column = {
    val nTokens  = size(t)
    val alphaRat = length(regexp_replace(text, "[^a-z]", "")).cast("double") /
      length(text)
    val stopRat  = stopwordCount(t, EN_STOP).cast("double") / nTokens
    Tables.round6(
      least(nTokens.cast("double") / lit(100.0), lit(1.0)) * lit(0.4)
        + alphaRat * lit(0.4)
        + least(stopRat * lit(5.0), lit(1.0)) * lit(0.2))
  }

  /** The [[txtLangid]] fixed-priority argmax as a reusable scalar over
    * a token array — same expression tree as the query/oracle. */
  private[graft] def predictedLangCol(t: Column): Column = {
    val (sEn, sEs, sDe, sFr, sZh) =
      (stopwordCount(t, EN_STOP), stopwordCount(t, ES_STOP),
        stopwordCount(t, DE_STOP), stopwordCount(t, FR_STOP),
        stopwordCount(t, ZH_STOP))
    when(sEn >= sEs && sEn >= sDe && sEn >= sFr && sEn >= sZh, "en")
      .when(sEs >= sDe && sEs >= sFr && sEs >= sZh, "es")
      .when(sDe >= sFr && sDe >= sZh, "de")
      .when(sFr >= sZh, "fr")
      .otherwise("zh")
  }

  /** N-gram-heuristic language ID: per-language stopword-token scores,
    * fixed-priority argmax (deterministic tie-break), compared against
    * the labeled `lang`. */
  val txtLangid: Q = (spark, dir) => {
    val t = tokens(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        predictedLangCol(t).as("predicted_lang"))
      .withColumn("is_correct", (col("predicted_lang") === col("lang")).cast("int"))
      .select("doc_id", "lang", "predicted_lang", "is_correct")
      .orderBy(col("doc_id"))
  }

  /** Document fingerprinting: md5 over the whitespace-collapsed normal
    * form + a 2-hex-char shard key (the bucketing used to partition a
    * 100 TB dedup by fingerprint prefix). */
  val txtFingerprint: Q = (spark, dir) =>
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        md5(normalized(col("text"))).as("fingerprint"),
        substring(md5(normalized(col("text"))), 1, 2).as("shard"))
      .orderBy(col("doc_id"))

  /** TF-IDF with smooth idf (ln((1+N)/(1+df))+1), top-5 terms per doc.
    * All inputs to the float math are integers, the expression tree is
    * identical in the oracle, and the result is floor-rounded to 6
    * decimals before the deterministic (score desc, token asc) rank —
    * `ln` may differ by 1 ulp between libm implementations, far below
    * the rounding grain. Three hash-aggregates + a shuffle join on
    * `token`; nothing quadratic.
    *
    * 100 TB note: the (token, df) side has one row per DISTINCT token —
    * a web-corpus vocabulary is 10^8–10^9 rows, heavy-tailed, and NOT
    * broadcastable. The join is left planner-chosen: the tf side is
    * already hash-partitioned by (doc_id, token) from its aggregate, so
    * the token join is a same-key shuffle join (AQE will still broadcast
    * when the measured dim is genuinely small, as at test SF). The only
    * forced broadcast is the 1-row corpus count `n`. */
  val txtTfidf: Q = (spark, dir) => {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val tf = tok.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val nTok = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tokens"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(nTok, Seq("doc_id"))
      .join(df, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf", Tables.round6(
        (col("tf").cast("double") / col("n_tokens")) *
          (log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + lit(1.0))))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("token"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5)
      .select(col("doc_id"), col("token"), col("tf"), col("tfidf"), col("rk"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** `txt_unigram_ppl`: corpus-self-trained unigram language-model
    * cross-entropy and perplexity per document — the KenLM-style
    * fluency filter of a pretraining pipeline (docs whose tokens are
    * corpus-typical score low; rare-token gibberish scores high).
    * avg_nll = (1/n)·Σ ln(N/count(tok)); ppl = exp(avg_nll). No
    * smoothing needed: the model is trained on the scored corpus
    * itself, so every token has count ≥ 1.
    *
    * Determinism: the per-token surprisal ln(N/cnt) is quantized to
    * integer MICRO-NATS before the per-doc sum — a long sum is exact
    * and order-independent, where a double sum would drift with
    * partitioning. `ln`/`exp` may differ by 1 ulp between libms — far
    * below the micro-nat grain (the same accepted bound as
    * [[txtTfidf]]'s idf).
    *
    * Scale: identical shape to [[txtTfidf]] — two hash aggregates and
    * a join on `token` whose (token, cnt) side is vocabulary-sized
    * (10^8–10^9 rows on a web corpus, NOT broadcastable → planner-
    * chosen; AQE broadcasts at test SF). The only forced broadcast is
    * the 1-row corpus total. Token strings shuffle once; the doc-side
    * re-aggregation carries only (doc_id, long). */
  val txtUnigramPpl: Q = (spark, dir) =>
    unigramPplOn(Tables.documents(spark, dir))

  /** [[txtUnigramPpl]] over an explicit (doc_id, text) frame — the
    * spec plants a corpus with hand-computable token counts and checks
    * the quantized cross-entropy against an independent replication. */
  private[graft] def unigramPplOn(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val cnt = tok.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = tok.agg(count(lit(1)).as("n_total"))
    val avgNll =
      col("sum_micro").cast("double") / (col("n_tokens") * lit(1000000.0))
    tok.join(cnt, Seq("token"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        floor(log(col("n_total").cast("double") / col("cnt"))
          * lit(1000000.0) + lit(0.5)).cast("long").as("s_micro"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("s_micro")).as("sum_micro"))
      .select(col("doc_id"), col("n_tokens"),
        Tables.round6(avgNll).as("avg_nll"),
        Tables.round6(exp(Tables.round6(avgNll))).as("ppl"))
      .orderBy(col("doc_id"))
  }

  /** Corpus bigram frequency table: top-100 word bigrams with a
    * deterministic (count desc, bigram asc) tie-break — the corpus-
    * statistics shape (n-gram LM tables, vocab induction). At 100 TB
    * this is one explode + one hash-aggregate with map-side combine;
    * the bigram is the shuffle key and hot n-grams are the (AQE-
    * handled) skew axis. Tokens materialize in their own projection
    * (same regex-inlining trap as the shingle pipeline). */
  val txtBigramFreq: Q = (spark, dir) =>
    Tables.documents(spark, dir)
      .select(tokens(col("text")).as("w"))
      .select(explode(ngrams(col("w"), 2)).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(100)

  /** `txt_heavy_hitters`: every bigram above 0.1% of the corpus bigram
    * stream, with EXACT counts — two-pass distributed heavy hitters.
    * Pass 1 runs a Misra-Gries summary (capacity 2000) independently
    * inside each partition: any item with global frequency above
    * S/1000 must exceed n_p/2001 in at least one partition (pigeonhole)
    * and therefore SURVIVES that partition's summary — so the candidate
    * union is a deterministic superset of the true heavy set,
    * independent of partitioning and arrival order. Pass 2 counts the
    * candidates exactly and keeps those above the threshold, so the
    * final output equals the naive full group-by — which is exactly
    * what the oracle runs.
    *
    * Scale: this is THE pattern for frequency discovery on a 100 TB
    * stream — pass 1 is shuffle-free (bounded per-partition state, no
    * exchange), and pass 2 shuffles only rows matching a
    * bounded-by-construction candidate set (≤ capacity × partitions,
    * broadcast), never the full bigram stream. The naive group-by
    * shuffles every bigram occurrence; at vocabulary scale that is the
    * job's dominant cost. Two scans of `documents` are inherent to the
    * sketch-then-verify contract (same as the LSH dedup family).
    *
    * Honest bound: the broadcast candidate set is capacity ×
    * partitions WORST-case (adversarially distinct partitions); on a
    * Zipfian corpus the distinct() collapses it to near the true heavy
    * tail. At extreme partition counts (100 TB ≈ 200k input splits,
    * worst case ~200M candidates) insert a hierarchical merge — MG
    * summaries are themselves mergeable, so treeReduce the
    * per-partition summaries (the guarantee survives: merged error
    * adds) before the exact pass, or shuffle-semi-join the candidates
    * instead of broadcasting. The per-partition guarantee only needs
    * capacity ≥ 1/minFrac; the 2× slack here halves the sketch error
    * at test scale. */
  val txtHeavyHitters: Q = (spark, dir) =>
    heavyHittersOn(
      Tables.documents(spark, dir)
        .select(tokens(col("text")).as("w"))
        .select(explode(ngrams(col("w"), 2)).as("bigram")),
      cap = 2000, minFrac = 0.001)

  /** `txt_freq_cms` (scale ext.): Count-Min frequency sketch — the
    * one-pass MERGEABLE complement to [[txtHeavyHitters]]. Misra-Gries
    * guarantees exact counts for its survivors but answers nothing
    * about items it dropped; a CMS answers a point-frequency query for
    * ANY token after the fact, never underestimates, and overestimates
    * by at most eps·N (here eps=1e-4, so the counter array is ~1 MB
    * regardless of corpus size — at 100 TB the sketch is still ~1 MB).
    * Spark's `stat.countMinSketch` builds it as a treeAggregate:
    * per-partition counter arrays, element-wise merge — the same
    * partial/merge algebra as the HLL/theta family, so per-shard (or
    * per-day) sketches compose by addition without rescanning
    * (AnalyticsOpsSpec asserts split-build-merge ≡ whole-build
    * exactly, plus the no-underestimate and eps·N bounds).
    *
    * Output: the exact top-20 tokens with exact and sketch counts side
    * by side. The exact side is the [[txtBigramFreq]]-style count the
    * driver could oracle; the sketch side is engine internals →
    * rows-only, like the other sketch queries. Fixed seed ⇒ the
    * sketch bits and every estimate are replayable. */
  val txtFreqCms: Q = (spark, dir) =>
    cmsProbeOn(Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("token")))

  /** Oracled EXACT companion of [[txtFreqCms]] (round-9 sketch
    * anchoring): the same top-20 (count desc, token asc) key set with
    * exact counts only — DuckDB verifies it, pinning the group/key
    * structure; SketchBoundSpec then asserts the CMS estimate column
    * obeys its one-sided guarantee (exact ≤ est ≤ exact + ε·N) against
    * these counts at every SF. */
  val txtFreqCmsExact: Q = (spark, dir) =>
    Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("token")).limit(20)

  private[graft] def cmsProbeOn(toks: DataFrame): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    val cms = toks.stat.countMinSketch("token", eps = 1e-4,
      confidence = 0.99, seed = 42)
    toks.groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("token")).limit(20)
      .collect() // bounded: 20 rows + a ~1 MB sketch on the driver
      .map(r => (r.getString(0), r.getLong(1),
        cms.estimateCount(r.getString(0))))
      .toSeq.toDF("token", "n_exact", "n_cms_est")
      .orderBy(col("n_exact").desc, col("token"))
  }

  /** [[txtHeavyHitters]] over an explicit one-column frame with
    * injectable capacity/threshold — the spec forces decrement churn
    * (500 singletons through a 10-slot summary) and asserts partition
    * invariance and exact survivor counts. */
  private[graft] def heavyHittersOn(bigrams: org.apache.spark.sql.DataFrame,
      cap: Int, minFrac: Double): org.apache.spark.sql.DataFrame = {
    val spark = bigrams.sparkSession
    import spark.implicits._
    // the survivor guarantee only covers items above n/(cap+1): a
    // threshold below that admits true-heavy items the sketch may drop
    require(minFrac > 1.0 / (cap + 1),
      s"minFrac=$minFrac below the capacity-$cap guarantee ${1.0 / (cap + 1)}")
    val cands = bigrams.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { b =>
        m.get(b) match {
          case Some(c) => m.update(b, c + 1)
          case None =>
            if (m.size < cap) m.update(b, 1L)
            else {
              // decrement-all round: each consumes cap+1 stream units,
              // so rounds ≤ n_p/(cap+1) — the survivor guarantee
              val dead = Array.newBuilder[String]
              m.foreach { case (k, c) =>
                if (c == 1L) dead += k else m.update(k, c - 1L)
              }
              dead.result().foreach(m.remove)
            }
        }
      }
      m.keysIterator
    }.toDF("bigram").distinct()
    val total = bigrams.agg(count(lit(1)).as("s"))
    bigrams.join(broadcast(cands), Seq("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .where(col("n") > col("s") * lit(minFrac))
      .select(col("bigram"), col("n"))
      .orderBy(col("n").desc, col("bigram"))
  }

  /** The Gopher rule-battery stopword list (Rae et al. 2021, App. A1.1:
    * "contains at least two of the following English words") — distinct
    * from [[EN_STOP]], which is the language-ID scoring list. */
  private[graft] val GOPHER_STOP: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** `txt_gopher_rules`: the Gopher quality rule battery (Rae et al.
    * 2021, App. A1.1) — the rule-based corpus filter every large
    * pretraining pipeline runs before model-based scoring: word-count
    * bounds [50, 100k], mean word length [3, 10], symbol-to-word ratio
    * (# and …) ≤ 0.1, ≤ 90% bullet-led lines, ≤ 30% ellipsis-ended
    * lines, ≥ 80% words containing a letter, ≥ 2 Gopher stopwords.
    * Emits every signal plus the conjunctive `passes` flag (a doc with
    * zero words fails via the word-count conjunct — false AND null is
    * false in both engines' three-valued logic).
    *
    * Determinism: every ratio is an integer/integer division rounded to
    * 6 decimals BEFORE the threshold compares, so a boundary doc gets
    * the same verdict in both engines. "Words" are whitespace-separated
    * chunks (the paper's unit) — not [[tokens]], which drops the
    * punctuation these rules exist to measure; the stopword rule alone
    * uses [[tokens]] (membership needs the normal form).
    *
    * Scale: a pure per-row scan projection — no shuffle but the final
    * order; at 100 TB it pipelines inside one WholeStageCodegen over
    * the parquet scan, the same shape as [[txtQuality]]. */
  val txtGopherRules: Q = (spark, dir) =>
    gopherRulesOn(Tables.documents(spark, dir))

  /** [[txtGopherRules]] over an explicit (doc_id, text) frame — the
    * spec plants bullet-led, ellipsis-heavy, symbol-laden, and
    * empty-text documents the single-line fixture lacks. */
  private[graft] def gopherRulesOn(docs: DataFrame): DataFrame = {
    val m = docs.select(
      col("doc_id"),
      filter(split(col("text"), "\\s+"), w => length(w) > 0).as("ws"),
      split(col("text"), "\n").as("ls"),
      (length(col("text")) - length(translate(col("text"), "#", "")))
        .as("n_hash"),
      size(regexp_extract_all(col("text"), lit("\\.\\.\\."), lit(0)))
        .as("n_ell"),
      stopwordCount(tokens(col("text")), GOPHER_STOP).as("n_stop"))
    val r = m.select(
      col("doc_id"),
      size(col("ws")).as("n_words"),
      aggregate(col("ws"), lit(0L), (a, w) => a + length(w))
        .as("sum_word_len"),
      col("n_hash"), col("n_ell"), col("n_stop"),
      size(col("ls")).as("n_lines"),
      size(filter(col("ls"), l => l.rlike("^\\s*[-*•]")))
        .as("n_bullet"),
      size(filter(col("ls"), l => l.rlike("\\.\\.\\.\\s*$")))
        .as("n_ell_lines"),
      size(filter(col("ws"), w => w.rlike("[a-zA-Z]")))
        .as("n_alpha_words"))
    val guarded = (num: Column) => when(col("n_words") > 0,
      Tables.round6(num.cast("double") / col("n_words")))
    val scored = r.select(
      col("doc_id"), col("n_words"),
      guarded(col("sum_word_len")).as("mean_word_len"),
      guarded(col("n_hash") + col("n_ell")).as("symbol_ratio"),
      Tables.round6(col("n_bullet").cast("double") / col("n_lines"))
        .as("frac_bullet_lines"),
      Tables.round6(col("n_ell_lines").cast("double") / col("n_lines"))
        .as("frac_ellipsis_lines"),
      guarded(col("n_alpha_words")).as("frac_alpha_words"),
      col("n_stop"))
    scored.withColumn("passes",
      (col("n_words").between(50, 100000) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("symbol_ratio") <= 0.1 &&
        col("frac_bullet_lines") <= 0.9 &&
        col("frac_ellipsis_lines") <= 0.3 &&
        col("frac_alpha_words") >= 0.8 &&
        col("n_stop") >= 2).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** PII-shaped redaction: mask account-identifier digit runs (≥3) and
    * email-shaped spans, reporting the redaction count and the scrubbed
    * value — the scrub-before-sharing step of a data pipeline. Runs
    * over `customer` because it is the fixture's only PII-shaped
    * content (`Customer#000000123`; the synthetic documents are
    * digit-free). A pure codegen scan — no shuffle but the final
    * order; the ASCII regexes behave identically in Java and RE2. */
  val txtPiiRedact: Q = (spark, dir) => {
    val masked = regexp_replace(
      regexp_replace(col("c_name"), "[a-z0-9.]+@[a-z0-9.]+", "<email>"),
      "[0-9]{3,}", "<id>")
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        size(regexp_extract_all(col("c_name"), lit("[0-9]{3,}"), lit(0)))
          .as("n_digit_runs"),
        masked.as("redacted_name"),
        col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Repetition signal (the Gopher-rules quality family): per document,
    * the most frequent word bigram and the fraction of all bigram slots
    * it occupies — high top-bigram fractions mark boilerplate/spam
    * (`txt_quality`'s ratios can't see phrase-level looping). Ties
    * break deterministically (count desc, bigram asc). Documents with
    * fewer than two tokens emit no row (they have no bigram slots).
    *
    * Scale: one (doc_id, bigram) hash-aggregate with map-side combine,
    * then one doc-partitioned window pass for the argmax + total —
    * both shuffles are on corpus-scaling keys, and only 8-byte counts
    * plus the single winning bigram string per doc leave the
    * aggregate. The fraction is an exact integer-over-integer divide —
    * IEEE-identical in both engines, no rounding needed. */
  val txtRepetition: Q = (spark, dir) =>
    repetitionOn(Tables.documents(spark, dir))

  /** [[txtRepetition]] over an explicit (doc_id, text) frame — the spec
    * plants a looping document and an exact three-way count tie. */
  private[graft] def repetitionOn(docs: org.apache.spark.sql.DataFrame) = {
    val counts = docs
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), explode(ngrams(col("w"), 2)).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("c"))
    val byDoc = Window.partitionBy(col("doc_id"))
    counts
      .withColumn("n_bigrams", sum(col("c")).over(byDoc))
      .withColumn("rn",
        row_number().over(byDoc.orderBy(col("c").desc, col("bigram"))))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("bigram").as("top_bigram"),
        col("c").as("n_top"), col("n_bigrams"),
        (col("c").cast("double") / col("n_bigrams")).as("top_frac"))
      .orderBy(col("doc_id"))
  }

  /** `txt_zipf_slope`: corpus-health check — log-log OLS fit of the
    * token rank-frequency curve over the top 1000 tokens. Natural text
    * sits near the Zipf slope −1; a synthetic or template-heavy corpus
    * drifts away, so this single number is a standard pre-training
    * corpus diagnostic.
    *
    * Determinism: ln(rank) and ln(count) are quantized to integer
    * micro-nats (the [[txtUnigramPpl]] doctrine), so the five OLS
    * power sums are exact longs and the slope/intercept are fixed IEEE
    * trees over exactly-agreed integers; micro scaling cancels in the
    * slope and divides out of the intercept once. The top-1000 cut is
    * fully tie-broken (count desc, token asc).
    *
    * Scale: token counting is the usual hash aggregate; the top-1000
    * is a TakeOrdered (no global sort), and the rank window + OLS run
    * on the BOUNDED 1000-row frame. Long headroom: Σxy ≤ 10³·(35·10⁶)²
    * ≈ 10^18 even at ln(count) ≈ 35 (10^15 tokens). */
  val txtZipfSlope: Q = (spark, dir) =>
    zipfOn(Tables.documents(spark, dir))

  /** [[txtZipfSlope]] over an explicit (doc_id, text) frame — the spec
    * plants an exact power-law corpus and checks the recovered slope. */
  private[graft] def zipfOn(docs: DataFrame): DataFrame = {
    val top = docs
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(1000)
    val q = top
      // bounded-global-window: ranks the limit(1000) head only — the
      // vocabulary-sized aggregate never reaches this window
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("token"))))
      .select(
        floor(log(col("rank").cast("double")) * lit(1000000.0) + lit(0.5))
          .cast("long").as("x"),
        floor(log(col("n").cast("double")) * lit(1000000.0) + lit(0.5))
          .cast("long").as("y"))
    val num = (col("k") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den = (col("k") * col("sxx") - col("sx") * col("sx")).cast("double")
    val slope = num / den
    q.agg(count(lit(1)).as("k"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("k").as("n_ranks"),
        Tables.round6(slope).as("zipf_slope"),
        Tables.round6((col("sy").cast("double") -
          slope * col("sx").cast("double")) /
          col("k").cast("double") / lit(1000000.0)).as("zipf_intercept"))
  }

  def queries: Map[String, Q] = Map(
    "txt_zipf_slope"  -> txtZipfSlope,
    "txt_tokens"      -> txtTokens,
    "txt_quality"     -> txtQuality,
    "txt_langid"      -> txtLangid,
    "txt_fingerprint" -> txtFingerprint,
    "txt_tfidf"       -> txtTfidf,
    "txt_bigram_freq" -> txtBigramFreq,
    "txt_heavy_hitters" -> txtHeavyHitters,
    "txt_freq_cms"    -> txtFreqCms,
    "txt_freq_cms_exact" -> txtFreqCmsExact,
    "txt_repetition"  -> txtRepetition,
    "txt_unigram_ppl" -> txtUnigramPpl,
    "txt_pii_redact"  -> txtPiiRedact,
    "txt_gopher_rules" -> txtGopherRules,
  )

  private def sqlStop(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")
  private[operators] val T = "regexp_extract_all(lower(text), '[a-z0-9]+')"
  private[operators] def sw(ws: Seq[String]) =
    s"len(list_filter($T, t -> t IN ${sqlStop(ws)}))"

  def oracles: Map[String, String] = Map(
    "txt_gopher_rules" -> {
      val stop = GOPHER_STOP.map(w => s"'$w'").mkString("(", ", ", ")")
      s"""WITH base AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(text, '\\s+'),
         |                w -> length(w) > 0) AS ws,
         |    regexp_split_to_array(text, '\\n') AS ls,
         |    length(text) - length(replace(text, '#', '')) AS n_hash,
         |    len(regexp_extract_all(text, '\\.\\.\\.')) AS n_ell,
         |    len(list_filter($T, t -> t IN $stop)) AS n_stop
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, len(ws) AS n_words,
         |    CAST(coalesce(list_sum(list_transform(ws, w -> length(w))), 0)
         |         AS BIGINT) AS sum_word_len,
         |    n_hash, n_ell, n_stop, len(ls) AS n_lines,
         |    len(list_filter(ls, l -> regexp_matches(l, '^\\s*[-*•]')))
         |      AS n_bullet,
         |    len(list_filter(ls, l -> regexp_matches(l, '\\.\\.\\.\\s*$$')))
         |      AS n_ell_lines,
         |    len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]')))
         |      AS n_alpha_words
         |  FROM base),
         |r AS (
         |  SELECT doc_id, n_words, n_stop,
         |    CASE WHEN n_words > 0 THEN
         |      floor(CAST(sum_word_len AS DOUBLE) / n_words * 1000000.0 + 0.5)
         |        / 1000000.0 END AS mean_word_len,
         |    CASE WHEN n_words > 0 THEN
         |      floor(CAST(n_hash + n_ell AS DOUBLE) / n_words * 1000000.0 + 0.5)
         |        / 1000000.0 END AS symbol_ratio,
         |    floor(CAST(n_bullet AS DOUBLE) / n_lines * 1000000.0 + 0.5)
         |      / 1000000.0 AS frac_bullet_lines,
         |    floor(CAST(n_ell_lines AS DOUBLE) / n_lines * 1000000.0 + 0.5)
         |      / 1000000.0 AS frac_ellipsis_lines,
         |    CASE WHEN n_words > 0 THEN
         |      floor(CAST(n_alpha_words AS DOUBLE) / n_words * 1000000.0 + 0.5)
         |        / 1000000.0 END AS frac_alpha_words
         |  FROM m)
         |SELECT doc_id, n_words, mean_word_len, symbol_ratio,
         |  frac_bullet_lines, frac_ellipsis_lines, frac_alpha_words, n_stop,
         |  CAST((n_words BETWEEN 50 AND 100000)
         |    AND (mean_word_len BETWEEN 3.0 AND 10.0)
         |    AND symbol_ratio <= 0.1
         |    AND frac_bullet_lines <= 0.9
         |    AND frac_ellipsis_lines <= 0.3
         |    AND frac_alpha_words >= 0.8
         |    AND n_stop >= 2 AS INT) AS passes
         |FROM r ORDER BY doc_id""".stripMargin
    },
    "txt_freq_cms_exact" ->
      s"""WITH tok AS (SELECT unnest($T) AS token FROM documents)
         |SELECT token, CAST(count(*) AS BIGINT) AS n_exact
         |FROM tok GROUP BY 1
         |ORDER BY n_exact DESC, token LIMIT 20""".stripMargin,
    "txt_zipf_slope" ->
      s"""WITH tok AS (SELECT unnest($T) AS token FROM documents),
         |c AS (SELECT token, count(*) AS n FROM tok GROUP BY 1
         |      ORDER BY n DESC, token LIMIT 1000),
         |r AS (SELECT n,
         |        row_number() OVER (ORDER BY n DESC, token) AS rank
         |      FROM c),
         |q AS (SELECT
         |    CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000.0 + 0.5)
         |         AS BIGINT) AS x,
         |    CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000.0 + 0.5)
         |         AS BIGINT) AS y
         |  FROM r),
         |s AS (SELECT count(*) AS k, SUM(x) AS sx, SUM(y) AS sy,
         |        SUM(x * y) AS sxy, SUM(x * x) AS sxx
         |      FROM q)
         |SELECT k AS n_ranks,
         |  floor(CAST(k * sxy - sx * sy AS DOUBLE)
         |        / CAST(k * sxx - sx * sx AS DOUBLE)
         |        * 1000000.0 + 0.5) / 1000000.0 AS zipf_slope,
         |  floor((CAST(sy AS DOUBLE)
         |         - CAST(k * sxy - sx * sy AS DOUBLE)
         |           / CAST(k * sxx - sx * sx AS DOUBLE)
         |           * CAST(sx AS DOUBLE))
         |        / CAST(k AS DOUBLE) / 1000000.0
         |        * 1000000.0 + 0.5) / 1000000.0 AS zipf_intercept
         |FROM s""".stripMargin,
    "txt_tfidf" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($T) AS token FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
         |ntok AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY 1),
         |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.token, tf.tf,
         |    floor(((CAST(tf.tf AS DOUBLE) / n_tokens) *
         |           (ln((1.0 + n_docs) / (1.0 + df)) + 1.0)) * 1000000.0 + 0.5)
         |      / 1000000.0 AS tfidf
         |  FROM tf JOIN ntok USING (doc_id) JOIN df USING (token) CROSS JOIN n),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY tfidf DESC, token) AS rk
         |  FROM scored)
         |SELECT doc_id, token, tf, tfidf, rk FROM ranked
         |WHERE rk <= 5 ORDER BY doc_id, rk""".stripMargin,
    "txt_tokens" ->
      s"""SELECT doc_id, len($T) AS n_tokens,
         |  len(list_distinct($T)) AS n_unique_tokens,
         |  CAST(len(list_distinct($T)) AS DOUBLE) / len($T) AS type_token_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_quality" ->
      s"""SELECT doc_id, n_chars_actual, n_tokens, n_alpha, n_stopwords,
         |  alpha_ratio, stopword_ratio,
         |  floor((least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
         |        + alpha_ratio * 0.4
         |        + least(stopword_ratio * 5.0, 1.0) * 0.2) * 1000000.0 + 0.5)
         |    / 1000000.0 AS quality_score
         |FROM (
         |  SELECT doc_id, length(text) AS n_chars_actual,
         |    len($T) AS n_tokens,
         |    length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha,
         |    ${sw(EN_STOP)} AS n_stopwords,
         |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
         |      / length(text) AS alpha_ratio,
         |    CAST(${sw(EN_STOP)} AS DOUBLE) / len($T) AS stopword_ratio
         |  FROM documents) t ORDER BY doc_id""".stripMargin,
    "txt_langid" ->
      s"""SELECT doc_id, lang, predicted_lang,
         |  CAST(predicted_lang = lang AS INT) AS is_correct
         |FROM (
         |  SELECT doc_id, lang,
         |    ${sw(EN_STOP)} AS s_en, ${sw(ES_STOP)} AS s_es,
         |    ${sw(DE_STOP)} AS s_de, ${sw(FR_STOP)} AS s_fr,
         |    ${sw(ZH_STOP)} AS s_zh
         |  FROM documents) s,
         |LATERAL (SELECT CASE
         |  WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |  WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |  WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |  WHEN s_fr >= s_zh THEN 'fr'
         |  ELSE 'zh' END AS predicted_lang) p
         |ORDER BY doc_id""".stripMargin,
    "txt_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint,
        |  substr(md5(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 2) AS shard
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_pii_redact" ->
      """SELECT c_custkey,
        |  len(regexp_extract_all(c_name, '[0-9]{3,}')) AS n_digit_runs,
        |  regexp_replace(regexp_replace(c_name,
        |    '[a-z0-9.]+@[a-z0-9.]+', '<email>', 'g'),
        |    '[0-9]{3,}', '<id>', 'g') AS redacted_name,
        |  c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "txt_heavy_hitters" ->
      s"""WITH tok AS (SELECT $T AS w FROM documents),
         |bg AS (
         |  SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
         |  FROM tok),
         |c AS (SELECT bigram, count(*) AS n FROM bg GROUP BY 1),
         |tot AS (SELECT count(*) AS s FROM bg)
         |SELECT bigram, n FROM c, tot WHERE n > s * 0.001
         |ORDER BY n DESC, bigram""".stripMargin,
    "txt_bigram_freq" ->
      s"""WITH tok AS (SELECT $T AS w FROM documents),
         |bg AS (
         |  SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
         |  FROM tok)
         |SELECT bigram, count(*) AS n FROM bg
         |GROUP BY 1 ORDER BY n DESC, bigram LIMIT 100""".stripMargin,
    "txt_unigram_ppl" -> {
      val avgNll = "CAST(sum_micro AS DOUBLE) / (n_tokens * 1000000.0)"
      s"""WITH tok AS (SELECT doc_id, unnest($T) AS token FROM documents),
         |cnt AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
         |tot AS (SELECT count(*) AS n_total FROM tok),
         |s AS (
         |  SELECT doc_id,
         |    CAST(floor(ln(CAST(n_total AS DOUBLE) / cnt) * 1000000.0 + 0.5)
         |      AS BIGINT) AS s_micro
         |  FROM tok JOIN cnt USING (token) CROSS JOIN tot),
         |d AS (
         |  SELECT doc_id, count(*) AS n_tokens, SUM(s_micro) AS sum_micro
         |  FROM s GROUP BY 1)
         |SELECT doc_id, n_tokens,
         |  ${Tables.round6Sql(avgNll)} AS avg_nll,
         |  ${Tables.round6Sql(s"exp(${Tables.round6Sql(avgNll)})")} AS ppl
         |FROM d ORDER BY doc_id""".stripMargin
    },
    "txt_repetition" ->
      s"""WITH tok AS (SELECT doc_id, $T AS w FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
         |  FROM tok),
         |c AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
         |r AS (
         |  SELECT doc_id, bigram, c,
         |    CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n_bigrams,
         |    row_number() OVER (PARTITION BY doc_id
         |                       ORDER BY c DESC, bigram) AS rn
         |  FROM c)
         |SELECT doc_id, bigram AS top_bigram, c AS n_top, n_bigrams,
         |  CAST(c AS DOUBLE) / n_bigrams AS top_frac
         |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
  )
}
