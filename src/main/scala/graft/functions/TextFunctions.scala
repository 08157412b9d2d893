package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the training-data pipeline operators
  * (tokenization, shingling, normalization). All pure built-in
  * expressions — codegen-friendly, no UDFs (SURVEY.md §2.K discipline).
  */
object TextFunctions {

  /** BPE-ish word tokenizer: maximal runs of `[a-z0-9]` over lowercased
    * text. Matches the oracle's `regexp_extract_all` exactly (both Java
    * and RE2 regex treat this ASCII class identically). */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** Distinct word k-shingles (k=3): the n-gram unit for Jaccard/MinHash
    * dedup. Documents with fewer than k tokens get an empty set. */
  def shingles(toks: Column, k: Int = 3): Column =
    when(size(toks) >= k,
      array_distinct(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Distinct word k-shingles as 64-bit hashes (xxhash64 over the k
    * tokens) — the shingle form every dedup operator actually joins and
    * aggregates on. Identity-only: set cardinalities (and therefore
    * Jaccard) are preserved up to 2^-64 collision odds, while the
    * explode/shuffle moves 8-byte longs instead of ~40-byte strings. */
  def shingleHashes(toks: Column, k: Int = 3): Column =
    when(size(toks) >= k,
      array_distinct(transform(sequence(lit(0), size(toks) - k),
        i => xxhash64((0 until k).map(j => element_at(toks, i + j + 1)): _*))))
      .otherwise(array().cast("array<bigint>"))

  /** Distinct word k-shingles as REPLAYABLE 60-bit hashes: the int64
    * value of the first 15 hex chars of md5 over the space-joined k
    * tokens. Unlike [[shingleHashes]] (xxhash64 — a Spark-internal
    * function no other engine reproduces), this is bit-identical in
    * DuckDB (`CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`), which
    * makes every MinHash/SimHash signature built on it fully
    * oracle-replayable — signatures are VALUES there, not just
    * identities. Costs ~2× xxhash64 per shingle; used only where
    * signature values must cross engines. 60 bits keeps the parse
    * inside a signed int64 in both engines; collision odds at 1e12
    * corpus shingles are ~1e-12 per pair — the same regime the 64-bit
    * form already accepts. */
  def shingleHashesMd5(toks: Column, k: Int = 3): Column =
    when(size(toks) >= k,
      array_distinct(transform(sequence(lit(0), size(toks) - k),
        i => conv(substring(md5(concat_ws(" ",
            (0 until k).map(j => element_at(toks, i + j + 1)): _*)), 1, 15),
          16, 10).cast("long"))))
      .otherwise(array().cast("array<bigint>"))

  /** All word k-grams in order (multiset — counts preserved, unlike
    * [[shingles]]), for corpus n-gram statistics. */
  def ngrams(toks: Column, k: Int = 2): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Whitespace-collapsed lowercase normal form for fingerprinting. */
  def normalized(text: Column): Column =
    regexp_replace(lower(text), "\\s+", " ")

  /** Count of tokens that appear in a fixed stopword list. */
  def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  val EN_STOP: Seq[String] = Seq("the", "and", "of", "a", "to", "in")
  val ES_STOP: Seq[String] = Seq("el", "la", "de", "y", "en", "los")
  val DE_STOP: Seq[String] = Seq("der", "die", "und", "das", "ein", "zu")
  val FR_STOP: Seq[String] = Seq("le", "la", "et", "les", "des", "un")
  val ZH_STOP: Seq[String] = Seq("de5", "shi4", "le5", "zai4", "he2", "you3")
}
