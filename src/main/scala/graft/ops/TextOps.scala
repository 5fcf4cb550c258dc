package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, language ID, quality scoring, and
  * document fingerprinting.
  *
  * Everything is a pure `Column`/`DataFrame` combinator built from
  * codegen-friendly `org.apache.spark.sql.functions` (no UDFs): at 100 TB
  * these run inside whole-stage codegen over the parquet scan with full
  * pushdown, shuffling only when an operator aggregates.
  *
  * Determinism note: all scores are integer-ratio arithmetic and all folds
  * are sequential (`aggregate` over arrays), so results are bit-identical
  * across engines — the DuckDB oracle mirrors each expression 1:1.
  */
object TextOps {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword pre-tokenization count: alpha runs, digit runs, and
    * single non-alphanumeric marks (the classic GPT-2-style pre-split,
    * simplified to an engine-portable regex). */
  val BpePattern = "[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9 ]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Stopword lists used for language ID and quality scoring. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "and", "of", "is"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de5", "le5", "shi4", "he2", "zai4"))

  private def hits(text: Column, words: Seq[String]): Column =
    size(array_intersect(array_distinct(tokens(text)),
      array(words.map(lit): _*)))

  /** n-gram/stopword-heuristic language ID: argmax of per-language marker
    * hits; ties resolve to the lexicographically smallest language code
    * (explicit CASE chain so the oracle can mirror the tiebreak exactly). */
  def langId(text: Column): Column = {
    val langs = Stopwords.keys.toSeq.sorted
    val score = langs.map(l => l -> hits(text, Stopwords(l))).toMap
    // lang l wins if strictly greater than all earlier, >= all later
    langs.init.foldRight(lit(langs.last)) { (l, elseCol) =>
      val later = langs.dropWhile(_ != l).drop(1)
      val earlier = langs.takeWhile(_ != l)
      val cond = (earlier.map(e => score(l) > score(e)) ++
        later.map(e => score(l) >= score(e))).reduce(_ && _)
      when(cond, lit(l)).otherwise(elseCol)
    }
  }

  /** Quality metrics: token count, mean token length (chars/token), marker
    * hit-rate, non-alphanumeric character ratio. */
  def nTokens(text: Column): Column = tokenCount(text)
  def meanTokenLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / tokenCount(text)
  def stopwordRatio(text: Column): Column = {
    val all = Stopwords.values.flatten.toSeq.distinct.sorted
    size(filter(tokens(text), t => array_contains(array(all.map(lit): _*), t)))
      .cast("double") / tokenCount(text)
  }
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", "")))
      .cast("double") / length(text)

  /** Composite quality score in [0,1]: length sweet-spot × stopword signal
    * × low punctuation. Pure integer-ratio arithmetic. */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val lenScore = least(n / 50d, lit(1.0))
    (lenScore + stopwordRatio(text) + (lit(1.0) - punctRatio(text))) / 3
  }

  val FpMod = 1000000007L

  /** Order-sensitive rolling document fingerprint: sequential left fold
    * over tokens of acc*31 + (ascii(tok)*131 + length(tok)), mod 1e9+7.
    * Content AND order sensitive, engine-portable (DuckDB: list_reduce). */
  def fingerprint(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) =>
        pmod(acc * 31 + (ascii(t) * 131 + length(t)).cast("long"), lit(FpMod)))

  /** Deterministic hash split for train/validation/held-out partitioning:
    * bucket in [0, buckets) from the md5 of the id column — stable across
    * runs, engines, and cluster layouts (never `rand()`, which breaks
    * retries and reproducibility). Select a split with e.g.
    * `where(hashSplit(col("doc_id")) < 95)` for a 95% train cut. */
  def hashSplit(id: Column, buckets: Int = 100): Column = {
    require(buckets > 0, "buckets must be positive")
    // first 15 hex digits fit a signed long exactly (60 bits, no sign risk)
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(buckets))
  }

  // ---------------------------------------------------------- chunking

  /** Context-window chunking: split each document into token chunks of
    * `chunkTokens` with `overlap` tokens carried between neighbors — the
    * preprocessing step that feeds embedding models and training-context
    * packing. One output row per (doc, chunk).
    *
    * Scale shape: pure per-row expressions + one posexplode, zero shuffle;
    * the chunk list materializes as index arithmetic and each chunk slices
    * BEFORE exploding, so memory is bounded by one chunk, not the doc.
    * All arithmetic is integer (ceil via (x + s - 1) / s), mirrored 1:1 by
    * the DuckDB oracle. */
  def chunk(docs: DataFrame, chunkTokens: Int = 64, overlap: Int = 16,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      s"need chunkTokens > overlap >= 0, got ($chunkTokens, $overlap)")
    val stride = chunkTokens - overlap
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    // number of stride starts covering every token at least once; the
    // double division truncates via the int cast (values are positive)
    val nChunks = ((greatest(nTok - overlap, lit(1)) + (stride - 1)) / stride)
      .cast("int")
    docs
      .select(col(idCol), toks.as("__toks"), nTok.as("n_tokens"),
        posexplode(sequence(lit(0), nChunks - 1))
          .as(Seq("chunk_id", "__start")))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ",
          slice(col("__toks"), col("__start") * stride + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(lit(chunkTokens), col("n_tokens") - col("__start") * stride)
          .as("n_chunk_tokens"))
  }

  // ------------------------------------------------------ PII redaction

  /** PII patterns chosen for IDENTICAL semantics under Java regex (Spark)
    * and RE2 (DuckDB): character classes and bounded quantifiers only —
    * no backreferences, no lookaround (RE2 has neither). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\d{3}[-.]\\d{3,4}[-.]\\d{4}"
  val SsnRe   = "\\d{3}-\\d{2}-\\d{4}"

  /** PII scrub — the anonymization pass a training pipeline runs before
    * release: per-category match counts (on the ORIGINAL text) plus the
    * text with emails/phones/SSN-style ids replaced by typed tags.
    * Pure codegen'd string expressions, zero shuffle; the patterns are
    * deliberately RE2-portable so the DuckDB oracle mirrors 1:1. Phone
    * (3-3/4-4 digits) and SSN (3-2-4) shapes are disjoint, so the
    * sequential replaces never interact. */
  def redact(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_emails", regexp_count(t, lit(EmailRe)))
      .withColumn("n_phones", regexp_count(t, lit(PhoneRe)))
      .withColumn("n_ids", regexp_count(t, lit(SsnRe)))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          SsnRe, "<ID>"))
  }

  /** All text metrics for a documents table, one pass. */
  def analyze(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol),
      nTokens(t).as("n_tokens"),
      bpeTokenCount(t).as("n_bpe_tokens"),
      meanTokenLen(t).as("mean_token_len"),
      stopwordRatio(t).as("stopword_ratio"),
      punctRatio(t).as("punct_ratio"),
      qualityScore(t).as("quality"),
      langId(t).as("pred_lang"),
      fingerprint(t).as("fingerprint"))
  }
}
