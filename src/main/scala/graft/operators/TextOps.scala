package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline — language ID,
  * quality scoring, sub-word-ish tokenization, document fingerprinting
  * (BASELINE.json:6). All pure built-in expressions: per-document work is
  * embarrassingly parallel map-side compute with no shuffle until the
  * final (small) aggregate/sort, which is exactly what survives a 100 TB
  * corpus scan.
  */
object TextOps {

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "en" -> Seq("the", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "les", "et", "des", "une"),
    "zh" -> Seq("de", "shi", "bu", "wo", "le", "ren"))

  /** N-gram (word-marker) language ID: score each language by marker-set
    * overlap with the document vocabulary, pick the argmax (struct-max ⇒
    * deterministic score-then-code tie-break). The marker sets are a
    * heuristic stand-in for real char-n-gram profiles — the SHAPE (k
    * parallel set-overlap scores + argmax, zero shuffles) is the part that
    * matters at scale.
    */
  def textLangid(documents: DataFrame): DataFrame = {
    val vocab = array_distinct(split(col("text"), " "))
    val scored = langMarkers.map { case (code, markers) =>
      struct(
        size(array_intersect(vocab, array(markers.map(lit): _*))).as("s"),
        lit(code).as("l"))
    }
    documents
      .select(
        col("doc_id"),
        col("lang").as("lang_meta"),
        array_max(array(scored: _*)).getField("s").as("best_score"),
        array_max(array(scored: _*)).getField("l").as("lang_pred"))
      .orderBy("doc_id")
  }

  /** Quality scoring: length/token/alpha/stopword signals folded into one
    * bounded score — the cheap pre-filter stage before expensive pipeline
    * steps (dedup, embedding).
    */
  def textQuality(documents: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val stop = array(Seq("the", "and", "of", "to", "in", "a", "is", "it")
      .map(lit): _*)
    val nChars = length(col("text"))
    val nToks = size(toks)
    val alphaRatio = length(regexp_replace(col("text"), "[^a-z]", ""))
      .cast("double") / nChars
    val stopRatio = size(array_intersect(array_distinct(toks), stop))
      .cast("double") / lit(8.0)
    val lenScore = least(nToks.cast("double") / lit(50.0), lit(1.0))
    documents
      .select(
        col("doc_id"),
        nChars.as("n_chars_txt"),
        nToks.as("n_toks"),
        round(alphaRatio, 6).as("alpha_ratio"),
        round(stopRatio, 6).as("stop_ratio"),
        round(lit(0.5) * lenScore + lit(0.3) * alphaRatio + lit(0.2) * stopRatio, 6)
          .as("quality"))
      .orderBy("doc_id")
  }

  /** BPE-style pre-tokenization: regex classes (letter runs / digit runs /
    * single symbols) instead of whitespace — the sub-word-friendly split
    * every modern tokenizer starts from. Term frequencies over the corpus.
    */
  def textTokensRegex(documents: DataFrame): DataFrame =
    documents
      .select(explode(
        regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"))
      .orderBy("token")

  /** PII scrubbing — a non-negotiable training-data step: emails and
    * phone numbers replaced by typed placeholders, with per-document hit
    * counts for the scrub audit. The corpus carries no PII, so
    * deterministic synthetic contact lines are appended first (the test
    * harness for the masking regexes); masking is pure map-side regex.
    */
  def textPiiMask(documents: DataFrame): DataFrame = {
    val dirty = concat(
      col("text"), lit(" contact: user"), col("doc_id").cast("string"),
      lit("@example.com or +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    val masked = regexp_replace(
      regexp_replace(dirty, "[a-z0-9]+@[a-z]+\\.[a-z]+", "<EMAIL>"),
      "\\+1-555-[0-9]{4}", "<PHONE>")
    documents
      .select(
        col("doc_id"),
        masked.as("masked"),
        size(regexp_extract_all(dirty, lit("[a-z0-9]+@[a-z]+\\.[a-z]+"), lit(0)))
          .as("n_emails"),
        size(regexp_extract_all(dirty, lit("\\+1-555-[0-9]{4}"), lit(0)))
          .as("n_phones"))
      .orderBy("doc_id")
  }

  /** TF-IDF weights per (document, term): term frequency and document
    * frequency from two aggregations over one exploded token stream, the
    * corpus size via a broadcast 1-row aggregate (a scalar subquery — no
    * driver-side count), idf = ln((N+1)/(df+1)). The feature-weighting
    * step of classic retrieval / quality pipelines; every stage is a
    * partial+final hash aggregate on a compact key.
    */
  def textTfidf(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = toks.select("doc_id", "token").distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val ndocs = documents.agg(countDistinct(col("doc_id")).as("n_docs"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(ndocs))
      .select(
        col("doc_id"), col("token"), col("tf"), col("df"),
        round(col("tf") * log((col("n_docs") + 1).cast("double") / (col("df") + 1)), 6)
          .as("tfidf"))
      .orderBy("doc_id", "token")
  }

  /** 60-bit portable token hash: md5 is identical across engines, and 15
    * hex chars fit a signed 64-bit int exactly.
    */
  private[operators] def tokenHash60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** Document fingerprint: polynomial rolling hash over the token-hash
    * sequence — ORDER-sensitive (unlike a bag hash), so re-ordered
    * documents fingerprint differently; constant state, one linear fold
    * per document.
    */
  def textFingerprint(documents: DataFrame): DataFrame = {
    val M = 1000000007L
    val hashes = transform(split(col("text"), " "), t => tokenHash60(t) % M)
    documents
      .select(
        col("doc_id"),
        aggregate(hashes, lit(0L), (acc, h) => (acc * 131L + h) % M).as("fingerprint"),
        size(hashes).as("n_toks"))
      .orderBy("doc_id")
  }
}
