package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, fingerprinting.
  *
  * All of these are pure column expressions (no UDFs) so they run inside
  * WholeStageCodegen and scale linearly with the scan — the only shuffle any
  * of them introduces is whatever the caller adds afterwards (a groupBy on
  * the result, say). At 100 TB that property is the whole game: these are
  * single-pass map-side transforms.
  */
object TextAnalysis {

  /** Tokens as a column (whitespace tokenization via regexp_extract_all so the
    * empty string cleanly yields an empty array, unlike split). */
  def wsTokens(c: Column): Column = regexp_extract_all(c, lit("\\S+"), lit(0))

  /** Token counts, whitespace + BPE-ish pretokenizer counts. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(wsTokens(col(textCol))).as("n_ws_tokens"),
      size(Cols.bpeTokens(col(textCol))).as("n_bpe_tokens"))
      .orderBy(idCol)

  /** Small function-word list used for both quality scoring and language ID.
    * English set doubles as the "stopword ratio" basis. */
  val StopwordsEn: Seq[String] = Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")
  val StopwordsEs: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "los")
  val StopwordsFr: Seq[String] = Seq("le", "la", "de", "et", "un", "une", "est", "que", "les", "des")
  val StopwordsDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von")

  private def stopHits(tokens: Column, stops: Seq[String]): Column =
    size(filter(tokens, t => t.isInCollection(stops)))

  /** Quality metrics per document: token count, alpha-char count, mean token
    * length, stopword count + a composite quality score. Mirrors the
    * length/stopword-style heuristics used by public LLM-data pipelines
    * (C4/Gopher rules); exact decimal outputs so the DuckDB oracle matches
    * bit-for-bit. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = wsTokens(col(textCol))
    val nTok = size(toks)
    val alphaChars = length(regexp_replace(col(textCol), "[^\\p{L}]", ""))
    val nStop = stopHits(toks, StopwordsEn)
    // double math is IEEE-identical in Spark and DuckDB; final decimal cast
    // pins the printed value so the oracle hash matches
    val meanTokLen = (alphaChars.cast("double") / nTok).cast("decimal(18,4)")
    val stopRatio = (nStop.cast("double") / nTok).cast("decimal(18,4)")
    val score = (when(nTok >= 5 && nTok <= 100000, 1).otherwise(0)
      + when(nStop >= 1, 1).otherwise(0)
      + when(alphaChars >= 20, 1).otherwise(0)).cast("int")
    docs.select(
      col(idCol),
      nTok.as("n_tokens"),
      alphaChars.cast("int").as("alpha_chars"),
      nStop.as("n_stopwords"),
      meanTokLen.as("mean_token_len"),
      stopRatio.as("stopword_ratio"),
      score.as("quality_score"))
      .orderBy(idCol)
  }

  /** Language ID via function-word hit rates — the classic n-gram/stopword
    * heuristic (vectorized; one pass, no UDF). Returns the argmax language
    * and its score; `und` when nothing hits. Deterministic tie-break: highest
    * score wins, then lexicographically smallest language code. */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = wsTokens(lower(col(textCol)))
    val scored: Seq[(String, Seq[String])] = Seq(
      "en" -> StopwordsEn, "es" -> StopwordsEs, "fr" -> StopwordsFr, "de" -> StopwordsDe)
    // array of (score, negated-lang-ordinal) structs; array_max gives the
    // lexicographically-largest struct = highest score, smallest lang on ties
    val entries = scored.zipWithIndex.map { case ((lang, stops), i) =>
      struct(stopHits(toks, stops).as("score"), lit(-i).as("nord"), lit(lang).as("lang"))
    }
    val best = array_max(array(entries: _*))
    docs.select(
      col(idCol),
      when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und")).as("lang_pred"),
      best.getField("score").as("lang_score"))
      .orderBy(idCol)
  }

  /** Document fingerprint: md5 of whitespace-collapsed lower-cased text
    * (Cols.fingerprint) — the cheap "same content modulo spacing" key. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), Cols.fingerprint(col(textCol)).as("fingerprint"))
      .orderBy(idCol)
}
