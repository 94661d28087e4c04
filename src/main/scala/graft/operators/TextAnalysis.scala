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
    // pins the printed value so the oracle hash matches. Zero-token (empty/
    // null) docs get null ratios — ANSI mode makes x/0 fatal, not NaN.
    val meanTokLen = when(nTok > 0, (alphaChars.cast("double") / nTok).cast("decimal(18,4)"))
    val stopRatio = when(nTok > 0, (nStop.cast("double") / nTok).cast("decimal(18,4)"))
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

  /** Language ID via function-word hit counts — the classic stopword
    * heuristic. Returns the argmax language and its score; `und` when nothing
    * hits. Tie-break: highest score, then lexicographically smallest code.
    *
    * Implemented as a single-pass typed map (tokenize once, HashSet lookups)
    * rather than column expressions: a pure-expression argmax references the
    * best-struct three times and Catalyst expands each reference, so the
    * per-language scoring would run 12× per row (measured ~10× slower at
    * sf0.1). One JVM-speed pass per partition is the scale-correct shape —
    * still embarrassingly parallel, no shuffle beyond the final ORDER BY. */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    // sorted by code so strict > keeps the smallest code on score ties
    val langSets: Seq[(String, Set[String])] = Seq(
      "de" -> StopwordsDe.toSet, "en" -> StopwordsEn.toSet,
      "es" -> StopwordsEs.toSet, "fr" -> StopwordsFr.toSet)
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = Option(text).getOrElse("").toLowerCase.split("\\s+")
          var bestLang = "und"; var bestScore = 0
          langSets.foreach { case (lang, set) =>
            var sc = 0; var i = 0
            while (i < toks.length) { if (set.contains(toks(i))) sc += 1; i += 1 }
            if (sc > bestScore) { bestScore = sc; bestLang = lang }
          }
          (id, bestLang, bestScore)
        }
      }
      .toDF(idCol, "lang_pred", "lang_score")
      .orderBy(idCol)
  }

  /** Document fingerprint: md5 of whitespace-collapsed lower-cased text
    * (Cols.fingerprint) — the cheap "same content modulo spacing" key. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), Cols.fingerprint(col(textCol)).as("fingerprint"))
      .orderBy(idCol)
}
