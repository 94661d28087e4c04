package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** BM25 ranking (Robertson/Okapi, the lexical-retrieval workhorse behind
    * benchmark decontamination and retrieval-augmented data selection) for a
    * FIXED term list, top-k docs. k1=1.2, b=0.75.
    *
    * Shape for scale: per-term tf is a pure column expression (one pass,
    * zero shuffle); corpus stats (N, avgdl, per-term df) are ONE tiny
    * aggregate row broadcast back; ranking is orderBy+limit = TakeOrdered
    * (per-partition heaps, never a global sort). The corpus never shuffles.
    *
    * Cross-engine exactness: every per-term score is one fixed chain of
    * IEEE double ops (ln once), terms are summed as a fixed left-assoc
    * expression tree (not an order-free SUM), and the final score is
    * quantized through DECIMAL(18,6) on both sides. */
  /** Inverted index (token → document frequency + first-`cap` postings).
    * The retrieval-side sibling of [[bm25]]: build once, broadcast or
    * bucket-join against query terms.
    *
    * Shape for scale: postings are rank-limited PER TOKEN **before** any
    * list materializes — a WindowGroupLimit keeps per-partition heaps of
    * `cap` rows, so a stop-word with 10⁹ postings never assembles a 10⁹
    * element array in one task (the classic inverted-index OOM). df comes
    * from the same deduped (token, doc) set as a plain count. Postings
    * serialize as a comma-joined string — the segment format a real index
    * would delta-encode. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    cap: Int = 10): DataFrame = {
    val posting = docs
      .select(explode(array_distinct(Curation.tokens(col(textCol)))).as("token"),
        col(idCol).as("__id"))
    // df is a separate partial-aggregated groupBy, NOT a whole-partition
    // count frame on the rank window: a count frame buffers each token's
    // full partition inside the window operator AND defeats the
    // WindowGroupLimit pre-shuffle trim that keeps hot tokens bounded —
    // the map-side-combined count + token-keyed join costs one extra small
    // shuffle instead (timed equal at bench scale, bounded at 100 TB)
    val dfCounts = posting.groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("token").orderBy("__id")
    val capped = posting
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .groupBy("token")
      .agg(array_join(array_sort(collect_list(col("__id"))), ",").as("postings"))
    dfCounts.join(capped, Seq("token"))
      .select(col("token"), col("df"), col("postings"))
      .orderBy("token")
  }

  /** Feature hashing (the hashing trick): project each document's token
    * counts onto a fixed `dims`-dimensional space via dim = md5(token) mod
    * dims — no vocabulary pass, no dictionary state, memory O(dims) per
    * doc regardless of corpus vocabulary. The standard text featurizer
    * when the vocabulary is unbounded (web-scale training data). Emitted
    * as sparse (doc, dim, weight) triples — the only sane dense-free
    * format at 100 TB. Map-side explode + one (doc, dim) aggregate;
    * md5-derived dims reproduce verbatim in the oracle. */
  def featureHash(docs: DataFrame, idCol: String, textCol: String,
                  dims: Int = 64): DataFrame = {
    val tok = explode(Curation.tokens(col(textCol)))
    docs.select(col(idCol), tok.as("tok"))
      .select(col(idCol),
        pmod(conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"), lit(dims.toLong))
          .as("dim"))
      .groupBy(col(idCol), col("dim"))
      .agg(count(lit(1)).as("weight"))
      .orderBy(col(idCol), col("dim"))
  }

  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], topK: Int = 20): DataFrame = {
    require(terms.nonEmpty)
    val toks = Curation.tokens(col(textCol))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === lit(t))).as(s"tf$i")
    }
    val base = docs.select(
      (col(idCol) +: size(toks).as("dl") +: tfCols): _*)
    val statAggs =
      count(lit(1)).cast("double").as("n") +:
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl") +:
      terms.indices.map(i =>
        count(when(col(s"tf$i") > 0, 1)).cast("double").as(s"df$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val scored = base.crossJoin(broadcast(stats))
    // per-term score, associating exactly like the oracle SQL text
    def termScore(i: Int): Column = {
      val tf = col(s"tf$i").cast("double")
      val idf = log((col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)) + lit(1.0))
      idf * (tf * lit(2.2)) / (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    }
    val score = terms.indices.map(termScore).reduceLeft(_ + _)
    scored
      .withColumn("bm25", score.cast("decimal(18,6)").cast("double"))
      .filter(col("bm25") > 0)
      .select(col(idCol), col("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }

  /** Zipf-law fit over the corpus vocabulary: OLS slope of ln(frequency) on
    * ln(rank). Natural-language corpora slope ≈ −1; a slope far from it is
    * a corpus-level red flag (template spam flattens the head, synthetic
    * word salad flattens the tail) — the corpus-wide complement of the
    * per-doc entropy/novelty signals.
    *
    * Corpus-sized work ends at the token-count aggregate: ranking runs on
    * the VOCABULARY via the two-pass global row number (never a
    * 1-partition window), and the fit reuses [[Analytics.regressionByGroup]]'s
    * exact-decimal power sums, so the slope is partitioning-invariant and
    * engine-exact. */
  def zipfFit(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs
      .select(explode(Curation.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .withColumn("negc", -col("c")) // globalRowNumber sorts ascending
    val ranked = Analytics.globalRowNumber(counts, Seq("negc", "tok"), "rnk")
    val pts = ranked.select(lit("corpus").as("g"),
      log(col("rnk").cast("double")).as("x"),
      log(col("c").cast("double")).as("y"))
    Analytics.regressionByGroup(pts, "g", col("x"), col("y"))
      .select(col("n").as("vocab_n"), col("slope"))
  }

  /** Encoding-anomaly profile per document — the cheap pre-filter that
    * catches mojibake (UTF-8 read as Latin-1: 'Ã' is its tell), lost bytes
    * (U+FFFD replacement chars), and binary-contaminated text (raw control
    * chars) before they poison tokenizers downstream. Pure codegen'd column
    * arithmetic, zero shuffle; the control class is the explicit-hex common
    * regex dialect (see [[Curation.normalizeText]]); the score is one
    * division of exact integers. */
  def encodingAnomalies(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val n = length(t)
    def missing(stripped: Column): Column = (n - length(stripped)).cast("long")
    docs.select(
        col(idCol),
        n.cast("long").as("n_chars"),
        missing(replace(t, lit("�"), lit(""))).as("repl_n"),
        missing(regexp_replace(t, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "")).as("ctrl_n"),
        missing(replace(t, lit("Ã"), lit(""))).as("moji_n"),
        missing(regexp_replace(t, "[^\\x00-\\x7F]", "")).as("non_ascii_n"))
      .withColumn("anomaly_score",
        when(col("n_chars") > 0,
          (col("repl_n") * 4 + col("moji_n") * 2 + col("ctrl_n")).cast("double") /
            col("n_chars").cast("double"))
          .otherwise(0d))
      .orderBy(idCol)
  }

  /** Blocklist screen via Aho–Corasick: per-document occurrence counts over a
    * multi-pattern dictionary in ONE text scan — the safety/content filter
    * for curation (banned terms, leaked secrets markers, competitor names).
    * The per-pattern-regexp alternative scans the text K times (or compiles
    * a K-way alternation whose NFA backtracks); the automaton is O(text) per
    * document REGARDLESS of dictionary size, which is the difference between
    * feasible and not at 10⁴⁺ patterns × 100 TB. Patterns ride the closure
    * (Spark broadcasts the lambda); the automaton builds once per partition.
    *
    * Counts are ALL occurrences per pattern independently (what A–C's
    * output links report). For patterns with no proper prefix that is also
    * a suffix — true of ordinary words — this equals the non-overlapping
    * count, which the oracle mirrors with replace-length arithmetic.
    * Matching is case-sensitive on lower(text), like [[Curation.tokens]]. */
  def blocklistScreen(docs: DataFrame, idCol: String, textCol: String,
                      patterns: Seq[String]): DataFrame = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty) &&
      patterns.distinct.size == patterns.size, "patterns: non-empty, distinct")
    val spark = docs.sparkSession
    import spark.implicits._
    val pats = patterns.toArray
    docs.select(col(idCol).cast("long"), lower(col(textCol))).as[(Long, String)]
      .mapPartitions { it =>
        // Aho–Corasick 1975: trie + BFS failure links; per-node aggregated
        // pattern-id output (own matches ++ failure-chain matches)
        val goto = scala.collection.mutable.ArrayBuffer(
          scala.collection.mutable.HashMap.empty[Char, Int])
        val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
        pats.zipWithIndex.foreach { case (p, pi) =>
          var s = 0
          p.foreach { ch =>
            s = goto(s).getOrElseUpdate(ch, {
              goto += scala.collection.mutable.HashMap.empty[Char, Int]
              ends += Nil
              goto.size - 1
            })
          }
          ends(s) = pi :: ends(s)
        }
        val n = goto.size
        val fail = new Array[Int](n)
        val out = new Array[List[Int]](n)
        out(0) = ends(0)
        val bfs = scala.collection.mutable.Queue.empty[Int]
        goto(0).valuesIterator.foreach { v => fail(v) = 0; out(v) = ends(v); bfs += v }
        while (bfs.nonEmpty) {
          val u = bfs.dequeue()
          goto(u).foreach { case (ch, v) =>
            var f = fail(u)
            while (f != 0 && !goto(f).contains(ch)) f = fail(f)
            fail(v) = goto(f).getOrElse(ch, 0) // v has greater depth — never v
            out(v) = ends(v) ++ out(fail(v))
            bfs += v
          }
        }
        it.map { case (id, text) =>
          val counts = new Array[Long](pats.length)
          var s = 0
          val t = if (text == null) "" else text
          var i = 0
          while (i < t.length) {
            val ch = t.charAt(i)
            while (s != 0 && !goto(s).contains(ch)) s = fail(s)
            s = goto(s).getOrElse(ch, 0)
            out(s).foreach(pi => counts(pi) += 1)
            i += 1
          }
          (id, counts.sum, counts.count(_ > 0).toLong)
        }
      }
      .toDF(idCol, "n_hits", "n_patterns")
      .orderBy(idCol)
  }

  /** Flesch reading ease + Flesch–Kincaid grade (Kincaid et al. 1975) —
    * the classic readability pair, used as a cheap fluency prior when
    * curating training text. Sentences = runs of [.!?] (floored at 1 so
    * fragments don't divide by zero); syllables ≈ vowel-group runs, the
    * standard regex approximation — spaces break groups, so counting over
    * the whole lowered text equals the per-word sum.
    *
    * One scan-speed projection: three regexp counts + two fixed double
    * chains over exact integer ratios, quantized once — no UDF, no
    * shuffle, engine-portable term for term. */
  def readability(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counted = docs.select(
      col(idCol),
      size(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
        .cast("long").as("n_words"),
      greatest(lit(1L),
        size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))).cast("long"))
        .as("n_sentences"),
      size(regexp_extract_all(lower(col(textCol)), lit("[aeiouy]+"), lit(0)))
        .cast("long").as("n_syllables"))
    val wps = col("n_words").cast("double") / col("n_sentences").cast("double")
    val spw = col("n_syllables").cast("double") / col("n_words").cast("double")
    counted
      .filter(col("n_words") > 0)
      .select(col(idCol), col("n_words"), col("n_sentences"), col("n_syllables"),
        (lit(206.835) - lit(1.015) * wps - lit(84.6) * spw)
          .cast("decimal(18,6)").cast("double").as("flesch_ease"),
        (lit(0.39) * wps + lit(11.8) * spw - lit(15.59))
          .cast("decimal(18,6)").cast("double").as("fk_grade"))
      .orderBy(idCol)
  }

  /** Deflate compression ratio per document — the "does this text carry
    * information or repetition" signal the Gopher/Dolma pipelines use to
    * drop boilerplate and generated spam (highly compressible ⇒ repetitive;
    * ratio ≈ 1 ⇒ high-entropy noise). DEFLATE has no SQL twin, but at a
    * fixed level it IS deterministic — so the registered query (q237) runs
    * over [[synthCompressionDocs]]' pattern corpus and is ★ oracle-checked
    * against byte counts precomputed once in the JVM and pinned as a DuckDB
    * constant table (the q34 exact-synthesis trick); real-text behavior
    * stays spec-pinned (known repetitive vs incompressible inputs).
    *
    * Typed mapPartitions with ONE Deflater reused per partition (the
    * object's native window allocation dominates per-doc cost at small doc
    * sizes); fixed level ⇒ deterministic byte counts on any JVM that ships
    * the same zlib, and the ratio is a pure function of the text. Scales
    * at scan speed: no shuffle, per-row work linear in bytes. */
  def compressionRatio(docs: DataFrame, idCol: String, textCol: String,
                       level: Int = 6): DataFrame = {
    import docs.sparkSession.implicits._
    val ds = docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
    ds.mapPartitions { it =>
      val defl = new java.util.zip.Deflater(level)
      val buf = new Array[Byte](1 << 16)
      it.map { case (id, text) =>
        val in = if (text == null) Array.emptyByteArray
                 else text.getBytes("UTF-8")
        defl.reset()
        defl.setInput(in)
        defl.finish()
        var out = 0L
        while (!defl.finished()) out += defl.deflate(buf)
        (id, in.length.toLong, out)
      }
    }.toDF(idCol, "n_bytes", "n_deflated")
      .withColumn("ratio",
        when(col("n_bytes") > 0,
          (col("n_deflated").cast("double") / col("n_bytes").cast("double"))
            .cast("decimal(18,6)").cast("double")))
      .orderBy(idCol)
  }

  /** Deterministic ASCII pattern text for the ★ compression oracle: pattern
    * `k` interleaves 8-char repetitive runs (a/b/c cycle) with 8-char
    * xorshift-seeded pseudo-random runs at a k-dependent mix (k%8 of every
    * 8 blocks random), over a k-dependent length — so the 64 patterns span
    * the quality-signal range from highly repetitive (low ratio) to
    * near-random (ratio → 1). Pure function of k, ASCII-only (UTF-8 bytes =
    * chars), shared verbatim by the Spark synthesis and the JVM-side oracle
    * precompute. */
  private[graft] def compressionPatternText(k: Int): String = {
    val n = 160 + 23 * k
    val sb = new java.lang.StringBuilder(n)
    var x = 0x9E3779B97F4A7C15L ^ (k.toLong * 0x100000001B3L)
    var i = 0
    while (i < n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      val c =
        if ((i >> 3) % 8 < (k % 8)) ('a' + java.lang.Long.remainderUnsigned(x, 26).toInt).toChar
        else ('a' + i % 3).toChar
      sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Synthesize the compression-oracle corpus: one [[compressionPatternText]]
    * per row, keyed by id % patterns — every text a pure function of the id,
    * so expected DEFLATE byte counts are precomputable constants while the
    * per-row deflate work still scales with the corpus. */
  def synthCompressionDocs(docs: DataFrame, idCol: String,
                           patterns: Int = 64): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map(id => (id, compressionPatternText(math.floorMod(id, patterns).toInt)))
    }.toDF(idCol, "text")
  }

  /** DEFLATE output size at `level` — the oracle-side precompute twin of
    * [[compressionRatio]]'s per-row loop (same JVM zlib, same level, fresh
    * Deflater ≡ reset Deflater for size purposes). */
  private[graft] def deflatedLength(in: Array[Byte], level: Int = 6): Long = {
    val defl = new java.util.zip.Deflater(level)
    try {
      defl.setInput(in); defl.finish()
      val buf = new Array[Byte](1 << 16)
      var out = 0L
      while (!defl.finished()) out += defl.deflate(buf)
      out
    } finally defl.end()
  }

  /** Winnowing fingerprint overlap (the MOSS local-fingerprinting scheme,
    * Schleimer et al. SIGMOD'03): hash every `k`-char gram, slide a window
    * of `w` consecutive gram hashes, select the minimum hash per window
    * (ties broken to the LEFTMOST position by folding the zero-padded
    * position into the compared string — deterministic where the paper's
    * rightmost rule needs stateful scanning), and report document pairs
    * sharing at least `minShared` selected fingerprints. Guarantees of the
    * scheme: any shared substring of length ≥ w+k-1 yields at least one
    * shared fingerprint, and the selected set is position-independent —
    * which is what makes it a local (edit-robust) alternative to
    * [[fingerprints]]' whole-doc hash.
    *
    * Scale shape: gram hashing + window-min are per-doc window work (one
    * doc-keyed sort, no corpus interaction); matching shuffles DISTINCT
    * (fingerprint, id) pairs only — never gram rows; fingerprints appearing
    * in more than `maxDocs` documents are dropped before pairing (the
    * boilerplate cap that bounds every bucket, same contract as minhash
    * LSH), so the self-join is bucket-bounded and never corpus-quadratic. */
  /** Heaps'-law vocabulary-growth fit: V(n) ≈ K·n^β — "how fast does new
    * vocabulary appear as the corpus grows", the dual of [[zipfFit]] and
    * the planning number behind tokenizer vocab sizing ("will 2× more data
    * bring 2^β× more types?"). Observation points are per-document corpus
    * prefixes in doc-id order: cumulative token count n_d vs cumulative
    * distinct-type count V_d, fit by ln-ln least squares.
    *
    * V_d never re-scans prefixes: each type attributes itself to its FIRST
    * document (one token-keyed min aggregate), new-type counts roll up per
    * doc, and both cumulative axes come from the two-pass distributed
    * prefix scan ([[Evaluation.globalCumSum]]) — no one-partition window,
    * no quadratic prefix work. The regression reuses
    * [[Analytics.regressionByGroup]]'s decimal-quantized recipe. */
  def heapsFit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val perDoc = docs.select(col(idCol),
      size(Curation.tokens(col(textCol))).cast("long").as("n_tok"))
    val newTypes = docs
      .select(col(idCol), explode(Curation.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(min(col(idCol)).as("first_doc"))
      .groupBy("first_doc").agg(count(lit(1)).as("v_new"))
    val spine = perDoc
      .join(newTypes, perDoc(idCol) === newTypes("first_doc"), "left")
      .select(col(idCol), col("n_tok"), coalesce(col("v_new"), lit(0L)).as("v_new"))
    val cum = Evaluation.globalCumSum(spine, Seq(idCol), Seq("n_tok", "v_new"))
    val pts = cum.filter(col("cum_n_tok") > 0 && col("cum_v_new") > 0)
      .select(lit("corpus").as("g"),
        log(col("cum_n_tok").cast("double")).as("x"),
        log(col("cum_v_new").cast("double")).as("y"))
    Analytics.regressionByGroup(pts, "g", col("x"), col("y"))
      .select(col("n").as("n_points"), col("slope").as("beta"))
  }

  /** Vocabulary coverage estimate: Chao1 unseen-type richness
    * Ŝ = S + f₁²/(2f₂) (Chao 1984) and the Good–Turing unseen-probability
    * mass P₀ = f₁/N — "how much vocabulary has this corpus NOT shown us
    * yet", the planning numbers behind tokenizer vocab sizing and
    * how-much-more-data decisions ([[heapsFit]] fits the growth CURVE;
    * these estimate its ceiling and the next token's novelty odds).
    *
    * One token-keyed count aggregate → a frequency-of-frequencies
    * collapse (tiny); f₁, f₂, S, N are exact integers and both estimates
    * are single mirrored double chains, scale 6. f₂ = 0 → Chao1's
    * bias-corrected fallback S + f₁(f₁−1)/2.
    *
    * [[vocabularyRichness]] is the SAME operator's other published
    * readout (the always-bias-corrected small-sample Chao1 form) — both
    * ride [[freqSpectrum]]; SURVEY §2 counts them as one capability. */
  def vocabCoverage(docs: DataFrame, textCol: String): DataFrame = {
    val g = freqSpectrum(docs, textCol)
    val f1 = col("f1").cast("double"); val f2 = col("f2").cast("double")
    val sd = col("s").cast("double")
    g.select(col("n").cast("long").as("n_tokens"), col("s").cast("long").as("n_types"),
      col("f1").cast("long").as("singletons"), col("f2").cast("long").as("doubletons"),
      when(col("f2") > 0, (sd + f1 * f1 / (lit(2d) * f2)))
        .otherwise(sd + f1 * (f1 - 1d) / 2d)
        .cast("decimal(18,6)").cast("double").as("chao1_richness"),
      when(col("n") > 0, (f1 / col("n").cast("double"))
        .cast("decimal(18,9)").cast("double")).as("unseen_mass"))
  }

  /** Shared frequency-of-frequencies core behind [[vocabCoverage]] and
    * [[vocabularyRichness]]: one token-keyed count aggregate collapsed to
    * the four exact integer spectrum scalars (types s, tokens n,
    * singletons f1, doubletons f2). Empty corpus → one all-zero row. */
  private def freqSpectrum(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Curation.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("s"), coalesce(sum("c"), lit(0L)).as("n"),
        count(when(col("c") === 1, lit(1))).as("f1"),
        count(when(col("c") === 2, lit(1))).as("f2"))

  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 24, w: Int = 8, maxDocs: Int = 20,
                  minShared: Int = 5): DataFrame = {
    // Fingerprint selection runs as ONE typed pass per document with a
    // monotonic deque (O(len) per doc), not explode + two windows: the
    // declarative form (char-position explode → row_number + sliding-min
    // frames → distinct) is expressible but measured 26 s at sf0.1 vs ~3 s
    // here — a ×|text| row blowup through a sort-based WindowExec for what
    // is a per-row streaming computation (the langId precedent). Semantics
    // are bit-identical to the SQL twin: the window key is
    // md5(gram).take(16) + "@" + zero-padded 1-based position, so the
    // sliding MIN has a total order (leftmost occurrence wins ties) and
    // the kept fingerprint is the 16-char hash prefix. BMP caveat: Java
    // code units == SQL code points only without astral-plane chars (the
    // oracle contract for this corpus; a 4-byte-emoji corpus would need a
    // codePoint walk here).
    val spark = docs.sparkSession
    import spark.implicits._
    val sel = docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        if (text == null || text.length < k + w - 1) Iterator.empty
        else {
          val n = text.length - k + 1
          val md = java.security.MessageDigest.getInstance("MD5")
          val hexd = "0123456789abcdef"
          def comb(i: Int): String = {
            val dig = md.digest(text.substring(i, i + k).getBytes("UTF-8"))
            md.reset()
            val sb = new java.lang.StringBuilder(24)
            var b = 0
            while (b < 8) { // 8 bytes → the 16-char hash prefix
              sb.append(hexd((dig(b) >> 4) & 0xf)); sb.append(hexd(dig(b) & 0xf))
              b += 1
            }
            sb.append('@')
            val p = (i + 1).toString
            var z = 7 - p.length
            while (z > 0) { sb.append('0'); z -= 1 }
            sb.append(p).toString
          }
          val keys = Array.tabulate(n)(comb)
          // sliding min over windows of w via monotonic deque
          val out = new scala.collection.mutable.HashSet[String]
          val dq = new java.util.ArrayDeque[Int]
          var i = 0
          while (i < n) {
            while (!dq.isEmpty && keys(dq.peekLast) >= keys(i)) dq.pollLast()
            dq.addLast(i)
            if (dq.peekFirst <= i - w) dq.pollFirst()
            if (i >= w - 1) out.add(keys(dq.peekFirst).substring(0, 16))
            i += 1
          }
          out.iterator.map(h => (id, h))
        }
      }
      .toDF(idCol, "h")
      // 3 consumers downstream (cap count + both pair sides): checkpoint
      // so the fingerprint pass runs once
      .localCheckpoint()
    val capped = sel.groupBy("h").agg(count(lit(1)).as("nd"))
      .filter(col("nd").between(2, maxDocs)).select("h")
    val hits = sel.join(capped, Seq("h"))
    val pairs = hits.select(col("h"), col(idCol).as("id_a"))
      .join(hits.select(col("h"), col(idCol).as("id_b")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("id_a", "id_b")
    pairs
  }

  /** ROUGE-1/ROUGE-2 n-gram overlap between declared (candidate, reference)
    * document pairs — the standard summarization/paraphrase proximity
    * readout (Lin 2004), used in a data pipeline to SCORE aligned pairs
    * (distillation outputs vs sources, near-dup candidates) rather than
    * just to flag them: recall says how much of the reference survives,
    * precision how much of the candidate is grounded.
    *
    * EXACT: per (pair, gram) clipped counts min(c_cand, c_ref) are
    * integers; P = ov/n_cand, R = ov/n_ref, and F1 = 2·ov/(n_cand+n_ref)
    * (the algebraic collapse — never P·R/(P+R) over rounded doubles) are
    * each ONE double division of exact integers. Gram expansion is
    * regex-once via [[Curation.ngramRows]]; counts shuffle on
    * (pair, gram) — pair-local, never corpus-crossing; text joins hash on
    * the doc id. Pairs whose candidate or reference has no bigram (len<2)
    * emit NULL rouge2 metrics, not a crash. */
  def rougeOverlap(docs: DataFrame, idCol: String, textCol: String,
                   pairs: DataFrame, candCol: String, refCol: String): DataFrame = {
    val p = pairs.select(col(candCol).cast("long").as("cand_id"),
      col(refCol).cast("long").as("ref_id"))
    val txt = docs.select(col(idCol).cast("long").as("__id"),
      col(textCol).as("__txt"))
    def sideCounts(side: String, n: Int): DataFrame = {
      val idc = if (side == "cand") "cand_id" else "ref_id"
      val joined = p.join(txt, p(idc) === txt("__id"))
        .select(col("cand_id"), col("ref_id"), col("__txt"))
      Curation.ngramRows(joined, Seq("cand_id", "ref_id"), "__txt", n, "gram")
        .groupBy("cand_id", "ref_id", "gram")
        .agg(count(lit(1)).as(s"c_$side"))
    }
    def level(n: Int, tag: String): DataFrame =
      sideCounts("cand", n).join(sideCounts("ref", n),
          Seq("cand_id", "ref_id", "gram"), "full_outer")
        .groupBy("cand_id", "ref_id")
        .agg(sum(coalesce(col("c_cand"), lit(0L))).as("ncT"),
          sum(coalesce(col("c_ref"), lit(0L))).as("nrT"),
          sum(least(coalesce(col("c_cand"), lit(0L)),
            coalesce(col("c_ref"), lit(0L)))).as("ovT"))
        .select(col("cand_id"), col("ref_id"),
          col("ncT").cast("long").as(s"n${tag}_cand"),
          col("nrT").cast("long").as(s"n${tag}_ref"),
          col("ovT").cast("long").as(s"overlap$tag"))
    def metrics(df: DataFrame, tag: String): DataFrame = {
      val ov = col(s"overlap$tag").cast("double")
      val nc = col(s"n${tag}_cand"); val nr = col(s"n${tag}_ref")
      df.withColumn(s"rouge${tag}_p",
          when(nc > 0, (ov / nc.cast("double")).cast("decimal(18,9)").cast("double")))
        .withColumn(s"rouge${tag}_r",
          when(nr > 0, (ov / nr.cast("double")).cast("decimal(18,9)").cast("double")))
        .withColumn(s"rouge${tag}_f",
          when(nc + nr > 0, (lit(2d) * ov / (nc + nr).cast("double"))
            .cast("decimal(18,9)").cast("double")))
    }
    val u = metrics(level(1, "1"), "1")
    val b = metrics(level(2, "2"), "2")
    u.join(b, Seq("cand_id", "ref_id"), "left")
      .orderBy("cand_id", "ref_id")
  }

  /** Lexical-diversity profile per group — type–token ratio, hapax share,
    * and Yule's K (Yule 1944): the vocabulary-richness scorecard that
    * separates template/boilerplate buckets (low TTR, K through the roof)
    * from organic prose, at corpus-bucket grain where [[Curation
    * .repetitionStats]] works per document. K = 10⁴·(Σ_types c² − N)/N²
    * is length-invariant, so buckets of different sizes compare fairly.
    *
    * One (group, token) hash aggregate (map-side combined) then one
    * group-grain pass: N = Σc, V = #types, V1 = #{c=1}, Σc² — all exact
    * integers (Σc² in DECIMAL(38,0)); TTR/hapax/K are single double
    * divisions of exact integers, quantized scale 9. */
  def lexicalDiversity(docs: DataFrame, groupCol: String,
                       textCol: String): DataFrame = {
    val tok = docs.select(col(groupCol).as("grp"),
        explode(Curation.tokens(col(textCol))).as("tok"))
      .groupBy("grp", "tok").agg(count(lit(1)).as("c"))
    val c19 = (c: Column) => c.cast("decimal(19,0)")
    val g = tok.groupBy("grp").agg(
      sum("c").as("nTok"), count(lit(1)).as("v"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("v1"),
      sum((c19(col("c")) * col("c")).cast("decimal(38,0)")).as("sumSq"))
    val nD = col("nTok").cast("double")
    g.select(col("grp"), col("nTok").cast("long").as("n_tokens"),
        col("v").cast("long").as("n_types"),
        col("v1").cast("long").as("n_hapax"),
        when(col("nTok") > 0, (col("v").cast("double") / nD)
          .cast("decimal(18,9)").cast("double")).as("ttr"),
        when(col("v") > 0, (col("v1").cast("double") / col("v").cast("double"))
          .cast("decimal(18,9)").cast("double")).as("hapax_ratio"),
        when(col("nTok") > 0,
          (lit(1e4d) * (col("sumSq").cast("double") - nD) / (nD * nD))
            .cast("decimal(18,9)").cast("double")).as("yule_k"))
      .orderBy("grp")
  }

  /** Unicode-script profile per source — [[languageId]]'s upstream sanity
    * check and the "is this source secretly Cyrillic / CJK / emoji soup"
    * audit a multilingual corpus runs before trusting any stopword-based
    * language signal. Seven explicit-codepoint-range classes (ASCII
    * letters, digits, ASCII whitespace+punct rides in `other`, Latin-1
    * letters, Cyrillic, CJK unified, Hangul) counted by the
    * [[encodingAnomalies]] replace-length recipe — pure codegen'd column
    * arithmetic in the RE2 ∩ Java common dialect (`\\x{hhhh}` ranges),
    * ONE source-grain aggregate, shares are single divisions of exact
    * integers. Both engines count CODEPOINTS (Spark numChars, DuckDB
    * length), so the classes and the `other` remainder agree exactly. */
  def scriptProfile(docs: DataFrame, sourceCol: String,
                    textCol: String): DataFrame = {
    val t = col(textCol)
    val n = length(t)
    def cnt(cls: String): Column = n - length(regexp_replace(t, cls, ""))
    val perDoc = docs.select(col(sourceCol).as("source"),
      n.cast("long").as("n"),
      cnt("[A-Za-z]").cast("long").as("ascii_alpha"),
      cnt("[0-9]").cast("long").as("digit"),
      cnt("[\\x{00C0}-\\x{00FF}]").cast("long").as("latin1"),
      cnt("[\\x{0400}-\\x{04FF}]").cast("long").as("cyrillic"),
      cnt("[\\x{4E00}-\\x{9FFF}]").cast("long").as("cjk"),
      cnt("[\\x{AC00}-\\x{D7AF}]").cast("long").as("hangul"))
    val g = perDoc.groupBy("source").agg(
      count(lit(1)).as("n_docs"), sum("n").as("n_chars"),
      sum("ascii_alpha").as("ascii_alpha"), sum("digit").as("digit"),
      sum("latin1").as("latin1"), sum("cyrillic").as("cyrillic"),
      sum("cjk").as("cjk"), sum("hangul").as("hangul"))
    def share(c: String): Column =
      when(col("n_chars") > 0, (col(c).cast("double") / col("n_chars").cast("double"))
        .cast("decimal(18,9)").cast("double")).otherwise(0d).as(s"${c}_share")
    g.select(col("source"), col("n_docs"), col("n_chars"),
        col("ascii_alpha"), col("digit"), col("latin1"),
        col("cyrillic"), col("cjk"), col("hangul"),
        share("ascii_alpha"), share("cyrillic"), share("cjk"))
      .orderBy("source")
  }

  /** Per-document mixed-script / homoglyph audit — the data-poisoning
    * defense next to [[scriptProfile]]'s per-source census: a "latin"
    * document carrying Cyrillic or Greek lookalikes (а е о р с х,
    * ο α ε...) is the classic spoofing/SEO-cloaking signature, and
    * CJK-in-latin (or the reverse) flags mislabeled or template-injected
    * docs. Counts per script class, a confusable-Cyrillic count
    * (the Unicode-TR39-style lookalike subset), the number of distinct
    * script classes present, and the mixed flag.
    *
    * Pure codegen'd replace-length counting (the q146/q331 recipe) in
    * the RE2 ∩ Java character-class dialect — one projection, no
    * explode, no UDF; shares are left to the caller (counts are exact
    * integers, nothing to quantize). Doc-grain output with total id
    * order. */
  def mixedScriptAudit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    def cnt(cls: String): Column = length(t) - length(regexp_replace(t, cls, ""))
    val latin = cnt("[A-Za-z]").cast("long")
    val cyr = cnt("[\\x{0400}-\\x{04FF}]").cast("long")
    val greek = cnt("[\\x{0370}-\\x{03FF}]").cast("long")
    val cjk = cnt("[\\x{4E00}-\\x{9FFF}]").cast("long")
    val confus = cnt("[\\x{0430}\\x{0435}\\x{043E}\\x{0440}\\x{0441}\\x{0445}\\x{0443}" +
      "\\x{0410}\\x{0415}\\x{041E}\\x{0420}\\x{0421}\\x{0425}]").cast("long")
    docs.select(col(idCol),
        latin.as("latin"), cyr.as("cyrillic"), greek.as("greek"), cjk.as("cjk"),
        confus.as("confusable_cyr"))
      .withColumn("n_scripts",
        (col("latin") > 0).cast("int") + (col("cyrillic") > 0).cast("int") +
          (col("greek") > 0).cast("int") + (col("cjk") > 0).cast("int"))
      .withColumn("mixed_flag", (col("n_scripts") >= 2).cast("int"))
      .orderBy(idCol)
  }

  /** Vocabulary turnover between ADJACENT corpus slices (snapshots,
    * crawls, sources ordered by name): per consecutive pair, how many
    * token types are new, how many churned away, and the type-level
    * Jaccard — the vocabulary-drift companion of [[Evaluation]]'s
    * distribution-drift family (PSI/KS watch VALUE distributions; this
    * watches the TYPE SET a tokenizer/vocab build actually sees).
    *
    * One distinct (slice, token) aggregate over the corpus (map-side
    * combinable — the only row-sized shuffle), then one token-keyed
    * self-join between slice i and i+1 per pair plus slice-sized count
    * aggregates. The slice index comes from a window over the DISTINCT
    * slice list (dim-sized single partition — slices are snapshots, not
    * data). All counts exact; jaccard is one double division, 9 dp. */
  def vocabularyTurnover(docs: DataFrame, sliceCol: String,
                         textCol: String): DataFrame = {
    val st = docs
      .select(col(sliceCol).cast("string").as("slice"),
        explode(array_distinct(Curation.tokens(col(textCol)))).as("tok"))
      .distinct()
      .localCheckpoint() // three consumers: index join, both pair sides
    val idx = st.select(col("slice")).distinct()
      .withColumn("i", row_number().over(Window.orderBy("slice")))
      .localCheckpoint() // dim-sized
    val sti = st.join(idx, Seq("slice"))
    val totals = sti.groupBy("i", "slice").agg(count(lit(1)).as("n_types"))
    val shared = sti.select(col("i").as("ip"), col("tok"))
      .join(sti.select((col("i") - 1).as("ip"), col("tok")), Seq("ip", "tok"))
      .groupBy("ip").agg(count(lit(1)).as("n_shared"))
    val prev = totals.select(col("i").as("ip"), col("slice").as("prev_slice"),
      col("n_types").as("n_prev"))
    val next = totals.select((col("i") - 1).as("ip"), col("slice").as("next_slice"),
      col("n_types").as("n_next"))
    prev.join(next, Seq("ip"))
      .join(shared, Seq("ip"), "left").na.fill(0L, Seq("n_shared"))
      .select(col("prev_slice"), col("next_slice"),
        col("n_prev").cast("long").as("n_prev"),
        col("n_next").cast("long").as("n_next"),
        col("n_shared").cast("long").as("n_shared"),
        (col("n_next") - col("n_shared")).cast("long").as("n_new"),
        (col("n_prev") - col("n_shared")).cast("long").as("n_churned"),
        (col("n_shared").cast("double") /
          (col("n_prev") + col("n_next") - col("n_shared")).cast("double"))
          .cast("decimal(18,9)").cast("double").as("jaccard"))
      .orderBy("prev_slice")
  }

  /** The BIAS-CORRECTED readout of [[vocabCoverage]]'s operator — NOT a
    * separate capability (same [[freqSpectrum]] core, SURVEY §2 counts
    * the pair as one row): Chao 1984's small-sample form
    * D + f₁(f₁−1)/(2(f₂+1)), finite even at f₂ = 0, plus the same
    * Good–Turing unseen mass f₁/N, in round-trip 1e4 / nano fixed-point
    * instead of decimal casts. Empty corpus → zeros/NULLs. */
  def vocabularyRichness(docs: DataFrame, textCol: String): DataFrame =
    freqSpectrum(docs, textCol)
      .select(col("n").cast("long").as("n_tokens"),
        col("s").cast("long").as("n_distinct"),
        col("f1").cast("long").as("f1"), col("f2").cast("long").as("f2"),
        when(col("s") > 0,
          round((col("s").cast("double")
              + (col("f1") * (col("f1") - 1)).cast("double")
                / (lit(2d) * (col("f2").cast("double") + 1d))) * lit(1e4d))
            .cast("long").cast("double") / lit(1e4d)).as("chao1"),
        when(col("n") > 0,
          round(col("f1").cast("double") / col("n").cast("double") * lit(1e9d))
            .cast("long").cast("double") / lit(1e9d)).as("gt_unseen_mass"))

  /** Token burstiness (Church & Gale 1995): the Fano factor
    * var/mean of a token's PER-DOCUMENT count across the whole corpus
    * — ~1 for Poisson "function words" sprinkled evenly, ≫1 for bursty
    * content words that pile into the few documents that are ABOUT
    * them. The adaptation signal behind cache language models and a
    * quality split TF-IDF alone misses (same total count, opposite
    * dispersion). Zeros count: absence from other documents is the
    * burst; the corpus size N comes from the 1-row frame.
    *
    * One (doc, token) count aggregate (the tokenEntropy shuffle), one
    * token re-aggregate of exact integer power sums (scale-0 decimals
    * — c² ≪ 10³⁸), top-M by total via TakeOrderedAndProject, and the
    * Fano/mean chains are mirrored doubles in nano fixed-point. */
  def tokenBurstiness(docs: DataFrame, idCol: String, textCol: String,
                      topM: Int = 30): DataFrame = {
    val counts = docs
      .select(col(idCol).as("doc"), explode(Curation.tokens(col(textCol))).as("tok"))
      .groupBy("doc", "tok").agg(count(lit(1)).as("c"))
    val nDocs = docs.agg(count(lit(1)).as("__nd"))
    val d0 = (c: Column) => c.cast("decimal(19,0)")
    val perTok = counts.groupBy("tok")
      .agg(count(lit(1)).as("df_t"),
        sum(d0(col("c"))).cast("decimal(38,0)").as("total"),
        sum((d0(col("c")) * d0(col("c"))).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("sq"))
    val nD = col("__nd").cast("double")
    val mean = col("total").cast("double") / nD
    val fano = ((col("sq").cast("double")
      - col("total").cast("double") * col("total").cast("double") / nD)
      / (nD - 1d)) / mean
    perTok.crossJoin(broadcast(nDocs))
      .select(col("tok"),
        col("df_t").cast("long").as("n_docs_with"),
        col("total").cast("long").as("total_count"),
        (round(mean * lit(1e9d)).cast("long").cast("double") / lit(1e9d))
          .as("mean_per_doc"),
        when(col("__nd") > 1,
          round(fano * lit(1e9d)).cast("long").cast("double") / lit(1e9d))
          .otherwise(lit(null).cast("double")).as("fano"))
      .orderBy(col("total_count").desc, col("tok")).limit(topM)
  }
}
