package graft

import graft.operators.TextAnalysis

/** Token counting, quality scoring, language ID, fingerprint invariances. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCounts: whitespace vs BPE-ish counts on known strings") {
    val df = Seq(
      (1L, "hello world"),
      (2L, "don't panic! it's 42."),
      (3L, ""),
      (4L, "  spaced   out  ")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenCounts(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(out(1L) == (2, 2))
    // don ' t panic ! it ' s 42 . → 10 BPE-ish tokens, 4 ws tokens
    assert(out(2L) == (4, 10))
    assert(out(3L) == (0, 0))
    assert(out(4L) == (2, 2))
  }

  test("qualityScore: components on a controlled doc") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(df, "doc_id", "text").collect().head
    assert(r.getInt(1) == 6)                     // n_tokens
    assert(r.getInt(2) == 17)                    // alpha chars: thecatsatonthemat
    assert(r.getInt(3) == 2)                     // 'the' twice
    assert(math.abs(r.getDecimal(4).doubleValue() - 17.0 / 6) < 1e-3) // mean_token_len
    assert(r.getInt(6) == 2)                     // n_tokens>=5 ✓, stopwords ✓, alpha>=20 ✗
  }

  test("langId: clear-cut sentences per language") {
    val df = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "el gato es de la casa y los perros"),
      (3L, "le chat est dans la maison et les chiens"),
      (4L, "der hund und die katze ist ein tier"),
      (5L, "zzz qqq xxx") // no hits → und
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langId(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "fr")
    assert(out(4L) == "de")
    assert(out(5L) == "und")
  }

  test("fingerprints: whitespace/case-invariant, content-sensitive") {
    val df = Seq(
      (1L, "Hello   World"),
      (2L, "  hello world "),
      (3L, "hello worlds")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("featureHash: same token same dim, counts aggregate, dims bounded") {
    val df = Seq((1L, "alpha alpha beta"), (2L, "alpha gamma")).toDF("doc_id", "text")
    val out = TextAnalysis.featureHash(df, "doc_id", "text", dims = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.keys.forall { case (_, d) => d >= 0 && d < 16 })
    // alpha hashes identically in both docs
    val alphaDim = out.collect { case ((1L, d), 2L) => d }
    assert(alphaDim.size == 1)                      // doc1: alpha count 2 on one dim
    assert(out.contains((2L, alphaDim.head)))       // doc2 hits the same dim for alpha
    assert(out.values.sum == 5L)                    // total token mass preserved
  }

  test("bm25: rarer term outranks common term, absent terms score zero rows out") {
    val df = Seq(
      (1L, "rare word here"),             // hits the rare term
      (2L, "common common common stuff"), // hits the common term, high tf
      (3L, "common stuff again"),
      (4L, "common filler text"),
      (5L, "nothing relevant at all")     // no query terms → filtered out
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(df, "doc_id", "text", Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!out.contains(5L), out.toString)
    // idf(rare: df=1) >> idf(common: df=3): doc 1 must rank above all common-only docs
    assert(out(1L) > out(2L) && out(2L) > out(3L), out.toString)
    // same tf + same dl ⇒ identical scores
    assert(out(3L) == out(4L), out.toString)
  }

  test("invertedIndex: df counts all docs, postings capped and sorted") {
    val docs = (1L to 15L).map(i => (i, s"alpha tok$i")) :+ (16L, "beta alpha")
    val out = TextAnalysis.invertedIndex(docs.toDF("doc_id", "text"), "doc_id", "text", cap = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out("alpha")._1 == 16L)                       // df counts ALL docs
    assert(out("alpha")._2 == (1L to 10L).mkString(",")) // postings: first 10 by id
    assert(out("beta") == ((1L, "16")))
  }

  test("zipfFit: exact power law recovers its exponent; repartition-invariant") {
    // freq(rank r) = ⌊64/r⌋ for r=1..16 → slope ≈ −1 (floor effects and the
    // (18,2) ln quantization push it a few percent off the ideal)
    val corpus = (1 to 16).flatMap { r =>
      Seq.fill(64 / r)(s"w$r")
    }.mkString(" ")
    val df = Seq((1L, corpus)).toDF("doc_id", "text")
    val a = TextAnalysis.zipfFit(df, "text").head()
    assert(a.getLong(0) == 16L)
    assert(math.abs(a.getDouble(1) + 1.0) < 0.05, s"slope=${a.getDouble(1)}")
    val b = TextAnalysis.zipfFit(df.repartition(8), "text").head()
    assert(a.getDouble(1) == b.getDouble(1))
  }

  test("encodingAnomalies: counts replacement, control, mojibake, non-ascii") {
    val df = Seq(
      (1L, "plain ascii text"),
      (2L, "café olé"),        // clean non-ascii only: no anomaly
      (3L, "cafÃ© bad"),       // UTF-8-as-latin1 mojibake: Ã tell
      (4L, "x�y�z"),           // two replacement chars
      (5L, "ab\u0001c\t"),  // one control; tab is whitespace, NOT in the class
      (6L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.encodingAnomalies(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)), r.getDouble(6))).toMap
    assert(out(1L) == (((0L, 0L, 0L, 0L), 0.0)))
    assert(out(2L)._1 == ((0L, 0L, 0L, 2L)) && out(2L)._2 == 0.0)
    assert(out(3L)._1 == ((0L, 0L, 1L, 2L)))  // Ã and © are both non-ascii
    assert(out(3L)._2 == 2.0 / 9.0)
    assert(out(4L)._1 == ((2L, 0L, 0L, 2L)) && out(4L)._2 == 8.0 / 5.0)
    assert(out(5L)._1 == ((0L, 1L, 0L, 0L)) && out(5L)._2 == 1.0 / 5.0)
    assert(out(6L) == (((0L, 0L, 0L, 0L), 0.0)))
  }

  test("blocklistScreen: Aho-Corasick counts overlapping and nested patterns per pattern") {
    val docs = Seq(
      (1L, "ababa"),            // ab at 0,2; ba at 1,3 — cross-overlaps counted
      (2L, "xabcx"),            // abc hits; ab (prefix of abc) hits too; bc nested
      (3L, "clean text here"),  // no pattern
      (4L, "ABABA")             // lower() applies before matching
    ).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistScreen(docs, "doc_id", "text",
        Seq("ab", "ba", "abc", "bc"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((4L, 2L)), out.toString)      // 2×ab + 2×ba
    assert(out(2L) == ((3L, 3L)), out.toString)      // ab, abc, bc each once
    assert(out(3L) == ((0L, 0L)))
    assert(out(4L) == ((4L, 2L)))
    // failure links: a pattern that is a proper suffix of another still fires
    val s = TextAnalysis.blocklistScreen(Seq((9L, "zzabczz")).toDF("doc_id", "text"),
        "doc_id", "text", Seq("abc", "c", "zz"))
      .head()
    assert((s.getLong(1), s.getLong(2)) == ((4L, 3L))) // abc + c + 2×zz
  }

  test("readability: hand-counted Flesch terms, fragment floor, empty doc dropped") {
    val df = Seq(
      (1L, "The cat sat. The dog ran!"),   // 6 words, 2 sentences, 6 syllable groups
      (2L, "no punctuation here"),         // fragment -> sentence floor of 1
      (3L, "")                             // zero words -> dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readability(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(out.keySet == Set(1L, 2L))
    val (w, sn, sy, ease) = out(1L)
    assert((w, sn, sy) == ((6L, 2L, 6L)), out(1L).toString)
    val expect = BigDecimal(206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(ease == expect, s"$ease vs $expect")
    // "no punctuation here": 3 words, 1 sentence, syllables o/u-a-io/e-e -> groups
    assert(out(2L)._2 == 1L)
  }

  test("compressionRatio: repetition compresses, entropy does not, deterministic") {
    val rng = new scala.util.Random(7)
    val noisy = (1 to 4000).map(_ => rng.nextPrintableChar()).mkString
    val df = Seq(
      (1L, "spam " * 800),       // pure repetition
      (2L, noisy),               // high entropy
      (3L, "")                   // empty -> null ratio
    ).toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatio(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 4000L)
    assert(out(1L).getDouble(3) < 0.05, out(1L).toString)   // boilerplate squashes
    assert(out(2L).getDouble(3) > 0.5, out(2L).toString)    // entropy resists
    assert(out(3L).getLong(1) == 0L && out(3L).isNullAt(3))
    // pure function of the text: repartition changes nothing
    val p = TextAnalysis.compressionRatio(df.repartition(5), "doc_id", "text")
      .collect().map(_.toSeq).toSeq
    assert(p == TextAnalysis.compressionRatio(df, "doc_id", "text").collect().map(_.toSeq).toSeq)
  }

  test("compression pattern corpus: Spark deflate == JVM precompute; patterns span the signal range") {
    // the q237 ★ contract: the engine's per-partition reused-Deflater loop
    // must produce byte counts EQUAL to the fresh-Deflater oracle
    // precompute, for every pattern (same zlib, same level)
    val ids = (0L until 128L) // two full pattern cycles
    val out = TextAnalysis.compressionRatio(
      TextAnalysis.synthCompressionDocs(ids.toDF("doc_id"), "doc_id"),
      "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    ids.foreach { id =>
      val txt = TextAnalysis.compressionPatternText((id % 64).toInt)
      val in = txt.getBytes("UTF-8")
      assert(out(id) == ((in.length.toLong, TextAnalysis.deflatedLength(in))),
        s"doc $id: ${out(id)} vs precompute")
    }
    // directional hand case: the all-repetitive pattern (k=0 cycles a/b/c)
    // compresses far better than the all-random one (k=63 is 7/8 xorshift)
    def ratio(k: Int): Double = {
      val in = TextAnalysis.compressionPatternText(k).getBytes("UTF-8")
      TextAnalysis.deflatedLength(in).toDouble / in.length
    }
    assert(ratio(0) < 0.15, s"repetitive pattern ratio ${ratio(0)}")
    assert(ratio(63) > 0.5, s"random pattern ratio ${ratio(63)}")
    // the mix level is k % 8 (0 = all repetitive … 7 = 7/8 random), so the
    // ratio is monotone in the MIX LEVEL, not in raw k
    assert(ratio(0) < ratio(4) && ratio(4) < ratio(7),
      s"mix ratio must order the signal: ${ratio(0)} / ${ratio(4)} / ${ratio(7)}")
  }

  test("winnowPairs: shared substring ≥ w+k-1 guarantees a shared fingerprint; disjoint docs never pair") {
    import spark.implicits._
    // k=4, w=2 ⇒ any shared substring of length ≥ 5 must yield ≥1 shared
    // selected fingerprint (the winnowing guarantee)
    val shared = "hello winnowing world"
    val docs = Seq(
      (1L, "xx " + shared + " qq"),
      (2L, "mm nn " + shared),
      (3L, "0123456789012345678901234")  // disjoint alphabet: no common 4-gram
    ).toDF("doc_id", "text")
    val out = TextAnalysis.winnowPairs(docs, "doc_id", "text",
        k = 4, w = 2, maxDocs = 10, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.contains((1L, 2L)), out.toString)
    assert(out((1L, 2L)) >= 1L)
    assert(out.keySet == Set((1L, 2L)), out.toString) // doc 3 pairs with nobody
    // identical docs share (almost) their whole fingerprint set
    val twins = Seq((1L, shared), (2L, shared)).toDF("doc_id", "text")
    val tw = TextAnalysis.winnowPairs(twins, "doc_id", "text",
      k = 4, w = 2, maxDocs = 10, minShared = 1).collect()
    assert(tw.length == 1 && tw(0).getLong(2) >= 3, tw.mkString(","))
  }

  test("heapsFit: all-new vocabulary per doc ⇒ V(n) = n ⇒ β exactly 1; repeated corpus flattens β") {
    import spark.implicits._
    // every doc contributes 5 never-seen tokens: cum types == cum tokens
    val fresh = (1L to 20L).map(d =>
      (d, (1 to 5).map(i => s"w${d}x$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.heapsFit(fresh, "doc_id", "text").collect()(0)
    assert(out.getLong(0) == 20L && out.getDouble(1) == 1.0, out.toString)
    // the same 5 tokens repeated: V(n) is constant after doc 1 ⇒ β ≈ 0
    val stale = (1L to 20L).map(d => (d, "a b c d e")).toDF("doc_id", "text")
    val b = TextAnalysis.heapsFit(stale, "doc_id", "text").collect()(0).getDouble(1)
    assert(b >= 0.0 && b < 0.1, b.toString)
  }

  test("vocabCoverage: hand frequency-of-frequencies, Chao1 and unseen mass exact") {
    import spark.implicits._
    // tokens: a×3, b×2, c×2, d×1, e×1, f×1 → S=6, N=10, f1=3, f2=2
    // Chao1 = 6 + 9/4 = 8.25; P0 = 3/10
    val docs = Seq((1L, "a a a b b"), (2L, "c c d e f")).toDF("doc_id", "text")
    val r = TextAnalysis.vocabCoverage(docs, "text").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((10L, 6L, 3L, 2L)), r.toString)
    assert(r.getDouble(4) == 8.25 && r.getDouble(5) == 0.3, r.toString)
    // no doubletons: bias-corrected fallback S + f1(f1−1)/2 = 3 + 3
    val nd = Seq((1L, "x y z")).toDF("doc_id", "text")
    val r2 = TextAnalysis.vocabCoverage(nd, "text").collect()(0)
    assert(r2.getDouble(4) == 6.0, r2.toString)
  }

  test("rougeOverlap: hand pair — unigram 2/3, bigram 1 of 2; clipping caps repeats") {
    val docs = Seq((1L, "a b c"), (2L, "a b d"), (3L, "x x x"), (4L, "x y"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("cand", "ref")
    val out = TextAnalysis.rougeOverlap(docs, "doc_id", "text", pairs, "cand", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap
    val p12 = out(1L)
    assert(p12.getLong(4) == 2, "unigram overlap a,b")
    assert(math.abs(p12.getDouble(7) - 2.0 / 3) < 1e-8, "rouge1_f = 2·2/(3+3)")
    assert(p12.getLong(10) == 1, "bigram overlap 'a b'")
    assert(p12.getDouble(13) == 0.5, "rouge2_f = 2·1/(2+2)")
    // clipped: cand "x x x" vs ref "x y" — min(3,1)=1, not 3
    val p34 = out(3L)
    assert(p34.getLong(4) == 1, "clipped unigram overlap")
  }

  test("rougeOverlap: reference without bigrams yields NULL rouge2, not a crash") {
    val docs = Seq((1L, "a b"), (2L, "a")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("cand", "ref")
    val r = TextAnalysis.rougeOverlap(docs, "doc_id", "text", pairs, "cand", "ref")
      .collect()(0)
    assert(r.getLong(4) == 1 && !r.isNullAt(7), "rouge1 present")
    assert(r.isNullAt(12), "rouge2_r null when ref has no bigram")
  }

  test("lexicalDiversity: exact TTR/hapax/YuleK on a hand corpus") {
    val docs = Seq(("en", "a a b"), ("de", "x y z")).toDF("lang", "text")
    val out = TextAnalysis.lexicalDiversity(docs, "lang", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getLong(1) == 3 && en.getLong(2) == 2 && en.getLong(3) == 1)
    assert(math.abs(en.getDouble(4) - 2.0 / 3) < 1e-8, "ttr")
    assert(en.getDouble(5) == 0.5, "hapax")
    // K = 1e4·(Σc²−N)/N² = 1e4·(5−3)/9
    assert(math.abs(en.getDouble(6) - 1e4 * 2 / 9) < 1e-6, "yule k")
    // all-hapax group: K = 0
    assert(out("de").getDouble(6) == 0.0)
  }

  test("scriptProfile: each planted script lands in exactly its class") {
    val docs = Seq(
      ("ascii", "abc 123"),            // 3 ascii letters, 3 digits, 7 chars
      ("ru", "привет"),                // 6 cyrillic
      ("zh", "你好"),                  // 2 cjk
      ("ko", "안녕"),                  // 2 hangul
      ("fr", "café")                   // 3 ascii + 1 latin1
    ).toDF("source", "text")
    val out = TextAnalysis.scriptProfile(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    def counts(s: String) = (out(s).getLong(2), out(s).getLong(3), out(s).getLong(4),
      out(s).getLong(5), out(s).getLong(6), out(s).getLong(7), out(s).getLong(8))
    assert(counts("ascii") == ((7L, 3L, 3L, 0L, 0L, 0L, 0L)), out("ascii").toString)
    assert(counts("ru") == ((6L, 0L, 0L, 0L, 6L, 0L, 0L)), out("ru").toString)
    assert(counts("zh") == ((2L, 0L, 0L, 0L, 0L, 2L, 0L)), out("zh").toString)
    assert(counts("ko") == ((2L, 0L, 0L, 0L, 0L, 0L, 2L)), out("ko").toString)
    assert(counts("fr") == ((4L, 3L, 0L, 1L, 0L, 0L, 0L)), out("fr").toString)
    assert(out("ru").getDouble(10) == 1.0, "cyrillic share")
    assert(out("zh").getDouble(11) == 1.0, "cjk share")
  }

  test("mixedScriptAudit: homoglyph spoof flags, single-script docs stay clean") {
    val docs = Seq(
      (1L, "hello world"),
      (2L, "p\u0430yp\u0430l login"),       // Cyrillic а twice inside latin
      (3L, "\u4E2D\u6587 with text"),       // CJK + latin
      (4L, "\u03B1\u03B2\u03B3"))          // pure Greek
      .toDF("doc_id", "text")
    val out = TextAnalysis.mixedScriptAudit(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(5), r.getInt(6), r.getInt(7)))).toMap
    assert(out(1L) == ((10L, 0L, 0L, 1, 0)), out(1L).toString)
    assert(out(2L)._2 == 2 && out(2L)._3 == 2 && out(2L)._5 == 1,
      s"confusable Cyrillic inside latin flags: ${out(2L)}")
    assert(out(3L)._5 == 1, s"cjk+latin mixes: ${out(3L)}")
    assert(out(4L) == ((0L, 0L, 0L, 1, 0)), s"pure Greek is single-script: ${out(4L)}")
  }

  test("vocabularyTurnover: adjacent-slice type churn and Jaccard exact") {
    val docs = Seq(
      ("s1", "a b c"), ("s1", "a"),      // slice types {a,b,c}
      ("s2", "b c d"),                   // {b,c,d}
      ("s3", "x")                        // {x}
    ).toDF("source", "text")
    val out = TextAnalysis.vocabularyTurnover(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getDouble(7))).toMap
    // s1→s2: shared {b,c}, new {d}, churned {a}, J = 2/4
    assert(out(("s1", "s2")) == ((3L, 3L, 2L, 1L, 1L, 0.5)), out.toString)
    // s2→s3: disjoint
    assert(out(("s2", "s3")) == ((3L, 1L, 0L, 1L, 3L, 0.0)), out.toString)
    assert(out.size == 2, "exactly n_slices - 1 pairs")
  }

  test("vocabularyRichness: Chao1 from the frequency spectrum; Good–Turing unseen mass") {
    // counts a:1 b:2 c:2 d:1 → D=4, N=6, f1=2, f2=2 →
    // chao1 = 4 + 2·1/(2·3) = 4.3333; unseen = 2/6
    val docs = Seq((1L, "a b b c c"), (2L, "d")).toDF("doc_id", "text")
    val r = TextAnalysis.vocabularyRichness(docs, "text").collect()(0)
    assert(r.getLong(0) == 6L && r.getLong(1) == 4L
      && r.getLong(2) == 2L && r.getLong(3) == 2L, r.toString)
    assert(r.getDouble(4) == 4.3333, r.toString)
    assert(r.getDouble(5) == math.round(2d / 6 * 1e9).toDouble / 1e9, r.toString)
    // saturated corpus (no singletons): chao1 = D, unseen mass 0
    val sat = Seq((1L, "x x y y"), (2L, "x y")).toDF("doc_id", "text")
    val s = TextAnalysis.vocabularyRichness(sat, "text").collect()(0)
    assert(s.getDouble(4) == 2.0 && s.getDouble(5) == 0.0, s.toString)
  }

  test("tokenBurstiness: bursty content word ≫ evenly sprinkled word; zeros count") {
    // 4 docs: 'a' piles 4× into one doc (Fano 4), 'b' appears once in
    // three docs (Fano 1/3) — same-ish totals, opposite dispersion
    val docs = Seq((1L, "a a a a"), (2L, "b"), (3L, "b"), (4L, "b"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tokenBurstiness(docs, "doc_id", "text", topM = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.map(_._1).toSeq == Seq("a", "b"), "total-count order")
    val m = out.toMap
    assert(m("a") == ((1L, 4L, 1.0, 4.0)), s"burst: ${m("a")}")
    assert(m("b")._4 == math.round(1.0 / 3 * 1e9).toDouble / 1e9, s"even: ${m("b")}")
    assert(m("a")._4 > m("b")._4, "burstiness separates the pair TF alone cannot")
  }
}
