package graft

/** Partitioning-invariance sweep (the round-5/6 ordered evidence): shuffle
  * parallelism is an EXECUTION detail and must never leak into results.
  * The heaviest queries (by isolated sf0.1 ranking, spanning the iterative
  * graph family, LSH, hash aggregation, k-means, density clustering and
  * window attribution) run at shuffle.partitions ∈ {8, 64, 512} on sf0.001
  * and every row must match BIT-EXACTLY across the three settings — doubles
  * compared by raw IEEE bits, which is the whole point: every operator
  * quantizes its order-dependent folds before emitting, so parallelism
  * cannot flip an ulp. A failure here is a missing quantization, the class
  * of bug that only shows up when a 1000-executor cluster re-partitions.
  */
class PartitionInvarianceSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private val heavy = Seq(
    "q110_pagerank", "q231_eigencentrality", "q240_ppr", "q238_link_jaccard",
    "q326_pagerank_directed", "q24_minhash_lsh", "q41_pricing_summary",
    "q81_kmeans", "q343_dbscan", "q337_shapley",
    // the round-8 reshaped queries: the exact-regime sketch oracles
    // (q356 retains EVERY item below first compaction, so the merged
    // quantiles cannot depend on how items split across partition
    // sketches; q357's theta unions are hash-set algebra), the
    // exact-synthesis multimodal chain, the scale-0 integer OLS fold,
    // and the guarded LOF grid pipeline
    "q34_multimodal", "q104_regression", "q356_kll_quantiles",
    "q357_theta_setops", "q369_lof",
    // the round-9 reshaped-oracle queries: q195's ★ pair set must be a
    // pure function of content (band join output independent of layout);
    // q237's DEFLATE byte counts are per-row scalar work but its corpus
    // synthesis + join must not leak partitioning either
    "q195_image_neardups", "q237_compression",
    // the round-10 newly-★ BPE pair: every training round collects a
    // (count desc, pair asc) argmax over a distributed pair aggregate —
    // the tie-break is total, so the learned merge list (and therefore
    // every q222 subword count) must not depend on how the word table
    // splits across partitions
    "q221_bpe_train", "q222_bpe_subwords",
    // the round-11 organic-evidence pair: q133's Bloom sketch is an
    // OR-merged aggregate (commutative — and only ever a PRUNE: the exact
    // closing join settles membership, so even fpp differences across
    // layouts cannot change the output); q300's MS-BFS state is bit_or
    // masks + popcount·quantized-term sums — both must be pure functions
    // of the graph, never of how its edges split across partitions
    "q133_triangles", "q300_harmonic")

  /** Collected rows in a canonical sorted text form; doubles/floats by raw
    * bits so an ulp difference cannot hide behind decimal rendering. */
  private def canon(name: String, parts: Int): Seq[String] =
    canonAt(sfDir, name, parts)

  heavy.foreach { name =>
    test(s"$name: bit-identical results at shuffle.partitions 8 / 64 / 512") {
      val r8 = canon(name, 8)
      val r64 = canon(name, 64)
      val r512 = canon(name, 512)
      assert(r8.nonEmpty, "non-trivial result")
      assert(r8 == r64,
        s"8 vs 64 diverge: only8=${r8.diff(r64).take(3)} only64=${r64.diff(r8).take(3)}")
      assert(r8 == r512,
        s"8 vs 512 diverge: only8=${r8.diff(r512).take(3)} only512=${r512.diff(r8).take(3)}")
    }
  }

  /** The one canonicalization implementation (canon = canonAt(sfDir, …)).
    * Second tier at sf0.01: sf0.001 leaves most of 512 partitions empty,
    * so a representative subset re-runs on 10× the rows, where every
    * setting actually carries data through the shuffles. */
  private def canonAt(dir: String, name: String, parts: Int): Seq[String] = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", parts.toString)
    SparkEntry.queries(name)(ss, dir).collect().map(_.toSeq.map {
      case null => "<null>"
      case d: java.lang.Double => java.lang.Double.doubleToLongBits(d).toString
      case f: java.lang.Float => java.lang.Float.floatToIntBits(f).toString
      case a: Array[Byte] => a.map("%02x".format(_)).mkString
      case x => x.toString
    }.mkString("|")).sorted.toSeq
  }

  Seq("q110_pagerank", "q24_minhash_lsh", "q41_pricing_summary").foreach { name =>
    test(s"$name at sf0.01: bit-identical at shuffle.partitions 8 / 64 / 512") {
      val dir = "/root/testdata/sf0.01"
      val r8 = canonAt(dir, name, 8)
      assert(r8.nonEmpty && r8 == canonAt(dir, name, 64)
        && r8 == canonAt(dir, name, 512), s"$name diverges at sf0.01")
    }
  }
}
