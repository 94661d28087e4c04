package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.Cols

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: every near-dup path is bucket-first — candidates are only
  * generated inside an LSH bucket, so the shuffle key is the band/bucket hash
  * and nothing is ever compared all-pairs. At 100 TB the cost profile is:
  * one scan + one shuffle on band hash + within-bucket pairing (bucket sizes
  * are bounded by `maxBucket` to keep a pathological hot bucket from going
  * quadratic — dropped buckets are almost-certainly-identical content that
  * exact dedup already collapses).
  */
object Dedup {

  /** Exact dedup by content hash, keep-first (lowest id). One shuffle. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")

  // ---------------------------------------------------------------- MinHash

  /** Deterministic 64-bit FNV-1a — stable across JVMs (String.hashCode is
    * stable too, but only 32 bits). */
  private[graft] def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  private val MersennePrime = (1L << 61) - 1

  /** Seeded (a,b) rows for h_i(x) = ((a*x + b) mod p); fixed seed keeps the
    * signatures reproducible run-to-run (required for tests + resume). */
  private def hashParams(numHashes: Int, seed: Long): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numHashes)((math.abs(rnd.nextLong()) % (MersennePrime - 1) + 1,
                           math.abs(rnd.nextLong()) % MersennePrime))
  }

  private[graft] def shingles(text: String, k: Int): Array[Long] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < k) Array(fnv1a64(toks.mkString(" ")))
    else toks.sliding(k).map(w => fnv1a64(w.mkString(" "))).toArray.distinct
  }

  private[graft] def minhashSignature(sh: Array[Long], params: Array[(Long, Long)]): Array[Long] = {
    val sig = Array.fill(params.length)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val x = sh(i) & 0x7fffffffffffffffL
      var j = 0
      while (j < params.length) {
        val (a, b) = params(j)
        // 61-bit Mersenne modulus keeps a*x+b from overflowing meaningfully
        val h = (a % MersennePrime) * (x % MersennePrime) % MersennePrime + b
        val v = h % MersennePrime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  /** (id, signature) dataset — the compute-heavy, shuffle-free stage. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 128, shingleK: Int = 3,
                        seed: Long = 42L): Dataset[(Long, Array[Long])] = {
    import df.sparkSession.implicits._
    val params = hashParams(numHashes, seed)
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          (id, minhashSignature(shingles(Option(text).getOrElse(""), shingleK), params))
        }
      }
  }

  /** MinHash+LSH candidate pairs with signature-estimated Jaccard.
    * Pipeline: signature (no shuffle) → explode to (band, bandHash) →
    * groupBy band key (THE shuffle) → within-bucket pairing → distinct pairs →
    * estimate Jaccard from signatures carried through the bucket.
    * Never joins the corpus against itself. */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 numHashes: Int = 128, bands: Int = 32, shingleK: Int = 3,
                 seed: Long = 42L, maxBucket: Int = 1000): DataFrame = {
    import df.sparkSession.implicits._
    val rows = numHashes / bands
    val sigs = minhashSignatures(df, idCol, textCol, numHashes, shingleK, seed)

    val banded = sigs.flatMap { case (id, sig) =>
      (0 until bands).iterator.map { b =>
        val bandHash = fnv1a64(sig.slice(b * rows, (b + 1) * rows).mkString(","))
        ((b, bandHash), (id, sig))
      }
    }

    banded.groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val members = it.map(_._2).toArray.sortBy(_._1).take(maxBucket)
        for {
          i <- (0 until members.length).iterator
          j <- (i + 1) until members.length
        } yield {
          val (ida, siga) = members(i); val (idb, sigb) = members(j)
          var eq = 0; var k = 0
          while (k < siga.length) { if (siga(k) == sigb(k)) eq += 1; k += 1 }
          (ida, idb, eq.toDouble / siga.length)
        }
      }
      .toDF("doc_id_a", "doc_id_b", "est_jaccard")
      .groupBy("doc_id_a", "doc_id_b").agg(max("est_jaccard").as("est_jaccard"))
      .orderBy("doc_id_a", "doc_id_b")
  }

  /** Exact n-gram Jaccard re-rank of LSH candidates: joins the (small)
    * candidate-pair set back to the corpus twice — both joins shuffle only
    * by id, and the pair side is the filtered candidate list, not the corpus. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   candidates: DataFrame, shingleK: Int = 3,
                   threshold: Double = 0.5): DataFrame = {
    import df.sparkSession.implicits._
    val sh = df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, t) => (id, shingles(Option(t).getOrElse(""), shingleK)) }
      .toDF("sid", "sh")
    candidates
      .join(sh.withColumnRenamed("sid", "doc_id_a").withColumnRenamed("sh", "sh_a"), "doc_id_a")
      .join(sh.withColumnRenamed("sid", "doc_id_b").withColumnRenamed("sh", "sh_b"), "doc_id_b")
      .select(col("doc_id_a"), col("doc_id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
         size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_id_a", "doc_id_b")
  }

  // ---------------------------------------------------------------- SimHash

  private[graft] def simhash64(text: String): Long = {
    val acc = new Array[Int](64)
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { tok =>
      val h = fnv1a64(tok)
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1; b += 1 }
    }
    var out = 0L; var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** (id, simhash) — shuffle-free. */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, t) => (id, simhash64(Option(t).getOrElse(""))) }
      .toDF(idCol, "simhash")
  }

  /** SimHash near-dup pairs: band the 64-bit hash into 4×16-bit chunks
    * (any pair within Hamming distance ≤3 shares at least one intact chunk),
    * bucket on (chunk_idx, chunk_value), verify popcount within buckets. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    import df.sparkSession.implicits._
    val sigs = df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, t) => (id, simhash64(Option(t).getOrElse(""))) }
    sigs.flatMap { case (id, h) =>
        (0 until 4).iterator.map(c => ((c, (h >>> (c * 16)) & 0xffffL), (id, h)))
      }
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val m = it.map(_._2).toArray.sortBy(_._1).take(maxBucket)
        for {
          i <- (0 until m.length).iterator
          j <- (i + 1) until m.length
          d = java.lang.Long.bitCount(m(i)._2 ^ m(j)._2)
          if d <= maxHamming
        } yield (m(i)._1, m(j)._1, d)
      }
      .toDF("doc_id_a", "doc_id_b", "hamming")
      .groupBy("doc_id_a", "doc_id_b").agg(min("hamming").as("hamming"))
      .orderBy("doc_id_a", "doc_id_b")
  }
}
