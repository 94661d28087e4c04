package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** PageRank: hand-checkable star topology + partitioning invariance (the
  * decimal contribution sums make the result independent of layout). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // undirected star: hub h — a, h — b, h — c (symmetrized edge list)
  private val star = Seq(
    ("h", "a"), ("h", "b"), ("h", "c"),
    ("a", "h"), ("b", "h"), ("c", "h")).toDF("src", "dst")

  test("pageRank: star hub dominates; 1-iteration values are exact") {
    // iter 1 with rank₀=1: hub gets 0.15 + 0.85·(1/1+1/1+1/1) = 2.70;
    // each leaf gets 0.15 + 0.85·(1/3) ≈ 0.433333
    val r1 = Graph.pageRank(star, "src", "dst", iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(r1("h") == 2.70, r1.toString)
    assert(r1("a") == 0.433333 && r1("b") == 0.433333 && r1("c") == 0.433333, r1.toString)
    // iter 2: hub still ranks first
    val r2 = Graph.pageRank(star, "src", "dst", iters = 2).collect()
    assert(r2.head.getString(0) == "h", r2.mkString(","))
  }

  test("pageRank: repartitioned input gives identical ranks") {
    val base = Graph.pageRank(star, "src", "dst").collect().map(_.toString).toSeq
    val re = Graph.pageRank(star.repartition(7), "src", "dst").collect().map(_.toString).toSeq
    assert(base == re)
  }

  // K4 on {1,2,3,4} plus pendant 5—1: every K4 node is in C(3,2)=3
  // triangles, the pendant in none. Duplicate + reversed edges exercise
  // canonicalization; 1—1 exercises the self-loop drop.
  private val k4 = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (2L, 1L), (3L, 1L), (1L, 1L), (5L, 1L), (1L, 5L)).toDF("a", "b")

  test("triangleCounts: K4 + pendant — counts, degrees, clustering exact") {
    val got = Graph.triangleCounts(k4, "a", "b").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((4L, 3L, 0.5)), got.toString) // deg 4 → 2·3/(4·3)=0.5
    for (n <- Seq(2L, 3L, 4L)) assert(got(n) == ((3L, 3L, 1.0)), got.toString)
    assert(got(5L) == ((1L, 0L, 0.0)), got.toString)
  }

  test("triangleCounts: triangle-free bipartite graph finds zero") {
    val bip = (for (l <- 1L to 3L; r <- 10L to 12L) yield (l, r)).toDF("a", "b")
    val got = Graph.triangleCounts(bip, "a", "b").collect()
    assert(got.forall(_.getLong(2) == 0L))
    assert(got.length == 6)
  }

  test("labelPropagation: two cliques with one bridge converge to two communities") {
    // cliques {1,2,3} and {10,11,12}, bridge 3—10
    def clique(ns: Seq[Long]) = for (a <- ns; b <- ns if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L)) :+ ((3L, 10L)))
      .toDF("a", "b")
    // 3 synchronous rounds: clique B oscillates between its min id and the
    // bridge's label for two rounds before settling (hand-traced)
    val got = Graph.labelPropagation(edges, "a", "b", iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // min-label tie-breaks pull each clique to one label
    assert(Seq(1L, 2L, 3L).map(got).distinct.size == 1, got.toString)
    assert(Seq(10L, 11L, 12L).map(got).distinct.size == 1, got.toString)
    assert(got(1L) != got(11L), got.toString)
  }

  test("labelPropagation: layout-independent (synchronous rounds)") {
    val edges = (for (a <- 1L to 20L; b <- a + 1 to math.min(a + 3, 20L)) yield (a, b)).toDF("a", "b")
    val base = Graph.labelPropagation(edges, "a", "b").collect().map(_.toString).toSeq
    val re = Graph.labelPropagation(edges.repartition(11), "a", "b").collect().map(_.toString).toSeq
    assert(base == re)
  }

  test("triangleCounts: matches brute-force enumeration on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges = (1 to 150)
      .map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(e => e._1 != e._2).distinct
    val got = Graph.triangleCounts(edges.toDF("a", "b"), "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = und.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val ref = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for (x <- nodes; y <- nodes if y > x; z <- nodes if z > y)
      if (und((x, y)) && und((y, z)) && und((x, z))) {
        ref(x) += 1; ref(y) += 1; ref(z) += 1
      }
    assert(nodes.forall(n => got.getOrElse(n, 0L) == ref(n)),
      s"got=$got ref=$ref")
    assert(ref.values.sum > 0) // the random graph actually has triangles
  }

  test("triangleCounts: partitioning-invariant") {
    val base = Graph.triangleCounts(k4, "a", "b").collect().map(_.toString).toSeq
    val re = Graph.triangleCounts(k4.repartition(13), "a", "b").collect().map(_.toString).toSeq
    assert(base == re)
  }

  test("kCore: clique survives whole, chain/star fringe peels; cascade handled") {
    // K4 on 1-4 + a chain 4-10-11 + a star center 12 hanging off 1:
    // k=3 keeps exactly the clique (every fringe node has degree <= 2)
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 10L), (10L, 11L), (1L, 12L)).toDF("a", "b")
    val core = Graph.kCore(g, "a", "b", k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), core.toString)
    // cascade: a pendant chain into a triangle at k=2 peels the chain in
    // DEPTH rounds but leaves the cycle intact
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 20L), (20L, 21L), (21L, 22L))
      .toDF("a", "b")
    val c2 = Graph.kCore(chain, "a", "b", k = 2).collect().map(_.getLong(0)).toSet
    assert(c2 == Set(1L, 2L, 3L))
    // empty core: k above max degree -> empty frame, not a crash
    assert(Graph.kCore(g, "a", "b", k = 10).count() == 0)
    // partitioning invariance
    val p = Graph.kCore(g.repartition(7), "a", "b", k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p == core)
    // q170's oracle unrolls 12 rounds: the sf0.001 part-supplier graph must
    // reach fixpoint well inside that (peel depth, not diameter)
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_partkey").as("id_a"), (col("l_suppkey") + 1000000000L).as("id_b"))
    val k4core = Graph.kCore(li, "id_a", "id_b", k = 4, maxIters = 12)
    val k4more = Graph.kCore(li, "id_a", "id_b", k = 4, maxIters = 13)
    assert(k4core.collect().map(_.toSeq).toSeq == k4more.collect().map(_.toSeq).toSeq)
  }

  test("bfsDistances: tiers exact on a path graph; maxHops bounds reach; multi-source min wins") {
    // path 1-2-3-4-5 plus isolated edge 8-9
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
      .toDF("a", "b")
    val d = Graph.bfsDistances(path, "a", "b", Seq(1L), maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d == Map(1L -> 0, 2L -> 1, 3L -> 2), d.toString) // 4,5,8,9 unreached
    // two sources: each node takes its NEAREST seed; seed order irrelevant
    val m = Graph.bfsDistances(path, "a", "b", Seq(5L, 1L), maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m == Map(1L -> 0, 2L -> 1, 3L -> 2, 5L -> 0, 4L -> 1), m.toString)
    // layout-independent
    val p = Graph.bfsDistances(path.repartition(7), "a", "b", Seq(5L, 1L), 2)
      .collect().map(_.toSeq).toSeq
    assert(p == Graph.bfsDistances(path, "a", "b", Seq(5L, 1L), 2).collect().map(_.toSeq).toSeq)
  }

  test("bfs/harmonic early-exit: huge maxHops ≡ exact-diameter result (round 13)") {
    // diameter-2 component: once the frontier empties the hop loop must
    // stop (identical state each further hop), so maxHops=50 returns the
    // same rows as maxHops=2 — and in bounded time
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("a", "b")
    val d50 = Graph.bfsDistances(tri, "a", "b", Seq(1L), maxHops = 50)
      .collect().map(_.toSeq).toSeq
    val d2 = Graph.bfsDistances(tri, "a", "b", Seq(1L), maxHops = 2)
      .collect().map(_.toSeq).toSeq
    assert(d50 == d2)
    val h50 = Graph.harmonicCentrality(tri, "a", "b", Seq(1L, 4L), maxHops = 50)
      .collect().map(_.toSeq).toSeq
    val h2 = Graph.harmonicCentrality(tri, "a", "b", Seq(1L, 4L), maxHops = 2)
      .collect().map(_.toSeq).toSeq
    assert(h50 == h2)
  }

  test("eigenCentrality: hub of a star dominates, scores max-normalized, layout-independent") {
    import spark.implicits._
    // star: 1 is the hub of 2..6; separate edge 10-11 is a weak component
    val star = ((2L to 6L).map(k => (1L, k)) ++ Seq((10L, 11L))).toDF("a", "b")
    val out = Graph.eigenCentrality(star, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 1.0, out.toString)                    // hub carries the max
    assert((2L to 6L).forall(k => out(k) == out(2L) && out(k) < 1.0))
    assert(out(10L) == out(11L) && out(10L) < out(2L))      // pair below leaves
    // triangle + pendant: pendant strictly below the triangle nodes
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val t = Graph.eigenCentrality(tri, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(t(3L) == 1.0 && t(4L) < t(1L) && t(1L) == t(2L), t.toString)
    // bit-equal under partitioning (the decimal-contribution contract)
    val a = Graph.eigenCentrality(tri.repartition(7), "a", "b").collect().map(_.toSeq).toSeq
    assert(a == Graph.eigenCentrality(tri, "a", "b").collect().map(_.toSeq).toSeq)
  }

  test("neighborJaccard: counts and union arithmetic, non-adjacent pairs scored, hub cap") {
    import spark.implicits._
    // K4 minus edge (1,4): N(1)={2,3}, N(4)={2,3} -> non-adjacent pair
    // (1,4) has jaccard 2/(2+2-2)=1.0; adjacent (2,3) share {1,4} too
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("a", "b")
    val out = Graph.neighborJaccard(g, "a", "b", minCommon = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(out((1L, 4L)) == ((2L, 2L, 2L, 1.0)), out.toString)
    assert(out((2L, 3L)) == ((2L, 3L, 3L, 0.5)), out.toString)
    assert(out.keySet == Set((1L, 4L), (2L, 3L)))
    // hub cap: with maxDegree=2 the degree-3 centers stop contributing
    // wedges; only centers 1 and 4 (degree 2) emit, so both pairs survive
    // via their two low-degree witnesses... (2,3) keeps exactly those 2
    val capped = Graph.neighborJaccard(g, "a", "b", minCommon = 2, maxDegree = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(capped == Map((2L, 3L) -> 2L), capped.toString)
  }

  test("personalizedPageRank: mass concentrates at the seeds, layout-independent") {
    import spark.implicits._
    // path 1-2-3-4-5 symmetrized; seed {1}: rank must decay with distance
    val p0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val path = p0.unionAll(p0.select($"b".as("a"), $"a".as("b")))
    val out = Graph.personalizedPageRank(path, "a", "b", Seq(1L), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // a path is bipartite, so finite power iterations oscillate by parity
    // — the stable facts: the seed's neighbor holds the walk mass, nodes
    // beyond `iters` hops hold NONE, and the seed beats both non-neighbors
    assert(out(2L) == out.values.max, out.toString)
    assert(out(5L) == 0.0, out.toString) // distance 4 > 3 iterations
    assert(out(1L) > out(3L) && out(1L) > out(4L), out.toString)
    // two seeds at the ends: symmetric graph -> symmetric ranks
    val two = Graph.personalizedPageRank(path, "a", "b", Seq(1L, 5L), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(two(1L) == two(5L) && two(2L) == two(4L), two.toString)
    val rep = Graph.personalizedPageRank(path.repartition(7), "a", "b", Seq(1L), iters = 3)
      .collect().map(_.toSeq).toSeq
    assert(rep == Graph.personalizedPageRank(path, "a", "b", Seq(1L), iters = 3)
      .collect().map(_.toSeq).toSeq)
  }

  test("modularity: perfect communities score 1/2 on two triangles; mixing lowers Q") {
    import spark.implicits._
    // two disjoint triangles; perfect labels → Q = 2·(3/6 − (6/12)²) = 0.5
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("a", "b")
    val goodLab = Seq((1L, "x"), (2L, "x"), (3L, "x"),
                      (4L, "y"), (5L, "y"), (6L, "y")).toDF("n", "c")
    val good = Graph.modularity(tri, "a", "b", goodLab, "n", "c").collect()
    assert(good.forall(_.getDouble(4) == 0.5), good.mkString(";"))
    assert(good.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      == Map("x" -> ((3L, 6L)), "y" -> ((3L, 6L))))
    // scrambled labels cut intra-community edges → Q strictly lower
    val badLab = Seq((1L, "x"), (2L, "y"), (3L, "x"),
                     (4L, "y"), (5L, "x"), (6L, "y")).toDF("n", "c")
    val bad = Graph.modularity(tri, "a", "b", badLab, "n", "c").collect()
    assert(bad.head.getDouble(4) < 0.5, bad.mkString(";"))
    // duplicate + reversed edge rows canonicalize away; Q unchanged
    val noisy = tri.unionAll(tri.select(col("b").as("a"), col("a").as("b")))
    val q2 = Graph.modularity(noisy, "a", "b", goodLab, "n", "c").collect()
    assert(q2.map(_.toSeq).toSeq == good.map(_.toSeq).toSeq)
  }

  test("adamicAdar: shared-neighbor square scores both diagonals, skips existing edges") {
    // 4-cycle 1-10-2-20-1: non-adjacent pairs (1,2) and (10,20) each share
    // two degree-2 neighbors → aa = 2·quantize(1/ln 2); adjacent pairs never
    // appear even though they share a neighbor each
    val edges = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L)).toDF("a", "b")
    val out = Graph.adamicAdar(edges, "a", "b", minCommon = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set((1L, 2L), (10L, 20L)), out.toString)
    val w = BigDecimal(1.0 / math.log(2.0)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    assert(out((1L, 2L)) == ((2L, (w * 2).toDouble)), out.toString)
  }

  test("adamicAdar: rare neighbors outweigh hubs") {
    // x,y share rare z (deg 2) and hub h (deg 5); u,v share only the hub
    val rare = Seq((100L, 1L), (100L, 2L))
    val hub = Seq((200L, 1L), (200L, 2L), (200L, 3L), (200L, 4L), (200L, 5L))
    val out = Graph.adamicAdar((rare ++ hub).toDF("a", "b"), "a", "b", minCommon = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(out((1L, 2L)) > out((3L, 4L)), out.toString)
  }

  test("harmonicCentrality: path graph from one source → 1/d terms; bounded by maxHops") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val out = Graph.harmonicCentrality(edges, "a", "b", Seq(1L), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(2L) == 1.0 && out(3L) == 0.5)
    assert(math.abs(out(4L) - 1.0 / 3) < 1e-9)
    assert(!out.contains(5L), "4 hops away — beyond the bound")
    assert(!out.contains(1L), "sources don't score themselves")
  }

  test("pageRankDirected: hand chain a→b — dangling mass redistributes, total mass stays n") {
    val e = Seq((0L, 1L)).toDF("src", "dst")
    // n=2, node 1 dangles. iter1: m=1, r(0)=.15+.85·(0+1/2)=0.575,
    // r(1)=.15+.85·(1+1/2)=1.425. iter2: m=r1(1)=1.425, S(1)=r1(0)=0.575,
    // r(0)=.15+.85·(1.425/2)=0.755625, r(1)=.15+.85·(0.575+0.7125)=1.244375
    val r = Graph.pageRankDirected(e, "src", "dst")
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(0L) - 0.755625) < 1e-12 && math.abs(r(1L) - 1.244375) < 1e-12, r.toString)
    assert(math.abs(r.values.sum - 2.0) < 1e-12, "mass conserved")
  }

  test("pageRankDirected: mass invariant Σrank = n on an asymmetric fan graph") {
    // 1 hub → 50 dangling leaves + a 3-chain: plain pageRank would leak
    // the leaves' mass every iteration
    val edges = ((1L to 50L).map(i => (0L, 100L + i)) ++ Seq((200L, 201L), (201L, 202L)))
      .toDF("src", "dst")
    val ranks = Graph.pageRankDirected(edges, "src", "dst", iters = 3)
      .collect().map(_.getDouble(1))
    assert(math.abs(ranks.sum - ranks.length) < 1e-9 * ranks.length,
      s"mass ${ranks.sum} != n ${ranks.length}")
  }

  test("pageRankConvergence: exact L1 deltas and constant mass on the hand chain") {
    val e = Seq((0L, 1L)).toDF("src", "dst")
    val rep = Graph.pageRankConvergence(e, "src", "dst")
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // iter1: |0.575−1| + |1.425−1| = 0.85; iter2: 2·0.180625 = 0.36125
    assert(rep(1) == ((0.85, 2.0)), rep.toString)
    assert(rep(2) == ((0.36125, 2.0)), rep.toString)
  }

  test("harmonicCentrality: multi-source sums per-source shortest paths") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = Graph.harmonicCentrality(edges, "a", "b", Seq(1L, 3L), maxHops = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // node 2: dist 1 from both sources → 2.0; endpoints see each other at 2
    assert(out(2L) == ((2L, 2.0)))
    assert(out(1L) == ((1L, 0.5)) && out(3L) == ((1L, 0.5)))
  }

  test("degreeAssortativity: star is perfectly disassortative (-1), regular graph is NULL") {
    // star 1-{2,3,4}: every edge joins deg 3 to deg 1 → r = −1 exactly;
    // end-degree mean Σdeg²/Σdeg = 12/6 = 2 (> node-average 1.5: the
    // friendship paradox shows up in the hand numbers)
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val r = Graph.degreeAssortativity(star, "a", "b").collect()(0)
    assert(r.getLong(0) == 3L && r.getDouble(1) == 2.0 && r.getDouble(2) == -1.0, r.toString)
    // triangle: all degrees 2 → zero variance → undefined, NULL not NaN
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    val t = Graph.degreeAssortativity(tri, "a", "b").collect()(0)
    assert(t.getLong(0) == 3L && t.isNullAt(2), t.toString)
  }

  test("richClub: K4 core scores phi=1 at every threshold below it, star degenerates to NULL") {
    // K4 on 1-4 (core degs 3; nodes 1,2 get pendants → deg 4)
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 1L), (6L, 2L)).toDF("a", "b")
    val out = Graph.richClub(e, "a", "b", ks = Seq(1, 3))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // k=1: the 4 core nodes, all 6 K4 edges → 12/(4·3) = 1
    assert(out(1L) == ((4L, 6L, 1.0)), out.toString)
    // k=3: only nodes 1,2 (deg 4) and their one mutual edge → 2/(2·1) = 1
    assert(out(3L) == ((2L, 1L, 1.0)), out.toString)
    // star: one hub, zero club — N≤1 → NULL phi, 0.4 at k=0
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "b")
    val so = Graph.richClub(star, "a", "b", ks = Seq(0, 1))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(so(0L) == ((5L, 4L, 0.4)), so.toString)
    assert(so(1L)._1 == 1L && so(1L)._3 == null, s"single hub is no club: $so")
  }

  test("degreeAssortativity: self-loops dropped, parallel/reversed duplicates collapse") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val r = Graph.degreeAssortativity(messy, "a", "b").collect()(0)
    assert(r.getLong(0) == 3L && r.getDouble(2) == -1.0, r.toString) // same star
  }
}
