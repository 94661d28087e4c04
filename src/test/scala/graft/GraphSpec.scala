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
}
