package graft.ops

import graft.SparkSpec

/** Connected-components / dedup-cluster semantics: min-id canonical labels,
  * multi-round convergence on chains, singleton-free output.
  */
class GraphOpsSpec extends SparkSpec {

  test("two components + a long chain converge to min-id labels") {
    import spark.implicits._
    // component 1: chain a-b-c-d-e (diameter 4 -> needs several rounds)
    // component 2: triangle x-y-z
    val edges = Seq(
      ("b", "a"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("x", "y"), ("y", "z"), ("z", "x")
    ).toDF("src", "dst")
    val comp = GraphOps.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comp == Map(
      "a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a", "e" -> "a",
      "x" -> "x", "y" -> "x", "z" -> "x"))
  }

  test("adversarial chain graph converges in O(log diameter) rounds (pointer jumping)") {
    import spark.implicits._
    // a pure path 0-1-2-...-255: diameter 255. Plain hash-min label
    // propagation needs ~255 rounds; with the per-round pointer jump the
    // distance to the minimum at least halves every round -> <= ~log2(256)
    // + small constant. Zero-padded ids keep lexicographic == numeric order.
    val n = 256
    val edges = (0 until n - 1).map(i => (f"n$i%04d", f"n${i + 1}%04d")).toDF("src", "dst")
    val comp = GraphOps.connectedComponents(edges, "src", "dst", maxIter = 20)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comp.size == n)
    assert(comp.values.toSet == Set("n0000"), s"non-canonical labels: ${comp.values.toSet.take(5)}")
    assert(GraphOps.lastIterations <= 12,
      s"chain took ${GraphOps.lastIterations} rounds — pointer jumping not effective")
  }

  test("dedupSurvivors marks exactly one canonical per cluster") {
    import spark.implicits._
    val edges = Seq(("doc9", "doc2"), ("doc2", "doc5"), ("doc8", "doc7")).toDF("src", "dst")
    val rows = GraphOps.dedupSurvivors(edges, "src", "dst").collect()
    val canonical = rows.filter(_.getBoolean(2)).map(_.getString(0)).toSet
    assert(canonical == Set("doc2", "doc7")) // min id per cluster
    assert(rows.count(!_.getBoolean(2)) == 3) // doc9, doc5, doc8 removed
  }

  test("hostAuthority: integer PageRank iterations match hand arithmetic") {
    import spark.implicits._
    // a -> b, a -> c, b -> c; out_deg a=2, b=1; SCALE 1e6, base 150000
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    def ranks(iters: Int): Map[String, Long] =
      GraphOps.hostAuthority(edges, "src", "dst", iters)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks(0) == Map("a" -> 1000000L, "b" -> 1000000L, "c" -> 1000000L))
    // iter1: b <- 1e6 div 2; c <- 500000 + 1e6
    assert(ranks(1) == Map(
      "a" -> 150000L,
      "b" -> (150000L + 85L * 500000 / 100),
      "c" -> (150000L + 85L * 1500000 / 100)))
    // iter2: b <- 150000 div 2 = 75000; c <- 75000 + 575000 = 650000
    assert(ranks(2) == Map(
      "a" -> 150000L,
      "b" -> (150000L + 85L * 75000 / 100),
      "c" -> (150000L + 85L * 650000 / 100)))
  }

  test("hostAuthority: a hub every leaf links to outranks the leaves") {
    import spark.implicits._
    val edges = (0 until 30).map(i => (s"leaf$i", "hub")).toDF("src", "dst")
    val r = GraphOps.hostAuthority(edges, "src", "dst", iters = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("hub") > r("leaf0") * 10, s"hub=${r("hub")} leaf=${r("leaf0")}")
  }
}
