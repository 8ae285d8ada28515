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

  test("dedupSurvivors marks exactly one canonical per cluster") {
    import spark.implicits._
    val edges = Seq(("doc9", "doc2"), ("doc2", "doc5"), ("doc8", "doc7")).toDF("src", "dst")
    val rows = GraphOps.dedupSurvivors(edges, "src", "dst").collect()
    val canonical = rows.filter(_.getBoolean(2)).map(_.getString(0)).toSet
    assert(canonical == Set("doc2", "doc7")) // min id per cluster
    assert(rows.count(!_.getBoolean(2)) == 3) // doc9, doc5, doc8 removed
  }
}
