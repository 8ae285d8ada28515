package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space operators: cosine similarity, near-duplicate pairs,
  * brute-force ANN top-k (the exactness baseline) and a random-hyperplane
  * LSH-bucketed variant (the scale path).
  *
  * Vector math uses `zip_with` + `aggregate` (codegen'd higher-order
  * functions over ArrayType) — no UDFs, no driver loops.
  */
object VectorOps {

  /** dot(a, b) over ArrayType(Float/Double) columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Pairwise cosine near-duplicate pairs (id_a < id_b, cosine >= threshold).
    * Exact O(n^2) — the correctness baseline; cap input size or use
    * `lshNearDupCandidates` beyond ~10^4 vectors.
    */
  /** Pre-normalize to unit length ONCE per row (n rows) so the O(n^2) pair
    * stage is a bare dot product — 3x less arithmetic than recomputing both
    * norms per pair.
    */
  def unitNormalized(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("__n", norm(col(vecCol)))
      .withColumn(vecCol, transform(col(vecCol), x => x / col("__n")))
      .drop("__n")

  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val normed = unitNormalized(df, vecCol)
    val a = normed.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = normed.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors. Output: (query_id, rank, corpus_id, cos).
    * The corpus side should be broadcast when queries are few — Catalyst
    * picks BroadcastNestedLoopJoin for the crossJoin automatically when one
    * side is small.
    */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int
  ): DataFrame = {
    val scored = unitNormalized(queries.select(col(queryId).as("query_id"), col(queryVec).as("qv")), "qv")
      .crossJoin(unitNormalized(corpus.select(col(corpusId).as("corpus_id"), col(corpusVec).as("cv")), "cv"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos", dot(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cos"))
  }

  /** Deterministic hyperplane matrix (seed 42): planes x dims, values in
    * [-0.5, 0.5). Generated once on the driver and shipped in the closure —
    * one signature pass per row instead of a per-(row,plane,dim) hash.
    */
  def planeMatrix(nPlanes: Int, dims: Int): Array[Array[Double]] = {
    val rnd = new java.util.Random(42)
    Array.fill(nPlanes)(Array.fill(dims)(rnd.nextDouble() - 0.5))
  }

  /** Random-hyperplane (SimHash) LSH signatures for ANN bucketing:
    * bit p = sign(dot(vec, plane_p)). `tables` independent signatures of
    * `bitsPerTable` planes each. Output: (id, table_idx, signature).
    * One UDF pass per row computes all tables*bits projections against the
    * closure-shipped plane matrix (cache-friendly dense loops).
    */
  def lshSignatures(df: DataFrame, idCol: String, vecCol: String, tables: Int, bitsPerTable: Int): DataFrame = {
    val nPlanes = tables * bitsPerTable
    val dims = df.select(size(col(vecCol))).head().getInt(0)
    val planes = planeMatrix(nPlanes, dims)
    val bpt = bitsPerTable
    val sigUdf = udf { (v: Seq[Double]) =>
      val sigs = new Array[Long](tables)
      var p = 0
      while (p < nPlanes) {
        val plane = planes(p)
        var dotV = 0.0
        var i = 0
        val n = math.min(v.length, plane.length)
        while (i < n) { dotV += v(i) * plane(i); i += 1 }
        if (dotV >= 0) sigs(p / bpt) |= (1L << (p % bpt))
        p += 1
      }
      sigs
    }
    df.select(col(idCol), posexplode(sigUdf(col(vecCol))).as(Seq("table_idx", "signature")))
  }

  /** LSH-bucketed ANN: candidates = pairs sharing any table signature, then
    * exact cosine re-rank within candidates — the standard two-phase scale
    * path (bucket join shuffles on (table, signature), never O(n^2)).
    * Output: (query_id, rank, corpus_id, cos) with rank <= k.
    */
  def lshTopK(
      df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, tables: Int = 8, bitsPerTable: Int = 12
  ): DataFrame = {
    val corpusSigs = lshSignatures(df, idCol, vecCol, tables, bitsPerTable)
      .select(col(idCol).as("corpus_id"), col("table_idx"), col("signature"))
    val querySigs = lshSignatures(queries.select(col(queryIdCol).as(idCol), col(queryVecCol).as(vecCol)),
      idCol, vecCol, tables, bitsPerTable)
      .select(col(idCol).as("query_id"), col("table_idx"), col("signature"))
    val candidates = querySigs
      .join(corpusSigs, Seq("table_idx", "signature"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"))
      .distinct()
    val scored = candidates
      .join(queries.select(col(queryIdCol).as("query_id"), col(queryVecCol).as("qv")), Seq("query_id"))
      .join(df.select(col(idCol).as("corpus_id"), col(vecCol).as("cv")), Seq("corpus_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cos"))
  }
}
