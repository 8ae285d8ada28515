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
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("vec_a"), col("vec_b")))
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
    val scored = queries
      .select(col(queryId).as("query_id"), col(queryVec).as("qv"))
      .crossJoin(corpus.select(col(corpusId).as("corpus_id"), col(corpusVec).as("cv")))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * md5-derived value in [-0.5, 0.5). Engine-portable and seed-free.
    */
  private def planeComponent(p: Column, i: Column): Column =
    (conv(substring(md5(concat(p, lit(":"), i)), 1, 8), 16, 10).cast("double") / lit(4294967296.0)) - 0.5

  /** Random-hyperplane (SimHash) LSH signatures for ANN bucketing:
    * bit p = sign(dot(vec, plane_p)). `tables` independent signatures of
    * `bitsPerTable` planes each. Output: (id, table_idx, signature).
    */
  def lshSignatures(df: DataFrame, idCol: String, vecCol: String, tables: Int, bitsPerTable: Int): DataFrame = {
    val planes = df.sparkSession.range(tables.toLong * bitsPerTable).select(col("id").as("plane"))
    val withPlane = df
      .select(col(idCol), col(vecCol).as("v"))
      .crossJoin(broadcast(planes))
    val projected = withPlane.withColumn(
      "proj",
      aggregate(
        zip_with(col("v"), sequence(lit(0), size(col("v")) - 1), (x, i) => x * planeComponent(col("plane"), i)),
        lit(0.0), (acc, v) => acc + v
      )
    )
    projected
      .withColumn("table_idx", (col("plane") / bitsPerTable).cast("int"))
      .withColumn("bit_idx", pmod(col("plane"), lit(bitsPerTable)).cast("int"))
      .withColumn("bit", when(col("proj") >= 0, expr("shiftleft(CAST(1 AS BIGINT), bit_idx)")).otherwise(0L))
      .groupBy(col(idCol), col("table_idx"))
      .agg(sum(col("bit")).as("signature"))
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
