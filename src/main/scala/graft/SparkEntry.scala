package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps each implemented operator from SURVEY.md §2 to a DataFrame
  * program over the driver-generated parquet tables in `dir`
  * (/root/testdata/sf*). `oracleSql` holds the DuckDB-equivalent SQL the
  * driver cross-checks against. Column names are aligned on both sides
  * because the comparison sorts columns by name before hashing.
  */
object SparkEntry {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The crawl-engine analogue of the reference's run statistics
    * (SURVEY.md §2.8): per-status aggregation over an event log.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.all

  def oracleSql: Map[String, String] = QueryCatalog.oracles
}
