package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Read-only static seed source with a resumable cursor (SURVEY.md S2).
  *
  * Mirrors /root/reference/src/crawlee/request_loaders/_request_list.py:
  * the persisted state is `(next_index, next_unique_key)` (:19-24); on
  * resume, the loader asserts the request at `next_index` still carries
  * `next_unique_key` — a consistency check against a changed seed list
  * (:129-140). Relationally: seeds are a DataFrame with a `seq` position;
  * the cursor is a WHERE clause, and the consistency check is a first-row
  * equality assert.
  */
final class RequestList(seeds: DataFrame, seqCol: String = "seq", keyCol: String = "unique_key") {

  /** Remaining seeds from a checkpointed cursor. Throws IllegalStateException
    * when `expectedKey` no longer matches the seed at `nextIndex`.
    */
  def fromCursor(nextIndex: Long, expectedKey: Option[String]): DataFrame = {
    expectedKey.foreach { key =>
      val head = seeds.filter(col(seqCol) === nextIndex).select(col(keyCol)).collect()
      val actual = head.headOption.map(_.getString(0))
      if (!actual.contains(key))
        throw new IllegalStateException(
          s"seed list changed under the cursor: index $nextIndex has key ${actual.orNull}, expected $key")
    }
    seeds.filter(col(seqCol) >= nextIndex)
  }

  def cursorAfter(processedThrough: Long): (Long, Option[String]) = {
    val next = processedThrough + 1
    val key = seeds.filter(col(seqCol) === next).select(col(keyCol)).collect().headOption.map(_.getString(0))
    (next, key)
  }
}

object RequestList {
  /** Build from an ordered URL list (testing convenience). */
  def fromUrls(spark: SparkSession, urls: Seq[String]): RequestList = {
    import spark.implicits._
    new RequestList(
      urls.zipWithIndex.map { case (u, i) => (i.toLong, graft.canon.UniqueKey.compute(u), u) }
        .toDF("seq", "unique_key", "url"))
  }
}
