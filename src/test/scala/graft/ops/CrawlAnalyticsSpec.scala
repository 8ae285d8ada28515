package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Frontier analytics: host spam scoring and Cho–Garcia-Molina revisit
  * scheduling, hand-computed on tiny corpora.
  */
class CrawlAnalyticsSpec extends SparkSpec {

  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hostQuality: path dedup, depth, and param ratios aggregate per host") {
    val urls = Seq(
      // trap.test: 4 urls, 2 distinct paths, 1 deep, 2 with params
      "https://trap.test/a",
      "https://trap.test/a?s=1",
      "https://trap.test/a/b/c/d/e?x=2",
      "https://trap.test/a/b/c/d/e",
      // ok.test: all distinct shallow paths, no params
      "https://ok.test/p1",
      "https://ok.test/p2",
      "https://ok.test/p3"
    ).toDF("url")
    val out = CrawlAnalytics.hostQuality(urls, "url")
      .collect().map(r => r.getAs[String]("host") -> r).toMap

    val trap = out("trap.test")
    assert(trap.getAs[Long]("n_urls") == 4 && trap.getAs[Long]("n_paths") == 2)
    assert(trap.getAs[Double]("dup_path_ratio") == r6(1 - 2.0 / 4))
    assert(trap.getAs[Double]("deep_ratio") == r6(2.0 / 4))
    assert(trap.getAs[Double]("param_ratio") == r6(2.0 / 4))
    val expScore = r6(0.5 * r6(0.5) + 0.3 * r6(0.5) + 0.2 * r6(0.5))
    assert(trap.getAs[Double]("spam_score") == expScore)
    assert(trap.getAs[Boolean]("is_spam")) // score 0.5 exactly -> >= 0.5 threshold
    assert(out("ok.test").getAs[Double]("spam_score") == 0.0)
    assert(!out("ok.test").getAs[Boolean]("is_spam"))
  }

  test("hostQuality flags a same-path query farm") {
    val farm = (0 until 50).map(i => s"https://farm.test/page?sid=$i").toDF("url")
    val row = CrawlAnalytics.hostQuality(farm, "url").collect()(0)
    assert(row.getAs[Long]("n_paths") == 1)
    assert(row.getAs[Double]("dup_path_ratio") == r6(1 - 1.0 / 50))
    assert(row.getAs[Boolean]("is_spam"), row.toString)
  }

  test("revisitSchedule: bias-corrected estimator and buckets, hand-checked") {
    val hist = Seq(
      ("u1", true), ("u1", true), ("u1", true), ("u1", true), // always changed
      ("u2", false), ("u2", false), ("u2", false), // never changed
      ("u3", true), ("u3", false), ("u3", false), ("u3", true), ("u3", false)
    ).toDF("url", "changed")
    val out = CrawlAnalytics.revisitSchedule(hist, "url", "changed")
      .collect().map(r => r.getAs[String]("url") ->
        ((r.getAs[Long]("n_visits"), r.getAs[Long]("n_changes"),
          r.getAs[Double]("change_rate"), r.getAs[String]("revisit_bucket")))).toMap
    assert(out("u1") == ((4L, 4L, r9(-math.log(0.5 / 4.5)), "fast")))
    assert(out("u2") == ((3L, 0L, 0.0, "slow")))
    assert(out("u3") == ((5L, 2L, r9(-math.log(3.5 / 5.5)), "default")))
    // the corrected estimator exceeds the naive x/n on fast pages: a page
    // that changed on EVERY visit is changing faster than once per visit
    assert(out("u1")._3 > 1.0)
  }

  test("crawlDiff classifies added/removed/changed/unchanged") {
    val prev = Seq(("u1", "h1"), ("u2", "h2"), ("u3", "h3")).toDF("url", "hash")
    val curr = Seq(("u2", "h2"), ("u3", "hX"), ("u4", "h4")).toDF("url", "hash")
    val out = CrawlAnalytics.crawlDiff(prev, curr, "url", "hash")
      .collect().map(r => r.getAs[String]("url") -> r.getAs[String]("status")).toMap
    assert(out == Map("u1" -> "removed", "u2" -> "unchanged", "u3" -> "changed", "u4" -> "added"))
  }

  test("vitPatchCount: exact ceil-division token costs") {
    val dims = Seq((28, 28), (29, 29), (1, 1), (224, 112)).toDF("w", "h")
    val got = dims.select(Multimodal.vitPatchCount(col("w"), col("h"), 14).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(4L, 9L, 1L, 16L * 8))
  }
}
