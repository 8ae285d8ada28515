package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every catalog query on SPARK_GRAFT_SF_DIR,
  * plus a synthetic-web crawl (the headline workload: frontier + dedup +
  * politeness + enqueue, measured as URLs/s and images/s). Prints ONE JSON
  * line. Scaling-efficiency evidence (pinned 2- vs 8-core runs) lives in
  * BENCH/BASELINE.md, produced by tools/scaling_bench.sh.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Correctness-fixture entries drive the store / session pool / sitemap
    // loader over tiny bounded corpora — they are state-machine gates for
    // the Verify run, not throughput workloads, so the bench skips them
    // (their cost is fixed, independent of sf).
    val fixtureEntries = Set(
      "q5_q8_claim_lease_stale", "q6_q7_handled_reclaim", "q2_bloom_admit",
      "p4_crawl_delay_quota", "p3_retry_after_priority", "r4_session_rotation",
      "d4_skip_empty", "d5_fields", "d6_omit", "d8_flatten", "d9_clean",
      "d10_csv_export", "d11_json_export", "s2_request_list_cursor",
      "a8_queue_metadata", "d12_d13_kvs_resume", "x4_rate_cap", "mm_resize",
      "s5_sitemap_nested", "s4_sitemap_txt_gzip", "r6_budget_exactness",
      "f11_blocked_content", "mm_image_features", "mm_payload_validate",
      "r4_session_binding", "a7_stats_resume", "w3_stream_request_ingest",
      "mm_video_frames", "s10_streamed_fetch", "mm_phash_near_dup",
      "mm_image_filter", "mm_aspect_bucket", "mm_phash_dedup_survivors",
      "mm_image_quality", "mm_audio_features", "mm_audio_resample", "s12_warc_read", "td_cc_pipeline", "w5_stream_warc",
      "mm_header_sniff", "mm_audio_sniff", "mm_container_sniff",
      "s13_tar_read", "mm_webdataset_samples", "mm_wds_pipeline",
      "mm_joint_dedup", "mm_pixel_verified_dedup", "mm_pair_pipeline",
      // drives a real FrontierStore claim loop since r5 (was inline before)
      "q4_claim_ordering", "q14_time_travel",
      // drive the four storage backends request-by-request / item-by-item (S11)
      "s11_backend_parity", "s11_dataset_parity")
    // Untimed JVM/codegen warm-up: the first timed query otherwise absorbs
    // one-time Catalyst/whole-stage-codegen/classloading cost (~3-4 s) that
    // belongs to the JVM, not the query (r3 bench read a 5-row aggregate at
    // 4.4 s for exactly this reason). One small parquet read + shuffle +
    // native-expression call covers the hot classes.
    try {
      graft.expr.UrlFunctions.register(spark)
      spark.read.parquet(s"$sfDir/events.parquet")
        .select(graft.expr.UrlFunctions.hostOf(
          org.apache.spark.sql.functions.concat_ws("", org.apache.spark.sql.functions.lit("https://h"),
            org.apache.spark.sql.functions.col("user_id"), org.apache.spark.sql.functions.lit(".example.com/"))).as("h"))
        .groupBy("h").count().count()
    } catch { case _: Throwable => }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => fixtureEntries.contains(q._1))
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => }
        results(name) = (System.nanoTime() - t0) / 1e9
      }

    // headline crawl: 88k-page synthetic web, wide seeds, full semantics
    val crawlStats =
      try {
        import graft.fixtures.{SyntheticWeb, WebSpec}
        import spark.implicits._
        // sized so the crawl finishes in ~1-2 min even at the driver's 4-core
        // default; scaling evidence lives in tools/scaling_bench.sh
        val spec = WebSpec(hosts = 4, pagesPerHost = 10000, otherOrgPages = 2000,
          subHostPages = 2000, nImages = 20000)
        val pagesDf = spark.range(spec.totalPages.toLong).map(g => SyntheticWeb.pageAt(spec, g)).toDF()
        val robots = SyntheticWeb.allRobots(spec)
          .map(r => r.host -> graft.canon.Robots.fromFetch(s"https://${r.host}", r.status, r.body)).toMap
        val store = new graft.queue.FrontierStore(
          spark, java.nio.file.Files.createTempDirectory("bench-crawl").toString)
        val engine = new graft.engine.CrawlEngine(
          spark, store, pagesDf, robots, graft.oracle.CrawlConfig(),
          claimBatchSize = 32768, trackImages = false, trackOrder = false,
          statusAtFn = (url, attempt) => {
            val host = graft.canon.UrlCanon.parse(url).host
            SyntheticWeb.statusAt(spec, graft.oracle.CrawlOracle.hostIdx(spec, host),
              graft.oracle.CrawlOracle.pageIdx(url), attempt)
          })
        val seeds = for { h <- 0 until 4; i <- 0 until 2000 } yield SyntheticWeb.urlOf(spec, h, i * 3 % 10000)
        val t0 = System.nanoTime()
        val r = engine.run(seeds)
        val secs = (System.nanoTime() - t0) / 1e9
        results("crawl_44k_pages") = secs
        Map(
          "crawl_urls_per_sec" -> r.processedCount / secs,
          "crawl_images_per_sec" -> r.emittedImageCount / secs,
          "crawl_processed" -> r.processedCount.toDouble
        )
      } catch { case e: Throwable => Map("crawl_error" -> 1.0) }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val extra = crawlStats.map { case (k, v) => "\"" + k + "\":" + v }.mkString(",")
    val total = results.values.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,$extra,"sf":"$sfDir"}"""
    )
    spark.stop()
  }
}
