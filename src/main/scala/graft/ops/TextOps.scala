package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale training-data text operators (builder-prompt requirement):
  * dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), language-ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All operators are pure `functions._` compositions (whole-stage codegen,
  * no UDFs); every hash used cross-engine is md5-derived so the DuckDB
  * oracles can reproduce it bit-for-bit.
  *
  * Scale notes: shingle explosion multiplies rows by ~|words|; the
  * self-joins for Jaccard/LSH shuffle on (shingle) / (band signature) —
  * both keys are high-cardinality, so the shuffles are well-distributed;
  * a hot shingle (stopword n-gram) would need a document-frequency cap
  * (`shingleDfCap`) which we apply before the join.
  */
object TextOps {

  /** 60-bit hash of a string via md5 prefix — reproducible in DuckDB as
    * CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT).
    */
  def md5Hash60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Word-level n-gram shingles, DISTINCT per document.
    * Output: (id, shingle). Spark-side: split + transform over a slice
    * window (no UDF).
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val words = split(col(textCol), " ")
    df.select(
        col(idCol),
        explode(
          array_distinct(
            transform(
              sequence(lit(0), greatest(size(words) - n, lit(0))),
              i => concat_ws(" ", slice(words, i + 1, lit(n)))
            )
          )
        ).as("shingle")
      )
      .filter(length(col("shingle")) > 0)
  }

  /** Exact dedup: keep the lowest id per identical text (hash-groupBy).
    * Output: (text_hash, keep_id, dup_count).
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(sha2(col(textCol).cast("binary"), 256).as("text_hash"), col(idCol).cast("long").as("id"))
      .groupBy(col("text_hash"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("dup_count"))

  /** n-gram Jaccard near-duplicate pairs with similarity >= threshold.
    * Exact algorithm: |A∩B| via shingle self-join, |A∪B| = |A|+|B|-|A∩B|.
    * `shingleDfCap` drops shingles appearing in more than that many docs
    * (stopword-gram protection — a shingle with document frequency d
    * contributes d² join rows, so the cap is ON by default; pass
    * Int.MaxValue explicitly for the uncapped exact form).
    */
  val DefaultShingleDfCap: Int = 256

  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      shingleDfCap: Int = DefaultShingleDfCap
  ): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
    // one shuffle: per-shingle document frequency via a window on the same
    // key the self-join below shuffles on (not a groupBy + re-join pass)
    val capped =
      if (shingleDfCap == Int.MaxValue) sh
      else
        sh.withColumn("__df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
          .filter(col("__df") <= shingleDfCap)
          .drop("__df")
    val sizes = capped.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    val a = capped.select(col(idCol).as("id_a"), col("shingle"))
    val b = capped.select(col(idCol).as("id_b"), col("shingle"))
    val common = a
      .join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col(idCol).as("id_a"), col("n_shingles").as("size_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("n_shingles").as("size_b")), Seq("id_b"))
      .withColumn("jaccard", col("common") / (col("size_a") + col("size_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash signature VECTOR per document: one shuffle of the (id, shingle)
    * rows — each shingle row carries all `numHashes` hashes as ONE array
    * column, and the per-document signature is `numHashes` element-wise
    * `min` aggregates in a single groupBy. No ×numHashes row explosion
    * before the shuffle (the round-1 shape shuffled 16× the rows).
    * minhash_i(doc) = min over shingles of md5(i || ':' || shingle)
    * (string min of hex — engine-portable). Output: (id, mh ARRAY<STRING>).
    */
  def minhashVectors(df: DataFrame, idCol: String, textCol: String, n: Int, numHashes: Int): DataFrame = {
    val hashed = shingles(df, idCol, textCol, n)
      .withColumn(
        "__hs",
        transform(sequence(lit(0), lit(numHashes - 1)), i => md5(concat(i, lit(":"), col("shingle"))))
      )
    val mins = (0 until numHashes).map(i => min(element_at(col("__hs"), i + 1)).as(s"__mh_$i"))
    hashed
      .groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"__mh_$i")): _*).as("mh"))
  }

  /** MinHash signatures in (id, hash_idx, minhash) long form — a cheap
    * posexplode of the doc-level vectors (numHashes rows per DOC, not per
    * shingle).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, n: Int, numHashes: Int): DataFrame =
    minhashVectors(df, idCol, textCol, n, numHashes)
      .select(col(idCol), posexplode(col("mh")).as(Seq("hash_idx", "minhash")))

  /** MinHash + LSH banding: docs sharing any band bucket are candidate
    * pairs. numHashes = bands * rowsPerBand. Band signatures are sliced
    * straight out of the doc-level signature vector (sorted within the band,
    * matching the oracle's string_agg ORDER BY), so the bucket join's input
    * is `bands` rows per DOC. The join shuffles on (band, band_sig) —
    * high-cardinality keys, never all-pairs. Output: (id_a, id_b) distinct.
    */
  def minhashLshCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      bands: Int,
      rowsPerBand: Int
  ): DataFrame = {
    val vecs = minhashVectors(df, idCol, textCol, n, bands * rowsPerBand)
    val bandsDf = vecs
      .select(
        col(idCol),
        posexplode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            b => concat_ws("|", sort_array(slice(col("mh"), b * rowsPerBand + 1, lit(rowsPerBand))))
          )
        ).as(Seq("band", "band_sig"))
      )
    val l = bandsDf.select(col(idCol).as("id_a"), col("band"), col("band_sig"))
    val r = bandsDf.select(col(idCol).as("id_b"), col("band"), col("band_sig"))
    l.join(r, Seq("band", "band_sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** 32-bit SimHash over word hashes: bit j set iff the sum of ±1 votes
    * (words whose hash has bit j) is positive. Engine-portable (md5 hash,
    * explicit bit arithmetic). Output: (id, simhash INT as LONG).
    */
  def simhash32(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .withColumn("whash", md5Hash60(col("word")))
    words
      .select(col(idCol), explode(sequence(lit(0), lit(31))).as("bit"), col("whash"))
      .withColumn("vote", when(expr("shiftright(whash, bit)").bitwiseAND(1) === 1, 1).otherwise(-1))
      .groupBy(col(idCol), col("bit"))
      .agg(sum(col("vote")).as("votes"))
      .withColumn("bitval", when(col("votes") > 0, expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(0L))
      .groupBy(col(idCol))
      .agg(sum(col("bitval")).as("simhash"))
  }

  /** 64-bit SimHash (the corpus-standard width). The word hash is 64 bits
    * taken as two md5 32-bit halves; the fingerprint is returned as
    * (simhash_hi, simhash_lo) — unsigned 32-bit halves in BIGINTs, so
    * neither engine touches signed-64 overflow on bit 63. Hamming distance
    * between fingerprints = bit_count(hi XOR hi') + bit_count(lo XOR lo').
    * One explode of 64 bit positions per word, one (id, bit) shuffle —
    * same 100 TB shape as simhash32.
    */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .withColumn("wh_hi", conv(substring(md5(col("word")), 1, 8), 16, 10).cast("long"))
      .withColumn("wh_lo", conv(substring(md5(col("word")), 9, 8), 16, 10).cast("long"))
    words
      .select(col(idCol), explode(sequence(lit(0), lit(63))).as("bit"), col("wh_hi"), col("wh_lo"))
      .withColumn(
        "wbit",
        when(col("bit") < 32, expr("shiftright(wh_lo, bit)"))
          .otherwise(expr("shiftright(wh_hi, bit - 32)"))
          .bitwiseAND(1))
      .withColumn("vote", when(col("wbit") === 1, 1).otherwise(-1))
      .groupBy(col(idCol), col("bit"))
      .agg(sum(col("vote")).as("votes"))
      .withColumn(
        "lo_val",
        when(col("votes") > 0 && col("bit") < 32, expr("shiftleft(CAST(1 AS BIGINT), bit)"))
          .otherwise(0L))
      .withColumn(
        "hi_val",
        when(col("votes") > 0 && col("bit") >= 32, expr("shiftleft(CAST(1 AS BIGINT), bit - 32)"))
          .otherwise(0L))
      .groupBy(col(idCol))
      .agg(sum(col("hi_val")).as("simhash_hi"), sum(col("lo_val")).as("simhash_lo"))
  }

  /** Language-ID by marker-token voting: the language whose marker set
    * hits the text most wins (ties broken lexicographically). A real
    * deployment swaps markers for character-n-gram profiles; the operator
    * shape (explode → join marker table → argmax) is the scale path.
    * Output: (id, lang_pred, hits).
    */
  def langIdByMarkers(df: DataFrame, idCol: String, textCol: String, markers: Map[String, Seq[String]]): DataFrame = {
    val markerRows = markers.toSeq.flatMap { case (lang, ws) => ws.map(w => (lang, w)) }
    val spark = df.sparkSession
    import spark.implicits._
    val markerDf = markerRows.toDF("cand_lang", "word")
    val words = df.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
    val hits = words
      .join(broadcast(markerDf), Seq("word"))
      .groupBy(col(idCol), col("cand_lang"))
      .agg(count(lit(1)).as("hits"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("hits").desc, col("cand_lang").asc)
    hits
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("cand_lang").as("lang_pred"), col("hits"))
  }

  /** Quality scoring: length, token stats, punctuation/stopword ratios —
    * the C4/Gopher-style per-document features. All codegen'd expressions.
    */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String, stopwords: Seq[String]): DataFrame = {
    val words = split(col(textCol), " ")
    val nTokens = size(words)
    val stopArr = array(stopwords.map(lit): _*)
    df.select(
      col(idCol),
      length(col(textCol)).as("n_chars"),
      nTokens.as("n_tokens"),
      (length(col(textCol)) / greatest(nTokens, lit(1))).as("mean_token_len"),
      (size(filter(words, w => array_contains(stopArr, w))) / greatest(nTokens, lit(1)).cast("double"))
        .as("stopword_ratio"),
      (length(regexp_replace(col(textCol), "[a-zA-Z0-9 ]", "")) / greatest(length(col(textCol)), lit(1)).cast("double"))
        .as("punct_ratio"),
      (size(array_distinct(words)) / greatest(nTokens, lit(1)).cast("double")).as("distinct_token_ratio")
    )
  }

  /** Token counting: whitespace tokens + a BPE-ish subword estimate
    * (alnum runs + non-space punctuation as separate tokens).
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(split(col(textCol), "\\s+")).as("ws_tokens"),
      // BPE-ish estimate: alnum runs + standalone non-alnum-non-space chars
      // (RE2-safe — no lookarounds — so the DuckDB oracle can reproduce it)
      (size(regexp_extract_all(col(textCol), lit("[a-zA-Z0-9]+"), lit(0))) +
        size(regexp_extract_all(col(textCol), lit("[^a-zA-Z0-9 \\t\\n]"), lit(0))))
        .as("bpe_ish_tokens")
    )

  /** Document fingerprint: min/max md5 over 8-gram shingles (winnowing-lite
    * rolling-hash fingerprint; engine-portable).
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String, n: Int = 8): DataFrame =
    shingles(df, idCol, textCol, n)
      .groupBy(col(idCol))
      .agg(
        min(md5(col("shingle"))).as("fp_min"),
        max(md5(col("shingle"))).as("fp_max"),
        count(lit(1)).as("n_shingles")
      )
}
