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
    // Split ONCE into a projected column: higher-order functions are
    // interpreted (CodegenFallback), so a split() embedded in the transform
    // lambda would re-tokenize the whole text per shingle position —
    // O(words^2) per document. As a column consumed twice (size bound +
    // lambda body) the split survives CollapseProject and runs once per row.
    val words = col("__words")
    df.select(col(idCol), split(col(textCol), " ").as("__words"))
      .select(
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
    * minhash_i(doc) = min over shingles of (h1(shingle) + i*h2(shingle))
    * where h1/h2 are the two md5 halves (double hashing — engine-portable
    * BIGINT arithmetic). Output: (id, mh ARRAY<LONG>).
    */
  def minhashVectors(df: DataFrame, idCol: String, textCol: String, n: Int, numHashes: Int): DataFrame = {
    // Kirsch-Mitzenmacher double hashing: ONE md5 per shingle, split into a
    // 60-bit h1 and 56-bit h2; hash_i = h1 + i*h2 (i < 64 keeps the sum
    // under 2^63 — no overflow in Spark OR the DuckDB oracle's BIGINT).
    // vs the previous 16-md5s-per-shingle form this removes ~94% of the
    // digest work from the dominant per-shingle stage.
    require(numHashes <= 64, s"numHashes > 64 overflows the 63-bit hash-combination budget: $numHashes")
    // h1/h2 are aggregated by `numHashes` consumers each, so CollapseProject
    // leaves the md5/conv in this Project (evaluated ONCE per shingle) — do
    // NOT move the combination into a `transform` lambda: a single-consumer
    // array column gets the md5 inlined per element (16x per row).
    val hashed = shingles(df, idCol, textCol, n)
      .withColumn("__md5", md5(col("shingle")))
      .withColumn("__h1", conv(substring(col("__md5"), 1, 15), 16, 10).cast("long"))
      .withColumn("__h2", conv(substring(col("__md5"), 17, 14), 16, 10).cast("long"))
    val mins = (0 until numHashes)
      .map(i => min(col("__h1") + lit(i.toLong) * col("__h2")).as(s"__mh_$i"))
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

  /** Positional word-level n-gram shingles (NOT distinct — one row per
    * position): (id, pos, shingle), pos 0-based. Same tokenize-once shape
    * as [[shingles]].
    */
  def posShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val words = col("__words")
    df.select(col(idCol), split(col(textCol), " ").as("__words"))
      .select(
        col(idCol),
        posexplode(
          transform(
            sequence(lit(0), greatest(size(words) - n, lit(0))),
            i => concat_ws(" ", slice(words, i + 1, lit(n)))
          )
        ).as(Seq("pos", "shingle"))
      )
      .filter(length(col("shingle")) > 0)
  }

  /** Cross-document repeated-span detection — the exact-substring dedup /
    * decontamination primitive (word-granular variant of Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): an n-gram
    * occurring in >= `minDocs` DISTINCT documents marks every position it
    * occupies, and per document the marked positions merge into contiguous
    * spans (gaps-and-islands over a per-doc window).
    *
    * Scale shape: one agg on the 60-bit shingle hash (map-side combinable
    * count-distinct approximated exactly here via two-level groupBy is not
    * needed — the hash is high-cardinality), a LEFT SEMI join back on the
    * hash (only the shared-hash list shuffles against the positional rows;
    * a stop-phrase hot hash is an AQE skew bucket, not a correctness risk),
    * then per-document window + aggs. No all-pairs anything.
    *
    * Output: (id, n_shingles, n_dup_shingles, dup_fraction, n_spans,
    * max_span_words).
    */
  def crossDocSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocs: Int = 2): DataFrame = {
    val sh = posShingles(df, idCol, textCol, n).withColumn("__h", md5Hash60(col("shingle")))
    val shared = sh
      .groupBy(col("__h"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__h"))
    markedSpans(sh, shared, idCol, n)
  }

  /** Positions of `sh` whose hash is in `shared` merge into contiguous
    * spans per doc (gaps-and-islands over a PER-DOC window); docs with no
    * marked position report zeros. Shared by [[crossDocSpans]] (marks =
    * hashes seen in >= minDocs docs) and [[decontaminate]] (marks = hashes
    * from the held-out set).
    */
  private def markedSpans(sh: DataFrame, shared: DataFrame, idCol: String, n: Int): DataFrame = {
    val dup = sh.join(shared, Seq("__h"), "left_semi")
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val spans = dup
      .withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("pos")).as("__s"), max(col("pos")).as("__e"), count(lit(1)).as("__len"))
    val perDoc = spans
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("__n_spans"),
        max(col("__e") - col("__s") + n).as("__max_span_words"),
        sum(col("__len")).as("__n_dup"))
    sh.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_shingles"),
        coalesce(col("__n_dup"), lit(0L)).as("n_dup_shingles"),
        round(coalesce(col("__n_dup"), lit(0L)).cast("double") / col("n_shingles"), 6)
          .as("dup_fraction"),
        coalesce(col("__n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("__max_span_words"), lit(0L)).as("max_span_words")
      )
  }

  /** Benchmark decontamination (cross-TABLE exact-substring overlap, the
    * train-vs-test form of [[crossDocSpans]]): every word n-gram of the
    * held-out `test` set marks the train positions it occupies; marked
    * positions merge into per-train-doc spans. A train doc with
    * n_dup_shingles > 0 contains verbatim held-out content — the standard
    * drop/redact criterion when preparing pretraining data against an
    * evaluation suite.
    *
    * Scale shape: the test side reduces to DISTINCT 60-bit hashes (tiny
    * next to the corpus — an eval suite is MBs against 100 TB), and the
    * train side takes one LEFT SEMI on the hash — effectively a broadcast
    * probe; then the same per-doc window as crossDocSpans. The train
    * corpus is never joined against itself.
    */
  def decontaminate(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      test: DataFrame,
      testTextCol: String,
      n: Int): DataFrame = {
    val sh = posShingles(train, trainIdCol, trainTextCol, n)
      .withColumn("__h", md5Hash60(col("shingle")))
    // words projected ONCE (HOF-lambda rule, SCALE.md): two consumers keep
    // the split out of the transform lambda.
    val testHashes = test
      .select(split(col(testTextCol), " ").as("__words"))
      .select(explode(array_distinct(transform(
        sequence(lit(0), greatest(size(col("__words")) - n, lit(0))),
        i => concat_ws(" ", slice(col("__words"), i + 1, lit(n)))))).as("shingle"))
      .filter(length(col("shingle")) > 0)
      .select(md5Hash60(col("shingle")).as("__h"))
      .distinct()
    markedSpans(sh, testHashes, trainIdCol, n)
      .withColumnsRenamed(Map(
        "n_dup_shingles" -> "n_contaminated",
        "dup_fraction" -> "contamination_fraction"))
  }

  /** Contamination REMOVAL (the actionable half of [[decontaminate]]):
    * word positions covered by any held-out n-gram are cut and the
    * document reassembles from the survivors in order. Same scale shape as
    * decontaminate plus one bounded (≤ n) position explode, a LEFT ANTI
    * equi-join, and a per-doc reassembly agg — no windows.
    * Output: (id, cleaned_text, n_words, n_removed_words).
    */
  def decontaminateClean(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      test: DataFrame,
      testTextCol: String,
      n: Int): DataFrame = {
    val sh = posShingles(train, trainIdCol, trainTextCol, n)
      .withColumn("__h", md5Hash60(col("shingle")))
    val testHashes = test
      .select(split(col(testTextCol), " ").as("__words"))
      .select(explode(array_distinct(transform(
        sequence(lit(0), greatest(size(col("__words")) - n, lit(0))),
        i => concat_ws(" ", slice(col("__words"), i + 1, lit(n)))))).as("shingle"))
      .filter(length(col("shingle")) > 0)
      .select(md5Hash60(col("shingle")).as("__h"))
      .distinct()
    val covered = sh.join(testHashes, Seq("__h"), "left_semi")
      .select(col(trainIdCol),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("wpos"))
      .distinct()
    val words = train
      .select(col(trainIdCol), posexplode(split(col(trainTextCol), " ")).as(Seq("wpos", "word")))
    val kept = words.join(covered, Seq(trainIdCol, "wpos"), "left_anti")
    val rebuilt = kept
      .groupBy(col(trainIdCol))
      .agg(
        count(lit(1)).as("__n_kept"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("wpos"), col("word")))),
            x => x.getField("word"))).as("cleaned_text"))
    train
      .select(col(trainIdCol), size(split(col(trainTextCol), " ")).cast("long").as("n_words"))
      .join(rebuilt, Seq(trainIdCol), "left")
      .select(
        col(trainIdCol),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"),
        col("n_words"),
        (col("n_words") - coalesce(col("__n_kept"), lit(0L))).as("n_removed_words"))
  }

  /** Unicode text normalization for web corpora: zero-width character
    * strip, CRLF/CR -> LF, NFC composition (native codegen expression
    * NfcNormalizeExpr — no UDF), space/tab-run collapse, edge trim.
    * Map-only; `changed` marks rows the pipeline actually touched so
    * downstream stages can skip rewriting untouched partitions.
    */
  def normalizeText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.expr.TextNormFunctions.register(df.sparkSession)
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, "[\u200B\u200C\u200D\uFEFF]", "")
    val t2 = regexp_replace(t1, "\r\n?", "\n")
    val t3 = graft.expr.TextNormFunctions.nfcNormalize(t2)
    val t4 = trim(regexp_replace(t3, "[ \t]{2,}", " "))
    df.select(
      col(idCol),
      t4.as("norm_text"),
      (t4 =!= t0).as("changed"))
  }

  /** Cross-corpus PARAGRAPH dedup (RefinedWeb / Falcon granularity,
    * Penedo et al. 2023): every repeated paragraph is removed except its
    * global first occurrence (smallest (doc id, position)); documents are
    * reassembled from their surviving paragraphs in original order.
    * Paragraphs are blank-line-separated, trimmed; empty units drop.
    *
    * Scale shape: explode → ONE agg on the 60-bit paragraph hash (map-side
    * combinable min over (id, pos) structs) → equi-join back on the hash →
    * per-doc reassembly agg. A boilerplate paragraph repeated across 10^9
    * docs is ONE agg row and a skewed join key (AQE bucket), never a
    * fan-out. Output: (id, cleaned_text, n_paras, n_removed).
    */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val paras = df
      .select(col(idCol), posexplode(split(col(textCol), "\n{2,}")).as(Seq("pos", "para")))
      .select(col(idCol), col("pos"), trim(col("para")).as("para"))
      .filter(length(col("para")) > 0)
      .withColumn("__h", md5Hash60(col("para")))
    val firstOcc = paras
      .groupBy(col("__h"))
      .agg(min(struct(col(idCol), col("pos"))).as("__first"))
    val marked = paras
      .join(firstOcc, Seq("__h"))
      .withColumn("__keep", struct(col(idCol), col("pos")) === col("__first"))
    val perDoc = marked
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("__keep"), 0L).otherwise(1L)).as("n_removed"),
        concat_ws("\n\n",
          transform(
            array_sort(collect_list(when(col("__keep"), struct(col("pos"), col("para"))))),
            x => x.getField("para"))).as("cleaned_text"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"),
        coalesce(col("n_paras"), lit(0L)).as("n_paras"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
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
    // tokenize ONCE: `__words` has many consumers below, so CollapseProject
    // keeps the split in its own Project (see the HOF-lambda rule in SCALE.md)
    val words = col("__words")
    val nTokens = size(words)
    val stopArr = array(stopwords.map(lit): _*)
    df.select(col(idCol), col(textCol), split(col(textCol), " ").as("__words"))
      .select(
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

  // --- PII redaction ----------------------------------------------------------

  /** PII patterns, applied in a FIXED order (earlier rules consume their
    * matches before later ones see the text): email, IPv4, separator phone,
    * then long bare digit runs (card-shaped). RE2-safe — character classes,
    * bounded repeats and ASCII `\b` only, no lookarounds — so a DuckDB
    * oracle replays the identical chain.
    */
  val PiiRules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}[-. ]\\d{3,4}[-. ]\\d{4}\\b", "<PHONE>"),
    ("card", "\\b\\d{13,16}\\b", "<CARD>")
  )

  /** PII redaction: replace emails / IPv4s / phone numbers / card-shaped
    * digit runs with typed placeholders and count each class on the
    * ORIGINAL text. Pure per-row `regexp_replace` chain — no shuffle, fully
    * whole-stage-codegen'd; the 100 TB plan is a map-only scan.
    * Output: (id, redacted_text, n_email, n_ip, n_phone, n_card).
    */
  def piiRedact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val redacted = PiiRules.foldLeft(col(textCol)) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }
    // counts run the SAME sequential-consumption semantics as the redaction
    // (an email's host segment must not also count as a bare digit run), so
    // each class counts matches on the text with all EARLIER rules applied
    val counts = PiiRules.zipWithIndex.map { case ((name, pat, _), i) =>
      val pre = PiiRules.take(i).foldLeft(col(textCol)) { case (c, (_, p, r)) =>
        regexp_replace(c, p, r)
      }
      size(regexp_extract_all(pre, lit(pat), lit(0))).as(s"n_$name")
    }
    df.select(col(idCol) +: redacted.as("redacted_text") +: counts: _*)
  }

  // --- C4 / Gopher quality filtering -------------------------------------------

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep lines
    * that end in terminal punctuation, carry at least `minLineWords` words,
    * and don't contain the boilerplate markers ("javascript", "cookie
    * policy"); a document whose text contains "lorem ipsum" or "{" is
    * dropped wholesale (cleaned_text = null). Pure per-row array ops.
    * Output: (id, cleaned_text, n_lines, n_kept_lines).
    */
  def c4LineClean(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minLineWords: Int = 3): DataFrame = {
    // split + line-filter each run ONCE as projected columns (both have two
    // consumers below, so CollapseProject can't inline them back — see the
    // HOF-lambda rule in SCALE.md)
    val lines = col("__lines")
    val kept = col("__kept")
    val docDropped = lower(col(textCol)).contains("lorem ipsum") || col(textCol).contains("{")
    df.select(col(idCol), col(textCol), split(col(textCol), "\n").as("__lines"))
      .select(col(idCol), col(textCol), lines,
        filter(lines, l => {
          val t = trim(l)
          t.rlike("[.!?\"']$") &&
            size(split(t, "\\s+")) >= minLineWords &&
            !lower(t).contains("javascript") &&
            !lower(t).contains("cookie policy")
        }).as("__kept"))
      .select(
        col(idCol),
        when(docDropped, lit(null).cast("string"))
          .otherwise(concat_ws("\n", kept)).as("cleaned_text"),
        size(lines).as("n_lines"),
        when(docDropped, lit(0)).otherwise(size(kept)).as("n_kept_lines")
      )
  }

  /** Gopher-style document-level quality rules (Rae et al. 2021 table A1,
    * simplified): word-count bounds, mean word length bounds, symbol-to-word
    * ratio, alphabetic-word ratio, bullet-start / ellipsis-end line ratios,
    * plus C4's lorem-ipsum / curly-brace document drops. Every rule is its
    * own boolean column; `keep` is their conjunction. Pure per-row
    * expressions — map-only at any scale.
    */
  def qualityFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minAlphaWordRatio: Double = 0.8,
      maxBulletLineRatio: Double = 0.1,
      maxEllipsisLineRatio: Double = 0.3): DataFrame = {
    // tokenize ONCE into projected columns (many consumers each — the split
    // survives CollapseProject; see the HOF-lambda rule in SCALE.md)
    val df2 = df.select(
      col(idCol), col(textCol),
      split(trim(col(textCol)), "\\s+").as("__words"),
      split(col(textCol), "\n").as("__lines"))
    val words = col("__words")
    val nWords = size(words)
    val nWordsD = greatest(nWords, lit(1)).cast("double")
    val meanWordLen =
      aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double") / nWordsD
    val symbolRatio =
      (size(regexp_extract_all(col(textCol), lit("#"), lit(0))) +
        size(regexp_extract_all(col(textCol), lit("\\.\\.\\."), lit(0)))).cast("double") / nWordsD
    val alphaRatio =
      size(filter(words, w => w.rlike("[a-zA-Z]"))).cast("double") / nWordsD
    val lines = col("__lines")
    val nLinesD = greatest(size(lines), lit(1)).cast("double")
    val bulletRatio =
      size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("double") / nLinesD
    val ellipsisRatio =
      size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("double") / nLinesD
    val okWords = nWords >= minWords && nWords <= maxWords
    val okMeanLen = meanWordLen >= minMeanWordLen && meanWordLen <= maxMeanWordLen
    val okSymbol = symbolRatio <= maxSymbolRatio
    val okAlpha = alphaRatio >= minAlphaWordRatio
    val okBullet = bulletRatio <= maxBulletLineRatio
    val okEllipsis = ellipsisRatio <= maxEllipsisLineRatio
    val okLorem = !lower(col(textCol)).contains("lorem ipsum")
    val okBrace = !col(textCol).contains("{")
    df2.select(
      col(idCol),
      nWords.as("n_words"),
      round(meanWordLen, 6).as("mean_word_len"),
      round(symbolRatio, 6).as("symbol_ratio"),
      round(alphaRatio, 6).as("alpha_word_ratio"),
      round(bulletRatio, 6).as("bullet_line_ratio"),
      round(ellipsisRatio, 6).as("ellipsis_line_ratio"),
      okWords.as("ok_words"),
      okMeanLen.as("ok_mean_word_len"),
      okSymbol.as("ok_symbol_ratio"),
      okAlpha.as("ok_alpha_ratio"),
      okBullet.as("ok_bullet_lines"),
      okEllipsis.as("ok_ellipsis_lines"),
      okLorem.as("ok_no_lorem"),
      okBrace.as("ok_no_brace"),
      (okWords && okMeanLen && okSymbol && okAlpha && okBullet && okEllipsis &&
        okLorem && okBrace).as("keep")
    )
  }

  // --- Gopher repetition signals (Rae et al. 2021 table A1, repetition half)

  /** Duplicate-line / duplicate-paragraph repetition signals.
    *
    * Units: lines split on `\n`, paragraphs split on blank-line runs
    * (`\n{2,}`); each unit is trimmed and empty units are dropped before
    * counting. Per document:
    *   - `dup_line_fraction`    = occurrences beyond the first of any
    *     repeated line, over all lines: (n_lines - n_distinct) / n_lines
    *   - `dup_line_char_fraction` = characters in those excess occurrences
    *     over characters in all lines
    * and the paragraph analogues.
    *
    * Scale shape: explode -> groupBy(id, unit) -> groupBy(id); both
    * aggregations are map-side combinable and keyed by doc-prefixed keys,
    * so the shuffle distributes with the documents. No windows, no
    * collects.
    */
  def lineRepetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def stats(splitPat: String, unit: String): DataFrame =
      df.select(
          col(idCol),
          explode(filter(transform(split(col(textCol), splitPat), u => trim(u)),
            u => length(u) > 0)).as("__u"))
        .groupBy(col(idCol), col("__u"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col(idCol))
        .agg(
          sum(col("__c")).as(s"n_${unit}s"),
          count(lit(1)).as("__nd"),
          sum((col("__c") - 1) * length(col("__u"))).as("__dupChars"),
          sum(col("__c") * length(col("__u"))).as("__totChars"))
        .select(
          col(idCol),
          col(s"n_${unit}s"),
          round((col(s"n_${unit}s") - col("__nd")).cast("double") / col(s"n_${unit}s"), 6)
            .as(s"dup_${unit}_fraction"),
          round(col("__dupChars").cast("double") / greatest(col("__totChars"), lit(1L)), 6)
            .as(s"dup_${unit}_char_fraction"))
    df.select(col(idCol))
      .join(stats("\n", "line"), Seq(idCol), "left")
      .join(stats("\n{2,}", "para"), Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("dup_line_fraction"), lit(0d)).as("dup_line_fraction"),
        coalesce(col("dup_line_char_fraction"), lit(0d)).as("dup_line_char_fraction"),
        coalesce(col("n_paras"), lit(0L)).as("n_paras"),
        coalesce(col("dup_para_fraction"), lit(0d)).as("dup_para_fraction"),
        coalesce(col("dup_para_char_fraction"), lit(0d)).as("dup_para_char_fraction"))
  }

  /** Top / duplicated word-n-gram repetition signals.
    *
    * Words: whitespace-split, empties dropped. `total word chars` = sum of
    * word lengths (separators excluded); an n-gram's char length = sum of
    * its word lengths. Per document:
    *   - for n in `topNs`:  `top_{n}gram_char_fraction` = count * charlen of
    *     the most frequent n-gram (ties: the one with the largest
    *     count*charlen) over total word chars (Gopher's "fraction of
    *     characters contained within the most frequent n-gram").
    *   - for n in `dupNs`: `dup_{n}gram_char_fraction` = chars of WORD
    *     POSITIONS covered by any n-gram occurring >= 2 times in the
    *     document, over total word chars (positional coverage — overlapping
    *     duplicated grams count each word once, faithful to Gopher's
    *     character-coverage definition at word granularity).
    *
    * Scale shape: ONE positional explode produces (id, n, pos, gram-hash)
    * rows for every n at once (fan-out |words| * |ns|); counts are a
    * map-combinable groupBy on (id, n, hash); duplicated-gram positions
    * come back via LEFT SEMI on the same key; coverage is an n-bounded
    * (<= max n per gram) position explode, distinct, then an equi-join
    * against the (id, pos, wordlen) frame — no windows, no range joins,
    * no per-doc arrays shipped through shuffles. Grams travel as 60-bit
    * md5 hashes, never as strings.
    */
  def ngramRepetition(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topNs: Seq[Int] = Seq(2, 3, 4),
      dupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10)): DataFrame = {
    val allNs = (topNs ++ dupNs).distinct.sorted
    val words = col("__words")
    // words projected ONCE (HOF-lambda rule, SCALE.md): every slice below
    // reads the projected array, never re-splits the text.
    val base = df.select(
      col(idCol),
      filter(split(trim(col(textCol)), "\\s+"), w => length(w) > 0).as("__words"))
    val withTot = base.select(
      col(idCol), words,
      aggregate(words, lit(0L), (acc, w) => acc + length(w)).as("__totChars"))

    // (id, n, pos, hash, charlen) for every n in one explode.
    val grams = withTot
      .select(
        col(idCol), col("__totChars"),
        explode(flatten(transform(
          lit(allNs.toArray),
          n => transform(
            filter(sequence(lit(0), greatest(size(words) - n, lit(0))),
              i => i + n <= size(words)),
            i => struct(
              n.as("n"), i.as("pos"),
              concat_ws(" ", slice(words, i + 1, n)).as("g")))
        ))).as("__e"))
      .select(
        col(idCol), col("__totChars"),
        col("__e.n").as("__n"), col("__e.pos").as("__pos"),
        md5Hash60(col("__e.g")).as("__h"),
        (length(col("__e.g")) - (col("__e.n") - 1)).as("__len"))

    val counts = grams
      .groupBy(col(idCol), col("__n"), col("__h"))
      .agg(count(lit(1)).as("__c"), min(col("__len")).as("__len"))

    // Top-gram char fraction per (id, n in topNs).
    val tops = counts
      .filter(col("__n").isin(topNs: _*))
      .groupBy(col(idCol), col("__n"))
      .agg(max(struct(col("__c"), (col("__c") * col("__len")).as("__cf"))).as("__top"))
      .select(col(idCol), col("__n"), col("__top.__cf").as("__topChars"))

    // Positional coverage of duplicated grams per (id, n in dupNs).
    val dupHashes = counts.filter(col("__n").isin(dupNs: _*) && col("__c") >= 2)
      .select(col(idCol), col("__n"), col("__h"))
    val wordLens = withTot.select(
      col(idCol),
      posexplode(transform(words, w => length(w))).as(Seq("__pos", "__wlen")))
    val covered = grams
      .filter(col("__n").isin(dupNs: _*))
      .join(dupHashes, Seq(idCol, "__n", "__h"), "left_semi")
      .select(col(idCol), col("__n"),
        explode(sequence(col("__pos"), col("__pos") + col("__n") - 1)).as("__pos"))
      .distinct()
      .join(wordLens, Seq(idCol, "__pos"))
      .groupBy(col(idCol), col("__n"))
      .agg(sum(col("__wlen")).as("__covChars"))

    // Pivot the per-(id, n) stats into one row per doc.
    val perN = tops.select(col(idCol), col("__n"), col("__topChars"), lit(null).cast("long").as("__covChars"))
      .unionByName(covered.select(col(idCol), col("__n"), lit(null).cast("long").as("__topChars"), col("__covChars")))
    val tot = withTot.select(col(idCol), greatest(col("__totChars"), lit(1L)).cast("double").as("__tot"))
    val topCols = topNs.map(n => round(
      coalesce(max(when(col("__n") === n, col("__topChars"))), lit(0L)).cast("double") / first(col("__tot")), 6
    ).as(s"top_${n}gram_char_fraction"))
    val dupCols = dupNs.map(n => round(
      coalesce(max(when(col("__n") === n, col("__covChars"))), lit(0L)).cast("double") / first(col("__tot")), 6
    ).as(s"dup_${n}gram_char_fraction"))
    tot.join(perN, Seq(idCol), "left")
      .groupBy(col(idCol))
      .agg(topCols.head, (topCols.tail ++ dupCols): _*)
  }

  /** Full Gopher repetition filter: line/paragraph + n-gram signals with
    * the Rae et al. 2021 table A1 thresholds; `keep` is the conjunction.
    */
  def repetitionFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDupLineFrac: Double = 0.30,
      maxDupParaFrac: Double = 0.30,
      maxDupLineCharFrac: Double = 0.20,
      maxDupParaCharFrac: Double = 0.20,
      topThresholds: Map[Int, Double] = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16),
      dupThresholds: Map[Int, Double] =
        Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)): DataFrame = {
    val lines = lineRepetition(df, idCol, textCol)
    val grams = ngramRepetition(df, idCol, textCol,
      topThresholds.keys.toSeq.sorted, dupThresholds.keys.toSeq.sorted)
    val joined = lines.join(grams, Seq(idCol), "left")
    val okLine = col("dup_line_fraction") <= maxDupLineFrac
    val okPara = col("dup_para_fraction") <= maxDupParaFrac
    val okLineChar = col("dup_line_char_fraction") <= maxDupLineCharFrac
    val okParaChar = col("dup_para_char_fraction") <= maxDupParaCharFrac
    val okTop = topThresholds.toSeq.sortBy(_._1).map { case (n, t) =>
      (coalesce(col(s"top_${n}gram_char_fraction"), lit(0d)) <= t).as(s"ok_top_${n}gram") }
    val okDup = dupThresholds.toSeq.sortBy(_._1).map { case (n, t) =>
      (coalesce(col(s"dup_${n}gram_char_fraction"), lit(0d)) <= t).as(s"ok_dup_${n}gram") }
    val keep = (okTop ++ okDup).foldLeft(okLine && okPara && okLineChar && okParaChar)(_ && _)
    joined.select(
      (Seq(col(idCol)) ++ joined.columns.filter(_ != idCol).map(col) ++
        Seq(okLine.as("ok_dup_lines"), okPara.as("ok_dup_paras"),
            okLineChar.as("ok_dup_line_chars"), okParaChar.as("ok_dup_para_chars")) ++
        okTop ++ okDup ++ Seq(keep.as("keep"))): _*)
  }

  // ==== n-gram LM scoring (CCNet / DSIR-style corpus curation) =============

  /** Word n-grams WITH multiplicity (one output row per n-gram OCCURRENCE;
    * [[shingles]] is the distinct-per-doc variant). Extra columns listed in
    * `carry` ride through the generator. Docs with fewer than n words emit
    * nothing. The word array is projected once and consumed twice (sequence
    * bound + lambda body), so the split survives CollapseProject and runs
    * once per row — the HOF-lambda rule (SCALE.md).
    */
  private def ngramOccurrences(
      df: DataFrame, idCol: String, textCol: String, n: Int, carry: Seq[String]): DataFrame = {
    val words = col("__words")
    df.select(
        (Seq(col(idCol)) ++ carry.map(col) :+
          filter(split(col(textCol), " "), w => length(w) > 0).as("__words")): _*)
      .filter(size(words) >= n)
      .select(
        (Seq(col(idCol)) ++ carry.map(col) :+
          explode(
            transform(
              sequence(lit(0), size(words) - n),
              i => concat_ws(" ", slice(words, i + 1, lit(n)))
            )
          ).as("gram")): _*)
  }

  /** CCNet-style n-gram LM quality scoring (Wenzek et al. 2020): train an
    * add-one-smoothed n-gram model on the `refFilter` stratum (the "clean"
    * corpus — CCNet uses Wikipedia), score every document by mean token
    * log-probability, and bucket into head / middle / tail. Documents with
    * fewer than n words are dropped (no grams to score).
    *
    * Scale shape: the model is ONE count aggregation over the reference
    * grams; scoring is a join of the corpus's gram stream against the model
    * table (shuffle-on-gram — the model is NOT collected or broadcast by
    * hand: at web scale it can be billions of rows, and AQE broadcasts it
    * only when it is actually small) followed by one per-doc aggregation.
    * Per-gram log-probs are rounded to 9 dp and accumulated as
    * DECIMAL(18,9) — decimal sums are exact and order-independent, where a
    * double sum would differ run-to-run with partial-aggregation order.
    *
    * Output: (id, n_grams, n_oov, lm_score, lm_bucket) — lm_score is the
    * mean gram log-prob rounded to 4 dp; the bucket thresholds compare the
    * ROUNDED score so the decision is reproducible cross-engine.
    */
  def lmScore(
      df: DataFrame,
      refFilter: Column,
      idCol: String,
      textCol: String,
      n: Int = 2,
      headThreshold: Double = -6.81,
      tailThreshold: Double = -6.94): DataFrame = {
    val grams = ngramOccurrences(
      df.withColumn("__ref", refFilter), idCol, textCol, n, carry = Seq("__ref"))
    // The model frame has two downstream consumers (the consts aggregate
    // and the scoring join), each re-planning the reference-corpus lineage.
    // At cluster scale, persist the model as a table between the train and
    // score passes (a CCNet pipeline does anyway); at fixture scale an
    // eager materialization costs more than the recompute (measured), so
    // the operator stays lazy and leaves the choice to the caller.
    val model = grams.filter(col("__ref")).groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
    // T = reference gram occurrences, V = reference gram vocabulary: one
    // tiny frame, cross-joined (broadcast) into the per-gram score.
    val consts = model.agg(sum(col("cnt")).as("__t"), count(lit(1)).as("__v"))
    val lnp = round(
      log((coalesce(col("cnt"), lit(0L)) + lit(1)).cast("double") /
        (col("__t") + col("__v") + lit(1)).cast("double")),
      9).cast("decimal(18,9)")
    val scored = grams
      .join(model, Seq("gram"), "left")
      .crossJoin(broadcast(consts))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("cnt").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(lnp).as("__score"))
    val avg = round(col("__score").cast("double") / col("n_grams"), 4)
    scored.select(
      col(idCol), col("n_grams"), col("n_oov"), avg.as("lm_score"),
      when(avg >= headThreshold, lit("head"))
        .when(avg >= tailThreshold, lit("middle"))
        .otherwise(lit("tail")).as("lm_bucket"))
  }

  /** DSIR importance weighting (Xie et al. 2023): hashed n-gram features,
    * per-document importance weight = Σ over feature occurrences of
    * log p_target(f) − log p_raw(f), both distributions add-one smoothed
    * over `buckets` hash buckets. `targetFilter` marks the target-domain
    * stratum; the raw distribution is the whole input. Selection keeps
    * documents whose weight clears `keepThreshold` (the reference method
    * samples ∝ exp(weight); the deterministic threshold is the reproducible
    * form of the same ranking).
    *
    * Scale shape: feature counts collapse to ≤ `buckets` rows (one
    * map-combinable aggregation — both distributions in a single pass via
    * conditional counts); the per-feature log-ratio table is at most
    * `buckets` rows and is explicitly broadcast into the scoring join, so
    * the corpus never shuffles. The log-ratio argument is assembled from
    * exact integer cross-products — ((ct+1)·(Tr+B)) / ((cr+1)·(Tt+B)) as
    * ONE division — then rounded to 9 dp and summed as DECIMAL (exact,
    * order-independent).
    *
    * Output: (id, n_feats, dsir_weight, keep).
    */
  def dsirWeights(
      df: DataFrame,
      targetFilter: Column,
      idCol: String,
      textCol: String,
      n: Int = 2,
      buckets: Int = 4096,
      keepThreshold: Double = 0.0): DataFrame = {
    val grams = ngramOccurrences(
      df.withColumn("__target", targetFilter), idCol, textCol, n, carry = Seq("__target"))
    val feats = grams.select(
      col(idCol), col("__target"),
      pmod(md5Hash60(col("gram")), lit(buckets.toLong)).as("feat"))
    val counts = feats.groupBy(col("feat")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("__target"), 1L).otherwise(0L)).as("ct"))
    val consts = counts.agg(sum(col("cr")).as("__tr"), sum(col("ct")).as("__tt"))
    // ln(p_t/p_r) with add-one smoothing over `buckets` buckets:
    // exact integer products (≪ 2^53 at any count the decimal sum permits),
    // one correctly-rounded division, one ln, rounded once.
    val term = round(
      log(((col("ct") + lit(1)) * (col("__tr") + lit(buckets))).cast("double") /
        ((col("cr") + lit(1)) * (col("__tt") + lit(buckets))).cast("double")),
      9).cast("decimal(18,9)")
    val featWeights = counts.crossJoin(broadcast(consts)).select(col("feat"), term.as("__w"))
    val weight = round(col("__sum").cast("double"), 4)
    feats
      .join(broadcast(featWeights), Seq("feat"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("__w")).as("__sum"))
      .select(
        col(idCol), col("n_feats"), weight.as("dsir_weight"),
        (weight >= keepThreshold).as("keep"))
  }

  // ---- boilerplate removal / main-content extraction ------------------------
  // jusText-family block classification (Pomikálek 2011), the content-vs-
  // chrome gate every HTML training corpus runs before any text op. Block
  // segmentation + integer feature counting is ONE native codegen call per
  // page (expr/HtmlBlocksExpr); everything after the explode is Catalyst
  // arithmetic + one per-doc window pass, so the op is map-only up to a
  // single partitionBy(doc) window (bounded partitions — blocks per page,
  // not pages per partition).

  /** Context-free thresholds (rule constants shared with the oracle SQL):
    * a block is BAD chrome when link-dense, GOOD content when long enough
    * with function-word density, SHORT otherwise (resolved by neighbors).
    */
  val BoilerMaxLinkDensity = 0.3
  val BoilerMinChars = 80
  val BoilerMinStopDensity = 0.25

  /** Per-block features + classification. Output: (id, block_idx, chars,
    * link_chars, words, stop_words, link_density, stop_density, cls, keep)
    * — cls ∈ {good, bad, short} is the context-free class; keep is the
    * final verdict after the context pass (a short block survives iff its
    * nearest non-short neighbors on BOTH sides are good — jusText's
    * neighbor inheritance, deterministic edge rule: missing neighbor =
    * bad). Densities divide once and round once (cross-engine exact).
    */
  def boilerBlocks(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    graft.expr.HtmlFunctions.register(df.sparkSession)
    val blocks = df
      .select(col(idCol),
        explode(graft.expr.HtmlFunctions.htmlBlocks(col(htmlCol))).as("b"))
      .select(
        col(idCol),
        col("b.idx").as("block_idx"),
        col("b.text").as("__text"),
        col("b.chars").as("chars"),
        col("b.link_chars").as("link_chars"),
        col("b.words").as("words"),
        col("b.stop_words").as("stop_words"))
      .withColumn("link_density",
        round(col("link_chars").cast("double") / greatest(col("chars"), lit(1)), 6))
      .withColumn("stop_density",
        round(col("stop_words").cast("double") / greatest(col("words"), lit(1)), 6))
      .withColumn("cls",
        when(col("link_density") > BoilerMaxLinkDensity, lit("bad"))
          .when(col("chars") >= BoilerMinChars && col("stop_density") >= BoilerMinStopDensity,
            lit("good"))
          .otherwise(lit("short")))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("block_idx"))
    val prevCls = last(when(col("cls") =!= "short", col("cls")), ignoreNulls = true)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val nextCls = first(when(col("cls") =!= "short", col("cls")), ignoreNulls = true)
      .over(byDoc.rowsBetween(1, Window.unboundedFollowing))
    blocks
      .withColumn("keep",
        when(col("cls") === "good", lit(true))
          .when(col("cls") === "bad", lit(false))
          .otherwise(coalesce(prevCls === "good", lit(false)) &&
            coalesce(nextCls === "good", lit(false))))
  }

  /** Per-doc main content: kept blocks reassembled in order, one paragraph
    * per block. Docs whose every block is chrome yield an empty string
    * (they stay in the output — dropping is the caller's filter).
    */
  def mainContent(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    boilerBlocks(df, idCol, htmlCol)
      .groupBy(col(idCol))
      .agg(concat_ws("\n",
        sort_array(collect_list(when(col("keep"),
          struct(col("block_idx"), col("__text"))))).getField("__text")).as("content"))
}
