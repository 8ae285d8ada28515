package graft.text

import graft.SparkSpec

import org.apache.spark.sql.functions._

/** BPE tokenizer: encode semantics against hand-computed cases and the
  * fixture construction, and the incremental trainer against an
  * independent from-scratch naive recount.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  private def model(pairs: (String, String)*) = Bpe.Model(pairs.toIndexedSeq)

  test("encodeWord: greedy lowest-rank merging, all occurrences per step") {
    val m = model(("a", "b"), ("ab", "c"), ("d", "e"))
    assert(Bpe.encodeWord("abc", m.ranks).toSeq == Seq("abc"))
    assert(Bpe.encodeWord("ababc", m.ranks).toSeq == Seq("ab", "abc"))
    assert(Bpe.encodeWord("deabcde", m.ranks).toSeq == Seq("de", "abc", "de"))
    assert(Bpe.encodeWord("zzz", m.ranks).toSeq == Seq("z", "z", "z"))
    assert(Bpe.encodeWord("x", m.ranks).toSeq == Seq("x"))
    // rank order decides: (a,b) fires before (b,c) would be considered
    val m2 = model(("b", "c"), ("a", "b"))
    assert(Bpe.encodeWord("abc", m2.ranks).toSeq == Seq("a", "bc"))
  }

  test("encodeWord merges all non-overlapping occurrences left-to-right") {
    val m = model(("a", "a"))
    assert(Bpe.encodeWord("aaaa", m.ranks).toSeq == Seq("aa", "aa"))
    assert(Bpe.encodeWord("aaaaa", m.ranks).toSeq == Seq("aa", "aa", "a"))
    val m2 = model(("a", "a"), ("aa", "aa"))
    assert(Bpe.encodeWord("aaaa", m2.ranks).toSeq == Seq("aaaa"))
  }

  test("encodeText pre-tokenizes: words split, punctuation stands alone") {
    val m = model(("a", "b"))
    assert(Bpe.encodeText("ab ab, ab!", m).toSeq == Seq("ab", "ab", ",", "ab", "!"))
  }

  test("fixture corpus: encode recovers every planned token stream") {
    val m = Bpe.Model(graft.fixtures.BpeDocs.Merges)
    (0 until 200).foreach { i =>
      val (text, expected) = graft.fixtures.BpeDocs.docFor(i)
      val got = Bpe.encodeText(text, m).toSeq
      assert(got == expected, s"doc $i: $got vs $expected (text: $text)")
    }
  }

  /** From-scratch naive trainer: recount every pair over the whole table
    * each step — no incremental state, no word index. The independent
    * path for trainFromCounts.
    */
  private def naiveTrain(counts: Seq[(String, Long)], numMerges: Int, minFreq: Long)
      : Seq[(String, String)] = {
    var words = counts.map { case (w, c) => (w.toCharArray.map(_.toString).toSeq, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var go = true
    while (go && merges.size < numMerges) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (w, c) =>
        w.sliding(2).filter(_.size == 2).foreach(p => {
          val k = (p(0), p(1)); pc(k) = pc.getOrElse(k, 0L) + c
        })
      }
      if (pc.isEmpty) go = false
      else {
        val best = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        if (best._2 < minFreq) go = false
        else {
          val (l, r) = best._1
          merges += ((l, r))
          words = words.map { case (w, c) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < w.size) {
              if (i + 1 < w.size && w(i) == l && w(i + 1) == r) { out += l + r; i += 2 }
              else { out += w(i); i += 1 }
            }
            (out.toSeq, c)
          }
        }
      }
    }
    merges.toSeq
  }

  test("trainFromCounts matches a from-scratch naive recount on a mixed corpus") {
    val counts = Seq(
      "lower" -> 5L, "lowest" -> 2L, "newer" -> 6L, "wider" -> 3L,
      "low" -> 7L, "new" -> 4L, "widest" -> 1L, "a" -> 9L, "banana" -> 4L)
    val fast = Bpe.trainFromCounts(counts, numMerges = 12).merges
    val naive = naiveTrain(counts, numMerges = 12, minFreq = 2L)
    assert(fast == naive, s"\nfast : $fast\nnaive: $naive")
  }

  test("train on the documents corpus: merges shrink the token count and top words fuse") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val m0 = Bpe.Model(IndexedSeq.empty)
    // the tiny corpus exhausts (no pair reaches minFrequency) before 120
    val m = Bpe.train(docs, "text", numMerges = 120, maxWords = 4096)
    assert(m.merges.size > 50 && m.merges.size <= 120, m.merges.size.toString)
    assert(m.merges.distinct.size == m.merges.size, "no duplicate merges")
    val base = Bpe.encode(docs, "text", m0).agg(sum("n_tokens")).head.getLong(0)
    val merged = Bpe.encode(docs, "text", m).agg(sum("n_tokens")).head.getLong(0)
    assert(merged < base, s"$merged !< $base")
    // the most frequent word in the corpus encodes to a single symbol
    val topWord = Bpe.wordCounts(docs, "text", 1).head._1
    assert(Bpe.encodeWord(topWord, m.ranks).length == 1, topWord)
  }

  test("bpe_encode runs inside whole-stage codegen (no Scala UDF)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val m = model(("t", "h"), ("th", "e"))
    val out = Bpe.encode(docs, "text", m).select("doc_id", "n_tokens")
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), p)
    assert(p.contains("*("), p)
  }
}
