package graft.ops

import graft.SparkSpec

/** Gopher repetition signals (Rae et al. 2021 table A1, repetition half):
  * duplicate line/paragraph fractions, top n-gram char fraction, duplicated
  * n-gram positional coverage. Expected values below are hand-computed on
  * tiny documents so the semantics are pinned independently of the DuckDB
  * oracle entries (td_rep_lines / td_rep_ngrams).
  */
class RepetitionSpec extends SparkSpec {

  import spark.implicits._

  private val eps = 1e-9

  test("lineRepetition: duplicate line and paragraph fractions, hand-computed") {
    val df = Seq(
      (1L, "a b a b c\na b a b c\nx y"),
      (2L, "para one here\n\npara one here\n\nother"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextOps.lineRepetition(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap

    val r1 = out(1L)
    assert(r1.getLong(1) == 3L) // n_lines
    assert(math.abs(r1.getDouble(2) - 1.0 / 3) < 1e-6, "dup_line_fraction")
    assert(math.abs(r1.getDouble(3) - 9.0 / 21) < 1e-6, "dup_line_char_fraction")
    assert(r1.getLong(4) == 1L, "single paragraph") // n_paras
    assert(math.abs(r1.getDouble(5)) < eps && math.abs(r1.getDouble(6)) < eps)

    val r2 = out(2L)
    // lines and paragraphs coincide here: [para one here, para one here, other]
    assert(r2.getLong(1) == 3L && r2.getLong(4) == 3L)
    assert(math.abs(r2.getDouble(5) - 1.0 / 3) < 1e-6, "dup_para_fraction")
    assert(math.abs(r2.getDouble(6) - 13.0 / 31) < 1e-6, "dup_para_char_fraction")

    val r3 = out(3L)
    assert(r3.getLong(1) == 0L && r3.getLong(4) == 0L)
    assert(math.abs(r3.getDouble(2)) < eps && math.abs(r3.getDouble(6)) < eps)
  }

  test("ngramRepetition: top-gram char fraction and duplicated-gram coverage, hand-computed") {
    val df = Seq(
      // words: a b a b c a b a b c x y (12 words, 12 chars)
      (1L, "a b a b c\na b a b c\nx y"),
      // 11 distinct 1-char words
      (2L, "p q r s t u v w x y z"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextOps.ngramRepetition(df, "doc_id", "text", Seq(2), Seq(5)).collect()
      .map(r => r.getLong(0) -> r).toMap

    val r1 = out(1L)
    // top 2-gram "a b" occurs 4x, charlen 2 -> 8/12
    assert(math.abs(r1.getDouble(1) - 8.0 / 12) < 1e-6, s"top2: ${r1.getDouble(1)}")
    // "a b a b c" occurs at pos 0 and 5 -> covers word positions 0..9 -> 10/12
    assert(math.abs(r1.getDouble(2) - 10.0 / 12) < 1e-6, s"dup5: ${r1.getDouble(2)}")

    val r2 = out(2L)
    // every 2-gram unique: top gram count 1, charlen 2 -> 2/11
    assert(math.abs(r2.getDouble(1) - 2.0 / 11) < 1e-6)
    assert(math.abs(r2.getDouble(2)) < eps)

    val r3 = out(3L)
    assert(math.abs(r3.getDouble(1)) < eps && math.abs(r3.getDouble(2)) < eps)
  }

  test("decontaminate: train docs containing test n-grams get marked spans, others zeros") {
    val train = Seq(
      // words 3..8 are a verbatim 6-word test span
      (1L, "intro words here the secret eval answer is forty two and trailing text"),
      (2L, "totally clean training document with no overlap at all whatsoever today")
    ).toDF("doc_id", "text")
    val test = Seq("the secret eval answer is forty two").toDF("t")
    val out = TextOps.decontaminate(train, "doc_id", "text", test, "t", 6)
      .collect().map(r => r.getLong(0) -> r).toMap
    val cols = TextOps.decontaminate(train, "doc_id", "text", test, "t", 6).columns
    val r1 = out(1L)
    // test text "the secret eval answer is forty two" has two 6-grams, both
    // present in doc 1 at consecutive positions -> one merged span of 7 words
    assert(r1.getLong(cols.indexOf("n_contaminated")) == 2L, r1.mkString(","))
    assert(r1.getLong(cols.indexOf("n_spans")) == 1L)
    assert(r1.getLong(cols.indexOf("max_span_words")) == 7L)
    val r2 = out(2L)
    assert(r2.getLong(cols.indexOf("n_contaminated")) == 0L)
    assert(r2.getLong(cols.indexOf("n_spans")) == 0L)
  }

  test("decontaminateClean: covered words are cut, survivors reassemble in order") {
    val train = Seq(
      (1L, "intro words here the secret eval answer is forty two and trailing text"),
      (2L, "totally clean training document with no overlap at all whatsoever today")
    ).toDF("doc_id", "text")
    val test = Seq("the secret eval answer is forty two").toDF("t")
    val out = TextOps.decontaminateClean(train, "doc_id", "text", test, "t", 6)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: positions 3..9 covered (two overlapping 6-grams) -> 7 words removed
    assert(out(1L).getString(1) == "intro words here and trailing text", out(1L).mkString(","))
    assert(out(1L).getLong(2) == 13L && out(1L).getLong(3) == 7L)
    assert(out(2L).getString(1) == "totally clean training document with no overlap at all whatsoever today")
    assert(out(2L).getLong(3) == 0L)
  }

  test("normalizeText: NFC composition, zero-width strip, CRLF, space collapse") {
    val df = Seq(
      (1L, "plain text stays"),
      (2L, "cafe\u0301 and more"),   // decomposed e+combining-acute
      (3L, "a\u200Bb c\uFEFFd"),     // zero-widths vanish
      (4L, "line one\r\nline two\rline three"),
      (5L, "  too   many\t\tspaces  ")
    ).toDF("doc_id", "text")
    val out = TextOps.normalizeText(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "plain text stays" && !out(1L).getBoolean(2))
    assert(out(2L).getString(1) == "caf\u00e9 and more" && out(2L).getBoolean(2))
    assert(out(3L).getString(1) == "ab cd")
    assert(out(4L).getString(1) == "line one\nline two\nline three")
    assert(out(5L).getString(1) == "too many spaces")
  }

  test("paragraphDedup: global first occurrence survives, docs reassemble in order") {
    val df = Seq(
      (1L, "unique one\n\nshared footer\n\nunique two"),
      (2L, "shared footer\n\nonly here"),   // footer first occurred in doc 1
      (3L, "shared footer")                  // loses its only paragraph
    ).toDF("doc_id", "text")
    val out = TextOps.paragraphDedup(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "unique one\n\nshared footer\n\nunique two")
    assert(out(1L).getLong(2) == 3L && out(1L).getLong(3) == 0L)
    assert(out(2L).getString(1) == "only here", out(2L).mkString(","))
    assert(out(2L).getLong(2) == 2L && out(2L).getLong(3) == 1L)
    assert(out(3L).getString(1) == "" && out(3L).getLong(3) == 1L)
  }

  test("repetitionFilter: Gopher thresholds produce per-rule booleans and the conjunction keep") {
    val clean = (1 to 80).map(i => s"w${i}alpha w${i}beta w${i}gamma.").mkString("\n")
    val df = Seq(
      (1L, "a b a b c\na b a b c\nx y"), // dup_line_fraction 0.33 > 0.30
      (2L, clean)
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionFilter(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    val cols = TextOps.repetitionFilter(df, "doc_id", "text").columns
    val keepIdx = cols.indexOf("keep")
    val okLinesIdx = cols.indexOf("ok_dup_lines")
    assert(!out(1L).getBoolean(okLinesIdx))
    assert(!out(1L).getBoolean(keepIdx))
    assert(out(2L).getBoolean(keepIdx), s"clean doc must keep: ${out(2L).mkString(",")}")
  }
}
