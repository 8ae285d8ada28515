package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII redaction + C4/Gopher quality filtering — the per-row map-only
  * training-data cleaning operators. Rules mirror the published filter
  * sets (C4: Raffel et al. 2020 §2.2; Gopher: Rae et al. 2021 table A1),
  * simplified to RE2-safe patterns so the DuckDB oracle entries
  * (td_pii_redact / td_quality_filter) can replay them bit-for-bit.
  */
class TextFilterSpec extends SparkSpec {

  import spark.implicits._

  test("piiRedact replaces each class with its placeholder and counts on sequential-consumption semantics") {
    val df = Seq(
      (1L, "mail a@b.co and c.d+x@e.org, ip 10.0.0.1 phone 555-123-4567 card 4111111111111111 plain 12345"),
      (2L, "no pii here at all"),
      (3L, "edge: server at 192.168.1.254 twice 192.168.1.254")
    ).toDF("doc_id", "text")
    val out = TextOps.piiRedact(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap

    val r1 = out(1L)
    val red1 = r1.getString(1)
    assert(red1.contains("<EMAIL>") && red1.contains("<IP>") &&
      red1.contains("<PHONE>") && red1.contains("<CARD>"))
    assert(red1.contains("plain 12345"), "short digit runs must survive")
    assert(!red1.contains("a@b.co") && !red1.contains("4111111111111111"))
    assert(r1.getInt(2) == 2 && r1.getInt(3) == 1 && r1.getInt(4) == 1 && r1.getInt(5) == 1,
      s"counts: ${r1.mkString(",")}")

    val r2 = out(2L)
    assert(r2.getString(1) == "no pii here at all")
    assert(r2.getInt(2) == 0 && r2.getInt(3) == 0 && r2.getInt(4) == 0 && r2.getInt(5) == 0)

    assert(out(3L).getInt(3) == 2, "both IP occurrences counted")
    assert(out(3L).getString(1) == "edge: server at <IP> twice <IP>")
  }

  test("c4LineClean keeps punctuated >=3-word lines, drops boilerplate markers, nulls lorem/brace docs") {
    val good = "This is a good sentence.\nshort.\nno terminal punct\n" +
      "Enable javascript to view this page.\nRead our cookie policy now.\n" +
      "Another fine sentence here!"
    val df = Seq(
      (1L, good),
      (2L, "Fine text but lorem ipsum appears."),
      (3L, "Fine text but a { brace } appears.")
    ).toDF("doc_id", "text")
    val out = TextOps.c4LineClean(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getString(1) == "This is a good sentence.\nAnother fine sentence here!")
    assert(out(1L).getInt(2) == 6 && out(1L).getInt(3) == 2)
    assert(out(2L).isNullAt(1) && out(2L).getInt(3) == 0, "lorem ipsum drops the whole doc")
    assert(out(3L).isNullAt(1), "curly brace drops the whole doc")
  }

  test("qualityFilter fires each Gopher rule independently and keeps clean prose") {
    val clean = ("the quick brown fox jumps over a lazy dog near the quiet river " * 5).trim // 65 words
    val df = Seq(
      (0L, clean),
      (1L, "too short"),
      (2L, clean + " " + ("# " * 30).trim),
      (3L, ("pneumonoultramicroscopicsilicovolcanoconiosis " * 60).trim),
      (4L, clean + " " + ("12345 " * 300).trim),
      (5L, clean + ("\n- bullet item" * 8)),
      (6L, clean + ("\nand then more..." * 9)),
      (7L, clean + " lorem ipsum dolor"),
      (8L, clean + " { config }")
    ).toDF("doc_id", "text")
    val rows = TextOps.qualityFilter(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    def flag(id: Long, name: String): Boolean =
      rows(id).getBoolean(rows(id).fieldIndex(name))

    assert(flag(0L, "keep"), "clean prose must pass every rule")
    assert(!flag(1L, "ok_words") && !flag(1L, "keep"))
    assert(!flag(2L, "ok_symbol_ratio") && !flag(2L, "keep"))
    assert(!flag(3L, "ok_mean_word_len") && !flag(3L, "keep"))
    assert(!flag(4L, "ok_alpha_ratio") && !flag(4L, "keep"))
    assert(!flag(5L, "ok_bullet_lines") && !flag(5L, "keep"))
    assert(!flag(6L, "ok_ellipsis_lines") && !flag(6L, "keep"))
    assert(!flag(7L, "ok_no_lorem") && !flag(7L, "keep"))
    assert(!flag(8L, "ok_no_brace") && !flag(8L, "keep"))
    // rules that should NOT have fired stay green on the degenerate docs
    assert(flag(2L, "ok_words") && flag(2L, "ok_no_lorem"))
    assert(flag(5L, "ok_symbol_ratio"))
  }

  test("crossDocSpans marks shared n-grams and merges contiguous positions into spans") {
    // docs 1 and 2 share a 6-word phrase; with n=3 that is 4 consecutive
    // marked positions in each -> ONE span of 6 words. doc 3 shares nothing.
    val phrase = "one two three four five six"
    val df = Seq(
      (1L, s"unique opener words here $phrase tail a b"),
      (2L, s"different prefix tokens $phrase other suffix content"),
      (3L, "entirely disjoint vocabulary with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val out = TextOps.crossDocSpans(df, "doc_id", "text", 3, minDocs = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 2L)) {
      val r = out(id)
      assert(r.getLong(r.fieldIndex("n_dup_shingles")) == 4, s"doc $id: ${r.mkString(",")}")
      assert(r.getLong(r.fieldIndex("n_spans")) == 1)
      assert(r.getLong(r.fieldIndex("max_span_words")) == 6)
    }
    val r3 = out(3L)
    assert(r3.getLong(r3.fieldIndex("n_dup_shingles")) == 0 &&
      r3.getLong(r3.fieldIndex("n_spans")) == 0 &&
      r3.getDouble(r3.fieldIndex("dup_fraction")) == 0.0)
    // two disjoint shared phrases in one doc -> two spans
    val df2 = Seq(
      (1L, "aa bb cc SEP1 SEP2 SEP3 SEP4 dd ee ff"),
      (2L, "aa bb cc X1 X2 X3 X4 dd ee ff")
    ).toDF("doc_id", "text")
    val out2 = TextOps.crossDocSpans(df2, "doc_id", "text", 3, minDocs = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out2(1L).getLong(out2(1L).fieldIndex("n_spans")) == 2)
    assert(out2(1L).getLong(out2(1L).fieldIndex("max_span_words")) == 3)
  }

  test("the filtering plan is map-only: no exchange, stays in whole-stage codegen") {
    val df = Seq((1L, "some text here.")).toDF("doc_id", "text")
    for (plan <- Seq(
        TextOps.piiRedact(df, "doc_id", "text"),
        TextOps.qualityFilter(df, "doc_id", "text"),
        TextOps.c4LineClean(df, "doc_id", "text"))) {
      val p = plan.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"quality/PII filtering must not shuffle:\n$p")
    }
  }
}
