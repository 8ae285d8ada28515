package graft.fixtures

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Constructed corpus for the BPE-encode oracle (the HtmlToText pattern:
  * text is GENERATED from a token plan whose encoding is known by
  * construction, and the expected token stream is exported independently
  * of the engine's tokenizer).
  *
  * The merge table is closed under construction: tokens are built by the
  * listed merges and no merge rule can ever fire across a token boundary
  * (verified by enumerating suffix-intermediate × prefix-intermediate
  * symbol pairs of adjacent tokens — none appears in the table), so the
  * greedy lowest-rank encode of any concatenation provably recovers
  * exactly the planned token sequence regardless of merge interleaving.
  */
object BpeDocs {

  /** Rank-ordered merges: abc and def build in two steps, gh in one. */
  val Merges: IndexedSeq[(String, String)] =
    IndexedSeq(("a", "b"), ("ab", "c"), ("d", "e"), ("de", "f"), ("g", "h"))

  /** Atomic tokens under Merges (plus "," via the pre-tokenizer rule). */
  val Vocab: IndexedSeq[String] = IndexedSeq("abc", "def", "gh", "x", "y")

  /** Token plan for one doc: list of words, each a list of vocab tokens;
    * a "," pre-token follows every fourth word.
    */
  def planFor(i: Int): Seq[Seq[String]] = {
    val numWords = 3 + (i % 5)
    (0 until numWords).map { j =>
      val numToks = 1 + ((i * 7 + j) % 3)
      (0 until numToks).map(k => Vocab((i * 13 + j * 5 + k * 3) % Vocab.size))
    }
  }

  /** Render one doc and its expected token stream from the plan. */
  def docFor(i: Int): (String, Seq[String]) = {
    val words = planFor(i)
    val sb = new StringBuilder
    val expected = scala.collection.mutable.ArrayBuffer.empty[String]
    words.zipWithIndex.foreach { case (toks, j) =>
      if (j > 0) sb.append(' ')
      sb.append(toks.mkString)
      expected ++= toks
      if ((j + 1) % 4 == 0) { sb.append(','); expected += "," }
    }
    (sb.toString, expected.toSeq)
  }

  val ExportBase = "/tmp/graft_bpe"
  private val written = scala.collection.mutable.Set.empty[Int]

  /** Export (doc_id, text, expected '|'-joined, expected_n) for n docs. */
  def exportExpected(spark: SparkSession, n: Int): Unit = synchronized {
    if (written.contains(n)) return
    import spark.implicits._
    val dir = Paths.get(s"$ExportBase/docs_$n")
    deleteRecursively(dir)
    (0 until n).map { i =>
      val (text, exp) = docFor(i)
      (i.toLong, text, exp.mkString("|"), exp.size.toLong)
    }.toDF("doc_id", "text", "expected", "expected_n")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
    written += n
  }

  /** The corpus as a DataFrame (engine input side). */
  def table(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i => (i.toLong, docFor(i)._1) }.toDF("doc_id", "text")
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.delete(q))
    }
}
