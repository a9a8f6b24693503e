package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gopher LINE-rule semantics on constructed multi-line docs — each rule
  * isolated, hand-computed fractions, and the degenerate no-lines edge.
  * (The word-stream kernel is spec'd in TextFunctionsSpec; the named
  * query's reflow corpus is oracle-checked end to end.) */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def metrics(text: String) =
    TextAnalysis.withGopherLineMetrics(Seq((1L, text)).toDF("doc_id", "text"),
        $"text")
      .select("n_lines", "bullet_frac", "ellipsis_frac", "dup_line_frac",
        "dup_line_char_frac", "passes_lines")
      .as[(Long, Double, Double, Double, Double, Boolean)].head()

  test("line rules: each rule isolated with hand-computed fractions") {
    // clean: 4 distinct prose lines → everything 0, passes
    val clean = metrics("first line here\nsecond line there\nthird one\nfourth one")
    assert(clean === ((4L, 0.0, 0.0, 0.0, 0.0, true)))
    // bullets: 10 lines, all "- x" → bullet_frac 1.0 > 0.9 fails
    val bullets = (1 to 10).map(i => s"- item$i").mkString("\n")
    val b = metrics(bullets)
    assert(b._2 === 1.0 && !b._6)
    // ellipsis: 2 of 4 lines end "..." (one via the unicode form) → 0.5 > 0.3 fails
    val e = metrics("cut short...\nfull line stays\nalso trimmed…\nlast full line")
    assert(e._3 === 0.5 && !e._6)
    // duplicate lines: "same line" ×3 + 1 distinct → dup_line_frac =
    // (4−2)/4 = 0.5; dup chars = 3·9/(3·9+8) — both above threshold
    val d = metrics("same line\nsame line\nsame line\ndistinct")
    assert(d._4 === 0.5)
    assert(math.abs(d._5 - 27.0 / 35.0) < 1e-12)
    assert(!d._6)
    // boundary: exactly at every threshold still passes (<= rules)
    // 10 lines: 9 bullets (0.9), 3 ellipsis... build a 0.9/0.3 case
    val boundary = ((1 to 9).map(i => s"- item number$i") :+ "plain closing line")
      .zipWithIndex.map { case (l, i) => if (i < 3) l + "..." else l }
      .mkString("\n")
    val bd = metrics(boundary)
    assert(bd._2 === 0.9 && bd._3 === 0.3 && bd._6,
      s"at-threshold doc must pass: $bd")
  }

  test("line rules: blank lines are ignored; a no-lines doc passes with zero fractions") {
    // (trim strips SPACES only, same as the DuckDB oracle's trim — a
    // tab-only line counts as content in both spellings)
    val padded = metrics("   \nreal line\n\n \nother line\n  ")
    assert(padded._1 === 2L && padded._6)
    val empty = metrics("   \n \n")
    assert(empty === ((0L, 0.0, 0.0, 0.0, 0.0, true)))
  }

  test("dedupLinesAcross: corpus-frequent lines excise everywhere, rare lines keep positions, emptied docs survive") {
    val boiler = "accept cookies to continue"
    val docs = Seq(
      (1L, s"$boiler\nreal content one\nmore real text"),
      (2L, s"unique opening\n$boiler\nclosing words"),
      (3L, s"$boiler\n$boiler"), // all boilerplate → emptied, not dropped
      (4L, "entirely original document here"))
      .toDF("doc_id", "text")
    // maxOcc = 2: boiler occurs 4× corpus-wide → excised; everything
    // else occurs once → kept in original order
    val got = TextAnalysis.dedupLinesAcross(docs, $"doc_id", $"text", maxOcc = 2L)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "real content one\nmore real text", 3L, 1L),
      (2L, "unique opening\nclosing words", 3L, 1L),
      (3L, "", 2L, 2L),
      (4L, "entirely original document here", 1L, 0L)))
    // at maxOcc = 4 the boilerplate sits exactly at the cap → kept
    assert(TextAnalysis.dedupLinesAcross(docs, $"doc_id", $"text", maxOcc = 4L)
      .agg(sum("n_removed")).as[Long].head() === 0L)
  }

  test("line rules: row shape preserved and clobber guard fires") {
    val df = Seq((1L, "a line\nb line", "keep")).toDF("doc_id", "text", "extra")
    val out = TextAnalysis.withGopherLineMetrics(df, $"text")
    assert(out.columns.take(3).toSeq === Seq("doc_id", "text", "extra"))
    assert(out.count() === 1L)
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.withGopherLineMetrics(
        df.withColumn("n_lines", lit(1L)), $"text")
    }
    assert(e.getMessage.contains("clobber"))
  }
}
