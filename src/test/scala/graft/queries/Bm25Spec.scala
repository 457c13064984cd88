package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral tests for q_bm25_search beyond its DuckDB oracle row: the
  * three ranking properties the formula exists for — term-frequency
  * saturation, length normalization, and idf (rarer terms weigh more) —
  * plus the no-term zero case.
  */
class Bm25Spec extends SparkSpec {

  private def scores(docs: Seq[(Long, String)]): Map[Long, Double] = {
    import spark.implicits._
    TextAnalytics.bm25Search(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
  }

  test("higher tf at equal length ranks higher; no query term scores 0") {
    val pad = (1 to 20).map(i => s"x$i").mkString(" ")
    val s = scores(Seq(
      (1L, s"data data data $pad"),
      (2L, s"data x0a x0b $pad"),
      (3L, s"none of these words match $pad x21 x22 x23 x24 x25 x26 x27 x28 x29 x30 x31 x32 x33 x34")))
    assert(s(1L) > s(2L), s"tf must raise the score: $s")
    assert(s(2L) > 0.0)
    assert(s(3L) == 0.0, "a doc with no query term scores exactly 0")
  }

  test("length normalization: same tf, longer doc ranks lower") {
    val s = scores(Seq(
      (1L, "data " + (1 to 10).map(i => s"x$i").mkString(" ")),
      (2L, "data " + (1 to 80).map(i => s"x$i").mkString(" "))))
    assert(s(1L) > s(2L), s"length normalization must discount: $s")
  }

  test("idf: the rarer term outweighs the common one at equal tf and length") {
    // 'value' appears in every doc, 'system' only in doc 1 — doc 1's
    // extra term is rare, doc 2's extra term is the ubiquitous one
    val pad = (1 to 15).map(i => s"p$i").mkString(" ")
    val s = scores(Seq(
      (1L, s"system value $pad"),
      (2L, s"value value $pad"),
      (3L, s"value q1 $pad"),
      (4L, s"value q2 $pad")))
    assert(s(1L) > s(2L), s"rare-term idf must dominate: $s")
  }
}
