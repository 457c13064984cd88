package graft.operators

import graft.SparkSpec

/** Label contract of the hard-negative selection kernel
  * (`Similarity.knnTopKDiffLabel`): the gate certifies it against the
  * window-rank oracle on the parquet corpus, but that table has no NULL
  * labels — the ternary-logic edge (SQL `lb.label != la.label`) is pinned
  * here: a NULL-label query emits nothing, a NULL-label corpus vector is
  * never a candidate, and same-label / self matches are excluded.
  */
class KnnLabelSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Seq[Double], Option[Int])]) = {
    import spark.implicits._
    rows.map { case (id, e, l) =>
      (id, e, math.sqrt(e.map(x => x * x).sum), l)
    }.toDF("vec_id", "e", "nrm", "label")
  }

  test("diff-label top-k: null query drops, null corpus never candidates") {
    import spark.implicits._
    val queries = df(Seq(
      (1L, Seq(1.0, 0.0), Some(1)),
      (2L, Seq(0.0, 1.0), None))) // NULL label: NULL != x is never true
    val corpus = df(Seq(
      (10L, Seq(1.0, 0.0), Some(1)),  // same label as q1 -> excluded
      (11L, Seq(0.9, 0.1), Some(2)),  // diff label -> best match
      (12L, Seq(0.0, 1.0), None),     // NULL label -> never a candidate
      (13L, Seq(-1.0, 0.0), Some(2)))) // diff label -> worst match
    val got = Similarity.knnTopKDiffLabel(spark, queries, corpus, 2)
      .select("q", "q_label", "rank", "b", "b_label")
      .as[(Long, Int, Int, Long, Int)].collect().toSet
    assert(got == Set((1L, 1, 1, 11L, 2), (1L, 1, 2, 13L, 2)), got.toString)
  }

  test("self-match excluded even across the label filter") {
    import spark.implicits._
    // id 1 appears in BOTH relations with label 1; corpus also holds a
    // diff-label copy of the same vector under another id
    val q = df(Seq((1L, Seq(1.0, 0.0), Some(1))))
    val corpus = df(Seq(
      (1L, Seq(1.0, 0.0), Some(2)),  // same id as the query -> excluded
      (5L, Seq(1.0, 0.0), Some(2))))
    val got = Similarity.knnTopKDiffLabel(spark, q, corpus, 3)
      .select("q", "rank", "b").as[(Long, Int, Long)].collect().toSeq
    assert(got == Seq((1L, 1, 5L)), got.toString)
  }
}
