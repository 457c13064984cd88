package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE merge semantics (operators/Bpe.scala): greedy non-overlapping
  * merges, frequency-weighted pair counts, deterministic tie-breaks.
  */
class BpeSpec extends SparkSpec {

  private def docs(texts: String*) = {
    spark.createDataFrame(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")
  }

  test("merge is greedy left-to-right: aaa + (a,a) -> [aa, a]") {
    val d = docs("aaa aaa")
    val (merges, dict) = Bpe.train(d)
    val first = merges.filter(col("merge_round") === 1).head()
    assert(first.getString(1) == "a" && first.getString(2) == "a")
    val seg = dict.filter(col("word") === "aaa").head().getString(1)
    // after (a,a) merges chain: ' a a a ' -> ' aa a ' -> round 2 merges
    // (aa, a) -> ' aaa '; the greedy FIRST round must give [aa, a]
    assert(seg.trim.split(" ").head.startsWith("aa"),
      s"greedy merge broken: $seg")
  }

  test("pair counts are word-frequency weighted and tie-break lexicographically") {
    // "zx" appears 3 times, "ab" twice -> (z,x) wins round 1 despite z > a
    val d = docs("zx zx zx ab ab")
    val m1 = Bpe.train(d)._1.filter(col("merge_round") === 1).head()
    assert(m1.getString(1) == "z" && m1.getString(2) == "x")
    // equal counts -> lexicographically smallest pair wins
    val d2 = docs("zx ab")
    val t1 = Bpe.train(d2)._1.filter(col("merge_round") === 1).head()
    assert(t1.getString(1) == "a" && t1.getString(2) == "b")
  }

  test("chained occurrences all merge: banana + (a,n) -> [b, an, an, a]") {
    import spark.implicits._
    // the single-pass replace consumed the space shared by back-to-back
    // occurrences, leaving 'banana' as [b, an, a, n, a] — the second pass
    // fixes exactly the skipped occurrence (real BPE greedy)
    val dict = Seq(("banana", " b a n a n a ", 1L)).toDF("word", "s", "cnt")
    val best = Seq(("a", "n")).toDF("l", "r")
    val seg = Bpe.applyMerge(dict, best).head().getString(1)
    assert(seg == " b an an a ", s"chain under-merged: '$seg'")
    // l != r chains: every adjacent (l, r) pair merges
    val dict2 = Seq(("lrlr", " l r l r ", 1L)).toDF("word", "s", "cnt")
    val seg2 = Bpe.applyMerge(dict2, Seq(("l", "r")).toDF("l", "r")).head().getString(1)
    assert(seg2 == " lr lr ", s"chain under-merged: '$seg2'")
    // l == r runs: pair count matches greedy (odd runs ≥ 5 place the
    // unpaired symbol mid-run — documented deviation)
    val dict3 = Seq(("aaaaa", " a a a a a ", 1L)).toDF("word", "s", "cnt")
    val seg3 = Bpe.applyMerge(dict3, Seq(("a", "a")).toDF("l", "r")).head().getString(1)
    assert(seg3.trim.split(" ").count(_ == "aa") == 2, s"run pair count: '$seg3'")
  }

  test("later rounds can merge onto learned symbols (chaining)") {
    val d = docs(Seq.fill(10)("abc").mkString(" "))
    val (merges, dict) = Bpe.train(d)
    val rows = merges.orderBy("merge_round").collect()
    assert(rows(0).getString(3) == "ab")
    assert(rows(1).getString(1) == "ab" && rows(1).getString(2) == "c",
      "round 2 must merge the learned 'ab' with 'c'")
    assert(dict.filter(col("word") === "abc").head().getString(1).trim == "abc")
  }
}
