package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The map-only repetition-stats expression must reproduce the old
  * posexplode + window + two-groupBy + join formulation exactly.
  */
class RepetitionStatsSpec extends SparkSpec {

  private def declarative(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val P = Dedup.P
    val B = Dedup.ShingleB
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val wh = df
      .select(col("doc_id"), posexplode(TextOps.words(col("text"))).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"), col("w"),
        (TextOps.hash64(col("w")) % P).as("whash"))
    val grams = wh
      .select(col("doc_id"),
        (((col("whash") * B + lead(col("whash"), 1).over(win)) % P * B
          + lead(col("whash"), 2).over(win)) % P).as("h"),
        lead(col("whash"), 2).over(win).as("guard"))
      .filter(col("guard").isNotNull)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), countDistinct(col("h")).as("n_unique"))
    val words = wh.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_words"), max(col("cnt")).as("top_word_n"))
    grams.join(words, "doc_id")
      .select(col("doc_id"), col("n_grams"), col("n_unique"),
        Num.r4(lit(1.0) - col("n_unique") * 1.0 / col("n_grams")).as("dup_ratio"),
        col("top_word_n"),
        Num.r4(col("top_word_n") * 1.0 / col("n_words")).as("top_word_frac"))
  }

  test("randomized parity with the window/groupBy formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vocab = Seq("spark", "scan", "agg", "row", "row", "row", "a") // skewed
    // non-space separators + whitespace-edged docs: must tokenize exactly
    // like SQL trim (spaces only) + split (edge empties kept)
    val seps = Seq(" ", "\t", "\n", " \t")
    val edges = Seq("", " ", "\n", "\t ")
    val docs = (0 until 50).map { i =>
      val len = rnd.nextInt(25) // includes 0..2 (fewer words than a 3-gram)
      val body = Seq.fill(len)(vocab(rnd.nextInt(vocab.length)))
        .mkString(seps(rnd.nextInt(seps.length)))
      (i.toLong,
        edges(rnd.nextInt(edges.length)) + body + edges(rnd.nextInt(edges.length)))
    }.toDF("doc_id", "text")
    val a = declarative(docs)
      .as[(Long, Long, Long, Double, Long, Double)].collect().toSet
    val b = graft.queries.TextAnalytics.repetitionFilter(docs)
      .as[(Long, Long, Long, Double, Long, Double)].collect().toSet
    assert(b == a, s"only-old=${a -- b}, only-new=${b -- a}")
  }

  test("repetition filter plan is map-only (no exchange)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d a b c")).toDF("doc_id", "text")
    val p = graft.queries.TextAnalytics.repetitionFilter(docs)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.toLowerCase.contains("window"), p)
  }
}
