package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The single-pass shingle expression must reproduce the posexplode +
  * lead()-window + distinct formulation exactly — same word hashing, same
  * positional composition, same short-doc behavior.
  */
class ShingleHashArraySpec extends SparkSpec {

  private def declarative(df: org.apache.spark.sql.DataFrame, n: Int) = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy("id").orderBy("pos")
    val h = (0 until n).map(j => if (j == 0) col("wh") else lead("wh", j).over(win))
      .reduce((acc, whj) => (acc * Dedup.ShingleB + whj) % Dedup.P)
    df.select(col("id"), posexplode(TextOps.words(col("text"))).as(Seq("pos", "w")))
      .select(col("id"), col("pos"), (TextOps.hash64(col("w")) % Dedup.P).as("wh"))
      .select(col("id"), h.as("h"), lead("wh", n - 1).over(win).as("g"))
      .filter(col("g").isNotNull)
      .select(col("id"), col("h"))
      .distinct()
  }

  test("randomized parity with the window formulation, n = 3 and 5") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vocab = Seq("spark", "scan", "agg", "row", "fast", "a", "the")
    // separators beyond single spaces and whitespace-edged docs: SQL trim
    // strips only spaces, and split keeps edge empty tokens — the exact
    // divergence a Java String.trim tokenizer would introduce
    val seps = Seq(" ", "\t", "\n", "  ", " \n")
    val edges = Seq("", " ", "\t", "\n", "  \t ")
    val docs = (0 until 50).map { i =>
      val len = rnd.nextInt(30) // includes 0..4 (fewer words than a shingle)
      val body = Seq.fill(len)(vocab(rnd.nextInt(vocab.length)))
        .mkString(seps(rnd.nextInt(seps.length)))
      (i.toLong,
        edges(rnd.nextInt(edges.length)) + body + edges(rnd.nextInt(edges.length)))
    }.toDF("id", "text")
    Seq(3, 5).foreach { n =>
      val a = declarative(docs, n).as[(Long, Long)].collect().toSet
      val b = Dedup.shingleHashes(docs, col("id"), col("text"), n)
        .as[(Long, Long)].collect().toSet
      assert(b == a, s"n=$n deviates: only-old=${a -- b}, only-new=${b -- a}")
    }
  }

  test("ordered seq variant: parity with the positional window formulation") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(29)
    val vocab = Seq("spark", "scan", "agg", "row", "a")
    val docs = (0 until 40).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(25))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }.toDF("id", "text")
    Seq(3, 6).foreach { n =>
      val win = Window.partitionBy("id").orderBy("pos")
      val h = (0 until n).map(j => if (j == 0) col("wh") else lead("wh", j).over(win))
        .reduce((acc, whj) => (acc * Dedup.ShingleB + whj) % Dedup.P)
      val a = docs
        .select(col("id"), posexplode(TextOps.words(col("text"))).as(Seq("pos", "w")))
        .select(col("id"), col("pos"), (TextOps.hash64(col("w")) % Dedup.P).as("wh"))
        .select(col("id"), col("pos"), h.as("h"), lead("wh", n - 1).over(win).as("g"))
        .filter(col("g").isNotNull)
        .select(col("id"), col("pos"), col("h"))
        .as[(Long, Int, Long)].collect().toSet
      val b = docs
        .select(col("id"), posexplode(org.apache.spark.sql.graft.ArrayExpressions
          .shingleHashSeq(col("text"), n)).as(Seq("pos", "h")))
        .as[(Long, Int, Long)].collect().toSet
      assert(b == a, s"n=$n deviates: only-old=${a -- b}, only-new=${b -- a}")
      // distinct of the ordered seq == the set variant, doc by doc
      val c = docs
        .select(col("id"), explode(org.apache.spark.sql.graft.ArrayExpressions
          .shingleHashSeq(col("text"), n)).as("h")).distinct()
        .as[(Long, Long)].collect().toSet
      val d = Dedup.shingleHashes(docs, col("id"), col("text"), n)
        .as[(Long, Long)].collect().toSet
      assert(c == d)
    }
  }

  test("shingle build is shuffle-free (no exchange before consumers)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f")).toDF("id", "text")
    val p = Dedup.shingleHashes(docs, col("id"), col("text"), 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.toLowerCase.contains("window"),
      s"shingles must be a map-side expression:\n$p")
  }
}
