package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The single-pass winnowing expression must reproduce the declarative
  * explode + running-min-window + distinct formulation exactly — same
  * grams, same window, same truncation for short docs.
  */
class WinnowFingerprintsSpec extends SparkSpec {

  private def declarative(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    df.select(col("doc_id"), col("text"),
        explode(sequence(lit(1), greatest(length(col("text")) - 7, lit(1)))).as("pos"))
      .select(col("doc_id"), col("pos"),
        TextOps.hash64(col("text").substr(col("pos"), lit(8))).as("kh"))
      .select(col("doc_id"),
        min(col("kh")).over(
          Window.partitionBy(col("doc_id")).orderBy(col("pos"))
            .rowsBetween(-15, 0)).as("fp"))
      .distinct()
  }

  private def expression(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"),
      explode(org.apache.spark.sql.graft.ArrayExpressions
        .winnowFingerprints(col("text"))).as("fp"))

  test("randomized parity with the explode/window/distinct formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // small alphabet -> repeated grams -> dup minima; includes non-BMP code
    // points (surrogate pairs) — positions must count code points like
    // Spark length()/substr(), not UTF-16 units
    val alphabet = Seq("a", "b", "c", "d", "e", " ", "f", "g", "h",
      "🎵", "𝄞")
    val docs = (0 until 60).map { i =>
      val len = rnd.nextInt(120) // includes 0..7 (shorter than one gram)
      (i.toLong, Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString)
    }.toDF("doc_id", "text")
    val a = declarative(docs).as[(Long, Long)].collect().toSet
    val b = expression(docs).as[(Long, Long)].collect().toSet
    assert(b == a, s"expression deviates: only-old=${a -- b}, only-new=${b -- a}")
  }

  test("short and empty docs hash their whole (truncated) text once") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "abc"), (3L, "exactly8")).toDF("doc_id", "text")
    val got = expression(docs).as[(Long, Long)].collect().toSet
    val want = declarative(docs).as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(got.count(_._1 == 2L) == 1, "one fingerprint for a 3-char doc")
  }
}
