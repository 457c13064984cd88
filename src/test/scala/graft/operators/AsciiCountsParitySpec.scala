package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ArrayExpressions

/** The native counters must equal `size(regexp_extract_all(...))` for
  * their fixed patterns on every input the corpus can contain: ASCII
  * letters/digits/punct, every \s class member, non-ASCII code points
  * (2-, 3- and 4-byte UTF-8, i.e. supplementary planes), empty strings,
  * and adjacent-run boundaries.
  */
class AsciiCountsParitySpec extends SparkSpec {

  private val fixtures = Seq(
    "", " ", "abc", "abc def", "a1b2", "123 456", "!!", "a,b.c;d",
    "tab\tnl\nvtff\ffcr\r end", "éü", "héllo wörld!",
    "日本語 text 123", "emoji 😀 mix", "a😀b",
    "--dash--", "x" * 500, "mixed: a1! b2? ĉ3…", " nbsp",
    "trailing space ", " leading", "under_score", "quote'apos\"dq")

  private def df = {
    val s = spark
    import s.implicits._
    (fixtures ++ (0 until 200).map { i =>
      val rnd = new scala.util.Random(i)
      (0 until rnd.nextInt(40)).map { _ =>
        rnd.nextInt(6) match {
          case 0 => ('a' + rnd.nextInt(26)).toChar.toString
          case 1 => ('0' + rnd.nextInt(10)).toChar.toString
          case 2 => Seq(" ", "\t", "\n", "\r", "\f", "")(rnd.nextInt(6))
          case 3 => Seq("!", ",", ".", "?", "_", "…", "é", "√")(rnd.nextInt(8))
          case 4 => "😀" // supplementary code point
          case _ => "word"
        }
      }.mkString
    }).zipWithIndex.map(_.swap).toDF("id", "text")
  }

  test("NonAlnumSpaceCount == size(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))") {
    val rows = df.select(col("id"),
        ArrayExpressions.nonAlnumSpaceCount(col("text")).as("fast"),
        size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0))).as("ref"),
        col("text"))
      .collect()
    for (r <- rows)
      assert(r.getInt(1) == r.getInt(2),
        s"mismatch on ${r.get(3)}: fast=${r.getInt(1)} ref=${r.getInt(2)}")
  }

  test("AsciiTokenCount == size(regexp_extract_all(text, TokenPattern))") {
    val rows = df.select(col("id"),
        ArrayExpressions.asciiTokenCount(col("text")).as("fast"),
        size(regexp_extract_all(col("text"), lit(TextOps.TokenPattern), lit(0))).as("ref"),
        col("text"))
      .collect()
    for (r <- rows)
      assert(r.getInt(1) == r.getInt(2),
        s"mismatch on ${r.get(3)}: fast=${r.getInt(1)} ref=${r.getInt(2)}")
  }
}
