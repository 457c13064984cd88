package graft.queries

import graft.SparkSpec

/** q_sax_words properties beyond the oracle rows: the defining invariances
  * of the SAX sketch. The affine test scales by a POWER OF TWO so the
  * integer variance term scales by an exact binary shift and
  * sqrt(16x) = 4·sqrt(x) holds bit-for-bit — an arbitrary scale could
  * legally flip a last-ulp z-score across a breakpoint.
  */
class SaxSpec extends SparkSpec {

  private def saxOf(users: Seq[(Long, Seq[Double])]): Map[Long, (String, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sax_spec").toString
    users.flatMap { case (uid, vs) =>
      vs.zipWithIndex.map { case (v, i) =>
        (uid * 1000L + i, new java.sql.Timestamp(1700000000000L + i * 60000L),
          uid, "view", v, "")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    EventAnalytics.defs.find(_.name == "q_sax_words").get
      .query(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
  }

  test("z-normalization invariance, zero variance, motifs, monotone ordering") {
    val base = Seq(3.25, 1.5, 4.75, 2.0, 9.5, 0.25, 6.0, 7.75,
      5.5, 8.25, 1.0, 3.0, 9.0, 2.5, 4.0, 6.5)
    val words = saxOf(Seq(
      1L -> base,
      // positive affine transform: scale 4 (binary-exact), shift 7.25
      2L -> base.map(v => v * 4 + 7.25),
      3L -> base, // identical series -> motif with user 1
      4L -> Seq.fill(12)(5.0), // zero variance
      5L -> (1 to 24).map(_ * 2.5).toSeq)) // strictly increasing
    assert(words(2L)._1 == words(1L)._1,
      "SAX must be invariant under positive affine transforms")
    assert(words(3L)._1 == words(1L)._1 && words(1L)._2 >= 3,
      "identical series share a word and count as one motif (with user 2)")
    assert(words(4L)._1 == "cccccccc", "zero-variance series is all-middle")
    val mono = words(5L)._1
    assert(mono.sorted == mono && mono.head == 'a' && mono.last == 'd',
      s"monotone series must give non-decreasing symbols spanning a..d: $mono")
  }

  test("series past the int64-exact envelope fails loudly instead of wrapping") {
    // n=10, range 3e8 (values spanning 3,000,000.00): n²·m² = 9e18 ≥ the
    // guard — without it Spark would wrap s_tot² silently and emit a
    // wrong-but-plausible word while DuckDB errors
    val wide = (1 to 10).map(i => if (i % 2 == 0) 3000000.0 else 0.0)
    val e = intercept[Exception] { saxOf(Seq(9L -> wide)) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("integer-exact")),
      s"expected the refuse-to-guess error, got: ${msgs(e).mkString(" | ")}")
  }
}
