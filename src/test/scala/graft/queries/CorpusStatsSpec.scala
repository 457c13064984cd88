package graft.queries

import graft.SparkSpec

/** Fixture-level contracts for the round-14 corpus-statistics queries
  * (q_zipf_curve, q_vocab_coverage, q_pmi_collocations,
  * q_dedup_token_savings) beyond the oracle rows: exact rank/tie
  * arithmetic, the ppm floor-division grid, the PMI formula against a
  * JVM-computed expectation, and the keeper-rule accounting.
  */
class CorpusStatsSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  // word counts: a=10, b=7, c=6, d=1; tie order exercised by (c, d)
  // against the higher-count b
  private val zipfFixture = docs(Seq(
    (0L, "a a a a a b b b c c", "s0"),
    (1L, "a a a a a b b b c c", "s0"),
    (2L, "c c b d", "s1")))

  test("zipfCurve: rank by (cnt desc, w asc), zipf_c = rnk*cnt") {
    val rows = TextAnalytics.zipfCurve(zipfFixture)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.sortBy(_._1).toSeq == Seq(
      (1L, "a", 10L, 10L), (2L, "b", 7L, 14L), (3L, "c", 6L, 18L), (4L, "d", 1L, 4L)))
  }

  test("vocabCoverage: ppm floor grid over the ranked conditional sums") {
    val rows = TextAnalytics.vocabCoverage(zipfFixture)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    // total = 24 tokens, vocab = 4; k=5 saturates at full coverage
    assert(rows == Seq(
      (5L, 4L, 24L, 1000000L), (10L, 4L, 24L, 1000000L),
      (25L, 4L, 24L, 1000000L), (50L, 4L, 24L, 1000000L)))
  }

  test("vocabCoverage: partial-k ppm is the exact floor division") {
    // 7 words, counts a=10 b=5 c=4 d=3 e=2 f=1 g=1 (total 26): k=5
    // covers only {a,b,c,d,e} = 24 tokens, so the ppm is a genuine
    // remainder-bearing floor: 24*1000000 // 26 = 923076 (not ...77)
    val seven = docs(Seq(
      (0L, "a a a a a a a a a a b b b b b c c c c d d d e e f g", "s0")))
    val rows = TextAnalytics.vocabCoverage(seven)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(rows == Seq(
      (5L, 7L, 24L, 923076L), (10L, 7L, 26L, 1000000L),
      (25L, 7L, 26L, 1000000L), (50L, 7L, 26L, 1000000L)))
  }

  test("pmiCollocations: perfect collocation ranks first, value matches JVM") {
    // 6 docs "x y <noise_i>": (x,y) occurs 6 times, every (y,noise_i)
    // once (below PmiMinCount=5). Add a diluted pair (p,q) where p also
    // appears alone so pmi(p,q) < pmi(x,y).
    val d = docs((0 until 6).map(i => (i.toLong, s"x y n$i", "s0")) ++
      (6 until 12).map(i => (i.toLong, "p q p", "s0")))
    val rows = TextAnalytics.pmiCollocations(d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    // (q,p) also recurs 6 times ("q p" across doc-internal repeats) and
    // ties (p,q) exactly; the tie breaks on w1 asc
    assert(rows.map(t => (t._2, t._3)).toSeq == Seq(("x", "y"), ("p", "q"), ("q", "p")),
      s"expected (x,y), (p,q), (q,p): ${rows.mkString(", ")}")
    // bigrams: 6 docs of 3 words -> 12 + 12 = 24; N2 = 24. tokens N1 = 36.
    // c2(x,y)=6, c1(x)=6, c1(y)=6: pmi = ln((6/24)/((6/36)*(6/36)))
    val expected = BigDecimal(
      math.log((6.0 / 24.0) / ((6.0 / 36.0) * (6.0 / 36.0))) + graft.operators.Num.Eps)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(rows.head._5 - expected) < 1e-9,
      s"pmi(x,y) ${rows.head._5} != expected $expected")
    // (p,q): c2=6 (one per doc), c1(p)=12, c1(q)=6
    assert(rows(1)._4 == 6L)
  }

  test("boilerplateNgrams: mines exactly the planted snippets, junction grams filtered") {
    // ids 3/12/21 carry the footer snippet (9 words -> 2 shared 8-grams),
    // ids 5/14 the rights snippet (10 words -> 3 shared 8-grams); junction
    // grams straddle doc-specific prefixes so n_docs = 1 -> filtered
    val d = docs(Seq(
      (0L, "plain zero doc", "s0"),
      (3L, "alpha beta", "s0"), (12L, "gamma delta", "s0"), (21L, "x", "s0"),
      (5L, "p q", "s1"), (14L, "r s t", "s1")))
    val rows = TextAnalytics.boilerplateNgrams(d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(rows == Seq(
      (1L, "subscribe to our newsletter for weekly updates and", 3L, 3L),
      (2L, "to our newsletter for weekly updates and offers", 3L, 3L),
      (3L, "all rights reserved unauthorized reproduction of this material", 2L, 2L),
      (4L, "reserved unauthorized reproduction of this material is prohibited", 2L, 2L),
      (5L, "rights reserved unauthorized reproduction of this material is", 2L, 2L)))
  }

  test("dedupTokenSavings: keeper accounting per source on the %10 copies") {
    // ids 0..3 over two sources; ids 0 gains a copy (id+100000, same
    // source). Copy of id 0 (3 words) is removed; nothing else collides.
    val d = docs(Seq(
      (0L, "w1 w2 w3", "s0"), (1L, "w4 w5", "s0"),
      (2L, "w6", "s1"), (3L, "w7 w8 w9", "s1")))
    val rows = DedupQueries.dedupTokenSavings(d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    assert(rows == Seq(
      // s0: 3 docs (2 + copy of id 0), copy removed: 3 of 8 tokens
      ("s0", 3L, 1L, 8L, 3L, 375000L),
      ("s1", 2L, 0L, 4L, 0L, 0L)))
  }
}
