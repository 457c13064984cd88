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

  // ---- round-14: the sign-flip second factor that takes the isometry
  // family past k = Dim = 64 (verdict #5 — without it the flagship 100x
  // claim could never be tested on materialized files) ----

  private val Dim = graft.operators.Similarity.Dim

  private def isometry(e: Array[Double], i: Int): Array[Double] = {
    val shifted = rotate(e, i % Dim)
    if (i < Dim) shifted
    else shifted.zipWithIndex.map { case (x, j) =>
      if (MakeTier.flipBit(i, j)) -x else x
    }
  }

  test("sign flip preserves intra-replica dot products bit-for-bit") {
    val rnd = new scala.util.Random(23)
    val a = Array.fill(Dim)(rnd.nextGaussian())
    val b = Array.fill(Dim)(rnd.nextGaussian())
    val base = dot(a, b)
    for (i <- Seq(64, 77, 99, 100)) {
      // flips apply the SAME sign to both operands of each product:
      // (-x)(-y) == xy exactly in IEEE, and the shift only permutes the
      // pairing — so the product multiset is identical, and here even the
      // summation order matches (zip preserves position)
      val pi = isometry(a, i).zip(isometry(b, i)).map { case (x, y) => x * y }
      val p0 = a.zip(b).map { case (x, y) => x * y }
      assert(pi.sorted.toSeq == p0.sorted.toSeq, s"replica $i")
      assert(math.abs(pi.sum - base) < 1e-12)
    }
  }

  test("flip masks are identity below Dim and near-balanced above") {
    for (j <- 0 until Dim; i <- Seq(0, 1, 63))
      assert(isometry(Array.tabulate(Dim)(_.toDouble), i)(j) >= 0.0,
        s"replica $i must not flip (pre-flip tiers must reproduce byte-identically)")
    for (i <- 64 to 163) {
      val flips = (0 until Dim).count(j => MakeTier.flipBit(i, j))
      // a useful mask flips roughly half the positions; 16..48 of 64 is
      // >= 6 sigma around the binomial mean for an md5-derived bit
      assert(flips >= 16 && flips <= 48, s"replica $i: $flips flips of $Dim")
    }
  }

  test("composed isometry decorrelates same-shift replica pairs at k=100") {
    // replicas i and i-64 share the circular shift — the case the shift
    // alone could never decorrelate (it aliased, which is why the old
    // require capped k at Dim). The mask must now carry the whole load.
    val rnd = new scala.util.Random(31)
    val a = Array.fill(Dim)(rnd.nextGaussian())
    val na = dot(a, a)
    for (i <- 64 until 100) {
      val cos = dot(isometry(a, i), isometry(a, i - Dim)) / na
      assert(math.abs(cos) < 0.5, s"replicas $i vs ${i - Dim}: cosine $cos")
    }
  }
}
