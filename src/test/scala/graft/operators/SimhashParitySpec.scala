package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native map-side SimHash expression (`SimhashBits`) must equal the
  * r18 explode + 60-sum groupBy formulation bit-for-bit — the oracle SQL
  * still computes the groupBy form, so any divergence is a correctness
  * break, not a perf regression. Randomized corpora cover the traps: empty
  * text (tokenizes to [""] — both paths emit a row), repeated words
  * (multiset votes), whitespace-edged text (wordsJvm/words parity), and
  * exact vote ties (2 * ones == n -> bit clear).
  */
class SimhashParitySpec extends SparkSpec {

  private def corpus(seed: Long, n: Int) = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x1", "zz", "q")
    (0 until n).map { i =>
      val words = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      val text = rnd.nextInt(5) match {
        case 0 => ""                       // empty -> [""] token
        case 1 => " " + words.mkString(" ") // leading space (trim path)
        case 2 => words.mkString("  ")      // double spaces
        case 3 => words.mkString(" ") + "\n" // trailing newline kept token
        case _ => words.mkString(" ")
      }
      (i.toLong, text)
    }
  }

  test("SimhashBits equals the explode+groupBy formulation on randomized corpora") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(1L, 2L, 3L)) {
      val docs = corpus(seed, 120).toDF("id", "text")
      val fast = Dedup.simhash(docs, col("id"), col("text"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ref = Dedup.simhashViaGroupBy(docs, col("id"), col("text"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast.keySet == ref.keySet, s"seed $seed: id sets differ")
      for ((id, sig) <- ref)
        assert(fast(id) == sig, s"seed $seed: simhash differs for id $id")
    }
  }

  test("MinhashRegisters equals the per-register HOF arithmetic") {
    val s = spark
    import s.implicits._
    val docs = corpus(7L, 100).toDF("id", "text")
    val fast = Dedup.minhashSignaturesRowwise(docs, col("id"), col("text"), 3)
      .collect().map(r => r.getLong(0) -> (1 until r.length).map(r.getLong)).toMap
    // reference: the old 12 x array_min(transform(...)) HOF columns
    val regs = (0 until Dedup.NumHashes).map { i =>
      array_min(transform(col("hs"),
        h => (h * Dedup.hashA(i) + Dedup.hashB(i)) % Dedup.P)).as(s"m$i")
    }
    val ref = docs.select(col("id"),
        org.apache.spark.sql.graft.ArrayExpressions.shingleHashes(col("text"), 3).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("id") +: regs: _*)
      .collect().map(r => r.getLong(0) -> (1 until r.length).map(r.getLong)).toMap
    assert(fast.keySet == ref.keySet)
    for ((id, ms) <- ref) assert(fast(id) == ms, s"registers differ for id $id")
  }
}
