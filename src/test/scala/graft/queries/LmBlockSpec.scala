package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Behavioral tests for the LM filters and block dedup beyond the DuckDB
  * oracle rows: a randomized differential check of the block rebuild
  * against an in-memory first-occurrence oracle (planted prefix copies and
  * verbatim whole-doc copies), and the bigram LM's edge paths (single-token
  * docs, OOV tokens, the backoff terminal) that the synthetic corpus only
  * exercises in aggregate.
  */
class LmBlockSpec extends SparkSpec {

  private val B = 16

  private def hash64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("block rebuild == in-memory first-occurrence oracle on 12 random corpora") {
    import spark.implicits._
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    for (seed <- 0 until 12) {
      val rnd = new Random(seed)
      val nDocs = 3 + rnd.nextInt(10)
      val raw = (0 until nDocs).map { i =>
        (i.toLong, Seq.fill(5 + rnd.nextInt(60))(vocab(rnd.nextInt(vocab.size))))
      }
      // plant: some docs copy an earlier doc's prefix (block-aligned dups),
      // some are verbatim whole-doc copies (rebuild to empty)
      val planted = raw.map { case (id, ws) =>
        if (id > 0 && rnd.nextInt(3) == 0) {
          val (_, src) = raw(rnd.nextInt(id.toInt))
          if (rnd.nextBoolean()) (id, src) // verbatim copy
          else (id, src.take(B * (1 + rnd.nextInt(2))) ++ ws.take(7)) // prefix copy
        } else (id, ws)
      }
      // oracle: global (id, blk) order, keep first occurrence of each block
      val seen = scala.collection.mutable.Set[String]()
      val want = planted.sortBy(_._1).map { case (id, ws) =>
        val kept = ws.grouped(B).map(_.mkString(" "))
          .filter(b => seen.add(b)).toSeq
        id -> ((kept.size.toLong,
          kept.map(_.split(" ").length.toLong).sum,
          hash64(kept.mkString(" "))))
      }.toMap
      val docs = planted.map { case (id, ws) => (id, ws.mkString(" ")) }
        .toDF("id", "text")
      val got = BlockDedupQueries.blockRebuild(docs).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(got == want, s"seed=$seed docs=$planted")
    }
  }

  test("bigram LM: single-token doc, OOV token, and backoff terminal") {
    import spark.implicits._
    // train slice = doc_id % 10 == 0 → only doc 0 trains.
    // doc 0:  "a b a b"      → c1: a=2 b=2, T=4; c2: (a,b)=2, (b,a)=1
    // doc 1:  "a b"          → both transitions seen (no backoff)
    // doc 2:  "b b"          → unseen bigram (b,b) → backoff to 0.4*pu(b)
    // doc 3:  "z"            → single token, OOV → add-one unigram floor
    val docs = Seq(
      (0L, "a b a b"), (1L, "a b"), (2L, "b b"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = LmQueries.bigramLogprob(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val V = 3 // corpus vocab {a, b, z}
    val T = 4
    def r4(x: Double) = BigDecimal(x + 0.00000025)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def pu(c: Long) = (c + 1.0) / (T + V)
    // doc 1: first 'a' → ln(pu(2)); bigram (a,b) → ln(2/2)=0
    assert(out(1L) == ((2L, r4((math.log(pu(2)) + 0.0) / 2))))
    // doc 2: first 'b' → ln(pu(2)); (b,b) unseen → ln(0.4 * pu(2))
    assert(out(2L) == ((2L, r4((math.log(pu(2)) + math.log(0.4 * pu(2))) / 2))))
    // doc 3: single OOV token → ln(pu(0)), no bigram rows
    assert(out(3L) == ((1L, r4(math.log(pu(0))))))
  }

  test("classifier filter: prediction flips with the evidence, prior applied") {
    import spark.implicits._
    // labeled slice = doc_id % 3 == 0 → docs 0,3,6,9 train (2 en / 2 fr);
    // en uses 'x', fr uses 'y'; held-out docs carry clear evidence
    val docs = Seq(
      (0L, "en", "x x x"), (3L, "en", "x x"), (6L, "fr", "y y y"),
      (9L, "fr", "y y"), (1L, "en", "x x x x"), (2L, "fr", "y y y y"),
      (4L, "fr", "x x x")) // mislabeled-looking doc: x-heavy but fr
      .toDF("doc_id", "lang", "text")
    val out = LmQueries.classifierFilter(docs).collect()
      .map(r => (r.getLong(0), (r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(out(1L) == ((true, true)))   // x-evidence → predicted target
    assert(out(2L) == ((false, false))) // y-evidence → predicted non-target
    assert(out(4L) == ((true, false)))  // follows tokens, not the label
  }
}
