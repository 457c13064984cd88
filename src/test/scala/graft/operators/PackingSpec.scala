package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The two-pass distributed prefix sum (Packing.endOffsets) must equal the
  * window formulation on every input shape — including the shapes that
  * motivate it: one dominant source spanning many partitions, sources
  * split across partition boundaries, empty-ish sources.
  */
class PackingSpec extends SparkSpec {

  private def toks(rows: Seq[(Long, String, Long)]) = {
    spark.createDataFrame(rows).toDF("doc_id", "source", "n_tokens")
  }

  private def assertParity(rows: Seq[(Long, String, Long)], parts: Int): Unit = {
    val t = toks(rows)
    val got = Packing.endOffsets(t, parts)
      .orderBy("source", "doc_id").collect().toSeq
    val want = Packing.endOffsetsWindow(t)
      .orderBy("source", "doc_id").collect().toSeq
    assert(got == want, s"two-pass != window at parts=$parts")
  }

  test("parity with window formulation: skewed dominant source") {
    // one source holds 90% of rows — the straggler shape the two-pass
    // scan exists for; must split across all partitions and still agree
    val rows = (0L until 900L).map(i => (i, "big", i % 7 + 1)) ++
      (900L until 1000L).map(i => (i, s"s${i % 5}", i % 3 + 1))
    assertParity(rows, 8)
    assertParity(rows, 1)
    assertParity(rows, 31) // more partitions than rows-per-source in tail
  }

  test("parity: source boundaries inside partitions, interleaved ids") {
    val rows = (0L until 300L).map(i => (i, s"s${i / 30}", (i * 7) % 11 + 1))
    assertParity(rows, 4)
    assertParity(rows, 16)
  }

  test("manifest: offsets are contiguous per source and cuts are honest") {
    val rows = (0L until 200L).map(i => (i, s"s${i % 3}", (i * 13) % 600 + 1))
    val m = Packing.manifest(Packing.endOffsets(toks(rows), 6))
      .orderBy("source", "doc_id").collect()
    m.groupBy(_.getString(1)).foreach { case (_, docs) =>
      var expect = 0L
      docs.foreach { r =>
        val (n, start, sf, sl, ns) =
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
        assert(start == expect, "stream must be gapless")
        expect += n
        assert(sf == start / Packing.SeqLen)
        assert(sl == (start + n - 1) / Packing.SeqLen)
        assert(ns == sl - sf + 1)
      }
    }
  }
}
