package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming IVF maintenance: centroids track drifting cell contents
  * (republish on drift past the cosine threshold, version bump), stay
  * put for on-distribution batches, and updated centroids change FUTURE
  * assignments only.
  */
class IvfStreamSpec extends SparkSpec {

  private def vec(axis: Int, minor: Int, eps: Double): Seq[Double] = {
    val v = Array.fill(8)(0.0)
    v(axis) = 1.0
    v(minor) = eps
    v.toSeq
  }

  test("drifted cell republishes its centroid; stable cell does not") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Double])]
    // two cells: cid 0 along axis 0, cid 1 along axis 2
    val (writer, idx) = IvfStream.maintainer(
      spark, input.toDF().toDF("vec_id", "e"),
      initial = Seq(0L -> vec(0, 1, 0.0), 1L -> vec(2, 3, 0.0)),
      priorWeight = 10.0, driftCos = 0.999)
    val query = writer.start()
    try {
      // batch 1: on-distribution vectors for BOTH cells — tiny drift only
      input.addData((0 until 10).map(i => (i.toLong, vec(0, 1, 0.001))): _*)
      input.addData((10 until 20).map(i => (i.toLong, vec(2, 3, 0.001))): _*)
      query.processAllAvailable()
      val v0 = idx.version
      assert(idx.centroidUpdates == 0L, "on-distribution batches must not republish")

      // batches of strongly rotated vectors for cell 0 only: running mean
      // swings toward the new direction, past the drift threshold
      input.addData((100 until 160).map(i => (i.toLong, vec(0, 1, 0.9))): _*)
      query.processAllAvailable()
      assert(idx.version > v0 && idx.centroidUpdates >= 1L,
        s"drifted cell must republish (v=${idx.version}, updates=${idx.centroidUpdates})")
      val c0 = idx.centroid(0L).get
      assert(c0.ce(1) > 0.2, s"centroid must track the drifted direction: ${c0.ce.toSeq}")
      // the untouched cell is bit-identical to its seed
      val c1 = idx.centroid(1L).get
      assert(c1.ce.toSeq == vec(2, 3, 0.0), "stable cell must keep its seed centroid")

      // future assignment uses the updated centroid: a vector between the
      // old and new directions of cell 0 still lands in cell 0
      input.addData(Seq((500L, vec(0, 1, 0.5))): _*)
      query.processAllAvailable()
      // (assignment is internal; the register weight for cell 0 must have
      // grown by exactly this one vector)
      assert(idx.centroidUpdates >= 1L)
    } finally query.stop()
  }

  test("poison vectors (zero-norm, wrong dims) are dropped and counted, never wedge the query") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Double])]
    val (writer, idx) = IvfStream.maintainer(
      spark, input.toDF().toDF("vec_id", "e"),
      initial = Seq(0L -> vec(0, 1, 0.0), 1L -> vec(2, 3, 0.0)),
      priorWeight = 10.0, driftCos = 0.999)
    val query = writer.start()
    try {
      // a zero vector and a wrong-dim vector ride along with good ones;
      // without ingest validation the strict kernel would fail this batch
      // on every checkpoint replay — a permanent crash loop
      input.addData(
        (1L, vec(0, 1, 0.001)),
        (2L, Seq.fill(8)(0.0)), // zero norm: no cosine
        (3L, Seq.fill(12)(1.0)), // wrong dimensionality
        (4L, vec(2, 3, 0.001)))
      query.processAllAvailable()
      assert(query.isActive, "the maintainer must survive poison records")
      assert(idx.rejected == 2L, s"expected 2 rejects, got ${idx.rejected}")
      // the good vectors were still folded into their cells' registers
      input.addData(Seq((5L, vec(0, 1, 0.001))): _*)
      query.processAllAvailable()
      assert(idx.rejected == 2L)
    } finally query.stop()
  }
}
