package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Num

/** Streaming IVF index maintenance: continuous ingestion drifts cell
  * contents away from the centroids the index was built with, degrading
  * recall. This operator folds each micro-batch into per-cell running
  * (weight, sum-vector) registers and republishes a cell's centroid when
  * its direction has drifted past `driftCos` — so the quantizer tracks
  * the stream without ever re-clustering the corpus.
  *
  * Contract (mirrors the identity-mapping monotone trade): an updated
  * centroid applies to FUTURE assignments only; vectors already assigned
  * keep their cell until an offline rebuild (`Ivf.centroids`) — re-keying
  * history per batch would be an unbounded backfill at 100 TB.
  *
  * Scale shape: per batch, one partition-local assignment pass against
  * the broadcast centroids (the index is K rows by construction) and one
  * (cid, pos) grouped sum collected as K x Dim cells — bounded by the
  * index size, independent of corpus size.
  */
object IvfStream {

  final case class Centroid(cid: Long, ce: Array[Double], cn: Double)

  /** Live index handle: current centroids (cid-ascending), a version that
    * bumps once per batch that republished >= 1 centroid, and the count
    * of centroid updates so far.
    */
  final class IndexHandle private[IvfStream] (initial: Array[Centroid]) {
    private[IvfStream] val ref = new AtomicReference[Array[Centroid]](initial)
    private[IvfStream] val ver = new AtomicLong(0L)
    private[IvfStream] val updates = new AtomicLong(0L)
    private[IvfStream] val rejectedCount = new AtomicLong(0L)
    // running (weight, sum) register per cell, seeded so the initial
    // centroid participates with `priorWeight` pseudo-observations
    private[IvfStream] var weights: Map[Long, (Double, Array[Double])] = Map.empty

    def centroids: Array[Centroid] = ref.get
    def version: Long = ver.get
    def centroidUpdates: Long = updates.get
    def centroid(cid: Long): Option[Centroid] = ref.get.find(_.cid == cid)

    /** Vectors dropped by ingest validation (zero-norm / wrong dims). */
    def rejected: Long = rejectedCount.get
  }

  private def norm(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s / (norm(a) * norm(b))
  }

  /** Wire the maintainer onto a stream of (vec_id, e: array<double>)
    * vectors. `initial` seeds the quantizer (from `Ivf.centroids`);
    * `priorWeight` is how many pseudo-observations the seed is worth
    * (higher = slower tracking); a cell republishes when the cosine
    * between its current centroid and its running mean drops below
    * `driftCos`.
    */
  def maintainer(spark: SparkSession, vectors: DataFrame,
                 initial: Seq[(Long, Seq[Double])],
                 priorWeight: Double = 100.0,
                 driftCos: Double = 0.999)
  : (DataStreamWriter[org.apache.spark.sql.Row], IndexHandle) = {
    val cents0 = initial.sortBy(_._1)
      .map { case (cid, e) => Centroid(cid, e.toArray, norm(e.toArray)) }.toArray
    val handle = new IndexHandle(cents0)
    handle.weights = cents0
      .map(c => c.cid -> (priorWeight, c.ce.map(_ * priorWeight))).toMap

    val writer = vectors.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      import spark.implicits._
      val cs = handle.ref.get
      val bc = spark.sparkContext.broadcast(cs)
      // partition-local nearest-centroid assignment through the SHARED
      // kernel (graft.operators.Ivf.nearestCid — the rounded-cosine +
      // smallest-cid rule cannot drift from the batch). The kernel is
      // strict, so ingest VALIDATES first: a zero-norm or wrong-dim
      // vector is a poison record that would otherwise fail this batch on
      // every checkpoint replay and wedge the maintainer forever — it is
      // dropped and counted instead (handle.rejected), never guessed at.
      val dim = if (cs.nonEmpty) cs(0).ce.length else 0
      val rejectedAcc = spark.sparkContext.longAccumulator("ivf_ingest_rejected")
      val assigned = batch.select(col("vec_id"), col("e").cast("array<double>").as("e"))
        .as[(Long, Seq[Double])]
        .mapPartitions { it =>
          val cands = bc.value.map(c => (c.cid, c.ce, c.cn))
          it.flatMap { case (id, e0) =>
            val e = if (e0 == null) Array.empty[Double] else e0.toArray
            val en = norm(e)
            if (e.length != dim || en == 0.0) { rejectedAcc.add(1L); None }
            else Some((graft.operators.Ivf.nearestCid(cands, e, en), e))
          }
        }
        .toDF("cid", "e")
      // per-cell (count, element-wise sum): K x Dim rows, bounded by the
      // index — this collect is the index update, not a data collect
      val sums = assigned
        .select(col("cid"), posexplode(col("e")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        .collect()
        .groupBy(_.getLong(0))
      handle.rejectedCount.addAndGet(rejectedAcc.value)
      if (sums.nonEmpty) {
        var changed = false
        val next = handle.ref.get.map { c =>
          sums.get(c.cid) match {
            case None => c
            case Some(rows) =>
              val dim = c.ce.length
              val batchSum = new Array[Double](dim)
              var batchN = 0L
              rows.foreach { r =>
                batchSum(r.getInt(1)) = r.getDouble(3)
                batchN = r.getLong(2)
              }
              val (w0, s0) = handle.weights(c.cid)
              val w1 = w0 + batchN
              val s1 = Array.tabulate(dim)(i => s0(i) + batchSum(i))
              handle.weights = handle.weights.updated(c.cid, (w1, s1))
              val mean = s1.map(_ / w1)
              if (cosine(c.ce, mean) < driftCos) {
                changed = true
                handle.updates.incrementAndGet()
                Centroid(c.cid, mean, norm(mean))
              } else c
          }
        }
        if (changed) { handle.ref.set(next); handle.ver.incrementAndGet() }
      }
      ()
    }
    (writer, handle)
  }
}
