package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PQ semantics (operators/Pq.scala): encoding shape, ADC exactness on a
  * constructed corpus, and the separable case where the quantizer must be
  * lossless enough to rank perfectly.
  */
class PqSpec extends SparkSpec {

  /** 3 well-separated clusters in 64-dim: cluster axis one-hot with small
    * per-member jitter on a different axis. Nearest neighbors are the
    * cluster-mates, with wide margin — a correct PQ must rank them first.
    */
  private def corpus = {
    val rows = for {
      c <- 0 until 3
      m <- 0 until 12
    } yield {
      val v = Array.fill(Similarity.Dim)(0.0)
      v(c * 20) = 10.0
      v(c * 20 + 1) = 0.1 * (m % 4)
      (c * 12 + m.toLong, v.toSeq)
    }
    spark.createDataFrame(rows).toDF("vec_id", "e")
      .select(col("vec_id"), col("e").cast("array<double>").as("e"))
  }

  test("encode emits exactly M codes per vector, all in [0, KPq)") {
    val sv = Pq.subvecs(corpus).cache()
    val codes = Pq.encode(sv, Pq.codebook(sv)).cache()
    val perVec = codes.groupBy("vec_id").count().agg(
      min("count"), max("count")).head()
    assert(perVec.getLong(0) == Pq.M && perVec.getLong(1) == Pq.M)
    val range = codes.agg(min("code"), max("code")).head()
    assert(range.getLong(0) >= 0 && range.getLong(1) < Pq.KPq)
    codes.unpersist(); sv.unpersist()
  }

  test("ADC ranks cluster-mates first on separable data") {
    val sv = Pq.subvecs(corpus).cache()
    val cb = Pq.codebook(sv).cache()
    val codes = Pq.encode(sv, cb)
    val qsv = sv.filter(col("vec_id") < 6)
      .select(col("vec_id").as("q"), col("sub"), col("se").as("qe"))
    val top = Pq.adc(Pq.distanceTable(qsv, cb), codes, 5)
      .select(col("q"), col("b")).collect()
    // every retrieved neighbor of q in cluster c=q/12 must share the cluster
    top.foreach { r =>
      val (q, b) = (r.getLong(0), r.getLong(1))
      assert(b / 12 == q / 12,
        s"ADC pulled $b (cluster ${b / 12}) for query $q (cluster ${q / 12})")
    }
    cb.unpersist(); sv.unpersist()
  }

  test("encodeBroadcast: code-for-code parity with declarative encode, batch and stream") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sv = Pq.subvecs(corpus).cache()
    val cb = Pq.codebook(sv).cache()
    val want = Pq.encode(sv, cb)
      .groupBy("vec_id")
      .agg(org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.array_sort(
          org.apache.spark.sql.functions.collect_list(
            org.apache.spark.sql.functions.struct(col("sub"), col("code")))),
        s => s.getField("code")).as("codes"))
      .as[(Long, Seq[Long])].collect().toMap
    // batch parity
    val got = Pq.encodeBroadcast(spark, corpus, cb)
      .as[(Long, Seq[Long])].collect().toMap
    assert(got == want, "broadcast encoder diverged from declarative encode")
    // streaming: same encoder over a MemoryStream, stateless append
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])]
    val out = Pq.encodeBroadcast(spark,
      input.toDF().toDF("vec_id", "e"), cb)
    val q = out.writeStream.format("memory").queryName("pq_codes_stream")
      .outputMode("append").start()
    try {
      input.addData(corpus.select(col("vec_id"), col("e"))
        .as[(Long, Seq[Double])].collect().toSeq)
      q.processAllAvailable()
      val streamed = spark.table("pq_codes_stream")
        .as[(Long, Seq[Long])].collect().toMap
      assert(streamed == want, "streamed codes diverged from batch")
    } finally q.stop()
    cb.unpersist(); sv.unpersist()
  }

  test("ADC distance is the exact long sum of scaled subspace partials") {
    val sv = Pq.subvecs(corpus).cache()
    val cb = Pq.codebook(sv).cache()
    val codes = Pq.encode(sv, cb)
    val qsv = sv.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q"), col("sub"), col("se").as("qe"))
    val dt = Pq.distanceTable(qsv, cb)
    val adc = Pq.adc(dt, codes, 100)
    // recompute independently: join codes to dt rows and sum as BigInt
    val manual = dt.collect().map(r =>
        (r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    val codeRows = codes.filter(col("vec_id") =!= 0).collect()
      .groupBy(_.getLong(0))
      .map { case (b, rs) =>
        b -> rs.map(r => manual(r.getInt(1) -> r.getLong(2))).sum }
    adc.collect().foreach { r =>
      assert(codeRows(r.getLong(2)) == r.getLong(3),
        s"adc10k mismatch for b=${r.getLong(2)}")
    }
    cb.unpersist(); sv.unpersist()
  }

  test("local codebook trainer == declarative Lloyd chain (route parity)") {
    val sv = Pq.subvecs(corpus)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("sub"), col("cid"),
        transform(col("ce"), x => round(x + 2.5e-7, 4)).as("cer"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
      .sortBy(t => (t._1, t._2)).toSeq
    // entries and Num-rounded geometry agree (raw means may differ in the
    // last ulps by summation order — the repo's determinism contract is
    // the rounded grid every consumer ranks on)
    assert(key(Pq.codebookLocal(sv)) == key(Pq.codebookDistributed(sv)))
    // downstream contract: identical codes through either codebook
    val viaLocal = Pq.encodeRows(spark, corpus, Pq.codebookLocal(sv))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val viaDist = Pq.encodeRows(spark, corpus, Pq.codebookDistributed(sv))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(viaLocal == viaDist)
  }

  test("training is sample-bounded: vectors past TrainMax never move the codebook") {
    // append a far-away outlier with id >= TrainMax: the trained codebook
    // must be IDENTICAL to training without it (the outlier still gets
    // encoded — by the sample-trained codebook), for both PQ and IVF.
    val outlier = {
      val v = Array.fill(Similarity.Dim)(0.0)
      v(7) = 99.0
      spark.createDataFrame(Seq((Pq.TrainMax + 5, v.toSeq))).toDF("vec_id", "e")
        .select(col("vec_id"), col("e").cast("array<double>").as("e"))
    }
    val withOutlier = corpus.unionAll(outlier)
    // centroid means come from independent aggregation jobs whose partial
    // sums merge in arrival order, so equality is asserted on the Num-
    // rounded grid (the repo's cross-run determinism contract), not on
    // raw last-ulp doubles
    def r4seq(xs: Seq[Double]): Seq[Double] = xs.map(Num.r4Jvm)
    val cbBase = Pq.codebook(Pq.subvecs(corpus)).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r4seq(r.getSeq[Double](2))).toMap
    val cbPlus = Pq.codebook(Pq.subvecs(withOutlier)).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r4seq(r.getSeq[Double](2))).toMap
    assert(cbBase == cbPlus, "PQ codebook must ignore vec_id >= TrainMax")
    // the outlier is still encoded: M codes like everyone else
    val codes = Pq.encodeRows(spark, withOutlier,
      Pq.codebook(Pq.subvecs(withOutlier)))
    assert(codes.filter(col("vec_id") === (Pq.TrainMax + 5)).count() == Pq.M)

    // IVF twin on the same fixture (centroids expects prepared's nrm)
    def prep(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("e"),
        sqrt(aggregate(col("e"), lit(0.0), (a, x) => a + x * x)).as("nrm"))
    val ivBase = Ivf.centroids(prep(corpus), 8).collect()
      .map(r => r.getLong(0) -> r4seq(r.getSeq[Double](1))).toMap
    val ivPlus = Ivf.centroids(prep(withOutlier), 8).collect()
      .map(r => r.getLong(0) -> r4seq(r.getSeq[Double](1))).toMap
    assert(ivBase == ivPlus, "IVF centroids must ignore vec_id >= TrainMax")
  }
}
