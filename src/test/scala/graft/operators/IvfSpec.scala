package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF quantizer + search semantics on a corpus with planted structure:
  * three well-separated direction clusters in 8 dims, ids interleaved so
  * the deterministic first-K seeding covers every cluster (cluster of a
  * vector = vec_id % 3).
  */
class IvfSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    // cluster c (0..2): base direction e_{2c} + small deterministic noise
    // on the next axis — cosine within a cluster ~1, across clusters 0
    val rows = for {
      c <- 0 until 3
      m <- 0 until 20
    } yield {
      val v = Array.fill(8)(0.0)
      v(2 * c) = 1.0
      v(2 * c + 1) = 0.01 * (m % 5)
      (m.toLong * 3 + c, v.toSeq)
    }
    rows.toDF("vec_id", "e")
      .select(col("vec_id"), col("e").cast("array<double>").as("e"))
      .withColumn("nrm", Similarity.norm(col("e")))
  }

  test("one-Lloyd centroids separate planted direction clusters") {
    val cents = Ivf.centroids(corpus, k = 3)
    val assigned = Ivf.assign(corpus, cents)
    val byCluster = assigned
      .withColumn("cluster", col("vec_id") % 3)
      .groupBy("cluster").agg(countDistinct("cid").as("nc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every planted cluster maps to exactly one cell...
    assert(byCluster.values.forall(_ == 1L), s"split clusters: $byCluster")
    // ...and the three clusters use three distinct cells
    val distinctCells = assigned
      .withColumn("cluster", col("vec_id") % 3)
      .select("cluster", "cid").distinct().select("cid").distinct().count()
    assert(distinctCells == 3)
  }

  test("local centroid trainer == declarative Lloyd chain (route parity)") {
    // same seed, same assignment kernel, means within the 1e-4 rounding
    // every consumer applies — the cells and the ROUNDED geometry agree
    val viaLocal = Ivf.centroidsLocal(corpus, k = 3, trainMax = Ivf.TrainMax)
    val viaDist = Ivf.centroidsDistributed(corpus, k = 3, trainMax = Ivf.TrainMax)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("cid"), transform(col("ce"), x => round(x + 2.5e-7, 4)).as("cer"),
        round(col("cn") + 2.5e-7, 4).as("cnr"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(key(viaLocal) == key(viaDist))
    // and the downstream contract — the assignment every query consumes —
    // is identical through either centroid table
    val aLocal = Ivf.assign(corpus, viaLocal)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aDist = Ivf.assign(corpus, viaDist)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aLocal == aDist)
  }

  test("broadcast assignment == window-rank assignment (batch parity)") {
    val cents = Ivf.centroids(corpus, k = 3)
    val viaWindow = Ivf.assign(corpus, cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaBroadcast = Ivf.assignBroadcast(spark, corpus, cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaBroadcast == viaWindow)
  }

  test("zero-norm vector fails loudly in BOTH formulations (parity on the error too)") {
    import spark.implicits._
    val cents = Ivf.centroids(corpus, k = 3)
    // a zero vector has no cosine: the window twin raises ANSI
    // DIVIDE_BY_ZERO; the kernel must also refuse with a named error —
    // not the old BigDecimal.valueOf(NaN) crash, and not a silent guess.
    // (The streaming maintainer validates-and-drops BEFORE the kernel so
    // a poison record cannot wedge it — IvfStreamSpec covers that half.)
    val zero = Seq((999L, Seq.fill(8)(0.0)))
      .toDF("vec_id", "e")
      .select(col("vec_id"), col("e").cast("array<double>").as("e"))
      .withColumn("nrm", Similarity.norm(col("e")))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val eWin = intercept[Exception] {
      Ivf.assign(zero.unionByName(corpus), cents).collect()
    }
    assert(msgs(eWin).exists(_.contains("DIVIDE_BY_ZERO")))
    val eKern = intercept[Exception] {
      Ivf.assignBroadcast(spark, zero, cents).collect()
    }
    assert(msgs(eKern).exists(_.contains("zero-norm")))
  }

  test("dimension-mismatched vector fails loudly, not silently truncated") {
    import spark.implicits._
    val cents = Ivf.centroids(corpus, k = 3)
    val bad = Seq((7L, Seq.fill(12)(1.0)))
      .toDF("vec_id", "e")
      .select(col("vec_id"), col("e").cast("array<double>").as("e"))
      .withColumn("nrm", Similarity.norm(col("e")))
    val e = intercept[Exception] {
      Ivf.assignBroadcast(spark, bad, cents).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("dimension mismatch")))
  }

  test("broadcast assignment runs on a stream (continuous index ingestion)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val cents = Ivf.centroids(corpus, k = 3)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val prepStream = input.toDF().toDF("vec_id", "e")
      .select(col("vec_id"), col("e").cast("array<double>").as("e"))
      .withColumn("nrm", Similarity.norm(col("e")))
    val query = Ivf.assignBroadcast(spark, prepStream, cents)
      .writeStream.format("memory").queryName("ivf_stream")
      .outputMode("append").start()
    try {
      val v = Array.fill(8)(0.0); v(2) = 1.0 // planted cluster 1 direction
      input.addData((1000L, v.toSeq))
      query.processAllAvailable()
      val got = spark.table("ivf_stream").collect().map(r => r.getLong(0) -> r.getLong(1))
      assert(got.length == 1 && got.head._1 == 1000L)
      // lands in the same cell as the batch-assigned members of cluster 1
      val cellOfCluster1 = Ivf.assign(corpus, cents)
        .filter(col("vec_id") % 3 === 1).select("cid").distinct()
        .collect().map(_.getLong(0)).toSeq
      assert(cellOfCluster1.length == 1 && got.head._2 == cellOfCluster1.head)
    } finally query.stop()
  }

  test("IVF search with nProbe=1 returns same-cluster neighbors only, ranked") {
    val cents = Ivf.centroids(corpus, k = 3)
    val assigned = Ivf.assign(corpus, cents)
    val res = Ivf.search(
        corpus.filter(col("vec_id") === 0)
          .select(col("vec_id").as("q"), col("e").as("qe"), col("nrm").as("qn")),
        corpus, cents, assigned, nProbe = 1, k = 5)
      .orderBy("rank").collect()
    assert(res.length == 5)
    // all hits come from planted cluster 0 (vec_id % 3 == 0), never the query
    assert(res.forall(r => r.getAs[Long]("b") % 3 == 0 && r.getAs[Long]("b") != 0))
    // ranks are 1..5 and cosine is non-increasing
    assert(res.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
    val cosSeq = res.map(_.getAs[Double]("cos")).toSeq
    assert(cosSeq.zip(cosSeq.tail).forall { case (x, y) => x >= y })
  }

  test("searchFused is row-identical to the declarative search") {
    // the skinny-projection production path and the window twin must agree
    // on every (q, rank, b, cos) — multiple queries, multi-probe, so ties
    // and cell boundaries are exercised
    val cents = Ivf.centroids(corpus, k = 3)
    val queries = corpus.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q"), col("e").as("qe"), col("nrm").as("qn"))
    val declarative = Ivf.search(queries, corpus, cents,
        Ivf.assign(corpus, cents), nProbe = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val fused = Ivf.searchFused(spark, queries, corpus, cents, nProbe = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(fused == declarative)
  }
}
