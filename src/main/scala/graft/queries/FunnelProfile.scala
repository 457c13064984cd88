package graft.queries

import org.apache.spark.sql.functions._

/** One-off stage profiler for q_curation_funnel: times each funnel stage's
  * first materialization in isolation so optimization work targets the
  * segment that actually dominates (round-12 verdict item #1). Not part of
  * the bench/verify surface.
  */
object FunnelProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.batch("graft-funnel-profile", 32)
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window
    val DQ = DedupQueries
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // replicate funnel() stage by stage, forcing each boundary
    val k = sys.env.getOrElse("SPARK_GRAFT_PROFILE_K", "1").toInt
    val documents = (0 until k).map { i =>
      graft.Tables.documents(spark, sfDir)
        .withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
    }.reduce(_ unionAll _)
    // mirrors funnel()'s single-scan variant build (round-13): one scan,
    // one tokenization, all four variants via explode, n_words stamped
    val ws0 = graft.operators.TextOps.words(col("text"))
    val docs = documents.select(col("doc_id").as("id"),
      when(col("doc_id") % 13 === 3,
        concat(col("text"), lit(" " + CurationQueries.FunnelBp)))
        .otherwise(col("text")).as("text"))
    def variant(id: org.apache.spark.sql.Column,
                text: org.apache.spark.sql.Column) =
      struct(id.as("id"), text.as("text"))
    val half = ceil(size(col("ws")) / 2.0).cast("int")
    val fifth = ceil(size(col("ws")) / 5.0).cast("int")
    val corpus = docs
      .select(col("id"), col("text"), ws0.as("ws"))
      .select(explode(array(
        variant(col("id"), col("text")),
        when(col("id") % 10 === 0,
          variant(col("id") + CurationQueries.FunnelExactOff, col("text"))),
        when(col("id") % 5 === 0,
          variant(col("id") + CurationQueries.FunnelTruncOff,
            concat_ws(" ", slice(col("ws"), lit(1), half)))),
        when(col("id") % 7 === 0 && size(col("ws")) >= 40,
          variant(col("id") + CurationQueries.FunnelExcerptOff,
            concat_ws(" ", slice(col("ws"), lit(1), fifth)))))).as("v"))
      .filter(col("v").isNotNull)
      .select(col("v.id").as("id"), col("v.text").as("text"),
        size(graft.operators.TextOps.words(col("v.text"))).cast("long").as("n_words"))
      .cache()
    t("corpus build+cache")(corpus.count())
    val deduped = t("exact dedup (checkpoint)") {
      val keep1 = corpus.groupBy(md5(col("text")).as("h"))
        .agg(min(col("id")).as("id")).select(col("id"))
      corpus.join(keep1, Seq("id"), "left_semi")
        .select(col("id"), col("text"), col("n_words")).localCheckpoint()
    }

    // clustering via the production seam (post-r12 rowwise/candidate-only
    // path), then the candidate sub-stages for attribution
    val bk = graft.operators.Dedup.bandKeys(
      graft.operators.Dedup.minhashSignaturesRowwise(
        deduped, col("id"), col("text"), 5)).cache()
    t("rowwise bands")(bk.count())
    val cand = graft.operators.Dedup.candidatePairsCapped(bk, 50).cache()
    t("candidates")(cand.count())
    val candIds = cand.select(col("a").as("id"))
      .unionAll(cand.select(col("b").as("id"))).distinct()
    println(s"[profile] counts: corpus=${corpus.count()} deduped=${deduped.count()} " +
      s"bands=${bk.count()} cand=${cand.count()} candIds=${candIds.count()}")
    val sh = t("shingles ckpt") {
      graft.operators.Dedup.shingleHashes(
        deduped.join(candIds, Seq("id"), "left_semi"),
        col("id"), col("text"), 5).localCheckpoint()
    }
    t("shingles(cand docs)")(sh.count())
    println(s"[profile] counts2: sh=${sh.count()} shAgain=${t("sh recount")(sh.count())}")
    t("deduped recount")(deduped.count())
    t("corpus recount")(corpus.count())
    val verified0 = graft.operators.Dedup.jaccard(cand, sh)
      .filter(col("jaccard") >= 0.35).select(col("a"), col("b"))
    val vplan = verified0.queryExecution.executedPlan.toString
    println(s"[profile] verified plan: inMemScans=" +
      "InMemoryTableScan".r.findAllIn(vplan).length +
      s" planLen=${vplan.length}")
    val verified = t("jaccard verify") {
      val v = verified0.cache()
      v.count(); v
    }
    println(s"[profile] verified=${verified.count()}")
    t("verified recount")(verified.count())
    import spark.implicits._
    val clusters = t("connected components")(
      graft.operators.Identity.connectedComponentsAdaptive(
        verified.as[(Long, Long)]).cache())
    clusters.count()
    val cl2 = clusters.select(col("node").as("cid"), col("component").as("cluster"))
    val keepers = cl2.groupBy(col("cluster")).agg(min(col("cid")).as("keeper"))
    val surv2 = t("surv2 checkpoint") {
      deduped.join(broadcast(cl2), col("id") === col("cid"), "left")
        .join(broadcast(keepers), Seq("cluster"), "left")
        .filter(col("cid").isNull || col("keeper") === col("id"))
        .select(col("id"), col("text")).localCheckpoint()
    }
    val surv2c = t("containment stage") {
      surv2.join(broadcast(DQ.containmentDropsAdaptive(surv2).select(col("id").as("ctid"))),
        col("id") === col("ctid"), "left_anti")
        .select(col("id"), col("text")).localCheckpoint()
    }
    val surv3 = t("span stage") {
      val s3 = DQ.spanSurvivors(surv2c.select(col("id").as("doc_id"), col("text")))
        .filter(col("action") =!= "drop")
        .select(col("doc_id").as("id"), col("n_kept_tokens")).cache()
      s3.count(); s3
    }
    t("quality+stage aggs") {
      val qual = surv2c.join(surv3, "id")
        .filter(CurationQueries.qualityCol >= 0.5)
        .select(col("id"), col("n_kept_tokens"))
      qual.count()
    }
    spark.stop()
  }
}
