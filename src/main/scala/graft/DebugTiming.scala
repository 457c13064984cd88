package graft

import org.apache.spark.sql.functions._

/** Ad-hoc phase timing for the dedup-clusters pipeline (dev tool). */
object DebugTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.batch("graft-debug", 32)
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    import graft.operators.{Dedup, Identity}
    val docs = Tables.documents(spark, sfDir).select(col("doc_id").as("id"), col("text"))
    val base = docs.unionAll(
      docs.filter(col("id") % 5 === 0)
        .select((col("id") + 100000L).as("id"),
          concat_ws(" ", slice(graft.operators.TextOps.words(col("text")), lit(1),
            ceil(size(graft.operators.TextOps.words(col("text"))) / 2.0).cast("int"))).as("text")))
    val sh = Dedup.shingleHashes(base, col("id"), col("text"), 5).cache()
    time("sh materialize")(sh.count())
    val cand = Dedup.candidatePairs(Dedup.bandKeys(Dedup.minhashSignatures(sh))).cache()
    time("cand materialize")(cand.count())
    val verified = Dedup.jaccard(cand, sh)
      .filter(col("jaccard") >= 0.35)
      .select(col("a").as("src"), col("b").as("dst"))
    time("jaccard verify")(verified.count())
    val cc = time("connected components")(Identity.connectedComponents(verified))
    time("final count")(cc.count())
    spark.stop()
  }
}
