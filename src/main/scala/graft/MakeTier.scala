package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Materialize a k-times replica of a testdata directory as REAL parquet
  * (round-13 verdict #4): the full-suite bench at a 10x tier catches
  * operators whose constants work at sf0.1 but whose curves were only
  * ever probed per-family (ScaleProbe replicates lazily per query; this
  * writes the replication ONCE so the bench reads genuine files with
  * genuine row groups, not a 10-way union plan).
  *
  * Replication model (organic growth, not duplication):
  *   - fact keys are offset per replica by a 1e9 stride (far above every
  *     query-level id offset, e.g. the funnel's 1e5 variant offsets), so
  *     replicas never collide and bounded-id contracts (vec_id < TrainMax
  *     training slices, < MaxQueryId query sets) keep their fixed size —
  *     the ScaleProbe convention;
  *   - document text goes through a per-replica word-substitution cipher
  *     (every word gains a replica suffix; replica 0 is byte-identical to
  *     the source): intra-replica dup/near-dup structure is preserved
  *     EXACTLY (the same 1:1 renaming applies to a doc and its planted
  *     copies), while cross-replica shingles, unigram hashes (simhash),
  *     and MinHash registers are all distinct — the planted dup rate
  *     stays the source's rate within each replica instead of every doc
  *     gaining 9 near-identical copies (pure replication, or a one-token
  *     salt, inflates candidate pairs quadratically — load no organic
  *     corpus produces; the first cut of this tool measured q_semdedup
  *     30x and q_dedup_simhash 17x purely from that artifact);
  *   - embeddings are circularly shifted by the replica index: shifting
  *     preserves intra-replica dot products bit-for-bit (the planted
  *     similarity structure survives) while cross-replica cosines
  *     decorrelate, so cosine/ANN candidate density grows linearly like
  *     an organic corpus;
  *   - dimension tables (region, nation) are shared, like production.
  *
  * Usage: runMain graft.MakeTier <srcSfDir> <outDir> <k>
  */
object MakeTier {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_tier10x")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val Stride = 1000000000L
    // the embedding rotation assigns replica i a distinct i-position
    // circular shift; past the dimension, shifts alias (replica i and
    // i-Dim would correlate again) and the slice arithmetic goes negative
    require(k >= 1 && k <= graft.operators.Similarity.Dim,
      s"k=$k out of range: 1 <= k <= ${graft.operators.Similarity.Dim}" +
        " (embedding rotation needs a distinct shift per replica)")
    val spark = Sessions.batch("graft-maketier", 16)
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: DataFrame)(f: (DataFrame, Long) => DataFrame): DataFrame =
      (0 until k).map(i => f(df, i.toLong * Stride)).reduce(_ unionAll _)

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
      println(s"[maketier] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    write("region", Tables.region(spark, src))
    write("nation", Tables.nation(spark, src))
    write("customer", replicate(Tables.customer(spark, src)) { (d, off) =>
      d.withColumn("c_custkey", col("c_custkey") + off)
    })
    write("supplier", replicate(Tables.supplier(spark, src)) { (d, off) =>
      d.withColumn("s_suppkey", col("s_suppkey") + off)
    })
    write("part", replicate(Tables.part(spark, src)) { (d, off) =>
      d.withColumn("p_partkey", col("p_partkey") + off)
    })
    write("orders", replicate(Tables.orders(spark, src)) { (d, off) =>
      d.withColumn("o_orderkey", col("o_orderkey") + off)
        .withColumn("o_custkey", col("o_custkey") + off)
    })
    write("lineitem", replicate(Tables.lineitem(spark, src)) { (d, off) =>
      d.withColumn("l_orderkey", col("l_orderkey") + off)
        .withColumn("l_partkey", col("l_partkey") + off)
        .withColumn("l_suppkey", col("l_suppkey") + off)
    })
    // events: more users over the same time window (the ts encoding is
    // normalized by the adaptive loader on read, written back as plain
    // timestamps)
    write("events", replicate(Tables.events(spark, src)) { (d, off) =>
      d.withColumn("event_id", col("event_id") + off)
        .withColumn("user_id", col("user_id") + off)
    })
    write("documents", replicate(Tables.documents(spark, src)) { (d, off) =>
      val ciphered =
        if (off == 0L) d
        else d.withColumn("text",
          concat_ws(" ", transform(split(trim(col("text")), "\\s+"),
            w => concat(w, lit(s"q${off / Stride}")))))
      ciphered.withColumn("doc_id", col("doc_id") + off)
        .withColumn("n_chars", length(col("text")).cast("long"))
    })
    write("embeddings", replicate(Tables.embeddings(spark, src)) { (d, off) =>
      val i = (off / Stride).toInt
      val shifted =
        if (i == 0) d
        else d.withColumn("embedding",
          concat(slice(col("embedding"), lit(i + 1), size(col("embedding")) - i),
            slice(col("embedding"), lit(1), lit(i))))
      shifted.withColumn("vec_id", col("vec_id") + off)
    })
    spark.stop()
  }
}
