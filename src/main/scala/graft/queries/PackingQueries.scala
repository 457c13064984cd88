package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Packing
import org.apache.spark.sql.functions._

/** Sequence-packing surface (operators/Packing.scala): the concat-and-cut
  * manifest a training loader consumes, plus the per-source packing
  * summary. The Spark side runs the two-pass distributed prefix sum; the
  * oracle replays the equivalent window formulation — hash equality IS
  * the distributed-scan parity proof at data scale.
  */
object PackingQueries {

  private val L = Packing.SeqLen

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_pack_manifest",
      s"""WITH ${Packing.offsetsSql}
         |SELECT doc_id, source, n_tokens,
         |       end_off - n_tokens AS start_off,
         |       (end_off - n_tokens) // $L AS seq_first,
         |       (end_off - 1) // $L AS seq_last,
         |       (end_off - 1) // $L - (end_off - n_tokens) // $L + 1 AS n_seqs
         |FROM poffs""".stripMargin) { (s, dir) =>
      Packing.manifest(
        Packing.endOffsets(Packing.tokenCounts(Tables.documents(s, dir))))
    },

    // Per-source packing summary: stream length in sequences, how many
    // documents straddle a cut, and the fill of the final (partial)
    // sequence — the numbers that size a training epoch.
    QueryDef(
      "q_pack_stats",
      s"""WITH ${Packing.offsetsSql},
         |pm AS (
         |  SELECT doc_id, source, n_tokens,
         |         (end_off - n_tokens) // $L AS seq_first,
         |         (end_off - 1) // $L AS seq_last,
         |         end_off
         |  FROM poffs)
         |SELECT source,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |       (max(end_off) + $L - 1) // $L AS n_seqs,
         |       CAST(sum(CASE WHEN seq_last > seq_first THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_straddlers,
         |       max(end_off) - ((max(end_off) - 1) // $L) * $L AS last_fill
         |FROM pm
         |GROUP BY source""".stripMargin) { (s, dir) =>
      val m = Packing.manifest(
        Packing.endOffsets(Packing.tokenCounts(Tables.documents(s, dir))))
        .withColumn("end_off", col("start_off") + col("n_tokens"))
      m.groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          expr(s"(max(end_off) + $L - 1) div $L").as("n_seqs"),
          sum(when(col("seq_last") > col("seq_first"), 1L).otherwise(0L))
            .as("n_straddlers"),
          expr(s"max(end_off) - ((max(end_off) - 1) div $L) * $L").as("last_fill"))
    })
}
