package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Dataset-curation operators for a training-data pipeline: deterministic
  * hash-based sampling and train/valid/test splitting. Both derive the
  * decision from a salted content-independent hash of the stable doc id —
  * no RNG state, so the sample is reproducible on any engine, any
  * partitioning, any cluster size (the property `rand(seed)` does NOT
  * have across engines), and membership is stable under re-runs and
  * appends. At 100 TB both are a narrow codegen'd filter/projection over
  * the scan — no shuffle at all.
  */
object CurationQueries {

  private val SampleSalt = "smp"
  private val SplitSalt = "spl"

  val defs: Seq[QueryDef] = Seq(

    // Stratified 10% sample per language: the hash plays the role of the
    // uniform draw; stratification is just the unchanged lang column.
    QueryDef(
      "q_stratified_sample",
      s"""SELECT doc_id, lang
         |FROM documents
         |WHERE ${TextOps.hash64Sql(s"concat('$SampleSalt', doc_id)")} % 100 < 10""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .filter(TextOps.hash64(concat(lit(SampleSalt), col("doc_id"))) % 100 < 10)
          .select(col("doc_id"), col("lang"))
    },

    // Train/valid/test split 80/10/10 with per-split doc and token counts
    // (token = whitespace word) — the split manifest a training run reads.
    QueryDef(
      "q_hash_split",
      s"""WITH assigned AS (
         |  SELECT CASE
         |           WHEN ${TextOps.hash64Sql(s"concat('$SplitSalt', doc_id)")} % 100 < 80 THEN 'train'
         |           WHEN ${TextOps.hash64Sql(s"concat('$SplitSalt', doc_id)")} % 100 < 90 THEN 'valid'
         |           ELSE 'test' END AS split,
         |         len(${TextOps.wordsSql("text")}) AS n_tokens
         |  FROM documents)
         |SELECT split, count(*) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         |FROM assigned GROUP BY split""".stripMargin) { (s, dir) =>
      val h = TextOps.hash64(concat(lit(SplitSalt), col("doc_id"))) % 100
      Tables.documents(s, dir)
        .select(
          when(h < 80, "train").when(h < 90, "valid").otherwise("test").as("split"),
          size(TextOps.words(col("text"))).cast("long").as("n_tokens"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
    })
}
