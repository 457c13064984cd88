package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Num, Similarity}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (Cormack et al., SIGIR 2009)
  * of the lexical BM25 arm (q_bm25_topk's query relation) and the
  * semantic cosine-kNN arm (query vector = the embedding whose vec_id
  * equals the qid — the "query has both terms and an embedding" shape of
  * a production search stack).
  *
  * Float discipline: the classic 1/(k0+rank) is replaced by INTEGER
  * floor division, 1000000 div (k0 + rank) — no float ever enters the
  * fusion, so the per-(query, doc) sum is exact and engine-independent
  * (the q_bm25_topk micro-unit precedent, taken one step further).
  *
  * 100 TB shape: each arm is already top-k-bounded (|Q|*k rows — the
  * arms themselves carry the corpus-scale posture: BM25's inverted-index
  * probe, kNN's broadcast-query window with WindowGroupLimit), so the
  * fusion join and final re-rank touch |Q|*2k rows no matter how large
  * the corpus is. Arm ranks are carried through (0 = not retrieved by
  * that arm) for attribution, as a reranking stage downstream expects.
  */
object HybridQueries {

  private val K = 10   // per-arm and fused top-k
  private val K0 = 60  // RRF damping constant (the paper's value)

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_hybrid_rrf",
      s"""WITH q(qid, term) AS (VALUES
         |  ${TextAnalytics.Bm25Queries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")}),
         |${TextAnalytics.bm25ChainSql},
         |lexk AS (
         |  SELECT qid, doc_id, rank FROM (
         |    SELECT qid, doc_id,
         |           row_number() OVER (PARTITION BY qid
         |                              ORDER BY score_u DESC, doc_id) AS rank
         |    FROM sc) WHERE rank <= $K),
         |prep AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                               CAST(embedding AS DOUBLE[]))) AS nrm
         |  FROM embeddings),
         |semk AS (
         |  SELECT qid, doc_id, rank FROM (
         |    SELECT CAST(a.vec_id AS INTEGER) AS qid, b.vec_id AS doc_id,
         |           row_number() OVER (
         |             PARTITION BY a.vec_id
         |             ORDER BY round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm) + 0.00000025, 4) DESC,
         |                      b.vec_id) AS rank
         |    FROM prep a JOIN prep b ON b.vec_id != a.vec_id
         |    WHERE a.vec_id IN (SELECT DISTINCT qid FROM q)) WHERE rank <= $K),
         |fused AS (
         |  SELECT COALESCE(l.qid, s.qid) AS qid,
         |         COALESCE(l.doc_id, s.doc_id) AS doc_id,
         |         CAST(COALESCE(l.rank, 0) AS BIGINT) AS rank_lex,
         |         CAST(COALESCE(s.rank, 0) AS BIGINT) AS rank_sem,
         |         COALESCE(1000000 // ($K0 + l.rank), 0)
         |           + COALESCE(1000000 // ($K0 + s.rank), 0) AS rrf_u
         |  FROM lexk l FULL OUTER JOIN semk s
         |    ON s.qid = l.qid AND s.doc_id = l.doc_id)
         |SELECT qid, rank, doc_id, rrf_u, rank_lex, rank_sem FROM (
         |  SELECT qid, doc_id, CAST(rrf_u AS BIGINT) AS rrf_u, rank_lex, rank_sem,
         |         CAST(row_number() OVER (PARTITION BY qid
         |                                 ORDER BY rrf_u DESC, doc_id) AS INT) AS rank
         |  FROM fused) WHERE rank <= $K""".stripMargin) { (s, dir) =>
      import s.implicits._
      val queries = TextAnalytics.Bm25Queries.toDF("qid", "term")
      val lexk = TextAnalytics.bm25TopK(Tables.documents(s, dir), queries, K)
        .select(col("qid"), col("doc_id"), col("rank"))
      val qids = TextAnalytics.Bm25Queries.map(_._1).distinct.map(_.toLong)
      val prep = Similarity.prepared(Tables.embeddings(s, dir))
      val qv = prep.filter(col("vec_id").isin(qids: _*))
        .select(col("vec_id").cast("int").as("qid"),
          col("e").as("qe"), col("nrm").as("qn"))
      val semk = broadcast(qv)
        .join(prep, col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("doc_id"),
          Num.r4(Similarity.cosine(col("qe"), col("e"), col("qn"), col("nrm"))).as("cos"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("doc_id"))).cast("long"))
        .filter(col("rank") <= K)
        .select(col("qid"), col("doc_id"), col("rank"))
      val l = lexk.select(col("qid").as("lqid"), col("doc_id").as("ldoc"),
        col("rank").as("lrank"))
      val sm = semk.select(col("qid").as("sqid"), col("doc_id").as("sdoc"),
        col("rank").as("srank"))
      val fused = l.join(sm,
          col("sqid") === col("lqid") && col("sdoc") === col("ldoc"), "full_outer")
        .select(
          coalesce(col("lqid"), col("sqid")).as("qid"),
          coalesce(col("ldoc"), col("sdoc")).as("doc_id"),
          coalesce(col("lrank"), lit(0L)).as("rank_lex"),
          coalesce(col("srank"), lit(0L)).as("rank_sem"),
          (coalesce(expr(s"1000000 div ($K0 + lrank)"), lit(0L))
            + coalesce(expr(s"1000000 div ($K0 + srank)"), lit(0L))).as("rrf_u"))
      fused
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("rrf_u").desc, col("doc_id"))).cast("int"))
        .filter(col("rank") <= K)
        .select(col("qid"), col("rank"), col("doc_id"), col("rrf_u"),
          col("rank_lex"), col("rank_sem"))
    })
}
