package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Ivf, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN surface (operators/Ivf.scala): cell assignment
  * (the index build) and nProbe top-k search (the query path). Output
  * shape of q_ann_ivf_search matches q_knn_topk so IVF recall vs the
  * exact scan is directly comparable.
  */
object IvfQueries {

  private val K = 16
  private val NProbe = 4
  private val TopK = 5
  private val MaxQueryId = 20

  private def quantizer(s: SparkSession, dir: String) = {
    val prep = Similarity.prepared(Tables.embeddings(s, dir)).cache()
    val cents = Ivf.centroids(prep, K)
    (prep, cents)
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_ann_ivf_cells",
      s"""WITH ${Ivf.cellsSql(K)}
         |SELECT vec_id, cell, count(*) OVER (PARTITION BY cell) AS n_cell
         |FROM assign1""".stripMargin) { (s, dir) =>
      val (prep, cents) = quantizer(s, dir)
      Ivf.assign(prep, cents)
        .select(col("vec_id"), col("cid").as("cell"))
        .withColumn("n_cell", count(lit(1)).over(Window.partitionBy(col("cell"))))
    },

    QueryDef(
      "q_ann_ivf_search",
      s"""WITH ${Ivf.cellsSql(K)},
         |${Ivf.searchSql(MaxQueryId, NProbe, TopK)}
         |SELECT q, rank, b, cos FROM scored""".stripMargin) { (s, dir) =>
      val (prep, cents0) = quantizer(s, dir)
      val cents = cents0.cache()
      val queries = prep.filter(col("vec_id") < MaxQueryId)
        .select(col("vec_id").as("q"), col("e").as("qe"), col("nrm").as("qn"))
      Ivf.search(queries, prep, cents, Ivf.assign(prep, cents), NProbe, TopK)
    })
}
