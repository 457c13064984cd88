package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Num, Similarity}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN: deterministic k-means-style coarse quantizer —
  * init centroids = the first K vectors (deterministic seeding), one Lloyd
  * iteration (assign by cosine, recompute centroids as element-wise
  * means), final cell assignment. Output: each vector's cell + cell
  * population (the IVF candidate-list size). At 100 TB the ANN search is
  * an equijoin on cell (+ neighboring cells for multi-probe).
  *
  * Assignment ranks on the rounded cosine with centroid-id tie-break, so
  * the argmax is engine-independent despite float-sum ordering in the
  * centroid means.
  */
object IvfQueries {

  private val K = 16

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_ann_ivf_cells",
      s"""WITH prep AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                               CAST(embedding AS DOUBLE[]))) AS nrm
         |  FROM embeddings),
         |cent0 AS (
         |  SELECT vec_id AS cid, e AS ce, nrm AS cn FROM prep WHERE vec_id < $K),
         |assign0 AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT p.vec_id, c.cid,
         |           row_number() OVER (
         |             PARTITION BY p.vec_id
         |             ORDER BY round(list_dot_product(p.e, c.ce) / (p.nrm * c.cn) + 0.00000025, 4) DESC,
         |                      c.cid) AS rn
         |    FROM prep p CROSS JOIN cent0 c) WHERE rn = 1),
         |dims AS (
         |  SELECT a.cid, unnest(range(1, 65)) AS pos, unnest(p.e) AS x
         |  FROM prep p JOIN assign0 a ON a.vec_id = p.vec_id),
         |cent1 AS (
         |  SELECT cid, list(xavg ORDER BY pos) AS ce,
         |         sqrt(list_dot_product(list(xavg ORDER BY pos), list(xavg ORDER BY pos))) AS cn
         |  FROM (SELECT cid, pos, avg(x) AS xavg FROM dims GROUP BY cid, pos)
         |  GROUP BY cid),
         |assign1 AS (
         |  SELECT vec_id, cid AS cell FROM (
         |    SELECT p.vec_id, c.cid,
         |           row_number() OVER (
         |             PARTITION BY p.vec_id
         |             ORDER BY round(list_dot_product(p.e, c.ce) / (p.nrm * c.cn) + 0.00000025, 4) DESC,
         |                      c.cid) AS rn
         |    FROM prep p CROSS JOIN cent1 c) WHERE rn = 1)
         |SELECT vec_id, cell, count(*) OVER (PARTITION BY cell) AS n_cell
         |FROM assign1""".stripMargin) { (s, dir) =>
      val prep = Similarity.prepared(Tables.embeddings(s, dir)).cache()

      def assign(cents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        prep.crossJoin(broadcast(cents))
          .withColumn("cosr",
            Num.r4(Similarity.cosine(col("e"), col("ce"), col("nrm"), col("cn"))))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("vec_id")).orderBy(col("cosr").desc, col("cid"))))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("cid"))

      val cent0 = prep.filter(col("vec_id") < K)
        .select(col("vec_id").as("cid"), col("e").as("ce"), col("nrm").as("cn"))
      val assign0 = assign(cent0)
      // element-wise mean per cell: posexplode -> avg -> rebuild ordered array
      val cent1 = prep.join(assign0, "vec_id")
        .select(col("cid"), posexplode(col("e")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("xavg"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("xavg")))),
          s => s.getField("xavg")).as("ce"))
        .withColumn("cn", Similarity.norm(col("ce")))
      assign(cent1)
        .select(col("vec_id"), col("cid").as("cell"))
        .withColumn("n_cell", count(lit(1)).over(Window.partitionBy(col("cell"))))
    })
}
