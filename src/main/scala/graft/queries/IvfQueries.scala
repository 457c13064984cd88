package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Ivf, Similarity, TextOps}
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
  // SemDeDup cosine threshold: the synthetic embeddings plant near-dups
  // well above 0.4 (same corpus contract as q_embed_cosine_pairs)
  private val SemThreshold = 0.4
  // SemDeDup cell-population bound: a cell larger than this is sub-split
  // by a deterministic vec_id hash BEFORE the within-cell pair join, so
  // the candidate volume stays sum(min(cell, bound)^2 x nsub) — linear in
  // the corpus — instead of quadratic in cell population (with the fixed
  // oracle-replayable K, cell size grows with the corpus: the 10x tier
  // measured 19 s before this guard, ~3 s after). The sub-split loses
  // only cross-sub-cell pairs inside oversized cells — the standard
  // shard-the-cluster concession, twinned exactly in the oracle SQL.
  private val SemMaxCell = 200L
  // q_cluster_sample hash salt (content-independent draw, as in
  // CurationQueries' sampling family)
  private val DivSalt = "div"

  // eager localCheckpoint, NOT cache, for every multiply-consumed relation
  // in this registry (r16 ADVICE, the SmallResult/FunnelStages lesson one
  // registry over): these bodies return LAZY results, so a cache() pinned
  // here is storage the caller would have to clearCache() away — the
  // checkpoint leaf gives the same reuse (centroid training, fan-out into
  // self-join sides) with no storage obligation; its blocks are GC-managed
  // once the result is unreferenced. CacheLifetimeSpec composes the IVF
  // queries and asserts the cache manager stays empty.
  private def quantizer(s: SparkSession, dir: String) = {
    val prep = Similarity.prepared(Tables.embeddings(s, dir)).localCheckpoint()
    val cents = Ivf.centroids(prep, K)
    (prep, cents)
  }

  /** Oversized-cell sub-split shared by q_semdedup and
    * q_embed_cosine_pairs_ivf: nsub = ceil(n_cell / SemMaxCell),
    * sub = positive hash of the vec_id mod nsub — deterministic,
    * engine-replayable, identity (nsub = 1) for every in-bound cell.
    * Keeps within-cell pair volume linear in the corpus (see
    * q_semdedup's QueryDef comment); ONE definition per engine so the
    * two queries can't fork.
    */
  private def subSplit(assigned: org.apache.spark.sql.DataFrame) = {
    val counts = assigned.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_cell"))
      .withColumn("nsub",
        expr(s"(n_cell + ${SemMaxCell - 1}) div $SemMaxCell"))
      .select(col("cid"), col("nsub"))
    assigned.join(broadcast(counts), "cid")
      .withColumn("sub", pmod(
        TextOps.hash64(concat(lit("semsub#"), col("vec_id").cast("string"))),
        col("nsub")))
  }

  /** SQL twin of `subSplit` → CTEs ccounts + subbed(vec_id, cell, sub),
    * on top of cellsSql's assign1.
    */
  private val subbedSql =
    s"""ccounts AS (SELECT cell, count(*) AS n_cell FROM assign1 GROUP BY cell),
       |subbed AS (
       |  SELECT a.vec_id, a.cell,
       |         ((${TextOps.hash64Sql("'semsub#' || CAST(a.vec_id AS VARCHAR)")} % ((c.n_cell + ${SemMaxCell - 1}) // $SemMaxCell))
       |          + ((c.n_cell + ${SemMaxCell - 1}) // $SemMaxCell)) % ((c.n_cell + ${SemMaxCell - 1}) // $SemMaxCell) AS sub
       |  FROM assign1 a JOIN ccounts c ON c.cell = a.cell)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_ann_ivf_cells",
      s"""WITH ${Ivf.cellsSql(K)}
         |SELECT vec_id, cell, count(*) OVER (PARTITION BY cell) AS n_cell
         |FROM assign1""".stripMargin) { (s, dir) =>
      val (prep, cents) = quantizer(s, dir)
      Ivf.assignBroadcast(s, prep, cents)
        .select(col("vec_id"), col("cid").as("cell"))
        .withColumn("n_cell", count(lit(1)).over(Window.partitionBy(col("cell"))))
    },

    QueryDef(
      "q_ann_ivf_search",
      s"""WITH ${Ivf.cellsSql(K)},
         |${Ivf.searchSql(MaxQueryId, NProbe, TopK)}
         |SELECT q, rank, b, cos FROM scored""".stripMargin) { (s, dir) =>
      val (prep, cents0) = quantizer(s, dir)
      val cents = cents0.localCheckpoint()
      val queries = prep.filter(col("vec_id") < MaxQueryId)
        .select(col("vec_id").as("q"), col("e").as("qe"), col("nrm").as("qn"))
      Ivf.searchFused(s, queries, prep, cents, NProbe, TopK)
    },

    // Index quality: recall@5 of the IVF search against the exact top-5 —
    // the metric an ANN deployment tunes nProbe by. Per-query recall =
    // |IVF top5 ∩ exact top5| / 5.
    QueryDef(
      "q_ann_ivf_recall",
      s"""WITH ${Ivf.cellsSql(K)},
         |${Ivf.searchSql(MaxQueryId, NProbe, TopK)},
         |exact AS (
         |  SELECT q, b FROM (
         |    SELECT a.vec_id AS q, b.vec_id AS b,
         |           row_number() OVER (
         |             PARTITION BY a.vec_id
         |             ORDER BY round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm) + 0.00000025, 4) DESC,
         |                      b.vec_id) AS rank
         |    FROM prep a JOIN prep b ON b.vec_id != a.vec_id
         |    WHERE a.vec_id < $MaxQueryId)
         |  WHERE rank <= $TopK)
         |SELECT e.q, round(count(s.b) / $TopK.0 + 0.00000025, 4) AS recall
         |FROM exact e
         |LEFT JOIN scored s ON s.q = e.q AND s.b = e.b
         |GROUP BY e.q""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val (prep0, cents0) = quantizer(s, dir)
      val prep = prep0
      val cents = cents0.localCheckpoint()
      val queries = prep.filter(col("vec_id") < MaxQueryId)
        .select(col("vec_id").as("q"), col("e").as("qe"), col("nrm").as("qn"))
      val ivf = Ivf.searchFused(s, queries, prep, cents, NProbe, TopK)
        .select(col("q"), col("b"))
      val exact = broadcast(queries)
        .join(prep.as("b"), col("b.vec_id") =!= col("q"))
        .select(col("q"), col("b.vec_id").as("b"),
          graft.operators.Num.r4(
            Similarity.cosine(col("qe"), col("b.e"), col("qn"), col("b.nrm"))).as("cosr"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("q")).orderBy(col("cosr").desc, col("b"))))
        .filter(col("rank") <= TopK)
        .select(col("q"), col("b"))
      exact
        .join(ivf.withColumnRenamed("b", "sb").withColumnRenamed("q", "sq"),
          col("sq") === col("q") && col("sb") === col("b"), "left")
        .groupBy(col("q"))
        .agg(graft.operators.Num.r4(count(col("sb")) / TopK.toDouble).as("recall"))
    },

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-space
    // cluster-then-dedup. Cluster = the IVF cell (k-means coarse
    // quantizer); within each cell, a vector is DROPPED when a
    // smaller-id cell-mate sits above the cosine threshold — all-pairs
    // comparison happens only INSIDE a cell (a cid equijoin), never
    // across the corpus. Because the oracle-replayable K is fixed, cell
    // population grows WITH the corpus, so cells past `SemMaxCell` are
    // sub-split by a deterministic vec_id hash before the pair join
    // (pairs across sub-cells of one oversized cell are conceded — the
    // standard shard-the-cluster mitigation); candidate volume is
    // thereby linear in the corpus, not quadratic in cell size.
    QueryDef(
      "q_semdedup",
      s"""WITH ${Ivf.cellsSql(K)},
         |$subbedSql,
         |pairs AS (
         |  SELECT x.vec_id AS a, y.vec_id AS b
         |  FROM subbed x
         |  JOIN subbed y ON x.cell = y.cell AND x.sub = y.sub AND x.vec_id < y.vec_id
         |  JOIN prep pa ON pa.vec_id = x.vec_id
         |  JOIN prep pb ON pb.vec_id = y.vec_id
         |  WHERE round(list_dot_product(pa.e, pb.e) / (pa.nrm * pb.nrm) + 0.00000025, 4) >= $SemThreshold)
         |SELECT v.vec_id, v.cell, min(p.a) AS dropped_by,
         |       (min(p.a) IS NULL) AS kept
         |FROM assign1 v LEFT JOIN pairs p ON p.b = v.vec_id
         |GROUP BY v.vec_id, v.cell""".stripMargin) { (s, dir) =>
      val (prep, cents) = quantizer(s, dir)
      val assigned = Ivf.assignBroadcast(s, prep, cents).localCheckpoint()
      val withE = subSplit(assigned).join(prep, "vec_id")
      val a = withE.select(col("cid").as("acid"), col("sub").as("asub"),
        col("vec_id").as("a"), col("e").as("ae"), col("nrm").as("an"))
      val b = withE.select(col("cid").as("bcid"), col("sub").as("bsub"),
        col("vec_id").as("bid"), col("e").as("be"), col("nrm").as("bn"))
      // within-(cell, sub) pairs only: an EQUIJOIN (shuffles by cell+sub,
      // never a cartesian); threshold on the rounded cosine so the
      // boundary is engine-independent
      val pairs = a.join(b,
          col("acid") === col("bcid") && col("asub") === col("bsub") &&
            col("a") < col("bid"))
        .filter(graft.operators.Num.r4(
          Similarity.cosine(col("ae"), col("be"), col("an"), col("bn"))) >= SemThreshold)
        .select(col("a"), col("bid"))
      val droppedBy = pairs.groupBy(col("bid")).agg(min(col("a")).as("dropped_by"))
      assigned.select(col("vec_id"), col("cid").as("cell"))
        .join(droppedBy.withColumnRenamed("bid", "vec_id"), Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"), col("dropped_by"),
          col("dropped_by").isNull.as("kept"))
    },

    // The 100x-scale twin of q_embed_cosine_pairs (which stays as the
    // brute-force eval baseline at <=10x): candidate pairs come from IVF
    // cell-mates — an equijoin on (cell, sub), never the corpus
    // cross-join — then the exact cosine verifies candidates only, at
    // the same 0.4 threshold. Recall concession is pairs whose members
    // land in different coarse cells (and cross-sub pairs inside
    // oversized cells) — the standard cluster-then-compare posture
    // (SemDeDup's candidate stage with the pair list as output instead
    // of the keeper decision). Candidate volume is sum over cells of
    // min(n_cell, SemMaxCell)^2 x nsub — linear in the corpus, so this
    // is the shape that survives 100 TB while the baseline stays N^2.
    QueryDef(
      "q_embed_cosine_pairs_ivf",
      s"""WITH ${Ivf.cellsSql(K)},
         |$subbedSql
         |SELECT x.vec_id AS a, y.vec_id AS b,
         |       round(list_dot_product(pa.e, pb.e) / (pa.nrm * pb.nrm) + 0.00000025, 4) AS cos
         |FROM subbed x
         |JOIN subbed y ON x.cell = y.cell AND x.sub = y.sub AND x.vec_id < y.vec_id
         |JOIN prep pa ON pa.vec_id = x.vec_id
         |JOIN prep pb ON pb.vec_id = y.vec_id
         |WHERE round(list_dot_product(pa.e, pb.e) / (pa.nrm * pb.nrm) + 0.00000025, 4) >= $SemThreshold""".stripMargin) { (s, dir) =>
      val (prep, cents) = quantizer(s, dir)
      // eager localCheckpoint, NOT cache (r16 ADVICE): subSplit reads
      // assigned twice (cell counts + the join) and withE fans it into
      // both self-join sides — un-materialized, the centroid training and
      // broadcast assignment rerun per consumer, real money at the 100x
      // tier this query exists for. A cache() here would pin storage the
      // lazily-returned result obligates the CALLER to release (the exact
      // leak SmallResult/FunnelStages.close() removed elsewhere); the
      // checkpoint leaf is GC-managed once unreferenced, so composing
      // this query leaves no pins (CacheLifetimeSpec covers it).
      val assigned = Ivf.assignBroadcast(s, prep, cents).localCheckpoint()
      val withE = subSplit(assigned).join(prep, "vec_id")
      val a = withE.select(col("cid").as("acid"), col("sub").as("asub"),
        col("vec_id").as("a"), col("e").as("ae"), col("nrm").as("an"))
      val b = withE.select(col("cid").as("bcid"), col("sub").as("bsub"),
        col("vec_id").as("b"), col("e").as("be"), col("nrm").as("bn"))
      a.join(b,
          col("acid") === col("bcid") && col("asub") === col("bsub") &&
            col("a") < col("b"))
        .withColumn("cos", graft.operators.Num.r4(
          Similarity.cosine(col("ae"), col("be"), col("an"), col("bn"))))
        .filter(col("cos") >= SemThreshold)
        .select(col("a"), col("b"), col("cos"))
    },

    // Cluster-balanced diversity sampling (the DataComp/DoReMi-shaped
    // "sample across embedding clusters, not uniformly" pass): per-cell
    // budgets follow the same sqrt-damped multiply-then-integer-divide
    // rule as q_epoch_plan (wq = floor(sqrt(n_cell));
    // quota = (total * wq) div (4 * sum(wq)), i.e. a 25%-of-corpus budget
    // apportioned by wq) so dense cells are down-weighted and sparse
    // cells over-represented; membership inside a cell is the salted-hash
    // rank — deterministic, partition-independent, append-stable. Shapes:
    // one groupBy(cell) count, a 1-row broadcast total, a K-sized
    // broadcast quota join, and a per-cell window rank — the window
    // partitions on cell, so at 100 TB no single partition exceeds a
    // cell's population (cells scale with the corpus; oversized cells
    // would be sub-split exactly as in q_semdedup).
    QueryDef(
      "q_cluster_sample",
      s"""WITH ${Ivf.cellsSql(K)},
         |counts AS (
         |  SELECT cell, count(*) AS n_cell FROM assign1 GROUP BY cell),
         |w AS (
         |  SELECT cell, n_cell, CAST(floor(sqrt(n_cell)) AS BIGINT) AS wq FROM counts),
         |tot AS (
         |  SELECT CAST(sum(wq) AS BIGINT) AS tw, CAST(sum(n_cell) AS BIGINT) AS total
         |  FROM w),
         |quota AS (
         |  SELECT cell, n_cell, (t.total * wq) // (4 * t.tw) AS quota
         |  FROM w, tot t)
         |SELECT vec_id, cell, n_cell, quota, rnk, rnk <= quota AS picked FROM (
         |  SELECT a.vec_id, a.cell, q.n_cell, q.quota,
         |         CAST(row_number() OVER (
         |           PARTITION BY a.cell
         |           ORDER BY ${TextOps.hash64Sql(s"concat('$DivSalt', a.vec_id)")} % 1000000,
         |                    a.vec_id) AS INT) AS rnk
         |  FROM assign1 a JOIN quota q ON q.cell = a.cell)""".stripMargin) { (s, dir) =>
      val (prep, cents) = quantizer(s, dir)
      val assigned = Ivf.assignBroadcast(s, prep, cents)
        .select(col("vec_id"), col("cid").as("cell")).localCheckpoint()
      val counts = assigned.groupBy(col("cell"))
        .agg(count(lit(1)).as("n_cell"))
        .withColumn("wq", floor(sqrt(col("n_cell"))).cast("long"))
      val tot = counts.agg(sum(col("wq")).as("tw"), sum(col("n_cell")).as("total"))
      val quota = counts.crossJoin(broadcast(tot))
        .select(col("cell"), col("n_cell"),
          expr("(total * wq) div (4 * tw)").as("quota"))
      assigned.join(broadcast(quota), "cell")
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("cell")).orderBy(
            TextOps.hash64(concat(lit(DivSalt), col("vec_id"))) % 1000000L,
            col("vec_id"))))
        .select(col("vec_id"), col("cell"), col("n_cell"), col("quota"),
          col("rnk"), (col("rnk") <= col("quota")).as("picked"))
    })
}
