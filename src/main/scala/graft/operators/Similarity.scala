package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column.
  *
  * Shapes:
  *  - brute-force cosine: broadcast one side, zip_with/aggregate dot in
  *    whole-stage codegen — the exact baseline, O(n·m) but shuffle-free
  *    when one side is small (the kNN query set, a dedup candidate list).
  *  - hyperplane LSH: 16 deterministic random hyperplanes (md5-derived, so
  *    the oracle replays them) → 16-bit bucket per vector → equality join
  *    on bucket replaces the n² pair space; the 100 TB path.
  *
  * All dots are computed in double (float inputs upcast exactly), folded
  * left-to-right by `aggregate`, matching DuckDB's list_dot_product on
  * DOUBLE[] to within ulps (absorbed by Num.r4's bias).
  */
object Similarity {

  val NumPlanes = 16
  val Dim = 64

  /** embedding column cast to array<double>. */
  def asDouble(c: Column): Column = c.cast("array<double>")

  /** Native codegen'd dot (graft.functions.ArrayMath) — same left-to-right
    * double fold as the HOF `aggregate(zip_with(...))` formulation and
    * DuckDB's list_dot_product, ~10x faster than the interpreted lambdas.
    */
  def dot(a: Column, b: Column): Column = graft.functions.ArrayMath.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** (vec_id, e: array<double>, nrm) — the normalized working set. */
  def prepared(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
        asDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))

  /** Deterministic hyperplane weights: w(p, d) in [-1, 1] derived from
    * md5("hp<p>_<d>") — reproducible in any engine, no RNG state.
    */
  def planes(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.range(NumPlanes).toDF("p")
      .select(col("p").cast("int").as("p"),
        transform(sequence(lit(0), lit(Dim - 1)),
          d => (TextOps.hash64(concat(lit("hp"), col("p"), lit("_"), d)) % 2001 - 1000) / 1000.0)
          .as("w"))

  def planesSql: String =
    s"""planes AS (
       |  SELECT CAST(p AS INT) AS p,
       |         list_transform(range(0, $Dim),
       |           d -> (${TextOps.hash64Sql("concat('hp', p, '_', d)")} % 2001 - 1000) / 1000.0) AS w
       |  FROM (SELECT unnest(range($NumPlanes)) AS p))""".stripMargin

  /** (vec_id, bucket): 16-bit sign bucket from the hyperplane dots. The
    * planes side is 16 rows — broadcast; one groupBy on vec_id.
    */
  def lshBuckets(prep: DataFrame, planesDf: DataFrame): DataFrame =
    prep.crossJoin(broadcast(planesDf))
      .select(col("vec_id"), col("p"),
        when(dot(col("e"), col("w")) >= 0, expr("shiftleft(CAST(1 AS BIGINT), p)")).otherwise(0L).as("bit"))
      .groupBy(col("vec_id")).agg(sum(col("bit")).as("bucket"))

  /** Brute-force cosine pairs (a < b, cos >= threshold) as a broadcast +
    * mapPartitions kernel: the small side (bounded by construction — a
    * query set, a dedup candidate block) is collected sorted and broadcast;
    * each partition streams its rows against it in a tight primitive loop.
    * The dot accumulates left-to-right in double, exactly like the
    * declarative zip_with/aggregate fold (and DuckDB's list_dot_product),
    * so results are bit-identical to the oracle. ~100x faster than the
    * interpreted HOF fold on the pair space.
    */
  /** Hard cap on the collected side: ~1M x 64-dim doubles ~ 0.5 GB on the
    * driver. Beyond that, brute force is the wrong tool — use lshBuckets.
    */
  val MaxBroadcastVectors = 1000000

  /** Exact top-k neighbors for EVERY row of `prep` against the broadcast
    * corpus `corpus` (leave-one-out: a row never matches itself), ranked
    * by (rounded cosine desc, neighbor id asc) — the same total order the
    * declarative window-rank path uses, but computed partition-locally
    * with a bounded selection, so there is NO pair-space shuffle (the
    * window formulation shuffles |queries|x|corpus| rows). Output:
    * (q, rank, b, cosr). At 100 TB the corpus side comes from IVF probing
    * instead of a full broadcast.
    *
    * NOTE: the size guard's count and the subsequent collect evaluate the
    * `corpus` plan twice (the guard is deliberately column-pruned so an
    * oversized corpus fails before shipping vectors). Callers with an
    * expensive upstream should cache/checkpoint `corpus` first; the same
    * applies to `bruteForcePairs`.
    */
  def knnTopK(spark: org.apache.spark.sql.SparkSession,
              prep: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    // size-guard with a column-pruned count BEFORE collecting: an oversized
    // corpus must fail without first shipping ~0.5 GB of vectors to the
    // driver (limit(N+1)+collect materializes the vectors just to count them)
    val n = corpus.select(col("vec_id")).count()
    require(n <= MaxBroadcastVectors,
      s"knnTopK corpus has $n vectors > $MaxBroadcastVectors; use IVF probing")
    val collected = corpus.select(col("vec_id"), col("e"), col("nrm"))
      .as[(Long, Seq[Double], Double)]
      .collect()
    val side: Array[(Long, Array[Double], Double)] =
      collected.sortBy(_._1).map { case (id, e, n) => (id, e.toArray, n) }
    val bc = spark.sparkContext.broadcast(side)
    prep.select(col("vec_id"), col("e"), col("nrm"))
      .as[(Long, Seq[Double], Double)]
      .mapPartitions { it =>
        val all = bc.value
        // r4(x) <= x + 5e-5 + Eps (+ ulps): a raw cosine more than this
        // margin below the kth ROUNDED cosine cannot displace it, so the
        // expensive BigDecimal rounding runs only for candidates near or
        // above the current cut — the ranking is bit-identical
        it.flatMap { case (qid, qe0, qn) =>
          val qe = qe0.toArray
          // selection of top-k under (cosr desc, b asc): candidates arrive
          // in ascending b, so on equal cosr the earlier (smaller) b wins
          val top = new java.util.ArrayList[(Double, Long)](k + 1)
          all.foreach { case (bid, be, bn) =>
            if (bid != qid) offer(top, k, qid, qe, qn, bid, be, bn)
          }
          (0 until top.size).map { r =>
            val (cosr, bid) = top.get(r)
            (qid, r + 1, bid, cosr)
          }
        }
      }
      .toDF("q", "rank", "b", "cosr")
  }

  /** r4(x) <= x + 5e-5 + Eps (+ ulps): a raw cosine more than this margin
    * below the kth ROUNDED cosine cannot displace it, so the expensive
    * BigDecimal rounding runs only for candidates near or above the
    * current cut — the ranking stays bit-identical to the rounded order.
    */
  private val RoundMargin = 5.1e-5

  /** One candidate step of the top-k selection under (cosr desc, b asc):
    * computes the raw cosine in a primitive loop and inserts into `top`
    * only if the rounded value can place. Candidates MUST be offered in
    * ascending b so ties keep the earlier id. Shared by `knnTopK` and
    * `knnTopKDiffLabel` so the ranking contract lives in one place.
    */
  private def offer(top: java.util.ArrayList[(Double, Long)], k: Int,
                    qid: Long, qe: Array[Double], qn: Double,
                    bid: Long, be: Array[Double], bn: Double): Unit = {
    var s = 0.0
    var i = 0
    while (i < qe.length) { s += qe(i) * be(i); i += 1 }
    val raw = s / (qn * bn)
    // keep bad data LOUD: a zero-norm embedding used to surface as
    // BigDecimal's NaN exception; the prefilter must not turn it into
    // silently-missing neighbors
    if (java.lang.Double.isNaN(raw))
      throw new IllegalArgumentException(
        s"NaN cosine between vec $qid and $bid — zero-norm embedding?")
    val kth =
      if (top.size == k) top.get(k - 1)._1 else Double.NegativeInfinity
    if (raw + RoundMargin >= kth) {
      val cosr = Num.r4Jvm(raw)
      if (top.size < k || cosr > top.get(top.size - 1)._1) {
        var pos = top.size
        while (pos > 0 && cosr > top.get(pos - 1)._1) pos -= 1
        top.add(pos, (cosr, bid))
        if (top.size > k) top.remove(k)
      }
    }
  }

  /** Hard-negative selection kernel: exact top-k among corpus vectors
    * whose LABEL DIFFERS from the query's — the same broadcast +
    * partition-local bounded selection as `knnTopK` (no pair-space
    * shuffle; the window-rank formulation this replaces shuffled
    * |queries| × |corpus| rows). Label contract mirrors the SQL
    * `lb.label != la.label` predicate under ternary logic: a NULL-label
    * query emits no rows, a NULL-label corpus vector is never a
    * candidate. Input relations carry (vec_id, e, nrm, label); output
    * (q, q_label, rank, b, b_label, cosr).
    */
  def knnTopKDiffLabel(spark: org.apache.spark.sql.SparkSession,
                       prep: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val n = corpus.select(col("vec_id")).count()
    require(n <= MaxBroadcastVectors,
      s"knnTopKDiffLabel corpus has $n vectors > $MaxBroadcastVectors; use IVF probing")
    val collected = corpus
      .select(col("vec_id"), col("e"), col("nrm"), col("label"))
      .as[(Long, Seq[Double], Double, Option[Int])]
      .collect()
    val side: Array[(Long, Array[Double], Double, Option[Int])] =
      collected.sortBy(_._1).map { case (id, e, nn, l) => (id, e.toArray, nn, l) }
    val bc = spark.sparkContext.broadcast(side)
    prep.select(col("vec_id"), col("e"), col("nrm"), col("label"))
      .as[(Long, Seq[Double], Double, Option[Int])]
      .mapPartitions { it =>
        val all = bc.value
        val labelOf = all.collect { case (id, _, _, Some(l)) => id -> l }.toMap
        it.flatMap {
          case (_, _, _, None) => Iterator.empty // NULL != x is never true
          case (qid, qe0, qn, Some(ql)) =>
            val qe = qe0.toArray
            val top = new java.util.ArrayList[(Double, Long)](k + 1)
            all.foreach { case (bid, be, bn, bl) =>
              if (bid != qid && bl.exists(_ != ql))
                offer(top, k, qid, qe, qn, bid, be, bn)
            }
            (0 until top.size).iterator.map { r =>
              val (cosr, bid) = top.get(r)
              (qid, ql, r + 1, bid, labelOf(bid), cosr)
            }
        }
      }
      .toDF("q", "q_label", "rank", "b", "b_label", "cosr")
  }

  def bruteForcePairs(spark: org.apache.spark.sql.SparkSession,
                      prep: DataFrame, threshold: Double): DataFrame = {
    import spark.implicits._
    // same pre-collect guard as knnTopK: the count is column-pruned to
    // vec_id, so overflow is detected before any vector reaches the driver
    val n = prep.select(col("vec_id")).count()
    require(n <= MaxBroadcastVectors,
      s"bruteForcePairs input has $n vectors > $MaxBroadcastVectors; " +
        "use lshBuckets + bucket-join for corpora this large")
    val collected = prep.select(col("vec_id"), col("e"), col("nrm"))
      .as[(Long, Seq[Double], Double)]
      .collect()
    val side: Array[(Long, Array[Double], Double)] =
      collected.sortBy(_._1).map { case (id, e, n) => (id, e.toArray, n) }
    val bc = spark.sparkContext.broadcast(side)
    prep.select(col("vec_id"), col("e"), col("nrm"))
      .as[(Long, Seq[Double], Double)]
      .mapPartitions { it =>
        val all = bc.value
        it.flatMap { case (aid, ae0, an) =>
          val ae = ae0.toArray
          // the broadcast side is id-sorted, so the b > a half is a
          // SUFFIX: binary-search its start instead of running an
          // iterator filter over every entry, and enumerate it with a
          // plain loop — the filter/flatMap closure chain cost more per
          // candidate than the 64-FMA dot it guarded (r19; same cosine,
          // same left-to-right double fold)
          var lo = 0
          var hi = all.length
          while (lo < hi) {
            val m = (lo + hi) >>> 1
            if (all(m)._1 <= aid) lo = m + 1 else hi = m
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          val dim = ae.length
          var j = lo
          while (j < all.length) {
            val b = all(j)
            val be = b._2
            var s = 0.0
            var i = 0
            while (i < dim) { s += ae(i) * be(i); i += 1 }
            val cos = s / (an * b._3)
            if (cos >= threshold) out += ((aid, b._1, cos))
            j += 1
          }
          out.iterator
        }
      }
      .toDF("a", "b", "cosv")
  }
}
