package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE merge induction (Sennrich et al. 2016) — tokenizer training as a
  * query. Classic BPE trains on the weighted word DICTIONARY, not the
  * corpus: the only full-scan stage is the word-count groupBy; every
  * merge round after that operates on vocab-sized data (here 31 rows) no
  * matter how big the corpus is — the 100 TB cost profile is one
  * aggregation plus R dictionary-local rounds.
  *
  * Each round is fully declarative and oracle-replayable, like the Lloyd
  * iterations in Ivf/Pq: count adjacent symbol pairs weighted by word
  * frequency, pick the argmax under (count desc, left asc, right asc),
  * and apply the merge with a plain left-to-right non-overlapping string
  * replace over the spaced symbol encoding (' j o i n ' → ' j oi n '),
  * whose greedy semantics match BPE's and are identical in both engines.
  * The best-pair table is one row per round and broadcasts; no driver
  * loop, no collect — the winner feeds the next round as a cross-joined
  * literal column.
  */
object Bpe {

  val Rounds = 6

  /** (word, s, cnt): the weighted dictionary with the spaced symbol
    * encoding, e.g. ("join", " j o i n ", 964). The single corpus-scan
    * stage.
    */
  def dictionary(documents: DataFrame): DataFrame =
    documents
      .select(explode(TextOps.words(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("word"),
        concat(regexp_replace(col("word"), "(.)", " $1"), lit(" ")).as("s"),
        col("cnt"))

  /** Weighted adjacent-pair counts over the current segmentation:
    * (l, r, cnt). Vocab-sized input, pair-count-sized output.
    */
  def pairCounts(dict: DataFrame): DataFrame =
    dict
      .select(col("cnt"), split(trim(col("s")), " ").as("syms"))
      // single-symbol words have no pairs; also keeps sequence() ascending
      // (Spark's sequence(1, 0) counts DOWN, unlike DuckDB's empty range)
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(syms) - 1)," +
          " i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"))
        .as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("cnt"))

  /** The round's winning pair under (cnt desc, l asc, r asc) — one row. */
  def bestPair(pairs: DataFrame): DataFrame =
    pairs.orderBy(col("cnt").desc, col("l"), col("r")).limit(1)

  /** Apply a merge: left-to-right replace of ' l r ' with ' lr ', applied
    * TWICE. One pass under-merges chains: the match consumes the space
    * that is also the next occurrence's leading delimiter, so in
    * 'l r l r' only the first pair merges ([lr, l, r] instead of BPE's
    * [lr, lr]). A skipped occurrence is never adjacent to another skip
    * (its own leading space survives), so the second pass reaches the
    * fixpoint — which for l ≠ r is EXACTLY BPE's greedy pairing
    * (occurrences cannot overlap). For l == r runs the pair COUNT matches
    * greedy but odd runs ≥ 5 place the unpaired symbol mid-run
    * ('a a a a a' → [aa, a, aa]) where Sennrich's scan leaves it last
    * ([aa, aa, a]) — a documented positional deviation, identical in both
    * engines. A round with no pairs left (exhausted vocab) has an EMPTY
    * best table; the left join + coalesce makes that round a no-op
    * instead of annihilating the dictionary through a cross join.
    */
  def applyMerge(dict: DataFrame, best: DataFrame): DataFrame =
    dict.join(broadcast(best.select(col("l").as("bl"), col("r").as("br"))),
        lit(true), "left")
      .select(col("word"),
        coalesce(
          expr("replace(replace(s, concat(' ', bl, ' ', br, ' '), concat(' ', bl, br, ' '))," +
            " concat(' ', bl, ' ', br, ' '), concat(' ', bl, br, ' '))"),
          col("s")).as("s"),
        col("cnt"))

  /** Run `Rounds` merge rounds. Returns (merges, finalDict):
    * merges = (merge_round, left_sym, right_sym, merged, cnt), one row
    * per round; finalDict = (word, s, cnt) after all merges.
    */
  def train(documents: DataFrame): (DataFrame, DataFrame) = {
    val d0 = dictionary(documents).cache()
    val (merges, dFinal) = (1 to Rounds).foldLeft(
      (Seq.empty[DataFrame], d0)) { case ((acc, d), r) =>
      val best = bestPair(pairCounts(d)).cache()
      val row = best.select(lit(r).as("merge_round"),
        col("l").as("left_sym"), col("r").as("right_sym"),
        concat(col("l"), col("r")).as("merged"), col("cnt"))
      (acc :+ row, applyMerge(d, best))
    }
    (merges.reduce(_ unionAll _), dFinal)
  }

  // ------------------------------------------------------------ oracle SQL

  /** CTE chain bd0 → (bp_r → bb_r → bd_r)×Rounds, mirroring train(). */
  def trainSql: String = {
    val head =
      s"""bd0 AS (
         |  SELECT word, regexp_replace(word, '(.)', ' \\1', 'g') || ' ' AS s,
         |         CAST(count(*) AS BIGINT) AS cnt
         |  FROM (
         |    SELECT unnest(${TextOps.wordsSql("text")}) AS word FROM documents)
         |  WHERE word != ''
         |  GROUP BY word)""".stripMargin
    val steps = (1 to Rounds).map { r =>
      s"""bp$r AS (
         |  SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(cnt) AS BIGINT) AS cnt
         |  FROM (
         |    SELECT syms, cnt, unnest(range(1, len(syms))) AS i
         |    FROM (SELECT string_split(trim(s), ' ') AS syms, cnt FROM bd${r - 1}))
         |  GROUP BY 1, 2),
         |bb$r AS (
         |  SELECT l, r, cnt FROM bp$r ORDER BY cnt DESC, l, r LIMIT 1),
         |bd$r AS (
         |  SELECT d.word,
         |         coalesce(replace(replace(d.s, ' ' || b.l || ' ' || b.r || ' ', ' ' || b.l || b.r || ' '), ' ' || b.l || ' ' || b.r || ' ', ' ' || b.l || b.r || ' '), d.s) AS s,
         |         d.cnt
         |  FROM bd${r - 1} d LEFT JOIN bb$r b ON true)""".stripMargin
    }
    val merges =
      s"""bmerges AS (
         |${(1 to Rounds).map(r =>
        s"  SELECT $r AS merge_round, l AS left_sym, r AS right_sym, l || r AS merged, cnt FROM bb$r")
        .mkString("\n  UNION ALL\n")})""".stripMargin
    (Seq(head) ++ steps :+ merges).mkString(",\n")
  }
}
