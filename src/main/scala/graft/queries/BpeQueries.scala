package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE tokenizer-training surface (operators/Bpe.scala): the learned
  * merge table and the segmentation it induces on the dictionary.
  */
object BpeQueries {

  val defs: Seq[QueryDef] = Seq(

    // The merge table IS the tokenizer model — one row per round.
    QueryDef(
      "q_bpe_merges",
      s"""WITH ${Bpe.trainSql}
         |SELECT merge_round, left_sym, right_sym, merged, cnt
         |FROM bmerges""".stripMargin) { (s, dir) =>
      Bpe.train(Tables.documents(s, dir))._1
    },

    // The dictionary after all merges: how each word segments under the
    // learned model, with its corpus frequency.
    QueryDef(
      "q_bpe_vocab",
      s"""WITH ${Bpe.trainSql}
         |SELECT word, trim(s) AS symbols,
         |       CAST(len(string_split(trim(s), ' ')) AS INT) AS n_syms, cnt
         |FROM bd${Bpe.Rounds}""".stripMargin) { (s, dir) =>
      Bpe.train(Tables.documents(s, dir))._2
        .select(col("word"), trim(col("s")).as("symbols"),
          size(split(trim(col("s")), " ")).as("n_syms"), col("cnt"))
    })
}
