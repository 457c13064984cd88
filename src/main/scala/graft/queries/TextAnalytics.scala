package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Num, TextOps}
import org.apache.spark.sql.functions._

/** Text-analysis operators for an LLM-training-data pipeline, over the
  * `documents` table: language ID (keyword-profile scoring), quality
  * scoring, token counting (whitespace + BPE-ish regex), and winnowing
  * document fingerprints. All are single-pass, shuffle-free (or one
  * groupBy) column programs — at 100 TB each is a map-only scan except the
  * fingerprint distinct, which shuffles on (doc_id, fp).
  */
object TextAnalytics {

  /** Keyword profiles for the n-gram-heuristic language scorer. The corpus
    * is synthetic domain text, so profiles are built from its vocabulary;
    * the mechanism (per-language token-set overlap, argmax with a fixed
    * tie order) is the real lang-id shape.
    */
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "table", "scan"),
    "es" -> Seq("row", "data", "small", "value"),
    "zh" -> Seq("window", "merge", "batch", "spark"),
    "fr" -> Seq("join", "query", "sort", "filter"))

  private def inList(w: String, vocab: Seq[String]): String =
    vocab.map(v => s"'$v'").mkString(s"$w IN (", ", ", ")")

  val defs: Seq[QueryDef] = Seq(

    // Language ID: score = #words in each language profile; argmax with
    // deterministic tie order (en > es > zh > fr).
    QueryDef(
      "q_lang_id", {
        val scores = profiles.map { case (lang, vocab) =>
          s"len(list_filter(ws, w -> ${inList("w", vocab)})) AS s_$lang"
        }.mkString(",\n        |                ")
        s"""WITH t AS (SELECT doc_id, lang AS lang_actual,
           |                ${TextOps.wordsSql("text")} AS ws FROM documents),
           |s AS (SELECT doc_id, lang_actual,
           |                $scores FROM t)
           |SELECT doc_id, lang_actual,
           |       CASE WHEN s_en >= s_es AND s_en >= s_zh AND s_en >= s_fr THEN 'en'
           |            WHEN s_es >= s_zh AND s_es >= s_fr THEN 'es'
           |            WHEN s_zh >= s_fr THEN 'zh'
           |            ELSE 'fr' END AS lang_pred,
           |       s_en, s_es, s_zh, s_fr
           |FROM s""".stripMargin
      }) { (s, dir) =>
      val ws = TextOps.words(col("text"))
      val withScores = profiles.foldLeft(
        Tables.documents(s, dir).select(
          col("doc_id"), col("lang").as("lang_actual"), ws.as("ws"))) {
        case (df, (lang, vocab)) =>
          df.withColumn(s"s_$lang",
            size(filter(col("ws"), w => vocab.foldLeft(lit(false))((acc, v) => acc || (w === v)))))
      }
      withScores
        .withColumn("lang_pred",
          when(col("s_en") >= col("s_es") && col("s_en") >= col("s_zh") && col("s_en") >= col("s_fr"), "en")
            .when(col("s_es") >= col("s_zh") && col("s_es") >= col("s_fr"), "es")
            .when(col("s_zh") >= col("s_fr"), "zh")
            .otherwise("fr"))
        .select("doc_id", "lang_actual", "lang_pred", "s_en", "s_es", "s_zh", "s_fr")
    },

    // Quality scoring: length/punctuation/stopword/word-shape signals
    // combined into one score — the standard pre-training filter shape.
    QueryDef(
      "q_text_quality",
      s"""WITH t AS (
         |  SELECT doc_id,
         |         length(text) AS n_chars2,
         |         len(${TextOps.wordsSql("text")}) AS n_words,
         |         len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
         |         len(list_filter(${TextOps.wordsSql("text")},
         |             w -> w IN ('the', 'a', 'of', 'and', 'data', 'value'))) AS n_stop
         |  FROM documents)
         |SELECT doc_id, n_words,
         |       round((n_chars2 * 1.0) / n_words + 0.00000025, 4) AS avg_word_len,
         |       round((n_punct * 1.0) / n_chars2 + 0.00000025, 4) AS punct_ratio,
         |       round((n_stop * 1.0) / n_words + 0.00000025, 4) AS stop_ratio,
         |       round(0.4 * least(n_words / 50.0, 1.0)
         |           + 0.3 * ((n_stop * 1.0) / n_words)
         |           + 0.3 * (1.0 - (n_punct * 1.0) / n_chars2) + 0.00000025, 4) AS quality
         |FROM t""".stripMargin) { (s, dir) =>
      val stop = Seq("the", "a", "of", "and", "data", "value")
      Tables.documents(s, dir)
        .select(col("doc_id"),
          length(col("text")).as("n_chars2"),
          size(TextOps.words(col("text"))).as("n_words"),
          size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0))).as("n_punct"),
          size(filter(TextOps.words(col("text")),
            w => stop.foldLeft(lit(false))((acc, v) => acc || (w === v)))).as("n_stop"))
        .select(col("doc_id"), col("n_words"),
          Num.r4(col("n_chars2") * 1.0 / col("n_words")).as("avg_word_len"),
          Num.r4(col("n_punct") * 1.0 / col("n_chars2")).as("punct_ratio"),
          Num.r4(col("n_stop") * 1.0 / col("n_words")).as("stop_ratio"),
          Num.r4(lit(0.4) * least(col("n_words") / 50.0, lit(1.0))
            + lit(0.3) * (col("n_stop") * 1.0 / col("n_words"))
            + lit(0.3) * (lit(1.0) - col("n_punct") * 1.0 / col("n_chars2"))).as("quality"))
    },

    // Token counting: whitespace tokens + BPE-ish regex tokens + chars per
    // token — the budget arithmetic of a training-data pipeline.
    QueryDef(
      "q_token_count",
      s"""SELECT doc_id,
         |       len(${TextOps.wordsSql("text")}) AS ws_tokens,
         |       len(regexp_extract_all(text, '${TextOps.TokenPattern}')) AS bpe_tokens,
         |       round(length(text) * 1.0 /
         |             len(regexp_extract_all(text, '${TextOps.TokenPattern}')) + 0.00000025, 4)
         |         AS chars_per_token
         |FROM documents""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(TextOps.words(col("text"))).as("ws_tokens"),
          size(regexp_extract_all(col("text"), lit(TextOps.TokenPattern), lit(0))).as("bpe_tokens"),
          length(col("text")).as("n"))
        .select(col("doc_id"), col("ws_tokens"), col("bpe_tokens"),
          Num.r4(col("n") * 1.0 / col("bpe_tokens")).as("chars_per_token"))
    },

    // Winnowing fingerprints (rolling hash): char 8-gram hashes, min per
    // 16-gram window, distinct — the MOSS/content-defined-chunking
    // primitive for plagiarism/near-dup detection.
    QueryDef(
      "q_doc_fingerprint",
      s"""WITH g AS (
         |  SELECT doc_id,
         |         unnest(range(1, greatest(length(text) - 7, 1) + 1)) AS pos,
         |         text
         |  FROM documents),
         |h AS (
         |  SELECT doc_id, pos,
         |         ${TextOps.hash64Sql("substr(text, CAST(pos AS INT), 8)")} AS kh
         |  FROM g),
         |w AS (
         |  SELECT doc_id,
         |         min(kh) OVER (PARTITION BY doc_id ORDER BY pos
         |                       ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS fp
         |  FROM h)
         |SELECT DISTINCT doc_id, fp FROM w""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // explode a plain int sequence, then slice/hash in a codegen'd
      // projection — keeps the string work out of interpreted HOF lambdas
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1), greatest(length(col("text")) - 7, lit(1)))).as("pos"))
        .select(col("doc_id"), col("pos"),
          TextOps.hash64(col("text").substr(col("pos"), lit(8))).as("kh"))
        .select(col("doc_id"),
          min(col("kh")).over(
            Window.partitionBy(col("doc_id")).orderBy(col("pos"))
              .rowsBetween(-15, 0)).as("fp"))
        .distinct()
    })
}
