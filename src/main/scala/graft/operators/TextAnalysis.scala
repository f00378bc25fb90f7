package graft.operators

import graft.Tables.T
import graft.functions.TextFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents`: token counting, quality
  * scoring, fingerprinting, language-ID heuristic. All per-row codegen'd
  * column math + one aggregation — linear at 100 TB.
  */
object TextAnalysis {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // token counting: whitespace + BPE-ish regex tokens, aggregated per source
    "t1_token_count" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("source"),
          size(tokens(col("text"))).as("ws_tokens"),
          size(regexTokens(col("text"))).as("re_tokens"))
        .groupBy(col("source"))
        .agg(sum(col("ws_tokens")).as("total_ws_tokens"),
          sum(col("re_tokens")).as("total_re_tokens"),
          round(avg(col("ws_tokens")), 4).as("avg_ws_tokens"))
        .orderBy(col("source"))
    }),

    // quality scoring: per-doc composite score, then distribution by lang
    "t2_quality_score" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("lang"), qualityScore(col("text")).as("score"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("score")), 4).as("avg_score"),
          round(min(col("score")), 4).as("min_score"),
          round(max(col("score")), 4).as("max_score"))
        .orderBy(col("lang"))
    }),

    // document fingerprinting: md5 of normalized text (exact-dup key)
    "t3_fingerprint" -> ((s, dir) => {
      T(s, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), fingerprintMd5(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // language-ID heuristic: stopword-ratio thresholding. NOTE: the test
    // corpus shares one vocabulary across its `lang` labels, so no
    // content-based classifier can recover them; this exercises the operator
    // shape (deterministic scoring → argmax/threshold) with an honest oracle.
    "t4_lang_id" -> ((s, dir) => {
      T(s, dir, "documents")
        .select(col("doc_id"),
          when(stopwordRatio(col("text")) >= 0.02, lit("en"))
            .otherwise(lit("und")).as("lang_pred"))
        .groupBy(col("lang_pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang_pred"))
    }),

    // char-level stats (length histogram by deciles of n_chars)
    "t5_length_stats" -> ((s, dir) => {
      T(s, dir, "documents")
        .select((floor(col("n_chars") / 100) * 100).cast("long").as("len_bucket"))
        .groupBy(col("len_bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("len_bucket"))
    }),

    // full-text over the corpus: tsvector width per doc + tsquery match
    // count per source (gtype_tsearch totsvector/`@@`; per-row codegen'd
    // array ops + one aggregation — linear at 100 TB)
    "t6_tsvector_stats" -> ((s, dir) => {
      import graft.functions.TsearchFns
      val tsv = TsearchFns.toTsvector(col("text"))
      T(s, dir, "documents")
        .select(col("source"), size(tsv).as("lex_cnt"),
          TsearchFns.tsMatch(tsv, "the & of").cast("int").as("hit"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("lex_cnt")).as("total_lex"),
          round(avg(col("lex_cnt")), 4).as("avg_lex"),
          sum(col("hit")).as("n_match"))
        .orderBy(col("source"))
    })
  )

  private val stopwordList = Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  val oracles: Map[String, String] = Map(
    "t1_token_count" ->
      """SELECT source,
        |  CAST(sum(len(string_split_regex(lower(trim(text)), '\s+'))) AS BIGINT) AS total_ws_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS total_re_tokens,
        |  round(avg(len(string_split_regex(lower(trim(text)), '\s+'))), 4) AS avg_ws_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "t2_quality_score" ->
      s"""WITH scored AS (
         |  SELECT lang,
         |    round(greatest(least(
         |      least(length(text) / 500.0, 1.0) * 0.6 +
         |      (1.0 - abs(
         |        CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |                             w -> list_contains($stopwordList, w))) AS DOUBLE)
         |        / len(string_split_regex(lower(trim(text)), '\\s+')) - 0.15)) * 0.4,
         |      1.0), 0.0), 4) AS score
         |  FROM documents)
         |SELECT lang, count(*) AS n, round(avg(score), 4) AS avg_score,
         |  round(min(score), 4) AS min_score, round(max(score), 4) AS max_score
         |FROM scored GROUP BY lang ORDER BY lang""".stripMargin,
    "t3_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin,
    "t4_lang_id" ->
      s"""SELECT CASE WHEN
         |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |                         w -> list_contains($stopwordList, w))) AS DOUBLE)
         |    / len(string_split_regex(lower(trim(text)), '\\s+')) >= 0.02
         |  THEN 'en' ELSE 'und' END AS lang_pred, count(*) AS n
         |FROM documents GROUP BY 1 ORDER BY lang_pred""".stripMargin,
    "t5_length_stats" ->
      """SELECT CAST(floor(n_chars / 100) * 100 AS BIGINT) AS len_bucket, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY len_bucket""".stripMargin,
    "t6_tsvector_stats" ->
      """WITH lex AS (
        |  SELECT source,
        |    list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                              x -> x <> '')) AS lx
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(lx)) AS BIGINT) AS total_lex,
        |  round(avg(len(lx)), 4) AS avg_lex,
        |  CAST(sum(CASE WHEN list_contains(lx, 'the') AND list_contains(lx, 'of')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_match
        |FROM lex GROUP BY source ORDER BY source""".stripMargin
  )
}
