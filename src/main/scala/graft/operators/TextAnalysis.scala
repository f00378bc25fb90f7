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
    }),

    // BM25 top-k retrieval (Robertson/Sparck-Jones, the Okapi formula —
    // public IR literature; k1=1.2, b=0.75). 100 TB shape: the query's
    // terms are CONSTANT, so per-doc tf is a fixed set of codegen'd
    // array-filter columns (no explode, no per-token shuffle); corpus
    // stats (N, avgdl) and per-term document frequencies are one
    // aggregation each, broadcast back as a single row. Linear scan +
    // two tiny aggs at any corpus size.
    "t7_bm25_topk" -> ((s, dir) => {
      // constants written as the SAME decimal literals as the oracle SQL
      // (computing k1+1 in Scala can land one ulp off DuckDB's `2.2`)
      val (k1, k1p1, oneMinusB, b) = (1.2, 2.2, 0.25, 0.75)
      val terms = Seq("hash", "merge", "window")
      val toks = filter(split(lower(col("text")), "[^a-z0-9]+"),
        t => length(t) > 0)
      // tf_i = |toks| − |array_remove(toks, t)| — identical integer counts
      // to the array-filter form, but array_remove is a codegen collection
      // expression while filter() is a higher-order function evaluated
      // interpreted per token per term (r16, guide §4.1). localCheckpoint:
      // the tf relation feeds BOTH the corpus-stats agg and the scoring
      // scan — without it the tokenize ran twice per query.
      val tf = T(s, dir, "documents")
        .select(col("doc_id") +: size(toks).as("dl") +:
          terms.zipWithIndex.map { case (t, i) =>
            (size(toks) - size(array_remove(toks, t))).as(s"tf$i") }: _*)
        .localCheckpoint()
      val stats = tf.agg(
        count(lit(1)).cast("double").as("n"),
        (avg(col("dl")).as("avgdl") +:
          terms.indices.map(i =>
            sum((col(s"tf$i") > 0).cast("long")).cast("double").as(s"df$i"))): _*)
      val scored = tf.crossJoin(broadcast(stats))
      val score = terms.indices.map { i =>
        val idf = log(lit(1.0) +
          (col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5))
        idf * (col(s"tf$i") * k1p1) /
          (col(s"tf$i") + lit(k1) * (lit(oneMinusB) + lit(b) * col("dl") / col("avgdl")))
      }.reduce(_ + _)
      scored.select(col("doc_id"), round(score + 1e-9, 6).as("score"))
        .filter(col("score") > 0)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
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
        |FROM lex GROUP BY source ORDER BY source""".stripMargin,
    // identical tokenization, tf, stats, and Okapi formula; the 1e-9 nudge
    // keeps cross-engine libm 1-ulp noise off the round-6 boundary
    "t7_bm25_topk" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, len(toks) AS dl,
        |    len(list_filter(toks, x -> x = 'hash'))   AS tf0,
        |    len(list_filter(toks, x -> x = 'merge'))  AS tf1,
        |    len(list_filter(toks, x -> x = 'window')) AS tf2
        |  FROM tk),
        |st AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
        |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
        |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
        |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
        |  FROM tf)
        |SELECT doc_id, round(
        |    ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |  + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |  + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |  + 1e-9, 6) AS score
        |FROM tf, st
        |WHERE round(
        |    ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |  + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |  + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |  + 1e-9, 6) > 0
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
  )
}
