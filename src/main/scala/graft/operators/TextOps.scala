package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Text-analysis operators for training-data pipelines over `documents`:
 * token counting, quality scoring, language-ID heuristic, and document
 * fingerprinting. Everything is built-in-function pipelines (codegen'd,
 * shuffle-free per-row transforms); only the aggregations shuffle.
 */
object TextOps {

  private val stopwords = Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")

  /** Whitespace + BPE-ish subword token counts. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).cast("bigint").as("n_chars_computed"),
        size(split(col("text"), " ")).cast("bigint").as("ws_tokens"),
        // BPE-ish: alpha runs, digit runs, single punctuation marks
        size(expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0)"))
          .cast("bigint").as("bpe_tokens"))
      .orderBy(col("doc_id"))

  /** Length / punctuation / stopword-ratio quality features. */
  def qualityScores(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("words", split(lower(col("text")), " "))
      .select(
        col("doc_id"),
        size(col("words")).cast("bigint").as("n_words"),
        // mean word length: exact integer sums, one double division
        (expr("aggregate(words, 0L, (acc, w) -> acc + length(w))").cast("double") /
          size(col("words"))).as("mean_word_len"),
        (size(expr(s"filter(words, w -> w IN (${stopwords.map("'" + _ + "'").mkString(",")}))"))
          .cast("double") / size(col("words"))).as("stopword_ratio"),
        (length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", "")).cast("double") /
          length(col("text"))).as("punct_ratio"))
      .orderBy(col("doc_id"))

  /**
   * N-gram language-ID heuristic: score each candidate language by
   * stopword/character evidence, emit the argmax. (The corpus text is
   * synthetic, so this exercises the operator shape, not linguistics.)
   */
  def languageId(spark: SparkSession, dir: String): DataFrame = {
    val profiles = Map(
      "en" -> Seq("the", "a", "is", "and", "of"),
      "es" -> Seq("el", "la", "de", "que", "y"),
      "de" -> Seq("der", "die", "und", "das", "ist"),
      "fr" -> Seq("le", "la", "les", "et", "de"))
    val d = Tables.documents(spark, dir)
      .withColumn("words", split(lower(col("text")), " "))
    val scored = profiles.foldLeft(d) { case (df, (lang, sw)) =>
      df.withColumn(s"score_$lang",
        size(expr(s"filter(words, w -> w IN (${sw.map("'" + _ + "'").mkString(",")}))")))
    }
    val scoreCols = profiles.keys.toSeq.sorted
    scored
      .withColumn("best", expr(
        s"""array_max(transform(array(${scoreCols.map(l => s"struct(score_$l AS s, '$l' AS l)").mkString(",")}),
           |  x -> struct(x.s AS s, x.l AS l)))""".stripMargin))
      .select(col("doc_id"),
        when(col("best.s") > 0, col("best.l")).otherwise(lit("und")).as("pred_lang"),
        col("lang").as("labeled_lang"))
      .orderBy(col("doc_id"))
  }

  /** MD5 fingerprint of punctuation/case-normalized text (the
    * engine-portable digest; xxhash64 variants live in Dedup). */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("norm", regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""))
      .select(
        col("doc_id"),
        md5(col("norm")).as("content_md5"))
      .orderBy(col("doc_id"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "t01_token_counts",
      tokenStats,
      """SELECT doc_id,
        |  CAST(LENGTH(text) AS BIGINT) AS n_chars_computed,
        |  CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    ),
    QueryDef.sql(
      "t02_quality_scores",
      qualityScores,
      s"""SELECT doc_id,
         |  CAST(LEN(STRING_SPLIT(LOWER(text), ' ')) AS BIGINT) AS n_words,
         |  CAST(LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(LOWER(text), ' '), w -> LENGTH(w))) AS DOUBLE)
         |    / LEN(STRING_SPLIT(LOWER(text), ' ')) AS mean_word_len,
         |  CAST(LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
         |    w -> w IN (${stopwords.map("'" + _ + "'").mkString(",")}))) AS DOUBLE)
         |    / LEN(STRING_SPLIT(LOWER(text), ' ')) AS stopword_ratio,
         |  CAST(LENGTH(REGEXP_REPLACE(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
         |    / LENGTH(text) AS punct_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,
    ),
    // Oracle replicates the stopword-profile argmax exactly, including
    // the tie-break (max score, then lexicographically largest language
    // — struct comparison field order in both engines).
    QueryDef.sql(
      "t03_language_id",
      languageId,
      """WITH s AS (
        |  SELECT doc_id, lang, string_split(lower(text),' ') AS words FROM documents
        |), best AS (
        |  SELECT doc_id, lang,
        |    list_aggregate([
        |      {'s': len(list_filter(words, w -> w IN ('der','die','und','das','ist'))), 'l': 'de'},
        |      {'s': len(list_filter(words, w -> w IN ('the','a','is','and','of'))), 'l': 'en'},
        |      {'s': len(list_filter(words, w -> w IN ('el','la','de','que','y'))), 'l': 'es'},
        |      {'s': len(list_filter(words, w -> w IN ('le','la','les','et','de'))), 'l': 'fr'}
        |    ], 'max') AS b
        |  FROM s
        |)
        |SELECT doc_id,
        |  CASE WHEN b.s > 0 THEN b.l ELSE 'und' END AS pred_lang,
        |  lang AS labeled_lang
        |FROM best ORDER BY doc_id""".stripMargin),
    QueryDef.sql(
      "t04_fingerprints",
      fingerprints,
      """SELECT doc_id,
        |  MD5(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', '', 'g')) AS content_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    )
  )
}
