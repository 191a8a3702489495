package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Deduplication operators for training-data pipelines, over the
 * `documents` table. All are pure DataFrame/HOF pipelines: shingling,
 * MinHash signatures, banding and SimHash run inside whole-stage codegen
 * (no UDFs), and the only shuffles are the band-bucket groupBys and the
 * candidate self-joins — the shape that survives a 100 TB corpus because
 * candidate generation is linear in documents and pair verification is
 * linear in candidates, never all-pairs.
 */
object Dedup {

  /** words + distinct word-3-shingles of each doc. */
  private def shingled(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("words", split(lower(col("text")), " "))
      .filter(size(col("words")) >= 3)
      .withColumn("shingles", expr(
        "array_distinct(transform(sequence(0, size(words)-3), i -> concat_ws(' ', slice(words, i+1, 3))))"))

  /**
   * MinHash (64 perms) + LSH banding (16 bands × 4 rows) candidate pairs,
   * verified with exact shingle-set Jaccard. Threshold 0.5.
   */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = shingled(spark, dir)
      .withColumn("sig", expr(
        "transform(sequence(0, 63), s -> array_min(transform(shingles, sh -> xxhash64(sh, s))))"))
      .select(col("doc_id"), col("sig"), col("shingles"))

    val banded = sig
      .select(col("doc_id"), col("shingles"),
        explode(expr(
          "transform(sequence(0, 15), b -> struct(b AS band, xxhash64(b, slice(sig, b*4+1, 4)) AS bkey))"))
          .as("bb"))
      .select(col("doc_id"), col("shingles"), col("bb.band"), col("bb.bkey"))

    val a = banded.select(col("band"), col("bkey"),
      col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val b = banded.select(col("band"), col("bkey"),
      col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /**
   * 64-bit SimHash over distinct words; near-dup candidates from 4×16-bit
   * band collisions, verified by Hamming distance ≤ 2.
   */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sim = Tables.documents(spark, dir)
      .withColumn("words", expr("array_distinct(split(lower(text), ' '))"))
      .filter(size(col("words")) >= 1)
      .withColumn("bitsums", expr(
        """aggregate(transform(words, w -> xxhash64(w)), array_repeat(0L, 64),
          |  (acc, h) -> zip_with(acc, sequence(0, 63),
          |    (a, j) -> a + (cast(shiftright(h, j) & 1 AS BIGINT) * 2 - 1)))""".stripMargin))
      .withColumn("simhash", expr(
        """aggregate(zip_with(bitsums, sequence(0, 63),
          |  (s, j) -> IF(s > 0, shiftleft(1L, j), 0L)), 0L, (acc, x) -> acc + x)""".stripMargin))
      .select(col("doc_id"), col("simhash"))

    val banded = sim.select(col("doc_id"), col("simhash"),
      explode(expr(
        "transform(sequence(0, 3), b -> struct(b AS band, shiftright(simhash, b*16) & 65535 AS bkey))"))
        .as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.bkey"))

    val a = banded.select(col("band"), col("bkey"),
      col("doc_id").as("doc_a"), col("simhash").as("h_a"))
    val b = banded.select(col("band"), col("bkey"),
      col("doc_id").as("doc_b"), col("simhash").as("h_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", expr("bit_count(h_a ^ h_b)"))
      .filter(col("hamming") <= 2)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /**
   * Exact character-level n-gram (n=3) Jaccard similarity over candidate
   * pairs (same language, similar length) — the SQL-expressible member of
   * the family, oracle-checked against DuckDB.
   */
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        expr(
          "array_distinct(transform(sequence(1, length(text)-2), i -> substring(text, i, 3)))")
          .as("grams"))
    val a = d.select(col("lang"), col("doc_id").as("doc_a"),
      col("n_chars").as("nc_a"), col("grams").as("g_a"))
    val bb = d.select(col("lang"), col("doc_id").as("doc_b"),
      col("n_chars").as("nc_b"), col("grams").as("g_b"))
    a.join(bb, Seq("lang"))
      .filter(col("doc_a") < col("doc_b") &&
        abs(col("nc_a") - col("nc_b")) <= 5 && (col("doc_a") % 5 === 0))
      .withColumn("jaccard",
        size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))))
      .filter(col("jaccard") >= 0.4)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /**
   * Embedding-cosine near-duplicate candidates via random-hyperplane LSH
   * (8 deterministic planes → 256 buckets), then exact cosine on
   * candidates; emits the top-50 most-similar pairs.
   */
  def embeddingNearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val planes = 8
    val sig = Tables.embeddings(spark, dir)
      .withColumn("sig", expr(
        s"""aggregate(zip_with(
           |  transform(sequence(0, ${planes - 1}), p ->
           |    CASE WHEN aggregate(zip_with(embedding, sequence(0, 63),
           |      (x, d) -> cast(x AS DOUBLE) * ((cast(pmod(xxhash64(p, d), 2001) AS DOUBLE) - 1000.0) / 1000.0)),
           |      cast(0.0 AS DOUBLE), (acc, v) -> acc + v) > 0 THEN 1 ELSE 0 END),
           |  sequence(0, ${planes - 1}), (bit, p) -> bit * shiftleft(1, p)),
           |  0, (acc, x) -> acc + x)""".stripMargin))
      .select(col("vec_id"), col("sig"), col("embedding"))

    val a = sig.select(col("sig"), col("vec_id").as("vec_a"), col("embedding").as("e_a"))
    val b = sig.select(col("sig"), col("vec_id").as("vec_b"), col("embedding").as("e_b"))
    a.join(b, Seq("sig"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", Similarity.cosineExpr("e_a", "e_b"))
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
      .limit(50)
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "d01_exact_dedup",
      (spark, dir) =>
        Tables.documents(spark, dir)
          // group on a digest so the shuffle carries 32 bytes per doc,
          // not the document text — the 100 TB-safe exact-dedup shape
          .groupBy(md5(col("text")).as("text_md5"))
          .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("dup_count"))
          .select(col("keep_doc_id"), col("dup_count"))
          .orderBy(col("keep_doc_id")),
      """SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS dup_count
        |FROM documents GROUP BY MD5(text) ORDER BY keep_doc_id""".stripMargin),
    QueryDef.rowsOnly("d02_minhash_lsh_dedup", minhashPairs),
    QueryDef.rowsOnly("d03_simhash_dedup", simhashPairs),
    QueryDef.sql(
      "d04_ngram_jaccard",
      ngramJaccardPairs,
      """WITH g AS (
        |  SELECT doc_id, lang, n_chars,
        |    LIST_DISTINCT([SUBSTRING(text, i, 3) FOR i IN GENERATE_SERIES(1, LENGTH(text)-2)]) AS grams
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  ROUND(CAST(LEN(LIST_INTERSECT(a.grams, b.grams)) AS DOUBLE) /
        |        LEN(LIST_DISTINCT(LIST_CONCAT(a.grams, b.grams))), 4) AS jaccard
        |FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE ABS(a.n_chars - b.n_chars) <= 5 AND a.doc_id % 5 = 0
        |  AND CAST(LEN(LIST_INTERSECT(a.grams, b.grams)) AS DOUBLE) /
        |      LEN(LIST_DISTINCT(LIST_CONCAT(a.grams, b.grams))) >= 0.4
        |ORDER BY doc_a, doc_b""".stripMargin),
    QueryDef.rowsOnly("d05_embedding_near_dup", embeddingNearDupPairs)
  )
}
