package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables

/**
 * Approximate-nearest-neighbor search over the `embeddings` table
 * (`Array[Float]`, 64-d). The exact path is a broadcasted
 * query-set × corpus cross join with a codegen'd cosine (zip_with +
 * aggregate — no UDF); the scale path is IVF: corpus vectors are
 * bucketed by nearest centroid once, and each query probes only the
 * nearest `nprobe` buckets — turning an O(Q·N) scan into O(Q·N/K·nprobe)
 * with the bucket assignment reusable across queries.
 */
object Similarity {

  /** Codegen'd cosine similarity between two float-array columns. */
  def cosineExpr(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> cast(x AS DOUBLE) * cast(y AS DOUBLE)),
       |  cast(0.0 AS DOUBLE), (acc, v) -> acc + v) /
       |(sqrt(aggregate($a, cast(0.0 AS DOUBLE), (acc, x) -> acc + cast(x AS DOUBLE) * cast(x AS DOUBLE))) *
       | sqrt(aggregate($b, cast(0.0 AS DOUBLE), (acc, y) -> acc + cast(y AS DOUBLE) * cast(y AS DOUBLE))))""".stripMargin)

  /** Exact top-k neighbors for each query vector (vec_id < nQueries). */
  def bruteForceTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(queries).crossJoin(corpus)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineExpr("q_emb", "c_emb"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /**
   * IVF-style ANN: K deterministic centroids (the first K corpus
   * vectors), corpus bucketed by nearest centroid, queries probe the
   * `nprobe` nearest buckets.
   */
  def ivfTopK(
      spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 5, nCentroids: Int = 16, nprobe: Int = 4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val centroids = e.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cent_emb"))

    // bucket assignment: one broadcast join + top-1 window, reusable
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_c").desc, col("centroid_id"))
    val bucketed = e.crossJoin(broadcast(centroids))
      .withColumn("cos_c", cosineExpr("embedding", "cent_emb"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("centroid_id").as("bucket"), col("vec_id").as("neighbor_id"),
        col("embedding").as("c_emb"))

    // query → nprobe nearest buckets
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_c").desc, col("centroid_id"))
    val probes = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(centroids))
      .withColumn("cos_c", cosineExpr("q_emb", "cent_emb"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("centroid_id").as("bucket"))

    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    probes.join(bucketed, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosineExpr("q_emb", "c_emb"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "s01_ann_brute_force_topk",
      (spark, dir) => bruteForceTopK(spark, dir),
      """SELECT query_id, rank, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |      ORDER BY LIST_COSINE_SIMILARITY(q.embedding, c.embedding) DESC, c.vec_id) AS BIGINT) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 10) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
    // The IVF plan is fully deterministic (centroids = first 16 corpus
    // vectors, rank ties broken by id), so the oracle replays the SAME
    // algorithm in SQL — assignment, probing, and in-bucket top-k — and
    // must agree exactly, approximation and all. Cosines compare at
    // DOUBLE precision on both sides.
    QueryDef.sql(
      "s02_ann_ivf_topk",
      (spark, dir) => ivfTopK(spark, dir),
      """WITH cents AS (
        |  SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cent_emb
        |  FROM embeddings WHERE vec_id < 16),
        |bucketed AS (
        |  SELECT centroid_id AS bucket, vec_id AS neighbor_id, c_emb FROM (
        |    SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS c_emb, c.centroid_id,
        |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |        ORDER BY LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]), c.cent_emb) DESC,
        |          c.centroid_id) AS rn
        |    FROM embeddings e, cents c) WHERE rn = 1),
        |probes AS (
        |  SELECT query_id, q_emb, bucket FROM (
        |    SELECT q.vec_id AS query_id, CAST(q.embedding AS DOUBLE[]) AS q_emb,
        |      c.centroid_id AS bucket,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |        ORDER BY LIST_COSINE_SIMILARITY(CAST(q.embedding AS DOUBLE[]), c.cent_emb) DESC,
        |          c.centroid_id) AS rn
        |    FROM embeddings q, cents c WHERE q.vec_id < 10) WHERE rn <= 4)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, ROUND(cosine, 4) AS cosine
        |FROM (
        |  SELECT p.query_id, b.neighbor_id,
        |    LIST_COSINE_SIMILARITY(p.q_emb, b.c_emb) AS cosine,
        |    ROW_NUMBER() OVER (PARTITION BY p.query_id
        |      ORDER BY LIST_COSINE_SIMILARITY(p.q_emb, b.c_emb) DESC, b.neighbor_id) AS rank
        |  FROM probes p JOIN bucketed b ON p.bucket = b.bucket
        |  WHERE p.query_id <> b.neighbor_id) WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin)
  )
}
