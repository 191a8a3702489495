package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.{VectorKernels => VK}

/** The round-16 native kernels must be BIT-IDENTICAL to the HOF
  * expressions they replaced (same integer ops, same IEEE fold order,
  * same tie-breaking) — asserted here by running both forms over
  * randomized data, including edge shapes the operators themselves
  * never produce (length mismatches, null elements, empty arrays).
  * The argmin-family kernels deliberately return NULL on null
  * elements/width mismatches instead of the HOF form's accidental
  * null-field struct ordering (see the VectorKernels header); that
  * contract is pinned separately below. */
class VectorKernelsSpec extends SparkTestBase {

  private val rnd = new scala.util.Random(20260817)

  private def floatVecs(n: Int, dims: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.fill(dims)((rnd.nextFloat() - 0.5f) * 4f))
    }.toDF("id", "vec").repartition(3)
  }

  private def longVecPairs(n: Int, dims: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong,
        Array.fill(dims)(rnd.nextLong() % 2000000L),
        Array.fill(dims)(rnd.nextLong() % 2000000L))
    }.toDF("id", "a", "b").repartition(3)
  }

  private def assertSame(df: DataFrame): Unit = {
    val bad = df.filter(!(col("nat") <=> col("hof"))).collect()
    assert(bad.isEmpty, s"native != HOF on ${bad.take(3).mkString(";")}")
  }

  test("fp1e6 == transform(floor(x*1e6)) on random floats") {
    assertSame(floatVecs(200, 64).select(
      VK.fp1e6(col("vec")).as("nat"),
      expr("transform(vec, x -> cast(floor(cast(x AS double) * 1000000) AS bigint))").as("hof")))
  }

  test("sqdist_fp / dot_fp == aggregate(zip_with(...)) incl. length-mismatch null") {
    val base = longVecPairs(200, 64)
      // truncate some right sides to exercise the zip-pad null semantics
      .withColumn("b2", when(col("id") % 7 === 0, expr("slice(b, 1, 63)")).otherwise(col("b")))
    assertSame(base.select(
      VK.sqdistFp(col("a"), col("b2")).as("nat"),
      expr("aggregate(zip_with(a, b2, (x, y) -> (x-y)*(x-y)), cast(0 AS bigint), (acc, v) -> acc + v)").as("hof")))
    assertSame(base.select(
      VK.dotFp(col("a"), col("b2")).as("nat"),
      expr("aggregate(zip_with(a, b2, (x, y) -> x*y), 0L, (acc, v) -> acc + v)").as("hof")))
  }

  test("cosine_fd == the HOF cosine bit-for-bit on random float vectors") {
    import spark.implicits._
    val pairs = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextFloat() - 0.5f) * 4f),
        Array.fill(64)((rnd.nextFloat() - 0.5f) * 4f))
    }.toDF("id", "x", "y").repartition(3)
    assertSame(pairs.select(
      VK.cosineFd(col("x"), col("y")).as("nat"),
      expr(
        """aggregate(zip_with(x, y, (p, q) -> cast(p AS DOUBLE) * cast(q AS DOUBLE)),
          |  cast(0.0 AS DOUBLE), (acc, v) -> acc + v) /
          |(sqrt(aggregate(x, cast(0.0 AS DOUBLE), (acc, p) -> acc + cast(p AS DOUBLE) * cast(p AS DOUBLE))) *
          | sqrt(aggregate(y, cast(0.0 AS DOUBLE), (acc, q) -> acc + cast(q AS DOUBLE) * cast(q AS DOUBLE))))""".stripMargin).as("hof")))
  }

  test("argmin_cell / probe_cells == array_min/array_sort struct forms incl. ties") {
    import spark.implicits._
    // small value range so distance TIES actually occur
    val dims = 4
    val cells: Seq[Seq[Long]] = Seq.fill(6)(Seq.fill(dims)(rnd.nextInt(3).toLong))
    val vecs = (0 until 300).map { i =>
      (i.toLong, Array.fill(dims)(rnd.nextInt(3).toLong))
    }.toDF("id", "fp").repartition(3).withColumn("cells", typedLit(cells))
    val l2 = "aggregate(zip_with(fp, cells[cc], (x, y) -> (x-y)*(x-y)), cast(0 AS bigint), (acc, v) -> acc + v)"
    assertSame(vecs.select(
      VK.argminCell(col("fp"), cells).getField("idx").as("nat"),
      expr(s"array_min(transform(sequence(0, ${cells.size - 1}), cc -> named_struct('d', $l2, 'cc', cc))).cc").as("hof")))
    assertSame(vecs.select(
      VK.probeCells(col("fp"), cells, 3).as("nat"),
      expr(s"transform(slice(array_sort(transform(sequence(0, ${cells.size - 1}), cc -> named_struct('d', $l2, 'cc', cc))), 1, 3), x -> x.cc)").as("hof")))
  }

  test("pq_encode / pq_adc == the nested HOF forms incl. codeword ties") {
    import spark.implicits._
    val (subspaces, codewords, subDim) = (4, 5, 3)
    val dims = subspaces * subDim
    val cbs: Seq[Seq[Seq[Long]]] = (0 until subspaces).map(_ =>
      (0 until codewords).map(_ => Seq.fill(subDim)(rnd.nextInt(3).toLong)))
    val vecs = (0 until 300).map { i =>
      (i.toLong, Array.fill(dims)(rnd.nextInt(3).toLong))
    }.toDF("id", "fp").repartition(3).withColumn("cb", typedLit(cbs))
    val enc = vecs
      .withColumn("nat", VK.pqEncode(col("fp"), cbs))
      .withColumn("hof", expr(
        s"""transform(sequence(0, ${subspaces - 1}), m ->
           |  array_min(transform(sequence(0, ${codewords - 1}), kk -> named_struct(
           |    'd', aggregate(sequence(0, ${subDim - 1}), cast(0 AS bigint), (acc, dd) ->
           |           acc + (fp[m*$subDim+dd] - cb[m][kk][dd]) * (fp[m*$subDim+dd] - cb[m][kk][dd])),
           |    'kk', kk))).kk)""".stripMargin))
    assertSame(enc.select(col("nat"), col("hof")))
    assertSame(enc.select(
      VK.pqAdc(col("fp"), col("nat"), cbs).as("nat"),
      expr(
        s"""aggregate(sequence(0, ${subspaces - 1}), cast(0 AS bigint), (acc, m) ->
           |  acc + aggregate(sequence(0, ${subDim - 1}), cast(0 AS bigint), (a2, dd) ->
           |    a2 + (fp[m*$subDim+dd] - cb[m][hof[m]][dd]) *
           |         (fp[m*$subDim+dd] - cb[m][hof[m]][dd])))""".stripMargin).as("hof")))
  }

  test("sq8_encode == the transform-div form on non-negative operands") {
    import spark.implicits._
    val los = Seq.fill(16)(-(rnd.nextInt(1000).toLong))
    val spans = Seq.fill(16)(rnd.nextInt(5000).toLong + 1L)
    val vecs = (0 until 300).map { i =>
      (i.toLong, Array.tabulate(16)(j => los(j) + rnd.nextInt(5000).toLong))
    }.toDF("id", "fp").repartition(3)
      .withColumn("los", typedLit(los)).withColumn("spans", typedLit(spans))
    assertSame(vecs.select(
      VK.sq8Encode(col("fp"), los, spans).as("nat"),
      expr("transform(sequence(0, 15), i -> ((fp[i] - los[i]) * 255) div spans[i])").as("hof")))
  }

  test("word_ngrams == (array_distinct of) transform(concat_ws(slice)) forms") {
    import spark.implicits._
    val words = Seq("a", "b", "c", "ab", "b", "a", "c", "a")
    val docs = (0 until 200).map { i =>
      val len = rnd.nextInt(30) + 3
      (i.toLong, Array.fill(len)(words(rnd.nextInt(words.size))))
    }.toDF("id", "words").repartition(3)
    for (n <- Seq(2, 3, 5)) {
      val base = docs.filter(size(col("words")) >= n)
      assertSame(base.select(
        VK.wordNgrams(col("words"), n, distinct = true).as("nat"),
        expr(s"array_distinct(transform(sequence(0, size(words)-$n), i -> concat_ws(' ', slice(words, i+1, $n))))").as("hof")))
      assertSame(base.select(
        VK.wordNgrams(col("words"), n, distinct = false).as("nat"),
        expr(s"transform(sequence(0, size(words)-$n), i -> concat_ws(' ', slice(words, i+1, $n)))").as("hof")))
    }
  }

  test("max_freq == array_max(transform(array_distinct(...))) incl. heavy ties") {
    import spark.implicits._
    val words = Seq("x", "y", "z", "x")
    val docs = (0 until 300).map { i =>
      val len = rnd.nextInt(40) + 1
      (i.toLong, Array.fill(len)(words(rnd.nextInt(words.size))))
    }.toDF("id", "words").repartition(3)
    assertSame(docs.select(
      VK.maxFreq(col("words")).as("nat"),
      expr("cast(array_max(transform(array_distinct(words), w -> size(filter(words, x -> x = w)))) AS bigint)").as("hof")))
  }

  test("argmin family: null elements and width mismatches yield NULL, not garbage") {
    import spark.implicits._
    val cells: Seq[Seq[Long]] = Seq(Seq(0L, 0L), Seq(5L, 5L))
    val cbs: Seq[Seq[Seq[Long]]] = Seq(Seq(Seq(0L), Seq(3L)), Seq(Seq(1L), Seq(2L)))
    val rows = Seq(
      (1L, Seq[java.lang.Long](1L, 2L)),             // clean
      (2L, Seq[java.lang.Long](1L, null)),           // null element
      (3L, Seq[java.lang.Long](1L))                  // width mismatch
    ).toDF("id", "fp")
    val out = rows.select(
      col("id"),
      VK.argminCell(col("fp"), cells).getField("idx").as("am"),
      VK.probeCells(col("fp"), cells, 1).as("pc"),
      VK.pqEncode(col("fp"), cbs).as("pe")).orderBy(col("id")).collect()
    assert(!out(0).isNullAt(1) && !out(0).isNullAt(2) && !out(0).isNullAt(3))
    for (r <- Seq(out(1), out(2)); i <- 1 to 3)
      assert(r.isNullAt(i), s"row ${r.getLong(0)} field $i must be NULL")
    // Sq8: per-element null mirror (null/short fp -> null code element)
    val sq = rows.select(col("id"), VK.sq8Encode(col("fp"), Seq(0L, 0L), Seq(1L, 1L)).as("c"))
      .orderBy(col("id")).collect()
    assert(sq(0).getSeq[Any](1) == Seq(255L, 510L))
    assert(sq(1).getSeq[Any](1) == Seq(255L, null))
    assert(sq(2).getSeq[Any](1) == Seq(255L, null))
  }

  test("operators on the corpus: native pipelines match pre-kernel frozen shapes") {
    // spot invariants on real fixture data (sf0.001): the swapped
    // operators still produce self-consistent results
    val dd = Dedup.duplicateGroups(spark, sf0001)
    assert(dd.filter(col("group_id") > col("doc_id")).isEmpty,
      "group label must be the component minimum")
    val cos = Similarity.bruteForceTopK(spark, sf0001, nQueries = 3, k = 2)
    assert(cos.count() === 6)
  }
}
