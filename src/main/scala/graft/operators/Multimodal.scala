package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/**
 * Multimodal-column plumbing: media payloads ride as opaque `binary`
 * columns with a typed metadata struct; decode / feature-extraction
 * runs batched per partition (the Scala analog of `mapInPandas` — an
 * iterator-to-iterator transform that never materializes a partition).
 *
 * The actual media decode is STUBBED (no image/audio libs in this
 * container): `fakeDecodeFeatures` derives a deterministic byte-histogram
 * "feature vector" from the payload. The Spark-side mechanics — schema,
 * binary encoding, per-partition batch shape, feature output — are real
 * and oracle-checked where SQL-expressible.
 */
object Multimodal {

  /** documents.text re-encoded as a binary payload + metadata struct —
    * the shape an image/audio column would have. */
  def binaryTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("text").cast(BinaryType).as("content"),
        struct(
          lit("text/plain").as("mime"),
          length(col("text")).cast(LongType).as("byte_len"),
          col("source").as("origin")).as("meta"))

  private val featureDim = 16

  /**
   * STUB decode: a real pipeline would decode image/audio here (e.g.
   * JPEG → pixels → CNN features). Deterministic stand-in: 16-bin byte
   * histogram, L1-normalized. Runs per-partition, batched, no driver
   * round-trip — swap the inner function for a real decoder and the
   * distribution shape is unchanged.
   */
  def extractFeatures(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("byte_len", LongType),
      StructField("features", ArrayType(FloatType))))
    val src = binaryTable(spark, dir)
    val rows = src.select(col("doc_id"), col("content")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Float](featureDim)
        var i = 0
        while (i < bytes.length) {
          hist((bytes(i) & 0xff) / (256 / featureDim)) += 1f
          i += 1
        }
        val n = math.max(1, bytes.length).toFloat
        Row(id, bytes.length.toLong, hist.map(_ / n).toSeq)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /**
   * STUB frame sampling: a real pipeline would demux video and decode
   * every Nth frame (ffmpeg-shaped); the stand-in slices the payload
   * into fixed-size "frames" and emits every 4th with its byte offset
   * and a synthetic timestamp. One input row fans out to many frame
   * rows INSIDE the partition iterator — the flatMap shape a frame
   * sampler needs so no whole video ever materializes per-row upstream.
   */
  def sampleFrames(spark: SparkSession, dir: String): DataFrame = {
    val frameBytes = 64
    val stride = 4
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", LongType),
      StructField("byte_offset", LongType),
      StructField("ts_ms", LongType),
      StructField("frame", BinaryType)))
    val rows = binaryTable(spark, dir)
      .select(col("doc_id"), col("content")).rdd.mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val frames = bytes.length / frameBytes
          (0L until frames.toLong by stride.toLong).map { f =>
            val off = f * frameBytes
            Row(id, f / stride, off, f * 33L, // ~30fps synthetic clock
              java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + frameBytes))
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** STUB resize: real pipelines decode + bilinear-resample; the
    * stand-in strided-subsamples each payload to a fixed target size —
    * a pure per-row binary→binary transform (codegen-friendly shape, no
    * state). */
  def resizePayloads(spark: SparkSession, dir: String, target: Int = 32): DataFrame =
    binaryTable(spark, dir)
      .withColumn("resized", expr(
        // every k-th byte (k = stride for the target size), each as a
        // 1-byte binary slice, via HOF transform — no UDF. Empty
        // payloads short-circuit: sequence(0, -1) yields a DESCENDING
        // [0, -1], not an empty array.
        s"""IF(length(content) = 0, array(),
           |  transform(sequence(0, least(length(content), $target) - 1),
           |    i -> substring(content, cast(i * greatest(length(content) div $target, 1) AS INT) + 1, 1)))"""
          .stripMargin))
      .select(col("doc_id"),
        length(col("content")).cast(LongType).as("orig_len"),
        size(col("resized")).cast(LongType).as("resized_len"))

  /**
   * STUB perceptual hash — the dHash recipe over the stubbed decode: 65
   * bytes sampled at fixed strides across the payload (the stand-in for
   * a 65-pixel downsampled luminance row), bit i = sample[i] >
   * sample[i+1]. Structure-preserving like real dHash: near-identical
   * payloads differ in a few bits, unrelated ones in ~32. Per-partition
   * batched compute, like every decode in this file.
   */
  def perceptualHashes(spark: SparkSession, dir: String): DataFrame =
    hashPayloads(spark, binaryTable(spark, dir).select(col("doc_id"), col("content")))

  private def dhash64(bytes: Array[Byte]): Long = {
    var h = 0L
    if (bytes.length >= 2) {
      val s = new Array[Int](65)
      var i = 0
      while (i <= 64) {
        s(i) = bytes((i.toLong * (bytes.length - 1) / 64).toInt) & 0xff
        i += 1
      }
      var b = 0
      while (b < 64) {
        if (s(b) > s(b + 1)) h |= (1L << b)
        b += 1
      }
    }
    h
  }

  private[operators] def hashPayloads(spark: SparkSession, payloads: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("phash", LongType)))
    val rows = payloads.rdd.mapPartitions(_.map { r =>
      Row(r.getLong(0), dhash64(r.getAs[Array[Byte]](1)))
    })
    spark.createDataFrame(rows, schema)
  }

  /** The corpus plus planted "re-encodings": every 50th payload gets a
    * twin (doc_id + 10^7) with VALUE noise on every 16th byte —
    * positions intact, like pixel noise from a lossy re-encode, exactly
    * the perturbation class a perceptual hash must tolerate (a text
    * edit SHIFTS bytes and rightly breaks it; media near-dups do not
    * shift). */
  private[operators] def corpusWithReencodes(spark: SparkSession, dir: String): DataFrame = {
    val base = binaryTable(spark, dir).select(col("doc_id"), col("content"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("content", BinaryType)))
    val twins = spark.createDataFrame(
      base.filter(col("doc_id") % 50 === 0).rdd.mapPartitions(_.map { r =>
        val bytes = r.getAs[Array[Byte]](1).clone()
        var i = 0
        while (i < bytes.length) { bytes(i) = ((bytes(i) + 1) & 0xff).toByte; i += 16 }
        Row(r.getLong(0) + 10000000L, bytes)
      }), schema)
    base.unionByName(twins)
  }

  /**
   * Perceptual near-duplicates: band collisions over DISTINCT signatures
   * (the d03 hot-bucket discipline — a million identical payloads occupy
   * each band bucket as ONE row), verified by Hamming distance ≤
   * `maxHamming`. Identical-signature groups pair within their group at
   * distance 0.
   *
   * Recall contract: disjoint bands over a 64-bit hash GUARANTEE a band
   * collision only for pairs within Hamming `bands - 1` (pigeonhole —
   * `bands` or more scattered bit flips can land one per band); pairs
   * between `bands` and `maxHamming` are found only when their flips
   * cluster into fewer than `bands` bands, i.e. probabilistically. The
   * default 4 bands × 16-bit keys is the SCALE configuration: 65,536
   * buckets per band keeps the in-bucket pair explosion flat at corpus
   * scale, and the frozen expectation pins its behavior on the test
   * corpus (like d03/d05). Callers needing guaranteed recall up to the
   * default `maxHamming = 8` pass `bands = 9` (7-bit keys — 128 buckets
   * per band, a small-corpus / per-shard configuration).
   */
  def phashNearDup(spark: SparkSession, dir: String, maxHamming: Int = 8,
      bands: Int = 4): DataFrame = {
    require(bands >= 1 && bands <= 64, s"bands must be in [1,64]: $bands")
    val bandBits = 64 / bands // disjoint; high leftover bits touch no band
    val bandMask = if (bandBits >= 64) -1L else (1L << bandBits) - 1
    // the signature-group frame is referenced FOUR times below (banding,
    // both cross-join sides, same-hash pairs); left lazy each reference
    // re-decoded and re-hashed the whole binary corpus. It is
    // distinct-signature-sized, so materialize it once (localCheckpoint:
    // blocks die with the frame — same shape as d03's fix). EAGER on
    // purpose: the references sit in ONE action, and a lazy checkpoint
    // referenced multiple times inside one job duplicates the binary
    // decode before any block caches (measured: m05 0.67→1.0 s lazy)
    val groups = hashPayloads(spark, corpusWithReencodes(spark, dir))
      .groupBy(col("phash")).agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .localCheckpoint()
    val banded = groups.select(col("phash"), explode(expr(
      s"transform(sequence(0, ${bands - 1}), " +
        s"b -> struct(b AS band, shiftright(phash, b*$bandBits) & $bandMask AS bkey))"))
      .as("bb"))
      .select(col("phash"), col("bb.band"), col("bb.bkey"))
    val candidates = banded
      .groupBy(col("band"), col("bkey"))
      .agg(sort_array(collect_set(col("phash"))).as("hs"))
      .filter(size(col("hs")) > 1)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(hs)-1),
          |  i -> transform(slice(hs, 1, i), a -> struct(a AS ha, hs[i] AS hb))))""".stripMargin))
        .as("p"))
      .select(col("p.ha"), col("p.hb"))
      .dropDuplicates("ha", "hb")
      .filter(expr(s"bit_count(ha ^ hb) <= $maxHamming"))
    val cross = candidates
      .join(groups.select(col("phash").as("ha"), col("ids").as("ids_a")), Seq("ha"))
      .join(groups.select(col("phash").as("hb"), col("ids").as("ids_b")), Seq("hb"))
      .select(expr("bit_count(ha ^ hb)").cast(LongType).as("hamming"), explode(expr(
        """flatten(transform(ids_a,
          |  x -> transform(ids_b, y -> struct(least(x, y) AS doc_a, greatest(x, y) AS doc_b))))"""
          .stripMargin)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("hamming"))
    val same = groups.filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ids)-1),
          |  i -> transform(slice(ids, 1, i), a -> struct(a AS doc_a, ids[i] AS doc_b))))""".stripMargin))
        .as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), lit(0L).as("hamming"))
    same.unionByName(cross)
      .dropDuplicates("doc_a", "doc_b")
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** The full 16-bin histogram per document, bins as rounded doubles —
    * the frozen-expectation surface for m02b (bin VALUES have no SQL
    * form; the committed expectation pins them against decoder drift,
    * while byte_len cross-checks against the oracle's own octet_length). */
  def featureBins(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, dir)
      .select(Seq(col("doc_id"), col("byte_len")) ++
        (0 until featureDim).map(i =>
          round(col("features").getItem(i).cast("double"), 4).as(f"b$i%02d")): _*)
      .orderBy(col("doc_id"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "m01_binary_metadata",
      (spark, dir) =>
        binaryTable(spark, dir)
          .select(
            col("doc_id"),
            col("meta.byte_len").as("byte_len"),
            col("meta.mime").as("mime"),
            length(col("content")).cast(LongType).as("payload_len"))
          .orderBy(col("doc_id")),
      """SELECT doc_id,
        |  CAST(LENGTH(text) AS BIGINT) AS byte_len,
        |  'text/plain' AS mime,
        |  CAST(OCTET_LENGTH(CAST(text AS BLOB)) AS BIGINT) AS payload_len
        |FROM documents ORDER BY doc_id""".stripMargin),
    // The histogram bins are engine-side (byte-level access has no SQL
    // form), but their invariants are exact: 16 bins whose L1 mass is
    // payload_bytes/payload_bytes = 1 (0 for an empty payload). The
    // oracle pins doc coverage, byte length, dimensionality, and
    // normalization; the bin values themselves are unit-tested.
    QueryDef.sql(
      "m02_feature_extract",
      (spark, dir) =>
        extractFeatures(spark, dir)
          .select(col("doc_id"), col("byte_len"),
            size(col("features")).cast(LongType).as("feature_dim"),
            round(expr("aggregate(features, cast(0.0 AS DOUBLE), (a, x) -> a + cast(x AS DOUBLE))"), 4)
              .as("l1_norm"))
          .orderBy(col("doc_id")),
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
        |  CAST(16 AS BIGINT) AS feature_dim,
        |  CAST(CASE WHEN octet_length(CAST(text AS BLOB)) = 0 THEN 0 ELSE 1 END AS DOUBLE) AS l1_norm
        |FROM documents ORDER BY doc_id""".stripMargin),

    // The full bin values, pinned by a committed frozen expectation
    // (FreezeExpected) keyed on the exact-integer dataset invariant —
    // decoder drift now fails the driver compare, not just sbt. byte_len
    // stays independently computed by the oracle (octet_length join), so
    // the frozen file cannot mask a doc-coverage or length regression.
    QueryDef.sql(
      "m02b_feature_bins",
      (spark, dir) => featureBins(spark, dir),
      ("""SELECT f.doc_id,
         |  CAST(octet_length(CAST(d.text AS BLOB)) AS BIGINT) AS byte_len,
         |""".stripMargin +
        (0 until 16).map(i => f"  f.b$i%02d").mkString(",\n") + "\n" +
        """FROM '/root/repo/expected/m02b_feature_bins_*.parquet' f
          |JOIN documents d ON f.doc_id = d.doc_id
          |WHERE f.src_key = (SELECT SUM(n_chars) FROM documents)
          |ORDER BY f.doc_id""".stripMargin)),

    // Frame sampling fan-out: the slicing arithmetic is deterministic,
    // so the oracle reproduces the (doc, frame, offset, ts) rows with a
    // lateral series — only the stubbed frame bytes are engine-side.
    QueryDef.sql(
      "m03_frame_sample",
      (spark, dir) =>
        sampleFrames(spark, dir)
          .select(col("doc_id"), col("frame_idx"), col("byte_offset"), col("ts_ms"))
          .orderBy(col("doc_id"), col("frame_idx")),
      """SELECT doc_id, CAST(j AS BIGINT) AS frame_idx,
        |  CAST(j*256 AS BIGINT) AS byte_offset, CAST(j*132 AS BIGINT) AS ts_ms
        |FROM (SELECT doc_id,
        |        unnest(range(0, CAST((octet_length(CAST(text AS BLOB))//64 + 3)//4 AS BIGINT))) AS j
        |      FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin),

    // Perceptual near-dup pairs, pinned by a frozen expectation (the
    // d03 pattern: deterministic engine-side hashing DuckDB cannot
    // replay; the committed file keyed on the corpus invariant is the
    // contract).
    QueryDef.sql(
      "m05_phash_near_dup",
      (spark, dir) => phashNearDup(spark, dir),
      """SELECT * EXCLUDE (src_key)
        |FROM '/root/repo/expected/m05_phash_near_dup_*.parquet'
        |WHERE src_key = (SELECT SUM(n_chars) FROM documents)
        |ORDER BY doc_a, doc_b""".stripMargin),

    QueryDef.sql(
      "m04_resize",
      (spark, dir) => resizePayloads(spark, dir).orderBy(col("doc_id")),
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS orig_len,
        |  CAST(LEAST(octet_length(CAST(text AS BLOB)), 32) AS BIGINT) AS resized_len
        |FROM documents ORDER BY doc_id""".stripMargin)
  )
}
