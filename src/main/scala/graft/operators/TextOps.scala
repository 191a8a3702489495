package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.{VectorKernels => VK}

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

  /**
   * Gopher-style repetition metrics: fraction of tokens taken by the
   * most frequent word, duplicate-word fraction, and top-bigram
   * fraction. Shuffle-free per-row HOF pipeline — per-doc cost is
   * O(distinct × words), bounded by document length, so the operator is
   * embarrassingly parallel at corpus scale.
   */
  def repetitionScores(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("words", split(lower(col("text")), " "))
      .withColumn("bigrams", when(size(col("words")) >= 2,
        VK.wordNgrams(col("words"), 2, distinct = false))
        .otherwise(expr("cast(array() AS array<string>)")))
      .select(
        col("doc_id"),
        size(col("words")).cast("bigint").as("n_words"),
        (VK.maxFreq(col("words"))
          .cast("double") / size(col("words"))).as("top_word_frac"),
        ((size(col("words")) - size(array_distinct(col("words")))).cast("double") /
          size(col("words"))).as("dup_word_frac"),
        when(size(col("bigrams")) > 0,
          VK.maxFreq(col("bigrams"))
            .cast("double") / size(col("bigrams")))
          .otherwise(lit(0.0)).as("top_bigram_frac"))
      .orderBy(col("doc_id"))

  /**
   * Benchmark decontamination: held-out documents (doc_id % 10 = 0)
   * define a 5-gram contamination set; every training document sharing
   * any of those 5-grams is flagged with its overlap count. The
   * contamination set is tiny relative to the corpus (benchmarks are),
   * so it broadcasts and the scan stays one pass over training docs —
   * the shape that holds when "training docs" is 100 TB.
   */
  def decontamination(spark: SparkSession, dir: String): DataFrame = {
    // each branch filters BEFORE spreading so the (small) held-out side
    // never shuffles the full corpus, and the training side's per-doc
    // 5-gram explode runs on all cores instead of one parquet split
    // (same rationale as Dedup.spread)
    def grams(d: DataFrame): DataFrame = d
      .withColumn("words", split(lower(col("text")), " "))
      .select(col("doc_id"),
        // native WordNgrams kernel (one pass/row vs interpreted HOFs)
        when(size(col("words")) >= 5, VK.wordNgrams(col("words"), 5, distinct = true))
          .otherwise(expr("cast(array() AS array<string>)")).as("grams"))
    val docs = Tables.documents(spark, dir)
    val spread = spark.sparkContext.defaultParallelism * 2
    val bench = grams(docs.filter(col("doc_id") % 10 === 0)
        .repartition(spread, col("doc_id")))
      .select(explode(col("grams")).as("gram")).distinct()
    grams(docs.filter(col("doc_id") % 10 =!= 0).repartition(spread, col("doc_id")))
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(broadcast(bench), Seq("gram"))
      .groupBy(col("doc_id"))
      // (doc_id, gram) pairs are already distinct: grams are
      // array_distinct'd per doc and the broadcast side is distinct —
      // a plain count avoids a second dedup pass over wide strings
      .agg(count(lit(1)).as("n_contaminated"))
      .orderBy(col("doc_id"))
  }

  /**
   * PII redaction — the scrub pass every training-data pipeline runs
   * before text leaves the lake: emails, E.164-ish phone numbers, and
   * IPv4 addresses replaced by typed placeholder tokens. Pure
   * `regexp_replace` chains (codegen'd, shuffle-free per row; patterns
   * chosen to behave identically under Java regex and RE2 so the
   * DuckDB oracle can mirror them). The verification query plants
   * deterministic doc_id-derived PII first, because the synthetic corpus
   * contains none — the operator itself is corpus-agnostic.
   */
  def redactPii(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val ipv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    regexp_replace(
      regexp_replace(
        regexp_replace(c, email, "<EMAIL>"),
        phone, "<PHONE>"),
      ipv4, "<IP>")
  }

  def piiRedaction(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("dirty", concat(
        col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com"),
        lit(" or +1-555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
        lit("-0199 from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7")))
      .select(
        col("doc_id"),
        redactPii(col("dirty")).as("clean"))
      .select(
        col("doc_id"),
        length(col("clean")).cast("bigint").as("clean_len"),
        (size(split(col("clean"), "<EMAIL>", -1)) - 1).cast("bigint").as("n_emails"),
        (size(split(col("clean"), "<PHONE>", -1)) - 1).cast("bigint").as("n_phones"),
        (size(split(col("clean"), "<IP>", -1)) - 1).cast("bigint").as("n_ips"))
      .orderBy(col("doc_id"))

  /**
   * Deterministic stratified sampling for data mixing: rank documents
   * within each language by a Knuth multiplicative hash of doc_id
   * (reproducible, engine-portable — no RNG), keep the first
   * `min-language-count` per language → an exactly balanced sample.
   * One shuffle on `lang`; the per-language target arrives via a
   * broadcast scalar.
   */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(spark, dir)
    val target = d.groupBy(col("lang")).count().agg(min("count").as("t"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(expr("(doc_id * 2654435761) % 4294967296"), col("doc_id"))
    d.withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(target))
      .filter(col("rn") <= col("t"))
      .select(col("doc_id"), col("lang"), col("rn").cast("long").as("rn"))
      .orderBy(col("doc_id"))
  }

  /**
   * Sequence packing for LLM pretraining: concatenate each (lang,
   * shard)'s documents in doc_id order and slice the token stream into
   * fixed `blockTokens` blocks — emitting, per document, the block span
   * it lands in and its offset into the first block (the concat-then-
   * chunk layout most pretraining loaders use; documents may span block
   * boundaries). Sharding is the scale knob: packing is inherently
   * sequential WITHIN a stream, so streams are bounded at `shardDocs`
   * documents (shard = doc_id div shardDocs — contiguous, so the oracle
   * replays it exactly, unlike a hash-bucket) and all (lang, shard)
   * streams pack in parallel with one shuffle and a running-sum window
   * each. Token counts are t01's whitespace tokenizer.
   */
  def sequencePacking(
      spark: SparkSession, dir: String,
      blockTokens: Int = 512, shardDocs: Int = 128): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        expr(s"doc_id div $shardDocs").as("shard"),
        size(split(col("text"), " ")).cast("bigint").as("tokens"))
      .withColumn("cum_before", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .select(col("lang"), col("shard"), col("doc_id"), col("tokens"),
        expr(s"cum_before div $blockTokens").as("start_block"),
        expr(s"(cum_before + tokens - 1) div $blockTokens").as("end_block"),
        (col("cum_before") % blockTokens).as("block_offset"))
      .orderBy(col("lang"), col("shard"), col("doc_id"))
  }

  /**
   * Gopher-style composite quality filter: the rule battery large
   * pretraining pipelines run per document (word-count bounds, mean
   * word-length bounds, stopword evidence, single-word repetition cap),
   * each emitted as its own boolean plus the conjunction — pipelines
   * keep the per-rule bits for ablation, not just the verdict. Every
   * boundary is tested in EXACT integer arithmetic (cross-multiplied
   * rationals: `chars*1 >= 4*wc` instead of `chars/wc >= 4.0`), so no
   * float rounding can flip a rule between engines. Bounds are
   * calibrated to the synthetic corpus (real Gopher uses 50..100k words
   * etc. — the thresholds are the parameters, the shape is the
   * operator). Pure per-row codegen'd pipeline, shuffle-free.
   */
  def qualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val sw = stopwords.map("'" + _ + "'").mkString(",")
    Tables.documents(spark, dir)
      .withColumn("words", split(lower(col("text")), " "))
      .withColumn("wc", size(col("words")).cast("bigint"))
      // chars excluding separators: exact (length minus the wc-1 spaces)
      .withColumn("chars", (length(col("text")) - (col("wc") - 1)).cast("bigint"))
      .withColumn("n_stop",
        size(expr(s"array_distinct(filter(words, w -> w IN ($sw)))")).cast("bigint"))
      // native MaxFreq kernel: O(words) hash count vs the former
      // O(distinct × words) interpreted filter-per-distinct-word
      .withColumn("max_freq", VK.maxFreq(col("words")))
      .select(
        col("doc_id"), col("wc"),
        (col("wc") >= 30 && col("wc") <= 90).as("wc_ok"),
        // 4.0 <= mean word length <= 5.0, cross-multiplied
        (col("chars") >= col("wc") * 4 && col("chars") <= col("wc") * 5).as("mwl_ok"),
        (col("n_stop") >= 2).as("stop_ok"),
        // no single word above 1/8 of the document
        (col("max_freq") * 8 <= col("wc")).as("rep_ok"))
      .withColumn("passes",
        col("wc_ok") && col("mwl_ok") && col("stop_ok") && col("rep_ok"))
      .orderBy(col("doc_id"))
  }

  /**
   * Training-mixture sampling weights per (lang, source) stratum —
   * temperature-scaled token share (α = 0.5, the multilingual-sampling
   * exponent of Conneau et al., XLM-R), the step that turns corpus
   * inventory into loader sampling probabilities. Determinism
   * discipline: token counts are exact integers, the temperature is
   * applied as floor(sqrt(tokens)) (IEEE sqrt is exactly rounded, so
   * the floor is engine-portable), the denominator is an INTEGER sum
   * (no float-order sensitivity), and the final share is one double
   * division rounded to 6 places.
   */
  def mixtureWeights(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
      .withColumn("wn", floor(sqrt(col("tokens"))).cast("long"))
    g.withColumn("wd", sum(col("wn")).over(Window.partitionBy()))
      .select(col("lang"), col("source"), col("docs"), col("tokens"),
        round(col("wn").cast("double") / col("wd"), 6).as("sample_weight"))
      .orderBy(col("lang"), col("source"))
  }

  /**
   * CCNet-style n-gram LM quality scoring: a bigram language model is
   * trained on the held-out reference slice of the corpus (doc_id % 10
   * = 0 — the same slice t06 treats as "benchmark"), and every training
   * document is scored by its mean smoothed bigram probability under
   * that model; low scores mark out-of-domain/garbled text, the signal
   * CCNet's KenLM perplexity buckets ("head"/"middle"/"tail") filter
   * on. The probability is add-one smoothed p(w2|w1) quantized to an
   * INTEGER per-mille-of-a-million: q = (10^6·(c2+1)) div (c1+V) —
   * every per-bigram score is exact integer arithmetic and the per-doc
   * score an integer sum, so no float ordering or libm log variance can
   * flip a value between engines (the determinism rule that rules out
   * true log-perplexity; monotonically it ranks the same).
   *
   * Scale shape: model training is two linear groupBys over the (small)
   * reference slice; scoring is the exploded bigram stream joined to
   * the model tables on (w1,w2)/(w1) — linear shuffles of token pairs,
   * no self-joins. At 100 TB the model tables are the pruned-vocabulary
   * LM (bounded), so they broadcast; here they stay as shuffle joins to
   * keep the plan honest for an unpruned vocabulary.
   */
  def lmQualityScores(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val spreadN = spark.sparkContext.defaultParallelism * 2
    def bigrams(d: DataFrame): DataFrame = d
      .withColumn("words", split(lower(col("text")), " "))
      .filter(size(col("words")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(words)-2), i -> struct(words[i] AS w1, words[i+1] AS w2))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val ref = docs.filter(col("doc_id") % 10 === 0).repartition(spreadN, col("doc_id"))
    val refBg = bigrams(ref)
    val c2 = refBg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2v"))
    val c1 = refBg.groupBy(col("w1")).agg(count(lit(1)).as("c1v"))
    // vocabulary = distinct tokens of the reference slice (unigrams,
    // including final words that never start a bigram)
    val vocab = ref
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    bigrams(docs.filter(col("doc_id") % 10 =!= 0).repartition(spreadN, col("doc_id")))
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        expr("(1000000 * (coalesce(c2v, 0) + 1)) div (coalesce(c1v, 0) + v)").as("q"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("lm_score"))
      .select(
        col("doc_id"), col("n_bigrams"), col("lm_score"),
        round(col("lm_score").cast("double") / col("n_bigrams"), 4).as("mean_q"),
        // CCNet's head/middle/tail split, on exact cross-multiplied
        // integer boundaries
        when(col("lm_score") >= col("n_bigrams") * 34000, "head")
          .when(col("lm_score") >= col("n_bigrams") * 31000, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy(col("doc_id"))
  }

  /**
   * The composed pretraining-data pipeline — exact dedup, then the
   * Gopher quality gate, then a balanced per-language sample — chained
   * as ONE lazy plan the optimizer sees whole (the point of composing
   * operators declaratively: the dedup digest groupBy, the per-row
   * filter battery, and the sampling window fuse into three shuffles
   * total, with column pruning reaching the scan because nothing
   * materializes between stages). Every stage reuses the exact
   * arithmetic of its standalone twin (d01 / t10 / t07), so the whole
   * chain stays engine-replayable.
   */
  def pipelineSample(spark: SparkSession, dir: String, perLang: Int = 25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sw = stopwords.map("'" + _ + "'").mkString(",")
    // stage 1 — exact dedup: keep the smallest doc_id per content digest
    val w1 = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val deduped = Tables.documents(spark, dir)
      .withColumn("rn1", row_number().over(w1))
      .filter(col("rn1") === 1)
    // stage 2 — t10's integer-exact quality gate
    val gated = deduped
      .withColumn("words", split(lower(col("text")), " "))
      .withColumn("wc", size(col("words")).cast("bigint"))
      .withColumn("chars", (length(col("text")) - (col("wc") - 1)).cast("bigint"))
      .filter(col("wc") >= 30 && col("wc") <= 90)
      .filter(col("chars") >= col("wc") * 4 && col("chars") <= col("wc") * 5)
      .filter(size(expr(s"array_distinct(filter(words, w -> w IN ($sw)))")) >= 2)
      .filter(VK.maxFreq(col("words")) * 8 <= col("wc"))
    // stage 3 — t07's deterministic per-language sample
    val w3 = Window.partitionBy(col("lang"))
      .orderBy(expr("(doc_id * 2654435761) % 4294967296"), col("doc_id"))
    gated
      .withColumn("rank", row_number().over(w3))
      .filter(col("rank") <= perLang)
      .select(col("doc_id"), col("lang"), col("rank").cast("long").as("rank"),
        col("wc").as("n_words"))
      .orderBy(col("doc_id"))
  }

  /**
   * URL canonicalization — the crawl-side normalizer every corpus
   * pipeline runs before content dedup: drop the `#fragment`, strip
   * `utm_*` tracking parameters (and any dangling `?`/`&`), lowercase
   * the scheme and host (paths stay case-sensitive), trim a trailing
   * slash. A pure codegen'd regexp chain, shuffle-free per row.
   */
  def canonicalUrl(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noFrag = regexp_replace(c, "#.*$", "")
    val noUtm = regexp_replace(regexp_replace(noFrag, "utm_[^&#]*&?", ""), "[?&]$", "")
    val lowered = concat(
      lower(regexp_extract(noUtm, "^([^/]*//[^/]+)", 1)),
      regexp_extract(noUtm, "^[^/]*//[^/]+(.*)$", 1))
    regexp_replace(lowered, "/$", "")
  }

  /**
   * URL-level dedup over [[canonicalUrl]]: group by the canonical form,
   * keep the smallest doc_id, count the collapsed surface variants. The
   * ONLY shuffle is the canonical-key group-by (url + two small ints) —
   * at corpus scale that is the whole cost of crawl dedup. The corpus
   * has no URL column, so five deterministic doc_id-derived surface
   * forms of the same target are planted first (mixed case, trailing
   * slash, utm params, fragment); the canonicalizer is corpus-agnostic.
   */
  def urlDedup(spark: SparkSession, dir: String): DataFrame = {
    val base = concat(lit("www.example.com/docs/"), col("doc_id") % 100)
    val dirty = Tables.documents(spark, dir).select(
      col("doc_id"),
      when(col("doc_id") % 5 === 0, concat(lit("https://"), base))
        .when(col("doc_id") % 5 === 1,
          concat(lit("HTTPS://WWW.EXAMPLE.COM/docs/"), col("doc_id") % 100))
        .when(col("doc_id") % 5 === 2, concat(lit("https://"), base, lit("/")))
        .when(col("doc_id") % 5 === 3,
          concat(lit("https://"), base, lit("?utm_source=feed&utm_campaign=sync")))
        .otherwise(concat(lit("https://"), base, lit("#section-2"))).as("url"))
    dirty
      .select(col("doc_id"), canonicalUrl(col("url")).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("keep_doc"))
      .orderBy(col("canonical_url"))
  }

  /**
   * Exact frequent n-grams via a digest sketch + string verify pass —
   * the heavy-hitter primitive behind boilerplate detection. Pass 1
   * shuffles ONLY 8-byte xxhash64 digests (never gram text) to find
   * candidate-hot digests; pass 2 recounts the candidates BY STRING
   * behind a broadcast semi-join, so a digest collision can only
   * enlarge the candidate set, never the answer — the result is exact.
   * At 100 TB the full-corpus shuffle is 12 bytes per gram instead of
   * the gram text; the threshold is relative (total/1000) so the same
   * query is meaningful at every scale. Three corpus scans (size
   * count, digest pass, verify pass) buy the narrow shuffle — the
   * right trade whenever gram text ≫ 12 bytes.
   */
  def frequentNgrams(spark: SparkSession, dir: String): DataFrame = {
    val spreadN = spark.sparkContext.defaultParallelism * 2
    def grams(d: DataFrame): DataFrame = d
      .withColumn("words", split(lower(col("text")), " "))
      .filter(size(col("words")) >= 2)
      .select(explode(VK.wordNgrams(col("words"), 2, distinct = false)).as("gram"))
    val g = grams(Tables.documents(spark, dir).repartition(spreadN, col("doc_id")))
    // corpus-sized scalar — sets the support bar. The gram COUNT is
    // Σ max(size(words)-1, 0): computed as a per-row integer aggregate
    // over ONE scan instead of materializing the whole gram explode
    // just to count it (guide §1.2: don't compute things you throw away)
    val total = Tables.documents(spark, dir)
      .select(split(lower(col("text")), " ").as("words"))
      .filter(size(col("words")) >= 2)
      .agg(coalesce(sum((size(col("words")) - 1).cast("long")), lit(0L)))
      .first().getLong(0)
    val threshold = math.max(2L, total / 1000L)
    val hot = g.groupBy(xxhash64(col("gram")).as("d")).agg(count(lit(1)).as("dn"))
      .filter(col("dn") >= threshold).select("d")
    g.join(broadcast(hot), xxhash64(col("gram")) === col("d"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .orderBy(col("n").desc, col("gram"))
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
    ),
    // All fractions are a single division of exact integer counts —
    // deterministic across engines (see QueryDef determinism rules).
    QueryDef.sql(
      "t05_repetition_scores",
      repetitionScores,
      """WITH w AS (
        |  SELECT doc_id, string_split(lower(text),' ') AS words FROM documents
        |), b AS (
        |  SELECT doc_id, words,
        |    CASE WHEN len(words) >= 2
        |      THEN list_transform(range(0, len(words)-1), i -> words[i+1] || ' ' || words[i+2])
        |      ELSE [] END AS bigrams
        |  FROM w
        |)
        |SELECT doc_id,
        |  CAST(len(words) AS BIGINT) AS n_words,
        |  CAST(list_max(list_transform(list_distinct(words),
        |    d -> len(list_filter(words, x -> x = d)))) AS DOUBLE)/len(words) AS top_word_frac,
        |  CAST(len(words) - len(list_distinct(words)) AS DOUBLE)/len(words) AS dup_word_frac,
        |  CASE WHEN len(bigrams) > 0
        |    THEN CAST(list_max(list_transform(list_distinct(bigrams),
        |      d -> len(list_filter(bigrams, x -> x = d)))) AS DOUBLE)/len(bigrams)
        |    ELSE CAST(0.0 AS DOUBLE) END AS top_bigram_frac
        |FROM b ORDER BY doc_id""".stripMargin),
    QueryDef.sql(
      "t06_decontamination",
      decontamination,
      """WITH w AS (SELECT doc_id, string_split(lower(text),' ') AS words FROM documents),
        |g AS (SELECT doc_id,
        |  CASE WHEN len(words) >= 5
        |    THEN list_distinct(list_transform(range(0, len(words)-4),
        |      i -> array_to_string(words[i+1:i+5],' ')))
        |    ELSE [] END AS grams FROM w),
        |bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 10 = 0),
        |train AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 10 <> 0)
        |SELECT t.doc_id, CAST(COUNT(DISTINCT t.gram) AS BIGINT) AS n_contaminated
        |FROM train t JOIN bench b USING (gram)
        |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin),
    QueryDef.sql(
      "t08_pii_redaction",
      piiRedaction,
      """WITH dirty AS (
        |  SELECT doc_id, text || ' contact user' || doc_id || '@example.com or +1-555-' ||
        |    lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199 from 10.0.' ||
        |    CAST(doc_id % 256 AS VARCHAR) || '.7' AS d
        |  FROM documents),
        |clean AS (
        |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(d,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS clean
        |  FROM dirty)
        |SELECT doc_id, CAST(len(clean) AS BIGINT) AS clean_len,
        |  CAST(len(string_split(clean, '<EMAIL>')) - 1 AS BIGINT) AS n_emails,
        |  CAST(len(string_split(clean, '<PHONE>')) - 1 AS BIGINT) AS n_phones,
        |  CAST(len(string_split(clean, '<IP>')) - 1 AS BIGINT) AS n_ips
        |FROM clean ORDER BY doc_id""".stripMargin),
    QueryDef.sql(
      "t07_stratified_sample",
      stratifiedSample,
      """WITH ranked AS (
        |  SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
        |  FROM documents),
        |target AS (SELECT MIN(cnt) AS t FROM (SELECT COUNT(*) AS cnt FROM documents GROUP BY lang))
        |SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
        |FROM ranked, target WHERE rn <= t ORDER BY doc_id""".stripMargin),
    QueryDef.sql(
      "t10_quality_filter",
      qualityFilter,
      s"""WITH w AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS words,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS wc,
         |    CAST(len(text) - (len(string_split(text, ' ')) - 1) AS BIGINT) AS chars
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, wc, chars,
         |    CAST(len(list_distinct(list_filter(words, x -> x IN (${stopwords.map("'" + _ + "'").mkString(",")})))) AS BIGINT) AS n_stop,
         |    CAST(list_max(list_transform(list_distinct(words), w -> len(list_filter(words, x -> x = w)))) AS BIGINT) AS max_freq
         |  FROM w)
         |SELECT doc_id, wc,
         |  wc >= 30 AND wc <= 90 AS wc_ok,
         |  chars >= wc * 4 AND chars <= wc * 5 AS mwl_ok,
         |  n_stop >= 2 AS stop_ok,
         |  max_freq * 8 <= wc AS rep_ok,
         |  (wc >= 30 AND wc <= 90) AND (chars >= wc * 4 AND chars <= wc * 5)
         |    AND n_stop >= 2 AND max_freq * 8 <= wc AS passes
         |FROM f ORDER BY doc_id""".stripMargin),
    QueryDef.sql(
      "t09_sequence_packing",
      (spark, dir) => sequencePacking(spark, dir),
      """WITH t AS (
        |  SELECT doc_id, lang, doc_id // 128 AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |  FROM documents),
        |c AS (
        |  SELECT lang, shard, doc_id, tokens,
        |    COALESCE(SUM(tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM t)
        |SELECT lang, CAST(shard AS BIGINT) AS shard, doc_id, tokens,
        |  CAST(cum_before // 512 AS BIGINT) AS start_block,
        |  CAST((cum_before + tokens - 1) // 512 AS BIGINT) AS end_block,
        |  CAST(cum_before % 512 AS BIGINT) AS block_offset
        |FROM c ORDER BY lang, shard, doc_id""".stripMargin),
    // Exact-integer temperature weighting: floor(sqrt) numerators, an
    // integer denominator, one rounded double division — both engines
    // agree to the last digit (see mixtureWeights doc).
    QueryDef.sql(
      "t11_mixture_weights",
      (spark, dir) => mixtureWeights(spark, dir),
      """WITH g AS (
        |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY lang, source),
        |w AS (SELECT *, CAST(floor(sqrt(tokens)) AS BIGINT) AS wn FROM g)
        |SELECT lang, source, docs, tokens,
        |  ROUND(CAST(wn AS DOUBLE) / (SELECT SUM(wn) FROM w), 6) AS sample_weight
        |FROM w ORDER BY lang, source""".stripMargin),
    // The oracle replays the quantized-integer LM exactly: same add-one
    // smoothing, same integer division, same reference slice.
    QueryDef.sql(
      "t12_lm_quality_scores",
      lmQualityScores,
      """WITH w AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents),
        |bg AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(0, len(words)-1),
        |      i -> {'w1': words[i+1], 'w2': words[i+2]})) AS s
        |  FROM w WHERE len(words) >= 2),
        |bg2 AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM bg),
        |c2 AS (SELECT w1, w2, COUNT(*) AS c2v FROM bg2 WHERE doc_id % 10 = 0 GROUP BY w1, w2),
        |c1 AS (SELECT w1, COUNT(*) AS c1v FROM bg2 WHERE doc_id % 10 = 0 GROUP BY w1),
        |vv AS (SELECT COUNT(DISTINCT u) AS v FROM
        |  (SELECT unnest(words) AS u FROM w WHERE doc_id % 10 = 0)),
        |scored AS (
        |  SELECT t.doc_id,
        |    (1000000 * (COALESCE(c2.c2v, 0) + 1)) // (COALESCE(c1.c1v, 0) + vv.v) AS q
        |  FROM bg2 t
        |  LEFT JOIN c2 ON t.w1 = c2.w1 AND t.w2 = c2.w2
        |  LEFT JOIN c1 ON t.w1 = c1.w1
        |  CROSS JOIN vv
        |  WHERE t.doc_id % 10 <> 0),
        |agg AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |    CAST(SUM(q) AS BIGINT) AS lm_score
        |  FROM scored GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, lm_score,
        |  ROUND(CAST(lm_score AS DOUBLE) / n_bigrams, 4) AS mean_q,
        |  CASE WHEN lm_score >= n_bigrams * 34000 THEN 'head'
        |       WHEN lm_score >= n_bigrams * 31000 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM agg ORDER BY doc_id""".stripMargin),
    // The composed pipeline's oracle chains the three standalone
    // oracles' logic in one CTE sequence — same digests, same integer
    // gates, same Knuth ranking.
    QueryDef.sql(
      "t13_pipeline_dedup_filter_sample",
      (spark, dir) => pipelineSample(spark, dir),
      s"""WITH dedup AS (
         |  SELECT * FROM (
         |    SELECT doc_id, text, lang,
         |      ROW_NUMBER() OVER (PARTITION BY MD5(text) ORDER BY doc_id) AS rn1
         |    FROM documents) WHERE rn1 = 1),
         |gate AS (
         |  SELECT doc_id, lang, wc FROM (
         |    SELECT doc_id, lang, string_split(lower(text), ' ') AS words,
         |      CAST(len(string_split(text, ' ')) AS BIGINT) AS wc,
         |      CAST(len(text) - (len(string_split(text, ' ')) - 1) AS BIGINT) AS chars
         |    FROM dedup)
         |  WHERE wc >= 30 AND wc <= 90
         |    AND chars >= wc * 4 AND chars <= wc * 5
         |    AND len(list_distinct(list_filter(words, x -> x IN (${stopwords.map("'" + _ + "'").mkString(",")})))) >= 2
         |    AND CAST(list_max(list_transform(list_distinct(words),
         |      w -> len(list_filter(words, x -> x = w)))) AS BIGINT) * 8 <= wc),
         |ranked AS (
         |  SELECT doc_id, lang, wc,
         |    ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rank
         |  FROM gate)
         |SELECT doc_id, lang, CAST(rank AS BIGINT) AS rank, wc AS n_words
         |FROM ranked WHERE rank <= 25 ORDER BY doc_id""".stripMargin),
    QueryDef.sql(
      "t15_url_dedup",
      urlDedup,
      """WITH dirty AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 5 AS INT)
        |      WHEN 0 THEN 'https://www.example.com/docs/' || (doc_id % 100)
        |      WHEN 1 THEN 'HTTPS://WWW.EXAMPLE.COM/docs/' || (doc_id % 100)
        |      WHEN 2 THEN 'https://www.example.com/docs/' || (doc_id % 100) || '/'
        |      WHEN 3 THEN 'https://www.example.com/docs/' || (doc_id % 100)
        |        || '?utm_source=feed&utm_campaign=sync'
        |      ELSE 'https://www.example.com/docs/' || (doc_id % 100) || '#section-2'
        |    END AS url
        |  FROM documents),
        |stripped AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(
        |      regexp_replace(url, '#.*$', ''), 'utm_[^&#]*&?', '', 'g'), '[?&]$', '') AS u2
        |  FROM dirty),
        |canon AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      lower(regexp_extract(u2, '^([^/]*//[^/]+)', 1))
        |        || regexp_extract(u2, '^[^/]*//[^/]+(.*)$', 1),
        |      '/$', '') AS canonical_url
        |  FROM stripped)
        |SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_variants,
        |  CAST(MIN(doc_id) AS BIGINT) AS keep_doc
        |FROM canon GROUP BY canonical_url ORDER BY canonical_url""".stripMargin),
    QueryDef.sql(
      "t16_frequent_ngrams",
      frequentNgrams,
      """WITH w AS (SELECT doc_id, string_split(lower(text),' ') AS words FROM documents),
        |g AS (SELECT unnest(CASE WHEN len(words) >= 2
        |    THEN list_transform(range(0, len(words)-1),
        |      i -> array_to_string(words[i+1:i+2], ' '))
        |    ELSE [] END) AS gram FROM w),
        |t AS (SELECT GREATEST(2, COUNT(*) // 1000) AS th FROM g)
        |SELECT gram, CAST(COUNT(*) AS BIGINT) AS n
        |FROM g, t GROUP BY gram, t.th HAVING COUNT(*) >= t.th
        |ORDER BY n DESC, gram""".stripMargin)
  )
}
