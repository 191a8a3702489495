package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}

import graft.SparkTestBase

/**
 * Physical-plan guards for the queries whose 100 TB story depends on a
 * specific plan shape. A correctness-green query whose plan silently
 * degrades (broadcast → shuffle join, pushdown lost, accidental
 * cartesian) passes every oracle and still dies at scale — these
 * assertions fail the build instead.
 */
class PlanGuardSpec extends SparkTestBase {

  private def executed(df: DataFrame): SparkPlan = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan
  }

  /** Full walk across AQE boundaries: materialized query stages and
    * reused exchanges hold their subtrees outside `children`. */
  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    p +: kids.flatMap(walk)
  }

  private def collectAll[A](p: SparkPlan)(f: PartialFunction[SparkPlan, A]): Seq[A] =
    walk(p).collect(f)

  test("q06 broadcast join: the part dimension is broadcast, never shuffled") {
    val plan = executed(SparkEntryLookup("q06_broadcast_join_part_agg")(spark, sf0001))
    val bhj = collectAll(plan) { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty, s"expected a BroadcastHashJoin in:\n$plan")
  }

  test("dedup/ANN pipelines never degenerate into a cartesian product") {
    for (name <- Seq("d02_minhash_lsh_dedup", "d04_ngram_jaccard", "d06_duplicate_groups",
        "s02_ann_ivf_topk", "s05_ann_ivfpq_topk")) {
      val plan = executed(SparkEntryLookup(name)(spark, sf0001))
      val cart = collectAll(plan) { case c: CartesianProductExec => c }
      assert(cart.isEmpty, s"$name plans a CartesianProduct:\n$plan")
    }
  }

  test("s08 knn join: no broadcast of the corpus-scale query set, no nested-loop join") {
    // the k-NN JOIN's query side is ~14% of the corpus — the plan must
    // be cell-assign projections + ONE equi-join on cell, with no
    // cartesian and no BroadcastNestedLoopJoin anywhere (s01-s07's
    // broadcast-queries crossJoin shape would OOM the driver here)
    val plan = executed(SparkEntryLookup("s08_knn_join")(spark, sf0001))
    val cart = collectAll(plan) { case c: CartesianProductExec => c }
    assert(cart.isEmpty, s"s08 plans a CartesianProduct:\n$plan")
    val bnlj = collectAll(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bnlj.isEmpty, s"s08 plans a BroadcastNestedLoopJoin:\n$plan")
  }

  test("t-ops per-row pipelines are shuffle-free below their final aggregation") {
    // t01/t02 are pure per-row projections + a global sort for output
    // ordering: at most ONE exchange (the ordering), never a join/agg
    // shuffle chain
    for (name <- Seq("t02_quality_scores", "t04_fingerprints")) {
      val plan = executed(SparkEntryLookup(name)(spark, sf0001))
      val shuffles = collectAll(plan) { case s: ShuffleExchangeExec => s }
      assert(shuffles.size <= 1,
        s"$name should shuffle at most once (output ordering), " +
          s"got ${shuffles.size}:\n$plan")
    }
  }

  test("d08 substring dedup: only the linear corpus spread moves text; gram shuffles carry digests") {
    val plan = executed(SparkEntryLookup("d08_substring_dedup")(spark, sf0001))
    val cart = collectAll(plan) { case c: CartesianProductExec => c }
    assert(cart.isEmpty, s"d08 plans a CartesianProduct:\n$plan")
    val shuffles = collectAll(plan) { case s: ShuffleExchangeExec => s }
    // Dedup.spread's one-time doc_id repartition is the only shuffle
    // allowed to carry raw text (linear, pre-explode); every shuffle of
    // the EXPLODED gram stream (output has the gram digest column `g`)
    // must carry digests only
    // distinct instances: walk() descends into ReusedExchangeExec, so a
    // single reused spread exchange shows up once per consumer
    val textShuffles = shuffles.filter(_.output.map(_.name).contains("text"))
      .map(s => System.identityHashCode(s)).distinct
    assert(textShuffles.size <= 1,
      s"d08 moves raw text through ${textShuffles.size} distinct shuffles:\n$plan")
    shuffles.filter(_.output.map(_.name).contains("g")).foreach { s =>
      val cols = s.output.map(_.name)
      assert(!cols.contains("text"),
        s"d08's gram-level shuffle carries document text: ${cols.mkString(",")}")
    }
  }

  test("t12 LM scoring broadcasts the vocab scalar; model joins stay hash joins") {
    val plan = executed(SparkEntryLookup("t12_lm_quality_scores")(spark, sf0001))
    // the vocab-size scalar rides a broadcast nested loop (1 row), and
    // the c2/c1 model joins must not degenerate into cartesians
    val cart = collectAll(plan) { case c: CartesianProductExec => c }
    assert(cart.isEmpty, s"t12 plans a CartesianProduct:\n$plan")
    val bcast = collectAll(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      case b: BroadcastHashJoinExec => b
    }
    assert(bcast.nonEmpty, s"expected the broadcast vocab join in:\n$plan")
  }

  test("q35 HLL sketch aggregates registers, never shuffling raw rows twice") {
    val plan = executed(SparkEntryLookup("q35_hll_distinct_sketch")(spark, sf0001))
    // every shuffle below the estimate carries register/bucket columns
    // or the exact-count branch's group key — none carries the raw
    // o_custkey hash input column `h`
    val shuffles = collectAll(plan) { case s: ShuffleExchangeExec => s }
    shuffles.foreach { s =>
      val cols = s.output.map(_.name)
      assert(!cols.contains("h"),
        s"q35 shuffles raw hash strings: ${cols.mkString(",")}")
    }
  }

  test("s06 recall eval broadcasts queries; corpus is never re-shuffled per branch") {
    val plan = executed(SparkEntryLookup("s06_ann_recall_eval")(spark, sf0001))
    val cart = collectAll(plan) { case c: CartesianProductExec => c }
    // ground truth is an explicit broadcast cross join (queries × corpus)
    // — allowed; what must NOT appear is a shuffle-side cartesian
    assert(cart.isEmpty, s"s06 plans a non-broadcast CartesianProduct:\n$plan")
  }

  test("s07 SQ8: broadcast-only candidate scan, no shuffle-side cartesian") {
    val plan = executed(SparkEntryLookup("s07_ann_sq8_topk")(spark, sf0001))
    val cart = collectAll(plan) { case c: CartesianProductExec => c }
    assert(cart.isEmpty, s"s07 plans a non-broadcast CartesianProduct:\n$plan")
  }

  test("d09 ingest dedup: the store join shuffles band keys, never document text") {
    val plan = executed(SparkEntryLookup("d09_incremental_ingest_dedup")(spark, sf0001))
    val cart = collectAll(plan) { case c: CartesianProductExec => c }
    assert(cart.isEmpty, s"d09 plans a CartesianProduct:\n$plan")
    // any shuffle carrying a band key must not carry raw text: the
    // store side is (dup_of, band, bkey) rows and the batch side bands
    // are (doc_id, band, bkey) — 24-byte rows at any corpus size
    val shuffles = collectAll(plan) { case s: ShuffleExchangeExec => s }
    shuffles.filter(_.output.map(_.name).contains("bkey")).foreach { s =>
      val cols = s.output.map(_.name)
      assert(!cols.contains("text"),
        s"d09's band-key shuffle carries document text: ${cols.mkString(",")}")
    }
    // the exact-verify pass is STORE-resident: its corpus side scans
    // the persisted shingle store, and every scan of the raw documents
    // table serves the BATCH only — ingest cost is candidate/batch-
    // proportional, never corpus-proportional (no per-ingest
    // re-tokenization of the corpus)
    val scans = collectAll(plan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val scanPaths = scans.map(_.relation.location.rootPaths.mkString(","))
    assert(scanPaths.exists(_.contains("graft_dedup_index")),
      s"d09's verify pass reads no persisted store; scans:\n${scanPaths.mkString("\n")}")
    assert(scanPaths.exists(_.contains("shingles")),
      s"d09's verify pass does not read the shingle store; scans:\n${scanPaths.mkString("\n")}")
    val docScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains("documents.parquet")))
    docScans.foreach { f =>
      val filters = f.dataFilters.map(_.sql).mkString(" AND ")
      assert(filters.contains("% 4") || filters.contains("%4"),
        s"d09 scans the documents table WITHOUT the batch predicate — the corpus " +
          s"is being re-read at ingest. dataFilters: [$filters]\n$plan")
    }
  }

  test("s09 incremental ANN: ingest reads the persisted cell store; no corpus re-assignment") {
    val plan = executed(SparkEntryLookup("s09_incremental_ann")(spark, sf0001))
    assert(collectAll(plan) { case c: CartesianProductExec => c }.isEmpty,
      s"s09 plans a CartesianProduct:\n$plan")
    val scans = collectAll(plan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val scanPaths = scans.map(_.relation.location.rootPaths.mkString(","))
    // the corpus side is the persisted cell-partitioned Delta store
    assert(scanPaths.exists(_.contains("graft_ann_index")),
      s"s09 reads no persisted cell store; scans:\n${scanPaths.mkString("\n")}")
    // every scan of the raw embeddings serves the BATCH only — the
    // corpus is never re-assigned at ingest (that job ran once, at
    // store build, outside this plan)
    val embScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains("embeddings.parquet")))
    assert(embScans.nonEmpty)
    embScans.foreach { f =>
      val filters = f.dataFilters.map(_.sql).mkString(" AND ")
      assert(filters.contains("% 7") || filters.contains("%7"),
        s"s09 scans the embeddings table WITHOUT the batch predicate — corpus " +
          s"re-assignment at ingest: $filters")
    }
    // the probed-cell literals prune the store read to probed partitions
    val storeScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains("graft_ann_index")))
    storeScans.foreach { f =>
      assert(f.partitionFilters.nonEmpty,
        s"s09's store scan carries no partition filter — probes read every cell:\n$f")
    }
  }

  test("s10 filtered ANN: the label predicate pre-filters the corpus scan itself") {
    // single-stage pre-filtering: selectivity must multiply the WHOLE
    // pipeline, so the label predicate has to reach the corpus-side
    // parquet scan as a data filter — a post-filter above the ranking
    // would pass every oracle and still rank label-foreign vectors at
    // 100 TB (and silently return < k under selective predicates)
    val plan = executed(SparkEntryLookup("s10_ann_filtered")(spark, sf0001))
    assert(collectAll(plan) { case c: CartesianProductExec => c }.isEmpty,
      s"s10 plans a CartesianProduct:\n$plan")
    val scans = collectAll(plan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val labelScans = scans.filter(_.dataFilters.map(_.sql).mkString(" ").contains("label"))
    assert(labelScans.nonEmpty,
      s"s10's label predicate reached no scan — it is being applied " +
        s"post-ranking. scans:\n${scans.map(_.dataFilters.map(_.sql).mkString(",")).mkString("\n")}")
  }

  test("s11 filtered store ANN: pushed label filter AND partition prune land on ONE store scan") {
    // the production filtered-vector-search shape: the standing cell
    // store is read with the probed-cell partition prune (s09's
    // contract) AND the label predicate as a pushed data filter on the
    // SAME scan (s10's contract) — selectivity multiplies; no corpus
    // re-assignment, nothing label-foreign ranks
    val plan = executed(SparkEntryLookup("s11_ann_filtered_store")(spark, sf0001))
    assert(collectAll(plan) { case c: CartesianProductExec => c }.isEmpty,
      s"s11 plans a CartesianProduct:\n$plan")
    val scans = collectAll(plan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val storeScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains("graft_ann_index")))
    assert(storeScans.nonEmpty,
      s"s11 reads no persisted cell store; scans:\n${scans.mkString("\n")}")
    storeScans.foreach { f =>
      assert(f.partitionFilters.nonEmpty,
        s"s11's store scan carries no partition filter — probes read every cell:\n$f")
      assert(f.dataFilters.map(_.sql).mkString(" ").contains("label"),
        s"s11's label predicate did not reach the store scan — it is applied " +
          s"post-ranking. dataFilters: ${f.dataFilters.map(_.sql).mkString(",")}\n$plan")
    }
    // raw embeddings scans serve the query batch only
    val embScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains("embeddings.parquet")))
    embScans.foreach { f =>
      val filters = f.dataFilters.map(_.sql).mkString(" AND ")
      assert(filters.contains("% 7") || filters.contains("%7"),
        s"s11 scans the embeddings table WITHOUT the batch predicate: $filters")
    }
  }

  test("t14 pipeline: MERGE and DELETE both route through the key index, never a table scan") {
    // the composed ingest pipeline (d09 dedup → d10 pick → keyed MERGE +
    // deleteMatching) must exercise f23's EXACT routing on both
    // mutations: the standing table's files interleave doc_id ranges by
    // construction, so the range fallback would keep every file — only
    // the index-routed path skips non-hit files (proven constructively
    // in DeltaKeyIndexSpec; pinned here via the routed-scan counter)
    val before = graft.delta.DeltaTable.indexRoutedScans.get()
    val out = graft.operators.Dedup.dedupMergePipeline(spark, sf0001)
    assert(out.count() > 0)
    val routed = graft.delta.DeltaTable.indexRoutedScans.get() - before
    assert(routed >= 2,
      s"expected the MERGE and the DELETE to be index-routed; routed scans = $routed")
  }

  test("t16 frequent n-grams: gram text only shuffles AFTER the hot-digest broadcast") {
    // pass 1's corpus-wide shuffle must carry the 8-byte digest, never
    // the gram strings; any shuffle that does carry gram text is the
    // candidate-sized verify pass and must sit above the broadcast
    // semi-join that shrank it
    val plan = executed(SparkEntryLookup("t16_frequent_ngrams")(spark, sf0001))
    val shuffles = collectAll(plan) { case s: ShuffleExchangeExec => s }
    assert(shuffles.nonEmpty)
    assert(shuffles.exists(!_.output.map(_.name).contains("gram")),
      "no digest-only shuffle found — pass 1 is shuffling gram text")
    shuffles.filter(_.output.map(_.name).contains("gram")).foreach { s =>
      assert(collectAll(s) { case b: BroadcastHashJoinExec => b }.nonEmpty,
        s"a gram-text shuffle without the hot-digest broadcast below it — " +
          s"the full corpus text is shuffling: ${s.output.map(_.name).mkString(",")}")
    }
  }

  test("d11 line dedup: the winner election shuffles digests; text only moves doc-keyed") {
    val plan = executed(SparkEntryLookup("d11_line_dedup")(spark, sf0001))
    val shuffles = collectAll(plan) { case s: ShuffleExchangeExec => s }
    assert(shuffles.nonEmpty)
    shuffles.foreach { s =>
      val cols = s.output.map(_.name)
      // the per-line election rows are (dig, doc_id, lid) — a `text`,
      // `words` or `lines` column there would mean per-line text is
      // riding the corpus-wide shuffle
      if (cols.contains("dig"))
        assert(!cols.exists(Set("text", "words", "lines")),
          s"d11's election shuffles line text: ${cols.mkString(",")}")
      // document-sized rows move only keyed by doc_id (spread + join)
      if (cols.exists(Set("text", "words", "lines"))) {
        val part = s.outputPartitioning.toString
        assert(part.contains("doc_id"),
          s"d11 moves document text on a non-doc_id shuffle: $part / ${cols.mkString(",")}")
      }
    }
  }

  test("s12 store maintenance: the probe reads the MAINTAINED store pruned; no corpus job") {
    val plan = executed(SparkEntryLookup("s12_ann_store_maintenance")(spark, sf0001))
    assert(collectAll(plan) { case c: CartesianProductExec => c }.isEmpty,
      s"s12 plans a CartesianProduct:\n$plan")
    val scans = collectAll(plan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val storeScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains("graft_ann_maint")))
    assert(storeScans.nonEmpty,
      s"s12 reads no maintained cell store; scans:\n${scans.mkString("\n")}")
    storeScans.foreach { f =>
      assert(f.partitionFilters.nonEmpty,
        s"s12's store scan carries no partition filter — probes read every cell:\n$f")
    }
    // raw embeddings scans serve the query batch only — the retire +
    // refresh passes ran once at maintenance time, outside this plan
    val embScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains("embeddings.parquet")))
    assert(embScans.nonEmpty)
    embScans.foreach { f =>
      val filters = f.dataFilters.map(_.sql).mkString(" AND ")
      assert(filters.contains("% 7") || filters.contains("%7"),
        s"s12 scans the embeddings table WITHOUT the batch predicate: $filters")
    }
  }

  test("d01 exact dedup shuffles digests, not document text") {
    val plan = executed(SparkEntryLookup("d01_exact_dedup")(spark, sf0001))
    val shuffles = collectAll(plan) { case s: ShuffleExchangeExec => s }
    assert(shuffles.nonEmpty)
    // no shuffle carries the raw `text` column — only the 32-byte digest
    shuffles.foreach { s =>
      val cols = s.output.map(_.name)
      assert(!cols.contains("text"),
        s"d01 shuffles the document text: ${cols.mkString(",")}")
    }
  }
}

/** Name → query fn resolution through the driver contract. */
private object SparkEntryLookup {
  def apply(name: String): (org.apache.spark.sql.SparkSession, String) => DataFrame =
    graft.SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(s"no query named $name"))
}
