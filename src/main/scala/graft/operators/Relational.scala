package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/**
 * Plane-B relational surface (SURVEY.md §2.11): the queries the reference
 * guarantees answer identically across formats (its ITs verify them on
 * Spark — ref `core/src/test/java/io/onetable/ITOneTableClient.java:748-813`).
 * Implemented purely with the declarative DataFrame API so Catalyst keeps
 * pushdown/pruning/join-selection; all joins against the small dimension
 * tables are explicitly broadcast.
 */
object Relational {

  private def dec(c: Column, s: Int = 2): Column = c.cast(DecimalType(18, s))

  /**
   * Order-independent exact sum of a money-ish double column. The sum is
   * computed in DECIMAL (exact, shuffle-order-independent) and the FINAL
   * value cast to DOUBLE: a decimal→double cast is a single correctly-
   * rounded operation in both Spark (BigDecimal.doubleValue) and DuckDB
   * (unscaled/10^s, unscaled < 2^53 here), so the two engines produce
   * bit-identical doubles — while decimal *output* columns hash-mismatch
   * in the driver's compare whenever the printed scale differs from the
   * float repr (e.g. 1524135.00 vs 1524135.0).
   */
  private def dsum(c: Column, s: Int = 2): Column = sum(dec(c, s)).cast(DoubleType)
  /** Deterministic avg: exact decimal sum, then one double division. */
  private def davg(c: Column, cnt: Column, s: Int = 2): Column =
    sum(dec(c, s)).cast(DoubleType) / cnt

  val defs: Seq[QueryDef] = Seq(

    // ---- aggregation ----------------------------------------------------
    QueryDef.sql(
      "q01_agg_pricing_summary",
      (spark, dir) => {
        val l = Tables.lineitem(spark, dir)
        l.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
              .cast(DoubleType).as("sum_disc_price"),
            davg(col("l_quantity"), count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // ---- filter + projection (pushdown-friendly) ------------------------
    QueryDef.sql(
      "q02_filter_project",
      (spark, dir) =>
        Tables.lineitem(spark, dir)
          .filter(col("l_quantity") > 30 && col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem WHERE l_quantity > 30 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // ---- shuffled 3-way join + agg (TPC-H Q3 shape) ---------------------
    QueryDef.sql(
      "q03_join_agg_shipping_priority",
      (spark, dir) => {
        val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1998-03-15").cast(TimestampType))
        val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("1996-03-15").cast(TimestampType))
        // customer is tiny relative to orders/lineitem: broadcast it; the
        // orders-lineitem join shuffles on the join key only after both
        // sides were filtered and pruned.
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      """SELECT l_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),

    // ---- semi / anti joins ----------------------------------------------
    QueryDef.sql(
      "q04_semi_join_exists",
      (spark, dir) => {
        val o = Tables.orders(spark, dir)
        val l = Tables.lineitem(spark, dir).filter(col("l_quantity") > 45)
        o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin),

    QueryDef.sql(
      "q05_anti_join_not_exists",
      (spark, dir) => {
        val c = Tables.customer(spark, dir)
        val o = Tables.orders(spark, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
          .orderBy(col("c_custkey"))
      },
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin),

    // ---- broadcast dimension join ---------------------------------------
    QueryDef.sql(
      "q06_broadcast_join_part_agg",
      (spark, dir) => {
        val l = Tables.lineitem(spark, dir)
        val p = Tables.part(spark, dir)
        l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
          .orderBy(col("p_brand"))
      },
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin),

    // ---- 6-way join through the star schema (TPC-H Q5 shape) ------------
    QueryDef.sql(
      "q07_multi_join_local_supplier_volume",
      (spark, dir) => {
        val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
        val n = Tables.nation(spark, dir)
        val c = Tables.customer(spark, dir)
        val s = Tables.supplier(spark, dir)
        val o = Tables.orders(spark, dir)
        val l = Tables.lineitem(spark, dir)
        // All dimensions (region/nation/customer/supplier) broadcast; the
        // only shuffle joins are fact-to-fact on orderkey.
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(s), l("l_suppkey") === s("s_suppkey") && c("c_nationkey") === s("s_nationkey"))
          .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast(DoubleType).as("revenue"))
          .orderBy(col("n_name"))
      },
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin),

    // ---- window: ranking -------------------------------------------------
    QueryDef.sql(
      "q08_window_topn_per_group",
      (spark, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(spark, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin),

    // ---- window: running aggregate + lag --------------------------------
    QueryDef.sql(
      "q09_window_running_sum_lag",
      (spark, dir) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(spark, dir)
          .select(col("event_id"), col("user_id"), col("value"))
          .withColumn("running_value", sum(dec(col("value"))).over(run).cast(DoubleType))
          .withColumn("prev_event", lag(col("event_id"), 1).over(byUser))
          .orderBy(col("event_id"))
      },
      """SELECT event_id, user_id, value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
        |  LAG(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_event
        |FROM events ORDER BY event_id""".stripMargin),

    // ---- grouping sets / rollup / cube ----------------------------------
    QueryDef.sql(
      "q10_rollup",
      (spark, dir) =>
        Tables.lineitem(spark, dir)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),

    QueryDef.sql(
      "q11_cube",
      (spark, dir) =>
        Tables.orders(spark, dir)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin),

    QueryDef.sql(
      "q12_grouping_sets",
      (spark, dir) =>
        // Dataset.groupingSets (Spark 4) — no temp-view registration, so
        // concurrent sessions sharing one SparkSession can't collide
        Tables.orders(spark, dir)
          .groupingSets(
            Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin),

    // ---- distinct aggregation -------------------------------------------
    QueryDef.sql(
      "q13_count_distinct",
      (spark, dir) =>
        Tables.lineitem(spark, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("distinct_parts"),
            countDistinct(col("l_suppkey")).as("distinct_supps"),
            count(lit(1)).as("cnt"))
          .orderBy(col("l_returnflag")),
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS distinct_parts,
        |  COUNT(DISTINCT l_suppkey) AS distinct_supps,
        |  COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- sort + limit (top-k) -------------------------------------------
    QueryDef.sql(
      "q14_sort_limit_topk",
      (spark, dir) =>
        Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20),
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin),

    // ---- set operations --------------------------------------------------
    QueryDef.sql(
      "q15_union_distinct",
      (spark, dir) => {
        val a = Tables.customer(spark, dir).filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("custkey"))
        val b = Tables.orders(spark, dir).filter(col("o_totalprice") > 100000)
          .select(col("o_custkey").as("custkey"))
        a.union(b).distinct().orderBy(col("custkey"))
      },
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
        |UNION
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
        |ORDER BY custkey""".stripMargin),

    QueryDef.sql(
      "q16_except",
      (spark, dir) => {
        val a = Tables.customer(spark, dir).select(col("c_custkey").as("custkey"))
        val b = Tables.orders(spark, dir).select(col("o_custkey").as("custkey"))
        a.except(b).orderBy(col("custkey"))
      },
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin),

    QueryDef.sql(
      "q17_intersect",
      (spark, dir) => {
        val a = Tables.customer(spark, dir).filter(col("c_acctbal") > 7000)
          .select(col("c_custkey").as("custkey"))
        val b = Tables.orders(spark, dir).select(col("o_custkey").as("custkey"))
        a.intersect(b).orderBy(col("custkey"))
      },
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 7000
        |INTERSECT SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin),

    // ---- scalar string functions ----------------------------------------
    QueryDef.sql(
      "q18_string_functions",
      (spark, dir) =>
        Tables.part(spark, dir)
          .filter(col("p_name").like("%a%"))
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("name_upper"),
            substring(col("p_type"), 1, 5).as("type_prefix"),
            length(col("p_name")).cast(LongType).as("name_len"),
            concat_ws("#", col("p_brand"), col("p_type")).as("brand_type"),
            regexp_replace(col("p_name"), "[aeiou]", "_").as("name_novowel"))
          .orderBy(col("p_partkey")),
      """SELECT p_partkey, UPPER(p_name) AS name_upper,
        |  SUBSTRING(p_type, 1, 5) AS type_prefix,
        |  CAST(LENGTH(p_name) AS BIGINT) AS name_len,
        |  CONCAT_WS('#', p_brand, p_type) AS brand_type,
        |  REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS name_novowel
        |FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey""".stripMargin),

    // ---- date/time functions --------------------------------------------
    QueryDef.sql(
      "q19_date_functions",
      (spark, dir) =>
        Tables.orders(spark, dir)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast(IntegerType).as("y"),
            month(col("o_orderdate")).cast(IntegerType).as("m"),
            dayofmonth(col("o_orderdate")).cast(IntegerType).as("d"),
            date_trunc("month", col("o_orderdate")).cast(DateType).as("month_start"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("date_str"))
          .filter(col("y") === 1997)
          .orderBy(col("o_orderkey")),
      """SELECT o_orderkey,
        |  CAST(YEAR(o_orderdate) AS INTEGER) AS y,
        |  CAST(MONTH(o_orderdate) AS INTEGER) AS m,
        |  CAST(DAY(o_orderdate) AS INTEGER) AS d,
        |  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
        |  STRFTIME(o_orderdate, '%Y-%m-%d') AS date_str
        |FROM orders WHERE YEAR(o_orderdate) = 1997 ORDER BY o_orderkey""".stripMargin),

    // ---- conditional + math ---------------------------------------------
    QueryDef.sql(
      "q20_case_math",
      (spark, dir) =>
        Tables.lineitem(spark, dir)
          .filter(col("l_orderkey") % 100 === 0)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            when(col("l_discount") > 0.05, "HIGH").otherwise("LOW").as("disc_band"),
            floor(col("l_quantity")).cast(LongType).as("qty_floor"),
            ceil(col("l_tax") * 100).cast(LongType).as("tax_pct_ceil"),
            abs(col("l_quantity") - 25).as("qty_dev"),
            (col("l_orderkey") % 7).cast(LongType).as("mod7"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_discount > 0.05 THEN 'HIGH' ELSE 'LOW' END AS disc_band,
        |  CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
        |  CAST(CEIL(l_tax * 100) AS BIGINT) AS tax_pct_ceil,
        |  ABS(l_quantity - 25) AS qty_dev,
        |  CAST(l_orderkey % 7 AS BIGINT) AS mod7
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // ---- array functions: explode / element access ----------------------
    QueryDef.sql(
      "q21_array_explode",
      (spark, dir) =>
        Tables.embeddings(spark, dir)
          .filter(col("vec_id") < 20)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "val")))
          .select(col("vec_id"), (col("pos0") + 1).cast(LongType).as("pos"), col("val"))
          .orderBy(col("vec_id"), col("pos")),
      """SELECT vec_id,
        |  CAST(UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS BIGINT) AS pos,
        |  UNNEST(embedding) AS val
        |FROM embeddings WHERE vec_id < 20 ORDER BY vec_id, pos""".stripMargin),

    QueryDef.sql(
      "q22_array_access",
      (spark, dir) =>
        Tables.embeddings(spark, dir)
          .select(
            col("vec_id"),
            size(col("embedding")).cast(LongType).as("dim"),
            element_at(col("embedding"), 1).as("first_val"),
            element_at(col("embedding"), 64).as("last_val"),
            col("label"))
          .orderBy(col("vec_id")),
      """SELECT vec_id, CAST(LEN(embedding) AS BIGINT) AS dim,
        |  embedding[1] AS first_val, embedding[64] AS last_val, label
        |FROM embeddings ORDER BY vec_id""".stripMargin),

    // ---- JSON extraction -------------------------------------------------
    QueryDef.sql(
      "q23_json_extract",
      (spark, dir) =>
        Tables.events(spark, dir)
          .select(
            col("event_id"),
            col("event_type"),
            get_json_object(col("props"), "$.k").cast(IntegerType).as("prop_k"))
          .filter(col("prop_k") > 50)
          .orderBy(col("event_id")),
      """SELECT event_id, event_type,
        |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) AS prop_k
        |FROM events
        |WHERE CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) > 50
        |ORDER BY event_id""".stripMargin),

    // ---- left outer join with null-generating side ----------------------
    QueryDef.sql(
      "q24_left_join_count",
      (spark, dir) => {
        val c = Tables.customer(spark, dir)
        val o = Tables.orders(spark, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("order_count"))
          .orderBy(col("c_custkey"))
      },
      """SELECT c_custkey, COUNT(o_orderkey) AS order_count
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin),

    // ---- having + scalar subquery ---------------------------------------
    QueryDef.sql(
      "q25_having_scalar_subquery",
      (spark, dir) => {
        val o = Tables.orders(spark, dir)
        // scalar subquery as a broadcast crossJoin of the aggregated
        // singleton — the whole plan stays lazy and cluster-shippable
        // (no driver round-trip for the global average)
        val stats = o.agg(davg(col("o_totalprice"), count(lit(1))).as("avg_price"))
        o.groupBy(col("o_custkey"))
          .agg(dsum(col("o_totalprice")).as("total_spend"), count(lit(1)).as("n_orders"))
          .crossJoin(org.apache.spark.sql.functions.broadcast(stats))
          .filter(col("n_orders") >= 3 && col("total_spend") > col("avg_price") * 3)
          .drop("avg_price")
          .orderBy(col("o_custkey"))
      },
      """SELECT o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
        |  COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY o_custkey
        |HAVING COUNT(*) >= 3 AND CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) >
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders) * 3
        |ORDER BY o_custkey""".stripMargin),

    // ---- exact percentiles ----------------------------------------------
    QueryDef.sql(
      "q26_percentiles",
      (spark, dir) =>
        Tables.lineitem(spark, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            expr("percentile(l_quantity, 0.5)").as("median_qty"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"))
          .orderBy(col("l_returnflag")),
      """SELECT l_returnflag,
        |  QUANTILE_CONT(l_quantity, 0.5) AS median_qty,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- correlated-style aggregation (TPC-H Q4 shape) ------------------
    QueryDef.sql(
      "q27_order_priority_check",
      (spark, dir) => {
        val o = Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
            col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
        val l = Tables.lineitem(spark, dir).filter(col("l_quantity") > 48)
        o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 48)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // ---- event-time tumbling window over the stream table ---------------
    QueryDef.sql(
      "q28_event_hourly_window",
      (spark, dir) =>
        graft.sources.Events.normalized(spark, dir)
          .groupBy(date_trunc("hour", col("ts_us")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
          .orderBy(col("hour"), col("event_type")),
      """SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hour, event_type,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),

    // Sliding event-time windows (15 min / slide 5): Spark's window()
    // assigns each event to 3 epoch-aligned windows; the oracle
    // reproduces the assignment by exploding the 3 candidate starts.
    QueryDef.sql(
      "q29_event_sliding_window",
      (spark, dir) =>
        graft.sources.Events.normalized(spark, dir)
          .groupBy(window(col("ts_us"), "15 minutes", "5 minutes").as("w"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
          .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
            col("cnt"), col("sum_value"))
          .orderBy(col("w_start")),
      """SELECT CAST(to_timestamp((CAST(floor(epoch(ts)/300) AS BIGINT) - i)*300) AS TIMESTAMP) AS w_start,
        |  CAST(to_timestamp((CAST(floor(epoch(ts)/300) AS BIGINT) - i)*300 + 900) AS TIMESTAMP) AS w_end,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events, (SELECT unnest([0,1,2]) AS i)
        |GROUP BY 1, 2 ORDER BY w_start""".stripMargin),

    // Session windows (10-min inactivity gap) per user: the oracle is
    // the classic gaps-and-islands rewrite (lag + running break count).
    QueryDef.sql(
      "q30_event_session_window",
      (spark, dir) =>
        graft.sources.Events.normalized(spark, dir)
          .groupBy(col("user_id"), session_window(col("ts_us"), "10 minutes").as("s"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
          .select(col("user_id"), col("s.start").as("s_start"), col("cnt"), col("sum_value"))
          .orderBy(col("user_id"), col("s_start")),
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 600 SECOND THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), s AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM o
        |)
        |SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS s_start, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin),

    // Pivot: order counts per priority spread across status columns
    // (Spark groupBy().pivot() with explicit values = static columns,
    // no extra pass to discover them).
    QueryDef.sql(
      "q31_pivot",
      (spark, dir) =>
        Tables.orders(spark, dir)
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .select(col("o_orderpriority"),
            coalesce(col("F"), lit(0L)).as("f_cnt"),
            coalesce(col("O"), lit(0L)).as("o_cnt"),
            coalesce(col("P"), lit(0L)).as("p_cnt"))
          .orderBy(col("o_orderpriority")),
      """SELECT o_orderpriority, "F" AS f_cnt, "O" AS o_cnt, "P" AS p_cnt FROM (
        |  SELECT o_orderpriority, o_orderstatus FROM orders
        |) PIVOT (COUNT(*) FOR o_orderstatus IN ('F', 'O', 'P'))
        |ORDER BY o_orderpriority""".stripMargin),

    // As-of join composed from existing operators (the preferred path
    // over a custom physical operator): union both sides, one window
    // over (user, time) carrying the last purchase forward, keep the
    // click rows. ONE shuffle on user_id — no range-join row explosion,
    // the shape that survives 100 TB of events. Oracle: DuckDB's native
    // ASOF LEFT JOIN. Purchases are pre-deduped per (user, ts) so the
    // tie-break is deterministic in both engines.
    QueryDef.sql(
      "q32_asof_join",
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = graft.sources.Events.normalized(spark, dir)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us"), col("event_id"))
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts_us"))
          .agg(max(col("value")).as("p_value"))
        val unioned = clicks
          .select(col("user_id"), col("ts_us"), col("event_id"),
            lit(null).cast(TimestampType).as("p_ts"),
            lit(null).cast(DoubleType).as("p_value"), lit(1).as("side"))
          .unionByName(purchases.select(
            col("user_id"), col("ts_us"), lit(null).cast(LongType).as("event_id"),
            col("ts_us").as("p_ts"), col("p_value"), lit(0).as("side")))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("side"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        unioned
          .withColumn("asof_ts", last(col("p_ts"), ignoreNulls = true).over(w))
          .withColumn("asof_value", last(col("p_value"), ignoreNulls = true).over(w))
          .filter(col("side") === 1)
          .select(col("user_id"), col("ts_us").as("click_ts"), col("event_id"),
            col("asof_ts"), col("asof_value"))
          .orderBy(col("event_id"))
      },
      """WITH c AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS p_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |)
        |SELECT c.user_id, c.ts AS click_ts, c.event_id,
        |  p.ts AS asof_ts, p.p_value AS asof_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
        |ORDER BY c.event_id""".stripMargin),
    // Range (proximity) join: pairs of events by the same user within
    // 60 s of each other. A naive theta join is quadratic per user; the
    // scalable shape buckets both sides by minute, explodes ONE side to
    // its bucket ±1, and equi-joins on (user, bucket) — matching pairs
    // are at most one bucket apart, so candidates stay linear and the
    // exact |Δt| filter runs only on them. Same pattern as d04's
    // length-bucketed join; survives 100× the event volume.
    QueryDef.sql(
      "q33_range_proximity_join",
      (spark, dir) => {
        val e = graft.sources.Events.normalized(spark, dir)
          .select(col("event_id"), col("user_id"),
            expr("unix_micros(ts_us)").as("us"))
        val a = e
          .withColumn("bucket", expr("us div 60000000"))
          .select(col("user_id"), col("bucket"),
            col("event_id").as("ev_a"), col("us").as("us_a"))
        val b = e
          .withColumn("b0", expr("us div 60000000"))
          .withColumn("bucket", explode(array(col("b0") - 1, col("b0"), col("b0") + 1)))
          .select(col("user_id"), col("bucket"),
            col("event_id").as("ev_b"), col("us").as("us_b"))
        a.join(b, Seq("user_id", "bucket"))
          .filter(col("ev_a") < col("ev_b") &&
            abs(col("us_b") - col("us_a")) <= 60000000L)
          .select(col("user_id"), col("ev_a"), col("ev_b"),
            (col("us_b") - col("us_a")).as("dt_us"))
          .orderBy(col("user_id"), col("ev_a"), col("ev_b"))
      },
      """SELECT a.user_id, a.event_id AS ev_a, b.event_id AS ev_b,
        |  CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS dt_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 60000000
        |ORDER BY a.user_id, ev_a, ev_b""".stripMargin),

    // ---- statistical aggregate family -----------------------------------
    // corr / covariance / stddev / variance / linear regression, the
    // scalar-statistics surface a real analytics user reaches for next
    // after percentiles. Small-magnitude columns (quantity ≤ 50,
    // discount ≤ 0.1) keep the 6-decimal round far above float merge
    // noise (~1e-10) in both engines.
    QueryDef.sql(
      "q34_statistical_functions",
      (spark, dir) =>
        Tables.lineitem(spark, dir)
          .groupBy(col("l_returnflag"))
          .agg(
            round(corr(col("l_quantity"), col("l_discount")), 6).as("corr_qd"),
            round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_s_qd"),
            round(covar_pop(col("l_quantity"), col("l_discount")), 6).as("covar_p_qd"),
            round(stddev_samp(col("l_quantity")), 6).as("stddev_s_q"),
            round(stddev_pop(col("l_quantity")), 6).as("stddev_p_q"),
            round(var_samp(col("l_discount")), 6).as("var_s_d"),
            round(var_pop(col("l_discount")), 6).as("var_p_d"),
            round(expr("regr_slope(l_quantity, l_discount)"), 6).as("regr_slope_qd"),
            round(expr("regr_intercept(l_quantity, l_discount)"), 6).as("regr_icpt_qd"),
            expr("regr_count(l_quantity, l_discount)").cast(LongType).as("regr_n"))
          .orderBy(col("l_returnflag")),
      """SELECT l_returnflag,
        |  ROUND(CORR(l_quantity, l_discount), 6) AS corr_qd,
        |  ROUND(COVAR_SAMP(l_quantity, l_discount), 6) AS covar_s_qd,
        |  ROUND(COVAR_POP(l_quantity, l_discount), 6) AS covar_p_qd,
        |  ROUND(STDDEV_SAMP(l_quantity), 6) AS stddev_s_q,
        |  ROUND(STDDEV_POP(l_quantity), 6) AS stddev_p_q,
        |  ROUND(VAR_SAMP(l_discount), 6) AS var_s_d,
        |  ROUND(VAR_POP(l_discount), 6) AS var_p_d,
        |  ROUND(REGR_SLOPE(l_quantity, l_discount), 6) AS regr_slope_qd,
        |  ROUND(REGR_INTERCEPT(l_quantity, l_discount), 6) AS regr_icpt_qd,
        |  CAST(REGR_COUNT(l_quantity, l_discount) AS BIGINT) AS regr_n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- correlated subquery (TPC-H Q17 shape) --------------------------
    // Lineitems whose quantity exceeds 5× ... rather, sits below 1/5 of
    // their own order's total — the per-group-threshold filter every
    // warehouse decorrelates into an aggregate + join. Written as SQL so
    // Catalyst's RewriteCorrelatedScalarSubquery plans it (the explain
    // shows an Aggregate joined back, never a per-row subplan). The
    // threshold compares DECIMALs by exact cross-multiplication.
    QueryDef.sql(
      "q36_correlated_subquery",
      (spark, dir) => {
        Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_returnflag"),
            col("l_quantity").cast(DecimalType(18, 2)).as("qty"),
            col("l_extendedprice").cast(DecimalType(18, 2)).as("price"))
          .createOrReplaceTempView("graft_q36_lineitem")
        spark.sql(
          """SELECT l_returnflag, COUNT(*) AS cnt,
            |  CAST(SUM(price) AS DOUBLE) AS sum_price
            |FROM graft_q36_lineitem l1
            |WHERE qty * 5 < (SELECT SUM(qty) FROM graft_q36_lineitem l2
            |                 WHERE l2.l_orderkey = l1.l_orderkey)
            |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      },
      """WITH l AS (
        |  SELECT l_orderkey, l_returnflag,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS qty,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        |  FROM lineitem)
        |SELECT l_returnflag, COUNT(*) AS cnt,
        |  CAST(SUM(price) AS DOUBLE) AS sum_price
        |FROM l l1
        |WHERE qty * 5 < (SELECT SUM(qty) FROM l l2 WHERE l2.l_orderkey = l1.l_orderkey)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- window distribution / navigation functions ----------------------
    // ntile / percent_rank / cume_dist / nth_value with an explicit rows
    // frame — the ranking-and-distribution battery beyond q08/q09's
    // row_number/lag. percent_rank and cume_dist are single divisions of
    // exact rank integers (deterministic), and the order key is total.
    QueryDef.sql(
      "q37_window_distribution",
      (spark, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderstatus"),
            ntile(8).over(w).cast(LongType).as("bucket8"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"),
            nth_value(col("o_orderkey"), 3)
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .as("third_key_so_far"))
          .filter(col("o_orderkey") % 13 === 0)
          .orderBy(col("o_orderkey"))
      },
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(NTILE(8) OVER w AS BIGINT) AS bucket8,
        |  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
        |  ROUND(CUME_DIST() OVER w, 6) AS cume,
        |  NTH_VALUE(o_orderkey, 3) OVER
        |    (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_key_so_far
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |QUALIFY o_orderkey % 13 = 0
        |ORDER BY o_orderkey""".stripMargin),

    // ---- map / struct scalar functions -----------------------------------
    // The map-construction + extraction + introspection battery (and a
    // struct round trip), with SCALAR outputs so the hash compare stays
    // engine-portable (map/struct column encodings differ between
    // engines; their contents do not).
    QueryDef.sql(
      "q38_map_struct_functions",
      (spark, dir) =>
        Tables.lineitem(spark, dir)
          .filter(col("l_orderkey") % 7 === 0)
          .withColumn("m", map_from_arrays(
            array(lit("qty"), lit("tax")),
            array(col("l_quantity").cast(DecimalType(18, 2)),
              col("l_tax").cast(DecimalType(18, 2)))))
          .withColumn("s", struct(col("l_orderkey").as("k"), col("l_linenumber").as("n")))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            element_at(col("m"), "qty").cast(DoubleType).as("qty_val"),
            size(col("m")).cast(LongType).as("n_entries"),
            concat_ws(",", array_sort(map_keys(col("m")))).as("keys_csv"),
            (col("s.k") * 10 + col("s.n")).as("packed"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      """SELECT l_orderkey, l_linenumber,
        |  CAST(map_extract(MAP(['qty','tax'],
        |    [CAST(l_quantity AS DECIMAL(18,2)), CAST(l_tax AS DECIMAL(18,2))]), 'qty')[1] AS DOUBLE) AS qty_val,
        |  CAST(cardinality(MAP(['qty','tax'],
        |    [CAST(l_quantity AS DECIMAL(18,2)), CAST(l_tax AS DECIMAL(18,2))])) AS BIGINT) AS n_entries,
        |  array_to_string(list_sort(map_keys(MAP(['qty','tax'],
        |    [CAST(l_quantity AS DECIMAL(18,2)), CAST(l_tax AS DECIMAL(18,2))]))), ',') AS keys_csv,
        |  CAST({'k': l_orderkey, 'n': l_linenumber}.k * 10
        |    + {'k': l_orderkey, 'n': l_linenumber}.n AS BIGINT) AS packed
        |FROM lineitem WHERE l_orderkey % 7 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
  )
}
