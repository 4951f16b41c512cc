package graft.queries

import graft.Tables
import graft.functions.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generic relational surface over the TPC-H-ish testdata: aggregation
  * (A7/A8/A10), joins (declared extension, SURVEY §2.6), set ops (D1/D6),
  * windows (W-series), sorts/top-k (O-series), rollup extension.
  *
  * Every query has a DuckDB oracle (same column names; deterministic
  * decimal-backed double aggregates, see [[graft.functions.Det]]).
  */
object Relational {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A8: SUM/AVG/COUNT group-by (sql/athena_parquet_tables.sql:77-102),
    // TPC-H Q1 shape. One hash-agg, partial combine, shuffle on 2 keys.
    "q01_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum8(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // P13: pushed-down range + value predicates, pruned projection.
    // Filters reach the parquet scan (PushedFilters), 4-col ReadSchema.
    "q02_filter_project" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(
          col("l_shipdate").between(lit("1995-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")) &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    }),

    // Declared extension join (SURVEY §2.6): dim tables broadcast —
    // no shuffle of the fact side at any scale.
    "q03_join_broadcast" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
    }),

    // Fact-to-dim join + aggregate; customer broadcast at this scale,
    // shuffle-hash/sort-merge via AQE beyond broadcast threshold.
    "q04_join_agg" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          dsum(col("o_totalprice")).as("sum_totalprice"),
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_customers"))
    }),

    // Anti join = NOT EXISTS: customers with no URGENT orders, per
    // nation (plain "no orders" is empty at every SF — weak test).
    "q05_anti_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers_no_urgent"))
    }),

    // Semi join = EXISTS: segment rollup of customers having ≥1
    // urgent order. Semi joins shuffle only keys, never payload rows.
    "q07_semi_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
    }),

    // D1+D6: union of two overlapping slices, distinct.
    "q06_union_distinct" -> ((s, dir) => {
      val o  = Tables.orders(s, dir)
      val a  = o.filter(col("o_totalprice") > 100000 && col("o_orderstatus") === "O")
      val b  = o.filter(col("o_totalprice") > 150000)
      a.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .unionByName(b.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")))
        .distinct()
    }),

    // W-series: running total + row_number per user, deterministic order.
    "q08_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn(
          "running_value",
          sum(col("value").cast("decimal(28,4)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"), col("rn"), col("running_value"))
    }),

    // O3: ORDER BY ... LIMIT → TakeOrderedAndProject (no global sort).
    "q09_topk_orders" -> ((s, dir) => {
      Tables.orders(s, dir)
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
    }),

    // A10: conditional aggregation (sql/rds_schema.sql:112-125 shape).
    "q10_conditional_agg" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
          count(when(col("event_type") === "error", 1)).as("n_error"),
          count(lit(1)).as("n_total"),
          dsum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0))).as("purchase_value"))
    }),

    // D5: distinct listing, ordered.
    "q11_distinct_types" -> ((s, dir) =>
      Tables.events(s, dir).select(col("event_type")).distinct().orderBy(col("event_type"))),

    // Extension: ROLLUP over the region/nation hierarchy.
    "q12_rollup" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"))
    }),

    // A9: stddev volatility per group (deterministic moment form).
    "q13_stddev" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(dstddev(col("value")).as("value_stddev"), count(lit(1)).as("n"))
    }),

    // A7/A11: metadata rollup — counts, distincts, ts bounds.
    "q14_metadata_rollup" -> ((s, dir) => {
      Tables.events(s, dir).agg(
        count(lit(1)).as("row_count"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"),
        min(col("ts")).as("min_ts"),
        max(col("ts")).as("max_ts"))
    }),

    // SQL surface with a CTE (W4 shape): monthly order rollup via spark.sql.
    "q15_cte_sql" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("graft_orders")
      s.sql("""
        WITH monthly AS (
          SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, o_orderstatus,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price,
                 COUNT(1) AS n_orders
          FROM graft_orders GROUP BY 1, 2, 3
        )
        SELECT y, m, o_orderstatus, sum_price, n_orders FROM monthly
      """)
    }),

    // Exact interpolated percentiles per group (extension; the
    // reference has only avg/stddev). Exact `percentile`, not the
    // t-digest approximation, so the oracle can match.
    "q16_percentile" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.9)").as("p90"),
          expr("percentile(value, 0.99)").as("p99"))
    }),

    // CUBE over (year, status): all 4 grouping sets in one pass
    // (extension; reference has no grouping sets).
    "q18_cube" -> ((s, dir) => {
      Tables.orders(s, dir)
        .cube(year(col("o_orderdate")).as("y"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
    }),

    // O4: tail-limit — most-recent 100 events (api/api_handler.py:437-443).
    "q17_tail_limit" -> ((s, dir) => {
      Tables.events(s, dir)
        .orderBy(desc("ts"), desc("event_id"))
        .limit(100)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    }),

    // P14: period-token semantics — "7d" window anchored at max(ts)
    // (api/api_handler.py:746-769; anchored at data max for determinism).
    "q19_period_filter" -> ((s, dir) => {
      val e  = Tables.events(s, dir)
      val mx = e.agg(max(col("ts")).as("mx"))
      e.crossJoin(broadcast(mx))
        .filter(col("ts") >= col("mx") - expr("INTERVAL 7 DAYS"))
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    }),

    // P18 analogue over driver testdata: JSON field extraction from
    // the props column, typed cast, predicate + rollup. At scale
    // prefer from_json with an explicit schema (single parse, typed
    // struct); get_json_object shown here matches the reference's
    // per-field extraction style.
    "q48_json_extract" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("k") >= 50)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          max(col("k")).as("max_k"),
          dsum(col("value")).as("sum_value"))
    }),

    // Pivot (extension): day × event_type counts as fixed columns.
    "q20_pivot" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
    }),

    // Incremental materialized-aggregate maintenance: the rollup of
    // even-key orders (the "materialized view") absorbs the odd-key
    // delta by MERGING partial-aggregate states — the oracle is the
    // full direct aggregate, so the gate proves merge == recompute.
    "q148_incremental_rollup" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      graft.operators.Maintenance
        .mergeAggregateStates(
          graft.operators.Maintenance.aggregateState(
            li.filter(col("l_orderkey") % 2 === 0), col("l_returnflag"), col("l_quantity")),
          graft.operators.Maintenance.aggregateState(
            li.filter(col("l_orderkey") % 2 === 1), col("l_returnflag"), col("l_quantity")))
        .withColumn("avg_x100", expr("sum_x100 div n_rows"))
    }),

    // Snapshot diff over two deterministic versions of documents:
    // %5==4 keys only in the new snapshot, %5==0 only in the old,
    // %3==0 payloads edited in the new — added/removed/changed audit.
    "q149_snapshot_diff" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val oldSnap = d.filter(col("doc_id") % 5 =!= 4)
      val newSnap = d.filter(col("doc_id") % 5 =!= 0)
        .withColumn(
          "text",
          when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2"))).otherwise(col("text")))
      graft.operators.Maintenance.snapshotDiff(
        oldSnap, newSnap, col("doc_id"), md5(col("text")))
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,8))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)/COUNT(l_quantity) AS avg_qty,
         CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE)/COUNT(l_discount) AS avg_disc,
         COUNT(1) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_extendedprice, l_discount FROM lineitem
         WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q03_join_broadcast" ->
      """SELECT r_name, n_name, COUNT(1) AS n_customers,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS sum_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "q04_join_agg" ->
      """SELECT c_mktsegment,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_totalprice,
         COUNT(1) AS n_orders, COUNT(DISTINCT o_custkey) AS n_customers
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q05_anti_join" ->
      """SELECT c_nationkey, COUNT(1) AS n_customers_no_urgent FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         GROUP BY c_nationkey""",
    "q07_semi_join" ->
      """SELECT c_mktsegment, COUNT(1) AS n_customers,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS sum_acctbal
         FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         GROUP BY c_mktsegment""",
    "q16_percentile" ->
      """SELECT event_type,
         quantile_cont(value, 0.5) AS p50,
         quantile_cont(value, 0.9) AS p90,
         quantile_cont(value, 0.99) AS p99
         FROM events GROUP BY event_type""",
    "q18_cube" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y, o_orderstatus,
         COUNT(1) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY CUBE (year(o_orderdate), o_orderstatus)""",
    "q06_union_distinct" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_totalprice > 100000 AND o_orderstatus = 'O'
         UNION
         SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_totalprice > 150000""",
    "q08_window_running" ->
      """SELECT event_id, user_id, ts, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
         FROM events""",
    "q09_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q10_conditional_agg" ->
      """SELECT user_id,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
         COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
         COUNT(1) AS n_total,
         CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(28,4))) AS DOUBLE) AS purchase_value
         FROM events GROUP BY user_id""",
    "q11_distinct_types" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "q12_rollup" ->
      """SELECT r_name, n_name, COUNT(1) AS n_customers
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)""",
    "q13_stddev" ->
      """SELECT event_type,
         CASE WHEN COUNT(value) > 1 THEN sqrt(greatest(0.0,
           (CAST(SUM(CAST(value*value AS DECIMAL(30,8))) AS DOUBLE)
            - (CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
               * CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)) / COUNT(value))
           / (COUNT(value) - 1))) END AS value_stddev,
         COUNT(1) AS n
         FROM events GROUP BY event_type""",
    "q14_metadata_rollup" ->
      """SELECT COUNT(1) AS row_count, COUNT(DISTINCT user_id) AS n_users,
         COUNT(DISTINCT event_type) AS n_types,
         MIN(ts) AS min_ts, MAX(ts) AS max_ts FROM events""",
    "q15_cte_sql" ->
      """WITH monthly AS (
           SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, o_orderstatus,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price,
                  COUNT(1) AS n_orders
           FROM orders GROUP BY 1, 2, 3
         )
         SELECT CAST(y AS INT) AS y, CAST(m AS INT) AS m, o_orderstatus, sum_price, n_orders FROM monthly""",
    "q17_tail_limit" ->
      """SELECT event_id, ts, user_id, event_type, value FROM events
         ORDER BY ts DESC, event_id DESC LIMIT 100""",
    "q19_period_filter" ->
      """SELECT CAST(ts AS DATE) AS d, COUNT(1) AS n,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
         FROM events
         WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY
         GROUP BY CAST(ts AS DATE)""",
    "q48_json_extract" ->
      """SELECT event_type, COUNT(1) AS n,
         MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
         FROM events
         WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50
         GROUP BY event_type""",
    "q20_pivot" ->
      """SELECT CAST(ts AS DATE) AS d,
         COUNT(CASE WHEN event_type='click' THEN 1 END) AS click,
         COUNT(CASE WHEN event_type='error' THEN 1 END) AS error,
         COUNT(CASE WHEN event_type='purchase' THEN 1 END) AS purchase,
         COUNT(CASE WHEN event_type='signup' THEN 1 END) AS signup,
         COUNT(CASE WHEN event_type='view' THEN 1 END) AS "view"
         FROM events GROUP BY CAST(ts AS DATE)""",

    // The FULL direct aggregate — the merged incremental state must
    // equal a recompute over the whole table, bit for bit.
    "q148_incremental_rollup" ->
      """WITH x AS (
           SELECT l_returnflag AS key, CAST(round(l_quantity * 100) AS BIGINT) AS x
           FROM lineitem)
         SELECT key, COUNT(1) AS n_rows,
                CAST(SUM(x) AS BIGINT) AS sum_x100,
                MIN(x) AS min_x100, MAX(x) AS max_x100,
                CAST(SUM(x) AS BIGINT) // COUNT(1) AS avg_x100
         FROM x GROUP BY 1""",

    "q149_snapshot_diff" ->
      """WITH oldsnap AS (
           SELECT doc_id AS key, md5(text) AS p FROM documents WHERE doc_id % 5 <> 4),
         newsnap AS (
           SELECT doc_id AS key,
                  md5(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END) AS p
           FROM documents WHERE doc_id % 5 <> 0)
         SELECT COALESCE(o.key, n.key) AS key,
                CASE WHEN o.key IS NULL THEN 'added'
                     WHEN n.key IS NULL THEN 'removed'
                     WHEN o.p <> n.p THEN 'changed'
                     ELSE 'unchanged' END AS status
         FROM oldsnap o FULL OUTER JOIN newsnap n ON o.key = n.key
         WHERE o.key IS NULL OR n.key IS NULL OR o.p <> n.p"""
  )
}
