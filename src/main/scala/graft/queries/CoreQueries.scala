package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational core: the operator families of SURVEY.md §2 (projections,
  * filters, joins, aggregations, sorts/limits) exercised over the driver
  * testdata, each with an exact DuckDB oracle.
  *
  * Scale notes (100 TB): aggregations are plain `groupBy` (partial
  * map-side combine for free), dimension joins are explicitly
  * `broadcast()`, fact-fact joins shuffle on their keys and rely on AQE
  * for skew. Filters/projections are expressed declaratively so Catalyst
  * pushes them into the parquet scan.
  */
object CoreQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal sum surfaced as double (same form as the SQL twin). */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  val all: Seq[GraftQuery] = Seq(

    // ---- A-family: grouped aggregation (TPC-H Q1 shape; SURVEY §2.5 A1) ----
    GraftQuery(
      "q1_pricing_summary",
      "Grouped aggregation with map-side partial agg; filter pushed to scan.",
      (spark, dir) => {
        val li = Tables.table(spark, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- F/P-family: filter + projection, fully pushed down (§2.2, §2.3) ----
    GraftQuery(
      "q2_filter_project",
      "Conjunctive filter + narrow projection; PushedFilters+ReadSchema at the scan.",
      (spark, dir) => {
        Tables.table(spark, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000.0)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000.0
        ORDER BY o_orderkey""")),

    // ---- J-family: multi-join with broadcast dims (§2.4) ----
    GraftQuery(
      "q3_revenue_by_nation",
      "Fact-fact shuffle join (lineitem x orders) + broadcast dim joins; grouped revenue.",
      (spark, dir) => {
        val li = Tables.table(spark, dir, "lineitem")
        val o = Tables.table(spark, dir, "orders")
        val c = Tables.table(spark, dir, "customer")
        val n = Tables.table(spark, dir, "nation")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("n_name"))
      },
      Some("""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name""")),

    // ---- O-family: top-k (sort + limit, §2.6) ----
    GraftQuery(
      "q4_top_customers",
      "Top-10 by aggregate; TakeOrderedAndProject avoids a global sort.",
      (spark, dir) => {
        val o = Tables.table(spark, dir, "orders")
        val c = Tables.table(spark, dir, "customer")
        o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(dsum(col("o_totalprice")).as("total_spend"))
          .orderBy(col("total_spend").desc, col("c_custkey"))
          .limit(10)
      },
      Some("""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY total_spend DESC, c_custkey
        LIMIT 10""")),

    // ---- A5: ordered distinct (§2.5) ----
    GraftQuery(
      "q5_distinct_segments",
      "DISTINCT via aggregate; tiny result, still shuffle-partial-agg shaped.",
      (spark, dir) =>
        Tables.table(spark, dir, "customer")
          .select(col("c_mktsegment")).distinct().orderBy(col("c_mktsegment")),
      Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment")),

    // ---- P11/F4: CASE routing (Faust line-derivation / topic router) ----
    GraftQuery(
      "q6_case_route",
      "Chained when/otherwise (reference consumers/faust_stream.py:55-63 shape).",
      (spark, dir) =>
        Tables.table(spark, dir, "events")
          .select(
            when(col("event_type") === "error", lit("alert"))
              .when(col("event_type").isin("signup", "purchase"), lit("business"))
              .otherwise(lit("other")).as("route"))
          .groupBy(col("route")).agg(count(lit(1)).as("n"))
          .orderBy(col("route")),
      Some("""
        SELECT CASE WHEN event_type = 'error' THEN 'alert'
                    WHEN event_type IN ('signup','purchase') THEN 'business'
                    ELSE 'other' END AS route,
               COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY route""")),

    // ---- P6: string split + element pick (birthYear shape) ----
    GraftQuery(
      "q7_split_priority",
      "split+getItem (reference sparkpykafkajoin.py:102-105 shape).",
      (spark, dir) =>
        Tables.table(spark, dir, "orders")
          .select(
            col("o_orderkey"),
            split(col("o_orderpriority"), "-").getItem(0).as("prio_code"),
            split(col("o_orderpriority"), "-").getItem(1).as("prio_name"))
          .orderBy(col("o_orderkey")),
      Some("""
        SELECT o_orderkey,
               split_part(o_orderpriority, '-', 1) AS prio_code,
               split_part(o_orderpriority, '-', 2) AS prio_name
        FROM orders ORDER BY o_orderkey""")),

    // ---- P16: JSON field extraction (§2.2) ----
    GraftQuery(
      "q8_json_props",
      "get_json_object over the events.props JSON column, then aggregate.",
      (spark, dir) =>
        Tables.table(spark, dir, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
          .orderBy(col("event_type")),
      Some("""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               COUNT(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- P5: base64 round-trip (STEDI unbase64 shape) ----
    GraftQuery(
      "q9_base64_roundtrip",
      "base64/unbase64 round-trip (reference sparkpykafkajoin.py:85-87 shape).",
      (spark, dir) =>
        Tables.table(spark, dir, "documents")
          .select(
            col("doc_id"),
            // Spark's base64 emits MIME-chunked output (\r\n every 76
            // chars); strip to the canonical unchunked form DuckDB emits.
            regexp_replace(base64(col("text").cast("binary")), "\r\n", "").as("enc"),
            unbase64(base64(col("text").cast("binary"))).cast("string").as("dec"))
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id,
               base64(CAST(text AS BLOB)) AS enc,
               CAST(from_base64(base64(CAST(text AS BLOB))) AS VARCHAR) AS dec
        FROM documents ORDER BY doc_id""")),

    // ---- A2: latest-per-key (Faust KTable upsert, batch analog) ----
    GraftQuery(
      "q10_latest_per_user",
      "Last-write-wins per key via max_by on a unique monotone id (§2.5 A2).",
      (spark, dir) =>
        Tables.table(spark, dir, "events")
          .groupBy(col("user_id"))
          .agg(
            max(col("event_id")).as("last_event_id"),
            max_by(col("event_type"), col("event_id")).as("last_type"),
            max_by(col("value"), col("event_id")).as("last_value"))
          .orderBy(col("user_id")),
      Some("""
        SELECT user_id,
               MAX(event_id) AS last_event_id,
               arg_max(event_type, event_id) AS last_type,
               arg_max("value", event_id) AS last_value
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // ---- A1: KSQL turnstile COUNT(*) contract, uppercase names (§3.2) ----
    GraftQuery(
      "q11_turnstile_count",
      "COUNT(*) GROUP BY key with the KSQL uppercase output contract (STATION_ID/COUNT).",
      (spark, dir) =>
        Tables.table(spark, dir, "events")
          .groupBy(col("user_id").as("STATION_ID"))
          .agg(count(lit(1)).as("COUNT"))
          .orderBy(col("STATION_ID")),
      Some("""
        SELECT user_id AS STATION_ID, COUNT(*) AS "COUNT"
        FROM events GROUP BY user_id ORDER BY STATION_ID""")),

    // ---- window functions (extension; running aggregate) ----
    GraftQuery(
      "q12_running_spend",
      "Running decimal sum per customer ordered by (date, key); rows-frame window.",
      (spark, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.table(spark, dir, "orders")
          .select(
            col("o_custkey"), col("o_orderkey"),
            sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_spend"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        FROM orders ORDER BY o_custkey, o_orderkey""")),

    // ---- anti join (customers without orders in a window) ----
    GraftQuery(
      "q13_customers_without_orders",
      "left_anti join; broadcast the distinct key set at scale when " +
        "small. The orders side is restricted to the 1995 window so " +
        "genuine survivors exist at EVERY scale factor (the testdata " +
        "is referentially complete: unrestricted, no customer lacks " +
        "orders and the gate compared 0 == 0 forever — a broken " +
        "anti-join could never trip it).",
      (spark, dir) => {
        val c = Tables.table(spark, dir, "customer")
        val o = Tables.table(spark, dir, "orders")
          .filter(col("o_orderdate") >=
              lit("1995-01-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("1996-01-01 00:00:00").cast("timestamp"))
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                            AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
        ORDER BY c_custkey""")),

    // ---- semi join (suppliers with any lineitem) ----
    GraftQuery(
      "q14_active_suppliers",
      "left_semi join (EXISTS).",
      (spark, dir) => {
        val s = Tables.table(spark, dir, "supplier")
        val li = Tables.table(spark, dir, "lineitem")
        s.join(li, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"))
          .orderBy(col("s_suppkey"))
      },
      Some("""
        SELECT s_suppkey, s_name FROM supplier
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
        ORDER BY s_suppkey""")),

    // ---- SQL-over-temp-view entry (P10: DSL and SQL share one catalog) ----
    GraftQuery(
      "q15_sql_mixed",
      "spark.sql over temp views registered from DataFrames (§3.1 semantics).",
      (spark, dir) => {
        Tables.registerAll(spark, dir)
        spark.sql("""
          SELECT n_name, COUNT(*) AS n_customers
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name ORDER BY n_name""")
      },
      Some("""
        SELECT n_name, COUNT(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // ---- P13 + P15: topic-name normalization chain + epoch-millis key ----
    GraftQuery(
      "q27_topic_normalize",
      "lower + literal-replace chain (station.py:21-28 shape) + unix_millis keys.",
      (spark, dir) =>
        Tables.table(spark, dir, "orders")
          .select(
            col("o_orderkey"),
            graft.functions.TextFunctions.topicName(col("o_orderpriority")).as("topic"),
            // o_orderdate is TIMESTAMP_NTZ in the parquet; interpret as
            // UTC instant (session TZ) to match DuckDB's epoch_ms.
            unix_millis(col("o_orderdate").cast("timestamp")).as("key_ms"))
          .orderBy(col("o_orderkey")),
      Some("""
        SELECT o_orderkey,
               replace(replace(replace(replace(lower(o_orderpriority), '/', '_and_'), ' ', '_'), '-', '_'), '''', '') AS topic,
               epoch_ms(o_orderdate) AS key_ms
        FROM orders ORDER BY o_orderkey""")),

    GraftQuery(
      "q203_local_supplier_volume",
      "TPC-H Q5-shaped LOCAL supplier volume: the deepest join chain " +
        "in the registry — lineitem x orders x supplier x customer " +
        "with the customer-and-supplier-SAME-NATION residual (the " +
        "constraint that makes Q5 a join-order stress test: it binds " +
        "two dimension paths of the fact), nation broadcast on top, a " +
        "two-year order-date band pushed to the orders scan. Revenue " +
        "in exact DECIMAL summed then cast to double (the q1/q3 " +
        "discipline), ranked per nation. At 100 TB this is the plan " +
        "AQE join reordering and the q159 runtime filters exist for.",
      (spark, dir) => {
        val li = Tables.table(spark, dir, "lineitem")
        val o = Tables.table(spark, dir, "orders")
          .filter(col("o_orderdate") >=
              lit("1995-01-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
        val s = Tables.table(spark, dir, "supplier")
        val c = Tables.table(spark, dir, "customer")
        val n = Tables.table(spark, dir, "nation")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(s, col("l_suppkey") === col("s_suppkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .filter(col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name""")),

    GraftQuery(
      "q204_returned_items",
      "TPC-H Q10-shaped returned-item reporting: customers ranked by " +
        "the revenue they returned in one year — the churn-triage " +
        "report. Fact-fact join under a pushed date band + returnflag " +
        "filter, customer/nation lookups, exact-DECIMAL revenue, " +
        "top 20 with the unique customer key breaking any revenue " +
        "tie so LIMIT is deterministic in both engines.",
      (spark, dir) => {
        val li = Tables.table(spark, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
        val o = Tables.table(spark, dir, "orders")
          .filter(col("o_orderdate") >=
              lit("1996-01-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
        val c = Tables.table(spark, dir, "customer")
        val n = Tables.table(spark, dir, "nation")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(
            sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""
        SELECT c_custkey, c_name, n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20""")),

    GraftQuery(
      "q205_correlated_scalar_agg",
      "Correlated SCALAR-AGGREGATE subquery through the SQL front end " +
        "(TPC-H Q17 shape): per-brand revenue from small-size parts' " +
        "below-average-quantity lineitems, where the threshold is " +
        "0.2x the part's OWN average quantity — a correlated " +
        "avg() subquery per outer row. q191 proved NOT EXISTS " +
        "decorrelation; this is the other rewrite real users hit " +
        "constantly: RewriteCorrelatedScalarSubquery turns the per-row " +
        "probe into one per-partkey aggregate joined back, so the " +
        "100 TB form is two shuffles, never an O(rows) re-scan " +
        "(PlanShapeSpec asserts no subquery survives into the " +
        "physical plan). Engine-exactness: the average rides " +
        "avg(CAST(l_quantity AS BIGINT)) — quantities are small " +
        "integers, so every partial sum is exact in ANY engine's " +
        "buffer and the single division is correctly rounded " +
        "identically; 0.2x then compares double-to-double, byte-" +
        "identical on both sides. Revenue itself is the q1/q3 exact-" +
        "DECIMAL discipline. Oracle is the same SQL verbatim, with " +
        "DuckDB executing its own native correlated form.",
      (spark, dir) => {
        Tables.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem_q205")
        Tables.table(spark, dir, "part").createOrReplaceTempView("part_q205")
        spark.sql("""
          SELECT p_brand,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS small_qty_revenue,
                 COUNT(*) AS n_items
          FROM lineitem_q205 l JOIN part_q205 p ON p.p_partkey = l.l_partkey
          WHERE p.p_size <= 5
            AND l.l_quantity < 0.2 * (SELECT avg(CAST(l2.l_quantity AS BIGINT))
                                      FROM lineitem_q205 l2
                                      WHERE l2.l_partkey = l.l_partkey)
          GROUP BY p_brand
          ORDER BY p_brand""")
      },
      Some("""
        SELECT p_brand,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS small_qty_revenue,
               COUNT(*) AS n_items
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_size <= 5
          AND l.l_quantity < 0.2 * (SELECT avg(CAST(l2.l_quantity AS BIGINT))
                                    FROM lineitem l2
                                    WHERE l2.l_partkey = l.l_partkey)
        GROUP BY p_brand
        ORDER BY p_brand""")),

    GraftQuery(
      "q207_sole_late_supplier",
      "TPC-H Q21-shaped waiting-supplier census: suppliers who were " +
        "the ONLY late shipper on a finished multi-supplier order — " +
        "EXISTS (another supplier shipped on this order) AND NOT " +
        "EXISTS (another supplier shipped LATE, correlated on BOTH " +
        "l1's order and o's date) in one query, the hardest " +
        "decorrelation shape in TPC-H: Catalyst rewrites the pair " +
        "into a left-semi and a left-anti join against the same " +
        "fact, each on l_orderkey — two hash joins at 100 TB, never " +
        "a per-row re-scan. Lateness is l_shipdate > o_orderdate + " +
        "45 days (this schema's receipt/commit proxy); timestamps " +
        "compare exactly, the aggregate is a pure count, and the " +
        "unique s_name breaks the top-20 tie in both engines.",
      (spark, dir) => {
        Tables.table(spark, dir, "supplier").createOrReplaceTempView("supplier_q207")
        Tables.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem_q207")
        Tables.table(spark, dir, "orders").createOrReplaceTempView("orders_q207")
        spark.sql("""
          SELECT s_name, count(*) AS numwait
          FROM supplier_q207 s
          JOIN lineitem_q207 l1 ON s.s_suppkey = l1.l_suppkey
          JOIN orders_q207 o ON o.o_orderkey = l1.l_orderkey
          WHERE o.o_orderstatus = 'F'
            AND l1.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
            AND EXISTS (SELECT 1 FROM lineitem_q207 l2
                        WHERE l2.l_orderkey = l1.l_orderkey
                          AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM lineitem_q207 l3
                            WHERE l3.l_orderkey = l1.l_orderkey
                              AND l3.l_suppkey <> l1.l_suppkey
                              AND l3.l_shipdate > o.o_orderdate + INTERVAL 45 DAY)
          GROUP BY s_name
          ORDER BY numwait DESC, s_name
          LIMIT 20""")
      },
      Some("""
        SELECT s_name, count(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o.o_orderdate + INTERVAL 45 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20""")),

    GraftQuery(
      "q208_lateral_topk",
      "LATERAL correlated subquery with ORDER BY + LIMIT through the " +
        "SQL front end: per-nation top-2 customers by balance, the " +
        "SQL-standard spelling of grouped top-k (q70's window form, " +
        "as real analysts write it against Postgres/DuckDB). " +
        "Catalyst's DecorrelateInnerQuery must push the correlated " +
        "per-nation LIMIT through a window/rank rewrite joined on " +
        "n_nationkey — never one subquery execution per nation row. " +
        "Balances and names are stored values compared verbatim, and " +
        "the subquery's full ORDER BY (unique c_name tiebreak) makes " +
        "the LIMIT 2 deterministic in both engines.",
      (spark, dir) => {
        Tables.table(spark, dir, "nation").createOrReplaceTempView("nation_q208")
        Tables.table(spark, dir, "customer").createOrReplaceTempView("customer_q208")
        spark.sql("""
          SELECT n.n_name, t.c_name, t.c_acctbal
          FROM nation_q208 n JOIN LATERAL (
            SELECT c_name, c_acctbal FROM customer_q208 c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name
            LIMIT 2
          ) t
          ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""")
      },
      Some("""
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation n JOIN LATERAL (
          SELECT c_name, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name
          LIMIT 2
        ) t ON true
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""")),

    GraftQuery(
      "q209_recursive_cte",
      "WITH RECURSIVE through the SQL front end (Spark 4's recursive " +
        "CTE execution — the iterative-traversal surface q139's " +
        "operator loop provides programmatically, as declarative " +
        "SQL): orders form an implicit binary tree (children of key " +
        "k are 2k and 2k+1), and the recursion walks it from the " +
        "root, counting nodes and exact revenue cents per depth. " +
        "Each recursion step is one join of the frontier against " +
        "orders — at 100 TB the same per-round shuffle shape as " +
        "PageRank, with the engine (not the operator author) owning " +
        "the loop, and termination is structural: the frontier " +
        "empties past the deepest key. The step is deliberately " +
        "frontier-explode (okey*2 + {0,1}) then EQUI-join — the " +
        "naive 'ON o_orderkey = 2k OR o_orderkey = 2k+1' spelling " +
        "plans a nested-loop probe of the whole fact per iteration. " +
        "All arithmetic is exact BIGINT; the oracle runs the " +
        "identical recursion natively. Depth is budget-checked " +
        "BEFORE round one (RecursionGuard): the tree's depth is " +
        "log2(max key), so one bounded max() refuses loudly — " +
        "naming spark.sql.cteRecursionLevelLimit — instead of " +
        "letting a deeper fixture die with Spark's generic error " +
        "after paying for every round under the limit.",
      (spark, dir) => {
        val orders = Tables.table(spark, dir, "orders")
        val maxKey = orders
          .agg(max(col("o_orderkey"))).collect()(0).getLong(0)
        graft.operators.RecursionGuard.requireDepthBudget(spark,
          graft.operators.RecursionGuard.doublingTreeLevels(maxKey),
          s"q209's order-tree walk (max o_orderkey $maxKey)")
        orders.createOrReplaceTempView("orders_q209")
        spark.sql("""
          WITH RECURSIVE tree AS (
            SELECT CAST(1 AS BIGINT) AS okey, 0 AS depth
            UNION ALL
            SELECT o.o_orderkey, c.depth + 1
            FROM (SELECT t.okey * 2 + v.i AS child, t.depth
                  FROM tree t CROSS JOIN (VALUES (0), (1)) AS v(i)) c
            JOIN orders_q209 o ON o.o_orderkey = c.child
          )
          SELECT depth, count(*) AS n,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM tree JOIN orders_q209 ON o_orderkey = okey
          GROUP BY depth ORDER BY depth""")
      },
      Some("""
        WITH RECURSIVE tree AS (
          SELECT CAST(1 AS BIGINT) AS okey, 0 AS depth
          UNION ALL
          SELECT o.o_orderkey, c.depth + 1
          FROM (SELECT t.okey * 2 + v.i AS child, t.depth
                FROM tree t CROSS JOIN (VALUES (0), (1)) AS v(i)) c
          JOIN orders o ON o.o_orderkey = c.child
        )
        SELECT depth, count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM tree JOIN orders ON o_orderkey = okey
        GROUP BY depth ORDER BY depth""")),

    GraftQuery(
      "q210_sql_pivot",
      "The SQL PIVOT clause (q36's DataFrame pivot, as the ANSI-ish " +
        "SQL surface real reports use): per-language character " +
        "volume pivoted over three named sources, with aliased " +
        "output columns. Spark compiles PIVOT to one conditional " +
        "aggregation pass — the oracle IS that rewrite, written out " +
        "as CASE sums, so the gate proves the clause and its " +
        "desugaring agree cell by cell (absent cells NULL in both " +
        "engines). One scan, one shuffle, pivot width fixed by the " +
        "IN list — the bounded-width contract that makes PIVOT safe " +
        "at 100 TB (an unlisted-value pivot would need a driver-side " +
        "distinct first).",
      (spark, dir) => {
        Tables.table(spark, dir, "documents").createOrReplaceTempView("documents_q210")
        spark.sql("""
          SELECT * FROM (
            SELECT lang, source, n_chars FROM documents_q210
          )
          PIVOT (
            sum(n_chars) FOR source IN ('src0' AS src0_chars,
                                        'src1' AS src1_chars,
                                        'src2' AS src2_chars)
          )
          ORDER BY lang""")
      },
      Some("""
        SELECT lang,
               CAST(sum(CASE WHEN source = 'src0' THEN n_chars END) AS BIGINT)
                 AS src0_chars,
               CAST(sum(CASE WHEN source = 'src1' THEN n_chars END) AS BIGINT)
                 AS src1_chars,
               CAST(sum(CASE WHEN source = 'src2' THEN n_chars END) AS BIGINT)
                 AS src2_chars
        FROM documents GROUP BY lang ORDER BY lang""")),

    GraftQuery(
      "q216_correlated_min_over_join",
      "TPC-H Q2 shape: the correlated MIN-over-a-JOIN in the WHERE " +
        "clause — cheapest regional supplier per part, where the " +
        "floor price is itself a four-table join re-correlated on " +
        "the outer part key. Catalyst must decorrelate the scalar " +
        "MIN into one aggregate over the joined frame and hash-join " +
        "it back on p_partkey — at 100 TB the difference between " +
        "two shuffles and a four-table re-scan per part row. The " +
        "partsupp surrogate is lineitem grouped by (partkey, " +
        "suppkey) with MIN(extendedprice) as the supply cost, all " +
        "in DECIMAL(18,2) so the min and its equality probe are " +
        "exact in both engines; (p_partkey, s_name) is unique by " +
        "the grouping, so the ORDER BY is total.",
      (spark, dir) => {
        Tables.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem_q216")
        Tables.table(spark, dir, "part").createOrReplaceTempView("part_q216")
        Tables.table(spark, dir, "supplier").createOrReplaceTempView("supplier_q216")
        Tables.table(spark, dir, "nation").createOrReplaceTempView("nation_q216")
        Tables.table(spark, dir, "region").createOrReplaceTempView("region_q216")
        spark.sql("""
          WITH ps AS (
            SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                   MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost
            FROM lineitem_q216 GROUP BY l_partkey, l_suppkey)
          SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
                 CAST(ps.ps_supplycost AS DOUBLE) AS supplycost
          FROM part_q216 p
          JOIN ps ON p.p_partkey = ps.ps_partkey
          JOIN supplier_q216 s ON s.s_suppkey = ps.ps_suppkey
          JOIN nation_q216 n ON s.s_nationkey = n.n_nationkey
          JOIN region_q216 r ON n.n_regionkey = r.r_regionkey
          WHERE p.p_size BETWEEN 1 AND 15 AND p.p_type = 'ECONOMY'
            AND r.r_name = 'ASIA'
            AND ps.ps_supplycost = (
              SELECT MIN(ps2.ps_supplycost)
              FROM ps ps2
              JOIN supplier_q216 s2 ON s2.s_suppkey = ps2.ps_suppkey
              JOIN nation_q216 n2 ON s2.s_nationkey = n2.n_nationkey
              JOIN region_q216 r2 ON n2.n_regionkey = r2.r_regionkey
              WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'ASIA')
          ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
          LIMIT 100""")
      },
      Some("""
        WITH ps AS (
          SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                 MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost
          FROM lineitem GROUP BY l_partkey, l_suppkey)
        SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
               CAST(ps.ps_supplycost AS DOUBLE) AS supplycost
        FROM part p
        JOIN ps ON p.p_partkey = ps.ps_partkey
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE p.p_size BETWEEN 1 AND 15 AND p.p_type = 'ECONOMY'
          AND r.r_name = 'ASIA'
          AND ps.ps_supplycost = (
            SELECT MIN(ps2.ps_supplycost)
            FROM ps ps2
            JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
            JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
            JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
            WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'ASIA')
        ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        LIMIT 100""")),

    GraftQuery(
      "q217_having_scalar_subquery",
      "TPC-H Q11 shape: HAVING filtered against a scalar subquery " +
        "over the WHOLE table — per-part inventory value within one " +
        "nation, kept only when it exceeds a fraction of the " +
        "nation's total. The subquery is uncorrelated, so Catalyst " +
        "executes it ONCE as a broadcast scalar and the HAVING " +
        "becomes a cheap post-aggregate filter — never a re-scan " +
        "per group. Value arithmetic is DECIMAL(18,2) x BIGINT " +
        "(exact partial sums in any engine); the 0.001 fraction " +
        "compares the same exact totals scaled by the same double.",
      (spark, dir) => {
        Tables.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem_q217")
        Tables.table(spark, dir, "supplier").createOrReplaceTempView("supplier_q217b")
        Tables.table(spark, dir, "nation").createOrReplaceTempView("nation_q217")
        spark.sql("""
          WITH ps AS (
            SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                   SUM(CAST(l_quantity AS BIGINT)) AS ps_availqty,
                   MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost
            FROM lineitem_q217 GROUP BY l_partkey, l_suppkey)
          SELECT ps_partkey,
                 CAST(SUM(ps_supplycost * ps_availqty) AS DOUBLE) AS part_value
          FROM ps
          JOIN supplier_q217b ON s_suppkey = ps_suppkey
          JOIN nation_q217 ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_3'
          GROUP BY ps_partkey
          HAVING SUM(ps_supplycost * ps_availqty) > (
            SELECT SUM(ps_supplycost * ps_availqty) * 0.0001
            FROM ps JOIN supplier_q217b ON s_suppkey = ps_suppkey
                    JOIN nation_q217 ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3')
          ORDER BY part_value DESC, ps_partkey""")
      },
      Some("""
        WITH ps AS (
          SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                 SUM(CAST(l_quantity AS BIGINT)) AS ps_availqty,
                 MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost
          FROM lineitem GROUP BY l_partkey, l_suppkey)
        SELECT ps_partkey,
               CAST(SUM(ps_supplycost * ps_availqty) AS DOUBLE) AS part_value
        FROM ps
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY ps_partkey
        HAVING SUM(ps_supplycost * ps_availqty) > (
          SELECT SUM(ps_supplycost * ps_availqty) * 0.0001
          FROM ps JOIN supplier ON s_suppkey = ps_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_3')
        ORDER BY part_value DESC, ps_partkey""")),

    GraftQuery(
      "q218_in_correlated_agg_chain",
      "TPC-H Q20 shape: IN over a subquery whose WHERE chains " +
        "another IN (the part-name filter) AND a correlated " +
        "aggregate comparison — suppliers across the NATION_1x name-prefix group who shipped " +
        "at least a quarter of a red part's all-time volume inside " +
        "1997. Catalyst must decorrelate the inner SUM into a " +
        "grouped aggregate joined on BOTH correlation keys and " +
        "turn each IN into a left-semi join — three hash joins at " +
        "100 TB, never a per-(part,supplier) fact re-scan. " +
        "Quantities ride BIGINT (exact everywhere); a pair with no " +
        "1997 shipments yields NULL, which fails the comparison " +
        "identically in both engines.",
      (spark, dir) => {
        Tables.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem_q218")
        Tables.table(spark, dir, "part").createOrReplaceTempView("part_q218")
        Tables.table(spark, dir, "supplier").createOrReplaceTempView("supplier_q218")
        Tables.table(spark, dir, "nation").createOrReplaceTempView("nation_q218")
        spark.sql("""
          WITH ps AS (
            SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                   SUM(CAST(l_quantity AS BIGINT)) AS ps_availqty
            FROM lineitem_q218 GROUP BY l_partkey, l_suppkey)
          SELECT s.s_name, s.s_acctbal
          FROM supplier_q218 s JOIN nation_q218 n ON s.s_nationkey = n.n_nationkey
          WHERE n.n_name LIKE 'NATION_1%'
            AND s.s_suppkey IN (
              SELECT ps.ps_suppkey FROM ps
              WHERE ps.ps_partkey IN (SELECT p_partkey FROM part_q218
                                      WHERE p_name LIKE 'red%')
                AND (SELECT COALESCE(SUM(CAST(l.l_quantity AS BIGINT)), 0)
                     FROM lineitem_q218 l
                     WHERE l.l_partkey = ps.ps_partkey
                       AND l.l_suppkey = ps.ps_suppkey
                       AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                       AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00')
                    * 4 > ps.ps_availqty)
          ORDER BY s.s_name""")
      },
      Some("""
        WITH ps AS (
          SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                 SUM(CAST(l_quantity AS BIGINT)) AS ps_availqty
          FROM lineitem GROUP BY l_partkey, l_suppkey)
        SELECT s.s_name, s.s_acctbal
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name LIKE 'NATION_1%'
          AND s.s_suppkey IN (
            SELECT ps.ps_suppkey FROM ps
            WHERE ps.ps_partkey IN (SELECT p_partkey FROM part
                                    WHERE p_name LIKE 'red%')
              AND (SELECT COALESCE(SUM(CAST(l.l_quantity AS BIGINT)), 0)
                   FROM lineitem l
                   WHERE l.l_partkey = ps.ps_partkey
                     AND l.l_suppkey = ps.ps_suppkey
                     AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                     AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00')
                  * 4 > ps.ps_availqty)
        ORDER BY s.s_name""")),

    GraftQuery(
      "q219_antijoin_scalar_avg_dispatch",
      "TPC-H Q22 shape: NOT EXISTS anti-join + a scalar AVG over a " +
        "filtered set + substring dispatch, in one query — balance " +
        "census of above-average customers in selected name-code " +
        "buckets who placed no order since 2000. Catalyst executes " +
        "the uncorrelated AVG once, rewrites NOT EXISTS to a left-" +
        "anti hash join on o_custkey, and the dispatch is a scan-" +
        "level IN over the last-two-character code — one fact " +
        "shuffle total. The threshold rides exact integer cents " +
        "(ROUND(x*100) never lands on .5 for 2-decimal stored " +
        "values) so both engines average identical BIGINTs into " +
        "the identical double.",
      (spark, dir) => {
        Tables.table(spark, dir, "customer").createOrReplaceTempView("customer_q219")
        Tables.table(spark, dir, "orders").createOrReplaceTempView("orders_q219")
        spark.sql("""
          SELECT cntrycode, COUNT(*) AS numcust,
                 CAST(SUM(acctbal) AS DOUBLE) AS totacctbal
          FROM (
            SELECT SUBSTRING(c_name, LENGTH(c_name)-1, 2) AS cntrycode,
                   CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal
            FROM customer_q219 c
            WHERE SUBSTRING(c_name, LENGTH(c_name)-1, 2)
                    IN ('01','12','23','34','45','56')
              AND CAST(ROUND(c_acctbal * 100) AS BIGINT) > (
                SELECT AVG(CAST(ROUND(c2.c_acctbal * 100) AS BIGINT))
                FROM customer_q219 c2
                WHERE c2.c_acctbal > 0.0
                  AND SUBSTRING(c2.c_name, LENGTH(c2.c_name)-1, 2)
                        IN ('01','12','23','34','45','56'))
              AND NOT EXISTS (SELECT 1 FROM orders_q219 o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderdate >=
                                    TIMESTAMP '2000-01-01 00:00:00')
          ) t
          GROUP BY cntrycode
          ORDER BY cntrycode""")
      },
      Some("""
        SELECT cntrycode, COUNT(*) AS numcust,
               CAST(SUM(acctbal) AS DOUBLE) AS totacctbal
        FROM (
          SELECT SUBSTRING(c_name, LENGTH(c_name)-1, 2) AS cntrycode,
                 CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal
          FROM customer c
          WHERE SUBSTRING(c_name, LENGTH(c_name)-1, 2)
                  IN ('01','12','23','34','45','56')
            AND CAST(ROUND(c_acctbal * 100) AS BIGINT) > (
              SELECT AVG(CAST(ROUND(c2.c_acctbal * 100) AS BIGINT))
              FROM customer c2
              WHERE c2.c_acctbal > 0.0
                AND SUBSTRING(c2.c_name, LENGTH(c2.c_name)-1, 2)
                      IN ('01','12','23','34','45','56'))
            AND NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderdate >=
                                  TIMESTAMP '2000-01-01 00:00:00')
        ) t
        GROUP BY cntrycode
        ORDER BY cntrycode""")),

    GraftQuery(
      "q230_exists_priority_census",
      "TPC-H Q4 shape: EXISTS whose correlation touches the outer " +
        "row's key AND a non-key column — orders in a six-month " +
        "window counted per priority when at least one of their " +
        "lines shipped more than 30 days after the order date. " +
        "Catalyst rewrites the EXISTS into a left-semi hash join on " +
        "o_orderkey with the date comparison as the join's residual " +
        "condition — at 100 TB one fact shuffle, never a per-order " +
        "probe (PlanShapeSpec asserts the semi join and that no " +
        "subquery survives). Timestamp + INTERVAL arithmetic is " +
        "exact in both engines; the count is a pure COUNT(*).",
      (spark, dir) => {
        Tables.table(spark, dir, "orders").createOrReplaceTempView("orders_q230")
        Tables.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem_q230")
        spark.sql("""
          SELECT o_orderpriority, count(*) AS order_count
          FROM orders_q230 o
          WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
            AND EXISTS (SELECT 1 FROM lineitem_q230 l
                        WHERE l.l_orderkey = o.o_orderkey
                          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
          GROUP BY o_orderpriority
          ORDER BY o_orderpriority""")
      },
      Some("""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    GraftQuery(
      "q231_binational_volume",
      "TPC-H Q7 shape: the nation-PAIR disjunction over a five-table " +
        "join — shipping volume between NATION_18 and NATION_19 in " +
        "both directions, by year. The OR references columns from " +
        "two different dimension branches, so it cannot ride either " +
        "scan; the plan that survives 100 TB keeps every join an " +
        "equi hash join (both nation joins are key equalities) and " +
        "evaluates the pair disjunction as a post-join filter over " +
        "two broadcast dims — never a cartesian over nation x " +
        "nation. Revenue rides the q1/q3 exact-DECIMAL discipline; " +
        "(supp_nation, cust_nation, l_year) is a total order.",
      (spark, dir) => {
        Tables.table(spark, dir, "supplier").createOrReplaceTempView("supplier_q231")
        Tables.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem_q231")
        Tables.table(spark, dir, "orders").createOrReplaceTempView("orders_q231")
        Tables.table(spark, dir, "customer").createOrReplaceTempView("customer_q231")
        Tables.table(spark, dir, "nation").createOrReplaceTempView("nation_q231")
        spark.sql("""
          SELECT supp_nation, cust_nation, l_year,
                 CAST(SUM(volume) AS DOUBLE) AS revenue, COUNT(*) AS n_items
          FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
                   CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(18,2))
                        - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
            FROM supplier_q231 s
            JOIN lineitem_q231 l ON s.s_suppkey = l.l_suppkey
            JOIN orders_q231 o ON o.o_orderkey = l.l_orderkey
            JOIN customer_q231 c ON c.c_custkey = o.o_custkey
            JOIN nation_q231 n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation_q231 n2 ON c.c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
               OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
          ) shipping
          GROUP BY supp_nation, cust_nation, l_year
          ORDER BY supp_nation, cust_nation, l_year""")
      },
      Some("""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(volume) AS DOUBLE) AS revenue, COUNT(*) AS n_items
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
                 CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2))
                      - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
          FROM supplier s
          JOIN lineitem l ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
          WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
             OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year""")),

    GraftQuery(
      "q232_market_share",
      "TPC-H Q8 shape: market share as a conditional-aggregate " +
        "RATIO — one focal nation's fraction of a region's PROMO-" +
        "part revenue per order year, over an eight-table join with " +
        "the SAME dimension (nation) joined twice under different " +
        "roles. Both sums stay exact DECIMAL through the partial " +
        "aggregation and are cast to double only for the single " +
        "division, so the ratio is the same double in any engine at " +
        "any parallelism. At 100 TB the numerator costs nothing " +
        "extra: it is the same map-side partial aggregate with a " +
        "CASE, not a second pass over the fact.",
      (spark, dir) => {
        Tables.table(spark, dir, "part").createOrReplaceTempView("part_q232")
        Tables.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem_q232")
        Tables.table(spark, dir, "supplier").createOrReplaceTempView("supplier_q232")
        Tables.table(spark, dir, "orders").createOrReplaceTempView("orders_q232")
        Tables.table(spark, dir, "customer").createOrReplaceTempView("customer_q232")
        Tables.table(spark, dir, "nation").createOrReplaceTempView("nation_q232")
        Tables.table(spark, dir, "region").createOrReplaceTempView("region_q232")
        spark.sql("""
          SELECT o_year,
                 CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                   / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
                 COUNT(*) AS n_items
          FROM (
            SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
                   CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(18,2))
                        - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
                   n2.n_name AS supp_nation
            FROM part_q232 p
            JOIN lineitem_q232 l ON p.p_partkey = l.l_partkey
            JOIN supplier_q232 s ON s.s_suppkey = l.l_suppkey
            JOIN orders_q232 o ON l.l_orderkey = o.o_orderkey
            JOIN customer_q232 c ON o.o_custkey = c.c_custkey
            JOIN nation_q232 n1 ON c.c_nationkey = n1.n_nationkey
            JOIN nation_q232 n2 ON s.s_nationkey = n2.n_nationkey
            JOIN region_q232 r ON n1.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
          ) all_nations
          GROUP BY o_year
          ORDER BY o_year""")
      },
      Some("""
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
               COUNT(*) AS n_items
        FROM (
          SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
                 CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2))
                      - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
                 n2.n_name AS supp_nation
          FROM part p
          JOIN lineitem l ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
          JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
          JOIN region r ON n1.n_regionkey = r.r_regionkey
          WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
            AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        ) all_nations
        GROUP BY o_year
        ORDER BY o_year""")),

    GraftQuery(
      "q233_priority_class_counts",
      "TPC-H Q12 shape: the two-bucket CASE census over a fact-to-" +
        "fact join — finished lineitems shipped in 1997 classified " +
        "by their order's priority into high/low counts per return " +
        "flag. Both CASE sums ride the same partial aggregate (one " +
        "pass, map-side combined); the join is orders x lineitem on " +
        "the order key with the date+status filters pushed to the " +
        "lineitem scan. Counts are CAST to BIGINT on both sides " +
        "(DuckDB's SUM over INTEGER widens to HUGEINT).",
      (spark, dir) => {
        Tables.table(spark, dir, "orders").createOrReplaceTempView("orders_q233")
        Tables.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem_q233")
        spark.sql("""
          SELECT l_returnflag,
                 CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                 CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
          FROM orders_q233 JOIN lineitem_q233 ON o_orderkey = l_orderkey
          WHERE l_linestatus = 'F'
            AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l_returnflag
          ORDER BY l_returnflag""")
      },
      Some("""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_linestatus = 'F'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    GraftQuery(
      "q234_order_count_distribution",
      "TPC-H Q13 shape: the outer-join histogram — customers LEFT " +
        "OUTER joined to their non-'4-NOT SPECIFIED' orders (the " +
        "filter lives in the JOIN CONDITION, not a WHERE, so " +
        "customers with zero qualifying orders survive as count 0), " +
        "aggregated twice: orders per customer, then customers per " +
        "order count. The ON-clause placement is the semantic trap " +
        "this query pins: a WHERE would silently drop the zero " +
        "bucket. At 100 TB this is two hash aggregations and one " +
        "shuffle join on o_custkey; count(o_orderkey) counts only " +
        "matched rows by SQL NULL semantics, identically in both " +
        "engines.",
      (spark, dir) => {
        Tables.table(spark, dir, "customer").createOrReplaceTempView("customer_q234")
        Tables.table(spark, dir, "orders").createOrReplaceTempView("orders_q234")
        spark.sql("""
          SELECT c_count, count(*) AS custdist
          FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer_q234 c LEFT OUTER JOIN orders_q234 o
              ON c.c_custkey = o.o_custkey
                 AND o.o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY c.c_custkey
          ) c_orders
          GROUP BY c_count
          ORDER BY custdist DESC, c_count DESC""")
      },
      Some("""
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey
               AND o.o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c.c_custkey
        ) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC""")),

    GraftQuery(
      "q235_promo_revenue_share",
      "TPC-H Q14 shape: single-row conditional-revenue ratio — the " +
        "PROMO part type's share of one month's revenue, numerator " +
        "and denominator from ONE pass over the joined frame (the " +
        "CASE rides the same partial aggregate). Both components " +
        "are exposed as exact-DECIMAL-summed doubles alongside the " +
        "percentage so a divergence would localize; the percentage " +
        "itself is double arithmetic over identical doubles " +
        "(100.0 * promo / total, left-associative in both engines).",
      (spark, dir) => {
        Tables.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem_q235")
        Tables.table(spark, dir, "part").createOrReplaceTempView("part_q235")
        spark.sql("""
          SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                   AS promo_revenue,
                 CAST(SUM(volume) AS DOUBLE) AS total_revenue,
                 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN volume
                                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                       / CAST(SUM(volume) AS DOUBLE) AS promo_pct
          FROM (
            SELECT p.p_type,
                   CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(18,2))
                        - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
            FROM lineitem_q235 l JOIN part_q235 p ON l.l_partkey = p.p_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
          ) t""")
      },
      Some("""
        SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN volume
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 AS promo_revenue,
               CAST(SUM(volume) AS DOUBLE) AS total_revenue,
               100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN volume
                                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                     / CAST(SUM(volume) AS DOUBLE) AS promo_pct
        FROM (
          SELECT p.p_type,
                 CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2))
                      - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
            AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        ) t""")),

    GraftQuery(
      "q236_notin_supplier_census",
      "TPC-H Q16 shape: NOT IN over a subquery — the null-aware " +
        "anti-join — plus COUNT(DISTINCT) per three-column group. " +
        "Suppliers-per-(brand, type, size) over the distinct " +
        "lineitem part-supplier association, excluding negative-" +
        "balance suppliers via NOT IN (Spark plans the null-aware " +
        "single-column anti join; s_suppkey is non-null so the " +
        "semantics equal a plain anti join, and PlanShapeSpec " +
        "asserts no cartesian fallback). The distinct count " +
        "deduplicates inside the aggregate exactly in both engines; " +
        "(supplier_cnt DESC, brand, type, size) is a total order.",
      (spark, dir) => {
        Tables.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem_q236")
        Tables.table(spark, dir, "part").createOrReplaceTempView("part_q236")
        Tables.table(spark, dir, "supplier").createOrReplaceTempView("supplier_q236")
        spark.sql("""
          WITH ps AS (
            SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
            FROM lineitem_q236)
          SELECT p_brand, p_type, p_size,
                 count(DISTINCT ps_suppkey) AS supplier_cnt
          FROM ps JOIN part_q236 ON p_partkey = ps_partkey
          WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
            AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
            AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier_q236
                                   WHERE s_acctbal < 0)
          GROUP BY p_brand, p_type, p_size
          ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
      },
      Some("""
        WITH ps AS (
          SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
          FROM lineitem)
        SELECT p_brand, p_type, p_size,
               count(DISTINCT ps_suppkey) AS supplier_cnt
        FROM ps JOIN part ON p_partkey = ps_partkey
        WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
          AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")),

    GraftQuery(
      "q237_big_order_customers",
      "TPC-H Q18 shape: IN over a GROUP BY ... HAVING subquery — " +
        "large-quantity orders (total quantity > 280) with their " +
        "customers and exact quantity sums. Catalyst plans the IN " +
        "as a left-semi hash join against the pre-aggregated " +
        "lineitem — the HAVING aggregate runs ONCE as its own " +
        "shuffle, never per outer row; at 100 TB that is the only " +
        "scalable spelling. Quantity sums ride BIGINT and are CAST " +
        "to BIGINT on both sides (DuckDB widens SUM(BIGINT) to " +
        "HUGEINT); the ORDER BY tiebreaks on the unique order key.",
      (spark, dir) => {
        Tables.table(spark, dir, "customer").createOrReplaceTempView("customer_q237")
        Tables.table(spark, dir, "orders").createOrReplaceTempView("orders_q237")
        Tables.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem_q237")
        spark.sql("""
          SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                 CAST(o.o_totalprice AS DOUBLE) AS totalprice,
                 CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
          FROM customer_q237 c
          JOIN orders_q237 o ON c.c_custkey = o.o_custkey
          JOIN lineitem_q237 l ON o.o_orderkey = l.l_orderkey
          WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem_q237
                                 GROUP BY l_orderkey
                                 HAVING SUM(CAST(l_quantity AS BIGINT)) > 280)
          GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                   o.o_totalprice
          ORDER BY totalprice DESC, o.o_orderkey
          LIMIT 100""")
      },
      Some("""
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               CAST(o.o_totalprice AS DOUBLE) AS totalprice,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                               GROUP BY l_orderkey
                               HAVING SUM(CAST(l_quantity AS BIGINT)) > 280)
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                 o.o_totalprice
        ORDER BY totalprice DESC, o.o_orderkey
        LIMIT 100""")),

    GraftQuery(
      "q238_disjunctive_pushdown",
      "TPC-H Q19 shape: the OR-of-ANDs predicate spanning BOTH join " +
        "sides — three (brand, size-range, quantity-range) clauses " +
        "over lineitem x part. The plan this query pins: Catalyst " +
        "extracts the common p_partkey = l_partkey equi-condition " +
        "so the join stays a hash join with the disjunction as its " +
        "residual filter, and infers per-side OR filters pushed " +
        "into each scan — never a nested-loop evaluating the " +
        "disjunction as the join condition itself (PlanShapeSpec " +
        "asserts no BNLJ/cartesian). Revenue is the exact-DECIMAL " +
        "discipline on a single output row.",
      (spark, dir) => {
        Tables.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem_q238")
        Tables.table(spark, dir, "part").createOrReplaceTempView("part_q238")
        spark.sql("""
          SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(18,2))
                             - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                   AS revenue,
                 COUNT(*) AS n_items
          FROM lineitem_q238 l JOIN part_q238 p ON p.p_partkey = l.l_partkey
          WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
                 AND l.l_quantity BETWEEN 1 AND 11)
             OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
                 AND l.l_quantity BETWEEN 10 AND 20)
             OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
                 AND l.l_quantity BETWEEN 20 AND 30)""")
      },
      Some("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                 AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 20 AND 30)""")),

    GraftQuery(
      "q239_max_revenue_supplier",
      "TPC-H Q15 shape: a named revenue view consumed TWICE — once " +
        "joined to supplier, once inside the scalar MAX that " +
        "selects the winner(s). The aggregate stays exact DECIMAL " +
        "end-to-end, so the equality probe against the MAX is an " +
        "exact-value match (the double cast happens only at " +
        "output) — the float-equality trap the textbook Q15 " +
        "carries is engineered out identically in both engines. " +
        "The scalar MAX executes once (one-shot uncorrelated " +
        "subquery, same plan family PlanShapeSpec pins for q217).",
      (spark, dir) => {
        Tables.table(spark, dir, "supplier").createOrReplaceTempView("supplier_q239")
        Tables.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem_q239")
        spark.sql("""
          WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(18,2))
                          - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
            FROM lineitem_q239
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey)
          SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
          FROM supplier_q239 JOIN revenue ON s_suppkey = supplier_no
          WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
          ORDER BY s_suppkey""")
      },
      Some("""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(18,2))
                        - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
        ORDER BY s_suppkey""")),

    GraftQuery(
      "q244_forecast_revenue_delta",
      "TPC-H Q6 shape: the pure scan-side filter aggregate — revenue " +
        "delta from discounted small-quantity lineitems in one year, " +
        "no join at all. The query pins that ALL three predicates " +
        "reach the parquet scan as pushed filters (date range, " +
        "discount band, quantity cap) so the 100 TB form reads only " +
        "matching row groups; the product rides DECIMAL(18,2) x " +
        "DECIMAL(18,2) exactly. Completes the 22-shape TPC-H " +
        "battery together with q1/q3/q5/q10 and q203-q239. Stored " +
        "double literals (0.02/0.04) parse to identical doubles in " +
        "both engines, so the band keeps the same rows.",
      (spark, dir) => {
        Tables.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem_q244")
        spark.sql("""
          SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                 COUNT(*) AS n_items
          FROM lineitem_q244
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            AND l_discount BETWEEN 0.02 AND 0.04
            AND l_quantity < 10""")
      },
      Some("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.02 AND 0.04
          AND l_quantity < 10""")),

    GraftQuery(
      "q245_product_profit_by_nation",
      "TPC-H Q9 shape: profit by supplier nation and year for parts " +
        "matching a CONTAINS pattern — the '%red%' LIKE cannot be a " +
        "range predicate, so the plan this pins is the LIKE pushed " +
        "to the part SCAN (shrinking the build side before any " +
        "join) with the four joins staying key-equi hash joins. " +
        "Amount is the q1/q3 exact-DECIMAL discipline; " +
        "(nation, o_year) totals the order with Q9's traditional " +
        "year DESC.",
      (spark, dir) => {
        Tables.table(spark, dir, "part").createOrReplaceTempView("part_q245")
        Tables.table(spark, dir, "lineitem").createOrReplaceTempView("lineitem_q245")
        Tables.table(spark, dir, "supplier").createOrReplaceTempView("supplier_q245")
        Tables.table(spark, dir, "orders").createOrReplaceTempView("orders_q245")
        Tables.table(spark, dir, "nation").createOrReplaceTempView("nation_q245")
        spark.sql("""
          SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit,
                 COUNT(*) AS n
          FROM (
            SELECT n_name AS nation,
                   CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
                   CAST(l_extendedprice AS DECIMAL(18,2))
                     * (CAST(1 AS DECIMAL(18,2))
                        - CAST(l_discount AS DECIMAL(18,2))) AS amount
            FROM part_q245 JOIN lineitem_q245 ON p_partkey = l_partkey
            JOIN supplier_q245 ON s_suppkey = l_suppkey
            JOIN orders_q245 ON o_orderkey = l_orderkey
            JOIN nation_q245 ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%'
          ) profit
          GROUP BY nation, o_year
          ORDER BY nation, o_year DESC""")
      },
      Some("""
        SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit,
               COUNT(*) AS n
        FROM (
          SELECT n_name AS nation,
                 CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
                 CAST(l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2))
                      - CAST(l_discount AS DECIMAL(18,2))) AS amount
          FROM part JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%red%'
        ) profit
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC"""))
  )
}
