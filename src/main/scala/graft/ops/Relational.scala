package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Relational operator suite: joins, aggregations, windows, sorts/top-k,
  * set operations, scalar/date/JSON functions, tumbling-window aggregation.
  *
  * Design rules (see SURVEY.md §2.3-2.6, §7.4):
  *  - Every query is deterministic: explicit ORDER BY with a unique
  *    tie-breaker, so the DuckDB-oracle hash compare is stable.
  *  - Double-typed aggregates are round()ed in BOTH engines: partial
  *    (map-side) aggregation sums doubles in a different order than
  *    DuckDB's sequential scan, so the last few bits can differ; rounding
  *    at a granularity far above the FP noise floor makes them equal.
  *  - Derived integer types are aligned explicitly (DuckDB length()/
  *    row_number() are BIGINT, Spark's are INT — cast to agree).
  *  - Broadcast hints only where a side is a genuine dimension table
  *    (nation/region/supplier) that stays small at 100 TB scale factors;
  *    fact-to-fact joins are left to shuffled hash/sort-merge + AQE.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: partial+final hash aggregation over
    * the largest fact table; no join, one shuffle on the 6-value group key. */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 2) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_base_price,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      | round(avg(l_quantity), 4) AS avg_qty,
      | round(avg(l_discount), 4) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Equi inner join fact-to-dimension; AQE broadcasts the customer side
    * when it is under the threshold, otherwise shuffled hash join. */
  def q02JoinInner(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("c_mktsegment"))

  val q02Sql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      | round(sum(o_totalprice), 2) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Multi-way join: lineitem⋈orders (fact-fact, shuffle on orderkey)
    * then ⋈customer (AQE) then ⋈broadcast(nation) (25-row dim). */
  def q03JoinMulti(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
           count(lit(1)).as("n_rows"))
      .orderBy(col("n_name"))

  val q03Sql: String =
    """SELECT n_name,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      | count(*) AS n_rows
      |FROM lineitem
      | JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Left outer join + two-level aggregation: per-customer order count,
    * then a histogram of those counts (classic distribution query). */
  def q04JoinLeft(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_orders"))

  val q04Sql: String =
    """SELECT n_orders, count(*) AS n_customers FROM (
      | SELECT c_custkey, count(o_orderkey) AS n_orders
      | FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      | GROUP BY c_custkey
      |) GROUP BY n_orders ORDER BY n_orders""".stripMargin

  /** Left-semi join (EXISTS): customers having at least one 'F' order. */
  def q05JoinSemi(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_orderstatus") === "F"),
            col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  val q05Sql: String =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Left-anti join (NOT EXISTS): customers with no 'P' order, per nation. */
  def q06JoinAnti(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_orderstatus") === "P"),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_name"))

  val q06Sql: String =
    """SELECT n_name, count(*) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Explicit broadcast-hash joins along the dim chain supplier→nation→region. */
  def q07JoinBroadcast(s: SparkSession, d: String): DataFrame =
    supplier(s, d)
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_suppliers"),
           round(avg(col("s_acctbal")), 4).as("avg_bal"))
      .orderBy(col("r_name"))

  val q07Sql: String =
    """SELECT r_name, count(*) AS n_suppliers, round(avg(s_acctbal), 4) AS avg_bal
      |FROM supplier
      | JOIN nation ON s_nationkey = n_nationkey
      | JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** Theta join: equi key (nation) + non-equi residual (acctbal inequality).
    * Catalyst plans the equi part as the join key and evaluates the
    * inequality as a post-join condition — no cartesian product. */
  def q08JoinTheta(s: SparkSession, d: String): DataFrame =
    supplier(s, d)
      .join(customer(s, d),
            col("s_nationkey") === col("c_nationkey") && col("s_acctbal") < col("c_acctbal"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("n_name"))

  val q08Sql: String =
    """SELECT n_name, count(*) AS n_pairs
      |FROM supplier
      | JOIN customer ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
      | JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Distinct aggregation: per-group exact distinct counts (expand+two-phase). */
  def q09AggDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
           countDistinct(col("l_suppkey")).as("n_supps"),
           count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  val q09Sql: String =
    """SELECT l_returnflag,
      | count(DISTINCT l_partkey) AS n_parts,
      | count(DISTINCT l_suppkey) AS n_supps,
      | count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** ROLLUP grouping sets; grand-total/subtotal rows tagged via coalesce. */
  def q10AggRollup(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
           count(lit(1)).as("n_rows"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
              coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
              col("sum_qty"), col("n_rows"))
      .orderBy(col("rf"), col("ls"))

  val q10Sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      | coalesce(l_linestatus, 'ALL') AS ls,
      | round(sum(l_quantity), 2) AS sum_qty,
      | count(*) AS n_rows
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  /** CUBE grouping sets over orders. */
  def q11AggCube(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("o_totalprice")), 2).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
              coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
              col("n_orders"), col("total"))
      .orderBy(col("status"), col("priority"))

  val q11Sql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      | coalesce(o_orderpriority, 'ALL') AS priority,
      | count(*) AS n_orders,
      | round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Ranking window: top-3 orders per customer by price (unique tie-break). */
  def q12WindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(s, d)
      // filter on the RAW row_number attribute: a cast wrapped around
      // it blocks InferWindowGroupLimit, so the top-3 ran as a full
      // per-customer window sort instead of a 3-candidate retention
      // (round-14 review); the bigint cast moves to the output select
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn").cast("bigint").as("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val q12Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM orders
      |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** Frame aggregation: running per-customer revenue (rowsBetween frame).
    * Prefix sums evaluate in identical order in both engines → exact. */
  def q13WindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
              round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q13Sql: String =
    """SELECT o_custkey, o_orderkey,
      | round(sum(o_totalprice) OVER (
      |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Offset window functions: lag with default. */
  def q14WindowLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
              round(col("o_totalprice") - lag(col("o_totalprice"), 1, 0.0).over(w), 2)
                .as("diff_prev"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q14Sql: String =
    """SELECT o_custkey, o_orderkey,
      | round(o_totalprice - lag(o_totalprice, 1, 0.0) OVER (
      |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS diff_prev
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Global top-k: Spark plans orderBy+limit as TakeOrderedAndProject —
    * per-partition heap + driver merge of k rows, no full sort/shuffle. */
  def q15TopK(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  val q15Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** Multi-key sort (range-partitioned total sort) + limit. */
  def q16SortMulti(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
      .orderBy(col("p_brand").asc, col("p_retailprice").desc, col("p_partkey").asc)
      .limit(100)

  val q16Sql: String =
    """SELECT p_partkey, p_brand, p_retailprice
      |FROM part ORDER BY p_brand ASC, p_retailprice DESC, p_partkey LIMIT 100""".stripMargin

  /** UNION ALL of heterogeneous sources, then aggregate. */
  def q17Union(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").as("nk"))
      .unionByName(supplier(s, d).select(col("s_nationkey").as("nk")))
      .groupBy(col("nk"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("nk"))

  val q17Sql: String =
    """SELECT nk, count(*) AS n FROM (
      | SELECT c_nationkey AS nk FROM customer
      | UNION ALL
      | SELECT s_nationkey AS nk FROM supplier
      |) GROUP BY nk ORDER BY nk""".stripMargin

  /** INTERSECT (distinct set semantics). */
  def q18Intersect(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").as("nk"))
      .intersect(supplier(s, d).select(col("s_nationkey").as("nk")))
      .orderBy(col("nk"))

  val q18Sql: String =
    """SELECT c_nationkey AS nk FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nk FROM supplier
      |ORDER BY nk""".stripMargin

  /** EXCEPT (distinct set semantics): high-quantity orderkeys that are not
    * finished orders — guaranteed non-empty across scale factors. */
  def q19Except(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).filter(col("l_quantity") > 40).select(col("l_orderkey").as("k"))
      .except(orders(s, d).filter(col("o_orderstatus") === "F").select(col("o_orderkey").as("k")))
      .orderBy(col("k"))

  val q19Sql: String =
    """SELECT l_orderkey AS k FROM lineitem WHERE l_quantity > 40
      |EXCEPT
      |SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY k""".stripMargin

  /** String scalar function battery (codegen'd built-ins, no UDFs). */
  def q20ScalarString(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_partkey") <= 200)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        substring(col("p_type"), 1, 5).as("t5"),
        length(col("p_name")).cast("bigint").as("name_len"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        expr("split_part(p_type, ' ', 1)").as("first_word"),
        regexp_replace(col("p_name"), lit(" "), lit("_")).as("name_us"),
        col("p_name").startsWith("a").as("starts_a"),
        col("p_name").contains("o").as("has_o"),
        reverse(col("p_brand")).as("rbrand"))
      .orderBy(col("p_partkey"))

  val q20Sql: String =
    """SELECT p_partkey,
      | upper(p_name) AS uname,
      | lower(p_brand) AS lbrand,
      | substring(p_type, 1, 5) AS t5,
      | length(p_name) AS name_len,
      | concat(p_brand, ':', p_type) AS brand_type,
      | split_part(p_type, ' ', 1) AS first_word,
      | replace(p_name, ' ', '_') AS name_us,
      | starts_with(p_name, 'a') AS starts_a,
      | contains(p_name, 'o') AS has_o,
      | reverse(p_brand) AS rbrand
      |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin

  /** Math scalar battery. sqrt is IEEE-correctly-rounded (bit-identical in
    * both engines); composite products are rounded. */
  def q21ScalarMath(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_orderkey") <= 200)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("charge"),
        ceil(col("l_quantity")).cast("bigint").as("qty_ceil"),
        floor(col("l_extendedprice")).cast("bigint").as("price_floor"),
        round(abs(col("l_discount") - 0.05), 4).as("disc_dev"),
        round(sqrt(col("l_extendedprice")), 6).as("price_sqrt"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
        least(col("l_tax"), col("l_discount")).as("l"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val q21Sql: String =
    """SELECT l_orderkey, l_linenumber,
      | round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge,
      | CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
      | CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
      | round(abs(l_discount - 0.05), 4) AS disc_dev,
      | round(sqrt(l_extendedprice), 6) AS price_sqrt,
      | greatest(l_quantity, l_discount * 100) AS g,
      | least(l_tax, l_discount) AS l
      |FROM lineitem WHERE l_orderkey <= 200 ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Date-part extraction + aggregation. */
  def q22DateParts(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(year(col("o_orderdate")).as("yr"),
               month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("yr"), col("mo"))

  val q22Sql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS yr,
      | CAST(month(o_orderdate) AS INT) AS mo,
      | count(*) AS n,
      | round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin

  /** Semi-structured extraction: regexp field pull from a JSON string
    * column (codegen'd; avoids per-engine JSON-extension differences). */
  def q23JsonExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(regexp_extract(col("props"), "\"k\"\\s*:\\s*(-?\\d+)", 1).as("ks"),
              col("value"))
      .select(expr("try_cast(ks AS INT)").as("k"), col("value"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("k"))

  val q23Sql: String =
    """SELECT TRY_CAST(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1) AS INT) AS k,
      | count(*) AS n,
      | round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  /** Tumbling-window aggregation over the events stream table using
    * Spark's native window() operator (the batch twin of the Structured
    * Streaming query in graft.streaming.EventStream). */
  def q24EventsWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(unix_timestamp(col("w.start")).as("win_start"),
              col("event_type"), col("n"), col("total"))
      .orderBy(col("win_start"), col("event_type"))

  val q24Sql: String =
    """SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS win_start,
      | event_type, count(*) AS n, round(sum(value), 2) AS total
      |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  /** CASE WHEN bucketing + aggregation. */
  def q25Conditional(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(
        when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("high").as("bucket"),
        col("o_orderstatus"))
      .groupBy(col("bucket"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"), col("o_orderstatus"))

  val q25Sql: String =
    """SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
      |            WHEN o_totalprice < 150000 THEN 'mid'
      |            ELSE 'high' END AS bucket,
      | o_orderstatus, count(*) AS n
      |FROM orders GROUP BY 1, 2 ORDER BY bucket, o_orderstatus""".stripMargin

  /** NULL-handling battery: nullif/coalesce routing. */
  def q26Nulls(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(coalesce(
        when(col("o_orderpriority") === "1-URGENT", lit(null).cast("string"))
          .otherwise(col("o_orderpriority")),
        lit("WAS_URGENT")).as("pr"))
      .groupBy(col("pr"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("pr"))

  val q26Sql: String =
    """SELECT coalesce(NULLIF(o_orderpriority, '1-URGENT'), 'WAS_URGENT') AS pr,
      | count(*) AS n
      |FROM orders GROUP BY pr ORDER BY pr""".stripMargin

  /** Mapwarper scalar-function semantics (SURVEY §2.6 F1-F8) exercised
    * over the oracle-checkable part table: id prefixing (F2), URL
    * templating (F5), year-style coalesce (F1), m²→km² rounding (F3/F4),
    * prefix flag (F6), set-membership flag (F7). */
  def q27MapwarperFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_partkey") <= 300)
      .select(
        col("p_partkey"),
        concat(lit("layer-"), col("p_partkey").cast("string")).as("layer_id"),
        concat(lit("https://example.org/parts/"), col("p_partkey").cast("string"),
               lit("/tiles/{z}/{x}/{y}.png")).as("tile_url"),
        coalesce(when(col("p_size") === 0, lit(null).cast("int")).otherwise(col("p_size")),
                 length(col("p_name")).cast("int")).as("year_like"),
        // rounded at 8 decimals: below the 1e-7 data granularity, so the
        // round is exact in both engines (5-decimal rounding hits exact
        // .5 boundaries where Spark's BigDecimal and DuckDB's x*1e5
        // multiply disagree — p_retailprice 925.0 is such a case)
        round(col("p_retailprice") * 1e-6, 8).as("area_km2"),
        col("p_type").startsWith("STANDARD").as("is_standard"),
        col("p_brand").isin("Brand#11", "Brand#22").as("masked_like"))
      .orderBy(col("p_partkey"))

  val q27Sql: String =
    """SELECT p_partkey,
      | concat('layer-', CAST(p_partkey AS VARCHAR)) AS layer_id,
      | concat('https://example.org/parts/', CAST(p_partkey AS VARCHAR),
      |        '/tiles/{z}/{x}/{y}.png') AS tile_url,
      | coalesce(NULLIF(p_size, 0), CAST(length(p_name) AS INT)) AS year_like,
      | round(p_retailprice * 1e-6, 8) AS area_km2,
      | starts_with(p_type, 'STANDARD') AS is_standard,
      | p_brand IN ('Brand#11', 'Brand#22') AS masked_like
      |FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""".stripMargin

  /** q28's session-break gap: 30 minutes in microseconds. */
  val SessionGapUs = 1800000000L

  /** Session ids over a per-user event frame: a break is a gap >
    * `gapUs` per user; ids via prefix-sum of break flags. ONE
    * definition (round-14 review hoisted three drifting copies —
    * q28/q161/q172 vary only in the gap constant): gap math in
    * integer microseconds (unix_micros ↔ epoch_us) so both engines
    * compare identical values at the threshold boundary, and the
    * streaming twins' bridges reset across the same gap — a change to
    * sessionization semantics lands HERE or nowhere. Adds
    * gap_us/new_sess/sess_id columns. */
  private def withSessionIds(ev: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("gap_us").isNull || col("gap_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(wRun))
  }

  /** Sessionization over the event stream (>30 min gap per user). */
  def q28Sessionize(s: SparkSession, d: String): DataFrame =
    withSessionIds(events(s, d), SessionGapUs)
      .groupBy(col("user_id"))
      .agg(max(col("sess_id")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  val q28Sql: String =
    """WITH g AS (
      | SELECT user_id, event_id, ts,
      |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |       THEN 1 ELSE 0 END AS new_sess
      | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), s AS (
      | SELECT user_id,
      |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      | FROM g
      |)
      |SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions,
      | count(*) AS n_events
      |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Approximate distinct counting (HyperLogLog++): the cardinality
    * estimator a 100 TB pipeline uses instead of exact distinct. The
    * estimate is engine-specific, so this is rows-only for the driver;
    * RelationalSpec bounds its error against the exact count. */
  def q29ApproxDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
           countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy(col("l_returnflag"))

  /** Exact percentiles (linear interpolation — Spark `percentile` ≡
    * DuckDB `quantile_cont`, identical (n−1)·p index arithmetic). */
  def q37Percentiles(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5D)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9D)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99D)"), 4).as("p99"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  val q37Sql: String =
    """SELECT o_orderstatus,
      | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      | round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      | round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
      | count(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Sketch accuracy for q93: rank error ≤ 1/accuracy of the group
    * size, with O(accuracy · log n) mergeable state per group. */
  val ApproxPercentileAccuracy = 1000

  /** q93: the 100 TB percentile path (round-8 verdict ask #6) —
    * `approx_percentile` next to q37's exact anchor. Spark's exact
    * `percentile` buffers EVERY value per group (the suite's only
    * unbounded-state aggregation, fine as an oracle anchor, fatal on
    * a trillion-row group); the approx twin keeps a bounded mergeable
    * quantile sketch (Greenwald–Khanna) that partial-aggregates
    * map-side like any other sketch here (q29/q53/q49). Estimates are
    * engine-specific → rows-only; RelationalSpec bounds the RANK
    * error of every returned value against the group's true
    * distribution, the same discipline as q29's 10% bound. */
  def q93ApproxPercentiles(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr(s"approx_percentile(o_totalprice, 0.5D, $ApproxPercentileAccuracy)").as("ap50"),
        expr(s"approx_percentile(o_totalprice, 0.9D, $ApproxPercentileAccuracy)").as("ap90"),
        expr(s"approx_percentile(o_totalprice, 0.99D, $ApproxPercentileAccuracy)").as("ap99"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** Ranking-window battery: dense_rank / percent_rank / ntile / cume_dist. */
  def q38WindowMisc(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(s, d)
      .filter(col("o_custkey") < 100)
      .select(col("o_orderkey"), col("o_orderstatus"),
        dense_rank().over(w).cast("bigint").as("drank"),
        round(percent_rank().over(w), 6).as("prank"),
        ntile(4).over(w).cast("bigint").as("quartile"),
        round(cume_dist().over(w), 6).as("cdist"))
      .orderBy(col("o_orderstatus"), col("drank"), col("o_orderkey"))
  }

  val q38Sql: String =
    """SELECT o_orderkey, o_orderstatus,
      | dense_rank() OVER w AS drank,
      | round(percent_rank() OVER w, 6) AS prank,
      | ntile(4) OVER w AS quartile,
      | round(cume_dist() OVER w, 6) AS cdist
      |FROM orders WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_orderstatus, drank, o_orderkey""".stripMargin

  /** Array-function battery (results string-joined: parquet list vs
    * DuckDB list comparison is driver-dependent; strings are not). */
  def q39ArrayFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_partkey") <= 200)
      .select(
        col("p_partkey"),
        array_join(array_sort(split(col("p_name"), " ")), "|").as("sorted_words"),
        array_join(slice(split(col("p_name"), " "), 1, 2), "|").as("first_two"),
        array_join(reverse(split(col("p_name"), " ")), "|").as("rev_words"),
        size(array_distinct(split(col("p_name"), " "))).cast("bigint").as("n_distinct"),
        array_contains(split(col("p_name"), " "), "red").as("has_red"))
      .orderBy(col("p_partkey"))

  val q39Sql: String =
    """SELECT p_partkey,
      | array_to_string(list_sort(str_split(p_name, ' ')), '|') AS sorted_words,
      | array_to_string(str_split(p_name, ' ')[1:2], '|') AS first_two,
      | array_to_string(list_reverse(str_split(p_name, ' ')), '|') AS rev_words,
      | CAST(len(list_distinct(str_split(p_name, ' '))) AS BIGINT) AS n_distinct,
      | list_contains(str_split(p_name, ' '), 'red') AS has_red
      |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin

  /** Value window functions: first/last/nth over explicit ROWS frames
    * (frames stated identically in both engines — defaults differ). */
  def q50WindowValues(s: SparkSession, d: String): DataFrame = {
    val ord = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, d)
      .filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(run).as("first_price"),
        last(col("o_totalprice")).over(full).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(full).as("second_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q50Sql: String =
    """SELECT o_custkey, o_orderkey,
      | first_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
      | last_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
      | nth_value(o_totalprice, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price
      |FROM orders WHERE o_custkey < 200
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q55: arbitrary GROUPING SETS (beyond rollup/cube's fixed
    * lattices) — the sets (flag, status), (flag), (status) but NOT the
    * grand total, which neither rollup nor cube can express alone.
    * One pass + Expand, exactly like the built-in lattices. */
  def q55GroupingSets(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
           count(lit(1)).as("n_rows"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
              coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
              col("sum_qty"), col("n_rows"))
      .orderBy(col("rf"), col("ls"))

  val q55Sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      | coalesce(l_linestatus, 'ALL') AS ls,
      | round(sum(l_quantity), 2) AS sum_qty,
      | count(*) AS n_rows
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
      |ORDER BY rf, ls""".stripMargin

  /** q54: pivot (long→wide) — order revenue by year × priority class.
    * Spark's relational pivot with EXPLICIT values (no value-discovery
    * scan, and the plan is a single hash aggregation: pivot compiles
    * to one pivot_first agg per column, NOT one pass per value).
    * Oracle: the equivalent conditional aggregation in DuckDB. */
  def q54Pivot(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(year(col("o_orderdate")).as("yr"),
              substring(col("o_orderpriority"), 1, 1).as("pri"),
              col("o_totalprice"))
      .groupBy(col("yr"))
      .pivot("pri", Seq("1", "2", "3", "4", "5"))
      .agg(round(sum(col("o_totalprice")), 2))
      .select(col("yr"), col("1").as("p1"), col("2").as("p2"),
              col("3").as("p3"), col("4").as("p4"), col("5").as("p5"))
      .orderBy(col("yr"))

  val q54Sql: String =
    """SELECT year(o_orderdate) AS yr,
      | round(sum(CASE WHEN substr(o_orderpriority, 1, 1) = '1' THEN o_totalprice END), 2) AS p1,
      | round(sum(CASE WHEN substr(o_orderpriority, 1, 1) = '2' THEN o_totalprice END), 2) AS p2,
      | round(sum(CASE WHEN substr(o_orderpriority, 1, 1) = '3' THEN o_totalprice END), 2) AS p3,
      | round(sum(CASE WHEN substr(o_orderpriority, 1, 1) = '4' THEN o_totalprice END), 2) AS p4,
      | round(sum(CASE WHEN substr(o_orderpriority, 1, 1) = '5' THEN o_totalprice END), 2) AS p5
      |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin

  /** q58: scalar subquery through the spark.sql entry point — orders
    * above the global average price. Catalyst plans the subquery as a
    * one-row broadcast (SubqueryExec), evaluated once, not per row. */
  def q58ScalarSubquery(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("q58_orders")
    s.sql(
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM q58_orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM q58_orders)
        |ORDER BY price DESC, o_orderkey
        |LIMIT 100""".stripMargin)
  }

  val q58Sql: String =
    """SELECT o_orderkey, round(o_totalprice, 2) AS price
      |FROM orders
      |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      |ORDER BY price DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** q59: RANGE window frame (value-based, not row-based): per
    * customer, total spend over orders in the trailing 30 days.
    * Ordering key is epoch DAYS (numeric) so the frame is exact and
    * tie rows (same day) are peers — included regardless of order,
    * which keeps both engines deterministic. */
  def q59WindowRange(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-30, 0)
    orders(s, d)
      .withColumn("day", datediff(col("o_orderdate"), lit("1970-01-01").cast("date")))
      .select(col("o_orderkey"), col("o_custkey"), col("day"),
              round(sum(col("o_totalprice")).over(w), 2).as("spend_30d"))
      .orderBy(col("o_custkey"), col("day"), col("o_orderkey"))
  }

  val q59Sql: String =
    """SELECT o_orderkey, o_custkey,
      | datediff('day', DATE '1970-01-01', o_orderdate) AS day,
      | round(sum(o_totalprice) OVER (
      |   PARTITION BY o_custkey
      |   ORDER BY datediff('day', DATE '1970-01-01', o_orderdate)
      |   RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS spend_30d
      |FROM orders
      |ORDER BY o_custkey, day, o_orderkey""".stripMargin

  /** q60: fuzzy string matching — near-identical part names by edit
    * distance (both engines implement plain Levenshtein). Bounded id
    * range keeps the exact O(n²) pair space constant at any scale;
    * the unbounded form would go through MinHash banding (q43). */
  def q60FuzzyMatch(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d).filter(col("p_partkey") < 100)
      .select(col("p_partkey"), col("p_name"))
    val a = p.select(col("p_partkey").as("id_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_partkey").as("id_b"), col("p_name").as("name_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
              levenshtein(col("name_a"), col("name_b")).as("dist"))
      .filter(col("dist") <= 4)
      .orderBy(col("dist"), col("id_a"), col("id_b"))
  }

  val q60Sql: String =
    """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
      | levenshtein(a.p_name, b.p_name) AS dist
      |FROM part a JOIN part b ON a.p_partkey < b.p_partkey
      |WHERE a.p_partkey < 100 AND b.p_partkey < 100
      |  AND levenshtein(a.p_name, b.p_name) <= 4
      |ORDER BY dist, id_a, id_b""".stripMargin

  /** q79: lineitem⋈orders through [[Skew.saltedJoin]] (16 salts) — the
    * fact-fact shuffle join shape where a hot order key would
    * otherwise serialize one reducer. Salting is hot-key-only and
    * conditional inside ONE join: a map-side-combined count detects
    * keys over the threshold, only those are salted/replicated, and
    * the cold remainder (all of TPC-H's ≤7-row order keys here)
    * carries the single salt 0 — so on an unskewed corpus the cost is
    * ≈ the plain join plus a one-column count pass, not a ×16
    * build-side replication. The salt is semantically
    * invisible (SkewSpec pins bag equality with the plain join in
    * skewed, unskewed, and mixed regimes), so this carries a
    * plain-join hash oracle; aggregated to per-status totals so the
    * oracle compares a stable handful of rows. */
  def q79SaltedJoin(s: SparkSession, d: String): DataFrame =
    Skew.saltedJoin(
      lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice")),
      orders(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus")),
      "l_orderkey", salt = 16)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
           round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy(col("o_orderstatus"))

  val q79Sql: String =
    """SELECT o_orderstatus, count(*) AS n_items,
      | round(sum(l_extendedprice), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q115: FULL OUTER join — the one outer-join shape the suite lacked
    * (q04 left, q05 semi, q06 anti). Heavy customers (≥12 orders) full-
    * outer high-balance customers: the unmatched rows on BOTH sides are
    * the point (heavy-but-poor vs rich-but-idle vs both), tagged with a
    * side indicator and null-coalesced into a dense report.
    *
    * Scale shape: both inputs pre-aggregate/filter to small keyed
    * frames before the join, so the full-outer shuffle carries digests,
    * not fact rows; Catalyst plans it as a sort-merge join (full outer
    * can't broadcast — both sides must see unmatched keys). */
  def q115JoinFull(s: SparkSession, d: String): DataFrame = {
    val heavy = orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("o_totalprice")), 2).as("spend"))
      .filter(col("n_orders") >= 12)
    val rich = customer(s, d)
      .filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"))
    heavy.join(rich, heavy("o_custkey") === rich("c_custkey"), "full_outer")
      .select(
        coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("spend"), lit(0.0)).as("spend"),
        coalesce(col("acctbal"), lit(0.0)).as("acctbal"),
        when(col("c_custkey").isNull, "heavy_only")
          .when(col("o_custkey").isNull, "rich_only")
          .otherwise("both").as("side"))
      .orderBy(col("custkey"))
  }

  val q115Sql: String =
    """WITH heavy AS (
      | SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
      |   round(sum(o_totalprice), 2) AS spend
      | FROM orders GROUP BY o_custkey HAVING count(*) >= 12
      |), rich AS (
      | SELECT c_custkey, round(c_acctbal, 2) AS acctbal
      | FROM customer WHERE c_acctbal > 9000
      |)
      |SELECT coalesce(o_custkey, c_custkey) AS custkey,
      |  coalesce(n_orders, 0) AS n_orders,
      |  coalesce(spend, 0.0) AS spend,
      |  coalesce(acctbal, 0.0) AS acctbal,
      |  CASE WHEN c_custkey IS NULL THEN 'heavy_only'
      |       WHEN o_custkey IS NULL THEN 'rich_only'
      |       ELSE 'both' END AS side
      |FROM heavy FULL OUTER JOIN rich ON o_custkey = c_custkey
      |ORDER BY custkey""".stripMargin

  /** q116: UNPIVOT — wide per-flag measures to long (flag, measure,
    * value) form, the inverse of q54's pivot. Spark plans unpivot as a
    * map-side Expand (each input row fans out to one row per measure
    * inside the same stage — no shuffle, no join); the only exchange
    * is the upstream aggregation's. Measures are rounded BEFORE the
    * unpivot so both engines unpivot identical doubles. */
  def q116Unpivot(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
           round(sum(col("l_extendedprice")), 2).as("sum_price"),
           round(sum(col("l_discount")), 2).as("sum_disc"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "measure", "value")
      .orderBy(col("l_returnflag"), col("measure"))

  val q116Sql: String =
    """WITH w AS (
      | SELECT l_returnflag,
      |   round(sum(l_quantity), 2) AS sum_qty,
      |   round(sum(l_extendedprice), 2) AS sum_price,
      |   round(sum(l_discount), 2) AS sum_disc
      | FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
      |UNION ALL
      |SELECT l_returnflag, 'sum_price', sum_price FROM w
      |UNION ALL
      |SELECT l_returnflag, 'sum_disc', sum_disc FROM w
      |ORDER BY l_returnflag, measure""".stripMargin

  /** q118: ordered ARRAY AGGREGATION — per nation the top-5 customer
    * balances as a sorted array column (the list-building aggregate
    * the suite lacked; q39 consumes arrays, nothing produced one).
    * Values are rounded BEFORE collection and the array is sorted by
    * its own values, so both engines materialize identical lists
    * (ties between equal doubles are order-indistinguishable).
    *
    * Scale shape: collect_list per group is bounded here by the
    * slice(·, 1, 5) — but Spark still collects ALL group values
    * before slicing; the scale-safe variant for huge groups is q15's
    * rank-window top-k then collect. Noted on purpose: this query
    * exists to pin the array-agg SURFACE; nation-sized groups are
    * small by construction. */
  def q118ArrayAgg(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(col("c_nationkey"), round(col("c_acctbal"), 2).as("bal"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
           slice(sort_array(collect_list(col("bal")), asc = false), 1, 5)
             .as("top_bals"))
      .join(broadcast(nation(s, d).select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("n_customers"), col("top_bals"))
      .orderBy(col("n_name"))

  /** Driver-comparable form of q118: the verification harness hashes
    * result cells after a pandas sort, and pandas cannot sort an
    * array<double> column — so the registry entry serializes the
    * array to a deterministic comma-joined "%.2f" string (values are
    * already rounded to 2 decimals, so the format is lossless). The
    * array-typed form above stays the library surface and keeps its
    * unit test. */
  def q118ArrayAggStr(s: SparkSession, d: String): DataFrame =
    q118ArrayAgg(s, d)
      .select(col("n_name"), col("n_customers"),
              concat_ws(",", transform(col("top_bals"),
                b => format_string("%.2f", b))).as("top_bals"))

  val q118Sql: String =
    """SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
      |  array_to_string(
      |    list_transform(
      |      (list(round(c_acctbal, 2) ORDER BY round(c_acctbal, 2) DESC))[1:5],
      |      x -> printf('%.2f', x)),
      |    ',') AS top_bals
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** q130: ordered CONVERSION FUNNEL over the events stream — users
    * reaching view → click-after-view → purchase-after-that-click,
    * with conversion rates. The ORDER constraint is the point (q24
    * counts events; a funnel counts users whose first qualifying
    * event of each stage follows the previous stage's), and it is
    * what makes this a three-stage dependent aggregation instead of
    * one groupBy.
    *
    * Scale shape: each stage reduces the events scan to a one-row-
    * per-user digest and the next stage joins THAT digest back onto
    * the (filtered, pushed-down) scan — the joins are keyed on
    * user_id, carrying (id, ts) pairs only; stage digests shrink
    * monotonically. Rates divide two broadcast scalars. */
  def q130ConversionFunnel(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    // one lazy plan, no driver-side count() actions: each stage digest
    // is aggregated to a one-row count and the four rows union; the
    // denominator joins back as a broadcast scalar. countDistinct
    // ignores NULL user_ids — matching the oracle's COUNT(DISTINCT).
    val viewed = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val clicked = e.filter(col("event_type") === "click")
      .join(viewed, Seq("user_id"))
      .filter(col("ts") >= col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val purchased = e.filter(col("event_type") === "purchase")
      .join(clicked, Seq("user_id"))
      .filter(col("ts") >= col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    val total = e.agg(countDistinct(col("user_id")).as("n_users"))
      .select(lit("1_all").as("stage"), col("n_users"))
    def stageCount(df: DataFrame, tag: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(tag).as("stage"), col("n_users"))
    val stages = total
      .unionByName(stageCount(viewed, "2_viewed"))
      .unionByName(stageCount(clicked, "3_clicked"))
      .unionByName(stageCount(purchased, "4_purchased"))
    stages.crossJoin(broadcast(
        total.select(col("n_users").as("n_all"))))
      .select(col("stage"), col("n_users"),
        round(col("n_users").cast("double") / col("n_all"), 6).as("rate_vs_all"))
      .orderBy(col("stage"))
  }

  val q130Sql: String =
    """WITH v AS (
      | SELECT user_id, min(ts) AS t_view FROM events
      | WHERE event_type = 'view' GROUP BY user_id
      |), c AS (
      | SELECT e.user_id, min(e.ts) AS t_click
      | FROM events e JOIN v ON e.user_id = v.user_id
      | WHERE e.event_type = 'click' AND e.ts >= v.t_view
      | GROUP BY e.user_id
      |), p AS (
      | SELECT e.user_id, min(e.ts) AS t_purchase
      | FROM events e JOIN c ON e.user_id = c.user_id
      | WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
      | GROUP BY e.user_id
      |), tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events),
      |stages AS (
      | SELECT '1_all' AS stage, n AS n_users FROM tot
      | UNION ALL SELECT '2_viewed', CAST(count(*) AS BIGINT) FROM v
      | UNION ALL SELECT '3_clicked', CAST(count(*) AS BIGINT) FROM c
      | UNION ALL SELECT '4_purchased', CAST(count(*) AS BIGINT) FROM p
      |)
      |SELECT stage, n_users,
      |  round(CAST(n_users AS DOUBLE) / (SELECT n FROM tot), 6) AS rate_vs_all
      |FROM stages ORDER BY stage""".stripMargin

  /** q131: RETENTION COHORTS — users grouped by first-active week,
    * tracked by which later weeks they return in. The standard
    * engagement triangle. Weeks are day-offsets from a fixed epoch
    * divided by 7 (integer div, bit-identical across engines — no
    * reliance on either engine's week-truncation convention).
    *
    * Scale shape: the scan reduces to the DISTINCT (user, week)
    * activity digest in one combined pass; cohorts are a per-user min
    * over it; the triangle is digest ⋈ cohorts on user_id (ids and
    * two small ints), then one count per (cohort, offset) — at any
    * corpus size the exchanges carry scalars and the output is
    * weeks² rows. */
  def q131RetentionCohorts(s: SparkSession, d: String): DataFrame = {
    val week = expr("datediff(CAST(ts AS DATE), DATE '2024-01-01') div 7")
    val activity = events(s, d).select(col("user_id"), week.as("week")).distinct()
    val cohorts = activity.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
    val cohortSizes = cohorts.groupBy(col("cohort")).agg(count(lit(1)).as("n_cohort"))
    activity.join(cohorts, Seq("user_id"))
      .select(col("cohort"), (col("week") - col("cohort")).as("week_offset"))
      .groupBy(col("cohort"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(cohortSizes), Seq("cohort"))
      .select(col("cohort"), col("week_offset"), col("n_active"),
        round(col("n_active").cast("double") / col("n_cohort"), 6).as("retention"))
      .orderBy(col("cohort"), col("week_offset"))
  }

  val q131Sql: String =
    """WITH activity AS (
      | SELECT DISTINCT user_id,
      |   date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS week
      | FROM events
      |), cohorts AS (
      | SELECT user_id, min(week) AS cohort FROM activity GROUP BY user_id
      |), sizes AS (
      | SELECT cohort, CAST(count(*) AS BIGINT) AS n_cohort
      | FROM cohorts GROUP BY cohort
      |)
      |SELECT c.cohort, a.week - c.cohort AS week_offset,
      |  CAST(count(*) AS BIGINT) AS n_active,
      |  round(CAST(count(*) AS DOUBLE) / min(s.n_cohort), 6) AS retention
      |FROM activity a JOIN cohorts c ON a.user_id = c.user_id
      |JOIN sizes s ON s.cohort = c.cohort
      |GROUP BY c.cohort, a.week - c.cohort
      |ORDER BY c.cohort, week_offset""".stripMargin

  /** q132: DAILY VOLUME ANOMALY flags — per-day event counts scored
    * as z-scores against the corpus's own daily distribution, |z| ≥ 2
    * flagged. The ops-monitoring query every event pipeline runs (a
    * collector outage or a bot flood shows up as a flagged day before
    * anyone reads a dashboard). Zero-variance and single-day streams
    * guard to z = 0 identically in both engines (q120's degenerate-
    * input discipline).
    *
    * Scale shape: the scan collapses to the per-day digest in one
    * combined pass; the mean/sd digest is one row, broadcast back
    * onto the day frame — day count is bounded by the time range, not
    * the corpus. */
  def q132DailyAnomaly(s: SparkSession, d: String): DataFrame =
    dailyAnomalyScore(events(s, d)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_events")))

  /** The z-scoring half of q132 over a (day, n_events) digest —
    * shared VERBATIM by the streaming twin
    * ([[graft.streaming.StreamingAnomaly]]), so stream ≡ batch
    * agreement on the scoring holds by construction (the
    * SpaceSavingKernel pattern): the stream maintains the daily
    * digest with a watermarked 1-day window, then both paths score
    * through this exact plan. */
  def dailyAnomalyScore(daily: DataFrame): DataFrame = {
    val stats = daily.agg(avg(col("n_events")).as("mean_n"),
      stddev_samp(col("n_events")).as("sd_n"))
    // flag from the ROUNDED z so the output is self-consistent: a true
    // z of 1.99996 must not print as z=2.0 with flagged=0
    val z = round(when(col("sd_n").isNull || col("sd_n") === 0, lit(0.0))
      .otherwise((col("n_events") - col("mean_n")) / col("sd_n")), 4)
    daily.crossJoin(broadcast(stats))
      .select(col("day"), col("n_events"), z.as("z"),
        when(abs(z) >= 2, 1).otherwise(0).as("flagged"))
      .orderBy(col("day"))
  }

  val q132Sql: String =
    """WITH daily AS (
      | SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_events
      | FROM events GROUP BY 1
      |), stats AS (
      | SELECT avg(n_events) AS mean_n, stddev_samp(n_events) AS sd_n FROM daily
      |)
      |, z AS (
      | SELECT day, n_events,
      |   round(CASE WHEN sd_n IS NULL OR sd_n = 0 THEN 0.0
      |         ELSE (n_events - mean_n) / sd_n END, 4) AS z
      | FROM daily, stats
      |)
      |SELECT day, n_events, z,
      |  CASE WHEN abs(z) >= 2 THEN 1 ELSE 0 END AS flagged
      |FROM z ORDER BY day""".stripMargin

  /** q133: event-type TRANSITION MATRIX — P(next = b | current = a)
    * over each user's time-ordered event sequence (first-order Markov
    * estimate): the behavioral fingerprint that surfaces broken
    * instrumentation (a transition that should be impossible) and
    * dominant flows. Ordering ties break on event_id in BOTH engines,
    * so adjacent pairs are bit-identically defined.
    *
    * Scale shape: the lead window partitions by user (scalar rows:
    * type, ts, id); the pair count partial-aggregates to a
    * #types²-sized digest, and the row-normalizing totals come from
    * re-aggregating that digest — broadcast back. */
  def q133TransitionMatrix(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type").as("cur"))
      .withColumn("nxt", lead(col("cur"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("cur")).agg(sum(col("n")).as("n_cur"))
    pairs.join(broadcast(totals), Seq("cur"))
      .select(col("cur"), col("nxt"), col("n"),
        round(col("n").cast("double") / col("n_cur"), 6).as("p"))
      .orderBy(col("cur"), col("nxt"))
  }

  val q133Sql: String =
    """WITH seq AS (
      | SELECT event_type AS cur,
      |   lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      | FROM events
      |), pairs AS (
      | SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
      | FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
      |), totals AS (
      | SELECT cur, CAST(sum(n) AS BIGINT) AS n_cur FROM pairs GROUP BY cur
      |)
      |SELECT p.cur, p.nxt, p.n, round(CAST(p.n AS DOUBLE) / t.n_cur, 6) AS p
      |FROM pairs p JOIN totals t ON p.cur = t.cur
      |ORDER BY p.cur, p.nxt""".stripMargin

  /** The 24-hour grid frame (0..23) for q134's bin completion. */
  private def spark24(s: SparkSession): DataFrame = {
    import s.implicits._
    (0 to 23).toDF("hr")
  }

  /** q134: HOURLY SEASONALITY profile + χ² uniformity statistic per
    * event type — the χ² against a uniform 24-bin expectation says
    * WHether a type has diurnal structure (organic traffic does;
    * machine traffic is flat or single-spiked), and the peak hour
    * says where. χ² = Σ (obs − exp)² / exp with exp = n/24, computed
    * on the bounded (type × 24) digest; identical arithmetic both
    * engines (exact int counts, one division order).
    *
    * Scale shape: one combined pass to the (type, hour) digest;
    * everything after is on ≤ 24·#types rows. */
  def q134HourlySeasonality(s: SparkSession, d: String): DataFrame = {
    val observed = events(s, d)
      .groupBy(col("event_type"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
    // complete the 24-bin grid: empty hours contribute (0−exp)²/exp to
    // χ² — omitting them understates the statistic exactly in the
    // single-spike case this query exists to flag
    val grid = observed.select(col("event_type")).distinct()
      .crossJoin(spark24(s))
    val hourly = grid.join(observed, Seq("event_type", "hr"), "left")
      .na.fill(0L, Seq("n"))
    val totals = hourly.groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_total"))
    val exp = col("n_total").cast("double") / 24
    val chi = (col("n") - exp) * (col("n") - exp) / exp
    // peak hour by explicit (n desc, hr asc) rank — portable arg-max
    // (composite-key max_by support differs across engines)
    val peak = hourly.withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("n").desc, col("hr").asc)))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("hr").as("peak_hour"), col("n").as("peak_n"))
    hourly.join(broadcast(totals), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(min(col("n_total")).as("n_events"), round(sum(chi), 4).as("chi2"))
      .join(broadcast(peak), Seq("event_type"))
      .orderBy(col("event_type"))
  }

  val q134Sql: String =
    """WITH observed AS (
      | SELECT event_type, CAST(hour(ts) AS INT) AS hr, CAST(count(*) AS BIGINT) AS n
      | FROM events GROUP BY 1, 2
      |), grid AS (
      | SELECT t.event_type, CAST(g.hr AS INT) AS hr
      | FROM (SELECT DISTINCT event_type FROM observed) t,
      |      (SELECT unnest(range(0, 24)) AS hr) g
      |), hourly AS (
      | SELECT grid.event_type, grid.hr, coalesce(o.n, 0) AS n
      | FROM grid LEFT JOIN observed o
      |   ON o.event_type = grid.event_type AND o.hr = grid.hr
      |), totals AS (
      | SELECT event_type, CAST(sum(n) AS BIGINT) AS n_total FROM hourly GROUP BY 1
      |), peak AS (
      | SELECT event_type, hr AS peak_hour, n AS peak_n FROM (
      |   SELECT *, row_number() OVER (PARTITION BY event_type
      |     ORDER BY n DESC, hr ASC) AS rk FROM hourly)
      | WHERE rk = 1
      |)
      |SELECT h.event_type, min(t.n_total) AS n_events,
      |  round(sum((h.n - t.n_total / 24.0) * (h.n - t.n_total / 24.0)
      |        / (t.n_total / 24.0)), 4) AS chi2,
      |  min(p.peak_hour) AS peak_hour, min(p.peak_n) AS peak_n
      |FROM hourly h JOIN totals t ON h.event_type = t.event_type
      |JOIN peak p ON p.event_type = h.event_type
      |GROUP BY h.event_type ORDER BY h.event_type""".stripMargin

  /** q135: GINI CONCENTRATION of token mass across sources — how
    * unequal the corpus mix is (0 = every source contributes equally,
    * →1 = one source dominates), the single-number data-mixing
    * health check that pairs with q112's per-source KL. Computed with
    * the sorted-cumulative formula G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n
    * over the per-source token masses (i = ascending mass rank, ties
    * broken by source name identically in both engines).
    *
    * Scale shape: the corpus reduces to one row per source; the rank
    * window and the Gini sum run on that dozens-row digest (q83's
    * bounded-stats-frame justification). */
  def q135SourceGini(s: SparkSession, d: String): DataFrame =
    giniOf(documents(s, d))

  /** q135 core over any (source, text) frame — split out for planted
    * equal-mass / dominant-source tests. */
  def giniOf(docs: org.apache.spark.sql.DataFrame): DataFrame = {
    val mass = docs
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " "))).cast("double").as("x"))
    val ranked = mass.withColumn("i",
      row_number().over(Window.orderBy(col("x"), col("source"))))
    ranked.agg(count(lit(1)).as("n_sources"),
        sum(col("x")).cast("bigint").as("total_tokens"),
        round(sum(col("i") * col("x")) * 2 / (count(lit(1)) * sum(col("x")))
          - (count(lit(1)) + 1).cast("double") / count(lit(1)), 6).as("gini"))
  }

  val q135Sql: String =
    """WITH mass AS (
      | SELECT source, CAST(sum(len(str_split(text, ' '))) AS DOUBLE) AS x
      | FROM documents GROUP BY source
      |), ranked AS (
      | SELECT x, row_number() OVER (ORDER BY x, source) AS i FROM mass
      |)
      |SELECT CAST(count(*) AS BIGINT) AS n_sources,
      |  CAST(sum(x) AS BIGINT) AS total_tokens,
      |  round(sum(i * x) * 2 / (count(*) * sum(x))
      |        - CAST(count(*) + 1 AS DOUBLE) / count(*), 6) AS gini
      |FROM ranked""".stripMargin

  /** q137: 5-WAY STAR JOIN — region → nation → customer → orders →
    * lineitem, revenue by region/year. The join-reorder and
    * broadcast-decision stress the 2–3-way queries (q02/q03) don't
    * exercise: the two small dimensions (nation, region) broadcast by
    * explicit hint — threshold-independent, plan-test-pinned; customer
    * is left to Catalyst's size-based choice (it auto-broadcasts at
    * test scale and correctly co-partitions at 100 TB, where customer
    * is fact-sized); the orders⋈lineitem fact join shuffles on its
    * key with AQE re-planning from runtime stats. One aggregation
    * pass with map-side partials on top. */
  def q137StarJoin(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n_items"),
           round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
             .as("revenue"))
      .orderBy(col("r_name"), col("yr"))

  val q137Sql: String =
    """SELECT r_name, year(o_orderdate) AS yr, count(*) AS n_items,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, year(o_orderdate) ORDER BY r_name, yr""".stripMargin

  /** q138: correlated EXISTS / NOT EXISTS through the spark.sql entry
    * point — customers with at least one high-value order but no
    * low-value one. Catalyst rewrites the correlated subqueries into
    * a semi join + an anti join (the decorrelation the SQL surface
    * must guarantee — q05/q06 pin the DataFrame forms, this pins the
    * SQL form); both rewritten joins shuffle on the correlation key
    * only. */
  def q138ExistsSubquery(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("q138_customer")
    orders(s, d).createOrReplaceTempView("q138_orders")
    s.sql(
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        |FROM q138_customer c
        |WHERE EXISTS (SELECT 1 FROM q138_orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |  AND NOT EXISTS (SELECT 1 FROM q138_orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 1000)
        |ORDER BY c_custkey""".stripMargin)
  }

  val q138Sql: String =
    """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 1000)
      |ORDER BY c_custkey""".stripMargin

  /** q141: DAILY P95 TREND — exact interpolated p50/p95 of the event
    * value per (event_type, day), the SLA-style percentile trend every
    * ops dashboard plots (a p95 step-change on one day/type localizes
    * a regression that daily means smear out; q132 flags volume, this
    * flags magnitude). Exact percentile buffers per-group values —
    * bounded here by events-per-day-per-type; the q93
    * approx_percentile swap applies verbatim when a group outgrows
    * memory (q37's documented caveat).
    *
    * Scale shape: one combined aggregation to (type, day) groups;
    * group count is bounded by types × days, not corpus size. */
  def q141DailyP95(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"),
           round(percentile(col("value"), lit(0.5)), 4).as("p50"),
           round(percentile(col("value"), lit(0.95)), 4).as("p95"))
      .orderBy(col("event_type"), col("day"))

  val q141Sql: String =
    """SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n,
      |  round(quantile_cont(value, 0.5), 4) AS p50,
      |  round(quantile_cont(value, 0.95), 4) AS p95
      |FROM events GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin

  /** q142: ROLLING 7-DAY ACTIVE USERS — per day, the distinct users
    * active in the trailing week (the WAU curve; windowed DISTINCT,
    * which no window frame expresses directly). Standard reduction:
    * the scan collapses to the DISTINCT (user, day) activity digest,
    * then each activity row contributes to the ≤7 report days in
    * [day, day+6] via a bounded Generate, and a distinct count per
    * report day finishes — the exchange carries (user, day) ids, the
    * fan-out is a constant ×7, and report days are bounded by the
    * time range. Report days come from the OBSERVED day domain (a day
    * with no activity in its trailing week would not appear — none
    * such exists in a dense stream). */
  def q142RollingWau(s: SparkSession, d: String): DataFrame = {
    val activity = events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
    val days = activity.select(col("day")).distinct()
    val contrib = activity
      .select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("report_day"))
      .join(days.select(col("day").as("report_day")), Seq("report_day"))
    contrib.groupBy(col("report_day"))
      .agg(countDistinct(col("user_id")).as("wau"))
      .orderBy(col("report_day"))
  }

  val q142Sql: String =
    """WITH activity AS (
      | SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      |), days AS (SELECT DISTINCT day FROM activity)
      |SELECT d.day AS report_day,
      |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
      |FROM days d JOIN activity a
      |  ON a.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      |GROUP BY d.day ORDER BY report_day""".stripMargin

  /** q143: INTER-ARRIVAL GAP statistics per event type — median and
    * p90 seconds between a user's consecutive events of that type,
    * plus the burst fraction (gaps under 60 s). The cadence
    * fingerprint: bots and retry storms collapse the median gap;
    * instrumentation loss inflates it. Gaps come from one lag window
    * over (user, type)-partitioned scalar rows (ts, ids); the
    * percentile runs on the gap digest per type (q37's buffering
    * caveat + q93 swap apply). Tie-break on event_id, like q133, so
    * consecutive pairs are identical across engines. */
  def q143ArrivalGaps(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_ts").isNotNull)
      .select(col("event_type"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")))
          .cast("double").as("gap_s"))
    // r20 (the q165 frequency-form discipline): the exact percentiles
    // buffered every gap in ONE ObjectHashAggregate task per event
    // type — fact-cardinality rows in ~5 unspillable groups at
    // 100 TB. Gaps are whole seconds (unix_timestamp difference), a
    // small-domain integer, so the profile aggregates the
    // (event_type, gap_s, freq) digest instead: identical multiset ⇒
    // identical interpolated percentiles; count and the burst
    // fraction come back exactly as integer sums over the digest.
    gaps.groupBy(col("event_type"), col("gap_s"))
      .agg(count(lit(1)).as("freq"))
      .groupBy(col("event_type"))
      .agg(sum(col("freq")).as("n_gaps"),
           round(expr("percentile(gap_s, 0.5D, freq)"), 2).as("median_gap_s"),
           round(expr("percentile(gap_s, 0.9D, freq)"), 2).as("p90_gap_s"),
           round(sum(when(col("gap_s") < 60, col("freq")).otherwise(0L)).cast("double")
             / sum(col("freq")), 6).as("burst_frac"))
      .orderBy(col("event_type"))
  }

  val q143Sql: String =
    """WITH gaps AS (
      | SELECT event_type,
      |   CAST(date_diff('second', lag(ts) OVER (PARTITION BY user_id, event_type
      |     ORDER BY ts, event_id), ts) AS DOUBLE) AS gap_s
      | FROM events
      |)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
      |  round(quantile_cont(gap_s, 0.5), 2) AS median_gap_s,
      |  round(quantile_cont(gap_s, 0.9), 2) AS p90_gap_s,
      |  round(CAST(sum(CASE WHEN gap_s < 60 THEN 1 ELSE 0 END) AS DOUBLE)
      |        / count(*), 6) AS burst_frac
      |FROM gaps WHERE gap_s IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q144: TOP BRANDS BY SUPPLIER NATION — lineitem ⋈ part ⋈ supplier
    * ⋈ nation, revenue per (nation, brand), top-3 brands per nation by
    * rank window. Closes the last dimension-surface gap (part and
    * supplier joined through the fact's l_partkey/l_suppkey — the
    * TPC-H shape q137's customer-side star doesn't touch) and stacks
    * a WindowGroupLimit-eligible rank on a 4-way join.
    *
    * Scale shape: all three dimensions broadcast (bounded); the fact
    * scans once, aggregates map-side to the (nation, brand) digest,
    * and the top-3 window runs on that digest. */
  def q144BrandByNation(s: SparkSession, d: String): DataFrame = {
    val joined = lineitem(s, d)
      .join(broadcast(part(s, d).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
           round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
             .as("revenue"))
    joined
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("n_name"))
          .orderBy(col("revenue").desc, col("p_brand"))))
      .filter(col("rk") <= 3)
      .select(col("n_name"), col("rk"), col("p_brand"), col("n_items"), col("revenue"))
      .orderBy(col("n_name"), col("rk"))
  }

  val q144Sql: String =
    """WITH agg AS (
      | SELECT n_name, p_brand, CAST(count(*) AS BIGINT) AS n_items,
      |   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      | FROM lineitem
      | JOIN part ON l_partkey = p_partkey
      | JOIN supplier ON l_suppkey = s_suppkey
      | JOIN nation ON s_nationkey = n_nationkey
      | GROUP BY n_name, p_brand
      |)
      |SELECT n_name, rk, p_brand, n_items, revenue FROM (
      | SELECT *, CAST(row_number() OVER (PARTITION BY n_name
      |   ORDER BY revenue DESC, p_brand) AS INT) AS rk FROM agg)
      |WHERE rk <= 3 ORDER BY n_name, rk""".stripMargin

  /** q145: ORDERED STRING AGGREGATION (listagg/string_agg surface —
    * q118's string sibling): per nation, the comma-joined names of its
    * top-5 customers by balance, in rank order. collect_list gives no
    * ordering guarantee under parallel merge, so the deterministic
    * form collects (rk, name) structs and sort_array's them — the
    * struct sort is the engine-portable ORDER BY inside the aggregate.
    *
    * Scale shape: rank window per nation partition (bounded groups),
    * then a 5-row-per-group collect — the exchange carries (nation,
    * rk, name) only. */
  def q145StringAgg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_name"))
    customer(s, d)
      .select(col("c_nationkey"), col("c_name"), col("c_acctbal"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .groupBy(col("c_nationkey"))
      .agg(array_join(transform(
          sort_array(collect_list(struct(col("rk"), col("c_name")))),
          x => x.getField("c_name")), ",").as("top_names"))
      .join(broadcast(nation(s, d).select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("top_names"))
      .orderBy(col("n_name"))
  }

  val q145Sql: String =
    """WITH r AS (
      | SELECT c_nationkey, c_name,
      |   row_number() OVER (PARTITION BY c_nationkey
      |     ORDER BY c_acctbal DESC, c_name) AS rk
      | FROM customer
      |)
      |SELECT n_name, string_agg(c_name, ',' ORDER BY rk) AS top_names
      |FROM r JOIN nation ON c_nationkey = n_nationkey
      |WHERE rk <= 5 GROUP BY n_name ORDER BY n_name""".stripMargin

  /** q146: LINEAR TREND per event type — regr_slope / regr_intercept /
    * regr_r2 of the daily event count over the day index. The ops
    * trend detector (is this event type growing, collapsing, or
    * flat?) and the regression-aggregate surface (Spark's regr_*
    * family ≡ DuckDB's, both the textbook closed forms).
    *
    * Scale shape: the corpus collapses to the (type, day) digest in
    * one combined pass; the regression aggregates run on the digest
    * (days × types rows). Slope/intercept/r2 are rounded above FP
    * noise; r2 guards the flat-series 0/0 with a coalesce to 1.0 in
    * BOTH engines (a constant series is perfectly explained). */
  def q146RegrTrend(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("day_idx"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        round(expr("regr_slope(CAST(n AS DOUBLE), CAST(day_idx AS DOUBLE))"), 6).as("slope"),
        round(expr("regr_intercept(CAST(n AS DOUBLE), CAST(day_idx AS DOUBLE))"), 6).as("intercept"),
        round(expr("coalesce(regr_r2(CAST(n AS DOUBLE), CAST(day_idx AS DOUBLE)), 1.0D)"), 6).as("r2"))
      .orderBy(col("event_type"))

  val q146Sql: String =
    """WITH daily AS (
      | SELECT event_type,
      |   date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx,
      |   CAST(count(*) AS DOUBLE) AS n
      | FROM events GROUP BY 1, 2
      |)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |  round(regr_slope(n, CAST(day_idx AS DOUBLE)), 6) AS slope,
      |  round(regr_intercept(n, CAST(day_idx AS DOUBLE)), 6) AS intercept,
      |  round(coalesce(regr_r2(n, CAST(day_idx AS DOUBLE)), 1.0), 6) AS r2
      |FROM daily GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q147: BLAME THE LAST SHIPPER (TPC-H Q21 shape, adapted to this
    * schema's dates): per supplier nation, the count of multi-supplier
    * orders where that nation's supplier was the UNIQUE last to ship.
    * The classic "who held the order up" double-correlated-subquery
    * query, expressed as Spark-idiomatic aggregation instead of
    * EXISTS + NOT EXISTS self-joins: per (order, supplier) max
    * shipdate, then per-order supplier count / max / tie count, and
    * blame only where suppliers ≥ 2 and exactly one supplier hit the
    * max.
    *
    * Scale shape: the fact collapses to the (order, supplier) digest
    * in ONE map-side-combined pass; the per-order totals come from a
    * window over that digest (partitioned by order key — bounded
    * groups), NOT a groupBy + self-rejoin, which the plan audit showed
    * re-derives the digest from a second full fact scan; the blamed
    * pairs join supplier/nation broadcast. One fact scan total — the
    * plan a 100 TB run wants (the Q21 EXISTS formulation costs two
    * extra fact self-joins on top). */
  def q147WaitingOrders(s: SparkSession, d: String): DataFrame = {
    // r19 (guide §2.4 — share one exchange): everything from the
    // per-supplier rollup through the verdict aggregation keys on
    // l_orderkey, so establishing hash(l_orderkey) ONCE up front lets
    // the (l_orderkey, l_suppkey) aggregation (subset-clustered), the
    // order window, AND the verdict groupBy all reuse it — the old
    // plan paid a second full exchange re-keying the rollup from
    // (l_orderkey, l_suppkey) to l_orderkey. The traded partial
    // aggregation is worthless here: (orderkey, suppkey) is nearly
    // unique in lineitem (TPC-H multiplicity ~1), so the raw-row
    // exchange is the same size the partial-agg exchange was, and one
    // exchange replaces two. AQE still coalesces the partitions.
    val perSupp = lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("supp_last"))
    val w = Window.partitionBy(col("l_orderkey"))
    perSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("order_last", max(col("supp_last")).over(w))
      .filter(col("n_supp") >= 2)
      .groupBy(col("l_orderkey"), col("order_last"))
      .agg(sum(when(col("supp_last") === col("order_last"), 1L).otherwise(0L)).as("n_at_max"),
           max(when(col("supp_last") === col("order_last"), col("l_suppkey"))).as("blamed_supp"))
      .filter(col("n_at_max") === 1)
      .join(broadcast(supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
        col("blamed_supp") === col("s_suppkey"))
      .join(broadcast(nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_blamed_orders"))
      .orderBy(col("n_blamed_orders").desc, col("n_name"))
  }

  val q147Sql: String =
    """WITH per_supp AS (
      | SELECT l_orderkey, l_suppkey, max(l_shipdate) AS supp_last
      | FROM lineitem GROUP BY 1, 2
      |), windowed AS (
      | SELECT l_orderkey, l_suppkey, supp_last,
      |   count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
      |   max(supp_last) OVER (PARTITION BY l_orderkey) AS order_last
      | FROM per_supp
      |), verdict AS (
      | SELECT l_orderkey,
      |   CAST(sum(CASE WHEN supp_last = order_last THEN 1 ELSE 0 END) AS BIGINT) AS n_at_max,
      |   max(CASE WHEN supp_last = order_last THEN l_suppkey END) AS blamed_supp
      | FROM windowed WHERE n_supp >= 2 GROUP BY l_orderkey
      |)
      |SELECT n_name, CAST(count(*) AS BIGINT) AS n_blamed_orders
      |FROM verdict JOIN supplier ON blamed_supp = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_at_max = 1
      |GROUP BY n_name ORDER BY n_blamed_orders DESC, n_name""".stripMargin

  /** q148: POWER-USER CONCENTRATION — the share of all events produced
    * by users at or above the p99 per-user event count. The bot/whale
    * audit a training pipeline runs before trusting engagement-derived
    * weights: a healthy corpus has the top 1% carrying a few percent;
    * a scraper or a stuck client shows up as a dominating share.
    *
    * Scale shape: the (user, count) digest is derived twice — once for
    * the percentile cut (one broadcast row), once for the share pass —
    * i.e. TWO one-column map-side-combined scans of the fact. Stated
    * deliberately: the q147-style window fix doesn't apply (the cut is
    * GLOBAL, so the window would be unpartitioned over a user-
    * cardinality frame — billions of rows in one task at 100 TB),
    * and caching a user-cardinality digest is exactly the leaked-cache
    * class r9 ADVICE flagged; two cheap columnar scans win. Output is
    * ONE row. */
  def q148PowerUsers(s: SparkSession, d: String): DataFrame = {
    val perUser = events(s, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    // r20 (the q165 frequency-form discipline): the p99 cut buffered
    // every per-user count in ONE global ObjectHashAggregate task —
    // user-cardinality rows in a single unspillable group at 100 TB.
    // Counts are small-domain integers, so the cut aggregates the
    // (cnt, freq) digest instead: identical multiset ⇒ identical
    // interpolated percentile; n_users/n_events come back exactly as
    // integer sums over the digest.
    val byCnt = perUser.groupBy(col("cnt")).agg(count(lit(1)).as("freq"))
    val cut = byCnt.agg(
      expr("percentile(CAST(cnt AS DOUBLE), 0.99D, freq)").as("p99"),
      sum(col("freq")).as("n_users"),
      sum(col("cnt") * col("freq")).as("n_events"))
    perUser.crossJoin(broadcast(cut))
      .groupBy(col("p99"), col("n_users"), col("n_events"))
      .agg(sum(when(col("cnt") >= col("p99"), 1L).otherwise(0L)).as("n_power"),
           sum(when(col("cnt") >= col("p99"), col("cnt")).otherwise(0L)).as("power_events"))
      .select(col("n_users"), col("n_events"), round(col("p99"), 4).as("p99_cnt"),
        col("n_power"),
        round(col("power_events").cast("double") / col("n_events"), 6).as("power_share"))
  }

  val q148Sql: String =
    """WITH per_user AS (
      | SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
      | FROM events GROUP BY 1
      |), cut AS (
      | SELECT quantile_cont(CAST(cnt AS DOUBLE), 0.99) AS p99,
      |   CAST(count(*) AS BIGINT) AS n_users,
      |   CAST(sum(cnt) AS BIGINT) AS n_events
      | FROM per_user
      |)
      |SELECT n_users, n_events, round(p99, 4) AS p99_cnt,
      |  CAST(sum(CASE WHEN cnt >= p99 THEN 1 ELSE 0 END) AS BIGINT) AS n_power,
      |  round(CAST(sum(CASE WHEN cnt >= p99 THEN cnt ELSE 0 END) AS DOUBLE)
      |        / n_events, 6) AS power_share
      |FROM per_user, cut GROUP BY p99, n_users, n_events""".stripMargin

  /** q149: EVENT-PATH MINING — the top 20 event-type trigrams over
    * each user's time-ordered stream (lead ×2 within user). The
    * journey/sequence query behind funnel DISCOVERY: q130 measures a
    * funnel you already hypothesized; this surfaces which 3-step paths
    * actually dominate, including the pathological ones (error→error→
    * error = a retry storm).
    *
    * Scale shape: the window carries (user, type, ts, id) scalars
    * partitioned by user; paths aggregate map-side to the ≤|types|³
    * digest before the final top-k sort. event_id tie-break (q133
    * discipline) keeps simultaneous events deterministic. */
  def q149EventPaths(s: SparkSession, d: String): DataFrame =
    pathTrigrams(
      events(s, d).select(col("user_id"), col("event_type"), col("ts"),
        col("event_id")),
      Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id")))

  /** Top-20 event-type trigram mining over a windowed sequence — the
    * shared tail of q149 (per-user windows) and q161 (per-session
    * windows); one definition so path semantics (separator, n-gram
    * length, tie-break) cannot drift between them or their streaming
    * twin (round-14 review hoisted the verbatim copy). */
  private def pathTrigrams(ev: DataFrame,
                           w: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
    ev
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)

  val q149Sql: String =
    """WITH seq AS (
      | SELECT event_type AS t1,
      |   lead(event_type, 1) OVER w AS t2,
      |   lead(event_type, 2) OVER w AS t3
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |)
      |SELECT t1 || '>' || t2 || '>' || t3 AS path,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM seq WHERE t2 IS NOT NULL AND t3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin

  /** q153: EQUI-DEPTH PRICE BANDS — ntile(10) over order totals, per
    * band count/min/max. The quantile-bucketing sibling of q121's
    * equi-WIDTH histogram (equal population per band vs equal span) —
    * what a partitioner uses to pick balanced range boundaries.
    * Deterministic under ties via the o_orderkey tie-break in BOTH
    * engines (ntile assigns by row position, so the ORDER BY must be
    * a total order).
    *
    * Scale note, stated honestly: a single unpartitioned ntile is the
    * didactic form — it pins the exact-semantics SURFACE and anchors
    * the oracle. The production form is [[q160EquidepthBucketed]]
    * (approx-percentile boundaries + a map-side bucket assignment);
    * RelationalEdgeSpec pins their agreement and PlanShapeSpec
    * allowlists exactly this query's fact-sized unpartitioned window. */
  def q153EquidepthBands(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
    orders(s, d)
      .select(col("o_totalprice"), col("o_orderkey"))
      .withColumn("band", ntile(10).over(w))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
           round(min(col("o_totalprice")), 2).as("lo"),
           round(max(col("o_totalprice")), 2).as("hi"))
      .orderBy(col("band"))
  }

  val q153Sql: String =
    """SELECT CAST(band AS INT) AS band, CAST(count(*) AS BIGINT) AS n,
      |  round(min(o_totalprice), 2) AS lo,
      |  round(max(o_totalprice), 2) AS hi
      |FROM (
      | SELECT o_totalprice,
      |   ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS band
      | FROM orders
      |) GROUP BY band ORDER BY band""".stripMargin

  /** Rank-error parameter for [[q160EquidepthBucketed]]'s boundary
    * sketch: approx_percentile's guaranteed rank error is
    * n/accuracy rows per boundary. */
  val EquidepthAccuracy = 10000

  /** q160: EQUI-DEPTH BANDS AT SCALE — the production twin of q153's
    * didactic global ntile (round-10 verdict ask #1: the documented
    * 100 TB form, now as code). Two bounded passes instead of one
    * serialized sort:
    *
    *   1. boundary pass — ONE approx_percentile aggregation over the
    *      fact (mergeable Greenwald–Khanna sketch, q93 discipline:
    *      map-side partials, O(sketch) not O(rows) to the driver)
    *      yields the 9 decile boundaries;
    *   2. assignment pass — the boundaries return as a 9-element
    *      LITERAL array and each row counts the boundaries below its
    *      value MAP-SIDE (ties at a boundary go to the lower band,
    *      matching how ntile fills earlier tiles first under the
    *      value-ordered sort); the only exchange left is the final
    *      10-group aggregation.
    *
    * q153's `Window.orderBy` with no partitioning moves the ENTIRE
    * fact through one task — the one WindowExec warning in the bench
    * log that sits on a fact; at 1000 executors that task is the whole
    * query. Here nothing unpartitioned ever sees a fact-sized input,
    * which PlanShapeSpec now pins for the whole suite.
    *
    * Rows-only BY DESIGN: the boundaries are Spark's GK-sketch output
    * and DuckDB's approx_quantile is a different sketch (t-digest) —
    * no cross-engine-identical formulation stays approximate.
    * RelationalEdgeSpec pins agreement with the exact q153 form: band
    * populations within the sketch's rank-error bound (n/accuracy)
    * plus the largest value-tie class (exact ntile splits ties across
    * bands by position; a value-based bucketer cannot). */
  def q160EquidepthBucketed(s: SparkSession, d: String): DataFrame = {
    val fact = orders(s, d).select(col("o_totalprice"))
    val probs = (1 to 9).map(_ / 10.0)
    // bounded driver fold: 9 doubles, independent of corpus size
    val bounds = fact.agg(
      expr(s"approx_percentile(o_totalprice, array(${probs.mkString(", ")}), " +
        s"$EquidepthAccuracy)").as("b")).head().getSeq[Double](0)
    val bArr = typedLit(bounds)
    fact
      .withColumn("band",
        (lit(1) + size(filter(bArr, b => col("o_totalprice") > b))).cast("int"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
           round(min(col("o_totalprice")), 2).as("lo"),
           round(max(col("o_totalprice")), 2).as("hi"))
      .orderBy(col("band"))
  }

  /** q155: JOIN-KEY SKEW AUDIT — per candidate join column of the
    * fact, the key-multiplicity profile (distinct keys, max/p99/mean
    * multiplicity, the heaviest key's share of all rows, and how many
    * keys exceed [[Skew.DefaultHotThreshold]]). This is the
    * operational report that DECIDES the q79 salted-join deployment:
    * hot_keys > 0 means the plain shuffle join will serialize a
    * reducer and salting pays; all-zeros means salting is pure
    * overhead. The audit a 100 TB pipeline runs once per corpus
    * vintage, not per query.
    *
    * Scale shape: ONE fact scan reading only the three key columns,
    * exploded to (col, key) pairs map-side; the multiplicity digest
    * partial-aggregates before its exchange, and the profile is a
    * second digest-level aggregation (3 output rows). */
  def q155KeySkewAudit(s: SparkSession, d: String): DataFrame = {
    val ex = lineitem(s, d).select(explode(array(
        struct(lit("l_orderkey").as("key_col"), col("l_orderkey").as("k")),
        struct(lit("l_partkey").as("key_col"), col("l_partkey").as("k")),
        struct(lit("l_suppkey").as("key_col"), col("l_suppkey").as("k")))).as("kv"))
      .select(col("kv.key_col").as("key_col"), col("kv.k").as("k"))
    // r20 (the q165 frequency-form discipline): the p99 multiplicity
    // buffered every key's m in ONE ObjectHashAggregate task per
    // key_col — key-cardinality rows in 3 unspillable groups at
    // 100 TB. Multiplicities are small-domain integers, so the
    // profile aggregates the (key_col, m, freq) digest instead:
    // identical multiset ⇒ identical interpolated percentile, and
    // every other statistic comes back exactly as integer sums over
    // the digest (n_keys = Σfreq, Σm = Σ m·freq, mean as their exact
    // ratio — same two long sums the old avg reduced to).
    ex.groupBy(col("key_col"), col("k")).agg(count(lit(1)).as("m"))
      .groupBy(col("key_col"), col("m")).agg(count(lit(1)).as("freq"))
      .groupBy(col("key_col"))
      .agg(sum(col("freq")).as("n_keys"),
           max(col("m")).as("max_mult"),
           round(expr("percentile(CAST(m AS DOUBLE), 0.99D, freq)"), 4).as("p99_mult"),
           round(sum(col("m") * col("freq")).cast("double") /
                 sum(col("freq")), 4).as("mean_mult"),
           round(max(col("m")).cast("double") /
                 sum(col("m") * col("freq")), 6).as("top_share"),
           sum(when(col("m") > Skew.DefaultHotThreshold, col("freq")).otherwise(0L))
             .as("hot_keys"))
      .orderBy(col("key_col"))
  }

  val q155Sql: String =
    """WITH kv AS (
      | SELECT 'l_orderkey' AS key_col, l_orderkey AS k FROM lineitem
      | UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
      | UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem
      |), mult AS (
      | SELECT key_col, k, CAST(count(*) AS BIGINT) AS m FROM kv GROUP BY 1, 2
      |)
      |SELECT key_col, CAST(count(*) AS BIGINT) AS n_keys,
      |  max(m) AS max_mult,
      |  round(quantile_cont(CAST(m AS DOUBLE), 0.99), 4) AS p99_mult,
      |  round(avg(m), 4) AS mean_mult,
      |  round(CAST(max(m) AS DOUBLE) / sum(m), 6) AS top_share,
      |  CAST(sum(CASE WHEN m > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS hot_keys
      |FROM mult GROUP BY key_col ORDER BY key_col""".stripMargin

  /** Session silence bound for [[q161SessionPaths]] — 2 h, wide enough
    * that the synthetic events corpus keeps multi-event sessions at
    * sf0.001 (measured: 26 trigrams there, 281 at sf0.01). */
  val SessionPathGapUs: Long = 7200L * 1000000L

  /** q161: SESSIONIZED EVENT PATHS — q149's trigram mining, but a path
    * never spans a session gap (> [[SessionPathGapUs]] of silence):
    * "browse Monday, buy Thursday" is two journeys, not one, and the
    * un-sessionized form manufactures phantom cross-visit paths.
    * Composes q28's gap sessionization (running sum over the gap flag)
    * with q149's lead-window n-grams, re-windowed on (user, session).
    *
    * Scale shape: both windows partition by user (then user+session) —
    * no unpartitioned window, state bounded per user; the path digest
    * aggregates map-side to ≤|types|³ rows before the top-k sort. The
    * streaming twin is [[graft.streaming.StreamingPaths.sessionPathNgrams]],
    * whose bridge resets across the same gap (PathStreamSpec pins
    * stream ≡ this batch form). */
  def q161SessionPaths(s: SparkSession, d: String): DataFrame = {
    val sess = withSessionIds(
      events(s, d).select(col("user_id"), col("event_type"), col("ts"),
        col("event_id")),
      SessionPathGapUs)
    pathTrigrams(sess, Window.partitionBy(col("user_id"), col("sess_id"))
      .orderBy(col("ts"), col("event_id")))
  }

  val q161Sql: String =
    """WITH g AS (
      | SELECT user_id, event_type, ts, event_id,
      |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 7200000000
      |       THEN 1 ELSE 0 END AS new_sess
      | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), s AS (
      | SELECT user_id, event_type, ts, event_id,
      |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      | FROM g
      |), seq AS (
      | SELECT event_type AS t1,
      |  lead(event_type, 1) OVER ws AS t2,
      |  lead(event_type, 2) OVER ws AS t3
      | FROM s
      | WINDOW ws AS (PARTITION BY user_id, sess_id ORDER BY ts, event_id)
      |)
      |SELECT t1 || '>' || t2 || '>' || t3 AS path,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM seq WHERE t2 IS NOT NULL AND t3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin

  /** Attribution window for [[q163Attribution]]: a purchase further
    * than this from the last non-purchase touch is 'direct'. */
  val AttributionWindowUs: Long = 1800L * 1000000L

  /** q163: LAST-TOUCH ATTRIBUTION — for every purchase, the most
    * recent PRIOR non-purchase event of the same user within 30 min
    * gets the credit; purchases with no in-window touch are 'direct'.
    * The marketing-analytics staple over the events stream: which
    * channel actually precedes conversion, and how much value it
    * drives.
    *
    * Scale shape: one fact scan; the carry is a per-user window with
    * `last(..., ignoreNulls)` over rows UNBOUNDED..−1 — an O(1)
    * running value per row, partitioned by user (never global); the
    * result digest is ≤ |types|+1 rows. The struct carries (ts, type)
    * together so the timestamp check and the channel name can never
    * come from different touches. */
  def q163Attribution(s: SparkSession, d: String): DataFrame =
    attributedPurchases(events(s, d))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
           round(sum(col("value")), 2).as("attributed_value"))
      .orderBy(col("channel"))

  /** q163 core: one (user_id, channel, value) row per purchase — split
    * out as the batch reference for the streaming twin
    * ([[graft.streaming.StreamingAttribution]]). */
  def attributedPurchases(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        col("value"))
      .withColumn("touch", last(
          when(col("event_type") =!= "purchase",
            struct(unix_micros(col("ts")).as("pts"), col("event_type").as("ptype"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        when(col("touch").isNotNull &&
            unix_micros(col("ts")) - col("touch.pts") <= AttributionWindowUs,
          col("touch.ptype")).otherwise(lit("direct")).as("channel"),
        col("value"))
  }

  val q163Sql: String =
    """WITH t AS (
      | SELECT user_id, event_type, ts, event_id, value,
      |  last_value(CASE WHEN event_type <> 'purchase'
      |    THEN struct_pack(pts := epoch_us(ts), ptype := event_type) END
      |    IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      | FROM events
      |)
      |SELECT CASE WHEN touch IS NOT NULL
      |         AND epoch_us(ts) - touch.pts <= 1800000000
      |       THEN touch.ptype ELSE 'direct' END AS channel,
      |  CAST(count(*) AS BIGINT) AS n_purchases,
      |  round(sum(value), 2) AS attributed_value
      |FROM t WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY channel""".stripMargin

  /** Session gap for q172's session-scoped attribution: 10 minutes of
    * silence severs the session — deliberately SHORTER than
    * [[AttributionWindowUs]] (30 min), so the two rules genuinely
    * differ: a touch 25 min before a purchase with a >10-min silence
    * in between is inside q163's window but outside q172's session.
    * (A gap ≥ the window would make session scoping vacuous — any
    * in-window touch would also be in-session.) */
  val AttributionSessionGapUs: Long = 600L * 1000000L

  /** q172: SESSION-SCOPED LAST-TOUCH ATTRIBUTION — q163 with the
    * GA-style rule that credit never crosses a session boundary: the
    * carried touch resets when more than [[AttributionSessionGapUs]]
    * of silence precedes the event, so a purchase opening a fresh
    * session is 'direct' even when the previous session's touch is
    * still inside the attribution window. Completes the attribution
    * family the way q161's session paths completed q149.
    *
    * Scale shape: q161's sessionization (two per-user windows — the
    * lag-gap flag and the running session counter) followed by q163's
    * per-(user, session) ignoreNulls carry; all windows are per-user,
    * the result is a ≤|types|+1-row digest. */
  def q172SessionAttribution(s: SparkSession, d: String): DataFrame =
    sessionAttributedPurchases(events(s, d))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
           round(sum(col("value")), 2).as("attributed_value"))
      .orderBy(col("channel"))

  /** q172 core: one (user_id, channel, value) row per purchase under
    * the session-scoped rule — [[attributedPurchases]]' sibling, split
    * out so the spec can plant the distinguishing case (an in-window
    * touch severed by a session gap). */
  def sessionAttributedPurchases(ev: DataFrame): DataFrame = {
    val sess = withSessionIds(
      ev.select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        col("value")),
      AttributionSessionGapUs)
    val ws = Window.partitionBy(col("user_id"), col("sess_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    sess
      .withColumn("touch", last(
          when(col("event_type") =!= "purchase",
            struct(unix_micros(col("ts")).as("pts"), col("event_type").as("ptype"))),
          ignoreNulls = true).over(ws))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        when(col("touch").isNotNull &&
            unix_micros(col("ts")) - col("touch.pts") <= AttributionWindowUs,
          col("touch.ptype")).otherwise(lit("direct")).as("channel"),
        col("value"))
  }

  val q172Sql: String =
    """WITH g AS (
      | SELECT user_id, event_type, ts, event_id, value,
      |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 600000000
      |       THEN 1 ELSE 0 END AS new_sess
      | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), s AS (
      | SELECT user_id, event_type, ts, event_id, value,
      |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      | FROM g
      |), t AS (
      | SELECT user_id, event_type, ts, value,
      |  last_value(CASE WHEN event_type <> 'purchase'
      |    THEN struct_pack(pts := epoch_us(ts), ptype := event_type) END
      |    IGNORE NULLS) OVER (PARTITION BY user_id, sess_id
      |      ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      | FROM s
      |)
      |SELECT CASE WHEN touch IS NOT NULL
      |         AND epoch_us(ts) - touch.pts <= 1800000000
      |       THEN touch.ptype ELSE 'direct' END AS channel,
      |  CAST(count(*) AS BIGINT) AS n_purchases,
      |  round(sum(value), 2) AS attributed_value
      |FROM t WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY channel""".stripMargin

  /** q164: SUPPLIER CONCENTRATION (HHI) PER BRAND — the
    * Herfindahl–Hirschman index of supplier revenue shares within each
    * part brand, plus the top supplier's share. The sourcing-risk
    * audit: an HHI near 1 means one supplier owns the brand's volume
    * (a single point of failure); near 1/n means healthy spread.
    *
    * Scale shape: fact joins only the broadcast 2-column part dim;
    * first aggregation reduces to the (brand, supplier) digest
    * map-side, the HHI is a second digest-level aggregation (25
    * rows). Σ(share²) is computed as Σrev² / (Σrev)² so shares never
    * need a second pass or a rejoin. */
  def q164BrandHhi(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .join(broadcast(part(s, d).select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_suppkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    rev.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_suppliers"),
           round(sum(col("rev") * col("rev")) / (sum(col("rev")) * sum(col("rev"))), 6)
             .as("hhi"),
           round(max(col("rev")) / sum(col("rev")), 6).as("top_share"))
      .orderBy(col("p_brand"))
  }

  val q164Sql: String =
    """WITH rev AS (
      | SELECT p_brand, l_suppkey,
      |  sum(l_extendedprice * (1 - l_discount)) AS rev
      | FROM lineitem JOIN part ON l_partkey = p_partkey
      | GROUP BY 1, 2
      |)
      |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_suppliers,
      |  round(sum(rev * rev) / (sum(rev) * sum(rev)), 6) AS hhi,
      |  round(max(rev) / sum(rev), 6) AS top_share
      |FROM rev GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** q165: FULFILLMENT LAG PROFILE — days from order date to the
    * order's LAST shipment, profiled per order priority (count,
    * median, p90, mean). The SLA dashboard: does '1-URGENT' actually
    * ship faster than '5-LOW'?
    *
    * Scale shape: the per-order max-lag digest reduces the fact
    * map-side before its exchange; the priority profile is a 5-row
    * second aggregation. Exact percentiles run on the per-priority
    * digest (bounded by orders/5), the q155 discipline. */
  def q165FulfillmentLag(s: SparkSession, d: String): DataFrame = {
    val lag = lineitem(s, d)
      .join(orders(s, d).select(col("o_orderkey"), col("o_orderdate"),
              col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(max(datediff(col("l_shipdate"), col("o_orderdate"))).as("lag_days"))
    // r19 (guide §2.3 — aggregate before you shuffle): lag_days is a
    // small-domain integer, so the exact percentiles compute over the
    // (priority, lag_days, count) digest via percentile's FREQUENCY
    // form instead of buffering every per-order row in one
    // ObjectHashAggregate task per priority (5 straggler tasks holding
    // the whole fact's group rows — the unspillable exact-percentile
    // shape q37's heap smoke measured). The frequency form sorts the
    // distinct values and interpolates over cumulative counts —
    // definitionally the same multiset, identical values (oracle
    // hash re-verified at all three SFs); count and mean come back
    // exactly from the same digest (integer sums).
    val byLag = lag.groupBy(col("o_orderpriority"), col("lag_days"))
      .agg(count(lit(1)).as("cnt"))
    byLag.groupBy(col("o_orderpriority"))
      .agg(sum(col("cnt")).as("n_orders"),
           round(expr("percentile(CAST(lag_days AS DOUBLE), 0.5D, cnt)"), 4).as("p50"),
           round(expr("percentile(CAST(lag_days AS DOUBLE), 0.9D, cnt)"), 4).as("p90"),
           round(sum(col("lag_days").cast("bigint") * col("cnt")).cast("double") /
                 sum(col("cnt")), 4).as("mean_lag"))
      .orderBy(col("o_orderpriority"))
  }

  val q165Sql: String =
    """WITH lag AS (
      | SELECT l_orderkey, o_orderpriority,
      |  max(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)))
      |    AS lag_days
      | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      | GROUP BY 1, 2
      |)
      |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
      |  round(quantile_cont(CAST(lag_days AS DOUBLE), 0.5), 4) AS p50,
      |  round(quantile_cont(CAST(lag_days AS DOUBLE), 0.9), 4) AS p90,
      |  round(avg(lag_days), 4) AS mean_lag
      |FROM lag GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  /** q166: LATEST-VERSION SNAPSHOT — each customer's most recent order
    * (latest o_orderdate, ties to the highest key). The upsert-
    * compaction surface every incremental pipeline needs: collapse an
    * append-only change log to one current row per key. row_number
    * DESC + `= 1` plans as WindowGroupLimit, so each partition retains
    * one candidate per key during the sort instead of materializing
    * every version — the difference between snapshot and full-sort at
    * a 100 TB change log. */
  def q166LatestSnapshot(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    orders(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("last_orderkey"),
        col("o_orderdate").as("last_orderdate"),
        round(col("o_totalprice"), 2).as("last_totalprice"))
      .orderBy(col("o_custkey"))
  }

  val q166Sql: String =
    """SELECT o_custkey, last_orderkey, last_orderdate, last_totalprice
      |FROM (
      | SELECT o_custkey, o_orderkey AS last_orderkey,
      |  o_orderdate AS last_orderdate,
      |  round(o_totalprice, 2) AS last_totalprice,
      |  row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk
      | FROM orders
      |) WHERE rk = 1 ORDER BY o_custkey""".stripMargin

  /** q170: REVENUE SHARE WITHIN NATION — each supplier nation's top 3
    * part brands by revenue, with the brand's share of the nation
    * total (the ratio-to-report window) and its rank. The
    * percent-of-total surface: every BI layer asks it, and done wrong
    * (a self-join on the total) it doubles the fact scan.
    *
    * Scale shape: the fact joins only broadcast dims (part for brand,
    * supplier + nation for the nation name); everything after the
    * first aggregation — the share window, the rank, the top-3 cut —
    * runs on the ≤ nations×brands digest, partitioned by nation, with
    * the rank filter planning as WindowGroupLimit. */
  def q170RevenueShare(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .join(broadcast(part(s, d).select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d).select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("p_brand"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    val byNation = Window.partitionBy(col("n_name"))
    // rank on the ROUNDED revenue (the q144 rule, round-14 review): a
    // near-tie in the raw double sum can order differently across
    // engines (partial-aggregation summation order differs), flipping
    // which brand makes the top-3 cut; rounding first makes the rank
    // basis cross-engine-stable
    val rk = Window.partitionBy(col("n_name"))
      .orderBy(round(col("rev"), 2).desc, col("p_brand"))
    rev
      .withColumn("share", col("rev") / sum(col("rev")).over(byNation))
      .withColumn("rk", row_number().over(rk))
      .filter(col("rk") <= 3)
      .select(col("n_name"), col("rk"), col("p_brand"),
        round(col("rev"), 2).as("revenue"), round(col("share"), 6).as("share"))
      .orderBy(col("n_name"), col("rk"))
  }

  val q170Sql: String =
    """WITH rev AS (
      | SELECT n_name, p_brand,
      |  sum(l_extendedprice * (1 - l_discount)) AS rev
      | FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      | GROUP BY 1, 2
      |), ranked AS (
      | SELECT n_name, p_brand, rev,
      |  rev / sum(rev) OVER (PARTITION BY n_name) AS share,
      |  row_number() OVER (PARTITION BY n_name
      |    ORDER BY round(rev, 2) DESC, p_brand) AS rk
      | FROM rev
      |)
      |SELECT n_name, CAST(rk AS INT) AS rk, p_brand,
      |  round(rev, 2) AS revenue, round(share, 6) AS share
      |FROM ranked WHERE rk <= 3 ORDER BY n_name, rk""".stripMargin

  /** q191: SCD2 VALIDITY INTERVALS — the full-history complement of
    * q166's latest-snapshot: the append-only change log rebuilt as a
    * temporal table with `[valid_from, valid_to)` per version
    * (open-ended NULL for the current one) — the point-in-time
    * dimension every warehouse backfill joins against (the as-of
    * family consumes exactly this shape).
    *
    * Validity is keyed on the change DATE, so versions first collapse
    * to the end-of-date state (last change per key per date, q166's
    * tie-break) — without the collapse, two same-date changes produce
    * a zero-width `[d, d)` interval no point-in-time lookup can ever
    * retrieve (standard SCD2 practice: at most one version per key
    * per validity grain).
    *
    * Scale shape: both passes are key-partitioned windows — the
    * end-of-date cut plans as WindowGroupLimit, the interval window
    * evaluates version index + lead in one pass; no self-join, no
    * global sort; output ≤ change-log-sized. */
  def q191Scd2Intervals(s: SparkSession, d: String): DataFrame = {
    val intra = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val eod = orders(s, d)
      .withColumn("rk", row_number().over(intra))
      .filter(col("rk") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice"), 2).as("price"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
    eod
      .withColumn("version_idx", row_number().over(w))
      .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey"), col("version_idx"), col("o_orderkey"),
        col("o_orderdate").as("valid_from"), col("valid_to"), col("price"))
      .orderBy(col("o_custkey"), col("version_idx"))
  }

  val q191Sql: String =
    """WITH eod AS (
      | SELECT o_custkey, o_orderkey, o_orderdate,
      |  round(o_totalprice, 2) AS price
      | FROM (
      |  SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
      |    ORDER BY o_orderkey DESC) AS rk
      |  FROM orders
      | ) WHERE rk = 1
      |)
      |SELECT o_custkey,
      | CAST(row_number() OVER w AS INT) AS version_idx,
      | o_orderkey,
      | o_orderdate AS valid_from,
      | lead(o_orderdate) OVER w AS valid_to,
      | price
      |FROM eod
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
      |ORDER BY o_custkey, version_idx""".stripMargin

  /** The horizons q195 evaluates — one source for the Spark plan and
    * the oracle SQL (the q35 cannot-drift discipline). */
  private val survivalHorizons = Seq(0, 7, 14, 21, 28)

  /** q195: USER RETENTION SURVIVAL at weekly horizons — the fraction
    * of users whose observed lifetime (days between first and last
    * event) reaches ≥ h days, h ∈ {0, 7, 14, 21, 28}. The engagement
    * longevity complement of q131's cohort triangle: cohorts answer
    * "who came back WHEN", survival answers "how long do users last
    * at all" — the curve a churn model is calibrated against.
    *
    * Scale shape: one combined min/max aggregation collapses the scan
    * to a per-user (8 B id, 4 B lifetime) frame; the five horizon
    * counts fold into ONE conditional-aggregate row (no join, no
    * window, no per-horizon pass), which then explodes into the
    * 5-row curve map-side. Day arithmetic is date-difference
    * integers — bit-identical across engines, no week-truncation
    * convention in play (q131's discipline). */
  def q195RetentionSurvival(s: SparkSession, d: String): DataFrame =
    retentionSurvival(events(s, d))

  /** q195 over any (user_id, ts) frame — the planted-test surface. */
  def retentionSurvival(ev: DataFrame): DataFrame =
    survivalCurve(ev
      .groupBy(col("user_id"))
      .agg(datediff(max(col("ts").cast("date")), min(col("ts").cast("date")))
        .as("lifetime")))

  /** The curve half of q195 over a per-user `lifetime` (days) frame —
    * shared VERBATIM by the streaming twin
    * ([[graft.streaming.StreamingSurvival]] reads lifetimes out of its
    * persisted profile store and scores through this exact plan, the
    * SpaceSavingKernel pattern), so stream ≡ batch agreement on the
    * scoring holds by construction. */
  def survivalCurve(life: DataFrame): DataFrame = {
    // coalesce: sum over ZERO users is null — an empty frame must
    // yield the 5-row zero curve, not NULL n_alive (the helper is a
    // public any-frame surface, and callers read n_alive as a long)
    val counters = survivalHorizons.map(h =>
      coalesce(sum(when(col("lifetime") >= h, 1L).otherwise(0L)), lit(0L)).as(s"h$h"))
    life
      .agg(count(lit(1)).as("n_users"), counters: _*)
      .select(explode(array(survivalHorizons.map(h =>
        struct(lit(h.toLong).as("horizon_days"),
          col(s"h$h").as("n_alive"),
          // when-guard: survival over zero users is 0/0 — null, and
          // under ANSI the unguarded division would throw, not null
          round(when(col("n_users") =!= 0,
            col(s"h$h").cast("double") / col("n_users")), 6).as("survival"))): _*))
        .as("r"))
      .select(col("r.horizon_days"), col("r.n_alive"), col("r.survival"))
      .orderBy(col("horizon_days"))
  }

  val q195Sql: String = {
    val counters = survivalHorizons.map(h =>
      s"CAST(coalesce(sum(CASE WHEN lifetime >= $h THEN 1 ELSE 0 END), 0) AS BIGINT) AS h$h")
      .mkString(",\n |  ")
    // nullif mirrors the Spark when-guard: survival over zero users is
    // NULL in both engines, never a NaN/throw divergence
    val rows = survivalHorizons.map(h =>
      s"SELECT CAST($h AS BIGINT) AS horizon_days, h$h AS n_alive,\n" +
        s" |   round(CAST(h$h AS DOUBLE) / nullif(n_users, 0), 6) AS survival FROM t")
      .mkString("\n | UNION ALL ")
    s"""WITH u AS (
       | SELECT user_id,
       |  date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) AS lifetime
       | FROM events GROUP BY user_id
       |), t AS (
       | SELECT CAST(count(*) AS BIGINT) AS n_users,
       |  $counters
       | FROM u
       |)
       |SELECT * FROM (
       | $rows
       |) ORDER BY horizon_days""".stripMargin
  }

  /** All relational queries, keyed as they appear in SparkEntry. */
  val queries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("q01_pricing_summary", q01PricingSummary _, q01Sql),
    ("q02_join_inner", q02JoinInner _, q02Sql),
    ("q03_join_multi", q03JoinMulti _, q03Sql),
    ("q04_join_left", q04JoinLeft _, q04Sql),
    ("q05_join_semi", q05JoinSemi _, q05Sql),
    ("q06_join_anti", q06JoinAnti _, q06Sql),
    ("q07_join_broadcast", q07JoinBroadcast _, q07Sql),
    ("q08_join_theta", q08JoinTheta _, q08Sql),
    ("q09_agg_distinct", q09AggDistinct _, q09Sql),
    ("q10_agg_rollup", q10AggRollup _, q10Sql),
    ("q11_agg_cube", q11AggCube _, q11Sql),
    ("q12_window_rank", q12WindowRank _, q12Sql),
    ("q13_window_running", q13WindowRunning _, q13Sql),
    ("q14_window_lag", q14WindowLag _, q14Sql),
    ("q15_topk", q15TopK _, q15Sql),
    ("q16_sort_multi", q16SortMulti _, q16Sql),
    ("q17_union", q17Union _, q17Sql),
    ("q18_intersect", q18Intersect _, q18Sql),
    ("q19_except", q19Except _, q19Sql),
    ("q20_scalar_string", q20ScalarString _, q20Sql),
    ("q21_scalar_math", q21ScalarMath _, q21Sql),
    ("q22_date_parts", q22DateParts _, q22Sql),
    ("q23_json_extract", q23JsonExtract _, q23Sql),
    ("q24_events_window", q24EventsWindow _, q24Sql),
    ("q25_conditional", q25Conditional _, q25Sql),
    ("q26_nulls", q26Nulls _, q26Sql),
    ("q27_mapwarper_funcs", q27MapwarperFuncs _, q27Sql),
    ("q28_sessionize", q28Sessionize _, q28Sql),
    ("q29_approx_distinct", q29ApproxDistinct _, null),
    ("q37_percentiles", q37Percentiles _, q37Sql),
    ("q93_approx_percentiles", q93ApproxPercentiles _, null),
    ("q38_window_misc", q38WindowMisc _, q38Sql),
    ("q39_array_funcs", q39ArrayFuncs _, q39Sql),
    ("q50_window_values", q50WindowValues _, q50Sql),
    ("q54_pivot", q54Pivot _, q54Sql),
    ("q55_grouping_sets", q55GroupingSets _, q55Sql),
    ("q58_scalar_subquery", q58ScalarSubquery _, q58Sql),
    ("q59_window_range", q59WindowRange _, q59Sql),
    ("q60_fuzzy_match", q60FuzzyMatch _, q60Sql),
    ("q79_salted_join", q79SaltedJoin _, q79Sql),
    ("q115_join_full", q115JoinFull _, q115Sql),
    ("q116_unpivot", q116Unpivot _, q116Sql),
    ("q118_array_agg", q118ArrayAggStr _, q118Sql),
    ("q130_conversion_funnel", q130ConversionFunnel _, q130Sql),
    ("q131_retention_cohorts", q131RetentionCohorts _, q131Sql),
    ("q132_daily_anomaly", q132DailyAnomaly _, q132Sql),
    ("q133_transition_matrix", q133TransitionMatrix _, q133Sql),
    ("q134_hourly_seasonality", q134HourlySeasonality _, q134Sql),
    ("q135_source_gini", q135SourceGini _, q135Sql),
    ("q137_star_join", q137StarJoin _, q137Sql),
    ("q138_exists_subquery", q138ExistsSubquery _, q138Sql),
    ("q141_daily_p95", q141DailyP95 _, q141Sql),
    ("q142_rolling_wau", q142RollingWau _, q142Sql),
    ("q143_arrival_gaps", q143ArrivalGaps _, q143Sql),
    ("q144_brand_by_nation", q144BrandByNation _, q144Sql),
    ("q145_string_agg", q145StringAgg _, q145Sql),
    ("q146_regr_trend", q146RegrTrend _, q146Sql),
    ("q147_waiting_orders", q147WaitingOrders _, q147Sql),
    ("q148_power_users", q148PowerUsers _, q148Sql),
    ("q149_event_paths", q149EventPaths _, q149Sql),
    ("q153_equidepth_bands", q153EquidepthBands _, q153Sql),
    ("q160_equidepth_bucketed", q160EquidepthBucketed _, null),
    ("q161_session_paths", q161SessionPaths _, q161Sql),
    ("q163_attribution", q163Attribution _, q163Sql),
    ("q172_session_attribution", q172SessionAttribution _, q172Sql),
    ("q164_brand_hhi", q164BrandHhi _, q164Sql),
    ("q165_fulfillment_lag", q165FulfillmentLag _, q165Sql),
    ("q166_latest_snapshot", q166LatestSnapshot _, q166Sql),
    ("q170_revenue_share", q170RevenueShare _, q170Sql),
    ("q191_scd2_intervals", q191Scd2Intervals _, q191Sql),
    ("q195_retention_survival", q195RetentionSurvival _, q195Sql),
    ("q155_key_skew_audit", q155KeySkewAudit _, q155Sql),
  )
}
