package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Quantize

/** Classic OLAP aggregation/join queries over the TPC-H-ish tables —
  * exercising the "free with Spark SQL" surface SURVEY §2.1 notes the
  * reference lacks (general joins, multi-key group-by). Money sums run in
  * the quantized integer domain (exact, engine-independent) per SURVEY §7.4.
  */
object OlapQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(Quantize.quantize(col("l_quantity"), 0)).cast("long").as("sum_qty"),
          sum(Quantize.quantize(col("l_extendedprice"), 2)).cast("long").as("sum_price_q"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))),

    // Revenue per order for one customer segment: dimension join broadcasts,
    // the lineitem->orders join shuffles on the join key (AQE handles skew).
    "q3_join" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = Tables.orders(s, d)
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey").as("l_orderkey"))
      Tables.lineitem(s, d)
        .join(ord, "l_orderkey")
        .groupBy(col("l_orderkey"))
        .agg(sum(Quantize.quantize(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2))
          .cast("long").as("revenue_q"))
    }),

    // The surface the reference lacks and Spark SQL gives for free
    // (SURVEY §2.1 "not present in the reference ... come free"):
    // top-k, distinct, set operations, rollup.
    // TPC-H Q6 shape: tight filtered aggregation (quantized revenue)
    "q6_filter_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(Quantize.quantize(col("l_extendedprice") * col("l_discount"), 2))
          .cast("long").as("revenue_q"),
          count(lit(1)).as("cnt"))),

    // TPC-H Q5 shape: the 6-table join (lineitem-orders-customer-supplier-
    // nation-region) with the local-supplier constraint. Dims chain into
    // broadcasts (region filters nation, nation+supplier stay small); only
    // the two fact joins shuffle, and Catalyst orders them
    "q5_join" -> ((s, d) => {
      val natAsia = Tables.load(s, d, "nation")
        .join(broadcast(Tables.load(s, d, "region")
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, d, "supplier")),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(natAsia), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(Quantize.quantize(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2))
          .cast("long").as("revenue_q"),
          count(lit(1)).as("cnt"))
    }),

    // part-dimension rollup (Q9 flavor): revenue by brand, part broadcast
    "q9_parts" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.load(s, d, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(Quantize.quantize(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2))
          .cast("long").as("revenue_q"),
          count(lit(1)).as("cnt"))),

    // TPC-H Q10 shape (returned-item reporting): customers ranked by
    // fixed-point revenue from 'R'-flag lineitems in one quarter. The
    // dims broadcast; the fact-fact orders⋈lineitem shuffles on the
    // order key; top-20 is TakeOrderedAndProject.
    "q10_returns" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1995-01-01") &&
              col("o_orderdate") < lit("1995-07-01")),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.load(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(Quantize.quantize(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2))
          .cast("long").as("revenue_q"),
          count(lit(1)).as("cnt"))
        .orderBy(col("revenue_q").desc, col("c_custkey"))
        .limit(20)),

    // TPC-H Q18 shape (large-volume orders): orders whose total quantity
    // exceeds the threshold, with the customer attached. The HAVING side
    // is one keyed aggregation; quantities fold in the fixed-point
    // domain so both engines agree exactly.
    "q18_bigorders" -> ((s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(Quantize.quantize(col("l_quantity"), 2))
          .cast("long").as("tot_qty_q"))
        .filter(col("tot_qty_q") > 18000L)
      Tables.orders(s, d).join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("odate_s"),
          col("tot_qty_q"))
    }),

    "bonus_topk" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),

    "bonus_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("user_id").as("signal_id"), col("event_type"))
        .distinct()),

    "bonus_setops" -> ((s, d) => {
      val ev = Tables.events(s, d)
      def heavyUsers(t: String) = ev.filter(col("event_type") === t)
        .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 15).select(col("user_id").as("signal_id"))
      heavyUsers("click").except(heavyUsers("purchase"))
    }),

    "bonus_rollup" -> ((s, d) =>
      Tables.documents(s, d)
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("n_chars")).cast("long").as("chars"))),

    // full CUBE (all 2^k grouping sets) — rollup's sibling; Catalyst
    // expands both into one Expand + aggregation, no per-set rescan
    "bonus_cube" -> ((s, d) =>
      Tables.documents(s, d)
        .cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("n_chars")).cast("long").as("chars"))),

    // cohort retention: users bucketed by FIRST-activity day, tracked by
    // distinct weekly activity afterwards — the canonical engagement
    // rollup. Two keyed aggregations (first-day per user, then distinct
    // users per (cohort, week offset)); exact integers throughout.
    "bonus_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cohort = ev.groupBy(col("user_id"))
        .agg(unix_timestamp(date_trunc("day", min(col("ts")))).as("cohort_s"))
      ev.select(col("user_id"),
          unix_timestamp(date_trunc("day", col("ts"))).as("day_s"))
        .join(cohort, "user_id")
        .groupBy(col("cohort_s"),
          floor((col("day_s") - col("cohort_s")) / 604800.0).cast("long")
            .as("week_off"))
        .agg(countDistinct(col("user_id")).cast("long").as("users"))
    }),

    // sketch aggregates — the 100 TB answer for distinct counts and
    // quantiles (HLL++ / quantile summaries: mergeable, bounded-memory,
    // one pass, no global sort). Sketch internals are engine-specific, so
    // the query emits the exact values plus booleans asserting the sketch
    // landed within its documented error; the oracle recomputes the exact
    // values and expects both flags true — the accuracy contract itself is
    // what gets hash-checked
    "bonus_approx" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.agg(
          countDistinct(col("l_orderkey")).cast("long").as("n_exact"),
          approx_count_distinct(col("l_orderkey"), 0.01).as("ap"),
          expr("percentile(l_extendedprice, 0.5)").as("p50e"),
          expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("p50a"))
        .select(col("n_exact"),
          (abs(col("ap") - col("n_exact")).cast("double") <=
            col("n_exact").cast("double") * 0.05).as("cd_ok"),
          round(col("p50e"), 4).as("p50"),
          (abs(col("p50a") - col("p50e")) <= col("p50e") * 0.05).as("p50_ok"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_q,
        |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q6_filter_agg" ->
      """SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_q,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "bonus_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "bonus_distinct" ->
      "SELECT DISTINCT user_id AS signal_id, event_type FROM events",

    "bonus_setops" ->
      """SELECT signal_id FROM (
        |  SELECT user_id AS signal_id, count(*) AS c FROM events
        |  WHERE event_type = 'click' GROUP BY 1) WHERE c > 15
        |EXCEPT
        |SELECT signal_id FROM (
        |  SELECT user_id AS signal_id, count(*) AS c FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1) WHERE c > 15""".stripMargin,

    "bonus_rollup" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY ROLLUP(lang, source)""".stripMargin,

    "q10_returns" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_q,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1995-07-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_q DESC, c_custkey LIMIT 20""".stripMargin,

    "q18_bigorders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS tot_qty_q
        |  FROM lineitem GROUP BY 1
        |  HAVING sum(CAST(floor(l_quantity * 100) AS BIGINT)) > 18000
        |)
        |SELECT c_custkey, c_name, o_orderkey,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS odate_s, tot_qty_q
        |FROM orders JOIN big ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "bonus_cube" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY CUBE(lang, source)""".stripMargin,

    "bonus_retention" ->
      """WITH c AS (
        |  SELECT user_id,
        |    CAST(epoch(date_trunc('day', min(ts))) AS BIGINT) AS cohort_s
        |  FROM events GROUP BY 1
        |), a AS (
        |  SELECT e.user_id, c.cohort_s,
        |    CAST(epoch(date_trunc('day', e.ts)) AS BIGINT) AS day_s
        |  FROM events e JOIN c USING (user_id)
        |)
        |SELECT cohort_s,
        |  CAST(floor((day_s - cohort_s) / 604800.0) AS BIGINT) AS week_off,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS users
        |FROM a GROUP BY 1, 2""".stripMargin,

    "q5_join" ->
      """SELECT n.n_name,
        |  CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_q,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |               AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |GROUP BY 1""".stripMargin,

    "q9_parts" ->
      """SELECT p.p_brand,
        |  CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_q,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY 1""".stripMargin,

    "bonus_approx" ->
      """SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exact,
        |  true AS cd_ok,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  true AS p50_ok
        |FROM lineitem""".stripMargin,

    "q3_join" ->
      """SELECT l.l_orderkey,
        |  CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_q
        |FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY 1""".stripMargin
  )
}
