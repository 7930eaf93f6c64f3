package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The pass-through SQL surface the reference exposes via its entity
  * query (`component.py:48` — any SQL the user writes runs on the
  * backing engine; SURVEY.md §2.2-§2.8). These queries exercise that
  * surface natively on Spark: aggregation, filter/project pushdown,
  * multi-join + top-k, semi/anti joins, set ops, scalar functions,
  * window functions, rollup.
  */
object CoreQueries {
  import QueryDef.table

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "q1_agg",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus""")),

    QueryDef(
      "q2_filter_project",
      (s, dir) =>
        table(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp") &&
            col("l_quantity") < 10)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"),
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          AND l_quantity < 10""")),

    QueryDef(
      "q3_join_agg_topk",
      (s, dir) => {
        val c = table(s, dir, "customer")
        val o = table(s, dir, "orders")
        val li = table(s, dir, "lineitem")
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(li, o("o_orderkey") === li("l_orderkey"))
          .filter(o("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .groupBy(o("o_orderkey"), o("o_orderdate"))
          .agg(sum(dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy(desc("revenue"), col("o_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT o_orderkey, o_orderdate,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10""")),

    QueryDef(
      "q4_semi_anti_join",
      (s, dir) => {
        val c = table(s, dir, "customer")
        val o = table(s, dir, "orders")
        val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
          AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')""")),

    QueryDef(
      "q5_setops",
      (s, dir) => {
        val c = table(s, dir, "customer")
        val o = table(s, dir, "orders")
        val su = table(s, dir, "supplier")
        val n = table(s, dir, "nation")
        c.filter(col("c_acctbal") > 5000).select(col("c_custkey").as("k"))
          .intersect(o.filter(col("o_totalprice") > 100000).select(col("o_custkey").as("k")))
          .union(su.select(col("s_suppkey").as("k")))
          .except(n.select(col("n_nationkey").cast("long").as("k")))
      },
      Some("""
        SELECT k FROM (
          (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
           INTERSECT
           SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000)
          UNION
          SELECT s_suppkey AS k FROM supplier)
        EXCEPT
        SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation""")),

    QueryDef(
      "q6_scalar_fns",
      (s, dir) =>
        table(s, dir, "orders").filter(col("o_orderkey") <= 1000)
          .select(
            col("o_orderkey"),
            upper(col("o_orderstatus")).as("status_u"),
            substring(col("o_orderpriority"), 1, 3).as("prio3"),
            length(col("o_orderpriority")).cast("long").as("prio_len"),
            concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
            year(col("o_orderdate")).cast("long").as("y"),
            month(col("o_orderdate")).cast("long").as("m"),
            dayofmonth(col("o_orderdate")).cast("long").as("d"),
            floor(col("o_totalprice")).cast("long").as("price_floor"),
            ceil(col("o_totalprice")).cast("long").as("price_ceil"),
            (col("o_orderkey") % 7).as("mod7")),
      Some("""
        SELECT o_orderkey,
          upper(o_orderstatus) AS status_u,
          substr(o_orderpriority, 1, 3) AS prio3,
          CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
          concat(o_orderstatus, '-', o_orderpriority) AS tag,
          CAST(year(o_orderdate) AS BIGINT) AS y,
          CAST(month(o_orderdate) AS BIGINT) AS m,
          CAST(day(o_orderdate) AS BIGINT) AS d,
          CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
          CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
          o_orderkey % 7 AS mod7
        FROM orders WHERE o_orderkey <= 1000""")),

    QueryDef(
      "q7_window",
      (s, dir) => {
        val o = table(s, dir, "orders").filter(col("o_custkey") < 100)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        o.select(
          col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          row_number().over(w).cast("long").as("rn"),
          lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
          sum(dec(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_total"))
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_orderdate,
          CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
          LAG(o_orderkey, 1) OVER w AS prev_orderkey,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
            (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        FROM orders WHERE o_custkey < 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")),

    QueryDef(
      "q8_rollup",
      (s, dir) => {
        val c = table(s, dir, "customer")
        val n = table(s, dir, "nation")
        c.join(n, c("c_nationkey") === n("n_nationkey"))
          .rollup(col("n_name"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            sum(dec(col("c_acctbal"))).cast("double").as("total_bal"))
      },
      Some("""
        SELECT n_name, c_mktsegment, COUNT(*) AS n,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP(n_name, c_mktsegment)""")),

    QueryDef(
      "q9_groupby_having_distinct",
      (s, dir) => {
        val o = table(s, dir, "orders")
        o.groupBy(col("o_custkey"))
          .agg(
            countDistinct(col("o_orderstatus")).as("n_status"),
            count(lit(1)).as("n_orders"),
            max(col("o_orderdate")).as("last_order"))
          .filter(col("n_orders") >= 5)
      },
      Some("""
        SELECT o_custkey,
          COUNT(DISTINCT o_orderstatus) AS n_status,
          COUNT(*) AS n_orders,
          MAX(o_orderdate) AS last_order
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5""")),

    // Deterministic output-split hash partition (SURVEY §2.9 X2 shape;
    // the production path hashes the serialized payload with xxhash64 —
    // here a multiplicative hash both engines can compute exactly).
    QueryDef(
      "q10_split_assign",
      (s, dir) =>
        table(s, dir, "orders")
          .withColumn("bucket",
            (pmod(col("o_orderkey"), lit(1000003L)) * 2654435761L % 1000003L) % 3)
          .groupBy("bucket").agg(count(lit(1)).as("n")),
      Some("""
        SELECT ((((o_orderkey % 1000003) + 1000003) % 1000003) * 2654435761 % 1000003) % 3 AS bucket, COUNT(*) AS n
        FROM orders GROUP BY 1"""))
  )
}
