package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second tranche of the pass-through SQL surface (SURVEY.md §2.2-§2.8):
  * multi-dimensional grouping, analytic window frames, array/lambda
  * functions, exact percentiles, JSON extraction, datetime arithmetic.
  * Everything the reference's users could put in an entity query runs
  * natively here, oracle-checked against DuckDB.
  */
object ExtendedQueries {
  import QueryDef.table

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q11_cube_grouping",
      (s, dir) => {
        val o = table(s, dir, "orders")
        o.cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            grouping(col("o_orderstatus")).cast("long").as("g_status"),
            grouping(col("o_orderpriority")).cast("long").as("g_prio"))
      },
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""")),

    QueryDef(
      "q12_window_frames",
      (s, dir) => {
        val o = table(s, dir, "orders").filter(col("o_custkey") < 200)
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        o.select(
          col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).cast("long").as("quartile"),
          lead(col("o_orderkey"), 2).over(w).as("next2_key"),
          first(col("o_orderkey")).over(w).as("cheapest_key"),
          avg(dec(col("o_totalprice")))
            .over(w.rowsBetween(-2, Window.currentRow))
            .cast("double").as("avg3"))
      },
      Some("""
        SELECT o_orderkey, o_orderpriority,
          CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
          LEAD(o_orderkey, 2) OVER w AS next2_key,
          FIRST_VALUE(o_orderkey) OVER w AS cheapest_key,
          CAST(AVG(CAST(o_totalprice AS DECIMAL(18,2))) OVER
            (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS avg3
        FROM orders WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""")),

    QueryDef(
      "q13_array_funcs",
      (s, dir) => {
        val li = table(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
        li.groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(col("l_linenumber"))).as("lines"))
          .select(
            col("l_orderkey"),
            // Arrays canonicalized to a CSV string: the correctness
            // driver's pandas comparator can't hash ndarray cells.
            array_join(col("lines").cast("array<string>"), ",").as("lines_csv"),
            size(col("lines")).cast("long").as("n_lines"),
            array_contains(col("lines"), 3).as("has_line3"),
            aggregate(col("lines"), lit(0L), (acc, x) => acc + x).as("sum_lines"),
            element_at(col("lines"), 1).as("first_line"))
      },
      Some("""
        SELECT l_orderkey,
               array_to_string(list_sort(list(l_linenumber)), ',') AS lines_csv,
               CAST(len(list(l_linenumber)) AS BIGINT) AS n_lines,
               list_contains(list(l_linenumber), 3) AS has_line3,
               CAST(list_sum(list(l_linenumber)) AS BIGINT) AS sum_lines,
               list_sort(list(l_linenumber))[1] AS first_line
        FROM lineitem WHERE l_orderkey <= 2000
        GROUP BY l_orderkey""")),

    QueryDef(
      "q14_percentiles",
      (s, dir) => {
        val o = table(s, dir, "orders")
        o.groupBy(col("o_orderpriority"))
          .agg(
            expr("percentile(o_totalprice, 0.5)").as("p50"),
            expr("percentile(o_totalprice, 0.9)").as("p90"),
            min(col("o_totalprice")).as("lo"),
            max(col("o_totalprice")).as("hi"),
            count(lit(1)).as("n"))
      },
      Some("""
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.5) AS p50,
               quantile_cont(o_totalprice, 0.9) AS p90,
               MIN(o_totalprice) AS lo,
               MAX(o_totalprice) AS hi,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderpriority""")),

    // Approximate sketches (HLL distinct, quantile sketch): the raw
    // estimates are engine-specific, so the value-level oracle checks
    // the INVARIANT instead — each sketch lands within a relative error
    // bound of the exact answer (computed Spark-side in the same agg),
    // which DuckDB states as literal `true`s plus the exact counts. A
    // sketch implementation regression flips a boolean and fails the
    // hash check; estimate sanity is additionally spec-asserted.
    QueryDef(
      "q16_approx_sketches",
      (s, dir) => {
        val o = table(s, dir, "orders")
        // The sketches and the exact distinct count run as SEPARATE
        // aggregations joined on the 5-row group key: mixing
        // countDistinct into the sketch agg makes Spark rewrite to a
        // two-level aggregate keyed on (priority, custkey), building
        // an HLL + two percentile OBJECT buffers per distinct
        // customer (~100k buffers) instead of per priority (5) —
        // measured 12.7 s vs ~1 s at sf0.1 once the bench stopped
        // letting count() prune the agg list.
        val sketches = o.groupBy(col("o_orderpriority"))
          .agg(
            approx_count_distinct(col("o_custkey"), rsd = 0.02).as("ac"),
            percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("p50a"),
            expr("percentile(o_totalprice, 0.5)").as("p50e"),
            count(lit(1)).as("n"))
        val exact = o.groupBy(col("o_orderpriority"))
          .agg(countDistinct(col("o_custkey")).as("exact_custs"))
        sketches.join(exact, Seq("o_orderpriority"))
          .select(
            col("o_orderpriority"),
            (abs(col("ac") - col("exact_custs")).cast("double") /
              col("exact_custs").cast("double") <= 0.05).as("hll_within_5pct"),
            (abs(col("p50a") - col("p50e")) / col("p50e") <= 0.05).as("p50_within_5pct"),
            col("exact_custs"), col("n"))
      },
      Some("""
        SELECT o_orderpriority,
               true AS hll_within_5pct,
               true AS p50_within_5pct,
               COUNT(DISTINCT o_custkey) AS exact_custs,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderpriority""")),

    QueryDef(
      "q15_json_datetime",
      (s, dir) => {
        val o = table(s, dir, "orders").filter(col("o_orderkey") <= 1000)
        val j = concat(lit("{\"key\":"), col("o_orderkey"),
          lit(",\"prio\":\""), col("o_orderpriority"), lit("\"}"))
        o.select(
          col("o_orderkey"),
          get_json_object(j, "$.key").cast("long").as("j_key"),
          get_json_object(j, "$.prio").as("j_prio"),
          add_months(col("o_orderdate"), 3).cast("date").as("plus3m"),
          datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
            .cast("long").as("days_to_eoy"),
          date_trunc("quarter", col("o_orderdate")).cast("date").as("quarter_start"),
          dayofweek(col("o_orderdate")).cast("long").as("dow"))
      },
      Some("""
        SELECT o_orderkey,
          CAST(json_extract_string('{"key":' || o_orderkey || ',"prio":"' || o_orderpriority || '"}', '$.key') AS BIGINT) AS j_key,
          json_extract_string('{"key":' || o_orderkey || ',"prio":"' || o_orderpriority || '"}', '$.prio') AS j_prio,
          CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
          CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS days_to_eoy,
          date_trunc('quarter', o_orderdate) AS quarter_start,
          CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow
        FROM orders WHERE o_orderkey <= 1000""")),

    // Graph analytics: weighted PageRank (3 fixed iterations) over the
    // nation->nation trade graph (customer nation buys from supplier
    // nation; weight = lineitem count). Edge build is the Q5-style
    // multi-join; each iteration is one broadcast join + one hash-agg,
    // accumulating through exact DECIMAL so any partitioning produces
    // bit-identical ranks. The oracle unrolls the same three steps.
    QueryDef(
      "graph_pagerank",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        val o = table(s, dir, "orders")
        val c = table(s, dir, "customer")
        val su = table(s, dir, "supplier")
        val n = table(s, dir, "nation")
        val edges = li
          .join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(su, li("l_suppkey") === su("s_suppkey"))
          .join(n.as("cn"), c("c_nationkey") === col("cn.n_nationkey"))
          .join(n.as("sn"), su("s_nationkey") === col("sn.n_nationkey"))
          .groupBy(col("cn.n_name").as("src"), col("sn.n_name").as("dst"))
          .agg(count(lit(1)).as("w"))
        graft.ops.Graph.pageRank(edges, "src", "dst", "w", iterations = 3)
          .select(col("node"), col("rank").as("pr"))
      },
      Some("""
        WITH e AS (
          SELECT cn.n_name AS src, sn.n_name AS dst,
                 CAST(COUNT(*) AS DECIMAL(28,6)) AS w
          FROM lineitem l
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN nation cn ON cn.n_nationkey = c.c_nationkey
          JOIN nation sn ON sn.n_nationkey = s.s_nationkey
          GROUP BY 1, 2),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        outw AS (SELECT src, SUM(w) AS ow FROM e GROUP BY src),
        r0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes, nn),
        r1 AS (
          SELECT nd.node,
                 (1.0 - 0.85) / nn.n + 0.85 * CAST(COALESCE(SUM(
                     CAST((r.pr * CAST(e.w AS DOUBLE)) / CAST(outw.ow AS DOUBLE)
                          AS DECIMAL(38,18))),
                   CAST(0 AS DECIMAL(38,18))) AS DOUBLE) AS pr
          FROM nodes nd CROSS JOIN nn
          LEFT JOIN e ON e.dst = nd.node
          LEFT JOIN r0 r ON r.node = e.src
          LEFT JOIN outw ON outw.src = e.src
          GROUP BY nd.node, nn.n),
        r2 AS (
          SELECT nd.node,
                 (1.0 - 0.85) / nn.n + 0.85 * CAST(COALESCE(SUM(
                     CAST((r.pr * CAST(e.w AS DOUBLE)) / CAST(outw.ow AS DOUBLE)
                          AS DECIMAL(38,18))),
                   CAST(0 AS DECIMAL(38,18))) AS DOUBLE) AS pr
          FROM nodes nd CROSS JOIN nn
          LEFT JOIN e ON e.dst = nd.node
          LEFT JOIN r1 r ON r.node = e.src
          LEFT JOIN outw ON outw.src = e.src
          GROUP BY nd.node, nn.n),
        r3 AS (
          SELECT nd.node,
                 (1.0 - 0.85) / nn.n + 0.85 * CAST(COALESCE(SUM(
                     CAST((r.pr * CAST(e.w AS DOUBLE)) / CAST(outw.ow AS DOUBLE)
                          AS DECIMAL(38,18))),
                   CAST(0 AS DECIMAL(38,18))) AS DOUBLE) AS pr
          FROM nodes nd CROSS JOIN nn
          LEFT JOIN e ON e.dst = nd.node
          LEFT JOIN r2 r ON r.node = e.src
          LEFT JOIN outw ON outw.src = e.src
          GROUP BY nd.node, nn.n)
        SELECT node, pr FROM r3"""))
  )
}
