package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions._

/** The stateless-transform + analytic surface.
  *
  * Reference coverage: `Map` (/root/reference/wf/map.hpp:65-68), `Filter`
  * (wf/filter.hpp:63-64), `FlatMap` (wf/flatmap.hpp:65-66), `merge()`
  * (wf/multipipe.hpp:1174-1204), `split()` incl. multicast
  * (wf/multipipe.hpp:1220-1257, wf/splitting_emitter.hpp:56-62), plus the
  * analytic operators WindFlow lacks but Spark gives the engine for free
  * (distinct, top-k, rollup — SURVEY §2.7).
  *
  * Exactness conventions (shared with the DuckDB oracles):
  *  - money/value aggregates are summed in DECIMAL (exact, order-free) and
  *    cast to DOUBLE at the end;
  *  - per-row double arithmetic uses identical expression trees on both
  *    sides, so IEEE results are bit-equal;
  *  - event time is int64 microseconds (`Q.TsUsSpark`/`Q.TsUsDuck`).
  *
  * Scale notes: every query below is a scan → (optional narrow transform) →
  * hash aggregate / union pipeline. Filters and projections sit directly on
  * the parquet scan (pushdown + pruning verified via .explain in the spec);
  * aggregations plan as partial→final HashAggregate, so the only shuffle is
  * on the (low-cardinality) group keys.
  */
object RelationalQueries {

  private val SumValue =
    "CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)"

  def all: Seq[Q] = Seq(
    // ---- flagship: TPC-H Q1-style scan+agg (Map ∘ Reduce surface) ----
    Q("q1_agg",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(expr("l_shipdate <= timestamp'1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          expr("CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)").as("sum_qty"),
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)").as("sum_base_price"),
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)").as("sum_disc_price"),
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)").as("sum_charge"),
          expr("CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)").as("avg_qty"),
          expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)").as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- Map: 1→1 row transform (wf/map.hpp:65-68) ----
    Q("map_project",
      (s, dir) => Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        expr("l_extendedprice * (1.0 - l_discount)").as("disc_price"),
        expr("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)").as("charge"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""
        SELECT l_orderkey, l_linenumber,
          l_extendedprice * (1.0 - l_discount) AS disc_price,
          l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge
        FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // ---- Map over semi-structured payload (events.props JSON) ----
    Q("map_json",
      (s, dir) => Tables.events(s, dir)
        .select(expr("CAST(get_json_object(props, '$.k') AS BIGINT)").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k"),
      Some("""
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
        FROM events GROUP BY k ORDER BY k""")),

    // ---- Filter: 1→0/1 predicate (wf/filter.hpp:63-64) ----
    Q("filter_predicate",
      (s, dir) => Tables.events(s, dir)
        .filter(col("event_type") === "purchase" && col("value") > 100.0)
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy("event_id"),
      Some("""
        SELECT event_id, user_id, value FROM events
        WHERE event_type = 'purchase' AND value > 100.0 ORDER BY event_id""")),

    // ---- FlatMap: 1→N emission (wf/flatmap.hpp:65-66, wf/shipper.hpp:147-164) ----
    Q("flatmap_tokens",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        .orderBy("doc_id", "token"),
      Some(s"""
        SELECT doc_id, unnest(${graft.oracle.DuckSql.tokens("text")}) AS token
        FROM ${Q.DocsRef} ORDER BY doc_id, token""")),

    // ---- merge(): N pipes → one stream (wf/multipipe.hpp:1174-1204) ----
    Q("merge_union",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.filter(col("event_type") === "click")
          .select(lit("clicks").as("branch"), col("event_id"), col("value"))
          .unionAll(
            e.filter(col("event_type") === "view")
              .select(lit("views").as("branch"), col("event_id"), col("value")))
          .orderBy("branch", "event_id")
      },
      Some("""
        SELECT 'clicks' AS branch, event_id, value FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT 'views' AS branch, event_id, value FROM events WHERE event_type = 'view'
        ORDER BY branch, event_id""")),

    // ---- split() with multicast: one row may route to several branches
    //      (wf/multipipe.hpp:1220-1257; vector-of-indexes multicast
    //      wf/splitting_emitter.hpp:56-62) ----
    Q("split_multicast",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val hi = e.filter(col("value") > 150.0)
          .select(lit("high").as("branch"), col("event_id"), col("value"))
        val mid = e.filter(col("value") > 100.0 && col("value") <= 175.0)
          .select(lit("mid").as("branch"), col("event_id"), col("value"))
        val err = e.filter(col("event_type") === "error")
          .select(lit("errors").as("branch"), col("event_id"), col("value"))
        hi.unionAll(mid).unionAll(err).orderBy("branch", "event_id")
      },
      Some("""
        SELECT 'high' AS branch, event_id, value FROM events WHERE value > 150.0
        UNION ALL
        SELECT 'mid' AS branch, event_id, value FROM events WHERE value > 100.0 AND value <= 175.0
        UNION ALL
        SELECT 'errors' AS branch, event_id, value FROM events WHERE event_type = 'error'
        ORDER BY branch, event_id""")),

    // ---- analytic extras the reference lacks (SURVEY §2.7) ----
    Q("distinct_keys",
      (s, dir) => Tables.events(s, dir)
        .select("user_id", "event_type").distinct()
        .orderBy("user_id", "event_type"),
      Some("""
        SELECT DISTINCT user_id, event_type FROM events
        ORDER BY user_id, event_type""")),

    Q("topk_orders",
      (s, dir) => Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    Q("cube_events",
      (s, dir) => Tables.events(s, dir)
        .cube("event_type", "user_id")
        .agg(count(lit(1)).as("n"), expr(SumValue).as("sum_value"))
        .orderBy(asc_nulls_first("event_type"), asc_nulls_first("user_id")),
      Some(s"""
        SELECT event_type, user_id, COUNT(*) AS n, $SumValue AS sum_value
        FROM events GROUP BY CUBE (event_type, user_id)
        ORDER BY event_type ASC NULLS FIRST, user_id ASC NULLS FIRST""")),

    Q("rollup_orders",
      (s, dir) => Tables.orders(s, dir)
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n"),
          expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)").as("revenue"))
        .orderBy(asc_nulls_first("o_orderpriority"), asc_nulls_first("o_orderstatus")),
      Some("""
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST"""))
  )
}
