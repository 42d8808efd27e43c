package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.tables.Tables

/** Core relational query surface — exercises every operator class the
  * reference implements (SURVEY.md §2) on the synthetic star schema.
  *
  * Scale notes (100 TB thinking):
  *  - dimension joins (`nation`, `region`) are explicit `broadcast()`s — no
  *    shuffle of the fact side beyond its own aggregation;
  *  - fact-fact joins go through sort-merge/shuffled-hash on their natural
  *    keys with AQE free to re-plan;
  *  - every aggregation is a partial (map-side) + final hash aggregate —
  *    nothing here collects to the driver;
  *  - filters/projections are plain Catalyst expressions so parquet gets
  *    PushedFilters + pruned ReadSchema.
  */
object Relational {

  /** Exact, order-independent money sum: decimal-cast before SUM, double
    * after — see queries.DecimalNotes.
    */
  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  val all: Seq[Q] = Seq(
    // ------------------------------------------------------------------
    // Q1 — scan + projection + filter (SURVEY §2.2 P2/P3). Predicate and
    // column pruning must reach the parquet scan.
    Q(
      "q1_scan_filter_project",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1998-01-01") &&
            col("l_shipdate") < lit("1998-04-01") &&
            col("l_discount") > lit(0.05))
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-04-01'
             |  AND l_discount > 0.05
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ------------------------------------------------------------------
    // Q2 — array build + array_distinct + size (SURVEY §2.2 P1/P4: the
    // program_ids dedup, re-expressed over the star schema).
    Q(
      "q2_distinct_parts_per_order",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_orderkey")
          .agg(
            size(array_distinct(collect_list(col("l_partkey")))).cast("long").as("n_parts"),
            count(lit(1)).as("n_lines"))
          .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey,
             |       count(DISTINCT l_partkey) AS n_parts,
             |       count(*) AS n_lines
             |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),

    // ------------------------------------------------------------------
    // Q3 — broadcast dimension equi-joins (SURVEY §2.3 J1/J3): fact table
    // shuffled once for its aggregation; dims broadcast.
    Q(
      "q3_join_revenue_by_region",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(
            count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("revenue"))
          .orderBy("r_name")
      },
      Some("""SELECT r_name, count(*) AS n_orders,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // ------------------------------------------------------------------
    // Q4 — left-semi existence join (SURVEY §2.3 J2 / S9 parent probe).
    Q(
      "q4_semi_join_customers_with_orders",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).select("o_custkey")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // ------------------------------------------------------------------
    // Q5 — priority-ordered CASE WHEN classification (SURVEY §2.4 C1: the
    // transaction classifier's shape — first match wins, order is load-
    // bearing exactly like DEX > NFT > Token > System).
    Q(
      "q5_classify_orders",
      (s, dir) =>
        Tables.orders(s, dir)
          .withColumn(
            "order_class",
            when(col("o_orderpriority") === "1-URGENT", "urgent")
              .when(col("o_orderpriority") === "2-HIGH", "high")
              .when(col("o_orderstatus") === "O" && col("o_totalprice") < 1000.0, "small-open")
              .when(col("o_orderstatus") === "O", "open")
              .when(col("o_orderstatus") === "F", "finished")
              .otherwise("other"))
          .groupBy("order_class")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("order_class"),
      Some("""SELECT CASE
             |         WHEN o_orderpriority = '1-URGENT' THEN 'urgent'
             |         WHEN o_orderpriority = '2-HIGH' THEN 'high'
             |         WHEN o_orderstatus = 'O' AND o_totalprice < 1000.0 THEN 'small-open'
             |         WHEN o_orderstatus = 'O' THEN 'open'
             |         WHEN o_orderstatus = 'F' THEN 'finished'
             |         ELSE 'other'
             |       END AS order_class,
             |       count(*) AS n,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY 1 ORDER BY order_class""".stripMargin)),

    // ------------------------------------------------------------------
    // Q6 — grouped aggregation with count / sum / conditional count / avg
    // (SURVEY §2.5 A1/A5). TPC-H Q1 shape.
    Q(
      "q6_agg_pricing_summary",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") <= lit("1998-09-02"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
            count(lit(1)).as("count_order"),
            count_if(col("l_quantity") > 25).as("n_bulk"),
            (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
             |       count(*) AS count_order,
             |       count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
             |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ------------------------------------------------------------------
    // Q7 — histogram + percentage-of-total (SURVEY §2.5 A2): the
    // TransactionTypeStats percentage, as an unpartitioned window sum.
    Q(
      "q7_histogram_pct",
      (s, dir) => {
        // percentage-of-total via broadcast cross join with the 1-row total —
        // avoids the single-partition unbounded window on the raw stream.
        val hist = Tables.events(s, dir).groupBy("event_type").agg(count(lit(1)).as("n"))
        val total = hist.agg(sum("n").as("total"))
        hist.crossJoin(broadcast(total))
          .withColumn("pct", col("n") * lit(100.0) / col("total"))
          .drop("total")
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
             |       (count(*) * CAST(100 AS DOUBLE)) / (SELECT count(*) FROM events) AS pct
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ------------------------------------------------------------------
    // Q8 — orderBy + limit top-k (SURVEY §2.6 W1/W2): Spark plans this as
    // TakeOrderedAndProject — no global sort at scale.
    Q(
      "q8_topk_customers",
      (s, dir) =>
        Tables.customer(s, dir)
          .select("c_custkey", "c_name", "c_acctbal")
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
          .limit(10),
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
             |ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10""".stripMargin))
  )
}
