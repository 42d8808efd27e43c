package graft.queries

import graft.tables.Tables

/** SURVEY §3 entry point 3: the reference delegates all analytics to SQL
  * over its loaded tables (19 indexes declare the workload); here the same
  * surface is `spark.sql` over the registered views. The query text below is
  * dialect-shared — the oracle runs the *identical string* in DuckDB, which
  * is the strongest possible statement that plain ANSI SQL is a first-class
  * query interface of this engine.
  */
object Sql {

  private val q21 =
    """SELECT c_mktsegment, o_orderstatus,
      |       count(*) AS n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment, o_orderstatus
      |ORDER BY c_mktsegment, o_orderstatus""".stripMargin

  private val q22 =
    """SELECT o_orderpriority,
      |       count(*) AS n_orders,
      |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
      |       CAST(min(o_totalprice) AS DOUBLE) AS min_price,
      |       CAST(max(o_totalprice) AS DOUBLE) AS max_price
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q21_sql_surface", (s, dir) => { Tables.registerAll(s, dir); s.sql(q21) }, Some(q21)),
    Q("q22_sql_distinct_agg", (s, dir) => { Tables.registerAll(s, dir); s.sql(q22) }, Some(q22)))
}
