package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.tables.Tables

/** The co-located-join layout: two tables bucketed on the same key with the
  * same bucket count must equi-join with NO Exchange in the plan — the
  * shuffle was paid once at write time (SURVEY §4: the scale answer to the
  * reference's FK-join indexes).
  */
class BucketedJoinSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("co-bucketed tables equi-join without a shuffle") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, sf).select("c_custkey", "c_name")
    Load.writeBucketedTable(orders, "b_orders", Seq("o_custkey"), 8, Seq("o_custkey"))
    Load.writeBucketedTable(
      customer.withColumnRenamed("c_custkey", "o_custkey"),
      "b_customer", Seq("o_custkey"), 8, Seq("o_custkey"))
    try {
      // Force the non-broadcast path so the bucketing (not a broadcast) is
      // what removes the exchange.
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val j = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        val n = j.count()
        assert(n == orders.count()) // every order has a customer
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

        // The unbucketed same join DOES shuffle — the assertion above is
        // meaningful, not vacuous.
        val plain = orders.join(
          customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
        plain.count()
        assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  private def withConf(kv: (String, String)*)(f: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
