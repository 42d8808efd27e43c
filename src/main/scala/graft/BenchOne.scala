package graft
import org.apache.spark.sql.SparkSession

/** Warm-bench one or more registered queries in a single JVM:
  * `runMain graft.BenchOne <name>[,<name>...] [runs]` — each query runs
  * `runs` times after the shared session warmup, so per-query numbers are
  * comparable without paying one JVM spin-up per query.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.fromEnv("graft-benchone")
    val names = args(0).split(',').toSeq
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    names.foreach { name =>
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        // The ETL headline metric lives in EtlBench, not the query map —
        // special-cased here so it is adjudicable like any other entry.
        if (name == "etl_baseline_comparable") {
          val (txs, secs, txPerS) = graft.bench.EtlBench.run(spark)
          println(f"[benchone] $name run$i $secs%.2f s ($txs txs, $txPerS%.0f tx/s)")
        } else {
          SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
          println(f"[benchone] $name run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
        }
      }
      graft.util.CacheScope.releaseAll()
    }
    spark.stop()
  }
}
