package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.similarity.Similarity
import graft.tables.Tables

/** Scratch decomposition of the e13 eval's wall time — which leg owns it,
  * with per-step Spark job and task counts (the per-job fixed cost is the
  * suspected anti-scaling driver at local[32] over sf-sized data).
  * Usage: runMain graft.bench.E13Probe [sfDir]
  */
object E13Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.fromEnv("graft-e13probe")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })
    def time[A](label: String)(f: => A): A = {
      val j0 = jobs.get(); val t0 = tasks.get()
      val n0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - n0) / 1e9
      // listener is async; give it a beat to drain
      Thread.sleep(80)
      println(f"[e13probe] $label%-22s $dt%6.2f s  jobs=${jobs.get() - j0}%3d tasks=${tasks.get() - t0}%5d")
      r
    }
    (1 to 2).foreach { round =>
      println(s"-- round $round --")
      val emb = graft.util.CacheScope.persist(Tables.embeddings(spark, sfDir))
      val queries = emb.filter(col("vec_id") < 10)
      val dim = time("dim_head")(emb.select(size(col("embedding"))).head.getInt(0))
      val planes = Similarity.randomPlanes(6, dim)
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      val exact = graft.util.CacheScope.persist(
        Similarity.bruteForceTopK(queries, emb, k = 5))
      time("brute_force")(noop(exact))
      def leg(name: String, approx: org.apache.spark.sql.DataFrame) =
        Similarity.recallAtK(approx, exact, k = 5)
          .agg(
            (sum(col("recall").cast("decimal(18,9)")) / count(lit(1)))
              .cast("double").as("mean_recall"),
            min(col("recall")).as("min_recall"),
            count(lit(1)).as("n_queries"))
          .select(lit(name).as("method"), col("mean_recall"),
            col("min_recall"), col("n_queries"))
      val legFns: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
        ("1_lsh", () => Similarity.lshTopK(queries, emb, planes, k = 5)),
        ("2_lsh_multiprobe", () => Similarity.lshTopKMultiProbe(queries, emb, planes, k = 5)),
        ("3_ivf", () => Similarity.ivfTopK(queries, emb, nCentroids = 16, nProbe = 4, k = 5)),
        ("4_sq8", () => Similarity.sq8TopK(queries, emb, k = 5)),
        ("5_hamming_refined", () => Similarity.hammingRefinedTopK(
          queries, emb, k = 5, kShortlist = 20, dim = dim)),
        ("6_matryoshka", () => Similarity.prefixRefinedTopK(
          queries, emb, k = 5, kShortlist = 20, prefixDim = dim / 4)))
      // each leg alone (index build + top-k, no recall join)
      legFns.foreach { case (n, f) => time(s"leg:$n")(noop(f())) }
      // each leg through its recall aggregation (what e13 actually unions)
      legFns.foreach { case (n, f) => time(s"recall:$n")(noop(leg(n, f()))) }
      // the full e13 session face in one action
      time("e13_union_all")(noop(
        legFns.map { case (n, f) => leg(n, f()) }.reduce(_ unionByName _).orderBy("method")))
      graft.util.CacheScope.releaseAll()
    }
    spark.stop()
  }
}
