package graft.bench

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.similarity.Similarity
import graft.tables.Tables

/** Scratch decomposition of the e13 eval's wall time — which leg owns it.
  * Usage: runMain graft.bench.E13Probe [sfDir]
  */
object E13Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.fromEnv("graft-e13probe")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[e13probe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
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
      time("lsh")(noop(Similarity.lshTopK(queries, emb, planes, k = 5)))
      time("lsh_multiprobe")(noop(Similarity.lshTopKMultiProbe(queries, emb, planes, k = 5)))
      time("ivf_sample")(noop(Similarity.ivfTopK(queries, emb, nCentroids = 16, nProbe = 4, k = 5)))
      time("pq_flat")(noop(Similarity.pqTopK(queries, emb, m = 4, ksub = 16, k = 5, trainIters = 0)))
      val trained = time("kmeans_train_1iter")(
        graft.util.CacheScope.persist(Similarity.kmeansCentroids(emb, nCentroids = 16, iters = 1)))
      time("kmeans_materialize")(noop(trained))
      time("ivf_trained")(noop(Similarity.ivfTopKWith(queries, emb, trained, nProbe = 4, k = 5)))
      time("ivfpq_refined")(noop(Similarity.refineTopK(
        Similarity.ivfPqTopKWithCells(queries, emb, trained,
          nProbe = 4, m = 4, ksub = 16, k = 20, trainIters = 1),
        queries, emb, k = 5)))
      time("recall_joins")(noop(
        Seq(
          Similarity.lshTopK(queries, emb, planes, k = 5),
          Similarity.ivfTopKWith(queries, emb, trained, nProbe = 4, k = 5))
          .map(a => Similarity.recallAtK(a, exact, k = 5)
            .agg(avg(col("recall")).as("mean_recall")))
          .reduce(_ unionByName _)))
      graft.util.CacheScope.releaseAll()
    }
    spark.stop()
  }
}
