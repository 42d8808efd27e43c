package graft.bench

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.dedup.Dedup
import graft.tables.Tables
import graft.text.TextFunctions

/** Ad-hoc stage-level profile of the dedup/text hot path at sfDir: which
  * layer (tokenize+shingle, hash, aggregate, join) owns the wall time.
  */
object ProfileDedup {
  private def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
  }

  /** Noop-sink materialization — count() would prune the projections. */
  private def mat(df: org.apache.spark.sql.DataFrame): Long = {
    df.write.format("noop").mode("overwrite").save()
    0L
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.fromEnv("graft-profile")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    // warmup
    docs.count(); Dedup.minhashSignatures(docs).count()

    for (_ <- 1 to 2) {
      time("tokens only")(mat(
        docs.select(TextFunctions.tokens(col("text")).as("t"))))
      time("shingles3 explode distinct")(mat(
        docs.select(explode(array_distinct(TextFunctions.shinglesFromTokens(
          TextFunctions.tokens(col("text")), 3))).as("s"))))
      time("+ xxhash64 per shingle")(mat(
        docs.select(col("doc_id"), explode(array_distinct(TextFunctions.shinglesFromTokens(
          TextFunctions.tokens(col("text")), 3))).as("s"))
          .select(col("doc_id"), xxhash64(col("s")).as("h"))))
      time("minhashSignatures k=32")(mat(Dedup.minhashSignatures(docs)))
      time("minhashLshPairs full")(mat(Dedup.minhashLshPairs(docs)))
      time("winnow: shingle5 only")(mat(
        docs.select(col("doc_id"), TextFunctions.shingles(col("text"), 5).as("sh"))))
      time("winnow: shingle5+hash")(mat(
        docs.select(col("doc_id"), TextFunctions.shingles(col("text"), 5).as("sh"))
          .select(col("doc_id"), transform(col("sh"), x => xxhash64(x)).as("hs"))))
      time("winnowing k=5 w=4 full")(mat(Dedup.winnowingFingerprints(docs)))
      time("simhashBitVectors")(mat(Dedup.simhashBitVectors(docs)))
      time("simhashPairs full")(mat(Dedup.simhashPairs(docs, maxHamming = 3)))
    }
    spark.stop()
  }
}
