package graft.util

import graft.SparkTestBase
import graft.dedup.Dedup
import graft.text.TfIdf

class CacheScopeSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over the lazy cat",
    3L -> "pack my box with five dozen liquor jugs").toDF("doc_id", "text")

  test("operator persists are registered and releaseAll leaves no cached RDDs") {
    CacheScope.releaseAll(blocking = true) // clean slate (other suites share the session)
    val before = spark.sparkContext.getPersistentRDDs.size
    Dedup.minhashLshPairs(docs, k = 8, bands = 4).count()
    TfIdf.topTerms(docs, k = 2).count()
    assert(CacheScope.liveCount >= 2) // sigs + tf at minimum
    assert(spark.sparkContext.getPersistentRDDs.size > before)
    CacheScope.releaseAll(blocking = true)
    assert(CacheScope.liveCount === 0)
    assert(spark.sparkContext.getPersistentRDDs.size <= before)
  }

  test("results are identical before and after release (recompute from lineage)") {
    val first = Dedup.jaccardShinglePairs(docs, threshold = 0.3)
      .collect().map(_.toSeq).toSet
    CacheScope.releaseAll()
    // The SAME returned plan still works after its cache is dropped...
    val again = Dedup.jaccardShinglePairs(docs, threshold = 0.3)
    CacheScope.releaseAll() // ...even released before materialization
    assert(again.collect().map(_.toSeq).toSet === first)
  }
}
