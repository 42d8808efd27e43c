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
    // Compare only the DELTA of RDD ids: the shared session also holds
    // other suites' localCheckpoint RDDs, which the ContextCleaner drops
    // asynchronously — absolute counts race, new-id sets do not (the
    // operators' persisted frames stay strongly referenced until release).
    CacheScope.releaseAll(blocking = true)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.minhashLshPairs(docs, k = 8, bands = 4).count()
    TfIdf.topTerms(docs, k = 2).count()
    assert(CacheScope.liveCount >= 2) // sigs + tf at minimum
    def newIds = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(newIds.nonEmpty)
    CacheScope.releaseAll(blocking = true)
    assert(CacheScope.liveCount === 0)
    assert(newIds.isEmpty, s"operator persists must be gone, left $newIds")
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
