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

  test("operator checkpoints are registered and releaseAll frees their blocks") {
    // The iterative operators' FINAL state (and the capstones' lineage
    // cuts) are eager localCheckpoints: unpersist() can't free them, so
    // without this path a 173-query driver session pins every query's
    // checkpoint blocks until job end. Same delta-of-ids discipline as
    // the persist test above.
    CacheScope.releaseAll(blocking = true)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    graft.graph.LabelPropagation.communities(edges, rounds = 2).count()
    def newIds = spark.sparkContext.getPersistentRDDs.keySet -- before
    // In-loop rounds already self-release; the final label table's blocks
    // must still be live here (the returned frame reads them)...
    assert(newIds.nonEmpty, "final checkpoint blocks should be live before release")
    CacheScope.releaseAll(blocking = true)
    // ...and gone after the session owner's release point.
    assert(newIds.isEmpty, s"checkpoint blocks must be freed, left $newIds")
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
