package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LoadSpec extends SparkTestBase {
  import spark.implicits._

  private def asSet(df: DataFrame): Set[(Long, String, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("upsert keeps newest version per key (S6/S7 last-write-wins)") {
    val existing = Seq((1L, "old", 1L), (2L, "old", 1L)).toDF("slot", "v", "version")
    val incoming = Seq((2L, "new", 2L), (3L, "new", 2L)).toDF("slot", "v", "version")
    val got = asSet(Load.upsert(existing, incoming, Seq("slot"), "version"))
    assert(got == Set((1L, "old", 1L), (2L, "new", 2L), (3L, "new", 2L)))
  }

  test("upsert is idempotent: re-applying a batch changes nothing (ST5)") {
    val existing = Seq((1L, "a", 1L)).toDF("slot", "v", "version")
    val batch = Seq((1L, "b", 2L), (2L, "b", 2L)).toDF("slot", "v", "version")
    val once = Load.upsert(existing, batch, Seq("slot"), "version")
    val twice = Load.upsert(once, batch, Seq("slot"), "version")
    assert(asSet(once) == asSet(twice))
  }

  test("parent probe: parent in batch kept, unknown parent nulled (S9/J2)") {
    val incoming = Seq((1000L, 999L), (1001L, 1000L)).toDF("slot", "parent_slot")
    val existing = Seq.empty[Long].toDF("slot")
    val got = Load.resolveParentSlots(incoming, existing)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1000L).isEmpty)      // slot 999 unknown -> NULL (FK safety)
    assert(got(1001L).contains(1000L)) // parent in same batch -> kept
  }

  test("parent probe: parent in existing table kept") {
    val incoming = Seq((1000L, 999L)).toDF("slot", "parent_slot")
    val existing = Seq(999L).toDF("slot")
    val got = Load.resolveParentSlots(incoming, existing).head
    assert(got.getLong(1) == 999L)
  }

  test("upsertPartitioned's existing-slice read is partition-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/t"
    def batch(version: Long, slots: Long*) =
      slots.map(s => (s, s"v$version")).toDF("slot", "v")
        .withColumn("slot_bucket", floor(col("slot") / 10).cast("long"))
        .withColumn("__version", lit(version))
    Load.upsertPartitioned(batch(0L, 1L, 11L, 21L), dir, Seq("slot"), "__version", "slot_bucket")
    // The scan feeding a second batch's merge must carry a PartitionFilters
    // entry on slot_bucket (pruning, not a full-table read). Assert on the
    // physical plan of the same pruned read the merge performs.
    val pruned = spark.read.parquet(dir)
      .withColumn("slot_bucket", col("slot_bucket").cast("long"))
      .filter(col("slot_bucket").isin(Seq(1L): _*))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("slot_bucket"))
    assert(pruned.count() == 1) // only bucket 1's row is read
    // And the merge itself converges: second batch only touches bucket 1.
    Load.upsertPartitioned(batch(1L, 12L), dir, Seq("slot"), "__version", "slot_bucket")
    val got = spark.read.parquet(dir).select("slot", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "v0"), (11L, "v0"), (21L, "v0"), (12L, "v1")))
  }

  test("appendPartitioned compacts a bucket once past the file threshold") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lsm").toString + "/t"
    def batch(version: Long, slots: Long*) =
      slots.map(s => (s, s"v$version")).toDF("slot", "v")
        .withColumn("slot_bucket", floor(col("slot") / 10).cast("long"))
        .withColumn("__version", lit(version))
    def bucketFiles(b: Long): Int =
      Option(new java.io.File(s"$dir/slot_bucket=$b").listFiles()).toSeq.flatten
        .count(_.getName.endsWith(".parquet"))
    // Three appends of the same key: O(batch) writes, files accumulate...
    Load.appendPartitioned(batch(0L, 1L), dir, Seq("slot"), "__version", "slot_bucket",
      compactThreshold = 2)
    Load.appendPartitioned(batch(1L, 1L), dir, Seq("slot"), "__version", "slot_bucket",
      compactThreshold = 2)
    assert(bucketFiles(0L) == 2) // under threshold: pure appends, no rewrite
    assert(spark.read.parquet(dir).count() == 2) // both versions present raw
    // ...third append crosses the threshold: the bucket compacts to one
    // deduped file and the raw read IS the LWW view.
    Load.appendPartitioned(batch(2L, 1L), dir, Seq("slot"), "__version", "slot_bucket",
      compactThreshold = 2)
    assert(bucketFiles(0L) == 1)
    val rows = spark.read.parquet(dir).select("slot", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "v2")))
    // readDeduped is stable across compacted and uncompacted states.
    val dd = Load.readDeduped(spark, dir, Seq("slot"), "__version")
      .select("slot", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(dd == Seq((1L, "v2")))
  }

  test("writeAtomic stages then swaps, and re-run overwrites cleanly (S8)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-load").toString + "/blocks"
    Load.writeAtomic(Seq((1L, "a")).toDF("slot", "v"), dir)
    assert(spark.read.parquet(dir).count() == 1)
    Load.writeAtomic(Seq((1L, "a"), (2L, "b")).toDF("slot", "v"), dir)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("a swap interrupted between renames heals on the next operation") {
    // Simulate the crash window: old -> aside done, staged -> live never
    // happened. The bucket's live dir is gone; only the aside survives.
    val dir = java.nio.file.Files.createTempDirectory("graft-heal").toString + "/t"
    def batch(version: Long, slots: Long*) =
      slots.map(s => (s, s"v$version")).toDF("slot", "v")
        .withColumn("slot_bucket", floor(col("slot") / 10).cast("long"))
        .withColumn("__version", lit(version))
    Load.upsertPartitioned(batch(0L, 1L, 11L), dir, Seq("slot"), "__version", "slot_bucket")
    val live = new java.io.File(s"$dir/slot_bucket=1")
    val aside = new java.io.File(s"$dir.old-1")
    assert(live.renameTo(aside)) // the crash
    // Without healing this read would silently drop slot 11 and an upsert
    // retry would delete the aside for good. With healing, both recover.
    val healed = Load.readDeduped(spark, dir, Seq("slot"), "__version")
      .select("slot").collect().map(_.getLong(0)).toSet
    assert(healed == Set(1L, 11L))
    assert(live.isDirectory && !aside.exists())
    // A completed-swap leftover (live exists AND aside exists) is stale:
    // healing must drop the aside and keep the live version.
    val stale = new java.io.File(s"$dir.old-0")
    assert(new java.io.File(s"$dir/slot_bucket=0").isDirectory)
    java.nio.file.Files.createDirectory(stale.toPath)
    Load.upsertPartitioned(batch(1L, 11L), dir, Seq("slot"), "__version", "slot_bucket")
    assert(!stale.exists())
    val rows = spark.read.parquet(dir).select("slot", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "v0"), (11L, "v1")))
  }

  test("swaps leave no staging/aside debris next to the table") {
    // The aside-rename dance (upsertPartitioned, compactBuckets,
    // writeAtomic) stages SIBLING dirs of the table root; after a
    // successful swap every one of them must be gone, or retries would
    // resurrect stale data and partition discovery of a parent dir would
    // see junk.
    val root = java.nio.file.Files.createTempDirectory("graft-debris")
    val dir = root.toString + "/t"
    def batch(version: Long, slots: Long*) =
      slots.map(s => (s, s"v$version")).toDF("slot", "v")
        .withColumn("slot_bucket", floor(col("slot") / 10).cast("long"))
        .withColumn("__version", lit(version))
    Load.upsertPartitioned(batch(0L, 1L, 11L), dir, Seq("slot"), "__version", "slot_bucket")
    Load.upsertPartitioned(batch(1L, 1L), dir, Seq("slot"), "__version", "slot_bucket")
    Load.appendPartitioned(batch(2L, 1L), dir, Seq("slot"), "__version", "slot_bucket",
      compactThreshold = 1)  // forces a compaction pass too
    Load.writeAtomic(Seq((9L, "z")).toDF("slot", "v"), root.toString + "/atomic")
    val siblings = Option(root.toFile.listFiles()).toSeq.flatten.map(_.getName).toSet
    assert(siblings == Set("t", "atomic"), s"unexpected debris: $siblings")
  }
}
