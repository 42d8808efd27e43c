package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent load (SURVEY §2.1 S6-S9): the reference's
  * `INSERT ... ON CONFLICT (key) DO UPDATE` semantics — last write wins,
  * re-processing is safe — re-expressed for a MERGE-less parquet world as
  * union + window-dedup keyed on the natural key, newest version first.
  *
  * At cluster scale the same operation is a MERGE into a transactional table
  * keyed on (slot | signature); the window form below is the deterministic
  * equivalent the correctness harness can hash. The window shuffles once on
  * the upsert key — the same shuffle a MERGE would do.
  */
object Load {

  /** Last-write-wins upsert: one row per key, keeping the highest
    * `versionCol` (ties broken arbitrarily-but-deterministically by
    * preferring the incoming batch, which the caller encodes in versionCol).
    */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol).desc)
    existing.unionByName(incoming, allowMissingColumns = false)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** S9/J2 — parent-existence probe: keep `parent_slot` only when the parent
    * block is present in the existing table or this batch (the reference
    * probes the DB before each insert while looping slots ascending, so a
    * parent earlier in the same batch counts — load.rs:172-182).
    */
  def resolveParentSlots(incoming: DataFrame, existingSlots: DataFrame): DataFrame = {
    val known = existingSlots.select(col("slot"))
      .union(incoming.select(col("slot")))
      .distinct()
      .withColumnRenamed("slot", "__known_slot")
    incoming
      .join(known, incoming("parent_slot") === known("__known_slot"), "left")
      .withColumn(
        "parent_slot",
        when(col("__known_slot").isNotNull, col("parent_slot")).otherwise(lit(null).cast("long")))
      .drop("__known_slot")
  }

  /** The reference's 19 B-tree indexes re-expressed as physical layout
    * (SURVEY §3/§4): partition directories give partition *pruning* on the
    * filter column (the index's selectivity), sorting within partitions
    * gives parquet min/max page skipping on the sort keys (the index's
    * ordered scan). E.g. transactions partitioned by `transaction_type`,
    * sorted by `(block_slot, signature)` serves the by-type, by-slot and
    * by-signature indexes of migrations ...0002...sql:36-41.
    */
  def writeIndexed(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String]): Unit =
    df
      .repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** Incremental partitioned upsert — the scale-safe form of `upsert` for a
    * continuously-loaded table. The table is laid out as one directory per
    * `bucketCol` value (a slot-range bucket); a micro-batch then only
    *
    *   1. reads the partitions its rows touch (partition-pruned scan),
    *   2. window-dedups union(existing-slice, incoming) on the upsert key,
    *   3. atomically swaps just those partition directories (stage + rename).
    *
    * Cost per batch is O(touched partitions), not O(table) — the parquet
    * analog of the reference's per-row `ON CONFLICT DO UPDATE`
    * (load.rs:185-204), where each conflict touches one B-tree page, not the
    * relation. Untouched partition directories are never rewritten (their
    * files stay byte-identical). Each touched bucket swaps via old->aside,
    * staged->live, drop-aside renames (the compactBucket pattern), so the
    * bucket's prior contents are on disk at every step — a crash mid-swap
    * leaves either the old or the new directory live (or the old
    * recoverable from the aside), and checkpoint replay of the batch then
    * converges via LWW dedup (ST5). A plain delete-then-rename would have
    * a window where rows absent from the current batch are lost for good,
    * because replay only re-runs the last micro-batch, not history.
    *
    * `incoming` must already carry `bucketCol` (derivable from the key) and
    * `versionCol`. Requires every duplicate of a key to land in the same
    * bucket — true when the bucket is a function of the key, as with
    * slot-range buckets.
    */
  def upsertPartitioned(
      incoming: DataFrame,
      path: String,
      keys: Seq[String],
      versionCol: String,
      bucketCol: String): Unit = {
    val spark = incoming.sparkSession
    val touched: Seq[Long] =
      incoming.select(col(bucketCol).cast("long")).distinct()
        .collect().map(_.getLong(0)).toSeq.sorted
    if (touched.isEmpty) return
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    healInterruptedSwaps(fs, path, bucketCol)
    val existing =
      if (hasPartitions(fs, root, bucketCol))
        spark.read.parquet(path)
          // partition discovery types the bucket dir value as int; normalize
          .withColumn(bucketCol, col(bucketCol).cast("long"))
          .filter(col(bucketCol).isin(touched: _*)) // partition-pruned
      else incoming.limit(0)
    val merged = upsert(existing, incoming.withColumn(bucketCol, col(bucketCol).cast("long")), keys, versionCol)
    // One task (=> one file) per touched bucket per batch; key-sorted within
    // for parquet min/max skipping on point lookups.
    val tmp = path + ".staging"
    merged
      .repartition(col(bucketCol))
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(bucketCol)
      .parquet(tmp)
    fs.mkdirs(root)
    touched.foreach { b =>
      val src = new org.apache.hadoop.fs.Path(s"$tmp/$bucketCol=$b")
      val dst = new org.apache.hadoop.fs.Path(s"$path/$bucketCol=$b")
      if (fs.exists(src)) {
        // Aside-rename (same pattern as compactBucket): never a moment
        // where the bucket's prior rows exist nowhere on disk. The aside
        // sits OUTSIDE the table root so partition discovery never sees it.
        val aside = new org.apache.hadoop.fs.Path(s"$path.old-$b")
        if (fs.exists(aside)) fs.delete(aside, true)
        val hadOld = fs.exists(dst)
        if (hadOld) fs.rename(dst, aside)
        fs.rename(src, dst)
        if (hadOld) fs.delete(aside, true)
      }
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  /** LSM-style upsert for high-frequency micro-batches: append the batch's
    * rows as NEW files in each touched bucket — O(batch) write cost,
    * independent of bucket size — instead of rewriting the bucket
    * ([[upsertPartitioned]], whose per-batch cost is O(bucket): fine when
    * batches are a sizable fraction of a bucket, ruinous write
    * amplification when a 10-slot tail-follow batch lands in a multi-GB
    * bucket). Duplicate keys across a bucket's files are resolved
    *
    *  - at read time by [[readDeduped]] (the LWW window over the bucket),
    *  - physically by per-bucket compaction, triggered here whenever a
    *    touched bucket exceeds `compactThreshold` files — so read
    *    amplification is bounded and steady-state cost is
    *    O(batch) + amortized O(bucket / threshold) per batch.
    *
    * This is the parquet rendition of the LSM/delta-file pattern MERGE
    * table formats use (append deltas, compact in the background).
    */
  def appendPartitioned(
      incoming: DataFrame,
      path: String,
      keys: Seq[String],
      versionCol: String,
      bucketCol: String,
      compactThreshold: Int = 16): Unit = {
    val spark = incoming.sparkSession
    val touched: Seq[Long] =
      incoming.select(col(bucketCol).cast("long")).distinct()
        .collect().map(_.getLong(0)).toSeq.sorted
    if (touched.isEmpty) return
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    healInterruptedSwaps(fs, path, bucketCol)
    incoming
      .withColumn(bucketCol, col(bucketCol).cast("long"))
      .repartition(col(bucketCol))
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode(SaveMode.Append)
      .partitionBy(bucketCol)
      .parquet(path)
    val overThreshold = touched.filter { b =>
      val dir = new org.apache.hadoop.fs.Path(s"$path/$bucketCol=$b")
      fs.listStatus(dir).count(_.getPath.getName.endsWith(".parquet")) > compactThreshold
    }
    // All over-threshold buckets compact in ONE Spark job (partition-pruned
    // read, one output file per bucket), not a per-bucket job loop — the
    // driver must not serialize O(buckets) jobs at scale.
    compactBuckets(spark, path, overThreshold, keys, versionCol, bucketCol)
  }

  /** Rewrite one bucket with duplicates resolved (LWW on `versionCol`),
    * via staging + atomic dir swap. Only this bucket's files are touched.
    */
  def compactBucket(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      bucket: Long,
      keys: Seq[String],
      versionCol: String,
      bucketCol: String): Unit =
    compactBuckets(spark, path, Seq(bucket), keys, versionCol, bucketCol)

  /** Rewrite `buckets` with duplicates resolved (LWW on `versionCol`) in a
    * single Spark job: one partition-pruned read over exactly those bucket
    * directories, one shuffle on the bucket id (=> one output file per
    * bucket), then a per-bucket aside-rename swap. Batching matters at
    * scale — a micro-batch that trips N buckets over the threshold must
    * not serialize N driver-side jobs.
    */
  def compactBuckets(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      buckets: Seq[Long],
      keys: Seq[String],
      versionCol: String,
      bucketCol: String): Unit = {
    if (buckets.isEmpty) return
    healInterruptedSwaps(
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      path, bucketCol)
    val slice = spark.read.parquet(path)
      .withColumn(bucketCol, col(bucketCol).cast("long"))
      .filter(col(bucketCol).isin(buckets: _*)) // partition-pruned
    val deduped = upsert(slice.limit(0), slice, keys, versionCol)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    // Stage OUTSIDE the table root: a leftover dir under it would poison
    // partition discovery ("slot_bucket=2.compacting" parses as a value).
    val tmp = new org.apache.hadoop.fs.Path(s"$path.compact-staging")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    deduped
      .repartition(col(bucketCol))
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(bucketCol)
      .parquet(tmp.toString)
    // Per bucket: old -> aside, staged -> live, drop aside. A crash between
    // the renames leaves the bucket recoverable from the aside dir (same
    // exposure as any rename-swap without a manifest; a table format's
    // commit log is the production-grade answer).
    buckets.foreach { b =>
      val src = new org.apache.hadoop.fs.Path(s"$tmp/$bucketCol=$b")
      if (fs.exists(src)) {
        val dst = new org.apache.hadoop.fs.Path(s"$path/$bucketCol=$b")
        val aside = new org.apache.hadoop.fs.Path(s"$path.old-$b")
        if (fs.exists(aside)) fs.delete(aside, true)
        val hadOld = fs.exists(dst)
        if (hadOld) fs.rename(dst, aside)
        fs.rename(src, dst)
        if (hadOld) fs.delete(aside, true)
      }
    }
    fs.delete(tmp, true)
  }

  /** The read view over an append-mode table: one row per key, newest
    * version wins — what [[upsertPartitioned]] guarantees physically,
    * recovered logically over not-yet-compacted buckets. Heals any
    * interrupted swap first so a crash mid-rename never reads as silently
    * missing rows (`bucketCol` identifies the aside dirs; pass the same
    * value the writers used).
    */
  def readDeduped(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      keys: Seq[String],
      versionCol: String,
      bucketCol: String = "slot_bucket"): DataFrame = {
    healInterruptedSwaps(
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      path, bucketCol)
    val raw = spark.read.parquet(path)
    upsert(raw.limit(0), raw, keys, versionCol)
  }

  /** Crash-recovery for the aside-rename swap: a swap interrupted between
    * `old -> aside` and `staged -> live` leaves a `<table>.old-<bucket>`
    * sibling with NO live bucket directory — without healing, the next
    * partition-pruned read would treat the bucket as empty and a retry
    * would delete the aside, making the loss permanent. Restore such
    * asides as the live bucket (the staged data never landed, so the old
    * rows are the current truth); delete asides whose live directory
    * exists (the swap completed, the aside is stale). Idempotent, one
    * directory listing when no debris exists.
    */
  def healInterruptedSwaps(
      fs: org.apache.hadoop.fs.FileSystem,
      path: String,
      bucketCol: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val parent = root.getParent
    if (parent == null || !fs.exists(parent)) return
    val prefix = root.getName + ".old-"
    fs.listStatus(parent).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith(prefix)) {
        val bucket = name.stripPrefix(prefix)
        val live = new org.apache.hadoop.fs.Path(root, s"$bucketCol=$bucket")
        if (fs.exists(live)) fs.delete(st.getPath, true) // swap completed
        else { fs.mkdirs(root); fs.rename(st.getPath, live) } // swap lost
      }
    }
  }

  /** Does `root` hold at least one `bucketCol=` partition directory? A bare
    * or empty root (e.g. a crash between mkdirs and the first partition
    * swap) must read as "no table yet", not as an unreadable parquet dir —
    * the streaming replay then recreates it.
    */
  def hasPartitions(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      bucketCol: String): Boolean =
    fs.exists(root) &&
      fs.listStatus(root).exists(_.getPath.getName.startsWith(s"$bucketCol="))

  def hasPartitions(
      spark: org.apache.spark.sql.SparkSession, path: String, bucketCol: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(path)
    hasPartitions(root.getFileSystem(spark.sparkContext.hadoopConfiguration), root, bucketCol)
  }

  /** Bucketed + sorted catalog table: the co-located-join layout. Both
    * sides of a repeated equi-join (transactions ⋈ blocks on slot,
    * instructions ⋈ transactions on signature) written with the same bucket
    * count on the join key join WITHOUT an Exchange — the shuffle happens
    * once at write time instead of once per query, which at 100 TB is the
    * difference between a layout decision and a per-query network pass.
    * (Spec: BucketedJoinSpec asserts the exchange-free plan.)
    */
  def writeBucketedTable(
      df: DataFrame,
      tableName: String,
      bucketKeys: Seq[String],
      nBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, bucketKeys.head, bucketKeys.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(tableName)
  }

  /** S8 — atomic batch write: stage to a temp dir then swap, so a failed job
    * never leaves a half-written table (the parquet analog of the
    * reference's single wrapping DB transaction, load.rs:162/286).
    */
  def writeAtomic(df: DataFrame, path: String): Unit = {
    val tmp = path + ".staging"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val dst = new org.apache.hadoop.fs.Path(path)
    // Aside-rename rather than delete-then-rename: the previous table stays
    // recoverable at every step even though a batch re-run would anyway
    // regenerate the full output.
    val aside = new org.apache.hadoop.fs.Path(path + ".old")
    if (fs.exists(aside)) fs.delete(aside, true)
    val hadOld = fs.exists(dst)
    if (hadOld) fs.rename(dst, aside)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    if (hadOld) fs.delete(aside, true)
  }
}
