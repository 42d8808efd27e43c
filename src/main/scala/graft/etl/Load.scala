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
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
