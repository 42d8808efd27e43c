package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dedup.Dedup

/** Dedup-at-ingest for a streaming document feed — the streaming face of
  * [[graft.dedup.Dedup.incrementalExact]] (d9): each micro-batch is
  * deduplicated against everything already landed AND within itself, and
  * only first-seen texts append to the corpus. The crawl-frontier shape:
  * history only ever grows by survivors, so the anti-join side stays
  * duplicate-free by construction.
  *
  * Exactly-once: each batch lands in its own `batch=<id>` directory with
  * OVERWRITE semantics, so a replayed micro-batch (checkpoint recovery)
  * rewrites the same files instead of doubling them — the same
  * directory-granular idempotence contract as [[graft.etl.Load]]'s
  * partition swap. History reads glob every batch directory; dedup prunes
  * the scan to the hash column (store-the-hash-at-ingest, the d9 scale
  * note, made physical here).
  */
object CorpusIngest {

  private def historySchema = "doc_id LONG, text STRING, text_hash STRING"

  def readHistory(spark: SparkSession, historyDir: String): DataFrame =
    spark.read.schema(historySchema).parquet(historyDir + "/batch=*")

  /** One micro-batch: survivors (first-seen hashes, min-id within batch)
    * land under `historyDir/batch=<batchId>`. Exposed for direct testing
    * of the replay contract; [[start]] wires it to foreachBatch.
    */
  def ingestBatch(batch: DataFrame, historyDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // History = every landed batch EXCEPT this one: on checkpoint replay
    // the re-delivered batch's own previous output is already on disk,
    // and screening against it would dedup the whole batch away — the
    // overwrite would then ERASE the landed data instead of rewriting it
    // (the replay-vs-self trap; CorpusIngestSpec pins it). An empty
    // corpus reads as an empty frame (a batch=* glob would refuse the
    // bare path).
    val priorDirs = Option(new java.io.File(historyDir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("batch=")
        && f.getName != s"batch=$batchId")
      .map(_.getAbsolutePath)
    val history =
      if (priorDirs.nonEmpty)
        spark.read.schema(historySchema).parquet(priorDirs: _*)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(historySchema))
    val survivors = Dedup.incrementalExactAgainstHashes(
      batch, history.select("text_hash"))
      .select(col("doc_id"), col("text_hash"))
    // Re-attach text for the landed corpus: join back on the elected id
    // (hash-keyed join would resend every batch copy's text).
    survivors
      .join(batch.select(col("doc_id"), col("text")), Seq("doc_id"))
      .select("doc_id", "text", "text_hash")
      .write.mode("overwrite")
      .parquet(s"$historyDir/batch=$batchId")
  }

  def start(docs: DataFrame, historyDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, historyDir, batchId)
      }
      .start()
}
