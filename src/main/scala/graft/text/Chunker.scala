package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping-window document chunking — the RAG/embedding-prep step that
  * splits each document into fixed-size token windows with a configured
  * overlap, so retrieval granularity is bounded and context survives chunk
  * boundaries. The fixed-stride cousin of [[graft.dedup.SpanDedup]]'s
  * non-overlapping spans.
  *
  * Chunk starts advance by `stride = chunkSize - overlap`; a start is
  * emitted while it still contributes tokens beyond the previous chunk's
  * overlap (start < n - overlap), and every document emits at least chunk
  * 0 — so no chunk is wholly contained in its predecessor and the final
  * token is always covered.
  *
  * Shape at scale: pure per-row compute (sequence + posexplode + slice) —
  * no shuffle at all; output rows ≈ corpus tokens / stride. The explode
  * multiplies rows before any downstream aggregation, so chunk first,
  * filter early.
  */
object Chunker {

  def chunk(
      docs: DataFrame,
      chunkSize: Int,
      overlap: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val stride = chunkSize - overlap
    docs
      // null-body docs emit NO chunks: greatest/least SKIP nulls, so an
      // unfiltered null text would fabricate one phantom full-size chunk
      // of empty text (greatest(1, null) = 1, least(12, null) = 12).
      .filter(col(textCol).isNotNull)
      .withColumn("__w", TextFunctions.tokens(col(textCol)))
      .withColumn("__n", size(col("__w")))
      .withColumn("__chunks",
        greatest(lit(1L), ceil((col("__n") - lit(overlap)).cast("double") / lit(stride))))
      .select(col(idCol), col("__w"), col("__n"),
        explode(sequence(lit(0L), col("__chunks") - 1)).as("chunk_id"))
      .withColumn("__start", col("chunk_id") * stride)
      .select(
        col(idCol),
        col("chunk_id"),
        least(lit(chunkSize.toLong), col("__n") - col("__start")).as("n_tokens"),
        concat_ws(" ", slice(col("__w"), (col("__start") + 1).cast("int"), lit(chunkSize)))
          .as("chunk_text"))
  }
}
