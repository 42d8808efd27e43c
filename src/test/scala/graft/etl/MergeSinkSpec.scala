package graft.etl

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The sink seam (MergeSink): trait semantics via an in-memory fake, the
  * reference-shaped upsert statement text, and the parquet implementation's
  * equivalence with the plan-level Load.upsert.
  */
class MergeSinkSpec extends SparkTestBase {
  import spark.implicits._

  /** Trait-semantics fake: LWW by arrival order (the ON CONFLICT model —
    * later statements overwrite), keyed per table.
    */
  private final class InMemoryMergeSink extends MergeSink {
    val tables: mutable.Map[String, mutable.LinkedHashMap[Seq[Any], Map[String, Any]]] =
      mutable.Map.empty
    override def merge(batch: DataFrame, table: String, keys: Seq[String]): Unit = {
      val t = tables.getOrElseUpdate(table, mutable.LinkedHashMap.empty)
      val cols = batch.schema.fieldNames.toSeq
      batch.collect().foreach { r =>
        val row = cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap
        t.update(keys.map(row), row)
      }
    }
  }

  test("upsertStatement mirrors the reference's ON CONFLICT DO UPDATE shape") {
    val sql = MergeSink.upsertStatement(
      "blocks", Seq("slot", "blockhash", "parent_slot"), Seq("slot"))
    assert(sql ==
      "INSERT INTO blocks (slot, blockhash, parent_slot) VALUES (?, ?, ?) " +
        "ON CONFLICT (slot) DO UPDATE SET blockhash = EXCLUDED.blockhash, " +
        "parent_slot = EXCLUDED.parent_slot")
    // all-key table degenerates to DO NOTHING, and unknown keys are rejected
    assert(MergeSink.upsertStatement("t", Seq("k"), Seq("k")).endsWith("DO NOTHING"))
    intercept[IllegalArgumentException] {
      MergeSink.upsertStatement("t", Seq("a"), Seq("missing"))
    }
  }

  test("in-memory fake: re-delivery converges, last write wins (trait contract)") {
    val sink = new InMemoryMergeSink
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("slot", "hash")
    val b2 = Seq((2L, "b2"), (3L, "c")).toDF("slot", "hash")
    sink.merge(b1, "blocks", Seq("slot"))
    sink.merge(b2, "blocks", Seq("slot"))
    sink.merge(b2, "blocks", Seq("slot")) // replay: idempotent
    val got = sink.tables("blocks").values.map(m => (m("slot"), m("hash"))).toSet
    assert(got == Set((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("parquet sink through the seam equals plan-level Load.upsert") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val sink: MergeSink = new PartitionedParquetMergeSink(dir)
    def batch(version: Long, rows: (Long, String)*) =
      rows.toSeq.toDF("slot", "hash")
        .withColumn("slot_bucket", floor(col("slot") / 4).cast("long"))
        .withColumn("__version", lit(version))
    sink.merge(batch(0L, (1L, "a"), (5L, "b")), "blocks", Seq("slot"))
    sink.merge(batch(1L, (5L, "b2"), (9L, "c")), "blocks", Seq("slot"))
    val got = spark.read.parquet(s"$dir/blocks")
      .select("slot", "hash").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (5L, "b2"), (9L, "c")))
  }
}
