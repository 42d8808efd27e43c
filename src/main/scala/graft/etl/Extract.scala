package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Block/transaction extraction (SURVEY §2.2 P1-P6): from raw block JSON to
  * the exploded, projected transaction DataFrame. Everything here is a pure
  * Catalyst expression — higher-order array functions instead of UDFs — so
  * whole-stage codegen fuses the entire projection chain and Parquet scans
  * under it keep pushdown.
  */
object Extract {

  /** Parse raw JSON lines (one block per line) under PERMISSIVE mode:
    * malformed blocks become all-null rows that are filtered, mirroring the
    * reference's skip-and-warn (extract.rs:60-67, 277-281).
    */
  def parseBlocks(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    raw
      .select(from_json(col(jsonCol), BlockSchema.block, Map("mode" -> "PERMISSIVE")).as("b"))
      .select("b.*")
      .filter(col("blockhash").isNotNull)

  /** The `blocks` table projection (reference: models.rs:12-18, loader
    * src/etl/load.rs:185-204). `processed_at` is stamped by the loader.
    */
  def blocks(parsed: DataFrame): DataFrame =
    parsed.select(
      col("slot"),
      col("blockhash"),
      col("parentSlot").as("parent_slot"),
      timestamp_seconds(col("blockTime")).as("block_time"),
      col("blockHeight").as("block_height"))

  // -----------------------------------------------------------------------
  // Per-transaction expressions, usable on the exploded column `t`.

  /** P4 — program-ID extraction with in-order dedup across the three
    * instruction encodings (extract.rs:116-163): `programId` string, then
    * the `program` name field, then compiled `programIdIndex` looked up in
    * accountKeys. `array_distinct` preserves first-seen order, matching the
    * reference's contains-check dedup.
    *
    * Reference quirk kept: when only the `program` *name* (e.g. "system") is
    * present, the name leaks into program_ids (extract.rs:133-138).
    */
  def programIds(message: Column): Column =
    array_distinct(transform(
      message.getField("instructions"),
      i => coalesce(
        i.getField("programId"),
        i.getField("program"),
        get(message.getField("accountKeys"), i.getField("programIdIndex"))
          .getField("pubkey"))))

  /** P5 — flattened account keys (transform.rs:232-248). */
  def accountKeys(message: Column): Column =
    message.getField("accountKeys").getField("pubkey")

  /** P1+P2+P3 — explode a parsed block into one row per transaction with the
    * reference's projections: success = meta.err IS NULL (extract.rs:79),
    * fee (:82), signature = signatures[0] (:89-93), account/instruction
    * counts (:96-107), program_ids (P4), account_keys (P5), signer (P6).
    *
    * P6 note: the reference *intends* signer = accountKeys[0] but navigates a
    * nonexistent `transaction` key so it is always NULL in practice
    * (load.rs:221-236); this implements the documented intent — a recorded
    * divergence (SURVEY §7 risk register).
    */
  def transactions(parsed: DataFrame): DataFrame = {
    val msg = col("t.transaction.message")
    parsed
      .select(
        col("slot").as("block_slot"),
        posexplode(col("transactions")).as(Seq("transaction_index", "t")))
      .filter(col("t.meta").isNotNull) // P3: no meta -> skipped
      .select(
        get(col("t.transaction.signatures"), lit(0)).as("signature"),
        col("block_slot"),
        col("transaction_index"),
        col("t.meta.err").isNull.as("success"),
        col("t.meta.fee").as("fee"),
        size(msg.getField("accountKeys")).cast("int").as("num_accounts"),
        size(msg.getField("instructions")).cast("int").as("num_instructions"),
        programIds(msg).as("program_ids"),
        accountKeys(msg).as("account_keys"),
        get(accountKeys(msg), lit(0)).as("signer"),
        col("t.transaction").as("tx"),
        msg.getField("instructions").as("instructions"))
  }

  /** The `instructions` table the reference declares but never populates
    * (migrations ...0003; SURVEY §1.1 asymmetry) — derived from the raw
    * transaction, one row per instruction.
    */
  def instructions(txs: DataFrame): DataFrame =
    txs
      .select(
        col("signature").as("transaction_signature"),
        col("tx.message.accountKeys").as("keys"),
        posexplode(col("instructions")).as(Seq("instruction_index", "i")))
      // program_id is resolved once across the three encodings, then feeds
      // BOTH the column and the registry name lookup — so compiled
      // (programIdIndex) and name-encoded instructions still get a
      // program_name when the registry knows the resolved id.
      .withColumn(
        "program_id",
        coalesce(
          col("i.programId"),
          col("i.program"),
          get(col("keys"), col("i.programIdIndex")).getField("pubkey")))
      .select(
        col("transaction_signature"),
        col("instruction_index"),
        col("program_id"),
        element_at(ProgramRegistry.nameMap, col("program_id")).as("program_name"),
        col("i.parsed.type").as("instruction_type"),
        col("i.accounts").as("accounts"),
        col("i.data").as("data_hex"),
        to_json(col("i.parsed.info")).as("data_decoded"))

  /** The `accounts` activity rollup the reference declares but never fills
    * (migrations ...0004; SURVEY §2.5 A5): per-address first/last seen,
    * transaction count, signer/writable counts. One explode + one shuffle on
    * address — scales linearly with total key references.
    */
  def accounts(parsed: DataFrame): DataFrame =
    parsed
      .select(
        col("slot"),
        timestamp_seconds(col("blockTime")).as("block_time"),
        explode(col("transactions")).as("t"))
      .filter(col("t.meta").isNotNull)
      .select(col("slot"), col("block_time"), explode(col("t.transaction.message.accountKeys")).as("k"))
      .groupBy(col("k.pubkey").as("address"))
      .agg(
        min("slot").as("first_seen_slot"),
        max("slot").as("last_seen_slot"),
        min("block_time").as("first_seen_time"),
        max("block_time").as("last_seen_time"),
        count(lit(1)).as("transaction_count"),
        count_if(col("k.signer")).as("as_signer_count"),
        count_if(col("k.writable")).as("as_writable_count"))
}
