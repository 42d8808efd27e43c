package graft.etl

import org.apache.spark.sql.types._

/** Canonical StructType for a jsonParsed Solana block — the shape produced by
  * `getBlock(slot, encoding=jsonParsed, transactionDetails=full)` reduced to
  * the fields the reference reads (reference: src/rpc/mod.rs:64-83,
  * src/etl/extract.rs:74-163, src/etl/transform.rs:232-331; FIXTURES.md §1).
  *
  * Notes:
  *  - `meta.err` is an arbitrary JSON value in the wire format; declared
  *    StringType so Spark's JSON parser stringifies whatever is there —
  *    success is `err IS NULL` either way (extract.rs:79).
  *  - `parsed.info.amount` arrives as a JSON string for SPL-token transfers
  *    but as a number in older payloads (parsers/token.rs:37-45); StringType
  *    captures both, `CAST(... AS LONG)` later normalizes.
  *  - instruction encodings: `programId` (jsonParsed), `program` (name),
  *    `programIdIndex` (compiled) are all declared so the extraction can
  *    coalesce across the three shapes (extract.rs:127-156).
  */
object BlockSchema {

  val tokenAmountType: StructType = StructType(Seq(
    StructField("amount", StringType),
    StructField("decimals", IntegerType)))

  val infoType: StructType = StructType(Seq(
    StructField("lamports", LongType),
    StructField("source", StringType),
    StructField("destination", StringType),
    StructField("amount", StringType),
    StructField("tokenAmount", tokenAmountType),
    StructField("mint", StringType),
    StructField("authority", StringType)))

  val parsedType: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("info", infoType)))

  val instructionType: StructType = StructType(Seq(
    StructField("programId", StringType),
    StructField("program", StringType),
    StructField("programIdIndex", IntegerType),
    StructField("parsed", parsedType),
    StructField("data", StringType),
    StructField("accounts", ArrayType(StringType))))

  val accountKeyType: StructType = StructType(Seq(
    StructField("pubkey", StringType),
    StructField("signer", BooleanType),
    StructField("writable", BooleanType)))

  val messageType: StructType = StructType(Seq(
    StructField("accountKeys", ArrayType(accountKeyType)),
    StructField("instructions", ArrayType(instructionType))))

  val transactionType: StructType = StructType(Seq(
    StructField("signatures", ArrayType(StringType)),
    StructField("message", messageType)))

  val metaType: StructType = StructType(Seq(
    StructField("err", StringType),
    StructField("fee", LongType)))

  val txWithMetaType: StructType = StructType(Seq(
    StructField("meta", metaType),
    StructField("transaction", transactionType)))

  /** Top-level block; `slot` is injected by the source (it is the request
    * parameter, not part of the RPC response body — extract.rs:236).
    */
  val block: StructType = StructType(Seq(
    StructField("slot", LongType),
    StructField("blockhash", StringType),
    StructField("parentSlot", LongType),
    StructField("blockTime", LongType),
    StructField("blockHeight", LongType),
    StructField("transactions", ArrayType(txWithMetaType))))
}
