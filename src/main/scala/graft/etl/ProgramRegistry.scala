package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The program dimension table (reference: migrations
  * 20251023000005_create_program_registry.sql:15-45 seed +
  * 20251023000006_add_kamino_drift.sql:3-6; in-memory form
  * src/etl/transform.rs:13-61).
  *
  * Two Spark forms, picked by registry size:
  *  - [[typeMap]]/[[nameMap]]: `typedLit` map literals — classification stays
  *    a pure constant-folded expression, zero joins, ideal while the registry
  *    is O(100) rows (it is 21);
  *  - [[df]]: a DataFrame for `broadcast()` joins — the scale path if the
  *    registry ever grew beyond what a literal should hold.
  */
object ProgramRegistry {

  /** (program_id, program_name, program_type) — seed rows, verbatim. */
  val seed: Seq[(String, String, String)] = Seq(
    ("11111111111111111111111111111111", "System Program", "System"),
    ("TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA", "Token Program", "Token"),
    ("ATokenGPvbdGVxr1b2hvZbsiqW5xWH25efTNsLJA8knL", "Associated Token Program", "Token"),
    ("TokenzQdBNbLqP5VEhdkAS6EPFLC1PHnBqCXEpPxuEb", "Token-2022 Program", "Token"),
    ("JUP6LkbZbjS1jKKwapdHNy74zcZ3tLUZoi5QNyVTaV4", "Jupiter Aggregator v6", "DEX"),
    ("whirLbMiicVdio4qvUfM5KAg6Ct8VwpYzGff3uctyCc", "Orca Whirlpool", "DEX"),
    ("9W959DqEETiGZocYWCQPaJ6sBmUzgfxXfqGeTEdp3aQP", "Orca v2", "DEX"),
    ("675kPX9MHTjS2zt1qfr1NYHuzeLXfQM9H24wFSUt1Mp8", "Raydium AMM v4", "DEX"),
    ("CAMMCzo5YL8w4VFF8KVHrK22GGUsp5VTaW7grrKgrWqK", "Raydium CLMM", "DEX"),
    ("M2mx93ekt1fmXSVkTrUL9xVFHkmME8HTUi5Cyc5aF7K", "Magic Eden v2", "NFT"),
    ("CJsLwbP1iu5DuUikHEJnLfANgKy6stB2uFgvBBHoyxwz", "Solanart", "NFT"),
    ("metaqbxxUerdq28cj1RbAWkYQm3ybzjb6a8bt518x1s", "Metaplex Token Metadata", "NFT"),
    ("p1exdMJcjVao65QdewkaZRUnU6VPSXhus9n2GzWfh98", "Metaplex Auction House", "NFT"),
    ("So1endDq2YkqhipRh3WViPa8hdiSpxWy6z3Z6tMCpAo", "Solend", "Lending"),
    ("MarBmsSgKXdrN1egZf5sqe1TMai9K1rChYNDJgjq7aD", "Marginfi", "Lending"),
    ("CRaTQLhLmP93f5YeEdoVvfDwHp2FyokBME6MpF9pxLx9", "Marinade Finance", "Staking"),
    ("J1toso1uCk3RLmjorhTtrVwY9HJ7X8V9yYac6Y7kGCPn", "Jito Stake Pool", "Staking"),
    ("MemoSq4gqABAXKb96qnH8TysNcWxMyWCqXgDLGmfcHr", "Memo Program", "Utility"),
    ("ComputeBudget111111111111111111111111111111", "Compute Budget Program", "System"),
    ("KLend2g3cP87fffoy8q1mQqGKjrxjC8boSyAYavgmjD", "Kamino Lend", "Lending"),
    ("dRiftyHA39MWEi3m9aunc5MzRF1JYuBsbn6VPcn33UH", "Drift Protocol", "Derivatives"))

  /** program_id -> program_type as a constant map expression. */
  def typeMap: Column = typedLit(seed.map(p => p._1 -> p._3).toMap)

  /** program_id -> program_name as a constant map expression. */
  def nameMap: Column = typedLit(seed.map(p => p._1 -> p._2).toMap)

  /** Dimension DataFrame — broadcast this when joining (SURVEY §2.3 J1). */
  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    seed.toDF("program_id", "program_name", "program_type")
  }
}
