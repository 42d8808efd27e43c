package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end batch ETL (SURVEY §3 entry point 1): raw block JSON ->
  * the five analytical tables. The reference's per-slot loop, retry
  * scaffolding and row-at-a-time UPSERTs collapse into one declarative plan:
  * read -> posexplode -> a single enrichment select -> idempotent writes.
  * Catalyst fuses P2-P6 + C1-C6 into one codegen stage per table.
  */
object EtlPipeline {

  final case class Result(
      blocks: DataFrame,
      transactions: DataFrame,
      instructions: DataFrame,
      accounts: DataFrame,
      programRegistry: DataFrame)

  /** Run the full transform over already-parsed blocks. */
  def run(spark: SparkSession, parsedBlocks: DataFrame): Result = {
    val blocks = Extract.blocks(parsedBlocks)
      .withColumn("processed_at", current_timestamp())

    val txBase = Extract.transactions(parsedBlocks)

    // C1 + C3 + C4/C5/P9: classification, label, transfer details. The
    // first-transfer array scan is staged as a real column so the details
    // struct's ~6 references don't each re-run the filter (the
    // expression-staging rule; CollapseProject won't inline a
    // multi-referenced projection, so the staging survives optimization).
    val details = Parsers.transferDetailsFromFirst(col("__first_transfer"))
    val enriched = txBase
      .withColumn("__first_transfer", Parsers.firstTransfer(col("instructions")))
      .withColumn("transaction_type", Classify.transactionType(col("program_ids")))
      .withColumn("transaction_label", Classify.label(col("transaction_type"), col("program_ids")))
      .withColumn("amount", details.getField("amount"))
      .withColumn("token_address", details.getField("token_address"))
      .withColumn("from_account", details.getField("from_account"))
      .withColumn("to_account", details.getField("to_account"))

    // The transactions table per migrations ...0002 (raw_data JSONB -> JSON string).
    val transactions = enriched.select(
      col("signature"),
      col("block_slot"),
      col("transaction_index"),
      col("success"),
      col("fee"),
      col("transaction_type"),
      col("transaction_label"),
      col("signer"),
      col("num_accounts"),
      col("amount"),
      col("token_address"),
      col("from_account"),
      col("to_account"),
      to_json(col("tx")).as("raw_data"))

    Result(
      blocks = blocks,
      transactions = transactions,
      instructions = Extract.instructions(txBase),
      accounts = Extract.accounts(parsedBlocks),
      programRegistry = ProgramRegistry.df(spark))
  }

  /** Convenience: parse raw JSON lines then run. */
  def runOnJson(spark: SparkSession, rawJsonLines: DataFrame): Result =
    run(spark, Extract.parseBlocks(rawJsonLines))

  /** A1/A2 — the extraction-stats rollup the reference prints per range
    * (extract.rs:38-52, 244-272): block/tx counts, success split, fees, and
    * the per-type histogram with NftMint+NftTransfer merged (:267-269).
    */
  def extractionStats(transactions: DataFrame): DataFrame =
    transactions.agg(
      count(lit(1)).as("total_transactions"),
      count_if(col("success")).as("successful_transactions"),
      count_if(!col("success")).as("failed_transactions"),
      sum(col("fee")).as("total_fees"),
      // F5 — lamports -> SOL for display (extract.rs:300: fees as SOL).
      (sum(col("fee")) / lit(1e9)).as("total_fees_sol"),
      count_if(col("transaction_type") === Classify.TypeSolTransfer).as("sol_transfers"),
      count_if(col("transaction_type") === Classify.TypeSplTokenTransfer).as("spl_token_transfers"),
      count_if(col("transaction_type") === Classify.TypeDexSwap).as("dex_swaps"),
      count_if(col("transaction_type").isin(Classify.TypeNftMint, Classify.TypeNftTransfer))
        .as("nft_operations"),
      count_if(col("transaction_type") === Classify.TypeProgramInteraction).as("program_interactions"),
      count_if(col("transaction_type") === Classify.TypeUnknown).as("unknown_transactions"))

  /** A2 — type histogram with percentage-of-total (transform.rs:340-377). */
  def typeHistogram(transactions: DataFrame): DataFrame = {
    // Persisted: the |types|-row histogram feeds both the total and the
    // percentage join — one transaction pass instead of two (guide §2.4).
    val hist = graft.util.CacheScope.persist(
      transactions.groupBy("transaction_type").agg(count(lit(1)).as("n")))
    val total = hist.agg(sum("n").as("__total"))
    hist.crossJoin(broadcast(total))
      .withColumn("percentage", col("n") * lit(100.0) / col("__total"))
      .drop("__total")
      .orderBy("transaction_type")
  }
}
