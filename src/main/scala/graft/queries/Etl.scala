package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.EtlPipeline

/** Driver-checkable ETL queries: the full Solana pipeline (parse -> explode
  * -> project -> classify -> label -> transfer details) over the embedded
  * golden block fixture, hash-matched against a VALUES-literal oracle. This
  * puts the reference's core transform — not just star-schema analytics —
  * under the DuckDB correctness gate.
  */
object Etl {

  /** The golden jsonParsed blocks (FIXTURES.md §3), one JSON per line,
    * including one malformed line that PERMISSIVE parsing must drop.
    */
  def goldenLines(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val src = scala.io.Source.fromInputStream(
      getClass.getClassLoader.getResourceAsStream("golden_blocks.jsonl"))
    val lines = try src.getLines().toList finally src.close()
    lines.toDF("value")
  }

  private def goldenResult(spark: SparkSession): EtlPipeline.Result =
    EtlPipeline.runOnJson(spark, goldenLines(spark))

  val all: Seq[Q] = Seq(
    Q(
      "etl_transactions_golden",
      (s, _) =>
        goldenResult(s).transactions
          .select(
            col("signature"),
            col("block_slot"),
            col("transaction_index").cast("long").as("transaction_index"),
            col("success"),
            col("fee"),
            col("transaction_type"),
            col("transaction_label"),
            col("signer"),
            col("num_accounts").cast("long").as("num_accounts"),
            col("amount"),
            col("token_address"),
            col("from_account"),
            col("to_account"))
          .orderBy("signature"),
      Some("""SELECT signature, CAST(block_slot AS BIGINT) AS block_slot,
             |       CAST(transaction_index AS BIGINT) AS transaction_index,
             |       success, CAST(fee AS BIGINT) AS fee, transaction_type,
             |       transaction_label, signer,
             |       CAST(num_accounts AS BIGINT) AS num_accounts,
             |       CAST(amount AS BIGINT) AS amount, token_address,
             |       from_account, to_account
             |FROM (VALUES
             |  ('sig_b2_sol', 1001, 0, true, 5000, 'SOL Transfer', 'SOL Transfer (System Program)', 'b2src', 2, 777, NULL, 'b2src', 'b2dst'),
             |  ('sig_checked', 1000, 7, true, 5000, 'SPL Token Transfer', 'SPL Token Transfer (Token Program)', 'auth2', 3, 5000, 'unknown', 'srcC', 'dstC'),
             |  ('sig_compiled', 1000, 8, true, 5000, 'DEX Swap', 'DEX Swap (Jupiter Aggregator v6)', 'feePayer9', 3, NULL, NULL, NULL, NULL),
             |  ('sig_dex', 1000, 2, true, 10000, 'DEX Swap', 'DEX Swap (Jupiter Aggregator v6, Token Program)', 'trader', 3, 500, 'So11111111111111111111111111111111111111112', 'pool1', 'pool2'),
             |  ('sig_failed', 1000, 6, false, 5000, 'SOL Transfer', 'SOL Transfer (System Program)', 'failsrc', 2, 42, NULL, 'failsrc', 'faildst'),
             |  ('sig_nft', 1000, 3, true, 5000, 'NFT Mint', 'NFT Mint (Metaplex Token Metadata)', 'minter', 2, NULL, NULL, NULL, NULL),
             |  ('sig_prog', 1000, 4, true, 5000, 'Program Interaction', 'Program Interaction (System Program, Memo Program)', 'payer', 2, NULL, NULL, NULL, NULL),
             |  ('sig_sol', 1000, 0, true, 5000, 'SOL Transfer', 'SOL Transfer (System Program)', 'FY27src', 2, 1000, NULL, 'FY27src', 'HFqUdst'),
             |  ('sig_token', 1000, 1, true, 5000, 'SPL Token Transfer', 'SPL Token Transfer (Token Program)', 'authAcc', 3, 1000000, 'EPjFWdd5AufqSSqeM2qN1xzybapC8G4wEGGkZwyTDt1v', 'srcTok', 'dstTok'),
             |  ('sig_unknown', 1000, 5, true, 5000, 'Unknown', 'Unknown', 'someacc', 1, NULL, NULL, NULL, NULL)
             |) AS t(signature, block_slot, transaction_index, success, fee, transaction_type,
             |       transaction_label, signer, num_accounts, amount, token_address, from_account, to_account)
             |ORDER BY signature""".stripMargin)),

    Q(
      "etl_blocks_golden",
      (s, _) =>
        goldenResult(s).blocks
          .select(
            col("slot"), col("blockhash"), col("parent_slot"),
            date_format(col("block_time"), "yyyy-MM-dd HH:mm:ss").as("block_time_utc"),
            col("block_height"))
          .orderBy("slot"),
      Some("""SELECT CAST(slot AS BIGINT) AS slot, blockhash,
             |       CAST(parent_slot AS BIGINT) AS parent_slot,
             |       block_time_utc, CAST(block_height AS BIGINT) AS block_height
             |FROM (VALUES
             |  (1000, 'BlockHash1000aaaaaaaaaaaaaaaaaaaaaaaaaaaaa', 999, '2023-11-14 22:13:20', 900),
             |  (1001, 'BlockHash1001bbbbbbbbbbbbbbbbbbbbbbbbbbbbb', 1000, '2023-11-14 22:13:21', 901)
             |) AS t(slot, blockhash, parent_slot, block_time_utc, block_height)
             |ORDER BY slot""".stripMargin)),

    Q(
      "etl_type_histogram_golden",
      (s, _) =>
        EtlPipeline.typeHistogram(goldenResult(s).transactions)
          .orderBy("transaction_type"),
      Some("""SELECT transaction_type, CAST(n AS BIGINT) AS n,
             |       CAST(n AS DOUBLE) * 100.0 / 10.0 AS percentage
             |FROM (VALUES
             |  ('DEX Swap', 2), ('NFT Mint', 1), ('Program Interaction', 1),
             |  ('SOL Transfer', 3), ('SPL Token Transfer', 2), ('Unknown', 1)
             |) AS t(transaction_type, n)
             |ORDER BY transaction_type""".stripMargin))
  )
}
