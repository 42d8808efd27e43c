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

    // ------------------------------------------------------------------
    // The `instructions` table (migrations ...0003) — one row per
    // instruction across all three encodings; program_name resolves from
    // the COALESCED id, so compiled instructions are named too.
    Q(
      "etl_instructions_golden",
      (s, _) =>
        goldenResult(s).instructions
          .select(
            col("transaction_signature"),
            col("instruction_index").cast("long").as("instruction_index"),
            col("program_id"),
            col("program_name"),
            col("instruction_type"),
            // The driver's pandas sorter can only hash scalar columns, so
            // arrays are JSON-stringified at the gate boundary; library
            // callers get the array-typed frame from goldenResult().
            to_json(col("accounts")).as("accounts"),
            col("data_hex"),
            col("data_decoded"))
          .orderBy("transaction_signature", "instruction_index"),
      Some("""SELECT transaction_signature,
             |       CAST(instruction_index AS BIGINT) AS instruction_index,
             |       program_id, program_name, instruction_type,
             |       CAST(to_json(CAST(accounts AS VARCHAR[])) AS VARCHAR) AS accounts,
             |       data_hex, data_decoded
             |FROM (VALUES
             |  ('sig_b2_sol', 0, '11111111111111111111111111111111', 'System Program', 'transfer', NULL, NULL, '{"lamports":777,"source":"b2src","destination":"b2dst"}'),
             |  ('sig_checked', 0, 'TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA', 'Token Program', 'transferChecked', NULL, NULL, '{"source":"srcC","destination":"dstC","tokenAmount":{"amount":"5000","decimals":6}}'),
             |  ('sig_compiled', 0, 'JUP6LkbZbjS1jKKwapdHNy74zcZ3tLUZoi5QNyVTaV4', 'Jupiter Aggregator v6', NULL, ['feePayer9','acc2'], 'compileddata', NULL),
             |  ('sig_dex', 0, 'JUP6LkbZbjS1jKKwapdHNy74zcZ3tLUZoi5QNyVTaV4', 'Jupiter Aggregator v6', NULL, ['trader','pool1'], 'swapdata', NULL),
             |  ('sig_dex', 1, 'TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA', 'Token Program', 'transfer', NULL, NULL, '{"source":"pool1","destination":"pool2","amount":"500","mint":"So11111111111111111111111111111111111111112"}'),
             |  ('sig_failed', 0, '11111111111111111111111111111111', 'System Program', 'transfer', NULL, NULL, '{"lamports":42,"source":"failsrc","destination":"faildst"}'),
             |  ('sig_nft', 0, 'metaqbxxUerdq28cj1RbAWkYQm3ybzjb6a8bt518x1s', 'Metaplex Token Metadata', NULL, ['minter','nftacc'], 'mintdata', NULL),
             |  ('sig_prog', 0, '11111111111111111111111111111111', 'System Program', 'createAccount', NULL, NULL, '{"lamports":2039280,"source":"payer"}'),
             |  ('sig_prog', 1, 'MemoSq4gqABAXKb96qnH8TysNcWxMyWCqXgDLGmfcHr', 'Memo Program', NULL, [], 'memodata', NULL),
             |  ('sig_sol', 0, '11111111111111111111111111111111', 'System Program', 'transfer', NULL, NULL, '{"lamports":1000,"source":"FY27src","destination":"HFqUdst"}'),
             |  ('sig_token', 0, 'TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA', 'Token Program', 'transfer', NULL, NULL, '{"source":"srcTok","destination":"dstTok","amount":"1000000","mint":"EPjFWdd5AufqSSqeM2qN1xzybapC8G4wEGGkZwyTDt1v","authority":"authAcc"}'),
             |  ('sig_unknown', 0, 'Unknown1111111111111111111111111111111111111', NULL, NULL, [], 'xx', NULL)
             |) AS t(transaction_signature, instruction_index, program_id, program_name,
             |       instruction_type, accounts, data_hex, data_decoded)
             |ORDER BY transaction_signature, instruction_index""".stripMargin)),

    // ------------------------------------------------------------------
    // The `accounts` activity rollup (migrations ...0004): per-address
    // first/last seen + signer/writable counts over the goldens.
    Q(
      "etl_accounts_golden",
      (s, _) =>
        goldenResult(s).accounts
          .select(
            col("address"),
            col("first_seen_slot"),
            col("last_seen_slot"),
            date_format(col("first_seen_time"), "yyyy-MM-dd HH:mm:ss").as("first_seen_utc"),
            date_format(col("last_seen_time"), "yyyy-MM-dd HH:mm:ss").as("last_seen_utc"),
            col("transaction_count"),
            col("as_signer_count"),
            col("as_writable_count"))
          .orderBy("address"),
      Some("""SELECT address,
             |       CAST(first_seen_slot AS BIGINT) AS first_seen_slot,
             |       CAST(last_seen_slot AS BIGINT) AS last_seen_slot,
             |       first_seen_utc, last_seen_utc,
             |       CAST(transaction_count AS BIGINT) AS transaction_count,
             |       CAST(as_signer_count AS BIGINT) AS as_signer_count,
             |       CAST(as_writable_count AS BIGINT) AS as_writable_count
             |FROM (VALUES
             |  ('FY27src', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 1, 1),
             |  ('HFqUdst', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 0, 1),
             |  ('JUP6LkbZbjS1jKKwapdHNy74zcZ3tLUZoi5QNyVTaV4', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 0, 0),
             |  ('acc2', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 0, 1),
             |  ('auth2', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 1, 1),
             |  ('authAcc', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 1, 1),
             |  ('b2dst', 1001, 1001, '2023-11-14 22:13:21', '2023-11-14 22:13:21', 1, 0, 1),
             |  ('b2src', 1001, 1001, '2023-11-14 22:13:21', '2023-11-14 22:13:21', 1, 1, 1),
             |  ('dstC', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 0, 0),
             |  ('dstTok', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 0, 0),
             |  ('faildst', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 0, 1),
             |  ('failsrc', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 1, 1),
             |  ('feePayer9', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 1, 1),
             |  ('minter', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 1, 1),
             |  ('newacc', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 0, 1),
             |  ('nftacc', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 0, 1),
             |  ('payer', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 1, 1),
             |  ('pool1', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 0, 1),
             |  ('pool2', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 0, 0),
             |  ('someacc', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 1, 1),
             |  ('srcC', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 0, 1),
             |  ('srcTok', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 0, 1),
             |  ('trader', 1000, 1000, '2023-11-14 22:13:20', '2023-11-14 22:13:20', 1, 1, 1)
             |) AS t(address, first_seen_slot, last_seen_slot, first_seen_utc, last_seen_utc,
             |       transaction_count, as_signer_count, as_writable_count)
             |ORDER BY address""".stripMargin)),

    // ------------------------------------------------------------------
    // A1 — the extraction-stats rollup (extract.rs:38-52, 244-272) incl.
    // F5 lamports->SOL (extract.rs:300). Single-row aggregate.
    Q(
      "etl_extraction_stats_golden",
      (s, _) => EtlPipeline.extractionStats(goldenResult(s).transactions),
      Some("""SELECT CAST(10 AS BIGINT) AS total_transactions,
             |       CAST(9 AS BIGINT) AS successful_transactions,
             |       CAST(1 AS BIGINT) AS failed_transactions,
             |       CAST(55000 AS BIGINT) AS total_fees,
             |       CAST(55000 AS DOUBLE) / 1e9 AS total_fees_sol,
             |       CAST(3 AS BIGINT) AS sol_transfers,
             |       CAST(2 AS BIGINT) AS spl_token_transfers,
             |       CAST(2 AS BIGINT) AS dex_swaps,
             |       CAST(1 AS BIGINT) AS nft_operations,
             |       CAST(1 AS BIGINT) AS program_interactions,
             |       CAST(1 AS BIGINT) AS unknown_transactions""".stripMargin)),

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
