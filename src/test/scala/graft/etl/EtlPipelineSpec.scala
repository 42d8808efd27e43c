package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** End-to-end: golden fixture JSON -> five tables, classification histogram
  * matching the reference's headline output (extract.rs:303-309).
  */
class EtlPipelineSpec extends SparkTestBase {

  lazy val result: EtlPipeline.Result = EtlPipeline.runOnJson(
    spark, spark.read.text(fixturePath("golden_blocks.jsonl")))

  test("five tables materialize with expected row counts") {
    assert(result.blocks.count() == 2)
    assert(result.transactions.count() == 10)
    assert(result.instructions.count() == 12)
    assert(result.accounts.count() > 0)
    assert(result.programRegistry.count() == 21)
  }

  test("classification + labels on the golden block (C1+C3, one of each class)") {
    val got = result.transactions
      .select("signature", "transaction_type", "transaction_label")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got("sig_sol") == (("SOL Transfer", "SOL Transfer (System Program)")))
    assert(got("sig_token") == (("SPL Token Transfer", "SPL Token Transfer (Token Program)")))
    assert(got("sig_dex") == (("DEX Swap", "DEX Swap (Jupiter Aggregator v6, Token Program)")))
    assert(got("sig_nft") == (("NFT Mint", "NFT Mint (Metaplex Token Metadata)")))
    assert(got("sig_prog") == (("Program Interaction", "Program Interaction (System Program, Memo Program)")))
    assert(got("sig_unknown")._1 == "Unknown")
    assert(got("sig_failed")._1 == "SOL Transfer") // classified regardless of success
    assert(got("sig_compiled")._1 == "DEX Swap")   // compiled encoding resolved
  }

  test("transfer details (C4/C5): amounts, mint defaulting, first-match") {
    val got = result.transactions
      .select("signature", "amount", "token_address", "from_account", "to_account")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("sig_sol").getAs[Long]("amount") == 1000L)
    assert(got("sig_sol").getAs[String]("token_address") == null)
    assert(got("sig_token").getAs[Long]("amount") == 1000000L)
    assert(got("sig_token").getAs[String]("token_address")
      == "EPjFWdd5AufqSSqeM2qN1xzybapC8G4wEGGkZwyTDt1v")
    assert(got("sig_checked").getAs[Long]("amount") == 5000L)
    assert(got("sig_checked").getAs[String]("token_address") == "unknown")
    assert(got("sig_dex").getAs[Long]("amount") == 500L) // token leg of the swap
    assert(got("sig_nft").isNullAt(1))                   // no transfer instruction
  }

  test("extraction stats rollup matches the golden composition (A1)") {
    val s = EtlPipeline.extractionStats(result.transactions).head
    assert(s.getAs[Long]("total_transactions") == 10L)
    assert(s.getAs[Long]("successful_transactions") == 9L)
    assert(s.getAs[Long]("failed_transactions") == 1L)
    assert(s.getAs[Long]("total_fees") == 5000L * 9 + 10000L)
    assert(s.getAs[Long]("sol_transfers") == 3L)  // sig_sol, sig_failed, sig_b2_sol
    assert(s.getAs[Long]("spl_token_transfers") == 2L)
    assert(s.getAs[Long]("dex_swaps") == 2L)      // sig_dex, sig_compiled
    assert(s.getAs[Long]("nft_operations") == 1L)
    assert(s.getAs[Long]("program_interactions") == 1L)
    assert(s.getAs[Long]("unknown_transactions") == 1L)
  }

  test("type histogram percentages sum to 100 (A2)") {
    val pcts = EtlPipeline.typeHistogram(result.transactions)
      .select("percentage").collect().map(_.getDouble(0))
    assert(math.abs(pcts.sum - 100.0) < 1e-9)
  }

  test("raw_data round-trips as JSON (JSONB analog)") {
    val raw = result.transactions.filter(col("signature") === "sig_sol")
      .select("raw_data").head.getString(0)
    assert(raw.contains("\"signatures\":[\"sig_sol\"]"))
  }
}
