package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ExtractSpec extends SparkTestBase {

  lazy val raw: DataFrame = spark.read.text(fixturePath("golden_blocks.jsonl"))
  lazy val parsed: DataFrame = Extract.parseBlocks(raw)
  lazy val txs: DataFrame = Extract.transactions(parsed).cache()

  test("malformed lines are dropped, valid blocks kept (P3 skip-and-warn)") {
    assert(raw.count() == 3)
    assert(parsed.count() == 2)
  }

  test("blocks projection (slot, hash, parent, time, height)") {
    val rows = Extract.blocks(parsed).orderBy("slot").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1000L, 1001L))
    assert(rows(0).getString(1).startsWith("BlockHash1000"))
    assert(rows(0).getLong(2) == 999L)
    assert(rows(0).getTimestamp(3).toInstant.getEpochSecond == 1700000000L)
    assert(rows(0).getLong(4) == 900L)
  }

  test("transaction projections: signature, success, fee, counts (P1/P2)") {
    assert(txs.count() == 10)
    val bySig = txs.collect().map(r => r.getAs[String]("signature") -> r).toMap
    assert(bySig("sig_sol").getAs[Boolean]("success"))
    assert(!bySig("sig_failed").getAs[Boolean]("success"))
    assert(bySig("sig_sol").getAs[Long]("fee") == 5000L)
    assert(bySig("sig_dex").getAs[Long]("fee") == 10000L)
    assert(bySig("sig_dex").getAs[Int]("num_accounts") == 3)
    assert(bySig("sig_dex").getAs[Int]("num_instructions") == 2)
    assert(bySig("sig_sol").getAs[Int]("transaction_index") == 0)
    assert(bySig("sig_token").getAs[Int]("transaction_index") == 1)
    assert(bySig("sig_b2_sol").getAs[Long]("block_slot") == 1001L)
  }

  test("program_ids: three encodings coalesced, in-order dedup (P4)") {
    val ids = txs.select(col("signature"), col("program_ids")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(ids("sig_sol") == Seq(Classify.SystemProgram))
    assert(ids("sig_dex") == Seq(
      "JUP6LkbZbjS1jKKwapdHNy74zcZ3tLUZoi5QNyVTaV4", Classify.TokenProgram))
    // compiled encoding: programIdIndex=2 -> accountKeys[2].pubkey
    assert(ids("sig_compiled") == Seq("JUP6LkbZbjS1jKKwapdHNy74zcZ3tLUZoi5QNyVTaV4"))
  }

  test("signer = first account key (P6, documented intent not the NULL bug)") {
    val signer = txs.filter(col("signature") === "sig_sol").select("signer").head.getString(0)
    assert(signer == "FY27src")
  }

  test("instructions table derivation (declared-but-unfilled in reference)") {
    val ins = Extract.instructions(txs)
    assert(ins.count() == 12) // 10 txs with 1 instr + sig_dex/sig_prog with 2
    val dex = ins.filter(col("transaction_signature") === "sig_dex")
      .orderBy("instruction_index").collect()
    assert(dex(0).getAs[String]("program_id") == "JUP6LkbZbjS1jKKwapdHNy74zcZ3tLUZoi5QNyVTaV4")
    assert(dex(0).getAs[String]("program_name") == "Jupiter Aggregator v6")
    assert(dex(1).getAs[String]("instruction_type") == "transfer")
    assert(dex(0).getAs[String]("data_hex") == "swapdata")
  }

  test("accounts activity rollup (A5)") {
    val acc = Extract.accounts(parsed).collect()
      .map(r => r.getAs[String]("address") -> r).toMap
    // trader appears once, as fee payer (signer, writable)
    assert(acc("trader").getAs[Long]("transaction_count") == 1L)
    assert(acc("trader").getAs[Long]("as_signer_count") == 1L)
    assert(acc("trader").getAs[Long]("as_writable_count") == 1L)
    assert(acc("pool1").getAs[Long]("as_signer_count") == 0L)
    assert(acc("pool1").getAs[Long]("first_seen_slot") == 1000L)
  }
}
