package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ClassifySpec extends SparkTestBase {
  import spark.implicits._

  val SYS = Classify.SystemProgram
  val TOK = Classify.TokenProgram
  val JUP = "JUP6LkbZbjS1jKKwapdHNy74zcZ3tLUZoi5QNyVTaV4"
  val META = "metaqbxxUerdq28cj1RbAWkYQm3ybzjb6a8bt518x1s"
  val MEMO = "MemoSq4gqABAXKb96qnH8TysNcWxMyWCqXgDLGmfcHr"
  val CB = "ComputeBudget111111111111111111111111111111"

  private def classify(ids: Seq[String]*): Seq[String] =
    ids.toSeq.toDF("program_ids")
      .select(Classify.transactionType(col("program_ids")))
      .collect().map(_.getString(0)).toSeq

  private def classifyLegacy(ids: Seq[String]*): Seq[String] =
    ids.toSeq.toDF("program_ids")
      .select(Classify.transactionTypeLegacy(col("program_ids")))
      .collect().map(_.getString(0)).toSeq

  test("priority order matches transform.rs:82-114 exactly (C1)") {
    assert(classify(
      Seq(JUP),             // DEX alone
      Seq(META, JUP),       // DEX beats NFT
      Seq(META, TOK),       // NFT beats Token
      Seq(TOK, SYS),        // Token beats System
      Seq(SYS),             // lone System -> SOL
      Seq(SYS, MEMO),       // System + other -> interaction
      Seq("NoSuchProgram")  // -> Unknown
    ) == Seq("DEX Swap", "DEX Swap", "NFT Mint", "SPL Token Transfer",
      "SOL Transfer", "Program Interaction", "Unknown"))
  }

  test("quirk parity: lone ComputeBudget (type System) classifies as SOL Transfer") {
    assert(classify(Seq(CB)) == Seq("SOL Transfer"))
  }

  test("quirk parity: NFT always -> NFT Mint, never NFT Transfer (transform.rs:90)") {
    assert(classify(Seq(META), Seq("M2mx93ekt1fmXSVkTrUL9xVFHkmME8HTUi5Cyc5aF7K"))
      == Seq("NFT Mint", "NFT Mint"))
  }

  test("legacy hard-coded classifier agrees on its 10 known programs (C2)") {
    val cases = Seq(Seq(JUP), Seq(META), Seq(TOK, SYS), Seq(SYS), Seq(SYS, MEMO), Seq("X"))
    assert(classifyLegacy(cases: _*) == classify(cases: _*))
  }

  test("legacy classifier: Memo is unknown to the hard-coded list") {
    // registry knows Memo (Utility -> falls through to Unknown too) but a
    // lone unknown id is Unknown under both classifiers
    assert(classifyLegacy(Seq(MEMO)) == Seq("Unknown"))
  }

  test("label synthesis: type + known names in first-seen order (C3)") {
    val got = Seq(
      (Seq(JUP, TOK), "DEX Swap"),
      (Seq("NoSuch"), "Unknown"),
      (Seq(SYS), "SOL Transfer"))
      .toDF("program_ids", "t")
      .select(Classify.label(col("t"), col("program_ids")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "DEX Swap (Jupiter Aggregator v6, Token Program)",
      "Unknown",
      "SOL Transfer (System Program)"))
  }

  test("join-based classifier matches the map-literal classifier (scale path)") {
    val txs = Seq(
      ("s1", Seq(JUP, TOK)),
      ("s2", Seq(META)),
      ("s3", Seq(SYS)),
      ("s4", Seq(SYS, MEMO)),
      ("s5", Seq("NoSuch"))).toDF("signature", "program_ids")
    val viaJoin = Classify.viaJoin(txs, ProgramRegistry.df(spark))
      .select("signature", "transaction_type", "transaction_label")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    val viaMap = txs
      .withColumn("t", Classify.transactionType(col("program_ids")))
      .withColumn("l", Classify.label(col("t"), col("program_ids")))
      .collect().map(r => r.getAs[String]("signature") ->
        ((r.getAs[String]("t"), r.getAs[String]("l")))).toMap
    assert(viaJoin == viaMap)
  }
}
