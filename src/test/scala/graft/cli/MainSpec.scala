package graft.cli

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** End-to-end CLI run over a file-backed slot directory. */
class MainSpec extends SparkTestBase {

  private def blockJson(slot: Long): String =
    s"""{"slot":$slot,"blockhash":"hash$slot","parentSlot":${slot - 1},""" +
      s""""blockTime":${1700000000L + slot},"blockHeight":$slot,"transactions":[{""" +
      s""""meta":{"err":null,"fee":5000},"transaction":{"signatures":["sig_$slot"],""" +
      s""""message":{"accountKeys":[{"pubkey":"A","signer":true,"writable":true}],"instructions":[]}}}]}"""

  test("batch run lands the requested range, continuous off") {
    val src = Files.createTempDirectory("cli-src").toString
    val out = Files.createTempDirectory("cli-out").toString
    (100L to 150L).foreach(s =>
      Files.writeString(Paths.get(src, s"$s.json"), blockJson(s)))

    val Right(cfg) = Cli.parse(Seq("-s", "105", "-n", "10", "-b", "4")): @unchecked
    Main.run(spark, cfg, src, out)

    val slots = spark.read.parquet(s"$out/blocks")
      .select("slot").collect().map(_.getLong(0)).sorted
    // start 105, num-blocks 10 -> exactly [105, 114]; tip 150, finality moot.
    assert(slots.toSeq == (105L to 114L))
    assert(spark.read.parquet(s"$out/transactions").count() == 10L)
  }

  test("explicit --end-slot past the finality horizon is honored, not clamped") {
    val src = Files.createTempDirectory("cli-src2").toString
    val out = Files.createTempDirectory("cli-out2").toString
    (100L to 150L).foreach(s =>
      Files.writeString(Paths.get(src, s"$s.json"), blockJson(s)))

    // tip=150, horizon=130; an explicit end of 140 must land [135, 140]
    // (main.rs:94-98 never clamps explicit ranges — warn only).
    val Right(cfg) = Cli.parse(Seq("-s", "135", "-e", "140")): @unchecked
    Main.run(spark, cfg, src, out)
    val slots = spark.read.parquet(s"$out/blocks")
      .select("slot").collect().map(_.getLong(0)).sorted
    assert(slots.toSeq == (135L to 140L))
  }

  test("default range (no -e/-n) ends at tip - finality lag") {
    val src = Files.createTempDirectory("cli-src3").toString
    val out = Files.createTempDirectory("cli-out3").toString
    (100L to 150L).foreach(s =>
      Files.writeString(Paths.get(src, s"$s.json"), blockJson(s)))

    // tip=150: default start = tip-30 = 120, default end = tip-20 = 130.
    val Right(cfg) = Cli.parse(Nil): @unchecked
    Main.run(spark, cfg, src, out)
    val slots = spark.read.parquet(s"$out/blocks")
      .select("slot").collect().map(_.getLong(0)).sorted
    assert(slots.toSeq == (120L to 130L))
  }
}
