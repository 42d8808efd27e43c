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
}
