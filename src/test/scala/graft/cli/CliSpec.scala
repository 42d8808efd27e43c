package graft.cli

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's own CLI tests (cli.rs:90-124) plus the option
  * grammar and conflict rules.
  */
class CliSpec extends AnyFunSuite {

  test("calculate_end_slot: --num-blocks 5 from 1000 -> 1004 (cli.rs:90-106)") {
    val cfg = Config(startSlot = Some(1000L), numBlocks = Some(5L))
    assert(cfg.calculateEndSlot(1000L) == 1004L)
  }

  test("calculate_end_slot: explicit end wins; default is 10 blocks") {
    assert(Config(endSlot = Some(1234L)).calculateEndSlot(1000L) == 1234L)
    assert(Config().calculateEndSlot(1000L) == 1009L)
  }

  test("validation: start > end rejected (cli.rs:108-124)") {
    assert(Config(startSlot = Some(1000L), endSlot = Some(900L)).validate().isLeft)
    assert(Config(startSlot = Some(900L), endSlot = Some(1000L)).validate().isRight)
  }

  test("validation: zero batch size / retries rejected") {
    assert(Config(batchSize = 0).validate().isLeft)
    assert(Config(maxRetries = 0).validate().isLeft)
  }

  test("parse: full grammar with shorts and defaults") {
    val Right(cfg) = Cli.parse(Seq(
      "-s", "100", "-n", "5", "-r", "/blocks", "-d", "/tables",
      "-b", "20", "--max-retries", "5", "--retry-delay", "1",
      "-c", "--interval", "30")): @unchecked
    assert(cfg == Config(
      startSlot = Some(100L), numBlocks = Some(5L),
      rpcUrl = Some("/blocks"), databaseUrl = Some("/tables"),
      batchSize = 20, maxRetries = 5, retryDelay = 1L,
      continuous = true, interval = 30L))
    assert(Cli.parse(Nil) == Right(Config()))
  }

  test("parse: --num-blocks conflicts with --end-slot (cli.rs:22)") {
    assert(Cli.parse(Seq("-e", "100", "-n", "5")).isLeft)
  }

  test("parse: unknown option and bad number rejected") {
    assert(Cli.parse(Seq("--nope")).isLeft)
    assert(Cli.parse(Seq("-s", "abc")).isLeft)
  }
}
