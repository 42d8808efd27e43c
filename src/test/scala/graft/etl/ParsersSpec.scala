package graft.etl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

import graft.SparkTestBase

/** Pins the exact parsing semantics of the reference's own unit tests
  * (parsers/system.rs:58-97, parsers/token.rs:65-135; FIXTURES.md §2).
  */
class ParsersSpec extends SparkTestBase {
  import spark.implicits._

  /** Parse a single-instruction JSON into an instructions array column. */
  private def instr(json: String): DataFrame =
    Seq(s"[$json]").toDF("j")
      .select(from_json(col("j"), ArrayType(BlockSchema.instructionType)).as("instructions"))

  private def details(json: String): Row =
    instr(json).select(Parsers.transferDetails(col("instructions")).as("d")).head

  test("system transfer: (1000, FY27..., HFqU...) — system.rs:58-81") {
    val d = details("""{"parsed":{"type":"transfer","info":{"lamports":1000,
      "source":"FY27ZyvXPv7vpGJkE788JHEXo","destination":"HFqU5x63Z2bU7gRe"}},
      "program":"system","programId":"11111111111111111111111111111111"}""")
    val s = d.getStruct(0)
    assert(s.getAs[Long]("amount") == 1000L)
    assert(s.getAs[String]("token_address") == null)
    assert(s.getAs[String]("from_account") == "FY27ZyvXPv7vpGJkE788JHEXo")
    assert(s.getAs[String]("to_account") == "HFqU5x63Z2bU7gRe")
  }

  test("system non-transfer (advanceNonce) rejected — system.rs:83-97") {
    assert(details("""{"parsed":{"type":"advanceNonce","info":{
      "source":"NEzguywY"}},"program":"system"}""").isNullAt(0))
  }

  test("token transfer with string amount + mint — token.rs:65-91") {
    val d = details("""{"parsed":{"type":"transfer","info":{"amount":"1000000",
      "source":"srcAcc","destination":"dstAcc",
      "mint":"EPjFWdd5AufqSSqeM2qN1xzybapC8G4wEGGkZwyTDt1v","authority":"auth"}},
      "program":"spl-token","programId":"TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA"}""")
    val s = d.getStruct(0)
    assert(s.getAs[Long]("amount") == 1000000L)
    assert(s.getAs[String]("token_address") == "EPjFWdd5AufqSSqeM2qN1xzybapC8G4wEGGkZwyTDt1v")
  }

  test("transferChecked: amount nested in tokenAmount — token.rs:93-118") {
    val d = details("""{"parsed":{"type":"transferChecked","info":{
      "source":"srcC","destination":"dstC",
      "tokenAmount":{"amount":"5000","decimals":6}}},
      "program":"spl-token","programId":"TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA"}""")
    val s = d.getStruct(0)
    assert(s.getAs[Long]("amount") == 5000L)
    assert(s.getAs[String]("token_address") == "unknown") // mint absent -> "unknown" (token.rs:52)
  }

  test("token non-transfer (mintTo) rejected — token.rs:120-135") {
    assert(details("""{"parsed":{"type":"mintTo","info":{"amount":"99",
      "source":"s","destination":"d"}},"program":"spl-token"}""").isNullAt(0))
  }

  test("numeric (non-string) token amount accepted — token.rs:44 fallback") {
    val d = details("""{"parsed":{"type":"transfer","info":{"amount":12345,
      "source":"s","destination":"d"}},"program":"spl-token"}""")
    assert(d.getStruct(0).getAs[Long]("amount") == 12345L)
  }

  test("first-match-wins across instructions (P9, transform.rs:307-331)") {
    val two = """[{"parsed":{"type":"createAccount","info":{"lamports":1}},"program":"system"},
      {"parsed":{"type":"transfer","info":{"lamports":7,"source":"a","destination":"b"}},"program":"system"},
      {"parsed":{"type":"transfer","info":{"amount":"9","source":"x","destination":"y"}},"program":"spl-token"}]"""
    val d = Seq(two).toDF("j")
      .select(from_json(col("j"), ArrayType(BlockSchema.instructionType)).as("instructions"))
      .select(Parsers.transferDetails(col("instructions")).as("d")).head
    assert(d.getStruct(0).getAs[Long]("amount") == 7L) // the system transfer, not createAccount/token
  }

  test("staged first-transfer column equals the single-expression form") {
    // The hot path (EtlPipeline) materializes firstTransfer as a column and
    // derives the details struct from it; semantics must match the
    // one-Column transferDetails tree exactly, including the all-null case.
    val parsed = Extract.parseBlocks(graft.queries.Etl.goldenLines(spark))
    val txs = Extract.transactions(parsed)
    val single = txs.select(col("signature"),
      Parsers.transferDetails(col("instructions")).as("d"))
    val staged = txs
      .withColumn("__first", Parsers.firstTransfer(col("instructions")))
      .select(col("signature"), Parsers.transferDetailsFromFirst(col("__first")).as("d"))
    assert(single.collect().toSet == staged.collect().toSet)
    assert(single.count() == 10L)
  }
}
