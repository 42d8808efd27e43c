package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-program instruction parsers (SURVEY §2.4 C4/C5, §2.2 P7-P9) as
  * expression builders — the Spark-idiomatic version of the reference's
  * parser registry (src/etl/parsers/mod.rs): adding a program = adding a
  * `Column`-producing function here, keeping everything inside codegen.
  *
  * Semantics pinned by the reference's own unit tests (FIXTURES.md §2):
  *  - system transfer (parsers/system.rs:14-52): parsed.type == "transfer",
  *    requires lamports + source + destination;
  *  - token transfer (parsers/token.rs:16-59): parsed.type in
  *    ("transfer","transferChecked"), amount from info.amount (string or
  *    number) else info.tokenAmount.amount, mint defaults "unknown";
  *  - first-match-wins scan over instructions, system checked before token
  *    per instruction (transform.rs:307-331).
  *
  * Divergence (documented intent, SURVEY §7): the reference only attempts
  * detail extraction on instructions carrying a `program` *name* field
  * (transform.rs:311); we accept the jsonParsed `programId` too.
  */
object Parsers {

  private def info(i: Column): Column = i.getField("parsed").getField("info")

  /** P7 — is this instruction a parseable System transfer? */
  def isSystemTransfer(i: Column): Column =
    (i.getField("program") === "system" ||
      i.getField("programId") === Classify.SystemProgram) &&
      i.getField("parsed").getField("type") === "transfer" &&
      info(i).getField("lamports").isNotNull &&
      info(i).getField("source").isNotNull &&
      info(i).getField("destination").isNotNull

  /** C5 amount — string-or-numeric coalescing per parsers/token.rs:37-45.
    * The schema reads `info.amount` as string either way; the cast handles
    * both encodings. A non-numeric string casts to null and the predicate
    * below rejects the instruction, mirroring `parse::<u64>().ok()?`.
    */
  def tokenAmount(i: Column): Column =
    coalesce(
      info(i).getField("amount").cast("long"),
      info(i).getField("tokenAmount").getField("amount").cast("long"))

  /** P8 — is this instruction a parseable SPL-token transfer? */
  def isTokenTransfer(i: Column): Column =
    (i.getField("program") === "spl-token" ||
      i.getField("programId").isin(Classify.TokenProgram, Classify.Token2022Program)) &&
      i.getField("parsed").getField("type").isin("transfer", "transferChecked") &&
      tokenAmount(i).isNotNull &&
      info(i).getField("source").isNotNull &&
      info(i).getField("destination").isNotNull

  /** P9 — first transfer-shaped instruction (system or token), or null. */
  def firstTransfer(instructions: Column): Column =
    get(filter(instructions, i => isSystemTransfer(i) || isTokenTransfer(i)), lit(0))

  /** C4+C5+P9 — transfer detail struct
    * (amount, token_address, from_account, to_account), all null when the
    * transaction has no parseable transfer. token_address is null for SOL
    * transfers and "unknown" for token transfers without a mint
    * (parsers/token.rs:52).
    *
    * PERF: `firstTransfer` appears ~6 times in this tree (null check, amount
    * branches, mint, source, destination) and Catalyst re-evaluates the
    * array filter per reference — the expression-staging pitfall. Callers on
    * a hot path should materialize `firstTransfer` as a real column once and
    * derive the struct from it via [[transferDetailsFromFirst]] (what
    * EtlPipeline does); this single-Column form is kept for contexts where
    * staging a column isn't possible and as the equivalence baseline.
    */
  def transferDetails(instructions: Column): Column =
    transferDetailsFromFirst(firstTransfer(instructions))

  /** [[transferDetails]] over an already-materialized first-transfer column:
    * evaluates the instruction-array scan once per row instead of ~6 times.
    */
  def transferDetailsFromFirst(first: Column): Column = {
    val isSys = isSystemTransfer(first)
    val amount = when(isSys, info(first).getField("lamports")).otherwise(tokenAmount(first))
    val mint = when(isSys, lit(null).cast("string"))
      .otherwise(coalesce(info(first).getField("mint"), lit("unknown")))
    when(first.isNotNull,
      struct(
        amount.as("amount"),
        mint.as("token_address"),
        info(first).getField("source").as("from_account"),
        info(first).getField("destination").as("to_account")))
      .otherwise(lit(null))
  }
}
