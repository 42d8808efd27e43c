package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Transaction classification (SURVEY §2.4): the reference's priority-ordered
  * decision tree over the set of program IDs a transaction touches, as one
  * CASE WHEN expression. Order is load-bearing and matches
  * transform.rs:82-114 exactly:
  *
  *   1. any DEX      -> "DEX Swap"
  *   2. any NFT      -> "NFT Mint"   (never NftTransfer — transform.rs:90)
  *   3. any Token    -> "SPL Token Transfer"  (the nested system check at
  *                      :96-99 is redundant: both branches return the same)
  *   4. exactly one program and it is System -> "SOL Transfer"
  *   5. any System   -> "Program Interaction"
  *   6. otherwise    -> "Unknown"
  *
  * Display strings from models.rs:58-68.
  */
object Classify {

  val TypeSolTransfer = "SOL Transfer"
  val TypeSplTokenTransfer = "SPL Token Transfer"
  val TypeNftMint = "NFT Mint"
  val TypeNftTransfer = "NFT Transfer" // unreachable by classification, kept for parity
  val TypeDexSwap = "DEX Swap"
  val TypeProgramInteraction = "Program Interaction"
  val TypeUnknown = "Unknown"

  // Hard-coded fallback constants (transform.rs:65-79) for the legacy
  // classifier used when no registry is available (extract.rs:257-261).
  val SystemProgram = "11111111111111111111111111111111"
  val TokenProgram = "TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA"
  val Token2022Program = "TokenzQdBNbLqP5VEhdkAS6EPFLC1PHnBqCXEpPxuEb"
  val legacyDex: Seq[String] = Seq(
    "JUP6LkbZbjS1jKKwapdHNy74zcZ3tLUZoi5QNyVTaV4",
    "whirLbMiicVdio4qvUfM5KAg6Ct8VwpYzGff3uctyCc",
    "675kPX9MHTjS2zt1qfr1NYHuzeLXfQM9H24wFSUt1Mp8",
    "CAMMCzo5YL8w4VFF8KVHrK22GGUsp5VTaW7grrKgrWqK")
  val legacyNft: Seq[String] = Seq(
    "metaqbxxUerdq28cj1RbAWkYQm3ybzjb6a8bt518x1s",
    "M2mx93ekt1fmXSVkTrUL9xVFHkmME8HTUi5Cyc5aF7K")

  /** C1 — registry-driven classifier as a pure expression over the
    * program_ids array column. `typeOf` resolves id -> program_type (null
    * for unknown ids, so comparisons fall through like the reference's
    * `unwrap_or(false)`).
    */
  def transactionType(
      programIds: Column,
      typeOf: Column => Column = id => element_at(ProgramRegistry.typeMap, id)): Column = {
    def anyOfType(t: String): Column = exists(programIds, id => typeOf(id) === t)
    when(anyOfType("DEX"), TypeDexSwap)
      .when(anyOfType("NFT"), TypeNftMint)
      .when(anyOfType("Token"), TypeSplTokenTransfer)
      .when(size(programIds) === 1 && typeOf(get(programIds, lit(0))) === "System", TypeSolTransfer)
      .when(anyOfType("System"), TypeProgramInteraction)
      .otherwise(TypeUnknown)
  }

  /** C2 — legacy hard-coded classifier (transform.rs:117-156). */
  def transactionTypeLegacy(programIds: Column): Column = {
    def anyIn(ids: Seq[String]): Column =
      exists(programIds, id => id.isin(ids.map(x => lit(x)): _*))
    when(anyIn(legacyDex), TypeDexSwap)
      .when(anyIn(legacyNft), TypeNftMint)
      .when(anyIn(Seq(TokenProgram, Token2022Program)), TypeSplTokenTransfer)
      .when(size(programIds) === 1 && get(programIds, lit(0)) === SystemProgram, TypeSolTransfer)
      .when(array_contains(programIds, SystemProgram), TypeProgramInteraction)
      .otherwise(TypeUnknown)
  }

  /** C3 — label synthesis (transform.rs:160-182 / 269-283):
    * `"{type} ({name1, name2, ...})"` joining the registry names of the
    * known programs in first-seen order; bare type when none are known.
    */
  def label(
      txType: Column,
      programIds: Column,
      nameOf: Column => Column = id => element_at(ProgramRegistry.nameMap, id)): Column = {
    val names = filter(transform(programIds, nameOf), _.isNotNull)
    concat(
      txType,
      when(size(names) > 0, concat(lit(" ("), array_join(names, ", "), lit(")")))
        .otherwise(lit("")))
  }

  /** Scale path for a large registry: explode program_ids, broadcast-join the
    * dimension, re-aggregate the matched types/names back per transaction,
    * then apply the same priority tree (SURVEY §2.3 J1). Adds one shuffle on
    * `signature`; prefer the map-literal form while the registry is small.
    */
  def viaJoin(txs: DataFrame, registry: DataFrame): DataFrame = {
    val exploded = txs
      .select(col("signature").as("sig"), posexplode(col("program_ids")).as(Seq("pos", "program_id")))
      .join(broadcast(registry), Seq("program_id"), "left")
      .groupBy(col("sig"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("pos"), col("program_type")))),
          e => e.getField("program_type")).as("ptypes"),
        filter(
          transform(
            array_sort(collect_list(struct(col("pos"), col("program_name")))),
            e => e.getField("program_name")),
          _.isNotNull).as("pnames"))
    val matched = txs.join(exploded, txs("signature") === exploded("sig"), "left").drop("sig")
    val ptype = {
      def anyOfType(t: String): Column = exists(col("ptypes"), x => x === t)
      when(anyOfType("DEX"), TypeDexSwap)
        .when(anyOfType("NFT"), TypeNftMint)
        .when(anyOfType("Token"), TypeSplTokenTransfer)
        .when(size(col("program_ids")) === 1 && get(col("ptypes"), lit(0)) === "System", TypeSolTransfer)
        .when(anyOfType("System"), TypeProgramInteraction)
        .otherwise(TypeUnknown)
    }
    matched
      .withColumn("transaction_type", ptype)
      .withColumn(
        "transaction_label",
        concat(
          col("transaction_type"),
          when(size(col("pnames")) > 0, concat(lit(" ("), array_join(col("pnames"), ", "), lit(")")))
            .otherwise(lit(""))))
      .drop("ptypes", "pnames")
  }
}
