package graft.etl

import java.sql.DriverManager

import org.apache.spark.sql.Row

import graft.SparkTestBase

/** JdbcMergeSink executed for real against embedded Derby (the MERGE
  * dialect) — the reference's load semantics (src/etl/load.rs:239-279) as
  * running code, not string assertions: blocks + transactions round-trip,
  * last-write-wins on conflict, and re-delivering a batch leaves the table
  * identical (the streaming pipeline's idempotent-replay contract).
  */
class DerbyMergeSinkSpec extends SparkTestBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftmerge;create=true"

  private def withStatement[A](f: java.sql.Statement => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn.createStatement())
    finally conn.close()
  }

  private def tableRows(sql: String): Seq[Seq[Any]] =
    withStatement { st =>
      val rs = st.executeQuery(sql)
      val n = rs.getMetaData.getColumnCount
      val buf = Seq.newBuilder[Seq[Any]]
      while (rs.next()) buf += (1 to n).map(rs.getObject)
      buf.result()
    }

  private def sink = new JdbcMergeSink(url, new java.util.Properties, jdbcBatchSize = 2)

  test("blocks round-trip with last-write-wins and idempotent re-delivery") {
    withStatement(_.executeUpdate(
      """CREATE TABLE blocks (
        |  slot BIGINT PRIMARY KEY,
        |  blockhash VARCHAR(88),
        |  parent_slot BIGINT,
        |  block_height BIGINT)""".stripMargin))

    val batch1 = Seq(
      (100L, "hash100", 99L, 50L),
      (101L, "hash101", 100L, 51L),
      (102L, "hash102", 101L, 52L))
      .toDF("slot", "blockhash", "parent_slot", "block_height")
    sink.merge(batch1, "blocks", Seq("slot"))

    // Overlapping re-fetch: 101 re-delivered with a fork's new hash, 103
    // brand new — the reference's range-rescan scenario.
    val batch2 = Seq(
      (101L, "hash101-fork", 100L, 51L),
      (103L, "hash103", 102L, 53L))
      .toDF("slot", "blockhash", "parent_slot", "block_height")
    sink.merge(batch2, "blocks", Seq("slot"))

    val want = Seq(
      Seq[Any](100L, "hash100", 99L, 50L),
      Seq[Any](101L, "hash101-fork", 100L, 51L),
      Seq[Any](102L, "hash102", 101L, 52L),
      Seq[Any](103L, "hash103", 102L, 53L))
    val got = tableRows("SELECT slot, blockhash, parent_slot, block_height FROM blocks ORDER BY slot")
    assert(got === want)

    // Idempotency: replaying batch2 (checkpoint recovery re-delivers the
    // whole micro-batch) must change nothing.
    sink.merge(batch2, "blocks", Seq("slot"))
    assert(tableRows(
      "SELECT slot, blockhash, parent_slot, block_height FROM blocks ORDER BY slot") === want)
  }

  test("transactions round-trip nulls, booleans, and a multi-partition batch") {
    withStatement(_.executeUpdate(
      """CREATE TABLE transactions (
        |  signature VARCHAR(88) PRIMARY KEY,
        |  block_slot BIGINT,
        |  transaction_index INTEGER,
        |  success BOOLEAN,
        |  fee BIGINT,
        |  transaction_type VARCHAR(50))""".stripMargin))

    val batch = Seq(
      ("sigA", 100L, 0, true, 5000L, Option("SOL Transfer")),
      ("sigB", 100L, 1, false, 5000L, Option.empty[String]),
      ("sigC", 101L, 0, true, 7000L, Option("Unknown")),
      ("sigD", 101L, 1, true, 9000L, Option("DEX Swap")))
      .toDF("signature", "block_slot", "transaction_index", "success", "fee", "transaction_type")
      .repartition(3) // several executors-worth of per-partition connections
    sink.merge(batch, "transactions", Seq("signature"))

    val got = tableRows(
      "SELECT signature, block_slot, transaction_index, success, fee, transaction_type " +
        "FROM transactions ORDER BY signature")
    assert(got === Seq(
      Seq[Any]("sigA", 100L, 0, true, 5000L, "SOL Transfer"),
      Seq[Any]("sigB", 100L, 1, false, 5000L, null),
      Seq[Any]("sigC", 101L, 0, true, 7000L, "Unknown"),
      Seq[Any]("sigD", 101L, 1, true, 9000L, "DEX Swap")))

    // LWW update flips success and type for one signature; others untouched.
    sink.merge(
      Seq(("sigB", 100L, 1, true, 5000L, Option("SPL Token Transfer")))
        .toDF("signature", "block_slot", "transaction_index", "success", "fee", "transaction_type"),
      "transactions", Seq("signature"))
    assert(tableRows("SELECT success, transaction_type FROM transactions WHERE signature = 'sigB'") ===
      Seq(Seq[Any](true, "SPL Token Transfer")))
    assert(tableRows("SELECT count(*) FROM transactions").head.head.toString.toInt === 4)
  }

  test("derbyMerge parameter layout binds keys, updates, then the full insert row") {
    val df = Seq((1L, "x", true)).toDF("k", "v", "b")
    val up = MergeSink.derbyMerge("t", df.schema, Seq("k"))
    assert(up.paramColumns === Seq("k", "v", "b", "k", "v", "b"))
    assert(up.sql.contains("MERGE INTO t t USING SYSIBM.SYSDUMMY1"))
    assert(up.sql.contains("WHEN MATCHED THEN UPDATE SET v = CAST(? AS VARCHAR(32672)), b = CAST(? AS BOOLEAN)"))
    assert(up.sql.contains("WHEN NOT MATCHED THEN INSERT (k, v, b)"))
    // All-key schema: no UPDATE branch (nothing to set), insert-only merge.
    val allKeys = MergeSink.derbyMerge("t", df.select("k").schema, Seq("k"))
    assert(!allKeys.sql.contains("WHEN MATCHED"))
  }

  test("non-scalar schemas are refused before any connection opens") {
    val df = Seq((1L, Seq("a", "b"))).toDF("k", "arr")
    val e = intercept[IllegalArgumentException](sink.merge(df, "t", Seq("k")))
    assert(e.getMessage.contains("arr"))
  }
}
