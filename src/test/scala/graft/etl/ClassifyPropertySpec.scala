package graft.etl

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** SURVEY §5 property tests: classification priority order and upsert
  * idempotency over generated inputs. Cases are generated with ScalaCheck
  * (fixed seed: reproducible), then evaluated in ONE Spark job against a
  * row-by-row Scala oracle that transcribes transform.rs:82-114 literally.
  */
class ClassifyPropertySpec extends SparkTestBase {

  private val registry: Map[String, String] = ProgramRegistry.seed.map(p => p._1 -> p._3).toMap
  private val idPool: Seq[String] = ProgramRegistry.seed.map(_._1) ++
    Seq("UnknownAaaa", "UnknownBbbb", "UnknownCccc")

  /** Literal transcription of classify_transaction_with_registry. */
  private def oracle(ids: Seq[String]): String = {
    def any(t: String) = ids.exists(id => registry.get(id).contains(t))
    if (any("DEX")) Classify.TypeDexSwap
    else if (any("NFT")) Classify.TypeNftMint
    else if (any("Token")) Classify.TypeSplTokenTransfer
    else if (ids.length == 1 && registry.get(ids.head).contains("System")) Classify.TypeSolTransfer
    else if (any("System")) Classify.TypeProgramInteraction
    else Classify.TypeUnknown
  }

  private def cases(n: Int, seed: Long): Seq[Seq[String]] = {
    val gen = Gen.chooseNum(0, 6).flatMap(k => Gen.listOfN(k, Gen.oneOf(idPool)))
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(seed + i)))
      .map(_.distinct) // program_ids are deduped upstream (P4)
  }

  test("classification priority order matches the reference on 500 generated id-sets (C1)") {
    import spark.implicits._
    val input = cases(500, seed = 7L)
    val got = input.toDF("program_ids")
      .withColumn("t", Classify.transactionType(col("program_ids")))
      .select("t").collect().map(_.getString(0)).toSeq
    val want = input.map(oracle)
    got.zip(want).zip(input).foreach { case ((g, w), ids) =>
      assert(g == w, s"ids=$ids: spark=$g oracle=$w")
    }
  }

  test("expression classifier and join classifier agree everywhere (C1 vs J1)") {
    import spark.implicits._
    val input = cases(300, seed = 21L)
    val txs = input.zipWithIndex.map { case (ids, i) => (s"sig$i", ids) }
      .toDF("signature", "program_ids")
    val viaExpr = txs.withColumn("t", Classify.transactionType(col("program_ids")))
      .select("signature", "t").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val viaJoin = Classify.viaJoin(txs, ProgramRegistry.df(spark))
      .select("signature", "transaction_type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaExpr == viaJoin)
  }

  test("upsert is idempotent and last-write-wins on generated batches (S6/S7)") {
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n, for {
        k <- Gen.chooseNum(0L, 9L)
        v <- Gen.chooseNum(0L, 5L)
        p <- Gen.alphaStr.map(_.take(4))
      } yield (k, v, p))
    } yield rows
    val batches = (0 until 5).flatMap(i => gen.apply(Gen.Parameters.default, Seed(100L + i)))

    batches.foreach { rows =>
      val incoming = rows.toDF("slot", "__v", "payload")
      val existing = incoming.limit(0)
      val once = Load.upsert(existing, incoming, Seq("slot"), "__v")
      val twice = Load.upsert(once, incoming, Seq("slot"), "__v")
      val onceRows = once.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val twiceRows = twice.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // one survivor per key, carrying the max version
      val wantKeys = rows.map(_._1).toSet
      assert(once.select("slot").distinct().count() == wantKeys.size.toLong)
      onceRows.foreach { case (k, v) =>
        assert(v == rows.filter(_._1 == k).map(_._2).max, s"key $k kept version $v")
      }
      assert(onceRows == twiceRows) // re-applying the same batch changes nothing
    }
  }
}
