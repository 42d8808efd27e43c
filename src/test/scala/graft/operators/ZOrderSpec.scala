package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("zvalue interleaves bits: known Morton codes") {
    val got = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (3, 5), (65535, 0))
      .toDF("x", "y")
      .select(ZOrder.zvalue(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    // interleave(x,y): x bits at even positions, y at odd.
    assert(got == Seq(0L, 1L, 2L, 3L, 4L, 8L, 0x27L, 0x55555555L))
  }

  test("layout shards are contiguous z-slices and deterministic") {
    val df = (0 until 64).flatMap(x => (0 until 64).map(y => (x, y))).toDF("x", "y")
    val out = ZOrder.layout(df, "x", "y", nShards = 8, bits = 6)
    val byShard = out.groupBy("zshard")
      .agg(min("zval").as("lo"), max("zval").as("hi"), count(lit(1)).as("n"))
      .orderBy("zshard")
      .as[(Int, Long, Long, Long)].collect()
    assert(byShard.map(_._1).toSeq == (0 until 8))
    // Contiguous: shard k's max < shard k+1's min; all rows covered.
    byShard.sliding(2).foreach { case Array(a, b) => assert(a._3 < b._2); case _ => }
    assert(byShard.map(_._4).sum == 64L * 64)
    val again = ZOrder.layout(df.repartition(11), "x", "y", nShards = 8, bits = 6)
      .select("x", "y", "zshard").as[(Int, Int, Int)].collect().toSet
    assert(again == out.select("x", "y", "zshard").as[(Int, Int, Int)].collect().toSet)
  }

  test("layout at bits=31: double rounding near the z-domain top stays in range") {
    // zval = 2^62-1 rounds UP to 2^62 as a double, which uncl(amped) maps
    // to shard == nShards; the least() clamp pins it into the last shard.
    val top = (1L << 31) - 1
    val df = Seq((top, top), (0L, 0L)).toDF("x", "y")
    val shards = ZOrder.layout(df, "x", "y", nShards = 8, bits = 31)
      .select("zshard").as[Int].collect().toSet
    assert(shards == Set(0, 7))
  }

  test("z-layout prunes shards for BOTH dimensions; x-sort only prunes x") {
    // 64x64 grid, 16 shards. A y-selective filter hits few z-shards but
    // EVERY x-sorted shard — the footer-stats pruning benefit in miniature.
    val df = (0 until 64).flatMap(x => (0 until 64).map(y => (x, y))).toDF("x", "y")
    def shardsHit(laidOut: org.apache.spark.sql.DataFrame, cond: org.apache.spark.sql.Column): Long =
      laidOut.groupBy("zshard")
        .agg(min("x").as("xlo"), max("x").as("xhi"), min("y").as("ylo"), max("y").as("yhi"))
        // a shard must be read iff the filter range intersects its min/max envelope
        .filter(cond).count()
    val z = ZOrder.layout(df, "x", "y", nShards = 16, bits = 6)
    val zHitY = shardsHit(z, col("ylo") <= 3 && col("yhi") >= 0)
    val zHitX = shardsHit(z, col("xlo") <= 3 && col("xhi") >= 0)
    // x-sorted layout with the same shard count: shard = x range slice.
    val xSorted = df.withColumn("zshard", floor(col("x") / lit(4)).cast("int"))
    val xHitY = shardsHit(xSorted, col("ylo") <= 3 && col("yhi") >= 0)
    assert(zHitY < 16, s"z-layout should prune some shards for a y-box, hit $zHitY/16")
    assert(zHitX < 16, s"z-layout should prune some shards for an x-box, hit $zHitX/16")
    assert(xHitY == 16, "an x-sorted layout cannot prune a y-selective scan")
  }
}
