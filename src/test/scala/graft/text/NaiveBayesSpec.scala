package graft.text

import org.apache.spark.sql.functions.lit

import graft.SparkTestBase

class NaiveBayesSpec extends SparkTestBase {
  import spark.implicits._

  private def train = Seq(
    (1L, "apple banana apple fruit", "fruit"),
    (2L, "banana fruit apple sweet", "fruit"),
    (3L, "engine wheel brake road", "car"),
    (4L, "road engine wheel fast", "car"))
    .toDF("doc_id", "text", "topic")

  test("classifies held-out docs to the class sharing their vocabulary") {
    val docs = Seq(
      (10L, "apple banana"),
      (11L, "engine road wheel"))
      .toDF("doc_id", "text")
    val got = NaiveBayes.classify(docs, train, classCol = "topic")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(10L -> "fruit", 11L -> "car"))
  }

  test("a doc of only unseen terms falls back to the prior (majority class), ties to first name") {
    // 3 fruit docs vs 1 car doc: prior favors fruit; unseen terms add the
    // same per-token penalty shape, differing only through N_c.
    val t = train.unionByName(
      Seq((5L, "apple apple", "fruit")).toDF("doc_id", "text", "topic"))
    val docs = Seq((10L, "zzz qqq")).toDF("doc_id", "text")
    val got = NaiveBayes.classify(docs, t, classCol = "topic").collect()
    assert(got.length == 1 && got.head.getString(1) == "fruit")
    // exact tie fixture: identical training text for two classes -> every
    // score ties -> lexicographically first class wins
    val tied = Seq((1L, "x y", "bbb"), (2L, "x y", "aaa")).toDF("doc_id", "text", "topic")
    val p = NaiveBayes.classify(docs.withColumn("text", lit("x")), tied, "topic").collect()
    assert(p.head.getString(1) == "aaa")
  }

  test("smoothing: a term seen only in one class does not zero out the other") {
    val docs = Seq((10L, "apple engine engine engine")).toDF("doc_id", "text")
    val got = NaiveBayes.classify(docs, train, classCol = "topic").collect()
    assert(got.head.getString(1) == "car") // 3 car-ish tokens beat 1 fruit token
  }

  test("NB model store round-trips bit-for-bit and refuses a stale train corpus") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((10L, "apple banana"), (11L, "engine road wheel"),
      (12L, "zz qq")).toDF("doc_id", "text")
    val direct = NaiveBayes.classify(docs, train, classCol = "topic")
      .collect().map(_.toString).sorted.toSeq
    val p = java.nio.file.Files
      .createTempDirectory("graft_nb_store_spec").toString
    NaiveBayes.writeNbModel(
      NaiveBayes.nbModel(train, classCol = "topic"), train, p,
      contentCols = Seq("text", "topic"))
    val served = NaiveBayes.classifyWith(docs,
        NaiveBayes.readNbModel(spark, train.repartition(3), p,
          contentCols = Seq("text", "topic")))
      .collect().map(_.toString).sorted.toSeq
    assert(served == direct)
    val ex = intercept[IllegalArgumentException] {
      NaiveBayes.readNbModel(spark, train.filter(col("doc_id") =!= 2L), p,
        contentCols = Seq("text", "topic"))
    }
    assert(ex.getMessage.contains("stale"), ex.getMessage)
    // r15 ADVICE (the finding this content-folding closes): labels
    // mutated under STABLE ids must also read as stale.
    val relabeled = train.withColumn("topic",
      org.apache.spark.sql.functions.lit("fruit"))
    val ex2 = intercept[IllegalArgumentException] {
      NaiveBayes.readNbModel(spark, relabeled, p,
        contentCols = Seq("text", "topic"))
    }
    assert(ex2.getMessage.contains("stale"), ex2.getMessage)
  }

  test("snapshot-guarded NB store serves without a corpus scan and refuses a changed directory") {
    // The catalog-snapshot serving shape (r17, the KN-store pattern):
    // the guard fingerprints the train directory's file listing — which
    // covers text AND labels, since any column mutation rewrites files.
    val docs = Seq((10L, "apple banana"), (11L, "engine road wheel"))
      .toDF("doc_id", "text")
    val base = java.nio.file.Files
      .createTempDirectory("graft_nb_snap_spec").toString
    val trainDir = s"$base/train"
    train.write.mode("overwrite").parquet(trainDir)
    val trainDf = spark.read.parquet(trainDir)
    val direct = NaiveBayes.classify(docs, trainDf, classCol = "topic")
      .collect().map(_.toString).sorted.toSeq
    val p = s"$base/model"
    NaiveBayes.writeNbModelSnapshot(
      NaiveBayes.nbModel(trainDf, classCol = "topic"), trainDir, p)
    val served = NaiveBayes.classifyWith(docs,
        NaiveBayes.readNbModelSnapshot(spark, trainDir, p))
      .collect().map(_.toString).sorted.toSeq
    assert(served == direct)
    // re-labeling rewrites the train files -> the listing changes -> loud
    train.withColumn("topic", org.apache.spark.sql.functions.lit("fruit"))
      .write.mode("overwrite").parquet(trainDir)
    val ex = intercept[IllegalArgumentException] {
      NaiveBayes.readNbModelSnapshot(spark, trainDir, p)
    }
    assert(ex.getMessage.contains("stale") &&
      ex.getMessage.contains("snapshot"), ex.getMessage)
  }

  test("scores are repartition-stable (fixed-point decimal sums)") {
    val docs = (0L until 200L)
      .map(i => (i, if (i % 2 == 0) s"apple banana x$i" else s"engine road x$i"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      NaiveBayes.classify(d, train, classCol = "topic")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(run(docs) == run(docs.repartition(13)))
    assert(run(docs).count(_._2 == "fruit") == 100)
  }
}
