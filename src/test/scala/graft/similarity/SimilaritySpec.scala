package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("cosine of a vector with itself is ~1, dot is symmetric") {
    val r = emb.limit(5)
      .select(
        Similarity.cosine(col("embedding"), col("embedding")).as("self"),
        (Similarity.dot(col("embedding"), col("embedding")) -
          Similarity.dot(col("embedding"), col("embedding"))).as("zero"))
      .collect()
    r.foreach { row =>
      assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
      assert(row.getDouble(1) == 0.0)
    }
  }

  test("native codegen dot product is bit-identical to the HOF formulation") {
    import spark.implicits._
    val both = emb.as("x").crossJoin(emb.limit(3).as("y"))
      .select(
        Similarity.dot(col("x.embedding"), col("y.embedding")).as("native"),
        Similarity.dotHof(col("x.embedding"), col("y.embedding")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // double planes x float vectors (mixed element types) also agree
    val planes = Similarity.randomPlanes(2, 64)
    val mixed = emb.select(
      Similarity.dot(col("embedding"), typedLit(planes.head.toArray)).as("native"),
      Similarity.dotHof(col("embedding"), typedLit(planes.head.toArray)).as("hof"))
    assert(mixed.filter(col("native") =!= col("hof")).count() == 0)
    // null array -> null, not a crash
    val nullRow = Seq((Some(Array(1.0f, 2.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("d")).head
    assert(nullRow.isNullAt(0))
    // mismatched lengths -> null on BOTH forms (zip_with null-pads the
    // shorter side; null propagates through the sum), so the documented
    // dot/dotHof equivalence holds off the happy path too.
    val mismatch = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)))
      .toDF("a", "b")
      .select(
        Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotHof(col("a"), col("b")).as("hof"))
      .head
    assert(mismatch.isNullAt(0) && mismatch.isNullAt(1))
  }

  test("aggregate top-k equals the row_number window formulation it replaced") {
    import org.apache.spark.sql.expressions.Window
    // The window form is the spec; the shipped CollectTopK aggregation must
    // reproduce it row-for-row (rank, neighbor, bit-identical cosine).
    val queries = emb.limit(7)
    val k = 4
    val agg = Similarity.bruteForceTopK(queries, emb, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("q_vec"),
      Similarity.norm(col("embedding")).as("q_norm"))
    val c = emb.select(
      col("vec_id").as("neighbor_id"), col("embedding").as("c_vec"),
      Similarity.norm(col("embedding")).as("c_norm"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    val windowed = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        Similarity.dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(agg == windowed)
    assert(agg.size == 7 * k)
  }

  test("brute-force top-k: k rows per query, ranks dense, self excluded") {
    val out = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 4), emb, k = 5).cache()
    assert(out.count() == 4 * 5)
    assert(out.filter(col("query_id") === col("neighbor_id")).count() == 0)
    val ranks = out.filter(col("query_id") === 0).select("rank")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ranks == Seq(1L, 2L, 3L, 4L, 5L))
    // ranks ordered by descending cosine
    val cos = out.filter(col("query_id") === 0).orderBy("rank")
      .select("cosine").collect().map(_.getDouble(0))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
  }

  test("an injected exact copy is always the top-1 neighbor") {
    val copy = emb.filter(col("vec_id") === 7)
      .withColumn("vec_id", lit(9999999L))
    val out = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") === 7), emb.unionByName(copy), k = 1)
    val top = out.head
    assert(top.getAs[Long]("neighbor_id") == 9999999L)
    assert(top.getAs[Double]("cosine") > 0.999999)
  }

  test("LSH buckets: deterministic, identical vectors share a bucket") {
    val planes = Similarity.randomPlanes(8, 64)
    val b1 = emb.select(Similarity.lshBucket(col("embedding"), planes).as("b"))
      .collect().map(_.getInt(0))
    val b2 = emb.select(Similarity.lshBucket(col("embedding"), planes).as("b"))
      .collect().map(_.getInt(0))
    assert(b1.toSeq == b2.toSeq)
    assert(b1.toSet.size > 1) // actually partitions the space
  }

  test("LSH top-k achieves nonzero recall against brute force with fewer comparisons") {
    val planes = Similarity.randomPlanes(4, 64)
    val queries = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(queries, emb, planes, k = 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall > 0.0, s"recall=$recall")
    info(f"LSH recall@5 = $recall%.2f (4 planes, 16 buckets)")
  }

  test("multi-probe LSH recall >= single-probe recall, never exceeds brute force") {
    val planes = Similarity.randomPlanes(4, 64)
    val queries = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val single = recallOf(Similarity.lshTopK(queries, emb, planes, k = 5))
    val multi = recallOf(Similarity.lshTopKMultiProbe(queries, emb, planes, k = 5))
    assert(multi >= single, s"multi=$multi < single=$single")
    assert(multi <= 1.0 + 1e-9)
    // rank structure intact: <= k dense ranks per query
    val mp = Similarity.lshTopKMultiProbe(queries, emb, planes, k = 5)
      .groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("maxr"))
      .collect()
    mp.foreach(r => assert(r.getLong(1) <= 5 && r.getLong(2) == r.getLong(1)))
    info(f"LSH recall@5: single=$single%.2f multi-probe=$multi%.2f (4 planes)")
  }

  test("recallAtK: exact vs itself = 1.0; exhaustive-probe IVF = 1.0; multiprobe >= lsh") {
    val planes = Similarity.randomPlanes(4, 64)
    val queries = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
    def mean(df: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(df, exact, k = 5)
        .agg(avg(col("recall"))).head.getDouble(0)
    assert(math.abs(mean(exact) - 1.0) < 1e-12)
    val full = Similarity.ivfTopK(queries, emb, nCentroids = 8, nProbe = 8, k = 5)
    assert(math.abs(mean(full) - 1.0) < 1e-12)
    val lsh = mean(Similarity.lshTopK(queries, emb, planes, k = 5))
    val multi = mean(Similarity.lshTopKMultiProbe(queries, emb, planes, k = 5))
    assert(multi >= lsh - 1e-12 && multi <= 1.0 + 1e-12)
    // per-query rows: one recall per query, all in [0,1]
    val per = Similarity.recallAtK(
      Similarity.lshTopK(queries, emb, planes, k = 5), exact, k = 5).collect()
    assert(per.length == queries.count())
    per.foreach(r => assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("IVF with full probe degrades to exact brute force") {
    val queries = emb.filter(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Similarity.ivfTopK(queries, emb, nCentroids = 8, nProbe = 8, k = 5)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == exact) // probing every cell = scanning the whole corpus
  }

  test("IVF partial probe: deterministic, with measurable recall") {
    val queries = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val run = () => Similarity.ivfTopK(queries, emb, nCentroids = 8, nProbe = 3, k = 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = run(); val b = run()
    assert(a == b) // sampled centroids + hash order => reproducible
    val recall = exact.intersect(a).size.toDouble / exact.size
    assert(recall > 0.3, s"recall=$recall")
    info(f"IVF recall@5 = $recall%.2f (8 cells, probe 3)")
  }

  test("IVF assignment covers every vector exactly once") {
    val centroids = Similarity.ivfCentroids(emb, nCentroids = 8)
    assert(centroids.count() == 8)
    val assigned = Similarity.ivfAssign(emb, centroids)
    assert(assigned.count() == emb.count())
    assert(assigned.select("id").distinct().count() == emb.count())
    assert(assigned.select("centroid_id").distinct().count() > 1)
  }

  test("nearDupPairs finds injected duplicates via bucket-local join only") {
    val copies = emb.filter(col("vec_id") % 25 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    val planes = Similarity.randomPlanes(8, 64)
    val pairs = Similarity.nearDupPairs(
      emb.select("vec_id", "embedding").unionByName(copies.select("vec_id", "embedding")),
      planes, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val injected = emb.filter(col("vec_id") % 25 === 0)
      .select("vec_id").collect().map(_.getLong(0)).map(id => (id, id + 1000000L)).toSet
    assert(pairs == injected)
  }

  test("nearDupPairs hot-bucket cap drops exactly the over-populated buckets") {
    // Plant a hot bucket: 40 extra copies of one vector (identical vectors
    // always share a bucket) — the pathological shape whose self-join the
    // cap must bound.
    val hot = emb.filter(col("vec_id") === 0)
    val hotCopies = (1 to 40)
      .map(i => hot.withColumn("vec_id", lit(2000000L + i)))
      .reduce(_ unionByName _)
    val corpus = emb.select("vec_id", "embedding")
      .unionByName(hotCopies.select("vec_id", "embedding"))
    val planes = Similarity.randomPlanes(8, 64)
    val cap = 20
    val pairsOf = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairsOf(Similarity.nearDupPairs(corpus, planes, 0.999))
    val capped = pairsOf(Similarity.nearDupPairs(corpus, planes, 0.999, maxBucket = Some(cap)))
    // Exact expected semantics: pairs whose (shared) bucket is over the cap
    // vanish, everything else survives untouched.
    val bucketOf = corpus
      .select(col("vec_id"), Similarity.lshBucket(col("embedding"), planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val overCap = bucketOf.values.groupBy(identity).collect {
      case (b, xs) if xs.size > cap => b
    }.toSet
    val expected = uncapped.filterNot { case (a, _) => overCap(bucketOf(a)) }
    assert(overCap.nonEmpty)              // the planted bucket really is hot
    assert(capped == expected)
    assert(capped.subsetOf(uncapped))
  }

  test("kmeans recovers two separable direction clusters and is rerun-deterministic") {
    import spark.implicits._
    // 30 vectors near +x, 30 near +y (small orthogonal jitter keeps each
    // cluster strictly closer in cosine to its own axis).
    val vecs = ((0 until 30).map(i => (i.toLong, Array(10.0f, (i % 5).toFloat, 0f, 0f))) ++
      (30 until 60).map(i => (i.toLong, Array((i % 5).toFloat, 10.0f, 0f, 0f))))
      .toDF("vec_id", "embedding")
    val init = Seq(
      (0, Array(1.0, 0.0, 0.0, 0.0)),
      (1, Array(0.0, 1.0, 0.0, 0.0))).toDF("centroid_id", "centroid_vec")
    val trained = Similarity.kmeansIterate(vecs, init, iters = 3)
    val got = trained.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    // Cell 0's mean must point dominantly +x, cell 1's +y.
    assert(got(0)(0) > 5.0 && got(0)(1) < 3.0)
    assert(got(1)(1) > 5.0 && got(1)(0) < 3.0)
    // Exact per-dimension means of the cluster members.
    assert(got(0)(0) === 10.0 && got(0)(1) === 2.0)
    assert(got(1)(1) === 10.0 && got(1)(0) === 2.0)
    // Rerun at different parallelism: identical output (integer sums are
    // order-exact, ties broken deterministically).
    val again = Similarity.kmeansIterate(vecs.repartition(7), init, iters = 3)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(again === got)
  }

  test("kmeans keeps an empty cell's previous centroid instead of dropping it") {
    import spark.implicits._
    val vecs = (0 until 10).map(i => (i.toLong, Array(10.0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val init = Seq(
      (0, Array(1.0, 0.0, 0.0, 0.0)),
      (1, Array(0.0, 0.0, 0.0, 1.0))) // nothing will choose this cell
      .toDF("centroid_id", "centroid_vec")
    val trained = Similarity.kmeansIterate(vecs, init, iters = 2)
    val got = trained.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(got.keySet === Set(0, 1)) // k stays k
    assert(got(0) === Seq(10.0, 0.0, 0.0, 0.0))
    assert(got(1) === Seq(0.0, 0.0, 0.0, 1.0)) // survived untouched
  }

  test("pq: exact reconstruction — corpus at centroid combos matches brute force") {
    import spark.implicits._
    val cb = Seq(
      (0, 0, Array(1.0, 0.0)), (0, 1, Array(0.0, 1.0)),
      (1, 0, Array(1.0, 0.0)), (1, 1, Array(0.0, 1.0)))
      .toDF("subspace", "code", "centroid_vec")
    // Every vector is an exact concatenation of one centroid per
    // subspace, so quantization loses nothing and ADC must reproduce the
    // exact cosines (integer dots are association-exact; the norm product
    // uses the same doubles in both paths).
    val vecs = Seq(
      (1L, Array(1.0f, 0f, 1f, 0f)),
      (2L, Array(1.0f, 0f, 0f, 1f)),
      (3L, Array(0.0f, 1f, 1f, 0f)),
      (4L, Array(0.0f, 1f, 0f, 1f))).toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val pq = rows(Similarity.pqTopKEncoded(vecs, Similarity.pqEncode(vecs, cb), cb, k = 2))
    val brute = rows(Similarity.bruteForceTopK(vecs, vecs, k = 2))
    assert(pq === brute)
  }

  test("pq encoding is deterministic and repartition-stable") {
    import spark.implicits._
    val cb = Seq(
      (0, 0, Array(2.0, 0.0)), (0, 1, Array(1.0, 1.0)),
      (1, 0, Array(0.0, -1.0)), (1, 1, Array(2.0, 0.0)))
      .toDF("subspace", "code", "centroid_vec")
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array((i % 3).toFloat, (i % 5).toFloat, (i % 7).toFloat, 1.0f)))
      .toDF("vec_id", "embedding")
    def enc(df: org.apache.spark.sql.DataFrame) =
      Similarity.pqEncode(df, cb).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc(vecs) === enc(vecs.repartition(7)))
  }

  test("pq end-to-end returns k rows per query without self-matches") {
    val queries = emb.filter(col("vec_id") < 5)
    val out = Similarity.pqTopK(queries, emb, m = 4, ksub = 16, k = 5, trainIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 25)
    assert(out.groupBy(_._1).forall { case (_, rs) => rs.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L) })
    assert(out.forall { case (q, _, n) => q != n })
  }

  test("ivf-pq: lossless residual codebook + full probe equals brute force") {
    import spark.implicits._
    // One coarse cell, and a residual codebook that contains every residual
    // subvector exactly — quantization loses nothing, so
    // approx dot = q·c + q·(v−c) = q·v and IVF-PQ must reproduce brute
    // force bit-for-bit.
    val coarse = Seq((0, Array(1.0, 1.0, 1.0, 1.0))).toDF("centroid_id", "centroid_vec")
    val cb = Seq(
      (0, 0, Array(0.0, -1.0)), (0, 1, Array(-1.0, 0.0)),
      (1, 0, Array(0.0, -1.0)), (1, 1, Array(-1.0, 0.0)))
      .toDF("subspace", "code", "centroid_vec")
    val vecs = Seq(
      (1L, Array(1.0f, 0f, 1f, 0f)),
      (2L, Array(1.0f, 0f, 0f, 1f)),
      (3L, Array(0.0f, 1f, 1f, 0f)),
      (4L, Array(0.0f, 1f, 0f, 1f))).toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val ivfpq = rows(Similarity.ivfPqTopKWith(vecs, vecs, coarse, cb, nProbe = 1, k = 2))
    val brute = rows(Similarity.bruteForceTopK(vecs, vecs, k = 2))
    assert(ivfpq === brute)
  }

  test("ivf-pq end-to-end: k dense ranks per query, no self, deterministic, nonzero recall") {
    val queries = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val run = () => Similarity.ivfPqTopK(queries, emb,
      nCells = 8, nProbe = 3, m = 4, ksub = 16, k = 5, trainIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val a = run()
    assert(a.length == 8 * 5)
    assert(a.groupBy(_._1).forall { case (_, rs) => rs.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L) })
    assert(a.forall { case (q, _, n) => q != n })
    assert(a.toSet === run().toSet) // trained twice => identical (deterministic Lloyd)
    val recall = exact.intersect(a.map(t => (t._1, t._3)).toSet).size.toDouble / exact.size
    assert(recall > 0.0, s"recall=$recall")
    info(f"IVF-PQ recall@5 = $recall%.2f (8 cells, probe 3, m=4 ksub=16)")
  }

  test("serving split: train+store+serve is bit-identical to the end-to-end IVF-PQ path") {
    // r14 verdict #4 — the t44b contract on the vector stack: training
    // is deterministic, so serving from the stored (centroids, codebook,
    // index) artifacts must reproduce ivfPqTopK exactly, cosines
    // included, with a plan that contains no corpus pass.
    val queries = emb.filter(col("vec_id") < 8)
    val endToEnd = Similarity.ivfPqTopK(queries, emb,
      nCells = 8, nProbe = 3, m = 4, ksub = 16, k = 5, trainIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val (cent, cb, idx) = Similarity.ivfPqTrain(
      emb, nCells = 8, m = 4, ksub = 16, trainIters = 2)
    val p = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_spec").toString
    // The library store (r17 — the e10c face's inline logic lifted to
    // writeIvfPq/readIvfPq): fingerprint-guarded, cell-partitioned.
    Similarity.writeIvfPq(cent, cb, idx, emb, p)
    val (rc, rcb, ridx) = Similarity.readIvfPq(spark, emb, p)
    val served = Similarity.ivfPqTopKServe(queries, rc, rcb, ridx,
        nProbe = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(served === endToEnd)
    // a mutated corpus fails the guard
    val ex = intercept[IllegalArgumentException] {
      Similarity.readIvfPq(spark, emb.filter(col("vec_id") =!= 1L), p)
    }
    assert(ex.getMessage.contains("stale"), ex.getMessage)
    // the snapshot-guarded twin serves identically off a path-backed corpus
    val base = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_snap_spec").toString
    val corpusDir = s"$base/corpus"
    emb.write.mode("overwrite").parquet(corpusDir)
    val p2 = s"$base/index"
    Similarity.writeIvfPqSnapshot(cent, cb, idx, corpusDir, p2)
    val (sc, scb, sidx) = Similarity.readIvfPqSnapshot(spark, corpusDir, p2)
    val servedSnap = Similarity.ivfPqTopKServe(queries, sc, scb, sidx,
        nProbe = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(servedSnap === endToEnd)
  }

  test("trained IVF stays a valid top-k: full probe still equals brute force") {
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(queries, emb, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val trained = Similarity.ivfTopK(queries, emb,
      nCentroids = 8, nProbe = 8, k = 3, trainIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(trained === brute)
  }

  test("refine with full probe + full shortlist equals brute force (incl. exact cosines)") {
    val queries = emb.filter(col("vec_id") < 5)
    val n = emb.count().toInt
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // Shortlist = the ENTIRE corpus (full probe, k = |corpus|): the refine
    // stage then re-scores everything exactly, so the lossy ADC ordering
    // is irrelevant and the result must be brute force bit-for-bit.
    val shortlist = Similarity.ivfPqTopK(queries, emb,
      nCells = 8, nProbe = 8, m = 4, ksub = 16, k = n, trainIters = 2)
    val refined = rows(Similarity.refineTopK(shortlist, queries, emb, k = 3))
    val brute = rows(Similarity.bruteForceTopK(queries, emb, k = 3))
    assert(refined === brute)
  }

  test("refineTopK scores ONLY the listed candidates, with exact cosines") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(2.0f, 0f, 0f, 0f)),
      (2L, Array(1.0f, 1f, 1f, 1f)),
      (3L, Array(2.0f, 2f, 1f, 0f)),
      (4L, Array(1.0f, 1f, -1f, -1f))).toDF("vec_id", "embedding")
    val cand = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("query_id", "neighbor_id")
    val got = Similarity.refineTopK(cand, vecs, vecs, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // Query 1 ranks exactly its two listed candidates (doc 4, unlisted,
    // never scored); query 2 only doc 3. Cosines are the exact values:
    // cos(1,3)=4/(2*3), cos(1,2)=2/(2*2), cos(2,3)=5/(2*3).
    assert(got.toSet === Set(
      (1L, 1L, 3L, 4.0 / 6.0),
      (1L, 2L, 2L, 0.5),
      (2L, 1L, 3L, 5.0 / 6.0)))
  }

  test("filteredTopK == brute force over each label's own sub-corpus (pre-filter, never underfills)") {
    val queries = emb.filter(col("vec_id") < 6)
    val got = Similarity.filteredTopK(queries, emb, k = 3, filterCols = Seq("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = queries.select("vec_id", "label").collect().flatMap { qr =>
      val (qid, lbl) = (qr.getLong(0), qr.getInt(1))
      Similarity.bruteForceTopK(
        emb.filter(col("vec_id") === qid),
        emb.filter(col("label") === lbl), k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }.toSet
    assert(got == want)
    // every result row's neighbor shares the query's label by construction
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.forall { case (q, _, n) => labels(q) == labels(n) })
  }

  test("semDedup drops the higher id of an injected exact semantic dup, keeps the rest") {
    import spark.implicits._
    val dupped = emb.unionByName(
      emb.filter(col("vec_id") === 3).select(
        (col("vec_id") + 1000L).as("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x * lit(2.0f)).as("embedding"),
        col("label")))
    val rep = Similarity.semDedup(dupped, nClusters = 8, trainIters = 1, tau = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(rep.size == emb.count() + 1)
    assert(rep(3L) == ((1L, true)), s"original survives: ${rep(3L)}")
    assert(rep(1003L) == ((1L, false)), s"copy dropped: ${rep(1003L)}")
  }

  test("semDedup at tau=-1 collapses every cluster to exactly one survivor") {
    val rep = Similarity.semDedup(emb.filter(col("vec_id") < 64),
      nClusters = 4, trainIters = 1, tau = -1.0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(3)))
    val byCluster = rep.groupBy(_._2)
    assert(byCluster.values.forall(_.count(_._3) == 1),
      "every cluster must keep exactly one")
    // ... and the survivor is the cluster's minimum id (greedy min-id rule)
    assert(byCluster.values.forall(g => g.filter(_._3).head._1 == g.map(_._1).min))
  }

  test("semDedup report covers every input; disjoint vectors all survive") {
    val rep = Similarity.semDedup(emb.filter(col("vec_id") < 32),
      nClusters = 4, trainIters = 1, tau = 0.999999)
      .collect()
    assert(rep.length == 32)
    assert(rep.forall(_.getBoolean(3)), "random embeddings share no dup at ~1.0 tau")
    assert(rep.forall(_.getLong(2) == 0L))
  }

  // ----------------------------------------------------------------- MMR

  test("mmr: dense sel_ranks, distinct picks, all drawn from the shortlist") {
    val queries = emb.filter(col("vec_id") < 3)
    val out = Similarity.mmrRerank(queries, emb, kShortlist = 6, kSelect = 4,
      lambdaRel = 0.75).collect()
    val short = Similarity.bruteForceTopK(queries, emb, k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size == 3)
    byQ.values.foreach { g =>
      assert(g.map(_.getLong(1)).sorted.sameElements(Array(1L, 2L, 3L, 4L)))
      assert(g.map(_.getLong(2)).distinct.length == 4, "no repeated picks")
    }
    assert(out.forall(r => short((r.getLong(0), r.getLong(2)))),
      "every pick comes from the retrieval shortlist")
  }

  test("mmr: first pick is the plain top-1; lambda=1 reduces to top-k order") {
    val queries = emb.filter(col("vec_id") < 3)
    val plain = Similarity.bruteForceTopK(queries, emb, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val diversified = Similarity.mmrRerank(queries, emb,
      kShortlist = 6, kSelect = 4, lambdaRel = 0.75).collect()
    diversified.filter(_.getLong(1) == 1L).foreach { r =>
      assert(r.getLong(2) == plain((r.getLong(0), 1L)), "first pick = top-1")
    }
    // lambda = 1.0: the penalty term vanishes, so greedy selection replays
    // the retrieval order exactly, scores equal to relevance.
    val degenerate = Similarity.mmrRerank(queries, emb,
      kShortlist = 6, kSelect = 4, lambdaRel = 1.0).collect()
    degenerate.foreach { r =>
      assert(r.getLong(2) == plain((r.getLong(0), r.getLong(1))))
      assert(r.getDouble(4) == r.getDouble(3), "score = 1.0*rel - 0.0*maxsim")
    }
  }

  test("mmr diversifies: a near-exact dup of the first pick is skipped") {
    import spark.implicits._
    val q = Seq((100L, Seq(1.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      10L -> Seq(0.95f, 1.0f, 0.0f, 0.0f),
      11L -> Seq(0.9500002f, 1.0000001f, 0.0f, 0.0f), // near-exact dup of 10
      12L -> Seq(0.0f, 0.0f, 1.0f, 0.0f) // orthogonal to both
    ).toDF("vec_id", "embedding")
    val plain = Similarity.bruteForceTopK(q, corpus, k = 2)
      .collect().map(_.getLong(2)).toSeq
    assert(plain == Seq(11L, 10L), "plain top-2 returns the dup pair")
    // At lambda=0.5 the dup's penalty (sim ~1 to pick #1) exceeds its
    // relevance, while the orthogonal candidate's penalty is exactly 0.
    val mmr = Similarity.mmrRerank(q, corpus, kShortlist = 3, kSelect = 2,
      lambdaRel = 0.5).collect().map(_.getLong(2)).toSeq
    assert(mmr == Seq(11L, 12L), s"mmr skips the near-dup: $mmr")
  }

  // ------------------------------------------------------- hard negatives

  test("hardNegatives returns only cross-label neighbors, k per query, ranked") {
    val out = Similarity.hardNegatives(emb.filter(col("vec_id") < 4), emb, k = 3)
      .collect()
    assert(out.length == 4 * 3)
    out.foreach { r =>
      assert(r.getInt(4) != r.getInt(5), "q_label must differ from neg_label")
    }
    val byQ = out.groupBy(_.getLong(0))
    byQ.values.foreach { g =>
      assert(g.map(_.getLong(1)).sorted.sameElements(Array(1L, 2L, 3L)))
      // ranks follow cosine desc
      val sorted = g.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("hardNegatives: the hardest negative dominates same-label dups") {
    import spark.implicits._
    // Query label 0; corpus holds an EXACT copy with the same label (must
    // never appear) and a near-copy with a different label (must be #1).
    val q = Seq((100L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0), // same label: excluded
      (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f), 1), // hardest negative
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(q, corpus, k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(1L -> 2L, 2L -> 3L), s"got ${out.toSeq}")
  }

  // ----------------------------------- semantic decontamination (c22 core)

  test("semanticDecontaminate drops every train row within tau of the eval set") {
    import spark.implicits._
    val train = Seq(
      1L -> Seq(1.0f, 0.0f, 0.0f, 0.0f), // == eval vector: cosine 1
      2L -> Seq(0.0f, 1.0f, 0.0f, 0.0f), // orthogonal: cosine 0
      3L -> Seq(2.0f, 0.0f, 0.0f, 0.0f) // same DIRECTION as eval: cosine 1
    ).toDF("vec_id", "embedding")
    val evalSet = Seq(Tuple1(Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("embedding")
    val rep = Similarity.semanticDecontaminate(train, evalSet, tau = 0.95)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(rep(1L) == ((1L, 1.0, false)), s"exact copy dropped: ${rep(1L)}")
    assert(rep(2L) == ((0L, 0.0, true)), s"orthogonal kept: ${rep(2L)}")
    assert(rep(3L)._1 == 1L && !rep(3L)._3, "scaled copy dropped (cosine 1)")
  }

  test("semanticDecontaminate: zero-norm vectors are never hits on either side") {
    import spark.implicits._
    val train = Seq(
      1L -> Seq(0.0f, 0.0f), // zero-norm train row: all sims NaN -> null
      2L -> Seq(1.0f, 0.0f)
    ).toDF("vec_id", "embedding")
    val evalSet = Seq(
      Tuple1(Seq(0.0f, 0.0f)), // zero-norm eval row: contributes no sims
      Tuple1(Seq(1.0f, 0.0f))
    ).toDF("embedding")
    val rep = Similarity.semanticDecontaminate(train, evalSet, tau = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)), r.getBoolean(3)))).toMap
    assert(rep(1L) == ((0L, None, true)), s"zero-norm train row: ${rep(1L)}")
    assert(rep(2L) == ((1L, Some(1.0), false)),
      s"real row still screened against the real eval vector: ${rep(2L)}")
  }

  test("sq8: codes stay in [0,255]; corpus min/max rows hit the band edges") {
    val stats = Similarity.sq8Stats(emb)
    val codes = Similarity.sq8Encode(emb, stats)
      .select(explode(col("codes")).as("c"))
    assert(codes.filter(col("c") < 0 || col("c") > 255).count() == 0)
    // some dimension's minimum encodes to 0 and some maximum to 255
    val bounds = codes.agg(min("c"), max("c")).head()
    assert(bounds.getLong(0) == 0L && bounds.getLong(1) == 255L)
  }

  test("sq8: constant dimensions decode exactly; reconstruction error is bounded") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.0f, 1.0f, 5.0f, 2.0f)),
      (2L, Array(0.0f, 3.0f, 5.0f, 6.0f)),
      (3L, Array(0.0f, 2.0f, 5.0f, 4.0f))).toDF("vec_id", "embedding")
    val stats = Similarity.sq8Stats(vecs)
    val dec = Similarity.sq8Decode(Similarity.sq8Encode(vecs, stats), stats)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    // dims 0 and 2 are constant across the corpus -> exact round trip
    dec.foreach { case (_, v) =>
      assert(v(0) == 0.0 && v(2) == 5.0, s"constant dims must be exact: $v")
    }
    // varying dims reconstruct within one quantization step (range/255)
    val orig = Map(1L -> Seq(0.0, 1.0, 5.0, 2.0), 2L -> Seq(0.0, 3.0, 5.0, 6.0),
      3L -> Seq(0.0, 2.0, 5.0, 4.0))
    dec.foreach { case (id, v) =>
      v.zip(orig(id)).zipWithIndex.foreach { case ((got, want), i) =>
        val step = if (i == 1) 2.0 / 255 else if (i == 3) 4.0 / 255 else 0.0
        assert(math.abs(got - want) <= step + 1e-12,
          s"vec $id dim $i: $got vs $want (step $step)")
      }
    }
  }

  test("sq8 top-k closely tracks the exact brute-force ranking") {
    val qs = emb.filter(col("vec_id") < 4)
    def ranks(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = ranks(Similarity.bruteForceTopK(qs, emb, k = 5)
      .select("query_id", "rank", "neighbor_id"))
    val sq = ranks(Similarity.sq8TopK(qs, emb, k = 5)
      .select("query_id", "rank", "neighbor_id"))
    // recall@5 >= 80% on the tiny sf0.001 corpus (SQ8 is near-exact)
    val hits = exact.count { case (k, v) => sq.get(k).contains(v) ||
      sq.exists { case ((q2, _), n2) => q2 == k._1 && n2 == v } }
    assert(hits >= (exact.size * 4) / 5, s"recall too low: $hits/${exact.size}")
  }

  test("signPack packs known sign patterns into the expected words") {
    import spark.implicits._
    // dims 0,2 positive in word0; dim 33 positive in word1
    val v = Array.fill(64)(-1.0f)
    v(0) = 1.0f; v(2) = 1.0f; v(33) = 1.0f
    val packed = Similarity.signPack(Seq((7L, v)).toDF("vec_id", "embedding"), dim = 64)
      .head()
    assert(packed.getLong(1) == (1L | (1L << 2)), s"w0: ${packed.getLong(1)}")
    assert(packed.getLong(2) == (1L << 1), s"w1: ${packed.getLong(2)}")
    // zeros are NOT positive: all-zero vector packs to (0, 0)
    val zero = Similarity.signPack(
      Seq((1L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding"), dim = 64).head()
    assert(zero.getLong(1) == 0L && zero.getLong(2) == 0L)
  }

  test("hammingTopK: distances count exactly the flipped signs; ties break by id") {
    import spark.implicits._
    def vec(flips: Int*) = {
      val v = Array.fill(64)(1.0f); flips.foreach(i => v(i) = -1.0f); v
    }
    val df = Seq(
      (0L, vec()), (1L, vec(5)), (2L, vec(5, 40)), (3L, vec(1, 2, 3))
    ).toDF("vec_id", "embedding")
    val got = Similarity.hammingTopK(df.filter(col("vec_id") === 0), df, k = 3, dim = 64)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 1L), (2L, 2L), (3L, 3L)), s"got $got")
  }

  test("hammingRefinedTopK with a full shortlist equals exact brute force") {
    val qs = emb.filter(col("vec_id") < 4)
    val n = emb.count().toInt
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val exact = rows(Similarity.bruteForceTopK(qs, emb, k = 5))
    val refined = rows(Similarity.hammingRefinedTopK(qs, emb,
      k = 5, kShortlist = n, dim = 64))
    assert(refined == exact)
  }

  test("matryoshka: a full shortlist or a full prefix recovers exact brute force") {
    val qs = emb.filter(col("vec_id") < 4)
    val n = emb.count().toInt
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val exact = rows(Similarity.bruteForceTopK(qs, emb, k = 5))
    // shortlist = whole corpus -> the rerank IS brute force
    assert(rows(Similarity.prefixRefinedTopK(qs, emb,
      k = 5, kShortlist = n, prefixDim = 16)) == exact)
    // prefix = full dim -> the coarse stage already ranks exactly
    assert(rows(Similarity.prefixRefinedTopK(qs, emb,
      k = 5, kShortlist = 5, prefixDim = 64)) == exact)
  }

  test("matryoshka recall is high when information is front-loaded (the MRL premise)") {
    import spark.implicits._
    // an MRL-trained embedding concentrates signal in the prefix; fake
    // that by damping dims 16.. to 5% — on UNtrained random vectors the
    // prefix is just 25% of the signal and shortlist recall is ~40%,
    // which is exactly why this index assumes an MRL encoder.
    val rows = emb.limit(100).collect().map { r =>
      val v = r.getSeq[Float](1).toArray
      (r.getLong(0), v.zipWithIndex.map { case (x, i) =>
        if (i < 16) x else x * 0.05f })
    }.toSeq
    val mrlEmb = rows.toDF("vec_id", "embedding")
    val qs = mrlEmb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(qs, mrlEmb, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mrl = Similarity.prefixRefinedTopK(qs, mrlEmb, k = 5, kShortlist = 20,
        prefixDim = 16)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = exact.count(mrl.contains)
    assert(hits >= (exact.size * 4) / 5,
      s"recall too low for a 20-wide shortlist on front-loaded vectors: $hits/${exact.size}")
  }

  test("contrastive triplets: hardest pos/neg per anchor; singleton labels emit none") {
    import spark.implicits._
    // label A: three colinear-ish vectors; label B: one opposite; label C: singleton
    def v(a: Double, b: Double) = Array(a.toFloat, b.toFloat, 0f, 0f)
    val vecs = Seq(
      (1L, v(1, 0), 0), (2L, v(1, 0.1), 0), (3L, v(0.9, 0.2), 0),
      (4L, v(1, 0.05), 1), // label B sits closest to the A cluster
      (5L, v(-1, 0), 2) // singleton label C
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.contrastiveTriplets(vecs, vecs)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4), r.getDouble(3),
        r.getDouble(6), r.getDouble(7))).toMap
    // anchor 1: hardest positive is 2 (closest same-label), hardest
    // negative is 4 (the near-miss cross-label, NOT the far-away 5)
    assert(got(1L)._1 == 2L && got(1L)._2 == 4L, s"got $got")
    // singleton label 5 has no positive -> no triplet row
    assert(!got.contains(5L), s"singleton label must emit no triplet: $got")
    // margin is exactly the difference of the two cosines
    got.values.foreach { case (_, _, pc, nc, m) => assert(m == pc - nc) }
    // every triplet's negative label differs from the anchor label
    val labels = Similarity.contrastiveTriplets(vecs, vecs)
      .select("label", "neg_label").collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    labels.foreach { case (l, nl) => assert(l != nl) }
  }

  test("hamming family is repartition-stable") {
    val qs = emb.filter(col("vec_id") < 3)
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.hammingTopK(qs, c, k = 4, dim = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(run(emb) == run(emb.repartition(7)))
  }

  test("sq8TopK is repartition-stable") {
    val qs = emb.filter(col("vec_id") < 3)
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.sq8TopK(qs, c, k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(run(emb) == run(emb.repartition(7)))
  }

  test("knnGraph: an exact duplicate vector is always its twin's top-1") {
    // A duplicate shares ALL sign bands, so banding can never miss it,
    // and cosine 1.0 ranks first.
    val dup = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 5000).as("vec_id"), col("embedding"), col("label"))
    val g = Similarity.knnGraph(emb.unionByName(dup), k = 3, dim = 64)
    val top1 = g.filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(top1(0L) == 5000L)
    assert(top1(5000L) == 0L)
  }

  test("knnGraph: symmetric candidate set, no self-edges, repartition-stable") {
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.knnGraph(c, k = 2, dim = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val rows = run(emb)
    assert(rows.forall { case (q, _, n, _) => q != n })
    // rank-1 neighbors of rank-1 neighbors exist as queries too (both
    // directions of every candidate pair were scored).
    val queries = rows.map(_._1).toSet
    assert(rows.map(_._3).toSet.subsetOf(queries))
    assert(run(emb.repartition(7)) == rows)
  }
}
