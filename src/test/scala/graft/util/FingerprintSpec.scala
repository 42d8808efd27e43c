package graft.util

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the r16 fingerprint contract (r15 ADVICE #1/#2 + verdict #4):
  * content-sensitive, duplicate-sensitive, partitioning-invariant, and
  * memo-bounded at serve time.
  */
class FingerprintSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon zeta"))
    .toDF("doc_id", "text")

  test("partitioning cannot move the fingerprint") {
    val a = Fingerprint.of(corpus, "doc_id", Seq("text"))
    val b = Fingerprint.of(corpus.repartition(7), "doc_id", Seq("text"))
    val c = Fingerprint.of(corpus.coalesce(1), "doc_id", Seq("text"))
    assert(a == b && b == c)
  }

  test("content mutated under STABLE ids changes the fingerprint (r15 ADVICE medium)") {
    val a = Fingerprint.of(corpus, "doc_id", Seq("text"))
    val mutated = corpus.withColumn("text",
      when(col("doc_id") === 2L, lit("MUTATED")).otherwise(col("text")))
    assert(Fingerprint.of(mutated, "doc_id", Seq("text")) != a)
    // id-set and count identical in both — only the content differs
    assert(Fingerprint.of(mutated, "doc_id", Seq("text"))._1 == a._1)
  }

  test("duplicate-bearing corpora do not cancel: {a,b,b} != {a,c,c} (r15 ADVICE low)") {
    // Under the old XOR aggregate these collide (pairwise cancellation);
    // the wraparound SUM keeps each occurrence in the total.
    val abb = Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("doc_id", "text")
    val acc = Seq((1L, "a"), (3L, "c"), (3L, "c")).toDF("doc_id", "text")
    assert(Fingerprint.of(abb, "doc_id", Seq("text"))
      != Fingerprint.of(acc, "doc_id", Seq("text")))
    // and a duplicated row is not a no-op vs the deduplicated corpus
    val ab = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(Fingerprint.of(abb, "doc_id", Seq("text"))
      != Fingerprint.of(ab, "doc_id", Seq("text")))
  }

  test("requireMatch: loud on mismatch, memo skips the re-scan, rewrite invalidates the memo") {
    val p = java.nio.file.Files
      .createTempDirectory("graft_fp_spec").toString + "/fingerprint"
    Fingerprint.write(spark, p, Fingerprint.of(corpus, "doc_id", Seq("text")))

    // default (memo = false): verifies every call, loud on a mutation
    Fingerprint.requireMatch(spark, p, corpus, "doc_id", Seq("text"), "spec")
    val ex = intercept[IllegalArgumentException] {
      Fingerprint.requireMatch(spark, p,
        corpus.filter(col("doc_id") =!= 1L), "doc_id", Seq("text"), "spec")
    }
    assert(ex.getMessage.contains("stale"))

    // memo = true: first read verifies (and would be loud)...
    Fingerprint.requireMatch(spark, p, corpus, "doc_id", Seq("text"),
      "spec", memo = true)
    // ...second read SKIPS the corpus re-scan entirely (r15 verdict #4):
    // this corpus explodes if scanned, so passing proves the skip.
    val exploding = spark.range(3).select(
      expr("CAST(raise_error('corpus must not be re-scanned') AS BIGINT)")
        .as("doc_id"), lit("x").as("text"))
    Fingerprint.requireMatch(spark, p, exploding, "doc_id", Seq("text"),
      "spec", memo = true)

    // re-training rewrites the stored fingerprint -> memo misses -> the
    // guard re-verifies in full (and is loud against the old corpus)
    val grown = corpus.unionByName(Seq((9L, "eta")).toDF("doc_id", "text"))
    Fingerprint.write(spark, p, Fingerprint.of(grown, "doc_id", Seq("text")))
    val ex2 = intercept[IllegalArgumentException] {
      Fingerprint.requireMatch(spark, p, corpus, "doc_id", Seq("text"),
        "spec", memo = true)
    }
    assert(ex2.getMessage.contains("stale"))
    // and verifies green against the corpus it was rebuilt on
    Fingerprint.requireMatch(spark, p, grown, "doc_id", Seq("text"),
      "spec", memo = true)
  }

  test("a pre-v2 (id_hash era) stored fingerprint fails with the re-train message") {
    // r16 ADVICE: the v1 -> v2 rename (id_hash/XOR -> row_hash/SUM)
    // must not turn an externally-persisted legacy artifact into an
    // opaque field-not-found — any schema the reader does not share is
    // by definition stale, and the failure must carry the standard
    // re-train guidance.
    val p = java.nio.file.Files
      .createTempDirectory("graft_fp_legacy").toString + "/fingerprint"
    Seq((3L, 12345L)).toDF("n_rows", "id_hash")
      .coalesce(1).write.mode("overwrite").parquet(p)
    val ex = intercept[IllegalArgumentException] {
      Fingerprint.requireMatch(spark, p, corpus, "doc_id", Seq("text"), "spec")
    }
    assert(ex.getMessage.contains("stale") &&
      ex.getMessage.contains("re-train and re-persist") &&
      ex.getMessage.contains("id_hash"), ex.getMessage)
  }

  test("snapshot fingerprint: stable across re-listing, loud on file changes, blind to markers") {
    // The catalog-snapshot guard (r17): fingerprints the corpus
    // directory's FILE LISTING — no data scan — so a serve job pays a
    // metadata round-trip instead of a corpus pass.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fp_snap").toString + "/corpus"
    corpus.repartition(2).write.mode("overwrite").parquet(dir)
    val a = Fingerprint.ofSnapshot(spark, dir)
    assert(a == Fingerprint.ofSnapshot(spark, dir), "re-listing must be stable")
    assert(a._1 == 2L, s"two data files expected (got ${a._1}) - " +
      "_SUCCESS and .crc markers must not count")

    val fpPath = dir + "_fp"
    Fingerprint.write(spark, fpPath, a)
    Fingerprint.requireSnapshotMatch(spark, fpPath, dir, "spec")

    // a Spark-invisible marker file must not flag the corpus stale
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_marker"), "x".getBytes)
    Fingerprint.requireSnapshotMatch(spark, fpPath, dir, "spec")

    // ... and neither must a NORMALLY-NAMED file under a hidden
    // DIRECTORY (r18 verdict #4): Spark ignores any path with a
    // `_`/`.`-prefixed segment, so a `_temporary/` tree left by an
    // interrupted write contains files Spark never reads — the guard
    // must agree with "files Spark would read identically".
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "_temporary"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_temporary", "part-0.parquet"),
      "not even parquet".getBytes)
    assert(Fingerprint.ofSnapshot(spark, dir) == a,
      "hidden-directory subtree must not move the snapshot fingerprint")
    Fingerprint.requireSnapshotMatch(spark, fpPath, dir, "spec")

    // ... but an `_`-prefixed PARTITION directory (`=` in the segment,
    // e.g. `partitionBy("_bucket")` output) IS read by Spark
    // (HadoopFSUtils exempts `_*=*` names), so files under it MUST
    // count — excluding them would freeze a partitioned corpus's
    // fingerprint and serve stale artifacts forever (false-FRESH, the
    // unsafe direction).
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "_bucket=3"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_bucket=3", "part-0.parquet"),
      "partition data".getBytes)
    assert(Fingerprint.ofSnapshot(spark, dir) != a,
      "partition-dir (`_name=value/`) files must move the fingerprint")
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(dir, "_bucket=3", "part-0.parquet"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "_bucket=3"))
    assert(Fingerprint.ofSnapshot(spark, dir) == a)

    // `._COPYING_` (HDFS in-flight copy) is excluded on EVERY path
    // segment, not just the basename (r19 ADVICE #2):
    // HadoopFSUtils.shouldFilterOutPathName filters each component, so a
    // normally-named file under a `*._COPYING_` DIRECTORY is invisible
    // to Spark and must not move the fingerprint either.
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-9.parquet._COPYING_"),
      "in-flight".getBytes)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "staging._COPYING_"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "staging._COPYING_", "part-0.parquet"),
      "in-flight tree".getBytes)
    assert(Fingerprint.ofSnapshot(spark, dir) == a,
      "._COPYING_ files and subtrees must not move the snapshot fingerprint")
    Fingerprint.requireSnapshotMatch(spark, fpPath, dir, "spec")

    // rewriting the corpus (even with identical rows) changes the
    // listing -> loud, with the standard re-train guidance
    corpus.repartition(2).write.mode("overwrite").parquet(dir)
    val ex = intercept[IllegalArgumentException] {
      Fingerprint.requireSnapshotMatch(spark, fpPath, dir, "spec")
    }
    assert(ex.getMessage.contains("stale") &&
      ex.getMessage.contains("re-train and re-persist"), ex.getMessage)
  }

  test("driver-side listing hash == Spark's xxhash64 expression (r18 no-job ofSnapshot)") {
    // ofSnapshot's per-entry hash is computed with XXH64 primitives on
    // the driver — zero Spark job. Its value contract is "identical to
    // running Fingerprint.of over a (file, bytes, mtime) DataFrame of
    // the listing"; this pins the two computations to each other so
    // they can never drift (a drift would silently invalidate every
    // stored snapshot fingerprint).
    val entries = Seq(
      ("part-00000.parquet", 12345L, 1700000000123L),
      ("sub/part-00001.parquet", 0L, 0L),
      ("weird name é中.parquet", Long.MaxValue, -7L))
    val viaDf = entries.toDF("file", "bytes", "mtime")
      .select(xxhash64(col("file"), col("bytes"), col("mtime")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val viaDriver = entries.map { case (f, b, m) =>
      Fingerprint.hashFileEntry(f, b, m) }
    assert(viaDf == viaDriver, s"$viaDf != $viaDriver")
    // and the wrapping Long sum equals the decimal-sum low-64 contract
    val sumDf = entries.toDF("file", "bytes", "mtime")
    assert(Fingerprint.of(sumDf, "file", Seq("bytes", "mtime"))._2 ==
      viaDriver.sum, "wrapping Long sum must equal the decimal-sum low 64 bits")
  }

  test("array content columns fingerprint (the ANN-index shape)") {
    val emb = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val a = Fingerprint.of(emb, "vec_id", Seq("embedding"))
    val moved = emb.withColumn("embedding",
      when(col("vec_id") === 2L, typedLit(Seq(3.0f, 5.0f)))
        .otherwise(col("embedding")))
    assert(Fingerprint.of(moved, "vec_id", Seq("embedding")) != a)
    assert(Fingerprint.of(emb.repartition(5), "vec_id", Seq("embedding")) == a)
  }
}
