package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated per-group percentiles computed DISTRIBUTED — the
  * scale face of the native `percentile` aggregate (q26's declarative
  * face, the q25/q25b pairing pattern).
  *
  * Why: Spark's exact `percentile` is a sort-based aggregate whose buffer
  * holds every (value, count) of a group on ONE task — fine for the
  * per-source rollups (c10/c14/c27: thousands of rows per source), an OOM
  * at a 100 TB table with a handful of giant groups (q26's shape: 5
  * priorities × billions of orders). Here the rank comes from the c11
  * two-phase numbering instead, bucketed on (group, floor(value/width)):
  * per-bucket row_number windows parallelize across executors, the
  * per-group offsets table is bucket-count-sized (value-range/width), and
  * only the 2·|qs| ranked rows per group are ever fetched. No task holds
  * a group.
  *
  * Values are BIT-IDENTICAL to the native aggregate: position
  * q·(n_g − 1), result (hi − pos)·v_lo + (pos − lo)·v_hi — Spark
  * `Percentile`'s own interpolation applied to the two globally-ranked
  * rows (DuckDB's quantile_cont agrees wherever the native face does;
  * ties are harmless because tied ranks carry equal values).
  * ExactPercentilesSpec pins equality against the native aggregate,
  * including tied values and the integral-position edge.
  */
object ExactPercentiles {

  /** One row per group: (groupCol, n, <name per q>). `qs` are
    * (outputName, percentile) pairs; `bucketWidth` sets the value-range
    * bucketing granularity (offsets table size = range/width per group).
    * Null values are excluded, like the native aggregate; a null GROUP
    * key is a group like any other (null-safe joins carry it through to
    * one output row, as the native aggregate does).
    */
  def perGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      qs: Seq[(String, Double)],
      bucketWidth: Double): DataFrame = {
    require(qs.nonEmpty, "need at least one percentile")
    require(qs.forall { case (_, q) => q >= 0.0 && q <= 1.0 },
      s"percentiles out of [0,1]: $qs")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val v = df
      .select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("__b", floor(col("v") / bucketWidth).cast("long"))
    // ONE aggregation pass over the data: the bucket rollup (persisted —
    // bucket-count-sized) yields both the prefix offsets and the per-group
    // totals; the only other data-sized pass is the ranked join itself.
    val offsets = graft.util.CacheScope.persist(
      TwoPhase.offsets(v, "__b", count(lit(1)), partitionCols = Seq("g")))
    val rnW = Window.partitionBy("g", "__b").orderBy("v")
    // Null-SAFE (<=>) on the group key everywhere it joins: a null group
    // must flow through to the output exactly like the native percentile
    // aggregate (and DuckDB's quantile_cont GROUP BY) emits it — a plain
    // equi-join would silently drop the null group's rows. EqualNullSafe
    // is still a hash-join key, so the broadcast plan shape is unchanged.
    val off = broadcast(offsets.drop("__bt"))
      .withColumnRenamed("g", "__og").withColumnRenamed("__b", "__ob")
    val ranked = v
      .join(off, col("g") <=> col("__og") && col("__b") === col("__ob"))
      .withColumn("__r", col("__off") + row_number().over(rnW) - 1)
      .select("g", "__r", "v")
    val counts = offsets.groupBy("g").agg(sum(col("__bt")).as("n"))
    // One row per (group, requested percentile) with its two target ranks.
    val targets = counts.select(
      col("g"), col("n"),
      explode(array(qs.map { case (name, q) =>
        struct(lit(name).as("qname"),
          (lit(q) * (col("n") - 1).cast("double")).as("pos"))
      }: _*)).as("t"))
      .select(col("g"), col("n"), col("t.qname").as("qname"), col("t.pos").as("pos"))
      .withColumn("lo", floor(col("pos")).cast("long"))
      .withColumn("hi", ceil(col("pos")).cast("long"))
    // ONE equi-join fetches BOTH target ranks (guide §2.4): the lo/hi
    // lookups used to be two separate joins against `ranked`, and the
    // un-persisted data-sized rank pass executed twice. Exploding each
    // target into its (rank, side) rows and pivoting after the join keeps
    // the values bit-identical (same two ranked rows feed the same
    // interpolation; lo == hi joins one row twice and the pivot collapses
    // it) while the windowed numbering runs once.
    val sides = targets.select(
      col("g"), col("n"), col("qname"), col("pos"), col("lo"), col("hi"),
      explode(array(
        struct(col("lo").as("r"), lit("lo").as("side")),
        struct(col("hi").as("r"), lit("hi").as("side")))).as("t2"))
      .select(col("g"), col("n"), col("qname"), col("pos"), col("lo"), col("hi"),
        col("t2.r").as("__tr"), col("t2.side").as("side"))
    val rr = ranked.select(
      col("g").as("__rg"), col("__r").as("__rr"), col("v"))
    val picked = broadcast(sides)
      .join(rr, col("g") <=> col("__rg") && col("__tr") === col("__rr"))
      .groupBy("g", "n", "qname", "pos", "lo", "hi")
      .agg(
        max(when(col("side") === "lo", col("v"))).as("vlo"),
        max(when(col("side") === "hi", col("v"))).as("vhi"))
      .withColumn("value",
        when(col("lo") === col("hi"), col("vlo"))
          .otherwise((col("hi") - col("pos")) * col("vlo") +
            (col("pos") - col("lo")) * col("vhi")))
    picked
      .groupBy(col("g").as(groupCol))
      .agg(
        max(col("n")).as("n"),
        qs.map { case (name, _) =>
          max(when(col("qname") === name, col("value"))).as(name)
        }: _*)
  }
}
