package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table reconciliation: what changed between two runs of a pipeline —
  * rows `added` (in right only), `removed` (in left only), `changed`
  * (both sides, differing values), with the differing column names
  * spelled out. The regression check every incremental 100 TB pipeline
  * wants after a code change: diff yesterday's output against today's
  * re-run and alert on anything but the expected delta.
  *
  * [[diff]] is the detail form: one full outer join on the keys, row
  * payloads travel as single structs, per-column null-safe compares only
  * on rows both sides have. [[hashDiff]] is the scale form for wide
  * tables: both sides reduce to (keys, xxhash64(payload)) BEFORE the
  * shuffle, so reconciliation moves 8 bytes per row however many columns
  * the table has; feed its `changed`/`added`/`removed` keys back through
  * a semi-join + [[diff]] when the per-column detail of (typically few)
  * changed rows is wanted. A 64-bit hash collision would mask a change
  * (~n/2^64 — the conservative caveat shared with every hashed path
  * here); the detail form compares true values and has no such caveat.
  */
object TableDiff {

  private def aligned(left: DataFrame, right: DataFrame, keys: Seq[String]): Seq[String] = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(left.columns.sameElements(right.columns),
      s"schemas must align: ${left.columns.mkString(",")} vs ${right.columns.mkString(",")}")
    keys.foreach(k => require(left.columns.contains(k), s"missing key column '$k'"))
    left.columns.toSeq.filterNot(keys.contains)
  }

  /** (keys..., diff_status, changed_columns): every non-identical row,
    * `changed_columns` the comma-joined names (in schema order) whose
    * values differ null-safely — empty for added/removed rows. Identical
    * rows are dropped (the interesting output of a diff is the delta).
    */
  def diff(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    val nonKeys = aligned(left, right, keys)
    val l = left.select(keys.map(col) :+ struct(nonKeys.map(col): _*).as("__l"): _*)
    val r = right.select(keys.map(col) :+ struct(nonKeys.map(col): _*).as("__r"): _*)
    l.join(r, keys, "full_outer")
      .withColumn("diff_status",
        when(col("__r").isNull, lit("removed"))
          .when(col("__l").isNull, lit("added"))
          .when(col("__l") <=> col("__r"), lit("unchanged"))
          .otherwise(lit("changed")))
      .filter(col("diff_status") =!= "unchanged")
      .withColumn("changed_columns",
        when(col("diff_status") === "changed",
          array_join(
            filter(
              array(nonKeys.map(c =>
                when(!(col(s"__l.$c") <=> col(s"__r.$c")), lit(c))): _*),
              x => x.isNotNull),
            ","))
          .otherwise(lit("")))
      .drop("__l", "__r")
  }

  /** (keys..., diff_status): the same classification with only
    * (keys, 8-byte payload hash) ever crossing the shuffle — the wide-
    * table scale form. Hashing the struct covers null positions too
    * (xxhash64 folds field nullness into the value).
    */
  def hashDiff(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    val nonKeys = aligned(left, right, keys)
    def hashed(df: DataFrame, hc: String) = df.select(
      keys.map(col) :+ xxhash64(struct(nonKeys.map(col): _*)).as(hc): _*)
    hashed(left, "__lh").join(hashed(right, "__rh"), keys, "full_outer")
      .withColumn("diff_status",
        when(col("__rh").isNull, lit("removed"))
          .when(col("__lh").isNull, lit("added"))
          .when(col("__lh") === col("__rh"), lit("unchanged"))
          .otherwise(lit("changed")))
      .filter(col("diff_status") =!= "unchanged")
      .drop("__lh", "__rh")
  }
}
