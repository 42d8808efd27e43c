package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Mirrors the reference's "query surface" idea: the reference delegates
  * analytics to PostgreSQL tables (SURVEY.md §3 entry point 3, the reference
  * migrations DDL); here the parquet tables registered as
  * Spark views play that role. At cluster scale these would be catalog tables
  * partitioned by their natural keys (slot-range in the reference's domain);
  * reads below go straight to the parquet footers so Catalyst can push
  * filters and prune columns.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables safe to broadcast at any scale factor. */
  val dimensions: Set[String] = Set("region", "nation", "supplier", "part")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** `events.ts` has shipped in two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
    * read as raw Long nanos and floor-divide to microseconds, the same
    * truncation DuckDB applies) and TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (which Spark 4 infers as TIMESTAMP_NTZ). [[normalizeTs]] folds both into
    * a plain `TimestampType` so every downstream consumer — `unix_micros`,
    * `cast(ts as long)`, `withWatermark` — sees one type. The session TZ is
    * pinned to UTC (GraftSession), so NTZ→TZ is value-preserving and the
    * DuckDB oracle comparison is unchanged.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Session-global by necessity (the parquet reader consults the session
    // conf, not a per-read option) but set only when missing, so shared
    // sessions aren't silently reconfigured on every call.
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(spark, dir, "events"), "ts")
  }

  /** Normalize a timestamp-ish column to `TimestampType` regardless of which
    * physical parquet encoding it arrived as: Long nanos (legacy nanosAsLong
    * read), TIMESTAMP_NTZ (Spark 4 inferTimestampNTZ on isAdjustedToUTC=false
    * µs), or already TimestampType (no-op).
    */
  def normalizeTs(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(colName).dataType match {
      case LongType         => df.withColumn(colName, expr(s"timestamp_micros($colName div 1000)"))
      case TimestampNTZType => df.withColumn(colName, col(colName).cast(TimestampType))
      case _                => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view so spark.sql(...) is a full query
    * surface (the Spark analog of the reference's 19 Postgres indexes —
    * SURVEY.md §3).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
