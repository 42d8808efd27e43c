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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; read it as raw Long nanos and floor-divide to microseconds —
    * the same truncation DuckDB applies — so oracle comparisons line up.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Session-global by necessity (the parquet reader consults the session
    // conf, not a per-read option) but set only when missing, so shared
    // sessions aren't silently reconfigured on every call.
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
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
