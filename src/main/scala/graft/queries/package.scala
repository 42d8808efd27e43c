package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** One verifiable capability: a Spark query plus (when SQL-expressible) an
    * equivalent ANSI SQL oracle the driver runs in DuckDB over the same
    * parquet tables. Column names/aliases MUST match between the two — the
    * driver sorts columns by name before hashing values.
    */
  final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String] = None)

  /** Deterministic-output helpers: every query orders its result fully so
    * row-order-sensitive comparison can never flake.
    */
  object DecimalNotes {
    // Money/measure sums are computed as CAST(x AS DECIMAL(18,k)) -> SUM ->
    // CAST AS DOUBLE on BOTH engines: decimal addition is exact and
    // order-independent, so Spark's parallel partial aggregation and DuckDB's
    // sequential sum produce bit-identical doubles. Raw double SUMs would be
    // association-order dependent and could hash-mismatch.
  }
}
