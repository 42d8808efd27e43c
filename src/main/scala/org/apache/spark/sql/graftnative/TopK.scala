package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bounded top-k collection as an aggregate, wrapping Catalyst's
  * `CollectTopK` (a `BoundedPriorityQueue` buffer — the expression behind
  * Spark's own optimized `Dataset.head`/pandas `nsmallest` paths; see
  * spark/sql/catalyst/.../aggregate/collect.scala).
  *
  * Why this beats `row_number().over(Window.partitionBy(query))` for ANN
  * top-k: the window form funnels EVERY candidate row of a query into one
  * task and sorts them all; this aggregate keeps a k-element heap per
  * (mapper, group) — partial aggregation caps what crosses the shuffle at
  * k rows per mapper per group, and the final merge per group handles
  * k * num_mappers rows instead of the full candidate set. At 100 TB that
  * is the difference between a per-query sort of the corpus and a bounded
  * merge.
  *
  * Lives under `org.apache.spark.sql` because `CollectTopK` is not part of
  * the public API surface (same placement rationale as [[DotProduct]]).
  */
object TopK {

  /** Aggregate column: the `k` smallest (`reverse = true`) or largest
    * (`reverse = false`) values of `e` under the natural ordering of its
    * type (structs order lexicographically by field). The returned array's
    * internal order is heap-eval order — `array_sort` it before use.
    */
  def collectTopK(e: Column, k: Int, reverse: Boolean): Column =
    ColumnBridge.column(
      new CollectTopK(ColumnBridge.expression(e), k, reverse, 0, 0).toAggregateExpression())
}
