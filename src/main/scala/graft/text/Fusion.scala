package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval: combine the per-query rankings of
  * several retrieval legs (BM25 lexical, dense cosine, …) into one list.
  *
  * Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
  * score(d) = Σ_legs 1/(kRrf + rank_leg(d)), missing legs contribute 0.
  * RRF is rank-only — no cross-leg score calibration is needed, which is
  * why it is the default fusion in production hybrid search: BM25 points
  * and cosine values live on incomparable scales, but their RANKS don't.
  *
  * Scale shape: every leg is already a bounded top-k table (k·|queries|
  * rows — each leg's own retrieval did the corpus-sized work under its
  * own index); the fusion is a chain of full-outer joins over those tiny
  * sides plus one per-query window. Nothing here ever touches the corpus,
  * so fusing N legs at 100 TB costs the same as at 100 MB.
  *
  * Determinism: 1/(kRrf+rank) is one IEEE double division of exact
  * integers, and the fused score is the fixed left-to-right sum over the
  * caller's leg order — bit-identical across engines and partitionings.
  * Final ranking tie-breaks on the doc id.
  */
object Fusion {

  /** Fuse `legs` (name -> DataFrame with (queryCol, idCol, rankCol)) into
    * the per-query top `k`: (queryCol, rk, idCol, rrf, <name>_rank …).
    * A document absent from a leg carries a null `<name>_rank` there.
    */
  def rrf(
      legs: Seq[(String, DataFrame)],
      k: Int,
      kRrf: Int = 60,
      queryCol: String = "query_id",
      idCol: String = "doc_id",
      rankCol: String = "rank"): DataFrame = {
    require(legs.nonEmpty, "rrf needs at least one leg")
    require(legs.map(_._1).distinct.size == legs.size,
      s"duplicate leg names: ${legs.map(_._1)}")
    require(k > 0, s"k must be positive, got $k")
    require(kRrf >= 0, s"kRrf must be non-negative, got $kRrf")
    val renamed = legs.map { case (n, df) =>
      n -> df.select(
        col(queryCol), col(idCol), col(rankCol).cast("long").as(s"${n}_rank"))
    }
    val joined = renamed.map(_._2)
      .reduce((a, b) => a.join(b, Seq(queryCol, idCol), "full_outer"))
    val score = renamed
      .map { case (n, _) =>
        coalesce(
          lit(1.0) / (lit(kRrf.toDouble) + col(s"${n}_rank")), lit(0.0))
      }
      .reduce(_ + _)
    val w = Window.partitionBy(queryCol).orderBy(col("rrf").desc, col(idCol))
    joined
      .withColumn("rrf", score)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(Seq(col(queryCol), col("rk"), col(idCol), col("rrf")) ++
        renamed.map { case (n, _) => col(s"${n}_rank") }: _*)
  }
}
