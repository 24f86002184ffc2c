package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

final case class ScoredId(id: Long, score: Double)

/** Bounded top-k aggregator (SURVEY §4's "TypedImperativeAggregate
  * top-k accumulator" — realized as a typed Aggregator, Spark's public
  * custom-aggregation API, which plans as an ObjectHashAggregate).
  *
  * Per-group top-k via `groupBy(g).agg(topk(...))` keeps a k-bounded
  * buffer per group with map-side partial aggregation: each partition
  * ships at most k rows per group, versus the window-function
  * formulation (`row_number().over(partitionBy(g).orderBy(score))`)
  * which shuffles and sorts EVERY row. For k=5 over 10^9 rows per
  * group, that's the difference between a full sort and a heap scan.
  * Ties break by ascending id, matching [[graft.index.BruteForceKnn]].
  */
final class TopKAggregator(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def insert(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] =
    if (buf.size < k) buf :+ x
    else {
      // replace the current worst if x beats it (buffer stays unsorted;
      // O(k) per row, k is small)
      val worstIdx = buf.indices.minBy(i => (buf(i).score, -buf(i).id))
      if (better(x, buf(worstIdx))) buf.updated(worstIdx, x) else buf
    }

  override def zero: Seq[ScoredId] = Vector.empty
  override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] = insert(buf, x)
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] =
    buf.sortBy(s => (-s.score, s.id))
  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] = bufferEncoder
}

object TopK {
  /** Untyped Column form: `df.groupBy(g).agg(TopK.topk(5)(struct(id, score)))`. */
  def topk(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAggregator(k), Encoders.product[ScoredId])

  /** Per-group top-k as exploded rows (group cols + rank + id + score),
    * identical output contract to the window-function formulation.
    */
  def perGroup(df: DataFrame, groupCols: Seq[Column], idCol: Column, scoreCol: Column,
               k: Int): DataFrame = {
    val agg = df
      .withColumn("__scored", struct(idCol.cast("long").as("id"), scoreCol.cast("double").as("score")))
      .groupBy(groupCols: _*)
      .agg(topk(k)(col("__scored.id"), col("__scored.score")).as("__topk"))
    agg
      .select(groupCols :+ posexplode(col("__topk")).as(Seq("__pos", "__hit")): _*)
      .select(groupCols ++ Seq((col("__pos") + 1).cast("long").as("rn"),
        col("__hit.id").as("id"), col("__hit.score").as("score")): _*)
  }
}
