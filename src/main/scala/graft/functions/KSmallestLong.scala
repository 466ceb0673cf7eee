package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded k-smallest aggregator: single-pass grouped top-k whose state is
  * O(k) at every stage — partial buffers are capped at k rows and merges cap
  * at k — unlike `collect_list` + `slice`, whose partial buffers grow with
  * group size and whose final merge materializes the whole group on one task.
  *
  * This is the scale path for the reference's truncated member lists
  * (reference: settings.py:144-145 caps member_ids at 50;
  * defs/assets/detect_communities.py:307-328 collects them per community).
  * At 100 TB a hot group can hold billions of members; this aggregator keeps
  * every executor's memory constant regardless.
  */
case class KSmallestLong(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {

  def zero: Seq[Long] = Vector.empty

  def reduce(b: Seq[Long], a: Long): Seq[Long] = insert(b, a)

  def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] = b2.foldLeft(b1)(insert)

  def finish(r: Seq[Long]): Seq[Long] = r

  // Sorted-vector insert: O(k) per row with k fixed and small (50).
  private def insert(b: Seq[Long], a: Long): Seq[Long] =
    if (b.length < k) (b :+ a).sorted
    else if (a < b.last) (b.init :+ a).sorted
    else b

  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
