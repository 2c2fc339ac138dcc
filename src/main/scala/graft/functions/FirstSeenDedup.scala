package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A5 ordered dedup as a typed `Aggregator` (SURVEY.md §2.10/§7.4): the
  * reference's `list(dict.fromkeys(xs))` (`keyword_merger.py:263`,
  * `Deprecated/extractor.py:108`) — deduplicate keeping the FIRST
  * occurrence, in one distributed pass.
  *
  * Input is (value, position); the buffer keeps the minimum position per
  * value, so reduce/merge are commutative+associative and the result is
  * independent of partitioning — `finish` sorts by first-seen position.
  * This replaces the window-function formulation (two shuffles: first-seen
  * rank + re-collect) with one aggregation when the list itself is the
  * desired output.
  */
object FirstSeenDedup
  extends Aggregator[(String, Long), Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: (String, Long)): Map[String, Long] = {
    val (v, pos) = a
    b.get(v) match {
      case Some(p) if p <= pos => b
      case _ => b + (v -> pos)
    }
  }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
    b2.foldLeft(b1) { case (acc, (v, pos)) =>
      acc.get(v) match {
        case Some(p) if p <= pos => acc
        case _ => acc + (v -> pos)
      }
    }

  override def finish(b: Map[String, Long]): Seq[String] =
    b.toSeq.sortBy { case (v, pos) => (pos, v) }.map(_._1)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()

  /** Column form: `firstSeen(valueCol, posCol)` → array<string>. */
  val asUdaf = udaf(FirstSeenDedup)
}
