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
  *
  * The buffer is a MUTABLE `java.util.HashMap` behind a Kryo encoder:
  * `ScalaAggregator` is a `TypedImperativeAggregate`, so the buffer lives
  * as a JVM object across `reduce` calls and is (de)serialized only at
  * partial-aggregate shuffle boundaries. The previous immutable
  * `Map[String, Long]` buffer went through `ExpressionEncoder`, whose
  * Catalyst map conversion rebuilt the whole buffer per serialization and
  * allocated a new persistent map per row — 5× slower end-to-end (q79 vs
  * the q75 window form).
  */
object FirstSeenDedup
  extends Aggregator[(String, Long), java.util.HashMap[String, Long], Seq[String]] {

  override def zero: java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def reduce(b: java.util.HashMap[String, Long],
                      a: (String, Long)): java.util.HashMap[String, Long] = {
    // getOrDefault, not get: a missing key returns null, which would NPE
    // on unboxing to the primitive Long
    if (a._2 < b.getOrDefault(a._1, Long.MaxValue)) b.put(a._1, a._2)
    b
  }

  override def merge(b1: java.util.HashMap[String, Long],
                     b2: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    // fold the smaller map into the larger
    val (big, small) = if (b1.size() >= b2.size()) (b1, b2) else (b2, b1)
    val it = small.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue < big.getOrDefault(e.getKey, Long.MaxValue))
        big.put(e.getKey, e.getValue)
    }
    big
  }

  override def finish(b: java.util.HashMap[String, Long]): Seq[String] = {
    import scala.jdk.CollectionConverters._
    b.asScala.toSeq.sortBy { case (v, pos) => (pos, v) }.map(_._1)
  }

  override def bufferEncoder: Encoder[java.util.HashMap[String, Long]] =
    Encoders.kryo[java.util.HashMap[String, Long]]

  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()

  /** Column form: `firstSeen(valueCol, posCol)` → array<string>. */
  val asUdaf = udaf(FirstSeenDedup)
}
