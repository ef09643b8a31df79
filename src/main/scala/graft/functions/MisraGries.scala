package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Bounded-state heavy-hitter sketch (Misra-Gries / space-saving family):
  * at most `m` (item, count) entries per partial buffer, mergeable, with
  * the classic guarantee that every item whose true frequency exceeds
  * N/(m+1) survives in the summary and each kept count underestimates the
  * true count by at most N/(m+1).
  *
  * Scale rationale: a full `groupBy(token).count()` shuffles the ENTIRE
  * distinct-key space — at 100 TB of text that is billions of distinct
  * tokens of state for a question ("which items exceed 0.5% of the
  * stream?") whose answer has at most 200 rows. MG keeps m entries per
  * partition, partial-aggregates map-side, and ships m rows per partition
  * across the shuffle; a second pass counts ONLY the returned candidates
  * exactly (map-side filter + tiny aggregate). a_heavy_hitters wires the
  * two passes together; MGSpec asserts the superset + error bounds.
  *
  * Merge rule (Agarwal et al., "Mergeable Summaries"): sum counts, then if
  * more than m entries remain, subtract the (m+1)-th largest count from
  * every entry and drop the non-positive — the result is again an MG
  * summary for the union stream with the same error bound.
  */
class MisraGries(m: Int)
    extends Aggregator[String, mutable.Map[String, Long], Seq[(String, Long)]] {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[String, Long], tok: String): mutable.Map[String, Long] = {
    b.get(tok) match {
      case Some(c) => b.update(tok, c + 1)
      case None if b.size < m => b.update(tok, 1L)
      case None =>
        // decrement-all step; drop zeros. Iterate a snapshot: mutating a
        // mutable.Map mid-traversal is unspecified in general (only
        // happens to be safe for value-in-place updates on the current
        // HashMap impl, and Kryo may deserialize a different Map type).
        for ((k, c) <- b.toList) if (c == 1) b.remove(k) else b.update(k, c - 1)
    }
    b
  }

  override def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > m) {
      val cut = a.values.toSeq.sorted(Ordering[Long].reverse).apply(m)
      // snapshot before mutating — see reduce()
      for ((k, c) <- a.toList) if (c - cut <= 0) a.remove(k) else a.update(k, c - cut)
    }
    a
  }

  override def finish(b: mutable.Map[String, Long]): Seq[(String, Long)] =
    b.toSeq.sortBy { case (k, c) => (-c, k) }

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
