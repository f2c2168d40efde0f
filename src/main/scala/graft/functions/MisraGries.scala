package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass mergeable heavy-hitters sketch (Misra-Gries) as a typed
  * [[Aggregator]] — the third custom-function surface beside the codegen'd
  * scalar expressions (Md5Hex, VecDot) and the catalog-registered SQL
  * functions: a distributed aggregate with per-partition partial state.
  *
  * Guarantee (Misra-Gries 1982; merge form Agarwal et al., "Mergeable
  * Summaries", PODS'12): with capacity k, every key whose true frequency
  * exceeds n/(k+1) of an n-element stream is present in the summary,
  * regardless of partitioning or merge order — counts are approximate,
  * CONTAINMENT of the heavy keys is not. That order-insensitive guarantee
  * is what a deterministic oracle can gate (t35), and what makes the
  * sketch useful at scale: k bounded memory per partition, one partial
  * per partition shipped to a single k-sized merge — a skew probe over
  * 100 TB costs one map-side pass, no shuffle of the data itself.
  *
  * The buffer is an immutable Map encoded as a catalyst MapType (not
  * kryo: the bench/verify JVMs run without `--add-opens java.nio`, which
  * kryo's FieldSerializer needs on Java 17) — k ≤ 128 entries, so the
  * copy-per-update cost is bounded and the partial ships as ordinary
  * unsafe-row bytes.
  */
case class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], key: String): Map[String, Long] =
    m.get(key) match {
      case Some(c) => m.updated(key, c + 1)
      case None if m.size < k => m.updated(key, 1L)
      case None =>
        // classic decrement step: every tracked count pays one unit, the
        // new key's implicit single unit included; zeros drop out
        m.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }

  override def merge(
      a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count, keep strictly positive
      val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      sum.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  /** Tracked keys, sorted for stable presentation. Counts are withheld on
    * purpose: they are partition-order-dependent underestimates; the
    * portable contract is key containment. */
  override def finish(m: Map[String, Long]): Seq[String] = m.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}
