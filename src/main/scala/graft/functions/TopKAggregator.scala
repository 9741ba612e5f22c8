package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregation for similarity search.
  *
  * The window formulation (`row_number() OVER (PARTITION BY query ORDER BY
  * score DESC)`) shuffles EVERY scored candidate row to sort it, which at
  * a billion-vector corpus is |queries| x |candidates| rows through the
  * exchange. An `Aggregator` instead keeps a k-bounded buffer per query on
  * the map side (partial aggregation), so only ~k rows per query per input
  * partition reach the shuffle — the shape a distributed top-k should have.
  *
  * Ordering matches the window formulation exactly: score descending,
  * neighbor id ascending on ties — results are bit-identical, so
  * oracle-checked queries are unaffected by the swap.
  */
object TopKAggregator {

  case class Scored(neighbor_id: Long, score: Double)

  /** Mirrors `ORDER BY score DESC, neighbor_id ASC` under Spark's sort
    * semantics, NaN included: Spark orders NaN as the LARGEST double, so
    * descending puts NaN first. `Ordering.by(-score)` would get this
    * wrong (-NaN is NaN, which java.lang.Double.compare sorts last in
    * ascending order → NaN last), silently diverging from the window
    * formulation when cosine yields NaN (zero-norm vectors). */
  private val ord: Ordering[Scored] = new Ordering[Scored] {
    override def compare(x: Scored, y: Scored): Int = {
      val c = java.lang.Double.compare(y.score, x.score) // DESC, NaN first
      if (c != 0) c else java.lang.Long.compare(x.neighbor_id, y.neighbor_id)
    }
  }

  final class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private val cap = 2 * k + 8

    override def zero: Seq[Scored] = Vector.empty

    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = {
      // Once the buffer is saturated it is kept trimmed to k, so most
      // candidates are rejected by a single comparison with the kth
      // element and never allocate.
      if (b.length >= cap) {
        val t = b.sorted(ord).take(k)
        if (ord.compare(a, t.last) < 0) t.init :+ a else t
      } else if (b.length == k && ord.compare(a, b.last) >= 0 && isSorted(b)) {
        b
      } else b :+ a
    }

    private def isSorted(b: Seq[Scored]): Boolean = {
      var i = 1
      while (i < b.length) { if (ord.compare(b(i - 1), b(i)) > 0) return false; i += 1 }
      true
    }

    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      (a ++ b).sorted(ord).take(k)

    override def finish(b: Seq[Scored]): Seq[Scored] = b.sorted(ord).take(k)

    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  /** Column function: top-k (neighbor_id, score) structs per group,
    * sorted best-first. */
  def topK(k: Int, neighborId: Column, score: Column): Column =
    udaf(new TopK(k)).apply(neighborId, score)
}
