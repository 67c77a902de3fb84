package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator that merges per-partition partial aggregates — the exact
  * shape of the reference's reduce step (`combineAverages`,
  * /root/reference/combined_flask.py:762: weighted combine of per-partition
  * (mean, count) partials). Carrying (sum_cents, n) instead of (mean, n) keeps
  * the merge exact and order-independent, which the floating-point weighted
  * form is not — that's the 100 TB-safe formulation of the same algorithm.
  *
  * Spark runs `Aggregator`s with map-side partial aggregation + merge, so this
  * IS a distributed two-level combine even when fed raw rows.
  */
object PartialCombine {

  /** A partial: exact integer cent sum + row count. */
  case class Partial(sumCents: Long, n: Long)

  val weightedMean: Aggregator[Partial, Partial, Double] =
    new Aggregator[Partial, Partial, Double] {
      def zero: Partial = Partial(0L, 0L)
      def reduce(b: Partial, a: Partial): Partial =
        Partial(b.sumCents + a.sumCents, b.n + a.n)
      def merge(x: Partial, y: Partial): Partial =
        Partial(x.sumCents + y.sumCents, x.n + y.n)
      def finish(r: Partial): Double =
        if (r.n == 0) Double.NaN else r.sumCents / 100.0 / r.n
      def bufferEncoder: Encoder[Partial] = Encoders.product[Partial]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
