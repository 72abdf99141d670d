package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset surface — the `Dataset[T]` / `Aggregator` face of the
  * engine, for callers who want case-class schemas and compile-time
  * field checking instead of `Row` + string column names. The typed
  * path costs one deserialization boundary per operator (documented
  * Spark trade-off), so graft uses it at API edges and keeps hot
  * interior pipelines on the untyped codegen path; this module is the
  * reference pattern for the edge.
  *
  * [[OrderStats]] is a mergeable typed aggregate (count / sum / max —
  * the same partial-merge-final contract as the native
  * TypedImperativeAggregates, expressed through the public
  * `Aggregator` API): the buffer is a product type with an Encoder, so
  * Tungsten stores it off-heap between updates. */
object Typed {

  final case class Order(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)
  final case class OrderSummary(n: Long, total: Double, max_price: Double)

  /** Mergeable per-customer order statistics. */
  object OrderStats extends Aggregator[Order, OrderSummary, OrderSummary] {
    override def zero: OrderSummary = OrderSummary(0L, 0.0, Double.NegativeInfinity)
    override def reduce(b: OrderSummary, o: Order): OrderSummary =
      OrderSummary(b.n + 1, b.total + o.o_totalprice,
        math.max(b.max_price, o.o_totalprice))
    override def merge(a: OrderSummary, b: OrderSummary): OrderSummary =
      OrderSummary(a.n + b.n, a.total + b.total,
        math.max(a.max_price, b.max_price))
    override def finish(r: OrderSummary): OrderSummary = r
    override def bufferEncoder: Encoder[OrderSummary] = Encoders.product[OrderSummary]
    override def outputEncoder: Encoder[OrderSummary] = Encoders.product[OrderSummary]
  }
}
