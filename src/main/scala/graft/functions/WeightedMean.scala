package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.1 J2): quantity-weighted mean price.
  *
  * The buffer is a pair of exact decimals — SUM(price2 * qty2) and
  * SUM(qty2), where `x2` = the input double quantized to 2 decimal places
  * the same way Spark's `CAST(x AS DECIMAL(18,2))` does (shortest-repr
  * string parse + HALF_UP). Decimal sums are associative, so reduce/merge
  * order — i.e. partitioning — cannot change the result. The ratio is
  * taken in double only at `finish`, matching the oracle's
  * `CAST(dec AS DOUBLE) / CAST(dec AS DOUBLE)`.
  */
case class PriceQty(price: Double, qty: Double)

object WeightedMean extends Aggregator[PriceQty, (BigDecimal, BigDecimal), Double] {
  private def d2(x: Double): BigDecimal =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)

  override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))

  // Non-finite doubles cannot quantize to decimal (BigDecimal(NaN)
  // throws); skip such rows instead of failing the whole aggregation —
  // matches SQL's treatment of aggregate NULLs (ignored).
  override def reduce(b: (BigDecimal, BigDecimal), a: PriceQty): (BigDecimal, BigDecimal) =
    if (java.lang.Double.isFinite(a.price) && java.lang.Double.isFinite(a.qty))
      (b._1 + d2(a.price) * d2(a.qty), b._2 + d2(a.qty))
    else b

  override def merge(x: (BigDecimal, BigDecimal), y: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
    (x._1 + y._1, x._2 + y._2)

  override def finish(r: (BigDecimal, BigDecimal)): Double =
    if (r._2.signum == 0) Double.NaN else r._1.toDouble / r._2.toDouble

  // Product encoder maps scala BigDecimal to DECIMAL(38,18) — ample for
  // sf0.1's ~1e15 max buffer magnitude (34 of 38 digits used).
  override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
    Encoders.product[(BigDecimal, BigDecimal)]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
