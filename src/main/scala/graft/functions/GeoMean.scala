package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF demo: geometric mean via sum-of-logs.
  * `Aggregator[IN, BUF, OUT]` gives Spark a map-side-combinable aggregate —
  * partial (sumLog, n) buffers merge associatively, so the shuffle carries
  * 16 bytes per group regardless of input size.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: Double): (Double, Long) =
    if (a > 0) (b._1 + math.log(a), b._2 + 1) else b
  override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) 0.0 else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
