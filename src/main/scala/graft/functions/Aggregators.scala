package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.8). The reference needs no custom
  * aggregate — its `FILTER` clauses map to `agg(count(when(...)))` — so
  * this is the extension-scope proof that the engine supports the full
  * `Aggregator[IN, BUF, OUT]` path: partial aggregation map-side, buffer
  * merge across partitions, finish on the reducer. Registered through
  * `functions.udaf(...)`, the aggregator participates in hash
  * aggregation like any built-in (partial/final split, no codegen for
  * the lambda itself but the surrounding plan stays whole-stage).
  */
object Aggregators {

  /** Geometric mean via sum-of-logs: commutative + associative buffer
    * merge, O(1) state — safe at any scale. Inputs must be > 0 (ln of
    * non-positive values poisons the buffer with NaN, the standard
    * contract for a geometric mean). Empty groups finish to NaN.
    */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), x: Double): (Double, Long) =
      (b._1 + math.log(x), b._2 + 1)
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Double, Long)): Double =
      if (r._2 == 0L) Double.NaN else math.exp(r._1 / r._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
