package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset-API aggregators.
  *
  * [[SumCountAvg]] is the reference's `SalaryReducer`
  * (`S3FlinkAverageSalaryByCity.java:75-80`) in its Spark-native typed
  * form: the accumulator is the same decomposable (sum, count) pair, so
  * Spark runs it partial → merge → finish exactly like the hand-written
  * Flink reduce — but with compile-time types via `Encoder`s and without
  * emitting running prefixes (batch semantics; the running-emission
  * variant is `StreamOps.runningAvgByKey`).
  */
object TypedAggregators {

  object SumCountAvg extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), a: Double): (Double, Long) =
      (b._1 + a, b._2 + 1)
    override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Long)): Double =
      if (r._2 == 0) 0.0 else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
