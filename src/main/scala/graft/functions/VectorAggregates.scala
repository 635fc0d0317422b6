package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY §2.14): a centroid `Aggregator` over
  * embedding columns. The buffer is (running sums, count) so the merge is
  * associative and the aggregation runs as a partial/final pair — the
  * map-side-combine shape that makes per-group centroids (IVF cell
  * builds, per-label means) one shuffle of dim-sized buffers rather than
  * a posexplode of every vector component (v08's explode form shuffles
  * dim rows per vector; this shuffles one buffer per group per task).
  */
object VectorAggregates {

  /** Element-wise mean of non-null Array[Float] vectors. Null inputs are
    * skipped; an empty group yields null; mixed dimensions FAIL the job
    * loudly (silent truncation would corrupt the centroid).
    */
  class Centroid extends Aggregator[Array[Float], (Array[Double], Long), Array[Float]] {
    override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

    override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
      if (v == null) b
      else if (b._2 == 0L) (v.map(_.toDouble), 1L)
      else {
        require(v.length == b._1.length,
          s"centroid over mixed dimensions: ${v.length} vs ${b._1.length}")
        var i = 0
        while (i < v.length) { b._1(i) += v(i); i += 1 }
        (b._1, b._2 + 1)
      }
    }

    override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      if (a._2 == 0L) b
      else if (b._2 == 0L) a
      else {
        require(a._1.length == b._1.length,
          s"centroid over mixed dimensions: ${a._1.length} vs ${b._1.length}")
        var i = 0
        while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
        (a._1, a._2 + b._2)
      }
    }

    override def finish(r: (Array[Double], Long)): Array[Float] =
      if (r._2 == 0L) null else r._1.map(x => (x / r._2).toFloat)

    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.product[(Array[Double], Long)]
    override def outputEncoder: Encoder[Array[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
  }

  /** Untyped-column form: `df.groupBy("label").agg(centroid($"embedding"))`. */
  def centroid(c: Column): Column = udaf(new Centroid).apply(c)
}
