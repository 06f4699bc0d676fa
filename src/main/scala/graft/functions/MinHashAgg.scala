package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregate computing a K-wide MinHash signature in one pass.
  *
  * Input is a pre-hashed shingle (60-bit long); the K "permutations" are
  * XOR with fixed constants. The buffer is a primitive K-long array, the
  * reduce step is K compare-and-swaps — a single streaming pass with an
  * O(K) buffer, against which an explode + K min() aggregations would
  * carry K copies of every row through the shuffle. Merge is elementwise
  * min, so partial (map-side) aggregation composes exactly.
  */
class MinHashAgg(k: Int, constants: Array[Long])
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(constants.length == k)

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val v = h ^ constants(i)
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
