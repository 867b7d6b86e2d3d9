package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed [[Aggregator]] (the custom-UDAF extension
  * surface): each partition keeps a ≤k sorted buffer, so the shuffle
  * carries k doubles per (partition, group) instead of every row — the
  * aggregation-pushdown alternative to a rank window (which must
  * shuffle ALL rows to sort them) when only the top k values matter.
  * Output is the values sorted descending, which is deterministic even
  * under ties (equal values are equal regardless of which row won).
  */
class TopKDoubles(k: Int)
    extends Aggregator[Double, Array[Double], Array[Double]] {
  require(k > 0, s"k=$k must be positive")

  override def zero: Array[Double] = Array.empty

  /** Insert into a sorted-descending buffer, keeping ≤ k values.
    * NaN is skipped: every NaN comparison is false, so admitting one
    * would break the sorted invariant and poison later binary searches
    * (and the oracle's SQL sort orders NaN deterministically, which a
    * poisoned buffer would not match).
    */
  override def reduce(buf: Array[Double], v: Double): Array[Double] = {
    if (v.isNaN) buf
    else if (buf.length == k && v <= buf(buf.length - 1)) buf
    else {
      // binary search for the insertion point in descending order
      var lo = 0
      var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (buf(mid) >= v) lo = mid + 1 else hi = mid
      }
      val n = math.min(buf.length + 1, k)
      val out = new Array[Double](n)
      System.arraycopy(buf, 0, out, 0, lo)
      if (lo < n) {
        out(lo) = v
        System.arraycopy(buf, lo, out, lo + 1,
          math.min(buf.length - lo, n - lo - 1))
      }
      out
    }
  }

  /** Merge two sorted-descending buffers, keeping the k largest. */
  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val n = math.min(a.length + b.length, k)
    val out = new Array[Double](n)
    var i = 0
    var j = 0
    var o = 0
    while (o < n) {
      if (j >= b.length || (i < a.length && a(i) >= b(j))) {
        out(o) = a(i); i += 1
      } else {
        out(o) = b(j); j += 1
      }
      o += 1
    }
    out
  }

  override def finish(buf: Array[Double]): Array[Double] = buf

  // native array<double> encoders — the buffer stays columnar-friendly
  // (no opaque java-serialized blobs in the aggregation state)
  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
