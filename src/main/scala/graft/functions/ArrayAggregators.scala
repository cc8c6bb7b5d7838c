package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise array aggregators (typed `Aggregator`s, registered through
  * `functions.udaf`). Spark performs partial aggregation (map-side combine)
  * for UDAFs automatically, so these shuffle one fixed-width array per
  * group per partition.
  *
  * WeightedMeanAgg is the FedAvg production path (q23/q24). ArrayMinAgg /
  * ArraySumAgg are the general element-wise combiners for data whose width
  * is NOT a compile-time constant; the MinHash/SimHash operators moved to
  * compile-time-width scalar-aggregate / per-row forms for codegen
  * (see Dedup.minhashSignaturesFromShingles / Dedup.simhash64), and these
  * remain the API for dynamic-width vectors, spec-covered in
  * AggregatorSpec.
  */
object ArrayAggregators {
  // ExpressionEncoder is the Catalyst-native encoder; resolvable without a
  // live session (Aggregator subclasses have no spark.implicits in scope).
  private[functions] val longSeqEnc: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  private[functions] val longArrEnc: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  private[functions] val doubleSeqEnc: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  private[functions] val doubleArrEnc: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

/** Element-wise min over `array<long>` rows — the MinHash signature
  * combiner (SURVEY §2.5 D6): per (doc, shingle) row the input is the
  * vector of k hash values; the group result is the k-wide signature.
  */
class ArrayMinAgg(dim: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  override def zero: Array[Long] = Array.fill(dim)(Long.MaxValue)
  override def reduce(b: Array[Long], r: Seq[Long]): Array[Long] = {
    var i = 0; while (i < dim) { if (r(i) < b(i)) b(i) = r(i); i += 1 }; b
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0; while (i < dim) { if (b(i) < a(i)) a(i) = b(i); i += 1 }; a
  }
  override def finish(b: Array[Long]): Seq[Long] = b.toSeq
  override def bufferEncoder: Encoder[Array[Long]] = ArrayAggregators.longArrEnc
  override def outputEncoder: Encoder[Seq[Long]] = ArrayAggregators.longSeqEnc
}

/** Element-wise sum over `array<long>` rows — the SimHash bit-vote
  * combiner (each row votes ±weight per bit). */
class ArraySumAgg(dim: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  override def zero: Array[Long] = Array.fill(dim)(0L)
  override def reduce(b: Array[Long], r: Seq[Long]): Array[Long] = {
    var i = 0; while (i < dim) { b(i) += r(i); i += 1 }; b
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0; while (i < dim) { a(i) += b(i); i += 1 }; a
  }
  override def finish(b: Array[Long]): Seq[Long] = b.toSeq
  override def bufferEncoder: Encoder[Array[Long]] = ArrayAggregators.longArrEnc
  override def outputEncoder: Encoder[Seq[Long]] = ArrayAggregators.longSeqEnc
}

/** Weighted element-wise mean over `array<float>` vectors — the FedAvg
  * model-averaging aggregate (SURVEY §2.4 A5; reference:
  * /root/reference/src/federated_learning_pipeline.py:128-132, TFF
  * `build_weighted_fed_avg`). Input rows are (weight, vector); the result
  * is Σ w·v / Σ w as array<double>.
  *
  * Model width is RUNTIME state, taken from each group's first row — a
  * real model table's width is a property of the data, not a compile-time
  * constant. Rows of differing widths in one group are a corrupt model
  * table and fail fast (an element-wise mean over them has no meaning);
  * `expectDim >= 0` additionally pins the width to a declared value.
  * The zero buffer is the empty array (width not yet known): it is
  * width-polymorphic in `merge`, exactly like the scalar 0 in a sum.
  *
  * The buffer is one (sums, totalWeight) pair of model width — partial
  * aggregation makes the shuffle O(groups × width), independent of row
  * count, which is the `treeAggregate`-style two-level combine SURVEY §7.4
  * calls for.
  */
class WeightedMeanAgg(expectDim: Int = -1)
    extends Aggregator[(Double, Seq[Float]), (Array[Double], Double), Seq[Double]] {
  private def checked(width: Int): Int = {
    require(expectDim < 0 || width == expectDim,
      s"model width $width != declared width $expectDim")
    width
  }
  override def zero: (Array[Double], Double) = (Array.emptyDoubleArray, 0.0)
  override def reduce(b: (Array[Double], Double), r: (Double, Seq[Float])): (Array[Double], Double) = {
    val (sums0, w0) = b; val (w, v) = r
    // zero-width rows are rejected outright so the empty array stays an
    // unambiguous not-yet-initialized sentinel
    require(v.nonEmpty, "zero-width model vector")
    val sums = if (sums0.isEmpty) new Array[Double](checked(v.length)) else sums0
    require(v.length == sums.length,
      s"model width ${v.length} != group width ${sums.length}")
    var i = 0; while (i < sums.length) { sums(i) += w * v(i); i += 1 }
    (sums, w0 + w)
  }
  override def merge(a: (Array[Double], Double), b: (Array[Double], Double)): (Array[Double], Double) = {
    if (a._1.isEmpty) (b._1, a._2 + b._2)
    else if (b._1.isEmpty) (a._1, a._2 + b._2)
    else {
      require(a._1.length == b._1.length,
        s"model width ${b._1.length} != group width ${a._1.length}")
      var i = 0; while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }
  override def finish(b: (Array[Double], Double)): Seq[Double] = {
    val (sums, w) = b
    if (w == 0.0) sums.toSeq else sums.map(_ / w).toSeq
  }
  override def bufferEncoder: Encoder[(Array[Double], Double)] =
    Encoders.tuple(ArrayAggregators.doubleArrEnc, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Seq[Double]] = ArrayAggregators.doubleSeqEnc
}
