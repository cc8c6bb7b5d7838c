package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from codegen'd
  * built-in higher-order functions (`zip_with`/`aggregate`/`transform`) —
  * no UDFs, so the expressions stay inside WholeStageCodegen and work on
  * any cluster size without serializing closures.
  *
  * All arithmetic is widened to double and folded left-to-right
  * (`aggregate` is a sequential fold), so results are bit-deterministic
  * for a given array — the property the DuckDB oracle comparison relies on.
  *
  * Reference analog: the closest thing the reference has to vector math is
  * the per-pixel numpy arithmetic inside its UDFs
  * (/root/reference/src/preprocessing_pipeline.py:77-98); here it is
  * declarative and distributed.
  */
object VectorOps {

  /** Σ a_i * b_i as double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Σ a_i^2 as double. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity in [-1, 1]; null-safe only to the extent the inputs are. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine via the codegen'd native expression
    * ([[CosineSimilarityExpr]]) — numerically identical to [[cosine]] but
    * ~1000× cheaper per pair (fused primitive loop inside
    * WholeStageCodegen vs interpreted higher-order lambdas). This is the
    * form every hot path (all-pairs near-dup, top-k scoring) uses.
    */
  def cosineFast(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSql.column(
      CosineSimilarityExpr(
        org.apache.spark.sql.GraftSql.expression(a),
        org.apache.spark.sql.GraftSql.expression(b)))

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, v) => acc + v))

  /** Element-wise scale: v * s as array<double>. */
  def scale(a: Column, s: Column): Column =
    transform(a, x => x.cast("double") * s.cast("double"))

  /** Random-hyperplane signature for cosine-LSH bucketing: `nBits` sign
    * bits packed into a long, computed by the native codegen'd
    * [[HyperplaneSignatureExpr]]. The "hyperplanes" are pseudo-random but
    * deterministic: plane b weights dimension i with a hash-derived value
    * in [-0.5, 0.5), so every executor (and every round) derives the same
    * planes with zero driver-side state to broadcast.
    */
  def hyperplaneSignature(vec: Column, nBits: Int): Column =
    org.apache.spark.sql.GraftSql.column(
      HyperplaneSignatureExpr(org.apache.spark.sql.GraftSql.expression(vec), nBits))
}
