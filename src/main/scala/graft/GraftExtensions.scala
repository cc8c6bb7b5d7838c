package graft

import graft.functions.{CosineSimilarityExpr, HyperplaneSignatureExpr, NfcNormalizeExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Engine extension point (`spark.sql.extensions=graft.GraftExtensions`,
  * set by GraftSession): registers the engine's native expressions with the
  * SQL function registry so `spark.sql("... cosine_f32(a, b) ...")` works
  * exactly like the DataFrame-side `VectorOps.cosineFast` — one
  * implementation, both front doors.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_f32"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_f32"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"cosine_f32 takes 2 arguments, got ${children.length}")
        CosineSimilarityExpr(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSignatureExpr].getName, "hyperplane_sig"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"hyperplane_sig takes (vector, nBits) arguments, got ${children.length}")
        val nBits = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"hyperplane_sig nBits must be an integer literal, got $other")
        }
        HyperplaneSignatureExpr(children.head, nBits)
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"nfc_normalize takes 1 argument, got ${children.length}")
        NfcNormalizeExpr(children.head)
      }))
  }
}
