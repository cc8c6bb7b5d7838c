package graft

import graft.functions.CosineSimilarityExpr
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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
  }
}
