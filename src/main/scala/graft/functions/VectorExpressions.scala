package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns, with whole-stage codegen.
  *
  * Why an Expression and not the higher-order-function composition in
  * [[VectorOps.cosine]]: `zip_with`/`aggregate` evaluate through a lambda
  * interpreter with per-element boxing and a fresh intermediate array per
  * row — measured at ~40µs per 64-dim pair, which made the all-pairs
  * near-dup query (q20) take 87 s for 2k vectors at sf0.1. This expression
  * generates a tight primitive loop inside WholeStageCodegen (one fused
  * pass computing dot and both norms), ~3 orders of magnitude less per-pair
  * cost — the difference between a feasible and an infeasible exact pass
  * over a candidate set at 100 TB.
  *
  * Numerics are identical to the HOF version and to the DuckDB oracle:
  * each float widened to double, products accumulated left-to-right in
  * index order, final value dot / (‖a‖·‖b‖).
  *
  * Null semantics also match [[VectorOps.cosine]]: mismatched lengths and
  * null array elements yield NULL (zip_with pads the shorter side with
  * null, which nulls the whole fold), never a silently-wrong number.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  // mismatched lengths / null elements produce null from non-null inputs
  override def nullable: Boolean = true

  // ExpectsInputTypes is private[sql] surface in Spark 4; an explicit type
  // check keeps the analysis-time error without touching internals
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_f32"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val u = x.getFloat(i).toDouble
      val v = y.getFloat(i).toDouble
      dot += u * v; na += u * u; nb += v * v
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val u = ctx.freshName("u")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $u = (double) $a.getFloat($i);
         |    double $v = (double) $b.getFloat($i);
         |    $dot += $u * $v; $na += $u * $u; $nb += $v * $v;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane sign signature for cosine LSH, as a native codegen'd
  * expression: `nBits` sign bits of hash-derived hyperplane dot products,
  * packed into a long.
  *
  * Hyperplane b weights dimension i with
  * `floorMod(xxh64(b·1000003 + i), 1e6)/1e6 − 0.5` — deterministic on
  * every executor with zero driver state to broadcast (the property the
  * HOF predecessor also had). As an Expression the nBits×dim loop runs
  * compiled with one hash per (bit, dim) and no per-element boxing; the
  * equivalent `aggregate(zip_with(...))` composition evaluated the lambda
  * interpreter nBits·dim times per row.
  */
case class HyperplaneSignatureExpr(child: Expression, nBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if nBits >= 1 && nBits <= 64 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> and 1 <= nBits <= 64, " +
        s"got ${child.dataType.simpleString}, nBits=$nBits")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneSignatureExpr.signature(input.asInstanceOf[ArrayData], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.HyperplaneSignatureExpr.signature($v, $nBits)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignatureExpr =
    copy(child = newChild)
}

object HyperplaneSignatureExpr {
  /** w(b, i) ~ U[-0.5, 0.5) from xxh64 — shared by eval and codegen. */
  def weight(b: Int, i: Int): Double = {
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashLong(b.toLong * 1000003L + i, 42L)
    java.lang.Math.floorMod(h, 1000000L).toDouble / 1000000.0 - 0.5
  }

  /** Codegen entry point: the full signature loop as one static call. */
  def signature(v: ArrayData, nBits: Int): Long = {
    val n = v.numElements()
    var sig = 0L
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getFloat(i).toDouble * weight(b, i); i += 1 }
      if (dot >= 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}

/** In-row product-quantization encoder as a native codegen'd expression:
  * for each of the m subspaces, the argmin squared-L2 code against that
  * subspace's kSub literal sub-centroids (ties → lowest code), returned
  * as an array<int> of m codes.
  *
  * Why an Expression and not a composed Column tree: the flat-arithmetic
  * composition is m·kSub·subDim element_at/multiply nodes (~3–5k for the
  * 8×16×8 default) — ANALYSIS and codegen of that tree cost seconds per
  * action, which dominated q116/q118 (28 s of a 39 s query was planning,
  * on 2k rows). As one expression node the plan is O(1) to analyze and
  * the m×kSub×subDim loop runs as a single static call, with the books
  * attached via a codegen reference object rather than plan literals.
  *
  * Numerics match the flat form: floats widened to double, squared diffs
  * accumulated left-to-right in index order.
  */
case class PqEncodeExpr(child: Expression, books: Array[Array[Array[Float]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if books.nonEmpty && books.forall(_.nonEmpty) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> and nonempty codebooks, " +
        s"got ${child.dataType.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    PqEncodeExpr.encode(input.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "float[][][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.PqEncodeExpr.encode($v, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

object PqEncodeExpr {
  /** Shared by eval and codegen: one tight loop over (sub, code, dim).
    * The input length is validated against the codebooks' summed sub-dims:
    * trainPqBooks only sights the first row's dimension, so a ragged or
    * short embedding would otherwise read past the unsafe array buffer
    * and yield silent garbage codes. */
  def encode(v: ArrayData, books: Array[Array[Array[Float]]]): ArrayData = {
    val m = books.length
    var expected = 0
    var bi = 0
    while (bi < m) { expected += books(bi)(0).length; bi += 1 }
    if (v.numElements() != expected)
      throw new IllegalArgumentException(
        s"pq_encode: embedding has ${v.numElements()} elements but the " +
          s"codebooks cover $expected dims ($m subspaces); ragged input?")
    val codes = new Array[Int](m)
    var mi = 0
    var offset = 0
    while (mi < m) {
      val book = books(mi)
      val subDim = book(0).length
      var best = 0
      var bestDist = Double.MaxValue
      var ki = 0
      while (ki < book.length) {
        val cent = book(ki)
        var dist = 0.0
        var i = 0
        while (i < subDim) {
          val d = v.getFloat(offset + i).toDouble - cent(i).toDouble
          dist += d * d
          i += 1
        }
        if (dist < bestDist) { bestDist = dist; best = ki }
        ki += 1
      }
      codes(mi) = best
      offset += subDim
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }
}
