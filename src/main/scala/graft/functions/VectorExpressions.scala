package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Executor-side float-vector kernels called from generated code (the
  * static-forwarder pattern [[GraftCrypto]] uses). Reading elements
  * straight off `ArrayData` skips the Seq[Float] wrapper a Scala UDF
  * deserializes per call; the fold is the same left-to-right double
  * accumulation as every other cosine kernel in this engine, so the
  * value is bit-identical to the UDF's and the DuckDB oracle's.
  */
object VectorKernels {
  /** True if any element slot is null — callers return SQL NULL then,
    * matching the oracle's `list_cosine_similarity` (a silent 0.0 for
    * a null element would be a wrong-but-plausible score).
    */
  def hasNullElement(x: ArrayData): Boolean = {
    val n = x.numElements()
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return true
      i += 1
    }
    false
  }

  def cosine(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    // fail fast on ragged vectors (same discipline as kmeansAssign /
    // pqEncode / rerankExact): silent min-length truncation would score
    // wrong-but-plausible where the oracle's list_cosine_similarity
    // errors loudly
    require(n == y.numElements(),
      s"cosine: dimension mismatch ${n} vs ${y.numElements()}")
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      d += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    val norm = math.sqrt(na) * math.sqrt(nb)
    if (norm == 0.0) 0.0 else d / norm
  }
}

/** Cosine similarity of two `array<float>` columns as a NATIVE Catalyst
  * expression: codegen emits one static call inside whole-stage codegen
  * (no UDF boxing, no codegen fence), which is the preference order for
  * extending Spark — compose builtins, then a native expression, and a
  * UDF only after that. Used by the pairwise hot paths that score
  * inside a join condition ([[graft.operators.Similarity.semanticDedup]]).
  */
case class FloatVecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<float> inputs, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "fvec_cosine"

  // elements can be nullable in parquet-derived schemas: a null slot
  // yields SQL NULL (like the DuckDB oracle), never a silent 0.0. The
  // check is generated only when the schema says nulls are possible.
  private def elemNullable: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }
  }
  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (elemNullable &&
      (VectorKernels.hasNullElement(x) || VectorKernels.hasNullElement(y)))
      null
    else VectorKernels.cosine(x, y)
  }

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode
  ): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      if (elemNullable)
        s"""
           |if (graft.functions.VectorKernels.hasNullElement($a) ||
           |    graft.functions.VectorKernels.hasNullElement($b)) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = graft.functions.VectorKernels.cosine($a, $b);
           |}
         """.stripMargin
      else
        s"${ev.value} = graft.functions.VectorKernels.cosine($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

object FloatVecCosine {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      FloatVecCosine(GraftColumnBridge.expression(a),
        GraftColumnBridge.expression(b)))
}
