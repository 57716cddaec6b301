package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * ARRAY<FLOAT> embedding columns.
  *
  * Why a custom Expression instead of the higher-order-function
  * composition (`aggregate(zip_with(...))`): the HOF route allocates an
  * intermediate array and evaluates three lambda interpreters per row —
  * measured ~12 µs/pair on 64-dim vectors where the arithmetic itself is
  * ~100 ns. This expression reads both ArrayData buffers directly in one
  * fused loop inside WholeStageCodegen. The accumulation order is the
  * HOF formula's exact left-to-right double order (dot over the zipped
  * prefix, each norm over its own full array), so ON EQUAL-LENGTH inputs
  * results are bit-identical to the previous column formula and to the
  * DuckDB oracles (asserted in tests). Unequal-length inputs differ by
  * design: zip_with null-pads to the longer array so the old formula
  * returned NULL, whereas this expression computes the prefix-dot over
  * the shorter length (the behavior TextFingerprintSpec pins). All
  * engine corpora are uniform-dimension, so the oracle claim is scoped
  * to that case.
  *
  * Registered as SQL function `graft_cosine` via
  * [[GraftFunctions.register]]; used internally by graft.ops.Similarity
  * for every exact re-rank (brute-force, LSH, IVF).
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSimilarity.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Static helper invoked from generated code. Left-to-right double
    * accumulation identical to
    * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)), 0.0, _ + _) /
    *  (sqrt(aggregate(transform(a, x²))) * sqrt(aggregate(transform(b, x²))))`.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = math.min(na, nb)
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    var sa = 0.0
    i = 0
    while (i < na) { val x = a.getFloat(i).toDouble; sa += x * x; i += 1 }
    var sb = 0.0
    i = 0
    while (i < nb) { val x = b.getFloat(i).toDouble; sb += x * x; i += 1 }
    dot / (math.sqrt(sa) * math.sqrt(sb))
  }

  def register(registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit =
    registry.registerFunction(
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1)))
}
