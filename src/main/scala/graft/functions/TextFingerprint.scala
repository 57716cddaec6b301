package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's rolling document
  * fingerprint (base-257 polynomial mod 2^61−1, identical to
  * graft.nlp.Hashes.fingerprint).
  *
  * Why a custom Expression instead of the typed-Dataset map used
  * elsewhere: fingerprinting sits in scan-heavy curation sweeps where a
  * typed map forces whole-row deserialization and a String copy per
  * document. This expression stays inside WholeStageCodegen, reads the
  * UTF8String's bytes directly (no String materialization) and keeps
  * the scan's column pruning intact. Registered as SQL function
  * `graft_fingerprint` via [[GraftFunctions.register]].
  */
case class TextFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    TextFingerprint.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextFingerprint.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): TextFingerprint =
    copy(child = newChild)
}

object TextFingerprint {
  /** Static helper invoked from generated code — byte-level twin of
    * graft.nlp.Hashes.fingerprint (which goes through UTF-8 bytes too,
    * so the two are bit-identical; asserted in tests).
    */
  def hashBytes(bytes: Array[Byte]): Long = {
    val MOD = (1L << 61) - 1
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      val hi = h >>> 32
      val lo = h & 0xffffffffL
      var t = lo * 257 + (bytes(i) & 0xffL)
      val u = hi * 257
      t += ((u << 32) & MOD) + (u >>> 29)
      h = (t & MOD) + (t >>> 61)
      if (h >= MOD) h -= MOD
      i += 1
    }
    h
  }
}

/** Registration point for the engine's native SQL functions. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[TextFingerprint].getName, "graft_fingerprint"),
      (exprs: Seq[Expression]) => TextFingerprint(exprs.head))
    CosineSimilarity.register(spark.sessionState.functionRegistry)
  }
}
