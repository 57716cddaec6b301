package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` injector for the engine's native Catalyst
  * expressions — the spark-submit-friendly registration path:
  *
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  *
  * makes `graft_fingerprint(text)` and `graft_cosine(a, b)` available in
  * every session's SQL (incl. thrift/SQL-only clients that never touch
  * Scala code), equivalent to calling [[GraftFunctions.register]]
  * per-session. Injected functions land in the session registry at
  * session build time, so they also survive `newSession()`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[TextFingerprint].getName, "graft_fingerprint"),
      (exprs: Seq[Expression]) => TextFingerprint(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
  }
}
