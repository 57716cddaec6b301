package graft.functions

import org.apache.spark.sql.SparkSession
import graft.SparkSpec

/** The spark-submit registration path: `spark.sql.extensions=
  * graft.functions.GraftExtensions` must make the native expressions
  * available in plain SQL with no Scala-side register call. The config
  * string is a STATIC conf read from the SparkContext, so it cannot be
  * exercised over the suite's shared context — the test applies the SAME
  * injector through `builder.withExtensions` (spark-submit's path is
  * identical after the reflective `new GraftExtensions()`), on a second
  * session built over the shared context.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects the SQL functions at session build") {
    val orig = spark // force shared-session init before detaching it
    try {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      assert(s2 ne orig, "a fresh session must have been built")
      val r = s2.sql(
        """SELECT graft_fingerprint('the fast key order') AS f,
          |       graft_cosine(array(1.0F, 2.0F), array(2.0F, 4.0F)) AS c
          |""".stripMargin).head()
      assert(r.getLong(0) == graft.nlp.Hashes.fingerprint("the fast key order"))
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
