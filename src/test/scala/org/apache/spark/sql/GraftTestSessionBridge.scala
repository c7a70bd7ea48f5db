package org.apache.spark.sql

import org.apache.spark.SparkContext

/** Test-only bridge: build a SECOND SparkSession over the same
  * SparkContext with a given [[SparkSessionExtensions]] — what
  * `spark.sql.extensions=graft.sql.GraftExtensions` does at session build,
  * but testable in-process next to the shared test session (the public
  * builder's getOrCreate would just return the active session). The
  * constructor is session-internal, so this goes through reflection — it
  * is the exact constructor the builder itself calls.
  */
object GraftTestSessionBridge {
  def newSessionWithExtensions(
      sc: SparkContext, ext: SparkSessionExtensions): SparkSession = {
    val cls = Class.forName("org.apache.spark.sql.classic.SparkSession")
    val ctor = cls.getConstructors.find(_.getParameterCount == 6).getOrElse(
      sys.error(s"no 6-arg classic.SparkSession constructor in ${cls.getName}"))
    ctor.newInstance(sc, None, None, ext,
      Map.empty[String, String], Map.empty[String, String])
      .asInstanceOf[SparkSession]
  }
}
