package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session extensions: registers the native Catalyst expressions
  * ([[graft.functions.VectorExpressions]]) as SQL functions.
  *
  * Apply at session build (`SparkSession.builder.withExtensions(new
  * GraftExtensions)`), or on a cluster via
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.VectorExpressions.registrations.foreach(ext.injectFunction)
}
