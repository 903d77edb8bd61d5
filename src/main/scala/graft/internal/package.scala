package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.GraftColumnBridge

/** Bridges between Catalyst Expressions and the Spark 4 Column API. */
package object internal {
  def exprColumn(e: Expression): Column = GraftColumnBridge.column(e)
  def columnExpr(c: Column): Expression = GraftColumnBridge.expression(c)
}

/** Version export (reference: py-geopolars/src/api.rs:8-11 `version()`). */
object BuildInfo {
  val name = "arcticspark"
  val version = "0.1.0"
  def versionString: String = s"$name $version (Spark ${org.apache.spark.SPARK_VERSION})"
}
