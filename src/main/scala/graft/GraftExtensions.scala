package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.FixedDot

/** Session extension registering graft's native Catalyst expressions.
  * Activate with .config("spark.sql.extensions", "graft.GraftExtensions");
  * queries fall back to equivalent built-in compositions when absent.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("fixed_dot"),
      new ExpressionInfo(classOf[FixedDot].getName, "fixed_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FixedDot(exprs(0), exprs(1))))
  }
}
