package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VecDot

/** Session extensions — the supported injection point for the engine's
  * custom Catalyst surface. Installing via
  * `spark.sql.extensions=graft.GraftExtensions` makes `vec_dot` a
  * first-class SQL function in every session of the application (including
  * thrift/connect servers), where `VecDot.register` only patches one
  * session's registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (es: Seq[Expression]) => VecDot(es.head, es(1))))
}
