package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CharRollingHash

/** Session-extension entry point: `--conf
  * spark.sql.extensions=graft.plans.GraftExtensions` registers the
  * engine's native expressions cluster-wide (every session, every
  * executor) without per-session registration calls.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("char_rolling_hash"),
        new ExpressionInfo(classOf[CharRollingHash].getName, "char_rolling_hash"),
        (children: Seq[Expression]) => CharRollingHash(children.head)
      )
    )
  }
}
