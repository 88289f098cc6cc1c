package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.CosineSimilarity

/** Library extension entry point: installs graft's native expressions
  * into any session built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `builder.withExtensions(new GraftExtensions)`), which is how a user
  * of this engine gets `cosine_sim(...)` in plain SQL text on a real
  * cluster — no per-session registration calls.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSimilarity(args.head, args(1))))
  }
}
