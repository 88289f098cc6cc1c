package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{CosineSimilarity, HilbertCode, KGrams, LshBucket, SignedProject, SimHash64}

/** Library extension entry point: installs graft's native expressions
  * into any session built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `builder.withExtensions(new GraftExtensions)`), which is how a user
  * of this engine gets `cosine_sim(...)` / `simhash64(...)` /
  * `lsh_bucket(...)` in plain SQL text on a real cluster — no
  * per-session registration calls. Each builder validates arity so a
  * misuse fails analysis with a clear message instead of an
  * IndexOutOfBoundsException (or silently dropping arguments).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        if (args.length != 2) throw new IllegalArgumentException(
          s"cosine_sim requires exactly 2 arguments, got ${args.length}")
        CosineSimilarity(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        if (args.length != 1) throw new IllegalArgumentException(
          s"simhash64 requires exactly 1 argument, got ${args.length}")
        SimHash64(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[LshBucket].getName, "lsh_bucket"),
      (args: Seq[Expression]) => LshBucket.build(args)))
    ext.injectFunction((
      FunctionIdentifier("hilbert_code"),
      new ExpressionInfo(classOf[HilbertCode].getName, "hilbert_code"),
      (args: Seq[Expression]) => HilbertCode.build(args)))
    ext.injectFunction((
      FunctionIdentifier("signed_project"),
      new ExpressionInfo(classOf[SignedProject].getName, "signed_project"),
      (args: Seq[Expression]) => SignedProject.build(args)))
    ext.injectFunction((
      FunctionIdentifier("kgrams"),
      new ExpressionInfo(classOf[KGrams].getName, "kgrams"),
      (args: Seq[Expression]) => KGrams.build(args)))
  }
}
