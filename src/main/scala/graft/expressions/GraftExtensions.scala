package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: exposes the engine's custom
  * Catalyst expressions to SQL users.
  *
  *   spark.builder.withExtensions(new GraftExtensions)  // or
  *   --conf spark.sql.extensions=graft.expressions.GraftExtensions
  *
  * then: SELECT minhash_sig(shingles, 64), simhash64(tokens) FROM docs
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(arr, numPerms) - MinHash signature of a string array"),
      (args: Seq[Expression]) => MinHashSigExpr(args.head,
        args(1).eval().asInstanceOf[Number].intValue())),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(arr) - 64-bit SimHash of a string array"),
      (args: Seq[Expression]) => SimHash64Expr(args.head)))

  /** Imperative registration for an already-built session (tests, REPL). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, fi, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, fi, builder)
    }
}
