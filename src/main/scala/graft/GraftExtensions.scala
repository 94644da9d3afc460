package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{MinHashSig, RelUrl, Slug}

/** SparkSessionExtensions entry point: registers the library's native
  * Catalyst functions so they're usable from SQL and `expr(...)`.
  *
  * Activate with either
  *   SparkSession.builder().withExtensions(new GraftExtensions) or
  *   --conf spark.sql.extensions=graft.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    val slug: (FunctionIdentifier, ExpressionInfo, FunctionBuilder) =
      (FunctionIdentifier("graft_slug"),
        info("graft_slug", "_FUNC_(str) - COIN-style URI slug"),
        (children: Seq[Expression]) => Slug(children.head))
    val minhash: (FunctionIdentifier, ExpressionInfo, FunctionBuilder) =
      (FunctionIdentifier("minhash_sig"),
        info("minhash_sig", "_FUNC_(str) - 64-perm MinHash signature aggregate"),
        (children: Seq[Expression]) => MinHashSig(children.head))
    val relurl: (FunctionIdentifier, ExpressionInfo, FunctionBuilder) =
      (FunctionIdentifier("relurl"),
        info("relurl", "_FUNC_(url, start) - relative URL from start to url"),
        (children: Seq[Expression]) => RelUrl(children(0), children(1)))
    ext.injectFunction(slug)
    ext.injectFunction(minhash)
    ext.injectFunction(relurl)
  }
}
