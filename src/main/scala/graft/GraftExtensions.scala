package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.NormalizeNFKC

/** Session extension registering graft's native Catalyst expressions, wired
  * through `spark.sql.extensions` (see [[Engine.builder]]) the same way a
  * user cluster would enable the library.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("graft_nfkc"),
        new ExpressionInfo(classOf[NormalizeNFKC].getName, "graft_nfkc"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          if (exprs.length != 1)
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
              messageParameters = Map(
                "functionName" -> "graft_nfkc",
                "expectedNum" -> "1",
                "actualNum" -> exprs.length.toString,
                "docroot" -> "https://spark.apache.org/docs/latest"
              )
            )
          NormalizeNFKC(exprs.head)
        }
      )
    )
  }
}
