package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DotProduct, NormalizeNFKC, SortedIntersectSize}

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
    ext.injectFunction(
      (
        FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          if (exprs.length != 2)
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
              messageParameters = Map(
                "functionName" -> "graft_dot",
                "expectedNum" -> "2",
                "actualNum" -> exprs.length.toString,
                "docroot" -> "https://spark.apache.org/docs/latest"
              )
            )
          DotProduct(exprs.head, exprs(1))
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_sorted_intersect_size"),
        new ExpressionInfo(classOf[SortedIntersectSize].getName, "graft_sorted_intersect_size"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          if (exprs.length != 2)
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
              messageParameters = Map(
                "functionName" -> "graft_sorted_intersect_size",
                "expectedNum" -> "2",
                "actualNum" -> exprs.length.toString,
                "docroot" -> "https://spark.apache.org/docs/latest"
              )
            )
          SortedIntersectSize(exprs.head, exprs(1))
        }
      )
    )
  }
}
