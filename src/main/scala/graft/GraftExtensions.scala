package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharNgrams, DotProduct, FixMojibake, MinHashSig, NormalizeNFKC, SortedIntersectSize, UnescapeHtml, WordNgrams, WordShingles, ZOrderKey}

/** Session extension registering graft's native Catalyst expressions, wired
  * through `spark.sql.extensions` (see [[Engine.builder]]) the same way a
  * user cluster would enable the library.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def register(
      ext: SparkSessionExtensions,
      name: String,
      arity: Int,
      className: String
  )(build: Seq[Expression] => Expression): Unit =
    ext.injectFunction(
      (
        FunctionIdentifier(name),
        new ExpressionInfo(className, name),
        (exprs: Seq[Expression]) => {
          if (exprs.length != arity)
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
              messageParameters = Map(
                "functionName" -> name,
                "expectedNum" -> arity.toString,
                "actualNum" -> exprs.length.toString,
                "docroot" -> "https://spark.apache.org/docs/latest"
              )
            )
          build(exprs)
        }
      )
    )

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "graft_nfkc", 1, classOf[NormalizeNFKC].getName)(e => NormalizeNFKC(e.head))
    register(ext, "graft_fix_mojibake", 1, classOf[FixMojibake].getName)(e => FixMojibake(e.head))
    register(ext, "graft_unescape_html", 1, classOf[UnescapeHtml].getName)(e => UnescapeHtml(e.head))
    register(ext, "graft_dot", 2, classOf[DotProduct].getName)(e => DotProduct(e.head, e(1)))
    register(ext, "graft_sorted_intersect_size", 2, classOf[SortedIntersectSize].getName)(e =>
      SortedIntersectSize(e.head, e(1))
    )
    register(ext, "graft_word_shingles", 2, classOf[WordShingles].getName)(e =>
      WordShingles(e.head, e(1))
    )
    register(ext, "graft_char_ngrams", 2, classOf[CharNgrams].getName)(e =>
      CharNgrams(e.head, e(1))
    )
    register(ext, "graft_word_ngrams", 2, classOf[WordNgrams].getName)(e =>
      WordNgrams(e.head, e(1))
    )
    register(ext, "graft_zorder", 2, classOf[ZOrderKey].getName)(e =>
      ZOrderKey(e.head, e(1))
    )
    register(ext, "graft_minhash_sig", 1, classOf[MinHashSig].getName)(e => MinHashSig(e.head))
  }
}
