package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{AbsDiffSumLong, BandKeys, CharNgrams, DotProduct, FixMojibake, FlipBits, GramHash14, GramHash6, MinHashSig, NormalizeNFKC, PhashBits, PhashPix, QuantDist2, QuantSignDot, SortedIntersectSize, SqDiffSumLong, UnescapeHtml, WinMin, WordNgrams, WordShingles, ZOrderKey}

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
    register(ext, "graft_qd2", 2, classOf[QuantDist2].getName)(e => QuantDist2(e.head, e(1)))
    register(ext, "graft_l2sq_long", 2, classOf[SqDiffSumLong].getName)(e =>
      SqDiffSumLong(e.head, e(1))
    )
    register(ext, "graft_sad_long", 2, classOf[AbsDiffSumLong].getName)(e =>
      AbsDiffSumLong(e.head, e(1))
    )
    register(ext, "graft_qdot_long", 2, classOf[QuantSignDot].getName)(e =>
      QuantSignDot(e.head, e(1))
    )
    register(ext, "graft_gram_h6", 3, classOf[GramHash6].getName)(e =>
      GramHash6(e.head, e(1), e(2))
    )
    register(ext, "graft_win_min", 2, classOf[WinMin].getName)(e => WinMin(e.head, e(1)))
    register(ext, "graft_phash_pix", 1, classOf[PhashPix].getName)(e => PhashPix(e.head))
    register(ext, "graft_gram_h14", 3, classOf[GramHash14].getName)(e =>
      GramHash14(e.head, e(1), e(2))
    )
    register(ext, "graft_phash_bits", 2, classOf[PhashBits].getName)(e =>
      PhashBits(e.head, e(1))
    )
    register(ext, "graft_band_keys", 1, classOf[BandKeys].getName)(e => BandKeys(e.head))
    register(ext, "graft_flip_bits", 4, classOf[FlipBits].getName)(e =>
      FlipBits(e.head, e(1), e(2), e(3))
    )
  }
}
