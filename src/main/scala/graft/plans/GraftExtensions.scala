package graft.plans

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point (SURVEY.md §4): registers the
  * engine's custom Catalyst expressions so any session configured
  * with `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) gets them in SQL.
  *
  * No custom Rule/SparkStrategy is injected — SURVEY §4's analysis
  * holds: Catalyst's built-ins cover the whole §2 inventory; the only
  * custom piece we measured a need for is the expression below.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression): Int = e.eval().asInstanceOf[Int]

  override def apply(e: SparkSessionExtensions): Unit = {
    def inject(name: String, cls: Class[_])(build: Seq[Expression] => Expression): Unit =
      e.injectFunction((
        FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), build))

    inject("md5long60", classOf[Md5Long60])(x => Md5Long60(x.head))
    inject("vecdot", classOf[VecDot])(x => VecDot(x(0), x(1)))
    inject("vecdist2", classOf[VecDist2])(x => VecDist2(x(0), x(1)))
    inject("sorted_intersect_count", classOf[SortedIntersectCount])(x =>
      SortedIntersectCount(x(0), x(1)))
    // the text/signature kernel family (round-2 wave)
    inject("tokens_ws", classOf[TokenizeWs])(x => TokenizeWs(x.head, distinct = false))
    inject("token_set_ws", classOf[TokenizeWs])(x => TokenizeWs(x.head, distinct = true))
    inject("minhash_bands", classOf[MinHashBands])(x =>
      MinHashBands(x.head, intLit(x(1)), intLit(x(2))))
    inject("minhash_sig", classOf[MinHashSig])(x =>
      MinHashSig(x.head, intLit(x(1))))
    inject("simhash32", classOf[SimHash32])(x => SimHash32(x.head))
    inject("ahash32", classOf[AHash32])(x => AHash32(x.head))
    inject("symbol_pairs", classOf[SymbolPairs])(x => SymbolPairs(x.head))
    inject("md5_sorted", classOf[Md5Sorted])(x => Md5Sorted(x.head))
    inject("bigram_hashes", classOf[BigramHashes])(x => BigramHashes(x.head))
    inject("bigram_strings", classOf[BigramStrings])(x => BigramStrings(x.head))
    inject("distinct_bigram_count", classOf[DistinctBigramCount])(x =>
      DistinctBigramCount(x.head))
    inject("char_shingle_hashes", classOf[CharShingleHashes])(x =>
      CharShingleHashes(x.head, intLit(x(1))))
    inject("shingle_fingerprint", classOf[ShingleFingerprint])(x =>
      ShingleFingerprint(x.head, intLit(x(1))))
    inject("interleave_bits", classOf[InterleaveBits])(x =>
      InterleaveBits(x.head, intLit(x(1))))
  }
}
