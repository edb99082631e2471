package graft

import graft.functions.{SetOps, VecMath}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the codegen'd kernels against straightforward
  * Scala reference implementations — pure JVM, no Spark session.
  */
class KernelPropSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val sortedSet: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(-1000L, 1000L)).map(_.distinct.sorted.toArray)

  test("sortedIntersectCount == Set-based intersection size") {
    val pairs = samples(Gen.zip(sortedSet, sortedSet))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      val want = a.toSet.intersect(b.toSet).size
      val got = SetOps.sortedIntersectCount(
        new GenericArrayData(a), new GenericArrayData(b))
      assert(got == want, s"a=${a.mkString(",")} b=${b.mkString(",")}")
    }
  }

  private val vec: Gen[Array[Double]] =
    Gen.listOf(Gen.chooseNum(-10.0, 10.0)).map(_.toArray)

  test("dot == left-to-right fold over the common prefix") {
    samples(Gen.zip(vec, vec)).foreach { case (a, b) =>
      val n = math.min(a.length, b.length)
      var want = 0.0
      (0 until n).foreach(i => want += a(i) * b(i))
      val got = VecMath.dot(
        new GenericArrayData(a), new GenericArrayData(b), af = false, bf = false)
      assert(got == want) // bit-identical, not approximate
    }
  }

  test("dist2 == left-to-right pow fold over the common prefix") {
    samples(Gen.zip(vec, vec)).foreach { case (a, b) =>
      val n = math.min(a.length, b.length)
      var want = 0.0
      (0 until n).foreach(i => want += Math.pow(a(i) - b(i), 2))
      val got = VecMath.dist2(
        new GenericArrayData(a), new GenericArrayData(b), af = false, bf = false)
      assert(got == want)
    }
  }

  test("float inputs are widened exactly like CAST(x AS DOUBLE)") {
    val fvec: Gen[Array[Float]] =
      Gen.listOf(Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray)
    samples(Gen.zip(fvec, fvec), n = 200).foreach { case (a, b) =>
      val n = math.min(a.length, b.length)
      var want = 0.0
      (0 until n).foreach(i => want += a(i).toDouble * b(i).toDouble)
      val got = VecMath.dot(
        new GenericArrayData(a), new GenericArrayData(b), af = true, bf = true)
      assert(got == want)
    }
  }

  test("minhash_bands kernel == the portable seed:token formulation") {
    import graft.functions.{Md5Long60, MinHashBands}
    import org.apache.spark.unsafe.types.UTF8String
    val tokens: Gen[List[String]] =
      Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "δ-unicode", "42", ""))
    def reference(toks: List[String], bands: Int, rows: Int): Array[Long] =
      (0 until bands).map { b =>
        val parts =
          if (toks.isEmpty) Seq.empty
          else (0 until rows).map { j =>
            val sd = b * rows + j
            val minh = toks.map(t =>
              Md5Long60.hash(UTF8String.fromString(s"$sd:$t"))).min
            s"$sd:$minh"
          }
        Md5Long60.hash(UTF8String.fromString(
          s"$b|${parts.sorted.mkString(",")}"))
      }.toArray
    samples(tokens, n = 200).foreach { toks =>
      val got = MinHashBands.bandSigs(
        new GenericArrayData(toks.map(UTF8String.fromString).toArray), 2, 8)
        .toLongArray()
      assert(got.sameElements(reference(toks, 2, 8)), s"toks=$toks")
    }
  }

  test("minhash_sig kernel == per-seed min over md5long60(seed:tok)") {
    import graft.functions.{Md5Long60, MinHashSig}
    import org.apache.spark.unsafe.types.UTF8String
    val tokens: Gen[List[String]] =
      Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "δ-unicode", "42", ""))
    def reference(toks: List[String], seeds: Int): Array[Long] =
      (0 until seeds).map { sd =>
        if (toks.isEmpty) Long.MaxValue
        else toks.map(t => Md5Long60.hash(UTF8String.fromString(s"$sd:$t"))).min
      }.toArray
    samples(tokens, n = 200).foreach { toks =>
      val got = MinHashSig.sig(
        new GenericArrayData(toks.map(UTF8String.fromString).toArray), 16)
        .toLongArray()
      assert(got.sameElements(reference(toks, 16)), s"toks=$toks")
    }
  }

  test("tokenize_ws kernel == split('\\s+') + length filter [+ distinct]") {
    import graft.functions.TokenizeWs
    import org.apache.spark.unsafe.types.UTF8String
    // mixed content: words, every Java \s char, unicode (incl. NBSP
    //   which \s must NOT split on), repeats for the distinct leg
    val piece: Gen[String] = Gen.oneOf(
      "alpha", "beta", "beta", "δ", "漢字", " ", "x y",
      " ", "\t", "\n", "", "\f", "\r", "  ", "\r\n", "")
    val text: Gen[String] = Gen.listOf(piece).map(_.mkString)
    def reference(s: String, distinct: Boolean): Seq[String] = {
      val toks = s.split("\\s+", -1).toSeq.filter(_.nonEmpty)
      if (distinct) toks.distinct else toks
    }
    samples(text, n = 400).foreach { s =>
      Seq(false, true).foreach { d =>
        val got = TokenizeWs.tokenize(UTF8String.fromString(s), d)
        val gotSeq = (0 until got.numElements())
          .map(i => got.getUTF8String(i).toString)
        assert(gotSeq == reference(s, d), s"text=${s.map(_.toInt)} distinct=$d")
      }
    }
  }

  test("text kernels == the HOF formulations they replace") {
    import graft.functions.{Md5Long60, TextKernels}
    import org.apache.spark.unsafe.types.UTF8String
    def md5(s: String): Long = Md5Long60.hash(UTF8String.fromString(s))
    val toks: Gen[List[String]] =
      Gen.listOf(Gen.oneOf("a", "b", "a b", "δ", "漢", "x", "yy", ""))
    samples(toks, n = 300).foreach { ts =>
      val arr = new GenericArrayData(ts.map(UTF8String.fromString).toArray)
      // md5_sorted == array_sort(transform(_, md5long60))
      assert(TextKernels.md5Sorted(arr).toLongArray().toSeq ==
        ts.map(md5).sorted)
      // bigram_hashes == array_distinct(zip_with(slice, slice, md5(concat)))
      val bigrams = ts.sliding(2).filter(_.size == 2).map(p => s"${p(0)} ${p(1)}").toList
      assert(TextKernels.bigramHashes(arr).toLongArray().toSeq ==
        bigrams.map(md5).distinct)
      // distinct_bigram_count == size(array_distinct(zip_with(concat)))
      assert(TextKernels.distinctBigramCount(arr) == bigrams.distinct.size)
      // bigram_strings == zip_with(slice, slice, concat) — NON-distinct
      val gotBg = TextKernels.bigramStrings(arr)
      assert((0 until gotBg.numElements())
        .map(i => gotBg.getUTF8String(i).toString) == bigrams)
    }
    // char shingles: windows are Spark-substring (UTF-8 char) based,
    // so the reference walks the SAME substring primitive the
    // replaced expression called
    val text: Gen[String] = Gen.listOf(
      Gen.oneOf("ab", "c", " ", "δ", "漢字", "0")).map(_.mkString)
    samples(text, n = 300).foreach { s =>
      val u = UTF8String.fromString(s)
      val wins = (1 to u.numChars() - 7).map(i => md5(u.substringSQL(i, 8).toString))
      assert(TextKernels.charShingleHashes(u, 8, distinct = true)
        .toLongArray().toSeq == wins.distinct)
      val fp = TextKernels.shingleFingerprint(u, 8)
      if (wins.isEmpty) assert(fp.getLong(0) == -1L && fp.getLong(1) == 0L)
      else assert(fp.getLong(0) == wins.min && fp.getLong(1) == wins.distinct.size)
    }
  }

  test("simhash32 kernel == the exploded bit-vote formulation") {
    import graft.functions.{Md5Long60, SimHash32}
    import org.apache.spark.unsafe.types.UTF8String
    val tokens: Gen[List[String]] =
      Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "42", "x"))
        .map(_.distinct)
    def reference(toks: List[String]): Long =
      (0 until 32).map { i =>
        val bal = toks.map { t =>
          val h32 = Md5Long60.hash(UTF8String.fromString(t)) % 4294967296L
          2 * ((h32 / math.pow(2, i).toLong) % 2) - 1
        }.sum
        (if (bal >= 0) 1L else 0L) * math.pow(2, i).toLong
      }.sum
    samples(tokens, n = 200).foreach { toks =>
      val got = SimHash32.simhash(
        new GenericArrayData(toks.map(UTF8String.fromString).toArray))
      assert(got == reference(toks), s"toks=$toks")
    }
  }

  test("ahash32 kernel == the hex-domain mean-threshold formulation") {
    import graft.functions.AHash32
    val payloads: Gen[Array[Byte]] =
      Gen.chooseNum(0, 40).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    def reference(p: Array[Byte]): Long = {
      val bytes = p.take(32).map(_ & 0xff)
      val sum = bytes.map(_.toLong).sum
      bytes.zipWithIndex.collect {
        case (b, i) if b.toLong * 32 >= sum => 1L << i
      }.sum
    }
    samples(payloads, n = 300).foreach { p =>
      assert(AHash32.ahash(p) == reference(p), s"payload=${p.toSeq}")
    }
  }

  test("symbol_pairs kernel == the split + adjacent-concat formulation") {
    import graft.functions.SymbolPairs
    import org.apache.spark.unsafe.types.UTF8String
    val syms: Gen[List[String]] =
      Gen.listOf(Gen.oneOf("a", "b", "ab", "xyz", "q"))
    samples(syms, n = 300).foreach { ss =>
      val sy = " " + ss.mkString(" ") + " "
      val got = SymbolPairs.pairs(UTF8String.fromString(sy))
      val want = ss.sliding(2).collect {
        case List(x, y) => s"$x $y"
      }.toList
      val gotList = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString).toList
      assert(gotList == want, s"sy='$sy'")
    }
  }
}
