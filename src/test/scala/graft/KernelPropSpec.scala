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
}
