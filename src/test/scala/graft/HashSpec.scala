package graft

import graft.functions.Md5Long60
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bit-twiddled fast hash to its portable definition:
  * parse the first 15 hex digits of md5 as a base-16 integer.
  */
class HashSpec extends AnyFunSuite {

  private def portable(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("Md5Long60.hash == parseLong(md5hex[0:15], 16) on random strings") {
    val g = Gen.oneOf(Gen.alphaNumStr, Gen.asciiPrintableStr, Gen.identifier)
    val samples = (0 until 500).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
    (samples :+ "" :+ "hp:0:1" :+ "0:token" :+ "ünïcodé 字").foreach { s =>
      assert(Md5Long60.hash(UTF8String.fromString(s)) == portable(s), s"input=$s")
    }
  }

  test("hash is non-negative and fits 60 bits") {
    (0 until 200).foreach { i =>
      val h = Md5Long60.hash(UTF8String.fromString(s"v$i"))
      assert(h >= 0 && h < (1L << 60))
    }
  }
}
