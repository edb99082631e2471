package graft

import graft.types.Types
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class TypesSpec extends AnyFunSuite {

  /** Deterministic sampling without the scalatest-scalacheck bridge
    * (not in the offline dependency cache).
    */
  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("dtype mapping mirrors the reference table incl. string fallback") {
    assert(Types.toSpark("int8") == ByteType)
    assert(Types.toSpark("int16") == ShortType)
    assert(Types.toSpark("int32") == IntegerType)
    assert(Types.toSpark("int64") == LongType)
    assert(Types.toSpark("float32") == FloatType)
    assert(Types.toSpark("float64") == DoubleType)
    assert(Types.toSpark("bool") == BooleanType)
    assert(Types.toSpark("date") == DateType)
    assert(Types.toSpark("datetime") == TimestampType)
    assert(Types.toSpark("unknown-thing") == StringType) // fallback rule
  }

  test("hive type rendering round-trips the primitive types") {
    assert(Types.hiveName(LongType) == "BIGINT")
    assert(Types.hiveName(ArrayType(FloatType)) == "ARRAY<FLOAT>")
    assert(Types.hiveName(MapType(StringType, IntegerType)) == "MAP<STRING,INT>")
  }

  test("sanitizer: known cases from the reference rules") {
    assert(Types.sanitizeTableName("my-table.csv") == "my_table_csv")
    assert(Types.sanitizeTableName("9lives") == "table_9lives")
    assert(Types.sanitizeTableName("x" * 50) == "x" * 32)
    assert(Types.sanitizeTableName("t", Some("123456")) == "t_123456")
    assert(Types.sanitizeTableName("t", Some("99123456")) == "t_123456") // 6-digit cap
  }

  test("property: sanitized names always match the identifier grammar") {
    samples(Gen.asciiPrintableStr).foreach { raw =>
      val name = Types.sanitizeTableName(raw, Some("123456"))
      assert(name.matches("[A-Za-z_][A-Za-z0-9_]*"), s"raw=$raw name=$name")
      assert(name.length <= Types.MaxNameLength + 7) // base + "_" + 6 digits
    }
  }

  test("property: sanitize is idempotent on its own output (modulo suffix)") {
    samples(Gen.alphaNumStr).filter(_.nonEmpty).foreach { raw =>
      val once = Types.sanitizeTableName(raw)
      assert(Types.sanitizeTableName(once) == once)
    }
  }
}
