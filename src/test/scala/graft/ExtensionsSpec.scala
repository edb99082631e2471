package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.{GraftSqlBridge, SparkSessionExtensions}

/** The SparkSessionExtensions surface: every custom kernel must be
  * reachable as a SQL function through `spark.sql.extensions=
  * graft.plans.GraftExtensions`, not only via per-query register()
  * calls. The injection path is driven against the live registry and
  * each function is exercised through SQL.
  */
class ExtensionsSpec extends SparkSpec {

  test("injected functions resolve and compute through SQL") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftSqlBridge.registerInjectedFunctions(ext, spark)
    val row = spark.sql(
      """SELECT
        |  md5long60('abc') AS h,
        |  size(tokens_ws('a b a')) AS nt,
        |  size(token_set_ws('a b a')) AS ns,
        |  size(minhash_bands(array('x','y'), 2, 8)) AS nb,
        |  simhash32(array('x','y')) AS sh,
        |  size(md5_sorted(array('x','y'))) AS nms,
        |  size(bigram_hashes(array('a','b','a','b'))) AS nbg,
        |  distinct_bigram_count(array('a','b','a','b')) AS dbc,
        |  size(char_shingle_hashes('abcdefghij', 8)) AS ncs,
        |  shingle_fingerprint('abcdefghij', 8).n_shingles AS nsf,
        |  interleave_bits(array(2, 1), 2) AS z,
        |  round(vecdot(array(1.0D, 2.0D), array(3.0D, 4.0D)), 6) AS vd
        |""".stripMargin).head()
    assert(row.getLong(0) == graft.functions.Md5Long60.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc")))
    assert(row.getInt(1) == 3 && row.getInt(2) == 2)
    assert(row.getInt(3) == 2)
    assert(row.getInt(5) == 2)
    // bigrams of a,b,a,b: "a b","b a","a b" -> 2 distinct
    assert(row.getInt(6) == 2 && row.getInt(7) == 2)
    // 10 chars, window 8 -> 3 distinct windows
    assert(row.getInt(8) == 3 && row.getLong(9) == 3L)
    assert(row.getLong(10) == 6L) // (x=0b10, y=0b01) -> 0b0110
    assert(row.getDouble(11) == 11.0)
  }
}
