package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable
import org.apache.spark.sql.functions._

/** Round-3 scalar/integrity tail: edit-distance fuzzy matching,
  * bitwise aggregates, and whole-table checksums — the remaining
  * named-function families both engines share.
  */
object Scalars2 {

  /** Levenshtein nearest-neighbour: for the first 20 documents, the
    * closest other document by edit distance over the 60-char prefix
    * — the fuzzy-match primitive for entity resolution when token
    * methods are too coarse. Probe side broadcasts; distance is an
    * exact integer so the argmin needs no rounding.
    */
  val q168 = Q(
    "q168_levenshtein_nearest",
    (s, dir) => {
      val d = Tables.docs(s, dir)
        .select(col("doc_id"), substring(col("text"), 1, 60).as("prefix"))
      val probes = d.filter(col("doc_id") < 20)
        .select(col("doc_id").as("query_id"), col("prefix").as("qp"))
      d.crossJoin(broadcast(probes))
        .filter(col("doc_id") =!= col("query_id"))
        .select(col("query_id"), col("doc_id"),
          levenshtein(col("qp"), col("prefix")).as("dist"))
        .groupBy("query_id")
        .agg(min(struct(col("dist"), col("doc_id"))).as("best"))
        .select(col("query_id"), col("best.doc_id").as("nearest_id"),
          col("best.dist").cast("long").as("dist")) // duck levenshtein is BIGINT
        .orderBy("query_id")
    },
    Some("""WITH d AS (
      |  SELECT doc_id, substr(text, 1, 60) AS prefix FROM documents),
      |pairs AS (
      |  SELECT q.doc_id AS query_id, c.doc_id AS doc_id,
      |    levenshtein(q.prefix, c.prefix) AS dist
      |  FROM d q JOIN d c ON q.doc_id < 20 AND c.doc_id <> q.doc_id),
      |ranked AS (
      |  SELECT query_id, doc_id, dist,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY dist, doc_id) AS rn
      |  FROM pairs)
      |SELECT query_id, doc_id AS nearest_id, dist
      |FROM ranked WHERE rn = 1 ORDER BY query_id""".stripMargin))

  /** Bitwise aggregates (bit_and / bit_or / bit_xor) over the event
    * ids per type — the named-aggregate family q13-q20 didn't cover.
    */
  val q169 = Q(
    "q169_bitwise_aggs",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          bit_and(col("event_id")).as("band"),
          bit_or(col("event_id")).as("bor"),
          bit_xor(col("event_id")).as("bxor"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type,
      |  bit_and(event_id) AS band, bit_or(event_id) AS bor,
      |  bit_xor(event_id) AS bxor, count(*) AS n
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin))

  /** Whole-table content checksum: xor of per-row portable hashes —
    * order-independent, so two replicas (or two engines) can compare
    * a 100 TB table with one scan each and exchange ONE number. The
    * row hash covers every column through a canonical string render;
    * xor's commutativity is what makes the aggregate shuffle-free
    * beyond the final combine.
    */
  val q170 = Q(
    "q170_table_checksum",
    (s, dir) => {
      def sig(table: String, cols: Seq[String]) = {
        val rendered = concat_ws("|", cols.map(c => col(c).cast("string")): _*)
        Tables.t(s, dir, table)
          .select(Portable.md5Long(rendered).as("h"))
          .agg(bit_xor(col("h")).as("checksum"), count(lit(1)).as("n_rows"))
          .select(lit(table).as("tbl"), col("checksum"), col("n_rows"))
      }
      sig("region", Seq("r_regionkey", "r_name"))
        .union(sig("nation", Seq("n_nationkey", "n_name", "n_regionkey")))
        .union(sig("supplier", Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal")))
        .orderBy("tbl")
    },
    Some(s"""SELECT 'region' AS tbl,
      |  bit_xor(${Portable.md5LongSql("concat_ws('|', r_regionkey, r_name)")}) AS checksum,
      |  count(*) AS n_rows
      |FROM region
      |UNION ALL
      |SELECT 'nation',
      |  bit_xor(${Portable.md5LongSql("concat_ws('|', n_nationkey, n_name, n_regionkey)")}),
      |  count(*)
      |FROM nation
      |UNION ALL
      |SELECT 'supplier',
      |  bit_xor(${Portable.md5LongSql("concat_ws('|', s_suppkey, s_name, s_nationkey, s_acctbal)")}),
      |  count(*)
      |FROM supplier
      |ORDER BY tbl""".stripMargin))

  val all: Vector[Q] = Vector(q168, q169, q170)
}
