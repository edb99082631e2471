package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Storage-layout operators: bucketed (SMB) table write + the
  * co-located join that bucketing buys. At warehouse scale the
  * fact⋈fact shuffle is usually THE dominant cost of a recurring
  * join; writing both sides bucketed by the join key once turns
  * every subsequent join into a zero-exchange merge of co-located
  * buckets (PlanSpec pins the no-Exchange plan).
  */
object StorageOps {

  /** Drop + clear a managed table so a crashed prior JVM's leftover
    * warehouse directory cannot fail the CREATE (the in-memory
    * catalog forgets tables across JVMs; the directory survives).
    */
  private def reset(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir") + "/" + table)
    loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
  }

  /** Bucketed co-located join: lineitem and orders are written as
    * managed tables bucketed 8-ways on the order key (sorted within
    * buckets), then joined WITHOUT any shuffle — Spark matches the
    * two sides' bucket specs and plans a merge join over co-located
    * buckets. The write is part of the operator (it is the cost a
    * warehouse pays ONCE to make every recurring join exchange-free);
    * the revenue aggregate follows q04's exact-decimal money
    * convention. Oracle: the same join over the raw parquet — layout
    * must never change answers.
    */
  val q229 = Q(
    "q229_bucketed_colocated_join",
    (s, dir) => {
      reset(s, "b_lineitem")
      reset(s, "b_orders")
      Tables.t(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
      Tables.t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")
      s.table("b_lineitem")
        .join(s.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")), 2).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
      |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1
      |ORDER BY o_orderpriority""".stripMargin))

  val all: Vector[Q] = Vector(q229)
}
