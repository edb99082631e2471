package graft

import graft.catalog.Warehouse
import graft.ingest.CsvIngest
import graft.objectstore.ObjectStoreFileSystem
import org.apache.spark.sql.functions._

/** The engine against an `s3a://` object store (VERDICT r9 #2): the
  * reference's storage layer is MinIO/S3 (docker-compose.yml:124-143,
  * locations built at hive_manager.py:94-103), and "a user pointing
  * Warehouse at a bucket" was the single most likely untested first
  * action. ObjectStoreFileSystem binds the s3a scheme to an in-JVM
  * store with faithful S3 semantics (flat keys, close-time
  * visibility, copy+delete renames) — everything above the wire
  * protocol runs the REAL engine code path: Path.getFileSystem
  * resolution, datasource CSV scan, DDL LOCATION, commit-protocol
  * writes, drop-keeps-data.
  */
class ObjectStoreSpec extends SparkSpec {

  private lazy val wh = new Warehouse(spark)

  private def putObject(path: String, text: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write(text.getBytes("UTF-8"))
    out.close()
  }

  private val csv =
    "id,name,amount\n1,alpha,10.5\n2,beta,3.25\n3,gamma,99.0\n"

  test("upload -> layout normalize -> external table -> query -> drop keeps data") {
    ObjectStoreFileSystem.install(spark)
    ObjectStoreFileSystem.clearBucket("lake")
    // the post-upload state: one root-level object, like the tus
    // upload lands it (reference csv_processor.py:43-71 then moves it)
    putObject("s3a://lake/uploads/orders_up.csv", csv)
    val dir = CsvIngest.normalizeUploadLayoutFs(
      spark, "s3a://lake/uploads/orders_up.csv")
    assert(dir == "s3a://lake/uploads/orders_up")
    // normalize is idempotent once nested (reference re-entry case)
    assert(CsvIngest.normalizeUploadLayoutFs(
      spark, "s3a://lake/uploads/orders_up/orders_up.csv") == dir)
    val b = ObjectStoreFileSystem.bucketFor("lake")
    assert(b.objects.containsKey("uploads/orders_up/orders_up.csv"))
    assert(!b.objects.containsKey("uploads/orders_up.csv"))

    val t = wh.createExternalCsv("s3 orders!", dir)
    assert(wh.exists(t))
    val df = spark.table(t)
    assert(df.count() == 3)
    assert(df.filter(col("name") === "beta").select("amount")
      .head().getString(0) == "3.25")

    // DROP leaves the objects in the bucket — external semantics
    // against a store with no directories at all
    wh.drop(t)
    assert(!wh.exists(t))
    assert(b.objects.containsKey("uploads/orders_up/orders_up.csv"),
      "drop must keep object-store data")
    // and the kept data re-registers identically
    val t2 = wh.createExternalCsv("s3_orders_again", dir)
    assert(spark.table(t2).count() == 3)
    wh.drop(t2)
  }

  test("delimiter sniff + schema inference read through s3a") {
    ObjectStoreFileSystem.install(spark)
    putObject("s3a://lake/uploads/semi.csv", "a;b\n1;x\n2;y\n")
    assert(CsvIngest.sniffDelimiter(spark, "s3a://lake/uploads/semi.csv") == ";")
    val res = CsvIngest.ingest(spark, "s3a://lake/uploads/semi.csv", "semi")
    assert(res.delimiter == ";" && res.rowCount == 2)
    assert(res.columns.map(_._1) == Seq("a", "b"))
  }

  test("managed write commits through the object store's rename dance") {
    ObjectStoreFileSystem.install(spark)
    val df = spark.range(0, 100)
      .select(col("id"), (col("id") % 7).as("k"))
    // the FileOutputCommitter path: _temporary attempt dirs, per-task
    // renames (prefix copy+delete here), _SUCCESS marker
    df.coalesce(2).write.mode("overwrite").option("header", "true")
      .csv("s3a://lake/out/ids")
    val b = ObjectStoreFileSystem.bucketFor("lake")
    assert(b.objects.containsKey("out/ids/_SUCCESS"))
    val keys = b.objects.keySet().toArray(Array.empty[String])
    assert(!keys.exists(_.contains("_temporary")),
      "commit must clean its scratch prefix")
    val back = spark.read.option("header", "true").csv("s3a://lake/out/ids")
    assert(back.count() == 100)
    assert(back.agg(sum(col("id").cast("long"))).head().getLong(0) == 4950L)
  }

  test("storage health probe reaches the bucket") {
    ObjectStoreFileSystem.install(spark)
    val h = wh.health(Some("s3a://lake/warehouse"))
    assert(h.storage && h.engine && h.ok)
  }

  test("warehouse selfTest runs green against the bucket") {
    // the reference's (disabled) self-test, on object storage: create
    // scratch CSV -> external table -> probe -> drop -> data preserved
    ObjectStoreFileSystem.install(spark)
    val st = wh.selfTest(Some("s3a://lake/selftest"))
    assert(st.created && st.probed && st.dropped && st.dataPreserved && st.ok)
  }
}
