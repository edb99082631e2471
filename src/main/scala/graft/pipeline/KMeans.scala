package graft.pipeline

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an `array<float>` embedding column —
  * the clustering workhorse behind curation pipelines (SemDeDup-style
  * cluster-then-prune, DSIR domain cells, diversity-balanced
  * sampling). Reference behavior: the reference's (N) pipeline
  * clusters embeddings before semantic pruning; here the iteration
  * itself is a first-class, oracle-checked operator (q182).
  *
  * Scale design — the classic Spark shape (what MLlib's KMeans also
  * does):
  *
  *  - centroids live on the DRIVER between iterations: O(k·d)
  *    doubles, broadcast back each pass. Collecting them truncates
  *    the lineage, so iteration i+1's plan does not re-execute
  *    iteration i (same reasoning as ConnectedComponents'
  *    localCheckpoint).
  *  - assignment is a broadcast join (k rows) + map-side argmin via
  *    `min(struct(d2, cl))` keyed by vec_id — the q50/SemDeDup
  *    pattern; no vectors×centroids pair stream survives to a sort.
  *  - the update is posexplode + a (cl, pos) aggregation: k·d grouping
  *    keys, full map-side combine, so the per-iteration shuffle volume
  *    is O(partitions · k · d), independent of n.
  *
  * Cross-engine determinism: distances are rounded to 6 dp before the
  * argmin (ties broken by cluster id), centroid means are rounded to
  * 6 dp before the next pass (the q49 pattern, oracle-green at sf1),
  * so both engines iterate over IDENTICAL centroid values and the
  * DuckDB oracle can replay the loop as an unrolled CTE chain.
  */
object KMeans {

  /** Deterministic init: the first k vectors by vec_id (the oracle
    * replays this as `WHERE vec_id < k`). Components are rounded like
    * every later centroid so all passes share one representation.
    */
  def init(e: DataFrame, k: Int): DataFrame =
    e.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cl"),
        transform(col("embedding"), x => round(x.cast("double"), 6)).as("cv"))

  /** Nearest-centroid assignment: broadcast the k centroids, rounded
    * argmin with cluster-id tie-break, aggregated map-side.
    */
  def assign(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("d2", round(V.dist2("embedding", "cv"), 6))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("cl"), col("embedding"))).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        col("best.cl").as("cl"), col("best.d2").as("d2r"))

  /** Lloyd update: per-(cluster, position) means, re-assembled into
    * ordered centroid arrays. Clusters that lose every member simply
    * drop out (both engines agree).
    */
  def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cl"), posexplode(col("embedding")))
      .toDF("cl", "pos", "v")
      .groupBy("cl", "pos")
      .agg(round(avg(col("v").cast("double")), 6).as("m"))
      .groupBy("cl")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("cv"))

  /** `iters` update rounds, then a final assignment under the settled
    * centroids. Each round materializes the k·d centroid values on
    * the driver (lineage truncation + the broadcast source for the
    * next pass).
    */
  def fit(e: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    var cents = init(e, k)
    for (_ <- 1 to iters) {
      val rows = update(assign(e, cents)).collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
        .toSeq.sortBy(_._1)
      cents = spark.createDataset(rows).toDF("cl", "cv")
    }
    assign(e, cents)
  }
}
