package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted graph edge store — the store-family lifecycle applied to
  * link analysis, so repeated centrality jobs skip the per-call edge
  * build. [[ClusterOps.prEdgeCache]] repartitions, sorts, and persists
  * the degree-joined edge table on EVERY PageRank call; this store
  * pays that layout once at save time (the reference pays its graph
  * build once at ingest and serves every traversal from the stored
  * topology — `/root/reference/src/main/java/opentree/GraphImporter
  * .java:154-210`) and loads it back PRE-PARTITIONED: edges and
  * per-source degrees are bucketed+sorted by `src` with the same
  * bucket count, so the serving join `edges ⋈ degrees ⋈ rank` does
  * zero exchange and zero sort on either stored side (PlanSpec locks
  * the executed plan); only the O(nodes) rank vector moves per round.
  *
  * Layout at `path`:
  *   - `edges/`    (src, dst)  bucketed+sorted by src
  *   - `degrees/`  (src, deg)  bucketed+sorted by src
  *   - `nodes/`    (id)        the distinct node set, small
  *   - `_graft_gstore.json`    manifest (version, buckets, n_edges,
  *                             optional last_batch)
  *
  * Degrees are stored DENORMALIZED from the edge rows because append
  * economics demand it: edge counts are additive, so growing the graph
  * folds the batch's per-src counts into the stored degree table
  * (O(nodes) rewrite) and appends the batch's edges (O(batch)) —
  * history edges are never re-scanned. A (src, dst, deg)-wide layout
  * would force rewriting every stored edge of any source the batch
  * touches.
  *
  * Crash protocol (the family discipline): the manifest is deleted
  * before any write and rewritten last, so a mid-save/append crash
  * leaves a store that REFUSES to load (rebuild or re-drive the batch)
  * instead of silently serving a half-written graph; a re-delivered
  * `batchId` equal to the recorded `last_batch` is a FULL no-op.
  */
object GraphStore {

  val ManifestFile = "_graft_gstore.json"
  val FormatVersion = 1

  /** The loaded store: `edges` and `degrees` arrive bucketed by `src`
    * (catalog-registered scans — joining them on `src` moves nothing);
    * `nodes` is the distinct node set.
    */
  case class Loaded(edges: DataFrame, degrees: DataFrame, nodes: DataFrame,
      buckets: Int)

  private def manifest(buckets: Int, nEdges: Long,
      lastBatch: Option[Long]): String =
    s"""{"version":$FormatVersion,"buckets":$buckets,"n_edges":$nEdges""" +
      lastBatch.map(id => s""","last_batch":$id""").getOrElse("") + "}"

  /** Build the store from an edge list (src, dst). Parallel edges are
    * kept — they act as weights, exactly as [[ClusterOps.pageRank]]
    * treats them.
    */
  def save(spark: SparkSession, edges: DataFrame, path: String,
      buckets: Int = 32, batchId: Option[Long] = None): Unit = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    // one pass is enough to serve all three tables, and the edge frame
    // may be expensive upstream (a join build): pin it for the span
    e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // materialize and validate BEFORE touching the manifest: a
      // mis-shaped or empty edge frame must fail with any existing
      // store at `path` untouched (the PostingsStore.save ordering) —
      // and an empty graph would otherwise write a healthy manifest
      // over a fileless bucketed layout, a store that probes healthy
      // but cannot load
      val nEdges = e.count()
      require(nEdges > 0, "refusing to save an empty graph store — " +
        "an edgeless save usually means the build-side join broke")
      graft.StoreUtil.deleteMarker(spark, path, ManifestFile)
      graft.tree.TreeStore.writeBucketed(spark, e, s"$path/edges", "src",
        buckets)
      graft.tree.TreeStore.writeBucketed(spark,
        e.groupBy(col("src")).agg(count(lit(1)).as("deg")),
        s"$path/degrees", "src", buckets)
      e.select(col("src").as("id"))
        .unionByName(e.select(col("dst").as("id"))).distinct()
        .write.mode("overwrite").parquet(s"$path/nodes")
      graft.StoreUtil.writeMarker(spark, path, ManifestFile,
        manifest(buckets, nEdges, batchId))
    } finally e.unpersist(blocking = false)
  }

  /** Grow the graph: append the batch's edges into the bucketed layout
    * and FOLD its per-src counts into the stored degrees — additive,
    * so stored edges are never re-scanned; the degree and node tables
    * (O(nodes), not O(edges)) are the only rewrites. The merged frames
    * are materialized BEFORE the overwrite (the appendCm rule: the
    * merge plan reads the files the write replaces).
    */
  def append(spark: SparkSession, path: String, edges: DataFrame,
      batchId: Option[Long] = None): Unit = {
    val mf = graft.StoreUtil.requireManifest(spark, path, ManifestFile,
      "graph store", FormatVersion)
    val prevLast = graft.ops.SketchOps.lastBatchId(spark, path, ManifestFile)
    if (batchId.isDefined && batchId == prevLast) return
    val buckets = graft.StoreUtil.manifestInt(mf, "buckets",
      s"graph store at $path")
    val nEdges = graft.StoreUtil.manifestLong(mf, "n_edges",
      s"graph store at $path")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // materialize the folded degree/node frames while the old files
      // are still readable
      val mergedDeg = ClusterOps.flatten(
        load(spark, path).degrees
          .unionByName(e.groupBy(col("src")).agg(count(lit(1)).as("deg")))
          .groupBy(col("src")).agg(sum(col("deg")).as("deg")))
      val mergedNodes = ClusterOps.flatten(
        spark.read.parquet(s"$path/nodes")
          .unionByName(e.select(col("src").as("id")))
          .unionByName(e.select(col("dst").as("id"))).distinct())
      val batchCount = e.count()
      graft.StoreUtil.deleteMarker(spark, path, ManifestFile)
      graft.tree.TreeStore.appendBucketed(spark, e, s"$path/edges", "src",
        buckets)
      graft.tree.TreeStore.writeBucketed(spark, mergedDeg,
        s"$path/degrees", "src", buckets)
      mergedNodes.write.mode("overwrite").parquet(s"$path/nodes")
      graft.StoreUtil.writeMarker(spark, path, ManifestFile,
        manifest(buckets, nEdges + batchCount,
          batchId.orElse(prevLast)))
    } finally e.unpersist(blocking = false)
  }

  def load(spark: SparkSession, path: String): Loaded = {
    val mf = graft.StoreUtil.requireManifest(spark, path, ManifestFile,
      "graph store", FormatVersion)
    val buckets = graft.StoreUtil.manifestInt(mf, "buckets",
      s"graph store at $path")
    Loaded(
      graft.tree.TreeStore.loadBucketed(spark, s"$path/edges", "src",
        buckets),
      graft.tree.TreeStore.loadBucketed(spark, s"$path/degrees", "src",
        buckets),
      spark.read.parquet(s"$path/nodes"),
      buckets)
  }

  /** Healthy-store probe — and the fail-fast for the crashed state
    * (data present, manifest gone), which must never be silently
    * re-created over.
    */
  def storeExists(spark: SparkSession, path: String): Boolean = {
    val healthy =
      graft.StoreUtil.readMarker(spark, path, ManifestFile).isDefined
    if (!healthy && graft.StoreUtil.pathExists(spark, path, "edges"))
      throw new IllegalStateException(
        s"$path holds edges but no $ManifestFile — a save or append " +
          "crashed mid-write; rebuild from source (or re-drive the " +
          "batch through save) rather than resetting history")
    healthy
  }

  /** Rewrite an append-grown store to one file per bucket at `dest` —
    * each append stacks another file set into every touched bucket, so
    * after k batches a rank round opens k files per bucket. The
    * manifest (including the `last_batch` zombie guard) carries over
    * verbatim.
    */
  def compact(spark: SparkSession, path: String, dest: String): Unit = {
    val mf = graft.StoreUtil.requireManifest(spark, path, ManifestFile,
      "graph store", FormatVersion)
    graft.StoreUtil.requireDisjoint(spark, path, dest, "compact")
    val st = load(spark, path)
    graft.StoreUtil.deleteMarker(spark, dest, ManifestFile)
    graft.tree.TreeStore.writeBucketed(spark, st.edges, s"$dest/edges",
      "src", st.buckets)
    graft.tree.TreeStore.writeBucketed(spark, st.degrees, s"$dest/degrees",
      "src", st.buckets)
    st.nodes.write.mode("overwrite").parquet(s"$dest/nodes")
    graft.StoreUtil.writeMarker(spark, dest, ManifestFile, mf)
  }
}
