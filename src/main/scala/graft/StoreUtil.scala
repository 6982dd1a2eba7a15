package graft

import org.apache.spark.sql.SparkSession

/** Shared store-layout plumbing for [[graft.tree.TreeStore]] and
  * [[graft.ops.VectorStore]]: marker-file manifests (a store directory
  * must self-identify before anything reads it as one) and deterministic
  * path hashes (catalog table names, temp store dirs).
  */
object StoreUtil {

  /** md5-hex prefix of a path — stable across sessions, collision-safe
    * enough for catalog-name/temp-dir discrimination.
    */
  def pathHash(path: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)

  private val tmpDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build-once temp directory for an on-disk store artifact, shared by
    * every store-backed gate (vector/KMV/CM/tree stores): the artifact is
    * built at most once per (prefix, key) per JVM, and the path carries
    * both a key hash and the JVM pid — two processes running the suite
    * concurrently on one host must never save() into the same directory
    * (a half-written store read by the other process is a flaky gate).
    */
  def cachedStoreDir(prefix: String, key: String)(
      build: String => Unit): String =
    tmpDirs.computeIfAbsent(prefix + "|" + key, _ => {
      val p = sys.props("java.io.tmpdir") +
        s"/graft_${prefix}_p${ProcessHandle.current().pid()}_" + pathHash(key)
      build(p)
      p
    })

  // FileSystem resolution goes through hadoop Path, not java.net.URI:
  // URI(dir) throws on spaces and percent-decodes '%41'→'A', silently
  // splitting the marker location from the data location.
  private def fsOf(spark: SparkSession,
      dir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def writeMarker(spark: SparkSession, dir: String, name: String,
      content: String): Unit = {
    val fs = fsOf(spark, dir)
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
    try out.write(content.getBytes("UTF-8"))
    finally out.close()
  }

  /** Remove a marker file (no-op when absent). */
  def deleteMarker(spark: SparkSession, dir: String, name: String): Unit = {
    val fs = fsOf(spark, dir)
    fs.delete(new org.apache.hadoop.fs.Path(dir, name), false)
    ()
  }

  /** Marker content, or None when absent — callers fail fast with their
    * own store-specific message.
    */
  def readMarker(spark: SparkSession, dir: String,
      name: String): Option[String] = {
    val fs = fsOf(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir, name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }
}

/** Per-session memo for session-bound objects (persisted DataFrames,
  * ingested fixtures, loaded store handles). Keyed by (session identity,
  * key): a second SparkSession in the same JVM — a harness that calls
  * spark.stop() and restarts — rebuilds instead of receiving objects
  * bound to a stopped SparkContext. Entries for dead sessions are
  * retained (bounded by sessions-per-JVM, in practice one or two).
  */
final class SessionCache[V] {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), V]()
  def get(s: SparkSession, key: String)(build: => V): V =
    m.computeIfAbsent((s, key), _ => build)
}
