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

  def writeMarker(spark: SparkSession, dir: String, name: String,
      content: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
    try out.write(content.getBytes("UTF-8"))
    finally out.close()
  }

  /** Remove a marker file (no-op when absent). */
  def deleteMarker(spark: SparkSession, dir: String, name: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir, name), false)
    ()
  }

  /** Marker content, or None when absent — callers fail fast with their
    * own store-specific message.
    */
  def readMarker(spark: SparkSession, dir: String,
      name: String): Option[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(dir, name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }
}
