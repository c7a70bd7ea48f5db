package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets

/** Hadoop-FileSystem file utilities for the sharded layer: marker files,
  * shard-directory listings, and the retention rewrite's backup/rename
  * dance all go through the `FileSystem` API so a data root can be any
  * scheme Spark itself can read — `file:`, `hdfs:`, `s3a:`, ... (a 100 TB
  * cluster's shards live in an object store, not on a driver-local POSIX
  * path).
  *
  * The filesystem resolves against `sparkContext.hadoopConfiguration`
  * (already materialized — no per-call Configuration copy, which matters
  * on the serving path where the shard marker is stat'ed per query);
  * `FileSystem.get` caches instances per scheme+authority internally.
  */
object Fs {

  def fs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path); f.exists(p)
  }

  /** Modification time in millis, None when the file does not exist. */
  def mtime(spark: SparkSession, path: String): Option[Long] = {
    val (f, p) = fs(spark, path)
    if (f.exists(p)) Some(f.getFileStatus(p).getModificationTime) else None
  }

  def readString(spark: SparkSession, path: String): String = {
    val (f, p) = fs(spark, path)
    val in = f.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Overwrite `path` with `content`, creating parent dirs. */
  def writeString(spark: SparkSession, path: String, content: String): Unit = {
    val (f, p) = fs(spark, path)
    if (p.getParent != null) f.mkdirs(p.getParent)
    val out = f.create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Names of the immediate child DIRECTORIES of `path` (empty when the
    * path is missing or not a directory).
    */
  def listDirNames(spark: SparkSession, path: String): Seq[String] = {
    val (f, p) = fs(spark, path)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).iterator
      .filter(_.isDirectory).map(_.getPath.getName).toSeq
  }

  /** Recursive delete; false when the path did not exist. */
  def delete(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path)
    f.delete(p, true)
  }

  /** Rename src onto dst (dst must not exist — HDFS/object-store rename
    * semantics); false on failure.
    */
  def rename(spark: SparkSession, src: String, dst: String): Boolean = {
    val (f, p) = fs(spark, src)
    f.rename(p, new Path(dst))
  }

  /** (child file count, total child bytes) of `path`'s immediate entries;
    * (0, 0) when the path is missing — the deletes-sidecar fingerprint
    * shape (tombstone appends change count/bytes without touching any
    * manifest).
    */
  def dirStats(spark: SparkSession, path: String): (Long, Long) = {
    val (f, p) = fs(spark, path)
    if (!f.exists(p)) (0L, 0L)
    else {
      var n = 0L; var bytes = 0L
      f.listStatus(p).foreach { st => n += 1; bytes += st.getLen }
      (n, bytes)
    }
  }

  /** (modification time millis, length) of a file; None when missing. */
  def mtimeAndSize(spark: SparkSession, path: String): Option[(Long, Long)] = {
    val (f, p) = fs(spark, path)
    if (!f.exists(p)) None
    else { val st = f.getFileStatus(p); Some((st.getModificationTime, st.getLen)) }
  }

  def mkdirs(spark: SparkSession, path: String): Unit = {
    val (f, p) = fs(spark, path)
    f.mkdirs(p): Unit
  }
}
