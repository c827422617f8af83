package graft.core

/** Local-filesystem helpers shared by gate queries and stream harnesses
  * (temp index/sink/warehouse directories). These operate on DRIVER-local
  * java.nio paths only — store-path operations that must work on an
  * object store go through Hadoop's FileSystem instead (see
  * StreamingReconcile.mergeFingerprintBatch). */
object Fs {

  /** Existence probe through Hadoop's FileSystem (resolves the path's own
    * scheme, so store/output paths on an object store work too). */
  def exists(spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Scratch directory for EPHEMERAL gate artifacts — the parity gates'
    * throwaway index trees and the stream harnesses' checkpoint/sink dirs,
    * all built and deleted inside one query. Prefers tmpfs (/dev/shm) when
    * the host has one: this I/O is pure scratch (the artifact never
    * outlives the query), so paying disk fsync/rename latency for it
    * measures the host's filesystem, not the engine. A PRODUCTION index
    * build passes its own durable path — every store API takes the path
    * explicitly and nothing routes real data through here. */
  def scratchDir(prefix: String): java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm))
      java.nio.file.Files.createTempDirectory(shm, prefix)
    else java.nio.file.Files.createTempDirectory(prefix)
  }

  /** Delete a directory tree, deepest-first. Missing path is a no-op.
    * The walk stream is closed eagerly (it holds a directory fd open;
    * relying on GC finalization leaks descriptors in a long-lived driver). */
  def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      val files = try walk.iterator().asScala.toSeq.reverse finally walk.close()
      files.foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }
}
