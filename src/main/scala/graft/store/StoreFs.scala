package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Filesystem backend for the store layout — the seam that makes the
  * store layer run against POSIX paths (`NioFs`) or any
  * `org.apache.hadoop.fs.FileSystem` URI (`HadoopFs`: `file:`,
  * `hdfs:`, `s3a:`, ...). The reference is local-path-bound
  * (pystore/utils.py:116-149); a 100 TB deployment reads and writes an
  * object store or HDFS, so every driver-side layout operation goes
  * through this trait. Paths are plain strings (`SPath` wraps one with
  * its backend) because both java.nio and Hadoop round-trip through
  * strings losslessly and Spark's readers take strings anyway.
  *
  * Operation set = the reference's utils.py list/mkdir/rename/delete
  * plus the commit/snapshot/lock primitives SURVEY §3.3 added. All ops
  * are driver-side control-plane calls on directories and sidecars —
  * the data plane (parquet bytes) always moves through Spark executors.
  */
trait StoreFs {
  def join(base: String, child: String): String
  def nameOf(p: String): String
  def parentOf(p: String): String

  def exists(p: String): Boolean
  def isDir(p: String): Boolean
  def mkdirs(p: String): Unit
  /** Immediate child directory names, sorted. */
  def listDirs(p: String): Seq[String]
  /** Immediate child regular-file names, sorted. */
  def listFiles(p: String): Seq[String]
  /** All regular files under `p`, as `/`-separated paths relative to
    * `p`, sorted (manifest building). */
  def listFilesRecursively(p: String): Seq[String]
  def deleteRecursively(p: String): Unit

  /** Rename src → dst. dst must not exist; atomic where the underlying
    * FS supports it (POSIX, HDFS — NOT object stores, where the commit
    * protocol should go through manifests instead). */
  def rename(src: String, dst: String): Unit

  def readBytes(p: String): Array[Byte]
  /** Write via temp file + rename so readers never observe a torn file. */
  def writeBytesAtomic(p: String, bytes: Array[Byte]): Unit
  /** Copy one regular file (parents created). */
  def copyFile(src: String, dst: String): Unit
  /** Link `dst` to `src`'s content without copying bytes, where the FS
    * supports it (POSIX hardlink); otherwise copy. */
  def linkOrCopyFile(src: String, dst: String): Unit

  /** First-caller-wins lock: atomically create `lockPath/owner` with
    * `owner` as content; false if the lock is already held. */
  def tryLock(lockPath: String, owner: String): Boolean

  /** Last-modification instant of a file or directory; None when the
    * path vanished (raced a delete) or the backend cannot say. Used
    * only for conservative AGE gates (vacuum sparing a possibly-live
    * writer's fresh staging) — never for ordering decisions, since
    * clocks across writers need not agree. */
  def modifiedAt(p: String): Option[java.time.Instant]

  // ---- protocol compositions (shared across backends) ----

  /** Atomic directory swap — the M7 commit protocol
    * (reference collection.py:619-675): move old target aside as a
    * backup, rename the new dir into place, drop the backup; restore
    * on failure. */
  def atomicSwap(target: String, newDir: String): Unit = {
    val backup = join(parentOf(target), "__backup_" + nameOf(target))
    deleteRecursively(backup)
    val hadOld = exists(target)
    try {
      if (hadOld) rename(target, backup)
      StoreFs.swapSeamHook(target) // no-op outside crash tests
      rename(newDir, target)
      if (hadOld) deleteRecursively(backup)
    } catch {
      case e: Throwable =>
        if (hadOld && !exists(target) && exists(backup)) rename(backup, target)
        throw new StorageError(s"atomic swap failed for $target: ${e.getMessage}")
    }
  }

  /** Recursive snapshot copy: hardlink file content where possible
    * (O(files), valid because commits swap directories and never
    * rewrite part-files in place), byte-copy otherwise. Directories
    * whose top-level name matches `exclude` are skipped. */
  def snapshotRecursively(src: String, dst: String,
                          exclude: String => Boolean = _ => false): Unit = {
    mkdirs(dst)
    listFilesRecursively(src).foreach { rel =>
      val top = rel.takeWhile(_ != '/')
      if (!exclude(top))
        linkOrCopyFile(join(src, rel), join(dst, rel))
    }
  }
}

/** A path bound to its backend — what the store layer passes around
  * instead of java.nio.file.Path. `toString` is the raw path/URI, which
  * is exactly what `spark.read.parquet` / `df.write.parquet` take. */
final case class SPath(fs: StoreFs, raw: String) {
  def resolve(child: String): SPath = SPath(fs, fs.join(raw, child))
  def parent: SPath = SPath(fs, fs.parentOf(raw))
  def resolveSibling(name: String): SPath = parent.resolve(name)
  def name: String = fs.nameOf(raw)
  def exists: Boolean = fs.exists(raw)
  def isDir: Boolean = fs.isDir(raw)
  def mkdirs(): Unit = fs.mkdirs(raw)
  def listDirs: Seq[String] = fs.listDirs(raw)
  def deleteRecursively(): Unit = fs.deleteRecursively(raw)
  override def toString: String = raw
}

object StoreFs {
  /** TEST SEAM: invoked between [[StoreFs.atomicSwap]]'s two renames —
    * the narrowest crash window of the commit protocol (old moved
    * aside, new not yet in place). Crash tests (a forked JVM that
    * halts itself here) prove vacuum's swap repair restores the
    * pre-commit state. Default no-op; never set in production. */
  private[graft] var swapSeamHook: String => Unit = _ => ()
}

object SPath {
  def local(p: java.nio.file.Path): SPath = SPath(NioFs, p.toString)
}

/** POSIX backend over java.nio — the single-machine path (and the test
  * default). Delegates to the pre-existing FsOps primitives. */
object NioFs extends StoreFs {
  private def np(p: String) = Paths.get(p)

  def join(base: String, child: String): String = np(base).resolve(child).toString
  def nameOf(p: String): String = np(p).getFileName.toString
  def parentOf(p: String): String = {
    val par = np(p).getParent
    if (par == null) "/" else par.toString
  }

  def exists(p: String): Boolean = Files.exists(np(p))
  def isDir(p: String): Boolean = Files.isDirectory(np(p))
  def mkdirs(p: String): Unit = Files.createDirectories(np(p))
  def listDirs(p: String): Seq[String] = FsOps.listDirs(np(p))

  def listFiles(p: String): Seq[String] = FsOps.listFiles(np(p))

  def listFilesRecursively(p: String): Seq[String] = {
    val root = np(p)
    if (!Files.isDirectory(root)) Nil
    else {
      val st = Files.walk(root)
      try st.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(f => root.relativize(f).iterator().asScala.mkString("/"))
        .toSeq.sorted
      finally st.close()
    }
  }

  def deleteRecursively(p: String): Unit = FsOps.deleteRecursively(np(p))

  def rename(src: String, dst: String): Unit =
    Files.move(np(src), np(dst), StandardCopyOption.ATOMIC_MOVE)

  def readBytes(p: String): Array[Byte] = Files.readAllBytes(np(p))

  def writeBytesAtomic(p: String, bytes: Array[Byte]): Unit = {
    val target = np(p)
    Files.createDirectories(target.getParent)
    // writer-unique temp: two processes writing the same target (e.g.
    // both opening a store stamps its root sidecar) must not steal each
    // other's in-flight temp — the loser's rename would throw on a
    // vanished file
    val tmp = target.resolveSibling(target.getFileName.toString +
      ".tmp." + java.util.UUID.randomUUID().toString.take(8))
    Files.write(tmp, bytes)
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def copyFile(src: String, dst: String): Unit = {
    Files.createDirectories(np(dst).getParent)
    Files.copy(np(src), np(dst), StandardCopyOption.REPLACE_EXISTING)
  }

  def linkOrCopyFile(src: String, dst: String): Unit = {
    Files.createDirectories(np(dst).getParent)
    try Files.createLink(np(dst), np(src))
    catch { case _: UnsupportedOperationException | _: java.io.IOException =>
      Files.copy(np(src), np(dst), StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def tryLock(lockPath: String, owner: String): Boolean =
    try {
      // atomic dir creation is the winner-picker (POSIX mkdir semantics,
      // reference transactions.py:289-362); owner lands inside it
      Files.createDirectory(np(lockPath))
      Files.write(np(lockPath).resolve("owner"),
        owner.getBytes(StandardCharsets.UTF_8))
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }

  def modifiedAt(p: String): Option[java.time.Instant] =
    try Some(Files.getLastModifiedTime(np(p)).toInstant)
    catch { case _: java.io.IOException => None }
}

/** Hadoop `FileSystem` backend — one implementation for every scheme
  * Spark itself can reach (`file:`, `hdfs:`, `s3a:`, `abfs:`, ...).
  * Renames are atomic on HDFS and POSIX-backed `file:`; on object
  * stores rename degrades to copy, which is why snapshots should use
  * the manifest path there (Snapshots.scala) rather than relying on
  * this backend's rename-based swap for large items. */
final class HadoopFs(conf: org.apache.hadoop.conf.Configuration) extends StoreFs {
  import org.apache.hadoop.fs.{FileSystem, Path => HPath}

  private def hp(p: String) = new HPath(p)

  /** Client-side checksums OFF for this backend's metadata traffic.
    * Only Hadoop's `file:` LocalFileSystem/LocalFs writes `.crc`
    * siblings, and both rename a file and its checksum in TWO steps —
    * a sidecar read racing writeBytesAtomic's publish rename can see
    * the new bytes under the old `.crc` and throw ChecksumException
    * for a healthy interleave (observed in the forked-JVM race suite;
    * the torn-read classifier retries it, but the generation PROBE
    * reads through the same window and a failed probe must
    * conservatively burn the corruption cap). With write checksums off
    * this backend never CREATES a `.crc` (ChecksumFs renames then
    * drop stale destination checksums), so the window cannot open.
    * HDFS/object stores checksum server-side and are unaffected.
    * Instances come from `FileSystem.newInstance`, NOT the process
    * cache — mutating the shared cached instance's checksum flags
    * would leak into Spark's own `file:` reads. */
  private val fsInstances = scala.collection.concurrent.TrieMap.empty[String, FileSystem]
  private def fsOf(p: HPath): FileSystem = {
    val uri = p.toUri
    val key = s"${uri.getScheme}://${Option(uri.getAuthority).getOrElse("")}"
    fsInstances.getOrElseUpdate(key, {
      val fs = FileSystem.newInstance(uri, conf)
      // Scoped to ChecksumFileSystem (file:/local): the `.crc` rename
      // race exists nowhere else, and disabling verification on HDFS
      // would weaken client-side corruption detection for no benefit.
      if (fs.isInstanceOf[org.apache.hadoop.fs.ChecksumFileSystem]) {
        fs.setVerifyChecksum(false)
        fs.setWriteChecksum(false)
      }
      fs
    })
  }

  def join(base: String, child: String): String = new HPath(hp(base), child).toString
  def nameOf(p: String): String = hp(p).getName
  def parentOf(p: String): String = {
    val par = hp(p).getParent
    if (par == null) p else par.toString
  }

  def exists(p: String): Boolean = { val h = hp(p); fsOf(h).exists(h) }
  def isDir(p: String): Boolean = {
    val h = hp(p); val fs = fsOf(h)
    fs.exists(h) && fs.getFileStatus(h).isDirectory
  }
  def mkdirs(p: String): Unit = { val h = hp(p); fsOf(h).mkdirs(h); () }

  def listDirs(p: String): Seq[String] = {
    val h = hp(p); val fs = fsOf(h)
    if (!exists(p) || !isDir(p)) Nil
    else fs.listStatus(h).toSeq.filter(_.isDirectory).map(_.getPath.getName).sorted
  }

  def listFiles(p: String): Seq[String] = {
    val h = hp(p); val fs = fsOf(h)
    if (!exists(p) || !isDir(p)) Nil
    else fs.listStatus(h).toSeq.filter(_.isFile).map(_.getPath.getName).sorted
  }

  def listFilesRecursively(p: String): Seq[String] = {
    val h = hp(p); val fs = fsOf(h)
    if (!isDir(p)) Nil
    else {
      val base = fs.getFileStatus(h).getPath.toUri.getPath
      val it = fs.listFiles(h, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val st = it.next()
        val full = st.getPath.toUri.getPath
        buf += full.stripPrefix(base).stripPrefix("/")
      }
      buf.toSeq.sorted
    }
  }

  def deleteRecursively(p: String): Unit = {
    val h = hp(p); fsOf(h).delete(h, true); ()
  }

  def modifiedAt(p: String): Option[java.time.Instant] =
    try {
      val h = hp(p)
      Some(java.time.Instant.ofEpochMilli(
        fsOf(h).getFileStatus(h).getModificationTime))
    } catch { case _: java.io.IOException => None }

  def rename(src: String, dst: String): Unit = {
    val s = hp(src); val d = hp(dst); val fs = fsOf(s)
    if (!fs.rename(s, d))
      throw new StorageError(s"rename $src -> $dst failed")
  }

  def readBytes(p: String): Array[Byte] = {
    val h = hp(p); val fs = fsOf(h)
    val in = fs.open(h)
    try {
      val len = fs.getFileStatus(h).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }

  def writeBytesAtomic(p: String, bytes: Array[Byte]): Unit = {
    val target = hp(p); val fs = fsOf(target)
    // writer-unique temp — same cross-process rationale as the POSIX
    // backend's
    val tmp = new HPath(target.getParent, target.getName + ".tmp." +
      java.util.UUID.randomUUID().toString.take(8))
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    // FileContext rename supports atomic OVERWRITE (HDFS/POSIX) — a
    // delete-then-rename pair would open a window where a crash leaves
    // NO sidecar at all, and a sidecar-less item reads as generation 0
    // with no period map, silently defeating snapshot retention.
    try {
      org.apache.hadoop.fs.FileContext.getFileContext(target.toUri, conf)
        .rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException | _: java.io.IOException
          if !fs.exists(target) || fs.exists(tmp) =>
        // backend without overwrite-rename: fall back, accepting the
        // window only where the atomic form is unavailable
        fs.delete(target, false)
        if (!fs.rename(tmp, target))
          throw new StorageError(s"sidecar rename failed for $p")
    }
  }

  def copyFile(src: String, dst: String): Unit = {
    val s = hp(src); val d = hp(dst)
    val sfs = fsOf(s); val dfs = fsOf(d)
    dfs.mkdirs(d.getParent)
    org.apache.hadoop.fs.FileUtil.copy(sfs, s, dfs, d,
      /*deleteSource=*/ false, /*overwrite=*/ true, conf)
    ()
  }

  /** No portable link primitive through the Hadoop API — copy. (For
    * O(files) snapshots on object stores use the manifest path.) */
  def linkOrCopyFile(src: String, dst: String): Unit = copyFile(src, dst)

  def tryLock(lockPath: String, owner: String): Boolean = {
    val ownerFile = hp(join(lockPath, "owner")); val fs = fsOf(ownerFile)
    try {
      // exclusive create of the owner FILE is the winner-picker — Hadoop
      // mkdirs() is not exclusive (returns true when the dir exists)
      val out = fs.create(ownerFile, /*overwrite=*/ false)
      try out.write(owner.getBytes(StandardCharsets.UTF_8)) finally out.close()
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.io.IOException if fs.exists(ownerFile) => false
    }
  }
}
