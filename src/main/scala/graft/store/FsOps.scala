package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import scala.jdk.CollectionConverters._

/** Local/posix filesystem primitives for the store layout.
  *
  * The reference does all layout management with `os`/`shutil`
  * (pystore/utils.py:78-171). We isolate the same primitives here; on a
  * real cluster these calls would target `org.apache.hadoop.fs.FileSystem`
  * (same operation set: list/mkdirs/rename/delete-recursive), so the
  * store code above this layer is FS-agnostic.
  */
object FsOps {

  def listDirs(p: Path): Seq[String] =
    if (!Files.isDirectory(p)) Nil
    else {
      val st = Files.list(p)
      try st.iterator().asScala
        .filter(Files.isDirectory(_))
        .map(_.getFileName.toString)
        .toSeq.sorted
      finally st.close()
    }

  def listFiles(p: Path): Seq[String] =
    if (!Files.isDirectory(p)) Nil
    else {
      val st = Files.list(p)
      try st.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(_.getFileName.toString)
        .toSeq.sorted
      finally st.close()
    }

  def nonEmptyDir(p: Path): Boolean =
    Files.isDirectory(p) && {
      val st = Files.list(p)
      try st.iterator().hasNext finally st.close()
    }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val st = Files.walk(p)
      try st.sorted(Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete)
      finally st.close()
    }

  /** Recursive copy (used by v0 snapshots — reference collection.py:529-543).
    * Scale path: replace full copies with a manifest of immutable part
    * files (Iceberg-style); the Snapshot API above is unchanged.
    */
  def copyRecursively(src: Path, dst: Path, exclude: String => Boolean = _ => false): Unit = {
    val walk = Files.walk(src)
    try walk.iterator().asScala.foreach { s =>
      val rel = src.relativize(s)
      if (rel.getNameCount == 0 || !exclude(rel.getName(0).toString)) {
        val d = dst.resolve(rel)
        if (Files.isDirectory(s)) Files.createDirectories(d)
        else {
          Files.createDirectories(d.getParent)
          Files.copy(s, d, StandardCopyOption.REPLACE_EXISTING)
        }
      }
    } finally walk.close()
  }

  /** Recursive snapshot copy that HARDLINKS file content instead of
    * copying bytes — O(files), not O(bytes). Correct because the commit
    * protocol never mutates part-files in place (every commit writes
    * new files and swaps directories; deleting the old directory's
    * entries leaves snapshot-linked inodes alive). Falls back to a real
    * copy when the filesystem refuses links (e.g. cross-device).
    * The object-store analogue is a manifest of immutable object keys —
    * same API, same reasoning (SURVEY §7.4.4). */
  def snapshotRecursively(src: Path, dst: Path, exclude: String => Boolean = _ => false): Unit = {
    val walk = Files.walk(src)
    try walk.iterator().asScala.foreach { s =>
      val rel = src.relativize(s)
      if (rel.getNameCount == 0 || !exclude(rel.getName(0).toString)) {
        val d = dst.resolve(rel)
        if (Files.isDirectory(s)) Files.createDirectories(d)
        else {
          Files.createDirectories(d.getParent)
          try Files.createLink(d, s)
          catch { case _: UnsupportedOperationException | _: java.io.IOException =>
            Files.copy(s, d, StandardCopyOption.REPLACE_EXISTING)
          }
        }
      }
    } finally walk.close()
  }

  /** Atomic directory swap: move `newDir` into place at `target`,
    * keeping a backup of the old `target` for rollback.
    * This is the reference's M7 commit protocol (collection.py:619-675):
    * tmp → backup old → rename tmp → drop backup; restore on failure.
    * We always use it — never the reference's non-atomic
    * delete-then-move append path (collection.py:465-475).
    */
  def atomicSwap(target: Path, newDir: Path): Unit = {
    val backup = target.resolveSibling("__backup_" + target.getFileName)
    deleteRecursively(backup)
    val hadOld = Files.exists(target)
    try {
      if (hadOld) Files.move(target, backup, StandardCopyOption.ATOMIC_MOVE)
      Files.move(newDir, target, StandardCopyOption.ATOMIC_MOVE)
      if (hadOld) deleteRecursively(backup)
    } catch {
      case e: Throwable =>
        if (hadOld && !Files.exists(target) && Files.exists(backup))
          Files.move(backup, target, StandardCopyOption.ATOMIC_MOVE)
        throw new StorageError(s"atomic swap failed for $target: ${e.getMessage}")
    }
  }

  def expand(path: String): Path = {
    val p = if (path == "~") sys.props("user.home")
            else if (path.startsWith("~/")) sys.props("user.home") + path.substring(1)
            else path
    Paths.get(p).toAbsolutePath.normalize()
  }
}
