package graft.store

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession

/** Datastore root → store → collection hierarchy
  * (reference: pystore/store.py:36-82; layout table in SURVEY §1.1).
  *
  * A store is a directory holding collections; a collection is a
  * directory holding items (Parquet datasets + metadata sidecars) and a
  * `_snapshots` dir. All heavy data lives in Parquet read/written by
  * Spark executors; this layer is thin driver-side path management.
  */
object GraftStore {
  val SnapshotsDir = "_snapshots"

  /** Default root: `~/graftstore`, overridable via env GRAFT_PATH
    * (reference: `~/pystore` / $PYSTORE_PATH, pystore/config.py:24). */
  def defaultRoot: Path =
    FsOps.expand(sys.env.getOrElse("GRAFT_PATH", "~/graftstore"))

  def apply(spark: SparkSession, name: String, root: Path = defaultRoot): GraftStore = {
    val p = root.resolve(name)
    Files.createDirectories(p)
    Meta.write(p, Meta.obj("engine" -> "spark-parquet", "created_by" -> "graft"))
    new GraftStore(spark, p)
  }

  def listStores(root: Path = defaultRoot): Seq[String] = FsOps.listDirs(root)

  def deleteStore(name: String, root: Path = defaultRoot): Boolean = {
    FsOps.deleteRecursively(root.resolve(name)); true
  }

  def deleteStores(root: Path = defaultRoot): Boolean = {
    listStores(root).foreach(deleteStore(_, root)); true
  }
}

final class GraftStore(val spark: SparkSession, val path: Path) {

  def name: String = path.getFileName.toString

  def listCollections(): Seq[String] = FsOps.listDirs(path)

  def collection(name: String, overwrite: Boolean = false): Collection = {
    val p = path.resolve(name)
    if (Files.exists(p) && overwrite) FsOps.deleteRecursively(p)
    Files.createDirectories(p.resolve(GraftStore.SnapshotsDir))
    new Collection(spark, p)
  }

  def deleteCollection(name: String): Boolean = {
    FsOps.deleteRecursively(path.resolve(name)); true
  }

  def item(collectionName: String, itemName: String): Item =
    collection(collectionName).item(itemName)

  /** Import a whole store written by the Python reference: every
    * collection dir (skipping `_snapshots`) and every item dir inside
    * it is imported through `Collection.importPystoreItem`. Returns
    * "collection/item" names imported. */
  def importPystore(srcRoot: Path,
                    indexCols: Seq[String] = Seq(Collection.DefaultIndex),
                    overwrite: Boolean = false): Seq[String] =
    FsOps.listDirs(srcRoot).filterNot(_ == GraftStore.SnapshotsDir).flatMap { coll =>
      val c = collection(coll)
      FsOps.listDirs(srcRoot.resolve(coll))
        .filterNot(d => d == GraftStore.SnapshotsDir || d.startsWith("_"))
        .map { it =>
          c.importPystoreItem(srcRoot.resolve(coll).resolve(it), it,
            indexCols, overwrite)
          s"$coll/$it"
        }
    }
}
