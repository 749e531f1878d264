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
    Files.createDirectories(root.resolve(name))
    open(spark, SPath.local(root.resolve(name)))
  }

  /** Open a store rooted at a filesystem URI — the cluster path: any
    * scheme Spark's Hadoop integration can reach (`file:`, `hdfs:`,
    * `s3a:`, ...). Scheme-less paths use the POSIX backend. */
  def at(spark: SparkSession, rootUri: String): GraftStore = {
    val fs: StoreFs =
      if (rootUri.contains(":/")) new HadoopFs(spark.sessionState.newHadoopConf())
      else NioFs
    open(spark, SPath(fs, rootUri))
  }

  private def open(spark: SparkSession, p: SPath): GraftStore = {
    p.mkdirs()
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

final class GraftStore(val spark: SparkSession, val path: SPath) {

  def this(spark: SparkSession, nioPath: Path) = this(spark, SPath.local(nioPath))

  def name: String = path.name

  def listCollections(): Seq[String] = path.listDirs

  def collection(name: String, overwrite: Boolean = false): Collection = {
    val p = path.resolve(name)
    if (p.exists && overwrite) p.deleteRecursively()
    p.resolve(GraftStore.SnapshotsDir).mkdirs()
    new Collection(spark, p)
  }

  def deleteCollection(name: String): Boolean = {
    path.resolve(name).deleteRecursively(); true
  }

  def item(collectionName: String, itemName: String): Item =
    collection(collectionName).item(itemName)

  /** Import a whole store written by the Python reference: every
    * collection dir (skipping `_snapshots`) and every item dir inside
    * it is imported through `Collection.importPystoreItem`. With
    * `snapshots = true` each collection's `_snapshots/<name>` copytree
    * imports too (as graft directory snapshots readable via
    * `item(name, snapshot = ...)` — `Collection.importPystoreSnapshot`),
    * so the migrated store keeps its pinned history. Returns
    * "collection/item" (and "collection/_snapshots/name/item") names
    * imported. */
  def importPystore(srcRoot: Path,
                    indexCols: Seq[String] = Seq(Collection.DefaultIndex),
                    overwrite: Boolean = false,
                    snapshots: Boolean = false): Seq[String] =
    FsOps.listDirs(srcRoot).filterNot(_ == GraftStore.SnapshotsDir).flatMap { coll =>
      val c = collection(coll)
      val live = FsOps.listDirs(srcRoot.resolve(coll))
        .filterNot(d => d == GraftStore.SnapshotsDir || d.startsWith("_"))
        .map { it =>
          c.importPystoreItem(srcRoot.resolve(coll).resolve(it), it,
            indexCols, overwrite)
          s"$coll/$it"
        }
      val snapsSrc = srcRoot.resolve(coll).resolve(GraftStore.SnapshotsDir)
      val pinned = if (!snapshots) Nil else
        FsOps.listDirs(snapsSrc).flatMap { s =>
          c.importPystoreSnapshot(snapsSrc.resolve(s), s, indexCols, overwrite)
            .map(it => s"$coll/_snapshots/$s/$it")
        }
      live ++ pinned
    }

  /** Export the whole store in the Python reference's on-disk layout —
    * the inverse of [[importPystore]], so a pystore 1.0.1 user can get
    * their data BACK (each item through
    * [[Collection.exportPystoreItem]]: `part.N.parquet` files + a
    * `pystore_metadata.json` sidecar). With `snapshots = true` every
    * collection's snapshots export too, in the reference's own
    * `_snapshots/<name>/<item>/` shape (collection.py:529-543) with
    * the data and sidecar FROZEN at each cut — stock pystore opens
    * them with its normal `item(name, snapshot=...)` path. Returns
    * "collection/item" (and "collection/_snapshots/name/item") names
    * exported. */
  def exportPystore(destRoot: Path, overwrite: Boolean = false,
                    snapshots: Boolean = false): Seq[String] =
    listCollections().flatMap { coll =>
      val c = collection(coll)
      val live = c.listItems().toSeq.sorted.map { it =>
        c.exportPystoreItem(it, destRoot.resolve(coll).resolve(it), overwrite)
        s"$coll/$it"
      }
      val pinned = if (!snapshots) Nil else
        c.listSnapshots().flatMap { s =>
          c.snapshotItems(s).map { it =>
            c.exportPystoreItem(it,
              destRoot.resolve(coll).resolve("_snapshots").resolve(s).resolve(it),
              overwrite, snapshot = Some(s))
            s"$coll/_snapshots/$s/$it"
          }
        }
      live ++ pinned
    }
}
