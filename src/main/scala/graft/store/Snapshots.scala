package graft.store

import java.nio.charset.StandardCharsets

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Manifest snapshots — the object-store snapshot path (SURVEY §7.4.4).
  *
  * The reference snapshots by copytree (collection.py:529-543) and the
  * POSIX fast-path here hardlinks (O(files)); neither works on an
  * object store, where there is no link primitive and a byte copy of a
  * 100 TB collection is a non-starter. A manifest snapshot instead
  * PINS each flat item's current `_generation` (a per-commit id in the
  * sidecar) in a tiny JSON file — creation cost is O(items), zero
  * bytes moved.
  *
  * Copy-on-write keeps pinned generations readable: when a commit or
  * delete would destroy a pinned item's data directory, the directory
  * is RENAMED (O(1) metadata, not a copy) into
  * `_snapshots/.retained/<item>/<generation>/` first. Reading a
  * snapshot item resolves its pinned generation to the live directory
  * (if untouched since) or the retained one. Deleting a snapshot
  * drops its manifest and garbage-collects retained generations no
  * other manifest references (the refcount is the manifest scan —
  * snapshot counts are small and driver-side by construction).
  *
  * Time-layout items (monthly/daily/... directory layouts) mutate
  * per-period rather than whole-dir, so generation pinning doesn't
  * apply; the manifest path snapshots THEM by `linkOrCopyFile`
  * (hardlink on POSIX, copy elsewhere) into the snapshot directory —
  * correct everywhere, priced per time-layout item, and a candidate
  * for per-period generations if it ever dominates.
  */
object Snapshots {
  val RetainedDir = ".retained"
  private val ManifestSuffix = ".manifest.json"

  private def snapsDir(collectionPath: SPath): SPath =
    collectionPath.resolve(GraftStore.SnapshotsDir)

  def manifestFile(collectionPath: SPath, snap: String): SPath =
    snapsDir(collectionPath).resolve(snap + ManifestSuffix)

  def manifestExists(collectionPath: SPath, snap: String): Boolean =
    manifestFile(collectionPath, snap).exists

  /** Manifest snapshot names present in the collection. */
  def listManifests(collectionPath: SPath): Seq[String] =
    snapsDir(collectionPath).fs.listFiles(snapsDir(collectionPath).raw)
      .filter(_.endsWith(ManifestSuffix))
      .map(_.stripSuffix(ManifestSuffix))

  /** Current `_generation` of an item's sidecar (0 before the first
    * generation-stamped commit). */
  def generationOf(meta: Map[String, JValue]): Long =
    meta.get("_generation").map(Meta.unjv(_).asInstanceOf[Long]).getOrElse(0L)

  // ------------------------------------------------------------ create

  /** Write the manifest for `snap`: flat items pinned by generation
    * (sidecar embedded so snapshot reads don't depend on the live
    * sidecar), time-layout items link/copied into the snapshot dir. */
  def createManifest(collectionPath: SPath, snap: String,
                     items: Iterable[String]): Unit = {
    val fs = collectionPath.fs
    val entries = items.toSeq.sorted.flatMap { it =>
      val itemDir = collectionPath.resolve(it)
      val meta = Meta.read(itemDir)
      val isTime = meta.get("_layout").map(j => Meta.unjv(j).toString)
        .exists(Collection.TimeLayouts.contains)
      if (isTime) {
        // per-period mutation ⇒ no stable whole-dir generation to pin
        fs.snapshotRecursively(itemDir.raw,
          snapsDir(collectionPath).resolve(snap).resolve(it).raw)
        None
      } else Some(JField(it, JObject(List(
        JField("generation", JInt(BigInt(generationOf(meta)))),
        JField("sidecar", JObject(meta.toList))))))
    }
    val manifest = JObject(List(
      JField("created", JString(Meta.nowStamp())),
      JField("items", JObject(entries.toList))))
    fs.writeBytesAtomic(manifestFile(collectionPath, snap).raw,
      JsonMethods.pretty(JsonMethods.render(manifest))
        .getBytes(StandardCharsets.UTF_8))
  }

  private def readManifest(collectionPath: SPath,
                           snap: String): Option[Map[String, JValue]] = {
    val f = manifestFile(collectionPath, snap)
    if (!f.exists) None
    else JsonMethods.parse(new String(f.fs.readBytes(f.raw),
      StandardCharsets.UTF_8)) match {
      case JObject(fields) => Some(fields.toMap)
      case _ => None
    }
  }

  private def manifestItems(m: Map[String, JValue]): Map[String, (Long, Map[String, JValue])] =
    m.get("items") match {
      case Some(JObject(fields)) => fields.toMap.collect {
        case (it, JObject(e)) =>
          val em = e.toMap
          val gen = em.get("generation").map(Meta.unjv(_).asInstanceOf[Long]).getOrElse(0L)
          val sidecar = em.get("sidecar") match {
            case Some(JObject(sf)) => sf.toMap
            case _ => Map.empty[String, JValue]
          }
          it -> (gen, sidecar)
      }
      case _ => Map.empty
    }

  // ----------------------------------------------------------- resolve

  /** Resolve `item` inside manifest snapshot `snap` → (item dir to
    * read, frozen sidecar). None when the manifest doesn't exist or
    * doesn't carry the item. */
  def resolveManifestItem(collectionPath: SPath, snap: String, item: String)
      : Option[(SPath, Map[String, JValue])] =
    readManifest(collectionPath, snap).flatMap { m =>
      manifestItems(m).get(item).map { case (gen, sidecar) =>
        val live = collectionPath.resolve(item)
        val liveGen = generationOf(Meta.read(live))
        val dir =
          if (live.isDir && liveGen == gen) live
          else snapsDir(collectionPath).resolve(RetainedDir)
            .resolve(item).resolve(gen.toString)
        (dir, sidecar)
      }
    }

  // ------------------------------------------------- copy-on-write/GC

  /** Generations of `item` pinned by any manifest snapshot. */
  def pinnedGens(collectionPath: SPath, item: String): Set[Long] =
    listManifests(collectionPath).flatMap { snap =>
      readManifest(collectionPath, snap).toSeq
        .flatMap(m => manifestItems(m).get(item).map(_._1))
    }.toSet

  /** Before a commit/delete destroys `item`'s data dir: if its current
    * generation is pinned, rename the data dir (O(1)) into the
    * retained area. */
  def retainIfPinned(collectionPath: SPath, item: String): Unit = {
    val itemDir = collectionPath.resolve(item)
    val dataDir = itemDir.resolve(Item.DataDir)
    if (!dataDir.isDir) return
    val gen = generationOf(Meta.read(itemDir))
    if (pinnedGens(collectionPath, item).contains(gen)) {
      val dst = snapsDir(collectionPath).resolve(RetainedDir)
        .resolve(item).resolve(gen.toString)
      if (!dst.resolve(Item.DataDir).exists) {
        dst.mkdirs()
        collectionPath.fs.rename(dataDir.raw, dst.resolve(Item.DataDir).raw)
      }
    }
  }

  /** Drop retained generations no remaining manifest references. */
  def gcRetained(collectionPath: SPath): Unit = {
    val retained = snapsDir(collectionPath).resolve(RetainedDir)
    if (!retained.isDir) return
    val referenced: Set[(String, Long)] = listManifests(collectionPath)
      .flatMap { snap =>
        readManifest(collectionPath, snap).toSeq
          .flatMap(m => manifestItems(m).map { case (it, (g, _)) => (it, g) })
      }.toSet
    retained.listDirs.foreach { it =>
      val itemDir = retained.resolve(it)
      itemDir.listDirs.foreach { genName =>
        val keep = genName.toLongOption.exists(g => referenced.contains((it, g)))
        if (!keep) itemDir.resolve(genName).deleteRecursively()
      }
      if (itemDir.listDirs.isEmpty) itemDir.deleteRecursively()
    }
  }

  /** Delete one manifest snapshot (file + any copied time-layout item
    * dir) and GC newly-unreferenced retained generations. */
  def deleteManifest(collectionPath: SPath, snap: String): Unit = {
    val f = manifestFile(collectionPath, snap)
    if (f.exists) f.fs.deleteRecursively(f.raw)
    gcRetained(collectionPath)
  }
}
