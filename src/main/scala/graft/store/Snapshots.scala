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
  * per-PERIOD rather than whole-dir, so they pin at period
  * granularity: the sidecar tracks `_period_gens` (period → commit
  * generation), the manifest records that map, and a partial commit
  * that rewrites a pinned period renames just that period's directory
  * into `.retained/<item>/periods/<period>/<gen>/`. Snapshot reads
  * assemble the item as a union of live (generation unchanged) and
  * retained period directories — creation stays O(periods) metadata,
  * zero bytes moved, and append cost keeps scaling with the batch
  * span. (Items written before `_period_gens` existed fall back to
  * link/copy freezing.)
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

  /** Per-period generations of a time-layout item's sidecar. */
  def periodGensOf(meta: Map[String, JValue]): Map[String, Long] =
    meta.get("_period_gens") match {
      case Some(JObject(fields)) => fields.toMap.map { case (p, g) =>
        p -> Meta.unjv(g).asInstanceOf[Long]
      }
      case _ => Map.empty
    }

  // ------------------------------------------------------------ create

  /** Write the manifest for `snap`: flat items pinned by whole-item
    * generation, time-layout items by their per-period generation map
    * (sidecars embedded so snapshot reads don't depend on the live
    * sidecar). Legacy time items with no `_period_gens` (written
    * before per-period tracking) are link/copied into the snapshot
    * dir instead. */
  def createManifest(collectionPath: SPath, snap: String,
                     items: Iterable[String]): Unit = {
    val fs = collectionPath.fs
    val entries = items.toSeq.sorted.flatMap { it =>
      val itemDir = collectionPath.resolve(it)
      val meta = Meta.read(itemDir)
      val isTime = meta.get("_layout").map(j => Meta.unjv(j).toString)
        .exists(Collection.TimeLayouts.contains)
      // the embedded sidecar drops the commit log: restore merges the
      // LIVE log back (plus its own entry), and a manifest over 100k
      // items must stay O(items) small JSON, not O(items * log cap)
      if (!isTime) Some(JField(it, JObject(List(
        JField("generation", JInt(BigInt(generationOf(meta)))),
        JField("sidecar", JObject((meta - History.Key).toList))))))
      else {
        val pg = periodGensOf(meta)
        if (pg.isEmpty) {
          fs.snapshotRecursively(itemDir.raw,
            snapsDir(collectionPath).resolve(snap).resolve(it).raw)
          None
        } else Some(JField(it, JObject(List(
          JField("period_gens", JObject(pg.toList.sortBy(_._1).map {
            case (p, g) => JField(p, JInt(BigInt(g)))
          })),
          JField("sidecar", JObject((meta - History.Key).toList))))))
      }
    }
    val manifest = JObject(List(
      JField("created", JString(Meta.nowStamp())),
      JField("items", JObject(entries.toList))))
    fs.writeBytesAtomic(manifestFile(collectionPath, snap).raw,
      JsonMethods.pretty(JsonMethods.render(manifest))
        .getBytes(StandardCharsets.UTF_8))
  }

  /** Creation instant of a manifest snapshot (the UTC stamp written at
    * [[createManifest]] time). None for dir snapshots / unknown names /
    * DAMAGED content (unparseable JSON or stamp) — content damage is a
    * durable property safe to classify on. Transient I/O errors
    * PROPAGATE: vacuum treating a read hiccup on a young in-flight pin
    * as "stale" would destroy the pin a live statement needs. */
  def manifestCreatedAt(collectionPath: SPath, snap: String): Option[java.time.Instant] = {
    val f = manifestFile(collectionPath, snap)
    if (!f.exists) return None
    val bytes = f.fs.readBytes(f.raw) // I/O failure propagates
    try JsonMethods.parse(new String(bytes, StandardCharsets.UTF_8)) match {
      case JObject(fields) => fields.toMap.get("created").collect {
        case JString(s) => Meta.parseStamp(s)
      }
      case _ => None
    } catch { case scala.util.control.NonFatal(_) => None } // content damage
  }

  /** The snapshot `TIMESTAMP AS OF t` resolves to: the latest manifest
    * whose creation stamp is ≤ t. Dir snapshots record no creation time
    * and cannot anchor timestamp travel (same restriction as CDC).
    * O(snapshots) tiny JSON reads, driver-side. */
  def latestManifestAtOrBefore(collectionPath: SPath,
                               t: java.time.Instant): Option[String] =
    userManifestStamps(collectionPath)
      .filter(!_._1.isAfter(t))
      .lastOption.map(_._2)

  /** Every USER manifest with its creation stamp, ascending by stamp —
    * the shared base of [[latestManifestAtOrBefore]] and the commit-log
    * window resolution (GraftCatalog timestamp travel). Internal pins
    * (`__`-prefixed txn/RTAS) are excluded: they pin ONE item
    * mid-statement and must never anchor time travel. */
  def userManifestStamps(collectionPath: SPath): Seq[(java.time.Instant, String)] =
    listManifests(collectionPath)
      .filterNot(_.startsWith("__"))
      .flatMap { s =>
        manifestCreatedAt(collectionPath, s) match {
          case Some(at) => Some(at -> s)
          case None if !manifestExists(collectionPath, s) =>
            None // deleted between the listing and the read: not a candidate
          case None =>
            // a USER manifest that exists but has no readable stamp is
            // damage: silently skipping it would resolve the query to an
            // OLDER snapshot — stale data with no error. Fail loudly.
            throw new GraftError(
              s"manifest snapshot '$s' is unreadable (corrupt file or " +
                "creation stamp) — cannot resolve TIMESTAMP AS OF safely; " +
                "repair or delete the snapshot")
        }
      }
      .sortBy(_._1)

  /** What `resolveAsOf` decided the state of an item at an instant is. */
  sealed trait AsOf
  /** The live state — the resolved commit is still the current one. */
  case object AsOfLive extends AsOf
  /** Pinned by a user manifest created while it was current. */
  final case class AsOfSnapshot(snap: String) extends AsOf

  /** Resolve the state of `item` at instant `t` — the ONE rule behind
    * the catalog's `TIMESTAMP AS OF` and the stream's
    * `startingTimestamp` (the two spellings must not diverge):
    *  - the latest commit-log entry stamped ≤ t is still the LIVE
    *    generation → [[AsOfLive]] (no snapshot needed at all);
    *  - it was rewritten since → the latest USER manifest created in
    *    the state's window AND verified to pin its generation →
    *    [[AsOfSnapshot]];
    *  - no manifest in the window → typed error naming the rewriting
    *    commit and what retention would have kept;
    *  - log empty or starting after t (pre-log writes, capped-out
    *    entries) → the legacy approximation: latest manifest whose
    *    CREATION stamp is ≤ t, or a typed error.
    *
    * The semantics are DATA-EXACT: metadata-only mutations (`alter`/
    * `set_properties`/`analyze`) log with the generation UNCHANGED and
    * neither begin nor end a state's window — travel resolves the DATA
    * bytes at `t`, and the declared schema/properties ride whatever the
    * resolved surface carries: the LIVE sidecar for [[AsOfLive]] (a
    * pre-alter instant with no later data commit serves the post-alter
    * declared schema), the manifest's FROZEN sidecar for
    * [[AsOfSnapshot]]. Pin metadata exactly with a manifest snapshot;
    * that is what the frozen sidecar is for. A state's window is
    * therefore [first entry carrying its gen, first later entry
    * carrying a DIFFERENT gen) — an alter between two data commits
    * must not orphan manifests created after it (round-10 regression),
    * and a manifest created between a data commit and a later alter
    * pins the same bytes.
    *
    * Stamp-in-window is necessary but not sufficient: creation stamps
    * come from wall clocks that can skew on shared storage, so the
    * chosen manifest must also VERIFY that it pins the resolved entry's
    * generation — resolving to a manifest pinning a different
    * generation would serve wrong bytes silently. Unverifiable
    * combinations (legacy gen-less manifests, flat-logged entries vs
    * period pins) stay resolvable by stamp alone.
    * Driver-side sidecar + manifest reads only. */
  def resolveAsOf(collectionPath: SPath, item: String,
                  t: java.time.Instant): AsOf = {
    val itemPath = collectionPath.resolve(item)
    val liveMeta = Meta.read(itemPath)
    val sidecarLog = History.entriesOf(liveMeta)
    // The sidecar log is capped (History.MaxEntries); a high-churn item
    // evicts its oldest entries to the spill area. Read the spill ONLY
    // when the asked instant predates the sidecar window — the common
    // case (recent instants) stays one sidecar read — and then only the
    // chunk-pruned PREFIX up to t (the name-borne first-entry stamps;
    // later chunks hold nothing an at-or-before lookup can resolve to),
    // so a deep travel into a million-commit item reads a couple of
    // chunks, not the whole archive.
    val log =
      if (sidecarLog.nonEmpty && !sidecarLog.head.at.isAfter(t)) sidecarLog
      else History.fullLogUpTo(itemPath, sidecarLog, t)
    log.filter(!_.at.isAfter(t)).lastOption match {
      case Some(e) if e.gen == generationOf(liveMeta) => AsOfLive
      case Some(e) =>
        // Window start: the FIRST entry carrying e.gen. When that first
        // entry is the head of a sidecar-only log, the generation's
        // ORIGIN (its data commit) may itself have been evicted — a
        // write followed by 250+ metadata-only mutations keeps the same
        // gen on every surviving entry, so the head is a late alter and
        // the naive start would exclude a valid pre-churn manifest.
        // Consult the spill in exactly that case (the origin sits at or
        // before e.at ≤ t, so the pruned prefix suffices there too).
        val horizon =
          if ((log eq sidecarLog) && log.headOption.exists(_.gen == e.gen))
            History.fullLogUpTo(itemPath, sidecarLog, t)
          else log
        val windowStart = horizon.find(_.gen == e.gen).map(_.at).getOrElse(e.at)
        // Window end: the first post-t commit of a DIFFERENT generation.
        // The pruned prefix carries no post-boundary spill entries, so
        // the deep case scans FORWARD chunk by chunk (stopping at the
        // first hit — usually the very next data commit) before falling
        // back to the sidecar half.
        val windowEnd =
          (if (log eq sidecarLog)
             log.find(x => x.at.isAfter(t) && x.gen != e.gen).map(_.at)
           else
             History.firstSpilledAfterWithOtherGen(itemPath, t, e.gen).map(_.at)
               .orElse(sidecarLog.find(x => x.at.isAfter(t) && x.gen != e.gen)
                 .map(_.at)))
          .getOrElse(java.time.Instant.MAX)
        userManifestStamps(collectionPath)
          .filter { case (at, _) => !at.isBefore(windowStart) && at.isBefore(windowEnd) }
          .filter { case (_, s) =>
            manifestPins(collectionPath, s, item).exists(pinsGeneration(_, e)) }
          .lastOption.map(x => AsOfSnapshot(x._2))
          .getOrElse(throw new GraftError(
            s"the state of '$item' at $t (generation ${e.gen}, committed " +
              s"${Meta.stampOf(e.at)}, op ${e.op}) was rewritten at " +
              s"${Meta.stampOf(windowEnd)} and no manifest snapshot pinned it " +
              "— create manifest snapshots before rewrites to retain " +
              "time-travel anchors"))
      case None =>
        latestManifestAtOrBefore(collectionPath, t).map(AsOfSnapshot.apply)
          .getOrElse(throw new GraftError(
            s"no manifest snapshot of collection '${collectionPath.name}' " +
              s"predates $t and the commit log of '$item' starts later" +
              log.headOption.map(h =>
                s" (first logged commit ${Meta.stampOf(h.at)})")
                .getOrElse(" (no logged commits)") +
              " — dir snapshots record no creation time; create manifest " +
              "snapshots to enable timestamp travel"))
    }
  }

  /** Does a manifest's pin of an item match a commit-log entry's
    * generation? The clock-skew guard of [[resolveAsOf]]: a pinned
    * period the entry touched must carry the entry's gen; periods the
    * manifest does NOT pin don't veto (the entry may have REMOVED
    * them — a pruned delete's touched list includes removed months).
    * `Left(0)` (legacy gen-less manifests) and flat-logged entries
    * against period pins cannot be verified and pass — availability
    * over a check that cannot be made. */
  private def pinsGeneration(pins: Either[Long, Map[String, Long]],
                             e: History.Entry): Boolean = pins match {
    case Left(g) => g == 0L || g == e.gen
    case Right(pg) => e.periods.forall(p => pg.get(p).forall(_ == e.gen))
  }

  /** Item names pinned by manifest `snap`; None when the snapshot is
    * missing or is a directory snapshot (no manifest file). Drives
    * collection-wide restore: the rollback set is these ∪ the live
    * items (live-only names were created after the cut → removed). */
  def manifestItemNames(collectionPath: SPath, snap: String): Option[Seq[String]] =
    readManifest(collectionPath, snap).map(m => manifestItems(m).keys.toSeq.sorted)

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

  private final case class Entry(gen: Option[Long],
                                 periodGens: Map[String, Long],
                                 sidecar: Map[String, JValue])

  private def manifestItems(m: Map[String, JValue]): Map[String, Entry] =
    m.get("items") match {
      case Some(JObject(fields)) => fields.toMap.collect {
        case (it, JObject(e)) =>
          val em = e.toMap
          val gen = em.get("generation").map(Meta.unjv(_).asInstanceOf[Long])
          val pg = em.get("period_gens") match {
            case Some(JObject(pf)) => pf.toMap.map { case (p, g) =>
              p -> Meta.unjv(g).asInstanceOf[Long]
            }
            case _ => Map.empty[String, Long]
          }
          val sidecar = em.get("sidecar") match {
            case Some(JObject(sf)) => sf.toMap
            case _ => Map.empty[String, JValue]
          }
          it -> Entry(gen, pg, sidecar)
      }
      case _ => Map.empty
    }

  // ----------------------------------------------------------- resolve

  /** What a manifest-snapshot item read resolves to. */
  sealed trait Resolved { def sidecar: Map[String, JValue] }
  /** Flat item: one dir (live while the generation is unchanged,
    * retained otherwise) laid out like an item dir (data/ inside). */
  final case class FlatResolved(dir: SPath,
                                sidecar: Map[String, JValue]) extends Resolved
  /** Time-layout item: one parquet dir per pinned period. */
  final case class PeriodResolved(periodDirs: Seq[(String, SPath)],
                                  sidecar: Map[String, JValue]) extends Resolved

  private def retainedBase(collectionPath: SPath, item: String): SPath =
    snapsDir(collectionPath).resolve(RetainedDir).resolve(item)

  /** True when any manifest snapshot carries an entry keyed `item`, or
    * the item owns a retained-generation area. The rename-rollback
    * detector: a rename target is a brand-new name, so any appearance
    * of it here means [[renameItemPins]] already began mutating state
    * and a failed rename must roll FORWARD (via its intent journal)
    * rather than be withdrawn. O(manifests) JSON reads, no data. */
  def itemPinStateExists(collectionPath: SPath, item: String): Boolean =
    retainedBase(collectionPath, item).isDir ||
      listManifests(collectionPath).exists(snap =>
        readManifest(collectionPath, snap)
          .exists(m => manifestItems(m).contains(item)))

  /** Resolve `item` inside manifest snapshot `snap`. None when the
    * manifest doesn't exist or doesn't carry the item. */
  def resolveManifestItem(collectionPath: SPath, snap: String, item: String)
      : Option[Resolved] =
    readManifest(collectionPath, snap).flatMap { m =>
      resolveEntry(collectionPath, item, manifestItems(m).get(item))
    }

  /** [[resolveManifestItem]] against an ALREADY-PARSED entry — restore
    * reads the manifest once and resolves from that single read (a
    * re-read could race a concurrent deletion into the None arm, whose
    * semantics are "item born after the cut → delete it"). */
  private def resolveEntry(collectionPath: SPath, item: String,
                           entry: Option[Entry]): Option[Resolved] =
      entry.map { e =>
        val live = collectionPath.resolve(item)
        val liveMeta = Meta.read(live)
        if (e.periodGens.nonEmpty) {
          val livePg = periodGensOf(liveMeta)
          val dirs = e.periodGens.toSeq.sortBy(_._1).map { case (p, g) =>
            val liveDir = live.resolve(Item.DataDir)
              .resolve(s"${Collection.MonthCol}=$p")
            val dir =
              if (livePg.get(p).contains(g) && liveDir.isDir) liveDir
              else retainedBase(collectionPath, item)
                .resolve("periods").resolve(p).resolve(g.toString)
            (p, dir)
          }
          PeriodResolved(dirs, e.sidecar)
        } else {
          val gen = e.gen.getOrElse(0L)
          val dir =
            if (live.isDir && generationOf(liveMeta) == gen) live
            else retainedBase(collectionPath, item).resolve(gen.toString)
          FlatResolved(dir, e.sidecar)
        }
      }

  /** Re-key item `from` to `to` in every manifest (user AND internal —
    * stale crashed pins re-key harmlessly) and rename the item's
    * retained-generation directory — the pin-following half of
    * [[Collection.renameItem]]. Manifests follow the live item's
    * IDENTITY: after the rename, `VERSION AS OF` and restore resolve
    * the pre-rename generations under the new name. Each manifest
    * rewrite is one atomic sidecar-class write; IDEMPOTENT throughout
    * (a manifest without `from`, or a retained dir already moved, is a
    * no-op), so the crash repair can simply re-run it. Returns the
    * re-keyed manifest names. */
  def renameItemPins(collectionPath: SPath, from: String, to: String): Seq[String] = {
    val touched = listManifests(collectionPath).flatMap { snap =>
      readManifest(collectionPath, snap).flatMap { m =>
        m.get("items") match {
          case Some(JObject(fields)) if fields.exists(_._1 == from) =>
            val items = JObject(fields.map {
              case (k, v) => (if (k == from) to else k, v)
            })
            val f = manifestFile(collectionPath, snap)
            f.fs.writeBytesAtomic(f.raw, JsonMethods.compact(JsonMethods.render(
              JObject((m + ("items" -> (items: JValue))).toList)))
              .getBytes(StandardCharsets.UTF_8))
            Some(snap)
          case _ => None
        }
      }
    }
    val fromRet = retainedBase(collectionPath, from)
    val toRet = retainedBase(collectionPath, to)
    if (fromRet.isDir && !toRet.isDir)
      collectionPath.fs.rename(fromRet.raw, toRet.raw)
    touched
  }

  /** The pinned generation state of `item` in manifest snapshot `snap`,
    * for change detection (the batch CDC read's anchor): Right(period →
    * generation) when the item was time-laid-out at capture, Left(item
    * generation) when it was flat. None when the manifest or its item
    * entry is missing. One driver-side JSON read; no listing, no data. */
  def manifestPins(collectionPath: SPath, snap: String, item: String)
      : Option[Either[Long, Map[String, Long]]] =
    readManifest(collectionPath, snap)
      .flatMap(m => manifestItems(m).get(item))
      .map { e =>
        if (e.periodGens.nonEmpty) Right(e.periodGens)
        else Left(e.gen.getOrElse(0L))
      }

  /** Reserved key naming the WHOLE item in change listings of flat
    * (single-generation) items; period names are date-shaped and can
    * never collide with it. Shared with the streaming source's offset
    * encoding. */
  val WholeItemKey = "__item"

  /** Classify the period-granular delta between a snapshot's `pins` and
    * the live sidecar: (key, "added" | "rewritten" | "removed"), sorted
    * by key. The one rule set behind the batch CDC read, the
    * `list_changes` procedure, and `startingSnapshot` streams:
    *  - time-layout pins vs time-layout live → per-period comparison by
    *    generation equality;
    *  - flat pins vs flat live → [[WholeItemKey]] rewritten iff the
    *    generation moved;
    *  - cross-shape (a convertLayout happened since the cut) → the
    *    whole item was rewritten.
    * Driver-side map arithmetic only. */
  def classifyChanges(pins: Either[Long, Map[String, Long]],
                      liveMeta: Map[String, JValue],
                      liveIsTimeLayout: Boolean): Seq[(String, String)] =
    (pins, liveIsTimeLayout) match {
      case (Right(pinnedPg), true) =>
        val livePg = periodGensOf(liveMeta)
        val added = (livePg.keySet -- pinnedPg.keySet).map(_ -> "added")
        val rewritten = livePg.collect {
          case (p, g) if pinnedPg.get(p).exists(_ != g) => p -> "rewritten"
        }
        val removed = (pinnedPg.keySet -- livePg.keySet).map(_ -> "removed")
        (added ++ rewritten ++ removed).toSeq.sortBy(_._1)
      case (Left(gen), false) =>
        if (generationOf(liveMeta) == gen) Nil
        else Seq(WholeItemKey -> "rewritten")
      case _ =>
        Seq(WholeItemKey -> "rewritten")
    }

  // ------------------------------------------------- copy-on-write/GC

  /** Whole-item generations of `item` pinned by any manifest. */
  def pinnedGens(collectionPath: SPath, item: String): Set[Long] =
    listManifests(collectionPath).flatMap { snap =>
      readManifest(collectionPath, snap).toSeq
        .flatMap(m => manifestItems(m).get(item).flatMap(_.gen))
    }.toSet

  /** (period → pinned generations) of `item` across all manifests. */
  def pinnedPeriodGens(collectionPath: SPath, item: String): Map[String, Set[Long]] =
    listManifests(collectionPath).flatMap { snap =>
      readManifest(collectionPath, snap).toSeq
        .flatMap(m => manifestItems(m).get(item).toSeq.flatMap(_.periodGens))
    }.groupBy(_._1).map { case (p, gs) => p -> gs.map(_._2).toSet }

  /** Every manifest's pins in ONE sweep: item → flat generations and
    * item → (period → generations). Collection-wide operations
    * (rollbackTo over N items) compute this once and pass it down —
    * per-item retention checks would otherwise re-read all M manifests
    * for each item (O(N·M) small JSON reads under the commit lock;
    * with the index it is O(M)). */
  final case class PinIndex(flat: Map[String, Set[Long]],
                            periods: Map[String, Map[String, Set[Long]]])

  def pinIndex(collectionPath: SPath): PinIndex = {
    val entries: Seq[(String, Entry)] =
      listManifests(collectionPath).flatMap { snap =>
        readManifest(collectionPath, snap).toSeq.flatMap(m => manifestItems(m).toSeq)
      }
    val byItem = entries.groupBy(_._1)
    PinIndex(
      flat = byItem.map { case (it, es) => it -> es.flatMap(_._2.gen).toSet }
        .filter(_._2.nonEmpty),
      periods = byItem.map { case (it, es) =>
        it -> es.flatMap(_._2.periodGens.toSeq).groupBy(_._1)
          .map { case (p, gs) => p -> gs.map(_._2).toSet }
      }.filter(_._2.nonEmpty))
  }

  /** Pins AND pinned sidecar of EVERY item in manifest `snap` in one
    * read (the per-item shape [[manifestPins]] serves); None when not
    * a manifest. Collection-wide rollback classifies all N items from
    * this single parse instead of N full manifest re-reads. */
  def manifestAllPins(collectionPath: SPath, snap: String)
      : Option[Map[String, (Either[Long, Map[String, Long]], Map[String, JValue])]] =
    readManifest(collectionPath, snap).map(m => manifestItems(m).map { case (it, e) =>
      it -> ((if (e.periodGens.nonEmpty) Right(e.periodGens): Either[Long, Map[String, Long]]
              else Left(e.gen.getOrElse(0L))), e.sidecar)
    })

  /** Before a commit/delete destroys a FLAT `item`'s data dir: if its
    * current generation is pinned, rename the data dir (O(1)) into the
    * retained area. */
  def retainIfPinned(collectionPath: SPath, item: String,
                     pins: Option[PinIndex] = None): Unit = {
    val itemDir = collectionPath.resolve(item)
    val dataDir = itemDir.resolve(Item.DataDir)
    if (!dataDir.isDir) return
    val gen = generationOf(Meta.read(itemDir))
    val pinnedSet = pins.map(_.flat.getOrElse(item, Set.empty[Long]))
      .getOrElse(pinnedGens(collectionPath, item))
    if (pinnedSet.contains(gen)) {
      val dst = retainedBase(collectionPath, item).resolve(gen.toString)
      if (!dst.resolve(Item.DataDir).exists) {
        dst.mkdirs()
        collectionPath.fs.rename(dataDir.raw, dst.resolve(Item.DataDir).raw)
      }
    }
  }

  /** Retained dir of one pinned FLAT-item generation (item-dir layout:
    * `data/` inside). Present only while some manifest pins `gen` —
    * the streaming source checks it to serve an offset's generation
    * byte-identically after an in-place rewrite. */
  def retainedFlatDir(collectionPath: SPath, item: String, gen: Long): SPath =
    retainedBase(collectionPath, item).resolve(gen.toString)

  /** Retained destination for one pinned period dir (caller renames). */
  def retainedPeriodDir(collectionPath: SPath, item: String,
                        period: String, gen: Long): SPath =
    retainedBase(collectionPath, item).resolve("periods")
      .resolve(period).resolve(gen.toString)

  /** Retain every pinned period of a time-layout `item` before its
    * data dir is destroyed (full rewrite / delete): each pinned
    * period dir is renamed aside individually — O(periods) renames,
    * zero bytes. */
  def retainPeriodsIfPinned(collectionPath: SPath, item: String,
                            pins: Option[PinIndex] = None): Unit = {
    val itemDir = collectionPath.resolve(item)
    val dataDir = itemDir.resolve(Item.DataDir)
    if (!dataDir.isDir) return
    val livePg = periodGensOf(Meta.read(itemDir))
    if (livePg.isEmpty) return
    val pinned = pins.map(_.periods.getOrElse(item, Map.empty[String, Set[Long]]))
      .getOrElse(pinnedPeriodGens(collectionPath, item))
    livePg.foreach { case (p, g) =>
      if (pinned.get(p).exists(_.contains(g))) {
        val src = dataDir.resolve(s"${Collection.MonthCol}=$p")
        val dst = retainedPeriodDir(collectionPath, item, p, g)
        if (src.isDir && !dst.isDir) {
          collectionPath.fs.mkdirs(dst.parent.raw)
          collectionPath.fs.rename(src.raw, dst.raw)
        }
      }
    }
  }

  /** Drop retained generations no remaining manifest references. */
  def gcRetained(collectionPath: SPath): Unit = {
    val retained = snapsDir(collectionPath).resolve(RetainedDir)
    if (!retained.isDir) return
    val manifests = listManifests(collectionPath)
      .flatMap(snap => readManifest(collectionPath, snap).toSeq)
      .map(manifestItems)
    val refFlat: Set[(String, Long)] = manifests.flatMap(_.collect {
      case (it, e) if e.gen.isDefined => (it, e.gen.get)
    }).toSet
    val refPeriod: Set[(String, String, Long)] = manifests.flatMap(_.toSeq.flatMap {
      case (it, e) => e.periodGens.map { case (p, g) => (it, p, g) }
    }).toSet
    retained.listDirs.foreach { it =>
      val itemDir = retained.resolve(it)
      itemDir.listDirs.foreach {
        case "periods" =>
          val periodsDir = itemDir.resolve("periods")
          periodsDir.listDirs.foreach { p =>
            val pDir = periodsDir.resolve(p)
            pDir.listDirs.foreach { genName =>
              val keep = genName.toLongOption.exists(g => refPeriod.contains((it, p, g)))
              if (!keep) pDir.resolve(genName).deleteRecursively()
            }
            if (pDir.listDirs.isEmpty) pDir.deleteRecursively()
          }
          if (periodsDir.listDirs.isEmpty) periodsDir.deleteRecursively()
        case genName =>
          val keep = genName.toLongOption.exists(g => refFlat.contains((it, g)))
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

  /** Remove a snapshot's manifest FILE only — no same-name dir delete
    * (releasePin's job) and NO retained-generation GC: judging
    * referenced-ness races an in-flight transaction's copy-on-write
    * retention unless serialized against commits, so lock-free callers
    * (snapshot import's replace) drop the manifest and leave the GC to
    * vacuum's locked sweep. */
  def dropManifestFile(collectionPath: SPath, snap: String): Unit = {
    val f = manifestFile(collectionPath, snap)
    if (f.exists) f.fs.deleteRecursively(f.raw)
  }

  /** Internal pins (`__`-prefixed) are mid-statement state, hidden from
    * listings and timestamp travel — resolving one BY NAME on any read
    * surface (SQL VERSION AS OF, the reader `snapshot`/`changesSince`
    * options, Scala `item(snapshot=...)`) would expose it and race its
    * release. The ONE guard every resolution layer calls. */
  def requireUserSnapshotName(name: String): Unit =
    if (name.startsWith("__"))
      throw new GraftError(
        s"'$name' is an internal pin, not a snapshot (the '__' prefix is " +
          "reserved for transaction/replace pins)")

  /** Release one internal pin (transaction / RTAS): the snapshot dir a
    * legacy copy may occupy, the manifest, and (unless the caller
    * batches its own sweep, like vacuum over many pins) the GC. The ONE
    * primitive every pin-release path shares — fixes must not fork. */
  def releasePin(collectionPath: SPath, snap: String, gc: Boolean = true): Unit = {
    snapsDir(collectionPath).resolve(snap).deleteRecursively()
    if (gc) deleteManifest(collectionPath, snap)
    else {
      val f = manifestFile(collectionPath, snap)
      if (f.exists) f.fs.deleteRecursively(f.raw)
    }
  }

  // ----------------------------------------------------------- restore

  /** Restore `item` to the state pinned by manifest `snap` — the
    * transaction-rollback primitive. The commit paths' copy-on-write
    * already renamed every pinned generation aside as ops replaced it,
    * so restore is pure metadata: rename the pinned data back (whole
    * dir for flat items, per pinned period for time layouts), drop
    * periods the failed ops added, and rewrite the embedded pre-txn
    * sidecar. O(1)/O(periods) renames on EVERY backend — no byte
    * copies. An item absent from the manifest did not exist pre-txn
    * and is deleted. */
  def restoreFromManifest(collectionPath: SPath, snap: String,
                          item: String,
                          pins: Option[PinIndex] = None): Unit = {
    val fs = collectionPath.fs
    val live = collectionPath.resolve(item)
    // The restored sidecar keeps the LIVE commit log (which spans the
    // rolled-back commits) plus a `rollback` entry stamped now with the
    // restored generation — the manifest's embedded sidecar carries no
    // log, and truncating history to the cut would orphan timestamp
    // travel for every instant since (the log is the record of what
    // happened, including the undo).
    val liveMetaAtStart = Meta.read(live)
    def withRollbackEntry(sidecar: Map[String, JValue]): Map[String, JValue] =
      sidecar + (History.Key -> History.appendedSpilling(live,
        liveMetaAtStart, "rollback", generationOf(sidecar), Nil))
    // Restore must never destroy a generation some OTHER manifest still
    // pins — the restore-side twin of the commit paths' retention
    // calls. A savepoint rollback is a mutation like any other: a
    // snapshot taken AFTER the savepoint pins the current live state,
    // and `VERSION AS OF` / a later rollback to it must keep working.
    // Whole-item destruction retains blanket (everything live goes);
    // the period branch retains per touched period only — a blanket
    // retain there would strip dirs resolveManifestItem already
    // resolved to their LIVE paths (the unchanged periods).
    def retireLiveItem(): Unit = {
      retainPeriodsIfPinned(collectionPath, item, pins)
      retainIfPinned(collectionPath, item, pins)
    }
    // legacy fallback: a time item with no `_period_gens` was COPIED
    // into the snapshot dir at manifest creation. Restore by COPY
    // (hardlink snapshot on POSIX), NOT rename — a rename would consume
    // the savepoint, and the next rollback to it would classify the
    // item as removed and delete it outright
    val copied = snapsDir(collectionPath).resolve(snap).resolve(item)
    if (copied.isDir) {
      retireLiveItem()
      live.deleteRecursively()
      fs.snapshotRecursively(copied.raw, live.raw, exclude = _ => false)
      return
    }
    // A MISSING (or unreadable) manifest is not "item absent from the
    // manifest": the None arm below deletes the live item (correct when
    // the manifest READS and proves the item was born after the cut),
    // but if the manifest is gone or damaged — vacuumed pin, raced
    // deletion, corrupt file — nothing is known about the pre-state and
    // deleting the live data would be unrecoverable. ONE read decides:
    // a check-then-re-read would race a concurrent deletion into the
    // delete arm. Unreadable → fail typed; the live state stays.
    val parsed = readManifest(collectionPath, snap).getOrElse(
      throw new GraftError(
        s"cannot restore '$item': manifest snapshot '$snap' no longer exists " +
          "or is unreadable (vacuumed, deleted mid-operation, or corrupt) — " +
          "the live state was left untouched"))
    resolveEntry(collectionPath, item, manifestItems(parsed).get(item)) match {
      case None =>
        retireLiveItem()
        live.deleteRecursively() // created by the failed txn
      case Some(FlatResolved(dir, sidecar)) =>
        val dataDir = live.resolve(Item.DataDir)
        if (dir.raw != live.raw) { // generation changed or item deleted
          retireLiveItem() // live gen differs from the target's, safe whole
          dataDir.deleteRecursively()
          live.mkdirs()
          fs.rename(dir.resolve(Item.DataDir).raw, dataDir.raw)
        }
        Meta.write(live, withRollbackEntry(sidecar))
      case Some(PeriodResolved(dirs, sidecar)) =>
        val dataDir = live.resolve(Item.DataDir)
        val pinned = dirs.map(_._1).toSet
        val livePg = periodGensOf(Meta.read(live))
        val pinnedAll = pins.map(_.periods.getOrElse(item, Map.empty[String, Set[Long]]))
          .getOrElse(pinnedPeriodGens(collectionPath, item))
        // cross-shape: live is FLAT (no period gens) while the target
        // pins periods — the flat generation is replaced whole (retain
        // it if pinned; stray flat part-files must not survive under
        // the restored period dirs)
        if (livePg.isEmpty && dataDir.isDir) {
          retainIfPinned(collectionPath, item, pins)
          dataDir.deleteRecursively()
        }
        // destroy-or-retain ONE live period dir: renamed aside when any
        // manifest pins its current generation, deleted otherwise
        def retire(p: String): Unit = {
          val src = dataDir.resolve(s"${Collection.MonthCol}=$p")
          if (!src.isDir) return
          val keepGen = livePg.get(p)
            .filter(g => pinnedAll.get(p).exists(_.contains(g)))
          keepGen match {
            case Some(g) =>
              val dst = retainedPeriodDir(collectionPath, item, p, g)
              if (!dst.isDir) {
                fs.mkdirs(dst.parent.raw)
                fs.rename(src.raw, dst.raw)
              } else src.deleteRecursively() // already retained
            case None => src.deleteRecursively()
          }
        }
        if (dataDir.isDir)
          dataDir.listDirs.filter(_.startsWith(Collection.MonthCol + "="))
            .map(_.stripPrefix(Collection.MonthCol + "="))
            .filterNot(pinned.contains)
            .foreach(retire)
        dirs.foreach { case (p, src) =>
          val dst = dataDir.resolve(s"${Collection.MonthCol}=$p")
          if (src.raw != dst.raw) { // touched by the failed ops
            retire(p)
            fs.mkdirs(dst.parent.raw)
            fs.rename(src.raw, dst.raw)
          }
        }
        Meta.write(live, withRollbackEntry(sidecar))
    }
  }
}
