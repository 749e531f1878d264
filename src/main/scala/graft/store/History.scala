package graft.store

import org.json4s._

/** Per-item commit log — one entry per atomic commit, riding the
  * sidecar write the commit already pays for (zero extra I/O on the
  * publish paths; the only addition is the entry's ~100 bytes of JSON).
  *
  * The reference has no commit history at all (pystore sidecars record
  * only `_updated`, utils.py:89-107); this is the `DESCRIBE HISTORY`
  * convention of the modern table formats, and it is what anchors
  * `TIMESTAMP AS OF` when no manifest snapshot exists: generations are
  * bare nanotime counters, so without the log there is nothing that
  * ties a generation to a wall-clock instant.
  *
  * Each entry records the verb (`write`/`append`/`delete_where`/
  * `rollback`/...), the commit's generation stamp, the touched period
  * keys (empty for flat items), and the commit's UTC wall-clock stamp.
  * The log is CAPPED at [[MaxEntries]] (newest kept): it is a sidecar
  * field read driver-side on every metadata load, so it must stay a
  * few tens of KB at any item age — a 100 TB item with years of
  * appends carries the same bounded log as a day-old one. Entries the
  * cap evicts SPILL to chunked files under the item's `_log/` dir
  * ([[appendedSpilling]]): the timestamp-travel resolution fallback
  * reads them when an instant predates the sidecar window, so
  * high-churn items keep their full travel horizon while every
  * ordinary metadata load still reads one bounded sidecar.
  */
object History {
  /** Sidecar key holding the JSON array of entries (oldest first). */
  val Key = "_history"

  /** Transient meta key callers use to label the commit's verb; the
    * publish paths pop it into the entry and never persist it. */
  val OpKey = "_history_op"

  val MaxEntries = 256

  /** `seq` is a per-item monotonic entry counter carried in the
    * rendered JSON: metadata-only commits (set_properties / ALTER)
    * deliberately keep the generation unchanged, so two of them
    * landing in the same wall-clock tick are identical on
    * (op, gen, at) — without the sequence the spill dedup (which
    * exists only to absorb the re-evicted-after-failed-sidecar-write
    * case) would collapse them, silently dropping a DESCRIBE HISTORY
    * row. Entries written before the field parse as 0. */
  final case class Entry(op: String, gen: Long, at: java.time.Instant,
                         periods: Seq[String], seq: Long = 0L)

  private def render(e: Entry): JValue = JObject(List(
    JField("op", JString(e.op)),
    JField("gen", JInt(BigInt(e.gen))),
    JField("at", JString(Meta.stampOf(e.at)))) ++
    (if (e.seq == 0L) Nil else List(JField("seq", JInt(BigInt(e.seq))))) ++
    (if (e.periods.isEmpty) Nil
     else List(JField("periods", JArray(e.periods.sorted.map(JString(_)).toList)))))

  private def parse(j: JValue): Option[Entry] = j match {
    case JObject(fields) =>
      val m = fields.toMap
      for {
        op <- m.get("op").collect { case JString(s) => s }
        gen <- m.get("gen").collect { case JInt(i) => i.toLong }
        at <- m.get("at").collect { case JString(s) => Meta.parseStamp(s) }
      } yield Entry(op, gen, at, m.get("periods") match {
        case Some(JArray(xs)) => xs.collect { case JString(p) => p }
        case _ => Nil
      }, m.get("seq").collect { case JInt(i) => i.toLong }.getOrElse(0L))
    case _ => None
  }

  /** The next sequence number after `prior`'s log — strictly above
    * every sidecar entry; monotonic because entries only append. */
  private def nextSeq(prior: Seq[Entry]): Long =
    if (prior.isEmpty) 1L else prior.map(_.seq).max + 1L

  /** Entries recorded in `meta`, oldest first; damaged/foreign entries
    * are skipped (the log is advisory — readers must not fail on it). */
  def entriesOf(meta: Map[String, JValue]): Seq[Entry] = meta.get(Key) match {
    case Some(JArray(xs)) => xs.flatMap(parse)
    case _ => Nil
  }

  /** The commit verb a caller declared via [[OpKey]] (popped by the
    * publish paths), or the generic fallback. */
  def opOf(meta: Map[String, JValue]): String = meta.get(OpKey) match {
    case Some(JString(s)) => s
    case _ => "commit"
  }

  /** The log with one entry appended and the cap applied. `prior` is
    * the meta map carrying the existing log (usually the stored sidecar
    * the caller already merged in). Entries the cap evicts are DROPPED —
    * use [[appendedSpilling]] on the publish paths so they land in the
    * item's spill area instead. */
  def appended(prior: Map[String, JValue], op: String, gen: Long,
               periods: Seq[String]): JValue = {
    val existing = entriesOf(prior)
    val all = existing :+
      Entry(op, gen, java.time.Instant.now(), periods, nextSeq(existing))
    JArray(all.takeRight(MaxEntries).map(render).toList)
  }

  /** Directory under the item root holding evicted log entries. Sits
    * beside the sidecar (the parquet dataset lives under `data/`, so
    * nothing scans it); deleted/renamed/copied with the item. */
  val SpillDir = "_log"
  /** Entries per spill chunk file. A chunk is rewritten in place until
    * full (≤ a few tens of KB — same cost class as the sidecar write
    * that triggered it), then sealed and a new one started: a 1M-commit
    * item pays O(1) spill I/O per commit and carries ~4k small chunk
    * files, never one ever-growing file rewritten per commit. */
  val SpillChunkEntries = 256

  /** [[appended]] for the item-mutation paths: entries evicted by the
    * cap are APPENDED to the item's spill area before the capped log is
    * returned, so the full history stays reconstructable at any item
    * age while the sidecar (read driver-side on every metadata load)
    * stays bounded. Spill I/O happens only once the log is over the cap
    * — one tiny chunk read+rewrite per commit, under the caller's
    * commit lock. Spill failures are swallowed: the log is advisory,
    * and failing a data commit over a history-archive hiccup would be
    * backwards. */
  def appendedSpilling(itemPath: SPath, prior: Map[String, JValue], op: String,
                       gen: Long, periods: Seq[String]): JValue = {
    val existing = entriesOf(prior)
    val all = existing :+
      Entry(op, gen, java.time.Instant.now(), periods, nextSeq(existing))
    val evicted = all.dropRight(MaxEntries)
    if (evicted.nonEmpty)
      try spill(itemPath, evicted)
      catch { case _: Exception => () }
    JArray(all.takeRight(MaxEntries).map(render).toList)
  }

  /** Sealed-chunk names carry the FIRST entry's epoch-ms stamp
    * (`chunk-<idx>-<firstStampMs>.json`) so windowed readers prune by
    * NAME — a deep-travel resolution over a million-commit item reads
    * the couple of chunks its window touches, not ~4k files. Legacy
    * stampless chunks (`chunk-<idx>.json`) parse with no stamp and are
    * always read (range unknown). */
  private val ChunkName = """chunk-(\d+)(?:-(\d+))?\.json""".r

  private final case class ChunkRef(file: String, idx: Int, firstMs: Option[Long])

  private def chunkRefs(itemPath: SPath): Seq[ChunkRef] = {
    val dir = itemPath.resolve(SpillDir)
    if (!dir.isDir) Nil
    else itemPath.fs.listFiles(dir.raw) // bare names per StoreFs contract
      .flatMap {
        case n @ ChunkName(idx, stamp) =>
          Some(ChunkRef(dir.resolve(n).raw, idx.toInt,
            Option(stamp).map(_.toLong)))
        case _ => None
      }.sortBy(_.idx)
  }

  private def chunkFiles(itemPath: SPath): Seq[String] =
    chunkRefs(itemPath).map(_.file)

  /** TEST SEAM: invoked per chunk-file read so specs can count the
    * spill I/O a windowed resolution actually pays. Default no-op. */
  private[graft] var chunkReadHook: String => Unit = _ => ()

  private def parseChunk(itemPath: SPath, file: String): Seq[Entry] = {
    chunkReadHook(file)
    try org.json4s.jackson.JsonMethods.parse(
      new String(itemPath.fs.readBytes(file),
        java.nio.charset.StandardCharsets.UTF_8)) match {
      case JArray(xs) => xs.flatMap(parse)
      case _ => Nil
    } catch { case _: Exception => Nil }
  }

  /** Per-item monitors for [[spill]]'s open-chunk read-modify-write.
    * The collection commit lock is SHARED among commits, so two
    * concurrent commits on the same item can both evict entries and
    * both rewrite the open chunk — without this leaf lock one eviction
    * is silently lost. Held only across the chunk I/O (acquires nothing
    * else → can never deadlock); JVM-scoped like the commit lock. */
  private val spillLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def entryKey(e: Entry): (String, Long, String, Long) =
    (e.op, e.gen, Meta.stampOf(e.at), e.seq)

  private def spill(itemPath: SPath, evicted: Seq[Entry]): Unit = {
    val lock = spillLocks.computeIfAbsent(itemPath.toString, _ => new Object)
    lock.synchronized {
      val fs = itemPath.fs
      itemPath.resolve(SpillDir).mkdirs()
      val existing = chunkRefs(itemPath)
      val (target, carried, idx) = existing.lastOption match {
        case Some(last) =>
          val entries = parseChunk(itemPath, last.file)
          if (entries.size < SpillChunkEntries) (Some(last.file), entries, last.idx)
          else (None, Seq.empty[Entry], last.idx + 1)
        case None => (None, Seq.empty[Entry], 0)
      }
      // An entry can arrive twice: a spill that succeeded but whose
      // subsequent sidecar write failed re-evicts the same entry on the
      // next commit. Skip entries the open chunk already carries.
      val seen = carried.map(entryKey).toSet
      val novel = evicted.filterNot(e => seen.contains(entryKey(e)))
      if (novel.isEmpty) return
      // fill the open chunk, then seal full chunks of the remainder.
      // A chunk's name is fixed at creation from its FIRST entry's
      // stamp — refills rewrite the same file (the first entry never
      // changes), so the name-borne range stays truthful.
      val groups = (carried ++ novel).grouped(SpillChunkEntries).toSeq
      groups.zipWithIndex.foreach { case (g, k) =>
        val file = target.filter(_ => k == 0).getOrElse(
          itemPath.resolve(SpillDir).resolve(
            f"chunk-${idx + k}%06d-${g.head.at.toEpochMilli}%d.json").raw)
        fs.writeBytesAtomic(file,
          org.json4s.jackson.JsonMethods.compact(
            org.json4s.jackson.JsonMethods.render(JArray(g.map(render).toList)))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
  }

  /** Every spilled (evicted) entry of the item, oldest first — the
    * archive half of the log, read ONLY by the timestamp-travel
    * resolution fallback when the sidecar window starts after the asked
    * instant (resolveAsOf). Damaged chunks are skipped, like damaged
    * sidecar entries. */
  def spilledEntries(itemPath: SPath): Seq[Entry] =
    chunkFiles(itemPath).flatMap(parseChunk(itemPath, _))
      .distinctBy(entryKey) // re-spill after a failed sidecar write can duplicate

  /** The item's FULL log: spilled entries (those not also still in the
    * sidecar — a spill whose sidecar write failed leaves the entry in
    * both halves) followed by the sidecar entries. One spill-dir read —
    * callers use it only when resolution needs a horizon the bounded
    * sidecar may have evicted. */
  def fullLog(itemPath: SPath, sidecarLog: Seq[Entry]): Seq[Entry] = {
    val inSidecar = sidecarLog.map(entryKey).toSet
    spilledEntries(itemPath).filterNot(e => inSidecar.contains(entryKey(e))) ++
      sidecarLog
  }

  /** The full-log PREFIX that can hold entries at or before `t`:
    * spill chunks are pruned by their name-borne first-entry stamp —
    * only chunks starting at or before `t` are read (commit stamps
    * append in order, so a later-starting chunk holds nothing ≤ t; a
    * legacy stampless chunk's range is unknown and it is always read)
    * — and the bounded sidecar half rides in whole. EXACT for every
    * at-or-before fold/lookup (deep CDC state, travel resolution): the
    * pruned chunks contribute nothing to a ≤ t answer. A deep travel
    * into a million-commit item reads the one or two chunks around
    * its instant instead of the whole archive. */
  def fullLogUpTo(itemPath: SPath, sidecarLog: Seq[Entry],
                  t: java.time.Instant): Seq[Entry] = {
    val tMs = t.toEpochMilli
    val inSidecar = sidecarLog.map(entryKey).toSet
    chunkRefs(itemPath).takeWhile(_.firstMs.forall(_ <= tMs))
      .flatMap(c => parseChunk(itemPath, c.file))
      .distinctBy(entryKey) // re-spill after a failed sidecar write can duplicate
      .filterNot(e => inSidecar.contains(entryKey(e))) ++ sidecarLog
  }

  /** The first entry strictly after `t` whose generation differs from
    * `gen` — a travel window's END when it predates the sidecar. Reads
    * FORWARD from the first chunk that can hold post-t entries and
    * stops at the first hit, so the common shape (the very next data
    * commit closes the window) pays one chunk read. None when every
    * spilled post-t entry still carries `gen` (the sidecar half may
    * close the window instead — callers check it first). */
  def firstSpilledAfterWithOtherGen(itemPath: SPath, t: java.time.Instant,
                                    gen: Long): Option[Entry] = {
    val tMs = t.toEpochMilli
    val refs = chunkRefs(itemPath)
    // the chunk CONTAINING t (last with firstMs ≤ t) can hold post-t
    // entries too — start there, not at the first later-starting chunk
    val from = math.max(0, refs.lastIndexWhere(_.firstMs.forall(_ <= tMs)))
    refs.drop(from).iterator
      .flatMap(c => parseChunk(itemPath, c.file))
      .find(e => e.at.isAfter(t) && e.gen != gen)
  }

  /** The latest commit at or before `t`, for timestamp travel. None
    * when the log is empty or starts after `t`. */
  def latestAtOrBefore(meta: Map[String, JValue],
                       t: java.time.Instant): Option[Entry] =
    entriesOf(meta).filter(!_.at.isAfter(t)).lastOption

  /** The item's GENERATION state as of `t`, reconstructed from the
    * log: every logged commit ≤ t stamps its touched periods with its
    * generation, so folding them yields the (period → generation) map
    * at t — `Right(map)`, or `Left(lastGen)` when the commits up to t
    * carry no period keys (flat state). None when the log is empty or
    * starts after t.
    *
    * This anchors TIMESTAMP-spelled CDC (`changesSinceTimestamp`):
    * unlike serving the DATA at t (which needs the bytes retained),
    * serving the delta SINCE t only needs this map to diff against the
    * live sidecar. The reconstruction is conservative, never lossy:
    * generations are per-commit-unique, so a period that changed after
    * t can never reconstruct to its live generation (no missed
    * changes); imprecision — capped-out log horizons, periods removed
    * then re-added, rollbacks (logged with no period keys) — lands on
    * "rewritten"/"added"/cross-shape classifications, i.e. re-serving
    * whole periods, the period-granular replay the CDC contract
    * already tolerates. */
  def stateAtOrBefore(meta: Map[String, JValue], t: java.time.Instant)
      : Option[Either[Long, Map[String, Long]]] =
    stateOf(entriesOf(meta).filter(!_.at.isAfter(t)))

  /** [[stateAtOrBefore]] with the spill horizon: once the sidecar log
    * has reached its cap, entries carrying period stamps may have been
    * evicted — a sidecar-only fold then loses those periods and the
    * CDC read degrades to re-serving them whole (or the whole item,
    * when every in-window entry is metadata-only). Folding the FULL
    * log keeps the reconstruction EXACT at any item age: a 100 TB
    * item with years of churn serves just the genuinely-changed
    * periods. Items below the cap never spilled (the log only evicts
    * at cap and never shrinks) — they stay one sidecar read. */
  def stateAtOrBeforeFull(itemPath: SPath, meta: Map[String, JValue],
                          t: java.time.Instant)
      : Option[Either[Long, Map[String, Long]]] = {
    val sidecar = entriesOf(meta)
    val entries =
      if (sidecar.size < MaxEntries) sidecar
      else fullLogUpTo(itemPath, sidecar, t) // ≤-t fold: the pruned prefix IS the input
    stateOf(entries.filter(!_.at.isAfter(t)))
  }

  private def stateOf(upTo: Seq[Entry])
      : Option[Either[Long, Map[String, Long]]] =
    if (upTo.isEmpty) None
    else {
      val pg = upTo.foldLeft(Map.empty[String, Long]) { (m, e) =>
        m ++ e.periods.map(_ -> e.gen)
      }
      Some(if (pg.isEmpty) Left(upTo.last.gen) else Right(pg))
    }
}
