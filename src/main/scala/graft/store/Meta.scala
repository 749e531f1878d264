package graft.store

import java.nio.charset.StandardCharsets
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON metadata sidecar read/write.
  *
  * Mirrors the reference's per-item/per-store sidecar
  * (reference: pystore/utils.py:89-107) — one `metadata.json` per item
  * directory, stamped with a `_updated` UTC timestamp on every write.
  * (The reference has a latent NameError at utils.py:101 — `timezone`
  * used without import; we implement the intended UTC stamp.)
  *
  * Scale note: sidecars are a few hundred bytes and read driver-side
  * only; at 100 TB the data volume lives in the Parquet files, not
  * here. Metadata search (Collection.listItems) loads only sidecars.
  */
object Meta {
  val Filename = "graft_metadata.json"

  /** Matches the reference's `%Y-%m-%d %H:%M:%S.%f` timestamp format
    * (pystore/utils.py:99-101, tests/test_edge_cases.py #64). */
  private val stampFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS").withZone(ZoneOffset.UTC)

  def nowStamp(): String = stampFmt.format(Instant.now())

  /** [[nowStamp]] for an arbitrary instant (test fixtures, backdating). */
  def stampOf(i: Instant): String = stampFmt.format(i)

  /** Inverse of [[nowStamp]] — stamps are UTC wall-clock strings. */
  def parseStamp(s: String): Instant =
    java.time.LocalDateTime.parse(s, stampFmt).toInstant(ZoneOffset.UTC)

  /** Parse a user-facing instant: ISO-8601 (`2024-03-01T00:00:00Z`) or
    * a UTC date-time (`2024-03-01 00:00:00`) — the two spellings every
    * timestamp-taking reader option accepts (`startingTimestamp`,
    * `changesSinceTimestamp`). Typed error naming the option. */
  def parseInstantFlexible(raw: String, optName: String): Instant =
    try Instant.parse(raw)
    catch { case _: java.time.format.DateTimeParseException =>
      try java.time.LocalDateTime.parse(raw.replace(' ', 'T'))
        .toInstant(ZoneOffset.UTC)
      catch { case _: java.time.format.DateTimeParseException =>
        throw new ValidationError(
          s"$optName '$raw' is not an ISO-8601 instant or a " +
            "UTC date-time (e.g. 2024-03-01T00:00:00Z or 2024-03-01 00:00:00)")
      }
    }

  /** Test-visible count of sidecar writes — the regression hook that
    * proves a commit folded its caller's extra keys (e.g. the streaming
    * sink's epoch mark) into the commit's ONE sidecar write instead of
    * trailing a second, non-atomic one. */
  private[graft] val writes = new java.util.concurrent.atomic.AtomicLong(0)

  def write(dir: SPath, metadata: Map[String, JValue]): Unit = {
    writes.incrementAndGet()
    dir.mkdirs()
    val withStamp = metadata + ("_updated" -> JString(nowStamp()))
    val json = JsonMethods.pretty(JsonMethods.render(JObject(withStamp.toList)))
    // Backend writes temp-then-rename so readers never see a torn sidecar.
    dir.fs.writeBytesAtomic(dir.resolve(Meta.Filename).raw,
      json.getBytes(StandardCharsets.UTF_8))
  }

  def read(dir: SPath): Map[String, JValue] = readAt(dir.resolve(Meta.Filename))

  /** Read any JSON-object sidecar file (e.g. the Python reference's
    * `pystore_metadata.json` during import). */
  def readAt(f: SPath): Map[String, JValue] =
    if (!f.exists) Map.empty
    else JsonMethods.parse(
      new String(f.fs.readBytes(f.raw), StandardCharsets.UTF_8)) match {
      case JObject(fields) => fields.toMap
      case _               => Map.empty
    }

  /** Convenience constructors for plain Scala values → JValue. */
  def jv(v: Any): JValue = v match {
    case null               => JNull
    case j: JValue          => j
    case s: String          => JString(s)
    case b: Boolean         => JBool(b)
    case i: Int             => JInt(BigInt(i))
    case l: Long            => JInt(BigInt(l))
    case d: Double          => JDouble(d)
    case f: Float           => JDouble(f.toDouble)
    case m: Map[_, _]       => JObject(m.toList.map { case (k, x) => (k.toString, jv(x)) })
    case xs: Iterable[_]    => JArray(xs.toList.map(jv))
    case other              => JString(other.toString)
  }

  def obj(kvs: (String, Any)*): Map[String, JValue] =
    kvs.map { case (k, v) => k -> jv(v) }.toMap

  /** Scala value back out of a JValue (for equality matching / API). */
  def unjv(j: JValue): Any = j match {
    case JString(s)  => s
    case JBool(b)    => b
    case JInt(i)     => if (i.isValidLong) i.toLong else i
    case JLong(l)    => l
    case JDouble(d)  => d
    case JDecimal(d) => d
    case JNull       => null
    case JArray(xs)  => xs.map(unjv)
    case JObject(fs) => fs.map { case (k, v) => k -> unjv(v) }.toMap
    case JNothing    => null
    case JSet(xs)    => xs.map(unjv)
  }
}
