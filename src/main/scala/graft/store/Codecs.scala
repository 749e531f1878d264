package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.json4s.JValue

/** Storage codecs for types without a native Spark representation
  * (reference: pystore/dataframe.py:212-367 / SURVEY §1.3).
  *
  * The reference JSON-encodes complex cells; Spark's native
  * Array/Map/Struct types make most of that unnecessary — lists, maps,
  * nested structs, and complex numbers are stored as first-class nested
  * Parquet. What remains is METADATA: markers that tell a reader how to
  * reconstruct pandas-level semantics (timedelta units, period freq,
  * interval closedness, categorical ordering, original timezones).
  * Encoders return (transformed column, marker) pairs; `restore`
  * inverts them from the sidecar's `_type_info`.
  */
object Codecs {

  final case class TypeMarker(kind: String, params: Map[String, Any] = Map.empty)

  /** timedelta64[ns] → int64 nanoseconds + marker
    * (reference dataframe.py:221-224). Spark's DayTimeIntervalType is
    * µs-bounded; LongType ns is the lossless storage form. */
  def encodeTimedelta(c: Column): (Column, TypeMarker) =
    (c.cast(LongType), TypeMarker("timedelta", Map("unit" -> "ns")))

  def decodeTimedelta(c: Column): Column = c.cast(LongType)

  /** Period → string repr + freq in metadata (reference
    * dataframe.py:226-229; the read side applies the reference's
    * `ME`→`M` freq fixup, dataframe.py:258-263). */
  def encodePeriod(c: Column, freq: String): (Column, TypeMarker) =
    (c.cast(StringType), TypeMarker("period", Map("freq" -> normalizeFreq(freq))))

  def normalizeFreq(freq: String): String = freq match {
    case "ME" => "M"   // pandas 2.2 renamed month-end; stored canonical
    case "YE" => "Y"
    case "QE" => "Q"
    case f    => f
  }

  /** Interval → StructType(left, right) + closed-ness marker — nested
    * structs beat the reference's column-split hack
    * (dataframe.py:231-236). */
  def encodeInterval(left: Column, right: Column, closed: String): (Column, TypeMarker) =
    (struct(left.as("left"), right.as("right")), TypeMarker("interval", Map("closed" -> closed)))

  /** Categorical → plain string + {categories, ordered} marker.
    * Parquet dictionary-encodes the strings on disk, which is the
    * reference's int-codes trick for free (memory.py:168-181). */
  def encodeCategorical(c: Column, categories: Seq[String], ordered: Boolean): (Column, TypeMarker) =
    (c.cast(StringType), TypeMarker("categorical",
      Map("categories" -> categories, "ordered" -> ordered)))

  /** tz-aware timestamp → UTC storage + original tz marker (reference
    * dataframe.py:283-321; SURVEY §7.4.5: store UTC, restore original
    * tz on read). Sessions run with spark.sql.session.timeZone=UTC, so
    * the stored instants ARE UTC; the marker records presentation tz. */
  def encodeTimezone(c: Column, originalTz: String): (Column, TypeMarker) =
    (c, TypeMarker("timestamp_tz", Map("timezone" -> originalTz)))

  /** Presentation-tz restore: convert the UTC instant to the recorded
    * zone's wall clock (the reference's tz_convert on read). Inverse of
    * the write-edge to_utc_timestamp, so the round trip is identity
    * regardless of the reading session's timezone. */
  def restoreTimezone(c: Column, tz: String): Column =
    if (isUtc(tz)) c else from_utc_timestamp(c, tz)

  private[store] def isUtc(tz: String): Boolean =
    tz == "UTC" || tz == "Etc/UTC" || tz == "Z" || tz == "+00:00" || tz == "GMT"

  /** Complex numbers → Struct(re, im) (reference JSON {"real","imag"},
    * dataframe.py:93-94). */
  def encodeComplex(re: Column, im: Column): (Column, TypeMarker) =
    (struct(re.cast(DoubleType).as("re"), im.cast(DoubleType).as("im")),
      TypeMarker("complex", Map.empty))

  // --------------------------------------------- write-edge dispatch

  private val PeriodRe = """period\[(.+)\]""".r
  private val IntervalRe = """interval(?:\[(?:closed=)?(left|right|both|neither)\])?""".r

  /** Write-edge auto-dispatch (reference collection.py:240-270 +
    * dataframe.py:212-321, where detection is implicit in pandas
    * dtypes): tz-aware timestamps are visible in Spark's schema and
    * detected automatically; timedelta/period/categorical/interval
    * carry no Spark-visible type distinction, so callers pass
    * pandas-dtype `hints` ("timedelta64[ns]", "period[M]", "category",
    * "category:ordered", "interval[closed=left]") and the matching
    * codec transform + marker is applied. Explicit markers always win.
    * Returns (transformed frame, full marker set to record). */
  def autoDispatch(df: DataFrame,
                   explicit: Map[String, TypeMarker],
                   hints: Map[String, String],
                   sessionTz: String): (DataFrame, Map[String, TypeMarker]) = {
    val (hinted, hintMarkers) =
      hints.foldLeft((df, Map.empty[String, TypeMarker])) {
        case ((d, ms), (name, hint)) if d.columns.contains(name) && !explicit.contains(name) =>
          applyHint(d, name, hint) match {
            case Some((c, m)) => (d.withColumn(name, c), ms + (name -> m))
            case None => (d, ms)
          }
        case (acc, _) => acc
      }
    // TimestampType (instant semantics) = pandas tz-aware; the marker
    // records the writing session's zone. Storage and restore are
    // SYMMETRIC — to_utc_timestamp on write, from_utc_timestamp on
    // read — so write→read is identity in ANY session timezone, not
    // just the UTC the repo's own builder pins. (In a UTC session both
    // halves are no-ops and the stored bytes are unchanged.)
    // TimestampNTZ = naive — no marker.
    val detectedNames = hinted.schema.fields.collect {
      case f if f.dataType == TimestampType &&
          !explicit.contains(f.name) && !hintMarkers.contains(f.name) => f.name
    }.toSeq
    val stored =
      if (isUtc(sessionTz)) hinted
      else detectedNames.foldLeft(hinted)((d, n) =>
        d.withColumn(n, to_utc_timestamp(col(n), sessionTz)))
    val detected = detectedNames.map(n =>
      n -> TypeMarker("timestamp_tz", Map("timezone" -> sessionTz))).toMap
    (stored, detected ++ hintMarkers ++ explicit)
  }

  private def applyHint(df: DataFrame, name: String,
                        hint: String): Option[(Column, TypeMarker)] = {
    val c = col(name)
    hint.trim match {
      case "timedelta" | "timedelta64[ns]" => Some(encodeTimedelta(c))
      case PeriodRe(freq)                  => Some(encodePeriod(c, freq))
      case "category" | "categorical" =>
        Some(encodeCategorical(c, categoriesOf(df, name), ordered = false))
      case "category:ordered" =>
        Some(encodeCategorical(c, categoriesOf(df, name), ordered = true))
      case IntervalRe(closed) => df.schema(name).dataType match {
        case s: StructType if s.fieldNames.sorted.sameElements(Array("left", "right")) =>
          Some((c, TypeMarker("interval",
            Map("closed" -> Option(closed).getOrElse("right")))))
        case _ => None
      }
      case _ => None
    }
  }

  /** Distinct values, sorted — the pandas `categories` list. Bounded
    * driver collect: categorical means low-cardinality by contract, and
    * the cap turns a mistaken hint on a high-cardinality column into an
    * error instead of an unbounded collect at 100 TB. */
  private def categoriesOf(df: DataFrame, name: String, cap: Int = 10000): Seq[String] = {
    val vals = df.select(col(name).cast(StringType)).na.drop()
      .distinct().limit(cap + 1).collect().map(_.getString(0)).sorted.toSeq
    if (vals.sizeIs > cap)
      throw new IllegalArgumentException(
        s"column '$name' has more than $cap distinct values; not a categorical")
    vals
  }

  // ------------------------------------------------- sidecar plumbing

  /** Serialize markers for the `_type_info` sidecar key. */
  def markersToMeta(markers: Map[String, TypeMarker]): JValue =
    Meta.jv(markers.map { case (col, m) =>
      col -> (Map("type" -> m.kind) ++ m.params)
    })

  def markersFromMeta(j: JValue): Map[String, TypeMarker] =
    Meta.unjv(j) match {
      case m: Map[_, _] => m.map { case (k, v) =>
        val params = v.asInstanceOf[Map[String, Any]]
        k.toString -> TypeMarker(params.getOrElse("type", "").toString, params - "type")
      }
      case _ => Map.empty
    }

  /** Apply read-side restoration for every marked column. */
  def restore(df: DataFrame, markers: Map[String, TypeMarker]): DataFrame =
    markers.foldLeft(df) { case (d, (name, m)) =>
      if (!d.columns.contains(name)) d
      else m.kind match {
        case "timestamp_tz" =>
          restoreTimezone(col(name), m.params("timezone").toString) match {
            case c => d.withColumn(name, c)
          }
        case "epoch_ns" =>
          d.withColumn(name, timestamp_micros(expr(s"`$name` div 1000")))
        case _ => d // markers like timedelta/period/categorical are
                    // presentation hints for pandas-level consumers
      }
    }
}
