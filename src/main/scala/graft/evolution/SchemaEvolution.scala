package graft.evolution

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.SchemaValidationError

/** Schema evolution strategies (reference: pystore/schema_evolution.py:38-43).
  */
sealed trait EvolutionStrategy
object EvolutionStrategy {
  /** No changes allowed. */
  case object Strict extends EvolutionStrategy
  /** New columns may be added; nothing removed or retyped. */
  case object AddOnly extends EvolutionStrategy
  /** Adds + type widening per whitelist. */
  case object Compatible extends EvolutionStrategy
  /** Any change accepted. */
  case object Flexible extends EvolutionStrategy
}

/** Detected schema changes (reference schema_evolution.py:113-158 / E2). */
final case class SchemaChanges(
    added: Seq[StructField],
    removed: Seq[StructField],
    retyped: Seq[(String, DataType, DataType)], // (col, old, new)
    reordered: Boolean) {
  def isEmpty: Boolean = added.isEmpty && removed.isEmpty && retyped.isEmpty
}

/** Schema capture / diff / validate / evolve
  * (reference: pystore/schema_evolution.py:70-298).
  *
  * Everything here is driver-side StructType manipulation plus lazy
  * Column casts — no data scan. The widening whitelist mirrors the
  * reference's COMPATIBLE set (schema_evolution.py:199-227): int32→int64,
  * float32→float64, int→float64, anything→string.
  */
object SchemaEvolution {

  def diff(old: StructType, neu: StructType): SchemaChanges = {
    val oldMap = old.fields.map(f => f.name -> f).toMap
    val newMap = neu.fields.map(f => f.name -> f).toMap
    val added = neu.fields.filterNot(f => oldMap.contains(f.name)).toSeq
    val removed = old.fields.filterNot(f => newMap.contains(f.name)).toSeq
    val retyped = old.fields.toSeq.flatMap { f =>
      newMap.get(f.name).collect {
        case nf if nf.dataType != f.dataType => (f.name, f.dataType, nf.dataType)
      }
    }
    val commonOld = old.fields.map(_.name).filter(newMap.contains)
    val commonNew = neu.fields.map(_.name).filter(oldMap.contains)
    SchemaChanges(added, removed, retyped, reordered = !commonOld.sameElements(commonNew))
  }

  /** The COMPATIBLE widening whitelist; aligned with Catalyst's
    * `Cast.canUpCast` notion of safe widening. */
  def canWiden(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b                   => true
    case (IntegerType, LongType)            => true
    case (ShortType, IntegerType | LongType) => true
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (FloatType, DoubleType)            => true
    case (ByteType | ShortType | IntegerType | LongType, DoubleType) => true
    case (_, StringType)                    => true
    case _                                  => false
  }

  /** E3 (reference schema_evolution.py:178-227): is the change allowed? */
  def validate(changes: SchemaChanges, strategy: EvolutionStrategy): Option[String] =
    strategy match {
      case EvolutionStrategy.Strict =>
        if (changes.isEmpty) None else Some("schema changes not allowed (STRICT)")
      case EvolutionStrategy.AddOnly =>
        if (changes.removed.nonEmpty) Some(s"columns removed: ${changes.removed.map(_.name).mkString(",")}")
        else if (changes.retyped.nonEmpty) Some(s"types changed: ${changes.retyped.map(_._1).mkString(",")}")
        else None
      case EvolutionStrategy.Compatible =>
        if (changes.removed.nonEmpty) Some(s"columns removed: ${changes.removed.map(_.name).mkString(",")}")
        else {
          val bad = changes.retyped.filterNot { case (_, o, n) => canWiden(o, n) || canWiden(n, o) }
          if (bad.nonEmpty) Some(s"incompatible type changes: ${bad.map(_._1).mkString(",")}")
          else None
        }
      case EvolutionStrategy.Flexible => None
    }

  /** Default value for a column added to OLD rows (reference
    * schema_evolution.py:252-298 fills 0/0.0/false/NaT; Spark's
    * unionByName fills null, which roundtrips as pandas NaN — the
    * tested observable for ADD_ONLY appends
    * (tests/test_pr77_features.py:462-487) is "old rows have missing
    * values", which null satisfies). */
  def evolveForAppend(oldSchema: StructType,
                      newDf: DataFrame,
                      strategy: EvolutionStrategy): (DataFrame, Boolean) = {
    val changes = diff(oldSchema, newDf.schema)
    validate(changes, strategy).foreach(msg => throw new SchemaValidationError(msg))
    if (changes.isEmpty) (newDf, false)
    else {
      // Widen retyped columns to the wider of the two sides so the
      // union is well-typed.
      val widened = changes.retyped.foldLeft(newDf) { case (d, (c, o, n)) =>
        val target = if (canWiden(o, n)) n else if (canWiden(n, o)) o else StringType
        d.withColumn(c, col(c).cast(target))
      }
      (widened, true)
    }
  }

  /** E5 (reference schema_evolution.py:300-360): registered named
    * migrations `(from, to) -> DataFrame => DataFrame`, applied
    * step-wise. */
  final class MigrationRegistry {
    private var migrations = Map.empty[(Int, Int), DataFrame => DataFrame]
    def register(from: Int, to: Int)(fn: DataFrame => DataFrame): Unit =
      migrations += ((from, to) -> fn)
    def migrate(df: DataFrame, from: Int, to: Int): DataFrame = {
      var cur = from
      var d = df
      while (cur < to) {
        val step = migrations.keys.filter(k => k._1 == cur && k._2 <= to)
          .toSeq.sortBy(-_._2).headOption
          .getOrElse(throw new SchemaValidationError(s"no migration path from v$cur toward v$to"))
        d = migrations(step)(d)
        cur = step._2
      }
      d
    }
  }
}
