package graft.store

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's predicate tuple sugar:
  * `filters=[('col','==',v), ...]` — a conjunctive list of
  * `(column, op, value)` triples handed to the pyarrow scan
  * (reference: pystore/item.py:65; tests/test_write_read.py:101-117).
  *
  * Here the triples compile to Catalyst `Column` predicates, so
  * Spark's `PushDownPredicates` + the Parquet reader's row-group
  * min/max stats do the actual skipping — same pushdown the reference
  * delegates to pyarrow, but planned by Catalyst (visible as
  * `PushedFilters` in `.explain("formatted")`).
  */
object Filters {

  final case class Pred(column: String, op: String, value: Any)

  def toColumn(p: Pred): Column = {
    val c = col(p.column)
    val v = lit(p.value)
    p.op match {
      case "==" | "="  => c === v
      case "!=" | "<>" => c =!= v
      case ">"         => c > v
      case ">="        => c >= v
      case "<"         => c < v
      case "<="        => c <= v
      case "in" => p.value match {
        case xs: Iterable[_] => c.isin(xs.toSeq.map(x => x.asInstanceOf[Any]): _*)
        case x               => c.isin(x)
      }
      case "not in" => p.value match {
        case xs: Iterable[_] => !c.isin(xs.toSeq.map(x => x.asInstanceOf[Any]): _*)
        case x               => !c.isin(x)
      }
      // beyond the reference's tuple vocabulary: null probes (value
      // ignored) — the data-cleaning sweep shape, and the shape the
      // null-aware zonemap prunes files for
      case "isnull"              => c.isNull
      case "notnull" | "isnotnull" => c.isNotNull
      case other => throw new GraftError(s"unsupported filter op: $other")
    }
  }

  /** Conjunction of all triples (the reference treats the list as AND). */
  def toColumn(preds: Seq[Pred]): Option[Column] =
    preds.map(toColumn).reduceOption(_ && _)
}
