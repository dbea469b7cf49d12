package graft.sink

import java.nio.charset.StandardCharsets
import java.util.Base64

import graft.core.Fs
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.sources._

/** Per-file column statistics carried in the commit manifest — the
  * Delta/Iceberg data-skipping pattern: min/max/hasNull per top-level
  * column, harvested once from the parquet FOOTERS at commit time, so
  * reads can drop whole files from the plan without opening them (at
  * 100 TB the footers alone are millions of reads; the manifest is a
  * handful). Stats are an OPTIMIZATION with conservative semantics:
  * a file is pruned only when its recorded range PROVES no row can
  * match; missing stats, unknown types and exotic predicates all keep
  * the file, and Spark re-applies every predicate above the scan.
  *
  * Values are stored engine-portably: numerics as BigDecimal strings
  * (`typ='n'`), strings and dates as UTF-8 (`typ='s'`, ISO dates —
  * lexicographic = chronological). Parquet writers may truncate long
  * binary min/max; truncation widens the range (min rounded down, max
  * up), so pruning on truncated stats stays sound. Timestamps are
  * skipped (engine-specific physical encodings).
  */
object FileStats {

  /** One column's file-level range. `min`/`max` are None when the
    * column is all-null in the file. */
  final case class ColStats(typ: Char, min: Option[String],
      max: Option[String], hasNull: Boolean)

  // ----------------------------------------------------------------
  // Collection (commit time)
  // ----------------------------------------------------------------

  /** Footer-derived stats for each staged file (dir-relative keys).
    * Any per-file failure degrades to "no stats" — never fails the
    * commit over an optimization. */
  def collect(dir: String, relFiles: Seq[String])
      : Map[String, Map[String, ColStats]] = {
    val conf = Fs.conf()
    relFiles.flatMap { rel =>
      scala.util.Try(ofFile(s"$dir/$rel", conf)).toOption
        .filter(_.nonEmpty).map(rel -> _)
    }.toMap
  }

  private def ofFile(path: String,
      conf: org.apache.hadoop.conf.Configuration)
      : Map[String, ColStats] = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), conf)
    val reader = ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks
      // merge row-group chunk stats per top-level column; a column
      // drops out entirely if ANY chunk lacks usable stats
      val perCol = scala.collection.mutable.Map[String, ColStats]()
      val dead = scala.collection.mutable.Set[String]()
      blocks.forEach { b =>
        b.getColumns.forEach { cc =>
          val pathParts = cc.getPath.toArray
          if (pathParts.length == 1) {
            val name = pathParts(0)
            if (!dead(name)) chunkStats(cc) match {
              case None => dead += name; perCol.remove(name); ()
              case Some(cs) =>
                perCol(name) = perCol.get(name)
                  .map(merge(_, cs)).getOrElse(cs)
            }
          }
        }
      }
      perCol.toMap
    } finally reader.close()
  }

  private def merge(a: ColStats, b: ColStats): ColStats = {
    def pick(x: Option[String], y: Option[String], lo: Boolean) =
      (x, y) match {
        case (Some(p), Some(q)) =>
          val c = compare(p, q, a.typ)
          Some(if ((c <= 0) == lo) p else q)
        case (p, q) => p.orElse(q)
      }
    ColStats(a.typ, pick(a.min, b.min, lo = true),
      pick(a.max, b.max, lo = false), a.hasNull || b.hasNull)
  }

  private def chunkStats(
      cc: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData)
      : Option[ColStats] = {
    val st = cc.getStatistics
    if (st == null) return None
    // numNulls < 0 = unknown → conservatively "has nulls"
    val hasNull = st.getNumNulls != 0
    if (!st.hasNonNullValue)
      return if (st.isNumNullsSet && st.getNumNulls > 0)
        Some(ColStats('s', None, None, hasNull = true))
      else None
    val prim = cc.getPrimitiveType
    val logical = prim.getLogicalTypeAnnotation
    def n(v: Any) = Some(('n', new java.math.BigDecimal(v.toString)
      .toPlainString))
    val converted: Option[(Char, String)] = prim.getPrimitiveTypeName match {
      case PrimitiveTypeName.INT32 => logical match {
        case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation =>
          None.orElse(Some(('s', java.time.LocalDate.ofEpochDay(
            st.genericGetMin.asInstanceOf[Number].longValue()).toString)))
        case _ => n(st.genericGetMin)
      }
      case PrimitiveTypeName.INT64 => logical match {
        case _: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          None
        case _ => n(st.genericGetMin)
      }
      case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE =>
        n(st.genericGetMin)
      case PrimitiveTypeName.BINARY => logical match {
        case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation =>
          Some(('s', st.minAsString))
        case _ => None
      }
      case _ => None
    }
    converted.map { case (typ, minStr) =>
      val maxStr = prim.getPrimitiveTypeName match {
        case PrimitiveTypeName.INT32
          if logical.isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation] =>
          java.time.LocalDate.ofEpochDay(
            st.genericGetMax.asInstanceOf[Number].longValue()).toString
        case PrimitiveTypeName.BINARY => st.maxAsString
        case _ => new java.math.BigDecimal(st.genericGetMax.toString)
          .toPlainString
      }
      ColStats(typ, Some(minStr), Some(maxStr), hasNull)
    }
  }

  // ----------------------------------------------------------------
  // Manifest line round trip
  // ----------------------------------------------------------------

  private def b64(s: String) =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def unb64(s: String) =
    new String(Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  /** `stat=` line payload: b64(rel) TAB col TAB typ TAB hasNull TAB
    * b64(min)|- TAB b64(max)|- (base64 keeps any path/value safe). */
  def render(rel: String, col: String, cs: ColStats): String =
    Seq(b64(rel), b64(col), cs.typ.toString,
      if (cs.hasNull) "1" else "0",
      cs.min.map(b64).getOrElse("-"),
      cs.max.map(b64).getOrElse("-")).mkString("\t")

  def parse(payload: String): Option[(String, String, ColStats)] =
    payload.split('\t') match {
      case Array(rel, col, typ, nul, mn, mx) =>
        Some((unb64(rel), unb64(col), ColStats(typ.head,
          if (mn == "-") None else Some(unb64(mn)),
          if (mx == "-") None else Some(unb64(mx)),
          nul == "1")))
      case _ => None
    }

  // ----------------------------------------------------------------
  // Pruning (read time)
  // ----------------------------------------------------------------

  private def compare(a: String, b: String, typ: Char): Int =
    if (typ == 'n')
      new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
    else a.compareTo(b)

  /** A filter value in the stats' portable encoding, or None when the
    * type can't be judged (→ keep the file). */
  private def encode(v: Any, typ: Char): Option[String] = v match {
    case null => None
    case n: Number if typ == 'n' =>
      Some(new java.math.BigDecimal(n.toString).toPlainString)
    case d: java.sql.Date if typ == 's' => Some(d.toString)
    case d: java.time.LocalDate if typ == 's' => Some(d.toString)
    case s: String if typ == 's' => Some(s)
    case _ => None
  }

  /** Could a row of a file with `stats` satisfy `filter`? False ONLY
    * when provably impossible. Columns without stats allow anything. */
  def allows(stats: Map[String, ColStats], filter: Filter): Boolean = {
    def col(a: String) = stats.get(a)
    def range(a: String, v: Any)(f: (ColStats, String) => Boolean)
        : Boolean =
      col(a) match {
        case Some(cs) => (cs.min, cs.max) match {
          case (Some(_), Some(_)) =>
            encode(v, cs.typ).forall(ev => f(cs, ev))
          case _ => v == null // all-null file: only null can "match"
        }
        case None => true
      }
    filter match {
      case EqualTo(a, v) => range(a, v)((cs, ev) =>
        compare(cs.min.get, ev, cs.typ) <= 0 &&
          compare(ev, cs.max.get, cs.typ) <= 0)
      case EqualNullSafe(a, v) if v != null => allows(stats, EqualTo(a, v))
      case In(a, vs) => vs.exists(v => allows(stats, EqualTo(a, v)))
      case GreaterThan(a, v) => range(a, v)((cs, ev) =>
        compare(cs.max.get, ev, cs.typ) > 0)
      case GreaterThanOrEqual(a, v) => range(a, v)((cs, ev) =>
        compare(cs.max.get, ev, cs.typ) >= 0)
      case LessThan(a, v) => range(a, v)((cs, ev) =>
        compare(cs.min.get, ev, cs.typ) < 0)
      case LessThanOrEqual(a, v) => range(a, v)((cs, ev) =>
        compare(cs.min.get, ev, cs.typ) <= 0)
      case IsNull(a) => col(a).forall(_.hasNull)
      case IsNotNull(a) => col(a).forall(_.min.isDefined)
      case And(l, r) => allows(stats, l) && allows(stats, r)
      case Or(l, r) => allows(stats, l) || allows(stats, r)
      case _ => true
    }
  }
}
