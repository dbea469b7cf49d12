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
  * (`typ='n'`, int-backed decimals rescaled to their logical value),
  * strings and dates as text (`typ='s'`, ISO dates — lexicographic =
  * chronological). String stats are recorded only when both bounds
  * are pure ASCII, where `String.compareTo` and parquet's unsigned
  * UTF-8 byte order provably agree (see chunkStats); parquet may
  * truncate long binary min/max, which for ASCII only widens the
  * range (min rounded down, max up), so pruning stays sound.
  * Timestamps are skipped (engine-specific physical encodings).
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
      : Map[String, Map[String, ColStats]] = collectInfo(dir, relFiles)._1

  /** Stats PLUS per-file row counts, from the same single footer pass
    * (row counts feed the manifest's `frows=` lines — the zero-scan
    * table-size estimate [[CdcTable.rowCountEstimate]] reads). A file
    * whose footer fails to read is absent from both maps. */
  def collectInfo(dir: String, relFiles: Seq[String])
      : (Map[String, Map[String, ColStats]], Map[String, Long],
        Map[String, Long]) = {
    val conf = Fs.conf()
    // footer reads are independent metadata IO (one open per file) —
    // read them concurrently instead of serially on the driver; a
    // 32-file batch costs one round-trip latency, not 32
    import scala.jdk.CollectionConverters._
    val infos = relFiles.asJava.parallelStream()
      .map[Option[(String, (Map[String, ColStats], Long, Long))]] { rel =>
        scala.util.Try(ofFile(s"$dir/$rel", conf)).toOption
          .map(rel -> _)
      }
      .collect(java.util.stream.Collectors.toList[
        Option[(String, (Map[String, ColStats], Long, Long))]])
      .asScala.flatten.toMap
    (infos.collect { case (rel, (st, _, _)) if st.nonEmpty => rel -> st },
      infos.map { case (rel, (_, n, _)) => rel -> n },
      infos.map { case (rel, (_, _, b)) => rel -> b })
  }

  private def ofFile(path: String,
      conf: org.apache.hadoop.conf.Configuration)
      : (Map[String, ColStats], Long, Long) = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), conf)
    val reader = ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks
      var rows = 0L
      blocks.forEach(b => rows += b.getRowCount)
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
      // in.getLength comes from the FileStatus the open already made —
      // manifest-recorded sizes cost zero extra IO at commit time and
      // save a listStatus storm at read time (detail, small-file
      // OPTIMIZE selection)
      (perCol.toMap, rows, in.getLength)
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
    def lv(x: Any) = x.asInstanceOf[Number].longValue()
    def big(x: Any) = new java.math.BigDecimal(x.toString).toPlainString
    // Strings are recorded ONLY when both bounds are pure ASCII:
    // parquet orders binary stats by unsigned UTF-8 byte, which
    // disagrees with String.compareTo (UTF-16 code units) for
    // supplementary code points, and truncated stats decoded through
    // minAsString can yield U+FFFD replacement chars that break the
    // recorded ordering. Against pure-ASCII bounds the two orders
    // agree for ANY query value (a non-ASCII char sorts above every
    // ASCII char in both encodings), and ASCII survives parquet's
    // truncate-down / increment-up byte surgery intact.
    def ascii(s: String) = s.forall(_ < 0x80)
    val converted: Option[(Char, String, String)] =
      prim.getPrimitiveTypeName match {
        case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 =>
          logical match {
            case _: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation |
                 _: LogicalTypeAnnotation.TimeLogicalTypeAnnotation =>
              None
            case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation =>
              Some(('s',
                java.time.LocalDate.ofEpochDay(lv(st.genericGetMin)).toString,
                java.time.LocalDate.ofEpochDay(lv(st.genericGetMax)).toString))
            case dec: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
              // int-backed decimals store the UNSCALED integer; the
              // stat must carry the scaled value or pruning compares
              // 1234 against a pushed-down '12.34'
              Some(('n',
                java.math.BigDecimal.valueOf(lv(st.genericGetMin),
                  dec.getScale).toPlainString,
                java.math.BigDecimal.valueOf(lv(st.genericGetMax),
                  dec.getScale).toPlainString))
            case _ =>
              Some(('n', big(st.genericGetMin), big(st.genericGetMax)))
          }
        case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE =>
          Some(('n', big(st.genericGetMin), big(st.genericGetMax)))
        case PrimitiveTypeName.BINARY => logical match {
          case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation
              if ascii(st.minAsString) && ascii(st.maxAsString) =>
            Some(('s', st.minAsString, st.maxAsString))
          case _ => None
        }
        case _ => None
      }
    converted.map { case (typ, minStr, maxStr) =>
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

  /** `frows=` line payload: b64(rel) TAB rowCount. */
  def renderRows(rel: String, n: Long): String = s"${b64(rel)}\t$n"

  def parseRows(payload: String): Option[(String, Long)] =
    payload.split('\t') match {
      case Array(rel, n) => scala.util.Try(unb64(rel) -> n.toLong).toOption
      case _ => None
    }

  // ----------------------------------------------------------------
  // Pruning (read time)
  // ----------------------------------------------------------------

  /** For `'s'` this is String.compareTo — sound because recorded
    * string bounds are pure ASCII by construction (chunkStats), and
    * against an ASCII bound UTF-16 and unsigned-UTF-8 order agree for
    * any comparand. */
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

  // ----------------------------------------------------------------
  // Per-file Bloom filters (equality skipping for high-cardinality,
  // UNCLUSTERED columns — where min/max ranges prove nothing because
  // every file spans most of the key domain). The Delta/Iceberg
  // bloom-index pattern carried in the manifest: 8192 bits (1 KiB)
  // per (file, column), 4 hash probes derived from the md5 hex of the
  // value's STRING rendering — the same portable hash family as the
  // dedup token ids, so build (Spark SQL) and probe (JVM) agree bit
  // for bit. Sized for ~1k distinct values per file (FP ≈ 0.2%; at 4k
  // distinct ≈ 5% — still sound, just less pruning). Conservative
  // semantics throughout: a missing bloom, an unsupported type, or a
  // non-equality predicate keeps the file.
  // ----------------------------------------------------------------

  /** Bloom geometry: bits per filter and probes per value. */
  val BloomBits = 8192
  val BloomHashes = 4

  /** The 4 bit positions of a value's string rendering — matches the
    * Spark-side build expression
    * `conv(substring(md5(v), j*4+1, 4), 16, 10) % 8192`. */
  def bloomPositions(value: String): Seq[Int] = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(value.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    (0 until BloomHashes).map(j =>
      Integer.parseInt(hex.substring(j * 4, j * 4 + 4), 16) % BloomBits)
  }

  /** Pack set bit positions into the base64 bitset the manifest
    * carries (bit i = byte i/8, mask 1 << (i%8)). */
  def packBloom(positions: Iterable[Int]): String = {
    val bits = new Array[Byte](BloomBits / 8)
    positions.foreach { p =>
      require(p >= 0 && p < BloomBits, s"bloom position out of range: $p")
      bits(p / 8) = (bits(p / 8) | (1 << (p % 8))).toByte
    }
    Base64.getEncoder.encodeToString(bits)
  }

  /** Membership probe; true = maybe present (or unparseable bloom —
    * conservative), false = PROVABLY absent from the file. */
  def bloomMayContain(b64bits: String, value: String): Boolean =
    scala.util.Try {
      val bits = Base64.getDecoder.decode(b64bits)
      bloomPositions(value).forall(p =>
        (bits(p / 8) & (1 << (p % 8))) != 0)
    }.getOrElse(true)

  /** `bloom=` line payload: b64(rel) TAB b64(col) TAB b64(bits). */
  def renderBloom(rel: String, col: String, bits: String): String =
    Seq(b64(rel), b64(col), bits).mkString("\t")

  def parseBloom(payload: String): Option[(String, String, String)] =
    payload.split('\t') match {
      case Array(rel, col, bits) =>
        scala.util.Try((unb64(rel), unb64(col), bits)).toOption
      case _ => None
    }

  /** A filter value in the bloom's string rendering (the build side
    * is `CAST(col AS STRING)`), or None when the type can't be judged
    * (→ keep the file). Only the types [[graft.sink.CdcTable.append]]
    * accepts as `bloomCols` appear here. */
  private def encodeBloomValue(v: Any): Option[String] = v match {
    case null => None
    case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
         _: java.lang.Long => Some(v.toString)
    case s: String => Some(s)
    case _ => None
  }

  /** Could a row of a file with `blooms` (col → packed bits) satisfy
    * `filter`? False ONLY when an equality probe proves absence;
    * every other shape keeps the file. */
  def bloomAllows(blooms: Map[String, String], filter: Filter): Boolean =
    filter match {
      case EqualTo(a, v) => blooms.get(a) match {
        case Some(b) =>
          encodeBloomValue(v).forall(ev => bloomMayContain(b, ev))
        case None => true
      }
      case EqualNullSafe(a, v) if v != null =>
        bloomAllows(blooms, EqualTo(a, v))
      case In(a, vs) =>
        vs.isEmpty || vs.exists(v => bloomAllows(blooms, EqualTo(a, v)))
      case And(l, r) => bloomAllows(blooms, l) && bloomAllows(blooms, r)
      case Or(l, r) => bloomAllows(blooms, l) || bloomAllows(blooms, r)
      case _ => true
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
