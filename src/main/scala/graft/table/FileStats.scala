package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.net.{URLDecoder, URLEncoder}

/** Per-data-file column statistics for manifest-level scan pruning — the
  * Iceberg data-skipping model (Iceberg spec §Manifests: every data file
  * entry carries lower/upper bounds per column; planning intersects query
  * ranges with file bounds and never opens non-overlapping files). At
  * 100 TB the scan cost of a time-range or key-range query is decided
  * HERE: without file bounds every query reads the full table no matter
  * how selective the predicate, because parquet row-group stats only help
  * AFTER the file is opened and listed.
  *
  * Collection runs at commit time over the just-written batch — a narrow
  * columnar aggregate of ONLY the stats columns grouped by file, so the
  * cost is batch-local and proportional to the stats column set, never
  * table-sized. (Parquet footers already hold these bounds; reading them
  * directly would avoid even the batch scan, but footer stats come with
  * physical-type/truncation caveats — the recompute is exact by
  * construction and costs one map-side aggregate per commit.)
  *
  * Canonical value encoding, pinned so comparisons at plan time are exact:
  *  - integral / decimal columns → plain decimal string ("num");
  *  - float / double → `Double.toString` shortest round-trip form ("num" —
  *    bounds given as doubles canonicalize through the same path, so
  *    boundary equality is consistent);
  *  - timestamp → epoch MICROS as a long string ("num");
  *  - date → epoch DAYS as a long string ("num");
  *  - string → the value itself ("str"), compared as raw UTF-8 bytes
  *    (Spark's UTF8String order), NOT String.compareTo (UTF-16 order —
  *    disagrees above the BMP);
  *  - a file whose column is entirely null → "null" (range predicates
  *    never match null: the file is SKIPPABLE);
  *  - a column absent from the batch's schema → "absent" (reads as null
  *    under schema evolution: likewise skippable). */
object FileStats {

  /** One column's bounds inside one file. kind: num | str | null | absent. */
  final case class ColStat(kind: String, min: String, max: String)

  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String = URLDecoder.decode(s, "UTF-8")

  /** Kind + canonicalizing column expression for a stats column, from the
    * batch schema. None = unsupported type (stats not collected). */
  private[table] def canon(dt: org.apache.spark.sql.types.DataType, c: String)
      : Option[(String, org.apache.spark.sql.Column)] = {
    import org.apache.spark.sql.types._
    // the canonical expr stays in its NATIVE order-preserving type —
    // min/max aggregate first, the string cast happens after aggregation
    // (casting first would take the LEXICAL min/max: "99" > "237")
    dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | _: DecimalType =>
        Some(("num", col(c)))
      case TimestampType => Some(("num", unix_micros(col(c))))
      case TimestampNTZType =>
        // NTZ wall-clock → micros via the session TZ (this engine pins
        // UTC everywhere — Verify/Bench builders set it); bounds arrive
        // as LocalDateTime through the as-if-UTC path in [[canonBound]],
        // so collect and plan agree as long as the session stays UTC
        Some(("num", unix_micros(col(c).cast(TimestampType))))
      case DateType =>
        Some(("num", datediff(col(c), to_date(lit("1970-01-01")))))
      case StringType => Some(("str", col(c)))
      case _ => None
    }
  }

  /** Min/max per (file, column) over a written batch directory. One
    * aggregate job reading only `cols`; files where a column is all-null
    * get kind "null", columns missing from the files' schema get
    * "absent". */
  def collect(spark: SparkSession, dir: String, cols: Seq[String])
      : Map[String, Map[String, ColStat]] = {
    val df = spark.read.parquet(dir)
    val present = cols.filter(df.columns.contains)
    val absent = cols.filterNot(df.columns.contains)
    val kinds: Seq[(String, String, org.apache.spark.sql.Column)] =
      present.flatMap(c => canon(df.schema(c).dataType, c).map {
        case (k, e) => (c, k, e)
      })
    val aggs = kinds.flatMap { case (c, _, e) =>
      Seq(min(e).cast("string").as(s"__min_$c"),
        max(e).cast("string").as(s"__max_$c"))
    }
    val byFile: Map[String, Map[String, ColStat]] =
      if (aggs.isEmpty) Map.empty
      else df
        .groupBy(input_file_name().as("__file"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
        .map { r =>
          val file = r.getAs[String]("__file")
          val name = file.substring(file.lastIndexOf('/') + 1)
          name -> kinds.map { case (c, k, _) =>
            val mn = r.getAs[String](s"__min_$c")
            val mx = r.getAs[String](s"__max_$c")
            c -> (if (mn == null) ColStat("null", "", "")
                  else ColStat(k, mn, mx))
          }.toMap
        }.toMap
    if (absent.isEmpty) byFile
    else {
      // "absent" markers attach to EVERY data file of the batch — the
      // file list comes from the directory, not the aggregate, which
      // produces no rows at all when no stats column is present
      val allFiles = {
        val dirPath = java.nio.file.Paths.get(
          dir.stripPrefix("file:").stripPrefix("//"))
        val stream = java.nio.file.Files.list(dirPath)
        try {
          import scala.jdk.CollectionConverters._
          stream.iterator.asScala.map(_.getFileName.toString)
            .filter(_.endsWith(".parquet")).toSeq
        } finally stream.close()
      }
      allFiles.map { f =>
        f -> (byFile.getOrElse(f, Map.empty) ++
          absent.map(_ -> ColStat("absent", "", "")))
      }.toMap
    }
  }

  /** Manifest encoding: `file|col|kind|min|max` rows joined by `;`, every
    * field percent-encoded (string bounds are arbitrary text — the
    * charset-allowlist rule for anything embedded in line-oriented
    * metadata). */
  def encode(stats: Map[String, Map[String, ColStat]]): String =
    stats.toSeq.sortBy(_._1).flatMap { case (f, m) =>
      m.toSeq.sortBy(_._1).map { case (c, s) =>
        Seq(enc(f), enc(c), s.kind, enc(s.min), enc(s.max)).mkString("|")
      }
    }.mkString(";")

  def decode(s: String): Map[String, Map[String, ColStat]] =
    if (s == null || s.isEmpty) Map.empty
    else s.split(';').toSeq.map { row =>
      val p = row.split('|')
      (dec(p(0)), dec(p(1)), ColStat(p(2),
        if (p.length > 3) dec(p(3)) else "",
        if (p.length > 4) dec(p(4)) else ""))
    }.groupBy(_._1).map { case (f, rows) =>
      f -> rows.map(r => r._2 -> r._3).toMap
    }

  /** Raw UTF-8 byte order — the order Spark's min/max on strings uses. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Canonicalize a caller-supplied bound into the stats encoding of the
    * given kind. Accepted: any java.lang Number / BigDecimal for "num"
    * columns, java.sql.Timestamp / Instant (→ micros) and java.sql.Date /
    * LocalDate (→ days) for their respective canonical forms, String for
    * "str". */
  private[table] def canonBound(v: Any): String = v match {
    case null => null
    case t: java.sql.Timestamp =>
      (t.getTime / 1000L * 1000000L + t.getNanos / 1000L).toString
    case i: java.time.Instant =>
      (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toString
    case d: java.time.LocalDate => d.toEpochDay.toString
    case l: java.time.LocalDateTime =>
      (l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        l.getNano / 1000L).toString
    case d: Double => d.toString
    // Float.toString, NOT toDouble.toString: collected float bounds go
    // through Spark's float->string cast (shortest FLOAT repr, "0.1");
    // widening first would canonicalize the same bound to
    // "0.10000000149011612" and boundary queries would prune files that
    // contain matching rows
    case f: Float => f.toString
    case n: Number => new java.math.BigDecimal(n.toString).toPlainString
    case s: String => s
    case o => throw new IllegalArgumentException(
      s"unsupported prune bound type: ${o.getClass.getName}")
  }

  /** Spark's total order over canonical numeric strings: -Infinity <
    * finite < Infinity < NaN (Spark sorts and compares NaN as the largest
    * value, so float/double stats columns can legitimately carry
    * "NaN"/"Infinity" bounds — BigDecimal alone would throw and brick
    * every planRange on the column). */
  private def numCmp(a: String, b: String): Int = {
    def rank(s: String): Int = s match {
      case "NaN"       => 3
      case "Infinity"  => 2
      case "-Infinity" => 0
      case _           => 1
    }
    val ra = rank(a); val rb = rank(b)
    if (ra != 1 || rb != 1) Integer.compare(ra, rb)
    else BigDecimal(a).compare(BigDecimal(b))
  }

  /** Total order over canonical bound strings of a kind: "num" = the
    * Spark numeric order above, "str" = raw UTF-8 bytes. */
  private[table] def cmpCanon(kind: String, a: String, b: String): Int =
    if (kind == "num") numCmp(a, b)
    else if (utf8Lt(a, b)) -1 else if (utf8Lt(b, a)) 1 else 0

  /** Parse-ONCE sortable form of a canonical bound: hot driver-side
    * sort/search paths (mergeKeys' exact key prune) must not re-parse a
    * BigDecimal per comparison. rank carries the -Inf < finite < Inf <
    * NaN total order; str kind compares raw UTF-8 bytes. */
  private[table] final case class CanonKey(rank: Int,
      num: java.math.BigDecimal, str: Array[Byte])

  private[table] def canonKey(kind: String, s: String): CanonKey =
    if (kind == "num") s match {
      case "NaN"       => CanonKey(3, null, null)
      case "Infinity"  => CanonKey(2, null, null)
      case "-Infinity" => CanonKey(0, null, null)
      case _           => CanonKey(1, new java.math.BigDecimal(s), null)
    } else CanonKey(1, null, s.getBytes("UTF-8"))

  private[table] def cmpKey(a: CanonKey, b: CanonKey): Int =
    if (a.rank != b.rank) Integer.compare(a.rank, b.rank)
    else if (a.num != null) a.num.compareTo(b.num)
    else if (a.str != null) java.util.Arrays.compareUnsigned(a.str, b.str)
    else 0

  /** Can a file with bounds `s` possibly contain a value in [lo, hi]
    * (inclusive; null bound = unbounded on that side)? Missing stats →
    * true (never prune blind); all-null / absent column → false (a range
    * predicate cannot match null). */
  def overlaps(s: ColStat, lo: String, hi: String): Boolean = s.kind match {
    case "null" | "absent" => false
    case "num" =>
      (lo == null || numCmp(s.max, lo) >= 0) && (hi == null || numCmp(s.min, hi) <= 0)
    case "str" =>
      (lo == null || !utf8Lt(s.max, lo)) && (hi == null || !utf8Lt(hi, s.min))
    case _ => true
  }
}
