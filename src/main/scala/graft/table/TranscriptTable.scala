package graft.table

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Iceberg-*like* table: partitioned Parquet + an atomic per-batch commit
  * manifest (SURVEY.md §7.5). Iceberg jars are absent from this image, so
  * snapshot semantics are realized manually:
  *
  *   table/
  *     data/batch=<id>/...parquet      -- data files for one batch
  *     _manifests/manifest-<id>.json   -- atomic commit marker (tmp+rename)
  *
  * A batch is visible iff its manifest exists; a crashed batch leaves only
  * orphan data files that a re-run overwrites. Re-running a committed batch
  * is a no-op (idempotent resume). A real Iceberg catalog can implement the
  * same interface unchanged. */
object TranscriptTable {

  def manifestDir(table: String): Path = Paths.get(table, "_manifests")
  def dataDir(table: String, batchId: String): String = s"$table/data/batch=$batchId"

  def committedBatches(table: String): Seq[String] = {
    val dir = manifestDir(table)
    if (!Files.exists(dir)) return Seq.empty
    val stream = Files.list(dir)
    try stream.iterator.asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("manifest-") && n.endsWith(".json"))
      .map(n => n.stripPrefix("manifest-").stripSuffix(".json"))
      .toSeq.sorted
    finally stream.close()
  }

  def isCommitted(table: String, batchId: String): Boolean =
    Files.exists(manifestDir(table).resolve(s"manifest-$batchId.json"))

  /** JSON string literal with full escaping (quotes, backslashes, control
    * chars) — manifest values such as lineage summaries must never be able
    * to corrupt the manifest that committedRowCount/audit readers parse. */
  private[graft] def jstr(s: String): String = "\"" + s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  } + "\""

  /** Write one batch then commit it atomically. `manifestExtra` carries the
    * batch lineage summary into the manifest for audit; the batch SCHEMA
    * is always recorded (see [[read]] — schema evolution resolves from
    * manifests alone, the Iceberg model, never from data-file footers).
    * `statsCols` opts the batch into file-level min/max bounds
    * ([[FileStats]]) for manifest-pruned reads ([[readRange]]) — one
    * batch-local columnar aggregate before the commit flip. */
  def writeBatch(df: DataFrame, table: String, batchId: String,
      manifestExtra: Map[String, String] = Map.empty,
      statsCols: Seq[String] = Nil): Unit = {
    if (isCommitted(table, batchId)) return // idempotent resume
    writeData(df, table, batchId)
    commit(table, batchId, manifestExtra + ("schema" -> df.schema.json) ++
      statsExtras(df.sparkSession, table, batchId, statsCols))
  }

  /** File-stats manifest entries for a STAGED (written, uncommitted)
    * batch: collected by re-scanning only the stats columns of the
    * just-written parquet, grouped by file. Empty `statsCols` → no
    * entries (zero cost). */
  def statsExtras(spark: SparkSession, table: String, batchId: String,
      statsCols: Seq[String]): Map[String, String] =
    if (statsCols.isEmpty) Map.empty
    else Map(
      "stats_cols" -> statsCols.mkString(","),
      "file_stats" -> FileStats.encode(
        FileStats.collect(spark, dataDir(table, batchId), statsCols)))

  /** Stage the data files of one batch WITHOUT committing: the batch stays
    * invisible (no manifest) until [[commit]] flips it. Lets callers derive
    * lineage/metrics by re-scanning the just-written parquet — a narrow
    * columnar read — instead of caching the whole in-flight batch. */
  def writeData(df: DataFrame, table: String, batchId: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(dataDir(table, batchId))

  /** Atomically publish a staged batch (manifest tmp+rename). A batch that
    * records a schema is validated against the table's current union BEFORE
    * the manifest flips — every commit path (writeBatch, commitStaged,
    * streaming ingest, compaction) funnels through here, so an incompatible
    * type change fails the offending write instead of bricking reads. */
  def commit(table: String, batchId: String,
      manifestExtra: Map[String, String] = Map.empty): Unit = {
    manifestExtra.get("schema").foreach { json =>
      validateSchemaCompatible(table,
        org.apache.spark.sql.types.DataType.fromJson(json)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
    }
    val target = dataDir(table, batchId)
    val mdir = manifestDir(table)
    Files.createDirectories(mdir)
    val files = {
      val stream = Files.list(Paths.get(target))
      try stream.iterator.asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSeq.sorted
      finally stream.close()
    }
    val json = {
      val extras = manifestExtra.toSeq.sortBy(_._1)
        .map { case (k, v) => s"  ${jstr(k)}: ${jstr(v)}" }
      val fileList = files.map(f => s"    ${jstr(f)}").mkString(",\n")
      (Seq(
        s"""  "batch_id": ${jstr(batchId)}""",
        s"""  "n_files": ${files.length}""",
        s"""  "files": [\n$fileList\n  ]""") ++ extras).mkString("{\n", ",\n", "\n}\n")
    }
    // writer-unique tmp: two racing committers of the same batch id must
    // never share a staging file, or the winner could publish the loser's
    // half-written bytes
    val tmp = mdir.resolve(
      s".manifest-$batchId.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    Files.write(tmp, json.getBytes(UTF_8))
    // CAS visibility flip: hard-linking into place is create-EXCLUSIVE, so
    // when two writers race on one batch id exactly one wins and the loser
    // gets a clean error — never a torn or silently overwritten manifest.
    // (A plain ATOMIC_MOVE rename REPLACES an existing target on POSIX.)
    val manifest = mdir.resolve(s"manifest-$batchId.json")
    try Files.createLink(manifest, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new IllegalStateException(
          s"concurrent commit: batch $batchId already committed in $table")
    }
    Files.delete(tmp)
  }

  private def manifestJson(table: String, b: String): String =
    new String(Files.readAllBytes(
      manifestDir(table).resolve(s"manifest-$b.json")), UTF_8)

  private val ReplacesRe =
    java.util.regex.Pattern.compile("\"replaces\": \"([^\"]*)\"")

  /** Batch ids retired by compaction manifests (optionally only manifests
    * up to `upTo`, for time travel). Driver-side manifest reads only. */
  def replacedBatches(table: String, upTo: String = null): Set[String] =
    committedBatches(table)
      .filter(b => upTo == null || b <= upTo)
      .flatMap { b =>
        val m = ReplacesRe.matcher(manifestJson(table, b))
        if (m.find()) m.group(1).split(',').toSeq.filter(_.nonEmpty)
        else Seq.empty
      }.toSet

  /** The batches a snapshot reader should scan: committed minus retired.
    * With `asOf`, retirement by LATER compactions is ignored, so a
    * pre-compaction snapshot still reads the original batches (valid until
    * [[vacuum]] reclaims their files — the expire-snapshots trade-off). */
  def liveBatches(table: String, asOf: String = null): Seq[String] = {
    val all = committedBatches(table).filter(b => asOf == null || b <= asOf)
    val retired = replacedBatches(table, asOf)
    all.filterNot(retired.contains)
  }

  /** Read all committed batches (snapshot view). */
  def read(spark: SparkSession, table: String): DataFrame =
    readAsOf(spark, table, null)

  /** JSON-string unescape for manifest values (inverse of [[jstr]]). */
  private[graft] def junstr(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => b += '"'; i += 2
          case '\\' => b += '\\'; i += 2
          case 'n'  => b += '\n'; i += 2
          case 'r'  => b += '\r'; i += 2
          case 't'  => b += '\t'; i += 2
          case 'u'  =>
            b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case o    => b += o; i += 2
        }
      } else { b += c; i += 1 }
    }
    b.toString
  }

  /** Parsed-schema cache: a manifest is immutable once committed (CAS
    * link; compaction writes NEW manifests), so its schema can be parsed
    * once per JVM. Without this, commit-time validation re-reads and
    * re-parses every live manifest on every commit — O(batches) file
    * reads per tick, O(n²) over an ongoing table's life (review
    * finding). Bounded: cleared wholesale past 8192 entries (a JVM
    * touching that many distinct batches is a maintenance job, not a
    * pipeline tick). */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Long, Long), Option[org.apache.spark.sql.types.StructType]]()

  /** The batch's recorded schema, if its manifest carries one. The escaped
    * string is scanned manually — a `(?:[^"\\]|\\.)*` regex stack-overflows
    * on multi-KB schema JSON (backtracking frame per character). The cache
    * key folds the manifest file's (size, mtime) — one stat instead of a
    * read+parse — so a table deleted and rebuilt at the same path in one
    * JVM can never serve a stale schema. */
  def batchSchema(table: String, batchId: String): Option[org.apache.spark.sql.types.StructType] = {
    if (schemaCache.size > 8192) schemaCache.clear()
    val mf = manifestDir(table).resolve(s"manifest-$batchId.json")
    val attrs = Files.readAttributes(mf,
      classOf[java.nio.file.attribute.BasicFileAttributes])
    schemaCache.computeIfAbsent(
      (table, batchId, attrs.size, attrs.lastModifiedTime.toMillis),
      _ => parseBatchSchema(table, batchId))
  }

  /** A string-valued manifest entry, unescaped. Scanned manually — a
    * `(?:[^"\\]|\\.)*` regex stack-overflows on multi-KB values
    * (backtracking frame per character). */
  private def manifestValue(table: String, batchId: String,
      key: String): Option[String] = {
    val json = manifestJson(table, batchId)
    val marker = "\"" + key + "\": \""
    val keyAt = json.indexOf(marker)
    if (keyAt < 0) return None
    val start = keyAt + marker.length
    var i = start
    while (i < json.length && json.charAt(i) != '"') {
      if (json.charAt(i) == '\\') i += 2 else i += 1
    }
    if (i >= json.length) return None
    Some(junstr(json.substring(start, i)))
  }

  private def parseBatchSchema(table: String, batchId: String)
      : Option[org.apache.spark.sql.types.StructType] =
    manifestValue(table, batchId, "schema").map(j =>
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** The batch's recorded per-file column bounds, if any. */
  def fileStats(table: String, batchId: String)
      : Map[String, Map[String, FileStats.ColStat]] =
    manifestValue(table, batchId, "file_stats")
      .map(FileStats.decode).getOrElse(Map.empty)

  /** Stats columns recorded by the given batches' manifests — rewrites
    * (delete/update/merge/compact) inherit them so superseding a batch
    * never silently LOSES prunability a layout had: a table skippable on
    * (ts, event_id) stays skippable on both after any rewrite. */
  private def inheritedStatsCols(table: String, batches: Seq[String]): Seq[String] =
    batches.flatMap(b => manifestValue(table, b, "stats_cols")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)).distinct

  /** Data files listed by the batch's manifest (names, not paths). */
  def batchFiles(table: String, batchId: String): Seq[String] = {
    val json = manifestJson(table, batchId)
    val start = json.indexOf("\"files\": [")
    if (start < 0) return Seq.empty
    val end = json.indexOf(']', start)
    val m = java.util.regex.Pattern.compile("\"([^\"]+)\"")
      .matcher(json.substring(start + "\"files\": [".length, end))
    val b = Seq.newBuilder[String]
    while (m.find()) b += m.group(1)
    b.result()
  }

  /** Recursively relax every nullability flag (top-level `nullable`, array
    * `containsNull`, map `valueContainsNull`, nested struct fields) to true.
    * Batch schemas reach the manifest through two paths that disagree ONLY
    * in these flags — writeBatch records the pre-write `df.schema` (nested
    * flags as constructed, often containsNull=false), while commitStaged
    * records a post-parquet-read schema (Spark normalizes nested fields to
    * nullable) — so schema COMPARISON must be nullability-insensitive and
    * the resolved union must store the relaxed form, or two logically
    * identical batches would fail the ADDING-only check and brick reads. */
  private[graft] def relaxNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = relaxNullable(f.dataType), nullable = true)))
      case a: ArrayType => ArrayType(relaxNullable(a.elementType), containsNull = true)
      case m: MapType =>
        MapType(relaxNullable(m.keyType), relaxNullable(m.valueType), valueContainsNull = true)
      case other => other
    }
  }

  /** Union schema of the given batches per the table's evolution contract:
    * ADDING columns is supported (old rows read the new column as null);
    * changing a column's type is not. Resolution is manifest-only —
    * O(batches) driver-side string reads, never a data-file footer scan
    * (the parquet `mergeSchema` option reads EVERY footer, which at 100 TB
    * is a job of its own; Iceberg keeps schema in metadata for the same
    * reason). Returns None when any batch predates schema recording —
    * readers then fall back to single-schema behavior. */
  private def unionSchema(table: String, batches: Seq[String])
      : Option[org.apache.spark.sql.types.StructType] = {
    val schemas = batches.map(b => batchSchema(table, b))
    if (schemas.exists(_.isEmpty)) return None
    val fields = scala.collection.mutable.LinkedHashMap
      .empty[String, org.apache.spark.sql.types.StructField]
    schemas.flatten.foreach(_.fields.foreach { f =>
      val relaxed = relaxNullable(f.dataType)
      fields.get(f.name) match {
        case None => fields(f.name) = f.copy(dataType = relaxed, nullable = true)
        case Some(prev) =>
          require(prev.dataType == relaxed,
            s"schema evolution supports ADDING columns only: ${f.name} is " +
              s"${prev.dataType.simpleString} in one batch and ${relaxed.simpleString} in another")
      }
    })
    Some(org.apache.spark.sql.types.StructType(fields.values.toSeq))
  }

  /** Reject an incompatible batch AT COMMIT TIME (the Iceberg model): a
    * batch whose column type conflicts with the table's current union must
    * fail its own write, not poison every subsequent read/compact until a
    * manifest is hand-edited. Compares nullability-insensitively (see
    * [[relaxNullable]]); columns absent from history are additions and
    * pass. Skipped when any live batch predates schema recording (no
    * union is resolvable — legacy single-schema behavior). */
  private def validateSchemaCompatible(table: String,
      newSchema: org.apache.spark.sql.types.StructType): Unit = {
    val live = liveBatches(table, null)
    if (live.isEmpty) return
    unionSchema(table, live).foreach { union =>
      newSchema.fields.foreach { f =>
        union.fields.find(_.name == f.name).foreach { prev =>
          val relaxed = relaxNullable(f.dataType)
          require(prev.dataType == relaxed,
            s"incompatible batch schema rejected at commit: ${f.name} is " +
              s"${prev.dataType.simpleString} in $table but " +
              s"${relaxed.simpleString} in the new batch — schema evolution " +
              "supports ADDING columns only")
        }
      }
    }
  }

  /** Time-travel-ish read: only batches committed up to `asOfBatch`
    * (inclusive, lexicographic batch-id order — ids are zero-padded).
    * Schema evolution: when every live batch's manifest records a schema,
    * the scan is planned with their UNION (added columns read as null in
    * batches that predate them), resolved from manifests alone. */
  def readAsOf(spark: SparkSession, table: String, asOfBatch: String): DataFrame = {
    val batches = liveBatches(table, asOfBatch)
    require(batches.nonEmpty, s"no committed batches in $table")
    val dirs = batches.map(b => dataDir(table, b))
    unionSchema(table, batches) match {
      case Some(schema) => spark.read.schema(schema).parquet(dirs: _*)
      case None         => spark.read.parquet(dirs: _*)
    }
  }

  /** A manifest-pruned scan plan for `column` in [lo, hi]: which data
    * files can contain a matching row, per the recorded [[FileStats]]
    * bounds. Files of batches without stats (or without stats for this
    * column) are KEPT — pruning is never allowed to be wrong, only to be
    * unavailable. The skipped count is the audit (no silent caps: how
    * much a query's layout saved is a queryable number, not a guess). */
  final case class ScanPlan(keptPaths: Seq[String], nFilesTotal: Int,
      nFilesSkipped: Int, batches: Seq[String])

  def planRange(table: String, column: String, lo: Any, hi: Any,
      asOfBatch: String = null): ScanPlan = {
    val batches = liveBatches(table, asOfBatch)
    require(batches.nonEmpty, s"no committed batches in $table")
    val loC = FileStats.canonBound(lo)
    val hiC = FileStats.canonBound(hi)
    var total = 0
    var skipped = 0
    val kept = Seq.newBuilder[String]
    batches.foreach { b =>
      val stats = fileStats(table, b)
      val files = batchFiles(table, b)
      total += files.length
      files.foreach { f =>
        // both bounds null = no range predicate at all: every file is
        // kept, INCLUDING all-null/absent-column files — readRange's
        // predicate degenerates to keep-everything (null rows included),
        // so pruning on "a range can't match null" would drop their rows
        val keep = (loC == null && hiC == null) ||
          (stats.get(f).flatMap(_.get(column)) match {
            case Some(s) => FileStats.overlaps(s, loC, hiC)
            case None    => true // no bounds recorded for this file/column
          })
        if (keep) kept += s"${dataDir(table, b)}/$f" else skipped += 1
      }
    }
    ScanPlan(kept.result(), total, skipped, batches)
  }

  /** Range read with manifest-level data skipping: plans via
    * [[planRange]], scans only overlapping files (with the union schema,
    * so evolution still resolves), then applies the EXACT predicate —
    * bounds prune IO, the filter pins semantics. Bounds are inclusive;
    * null = unbounded on that side. */
  def readRange(spark: SparkSession, table: String, column: String,
      lo: Any, hi: Any, asOfBatch: String = null): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val plan = planRange(table, column, lo, hi, asOfBatch)
    val pred = (if (lo == null) lit(true) else col(column) >= lit(lo)) &&
      (if (hi == null) lit(true) else col(column) <= lit(hi))
    if (plan.keptPaths.isEmpty)
      return readAsOf(spark, table, asOfBatch).filter(lit(false))
    unionSchema(table, plan.batches) match {
      case Some(schema) =>
        spark.read.schema(schema).parquet(plan.keptPaths: _*).filter(pred)
      case None => spark.read.parquet(plan.keptPaths: _*).filter(pred)
    }
  }

  /** Small-file compaction (Iceberg-style table maintenance): rewrite a set
    * of committed batches as ONE new batch with `targetFiles` files and
    * atomically supersede them. The flip is a single manifest rename — the
    * new manifest carries `replaces`, and readers resolve retirement at
    * listing time, so a snapshot never sees the rows twice or not at all.
    * Old manifests stay on disk: `isCommitted` keeps answering true for
    * replaced ids, so a resumed producer still no-ops on them. Old DATA
    * stays until [[vacuum]], keeping pre-compaction time travel valid. */
  def compact(spark: SparkSession, table: String, batchIds: Seq[String],
      newBatchId: String, targetFiles: Int = 1): Unit =
    compactWith(spark, table, batchIds, newBatchId,
      _.coalesce(targetFiles), Nil)

  /** Clustering compaction: rewrite the batches RANGE-PARTITIONED and
    * sorted on `sortCols`, so each output file owns a disjoint slice of
    * the sort-key space — the layout that makes [[readRange]] pruning on
    * those columns effective (Iceberg's rewrite_data_files with a sort
    * order). File bounds for `statsCols` (default: the sort columns) are
    * recorded on the new manifest. Sorting is a batch-set-local shuffle —
    * compaction-sized, never table-sized. */
  def compactSorted(spark: SparkSession, table: String, batchIds: Seq[String],
      newBatchId: String, sortCols: Seq[String], targetFiles: Int,
      statsCols: Seq[String] = Nil): Unit = {
    require(sortCols.nonEmpty, "compactSorted needs sort columns")
    import org.apache.spark.sql.functions.col
    val cols = sortCols.map(col)
    compactWith(spark, table, batchIds, newBatchId,
      df => df.repartitionByRange(targetFiles, cols: _*)
        .sortWithinPartitions(cols: _*),
      if (statsCols.isEmpty) sortCols else statsCols)
  }

  /** Z-order clustering compaction ([[ZOrder]]): multi-dimensional
    * locality, so [[readRange]] prunes on EVERY z column — the layout for
    * tables queried along more than one axis (time AND key, say). File
    * bounds for all z columns are recorded. */
  def compactZOrder(spark: SparkSession, table: String, batchIds: Seq[String],
      newBatchId: String, zCols: Seq[String], targetFiles: Int,
      statsCols: Seq[String] = Nil): Unit =
    compactWith(spark, table, batchIds, newBatchId,
      df => ZOrder.cluster(df, zCols, targetFiles),
      if (statsCols.isEmpty) zCols else statsCols)

  private def compactWith(spark: SparkSession, table: String,
      batchIds: Seq[String], newBatchId: String,
      layout: DataFrame => DataFrame, statsCols: Seq[String]): Unit = {
    require(batchIds.nonEmpty, "nothing to compact")
    require(batchIds.forall(isCommitted(table, _)),
      s"compact requires committed batches: $batchIds")
    require(!isCommitted(table, newBatchId), s"$newBatchId already committed")
    // time travel resolves retirement from manifests with id <= asOf, so a
    // compaction manifest must sort AFTER everything it replaces — otherwise
    // a snapshot between newBatchId and the replaced ids would double-read
    require(batchIds.forall(_ < newBatchId),
      s"compacted batch id $newBatchId must sort after the batches it replaces")
    val retired = replacedBatches(table)
    require(batchIds.forall(!retired.contains(_)),
      "a batch can be compacted only once")
    // compaction reads with the union schema too: the rewritten batch
    // must not silently drop a column added mid-history
    val df = unionSchema(table, batchIds) match {
      case Some(s) => spark.read.schema(s).parquet(batchIds.map(b => dataDir(table, b)): _*)
      case None    => spark.read.parquet(batchIds.map(b => dataDir(table, b)): _*)
    }
    layout(df).write.mode(SaveMode.Overwrite)
      .parquet(dataDir(table, newBatchId))
    val withLineage = batchIds.filter(b => Files.exists(Paths.get(lineageDir(table, b))))
    if (withLineage.nonEmpty)
      spark.read.parquet(withLineage.map(b => lineageDir(table, b)): _*)
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(lineageDir(table, newBatchId))
    // carry the replaced row counts so manifest-only monitoring stays exact
    val nTurns = batchIds.map { b =>
      val m = java.util.regex.Pattern.compile("\"n_turns\": \"(\\d+)\"")
        .matcher(manifestJson(table, b))
      if (m.find()) m.group(1).toLong else 0L
    }.sum
    commit(table, newBatchId, Map(
      "replaces" -> batchIds.sorted.mkString(","),
      "n_turns" -> nTurns.toString,
      "schema" -> df.schema.json) ++
      statsExtras(spark, table, newBatchId,
        (statsCols ++ inheritedStatsCols(table, batchIds)).distinct))
  }

  /** Summary of a pruned copy-on-write rewrite: how many live batches the
    * table had, how many actually rewrote (the rest were skipped by file
    * bounds at ZERO IO), and the row counts of the rewritten slice before
    * and after. A replayed (already-committed) `newBatchId` returns all
    * zeros with `nBatchesRewritten` = 0. */
  final case class RewriteStats(nBatchesTotal: Int, nBatchesRewritten: Int,
      rowsBefore: Long, rowsAfter: Long)

  /** Row-level DELETE (Iceberg's `DELETE FROM ... WHERE col BETWEEN lo
    * AND hi` under copy-on-write): batches whose recorded file bounds
    * cannot contain a matching row are NOT TOUCHED — no read, no rewrite,
    * their manifests stay live — and only the overlapping batches are
    * rewritten without the matching rows and atomically superseded
    * (`replaces`, the compaction flip). At 100 TB this is the difference
    * between a key-range purge (GDPR-style) costing a full table rewrite
    * and costing a few batches of IO. Null values in `column` never match
    * a range and always survive; bounds are inclusive, null = unbounded
    * on that side (both null = every row matches: the whole table
    * rewrites empty). Time travel to pre-delete snapshots stays valid
    * until [[vacuum]]; replaying a committed `newBatchId` no-ops. The new
    * batch re-records file bounds for `column` (plus `statsCols`), so
    * later range reads keep pruning. */
  def deleteRange(spark: SparkSession, table: String, column: String,
      lo: Any, hi: Any, newBatchId: String,
      statsCols: Seq[String] = Nil): RewriteStats =
    cowRewrite(spark, table, column, lo, hi, newBatchId, statsCols,
      (df, cond) => df.filter(org.apache.spark.sql.functions.not(
        org.apache.spark.sql.functions.coalesce(cond,
          org.apache.spark.sql.functions.lit(false)))))

  /** Row-level UPDATE over a key range (`UPDATE ... SET c = expr WHERE
    * col BETWEEN lo AND hi`): matching rows get each `set` column
    * replaced by its expression, every other row passes through
    * unchanged; only bounds-overlapping batches rewrite. SQL UPDATE
    * semantics: the range condition AND every SET expression evaluate
    * against the OLD row (one projection applies them simultaneously),
    * so SET may safely rewrite the range column itself or reference
    * other SET columns. This is the in-place redaction path — e.g.
    * `set = Map("text" -> piiScrubExpr)` scrubs one conversation-id
    * range without touching the rest of the table. */
  def updateRange(spark: SparkSession, table: String, column: String,
      lo: Any, hi: Any, newBatchId: String,
      set: Map[String, org.apache.spark.sql.Column],
      statsCols: Seq[String] = Nil): RewriteStats = {
    require(set.nonEmpty, "updateRange needs SET columns")
    // validate SET names up front against the table's recorded union —
    // a typo'd column must fail NOW, not silently no-op on every tick
    // whose range happens to miss all file bounds
    val tableUnion = unionSchema(table, liveBatches(table))
    tableUnion.foreach { s =>
      val missing = set.keySet -- s.fieldNames.toSet
      require(missing.isEmpty, s"SET columns absent from table: $missing")
    }
    import org.apache.spark.sql.functions.{coalesce, col, lit, when}
    cowRewrite(spark, table, column, lo, hi, newBatchId, statsCols,
      (df, cond) => {
        // schema evolution: a SET column recorded in the TABLE union but
        // absent from the touched (older) batches reads as null there —
        // SQL UPDATE semantics, so the rewrite ADDS it (typed from the
        // recorded union) with old-value null, instead of failing a
        // rewrite the up-front validation already admitted
        val missing = (set.keySet -- df.columns.toSet).toSeq.sorted
        val missingFields = missing.map { c =>
          tableUnion.flatMap(_.fields.find(_.name == c)).getOrElse(
            // no recorded union (pre-schema-era batches): no type to give
            // the null, so the strict failure stands
            throw new IllegalArgumentException(
              s"SET column absent from the touched batches and no recorded " +
                s"table schema to type it: $c"))
        }
        // ONE select: every when() resolves cond and the SET expressions
        // against the INPUT frame — a withColumn fold would evaluate
        // later SETs (and the condition) on partially-updated rows
        val hit = coalesce(cond, lit(false))
        df.select(df.columns.map { c =>
          set.get(c).map(e => when(hit, e).otherwise(col(c)).as(c))
            .getOrElse(col(c))
        } ++ missingFields.map { f =>
          when(hit, set(f.name)).otherwise(lit(null).cast(f.dataType)).as(f.name)
        }: _*)
      })
  }

  /** MERGE (keyed upsert) under copy-on-write — Iceberg's `MERGE INTO ...
    * WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT` on one key
    * column: every table row whose `keyCol` matches an update row is
    * replaced by the update rows; keys absent from the table insert.
    * (Duplicate keys WITHIN `updates` all insert — dedup upstream.)
    *
    * IO shape, the part that matters at 100 TB: candidate batches come
    * from the manifests' per-file key bounds, NOT from the update keys'
    * global [min,max] — a CDC batch whose inserts run past the table's
    * max key (the normal shape for time-ordered ids) must not force a
    * full-table rewrite. Up to `maxExactKeys` distinct keys the
    * membership test is EXACT: the canonical keys sort once driver-side
    * (bounded, the IVF-sample convention) and binary-search every file's
    * bounds; past the cap it degrades to [min,max] range pruning —
    * coarser, never wrong. Matching rows then drop by one broadcastable
    * anti-join inside only the touched batches; survivors + ALL update
    * rows commit as ONE new batch atomically superseding the touched
    * ones. Null update keys never match (SQL) and simply insert. */
  def mergeKeys(spark: SparkSession, table: String, keyCol: String,
      updates: DataFrame, newBatchId: String,
      statsCols: Seq[String] = Nil,
      maxExactKeys: Int = 1 << 20): RewriteStats = {
    import org.apache.spark.sql.functions.{broadcast, col, max => fmax, min => fmin}
    if (isCommitted(table, newBatchId)) return RewriteStats(0, 0, 0L, 0L)
    val live = liveBatches(table)
    require(live.nonEmpty, s"no committed batches in $table")
    // uniform id-ordering invariant: whether this merge rewrites or lands
    // as a pure insert depends on DATA, so the check must not — a
    // low-sorting id would leak the merge's rows into older snapshots
    require(live.forall(_ < newBatchId),
      s"merge batch id $newBatchId must sort after every live batch")
    val u = updates.localCheckpoint()
    val keys = u.select(col(keyCol)).na.drop(Seq(keyCol)).distinct()
      .localCheckpoint()
    val nKeys = keys.count()
    val kind = FileStats.canon(u.schema(keyCol).dataType, keyCol).map(_._1)
    val touched: Seq[String] =
      if (nKeys == 0) Nil
      else if (kind.isEmpty) live // unprunable key type: no stats exist
      else if (nKeys <= maxExactKeys) {
        val k = kind.get
        // parse-once sort keys: cmpCanon would re-parse two BigDecimals
        // per comparison — ~20M parses at the 1M-key cap
        val sorted = keys.collect()
          .map(r => FileStats.canonKey(k, FileStats.canonBound(r.get(0))))
          .sortWith(FileStats.cmpKey(_, _) < 0)
        def anyIn(loS: String, hiS: String): Boolean = {
          val lo = FileStats.canonKey(k, loS)
          val hi = FileStats.canonKey(k, hiS)
          var a = 0; var b = sorted.length
          while (a < b) {
            val m = (a + b) >>> 1
            if (FileStats.cmpKey(sorted(m), lo) < 0) a = m + 1 else b = m
          }
          a < sorted.length && FileStats.cmpKey(sorted(a), hi) <= 0
        }
        live.filter { b =>
          val stats = fileStats(table, b)
          batchFiles(table, b).exists { f =>
            stats.get(f).flatMap(_.get(keyCol)) match {
              case Some(s) if s.kind == "null" || s.kind == "absent" => false
              case Some(s) => anyIn(s.min, s.max)
              case None    => true // no bounds recorded: never prune blind
            }
          }
        }
      } else {
        val r = keys.agg(fmin(col(keyCol)), fmax(col(keyCol))).head()
        val plan = planRange(table, keyCol, r.get(0), r.get(1))
        plan.batches.filter(b =>
          plan.keptPaths.exists(_.startsWith(dataDir(table, b) + "/")))
      }
    val effStats = (statsCols :+ keyCol).distinct
    if (touched.isEmpty) {
      // pure insert: provably no key matches — a plain new batch
      val rowsUpd = u.count()
      writeData(u, table, newBatchId)
      commit(table, newBatchId, Map(
        "n_turns" -> rowsUpd.toString,
        "schema" -> u.schema.json) ++
        statsExtras(spark, table, newBatchId, effStats))
      return RewriteStats(live.size, 0, 0L, rowsUpd)
    }
    val dfT = unionSchema(table, touched) match {
      case Some(s) =>
        spark.read.schema(s).parquet(touched.map(b => dataDir(table, b)): _*)
      case None =>
        spark.read.parquet(touched.map(b => dataDir(table, b)): _*)
    }
    val rowsBefore = dfT.count()
    val survivors =
      if (nKeys <= maxExactKeys) dfT.join(broadcast(keys), Seq(keyCol), "left_anti")
      else dfT.join(keys, Seq(keyCol), "left_anti")
    val out = survivors.unionByName(u, allowMissingColumns = true)
    val rowsAfter = commitRewrite(spark, table, touched, newBatchId, out, effStats)
    RewriteStats(live.size, touched.size, rowsBefore, rowsAfter)
  }

  /** Shared pruned copy-on-write rewrite: plan candidate files from
    * manifest bounds, read ONLY batches owning at least one candidate
    * file, apply `body` (which receives the exact match condition —
    * pruning decides IO, the condition decides semantics), write as one
    * new batch superseding exactly the touched ones. Row counts come from
    * parquet metadata (count-pushdown scans, no data read). */
  private def cowRewrite(spark: SparkSession, table: String, column: String,
      lo: Any, hi: Any, newBatchId: String, statsCols: Seq[String],
      body: (DataFrame, org.apache.spark.sql.Column) => DataFrame)
      : RewriteStats = {
    import org.apache.spark.sql.functions.{col, lit}
    if (isCommitted(table, newBatchId)) return RewriteStats(0, 0, 0L, 0L)
    val plan = planRange(table, column, lo, hi)
    val touched = plan.batches.filter { b =>
      val prefix = dataDir(table, b) + "/"
      plan.keptPaths.exists(_.startsWith(prefix))
    }
    if (touched.isEmpty)
      return RewriteStats(plan.batches.size, 0, 0L, 0L)
    require(touched.forall(_ < newBatchId),
      s"rewrite batch id $newBatchId must sort after the batches it replaces")
    val df = unionSchema(table, touched) match {
      case Some(s) =>
        spark.read.schema(s).parquet(touched.map(b => dataDir(table, b)): _*)
      case None =>
        spark.read.parquet(touched.map(b => dataDir(table, b)): _*)
    }
    val rowsBefore = df.count()
    val cond = (if (lo == null) lit(true) else col(column) >= lit(lo)) &&
      (if (hi == null) lit(true) else col(column) <= lit(hi))
    val out = body(df, cond)
    val rowsAfter = commitRewrite(spark, table, touched, newBatchId, out,
      statsCols :+ column)
    RewriteStats(plan.batches.size, touched.size, rowsBefore, rowsAfter)
  }

  /** Shared tail of every row-CHANGING rewrite (delete/update/merge):
    * write the new batch, count it back from parquet metadata, and commit
    * with `replaces` + inherited stats columns. Deliberately does NOT
    * carry the replaced batches' lineage — lineage describes the rows a
    * batch was written with, and after a purge/redaction those rows are
    * gone or changed; carrying it forward would keep purged-row digests
    * alive past [[vacuum]] (the GDPR hole) and desync lineage totals from
    * manifest `n_turns`. Row-preserving compaction keeps its verbatim
    * carry in [[compactWith]]. Re-checks the touched batches are STILL
    * live right before the flip: a concurrent compaction of one of them
    * would otherwise leave both the compacted copy and these survivors
    * live (double reads). The check narrows the race to the write-commit
    * gap — table maintenance assumes a single writer, as in compactWith. */
  private def commitRewrite(spark: SparkSession, table: String,
      touched: Seq[String], newBatchId: String, out: DataFrame,
      statsCols: Seq[String]): Long = {
    out.write.mode(SaveMode.Overwrite).parquet(dataDir(table, newBatchId))
    val rowsAfter = spark.read.schema(out.schema)
      .parquet(dataDir(table, newBatchId)).count()
    val retired = replacedBatches(table)
    require(touched.forall(!retired.contains(_)),
      s"concurrently superseded during rewrite: ${touched.filter(retired.contains)}")
    commit(table, newBatchId, Map(
      "replaces" -> touched.sorted.mkString(","),
      "n_turns" -> rowsAfter.toString,
      "schema" -> out.schema.json) ++
      statsExtras(spark, table, newBatchId,
        (statsCols ++ inheritedStatsCols(table, touched)).distinct))
    rowsAfter
  }

  /** Reclaim the data/lineage files of compaction-retired batches. After
    * this, time travel to pre-compaction snapshots is gone (their manifests
    * remain for resume idempotence) — same contract as Iceberg's
    * expire_snapshots + remove_orphan_files. */
  def vacuum(table: String): Unit =
    replacedBatches(table).foreach { b =>
      graft.util.Fs.rmrf(Paths.get(dataDir(table, b)))
      graft.util.Fs.rmrf(Paths.get(lineageDir(table, b)))
    }

  def lineageDir(table: String, batchId: String): String =
    s"$table/_lineage/batch=$batchId"

  /** Lineage rows of all live batches (written by writeBatchWithLineage;
    * compaction carries replaced batches' lineage into the new batch). */
  def readLineage(spark: SparkSession, table: String): DataFrame = {
    val batches = liveBatches(table)
      .filter(b => Files.exists(Paths.get(lineageDir(table, b))))
    require(batches.nonEmpty, s"no lineage in $table")
    spark.read.parquet(batches.map(b => lineageDir(table, b)): _*)
  }

  /** Write data + lineage rows, then commit both under one manifest. */
  def writeBatchWithLineage(df: DataFrame, lineage: DataFrame, table: String,
      batchId: String, manifestExtra: Map[String, String] = Map.empty): Unit = {
    if (isCommitted(table, batchId)) return
    writeData(df, table, batchId)
    commitWithLineage(lineage, table, batchId, manifestExtra)
  }

  /** Write lineage rows for a staged batch, then commit it. */
  def commitWithLineage(lineage: DataFrame, table: String, batchId: String,
      manifestExtra: Map[String, String] = Map.empty): Unit = {
    if (isCommitted(table, batchId)) return
    lineage.write.mode(SaveMode.Overwrite).parquet(lineageDir(table, batchId))
    commit(table, batchId, manifestExtra)
  }

  /** Row count from manifests alone — no data scan (monitoring at scale).
    * Counts LIVE batches only: a compaction manifest carries the sum of its
    * replaced batches, so the total is stable across maintenance. */
  def committedRowCount(table: String): Long =
    liveBatches(table).map { b =>
      val m = java.util.regex.Pattern.compile("\"n_turns\": \"(\\d+)\"")
        .matcher(manifestJson(table, b))
      if (m.find()) m.group(1).toLong else 0L
    }.sum
}
