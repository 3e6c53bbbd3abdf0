package graft

import graft.jobs.{ExtractJob, Synth}
import graft.pipeline.Extract
import graft.table.TranscriptTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.{Files, Paths}

/** Tier-2/Tier-4 (SURVEY.md §5.2): distributed pipeline equality vs the
  * direct per-turn function, stable turn ordering, checkpoint/resume
  * idempotence, lineage completeness. */
class SparkPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rmrf(p: String): Unit = graft.util.Fs.rmrf(p)

  test("synth generator is deterministic and long-tailed") {
    val a = Synth.turns(spark, 0.001, 4).collect().sortBy(r => (r.getString(0), r.getInt(1)))
    val b = Synth.turns(spark, 0.001, 8).collect().sortBy(r => (r.getString(0), r.getInt(1)))
    assert(a.length == b.length && a.length > 300)
    assert(a.zip(b).forall { case (x, y) => x == y }) // partition-count independent
    val sizes = a.groupBy(_.getString(0)).map(_._2.length)
    assert(sizes.max > 50, "needs a long tail for skew exercise") // skewed conv exists
  }

  test("distributed extraction equals direct per-turn function") {
    val turns = Synth.turns(spark, 0.001, 4)
    val dist = ExtractJob.extractTurns(spark, turns, 8)
      .collect()
      .map(e => (e.conv_id, e.turn_idx) -> e.ex)
      .toMap
    val local = turns.collect().map { r =>
      val key = (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"))
      key -> Extract.extract(r.getAs[String]("text"))
    }.toMap
    assert(dist.keySet == local.keySet)
    var checked = 0
    local.foreach { case (k, ex) =>
      val d = dist(k)
      assert(d.content == ex.content, s"content mismatch at $k")
      assert(d.headline == ex.headline, s"headline at $k")
      assert(d.author == ex.author, s"author at $k")
      assert(d.title == ex.title, s"title at $k")
      assert(d.date == ex.date, s"date at $k")
      checked += 1
    }
    assert(checked > 300)
  }

  test("job writes ordered, resumable, lineage-bearing table") {
    val out = "/tmp/graft_test_table"
    rmrf(out)
    val turns = Synth.turns(spark, 0.001, 4)
    ExtractJob.run(spark, turns, out, nBatches = 4, saltPartitions = 8)
    assert(TranscriptTable.committedBatches(out).length == 4)

    val read1 = TranscriptTable.read(spark, out)
    val n1 = read1.count()
    assert(n1 == turns.count())

    // stable ordering within files: conv_id/turn_idx sorted within partitions
    val files = read1.select(input_file_name().as("f"), col("conv_id"), col("turn_idx"))
    // turn_idx dense per conversation after read-back
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    val violations = read1
      .withColumn("rn", row_number().over(w) - 1)
      .filter(col("rn") =!= col("turn_idx")).count()
    assert(violations == 0)

    // digest snapshot
    val digest1 = read1
      .agg(expr("bit_xor(xxhash64(conv_id, turn_idx, coalesce(ex.content,'')))")).head.getLong(0)

    // simulate crash: remove two manifests (their data may remain) -> resume
    Files.delete(TranscriptTable.manifestDir(out).resolve("manifest-b001.json"))
    Files.delete(TranscriptTable.manifestDir(out).resolve("manifest-b003.json"))
    assert(TranscriptTable.committedBatches(out).length == 2)
    ExtractJob.run(spark, turns, out, nBatches = 4, saltPartitions = 8)
    assert(TranscriptTable.committedBatches(out).length == 4)
    val read2 = TranscriptTable.read(spark, out)
    assert(read2.count() == n1)
    val digest2 = read2
      .agg(expr("bit_xor(xxhash64(conv_id, turn_idx, coalesce(ex.content,'')))")).head.getLong(0)
    assert(digest1 == digest2, "resume must reproduce identical content")

    // re-run over a fully committed table is a no-op
    ExtractJob.run(spark, turns, out, nBatches = 4, saltPartitions = 8)
    assert(TranscriptTable.read(spark, out).count() == n1)

    // lineage recorded in manifests
    val manifest = new String(Files.readAllBytes(
      TranscriptTable.manifestDir(out).resolve("manifest-b000.json")), "UTF-8")
    assert(manifest.contains("\"lineage\"") && manifest.contains("\"n_turns\""))

    // lineage rows table: per (batch, conv_bucket) counts sum to the total
    val lin = TranscriptTable.readLineage(spark, out)
    assert(lin.columns.toSet == Set("conv_bucket", "n_turns", "n_blocks",
      "n_content_nonnull", "n_errors", "content_digest", "batch_id"))
    assert(lin.agg(sum("n_turns")).head.getLong(0) == n1)
    assert(lin.agg(sum("n_errors")).head.getLong(0) == 0)

    // manifest-only row count (no scan) and as-of snapshot read
    assert(TranscriptTable.committedRowCount(out) == n1)
    val asOf = TranscriptTable.readAsOf(spark, out, "b001").count()
    assert(asOf > 0 && asOf < n1)
    rmrf(out)
  }

  test("incremental pipeline: multi-batch ticks, warm store, replay no-op, first-write-wins") {
    val table = "/tmp/graft_inc_pipeline"
    val sigDir = "/tmp/graft_inc_pipeline_sigs"
    Seq(table, sigDir).foreach(rmrf)
    val sp = spark
    import sp.implicits._
    def enText(seed: Long): String = (0 until 60).map(i =>
      "the word" + graft.jobs.Synth.mix(seed * 97 + i).toHexString.take(3) +
        " of this and that for is").mkString(" ")
    def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

    // tick 1: four distinct English docs
    graft.jobs.IncrementalPipeline.runBatch(spark,
      docs((1000L, enText(1)), (1001L, enText(2)), (1002L, enText(3)), (1003L, enText(4))),
      table, sigDir, "b001")
    assert(TranscriptTable.read(spark, table).count() == 4)
    // tick 2: exact dup of 1000, near-dup of 1001, fresh, junk
    graft.jobs.IncrementalPipeline.runBatch(spark,
      docs((2000L, enText(1)), (2001L, enText(2) + " with tail words"),
        (2002L, enText(5)), (2003L, "zz")),
      table, sigDir, "b002")
    val after2 = TranscriptTable.read(spark, table)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after2 == Set(1000L, 1001L, 1002L, 1003L, 2002L), after2.toString)
    // the store was re-pinned by tick 2 -> tick 3 takes the WARM path
    assert(graft.ops.Dedup.signatureStoreFresh(spark, sigDir,
      graft.ops.AnnIndex.inputToken(
        TranscriptTable.read(spark, table).select("doc_id", "text"))),
      "store must be fresh for the next tick (warm path)")
    // replaying a committed tick is a no-op
    graft.jobs.IncrementalPipeline.runBatch(spark,
      docs((9999L, enText(99))), table, sigDir, "b002")
    assert(TranscriptTable.read(spark, table).count() == 5)
    // tick 3: near-dup of a TICK-2 survivor + fresh (first-write-wins
    // must apply against the evolving corpus, not just the seed batch)
    graft.jobs.IncrementalPipeline.runBatch(spark,
      docs((3000L, enText(5) + " trailing bits"), (3001L, enText(6))),
      table, sigDir, "b003")
    val fin = TranscriptTable.read(spark, table)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fin == Set(1000L, 1001L, 1002L, 1003L, 2002L, 3001L), fin.toString)
    // manifest-only accounting stayed exact across ticks
    assert(TranscriptTable.committedRowCount(table) == 6)
    Seq(table, sigDir).foreach(rmrf)
  }

  test("incremental pipeline with the Bloom gate: same answers, warm filter across ticks") {
    val table = "/tmp/graft_inc_pipeline_bl"
    val sigDir = "/tmp/graft_inc_pipeline_bl_sigs"
    val bloomDir = "/tmp/graft_inc_pipeline_bl_bloom"
    Seq(table, sigDir, bloomDir).foreach(rmrf)
    val sp = spark
    import sp.implicits._
    def enText(seed: Long): String = (0 until 60).map(i =>
      "the word" + graft.jobs.Synth.mix(seed * 97 + i).toHexString.take(3) +
        " of this and that for is").mkString(" ")
    def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

    graft.jobs.IncrementalPipeline.runBatch(spark,
      docs((1000L, enText(1)), (1001L, enText(2)), (1002L, enText(3))),
      table, sigDir, "b001", bloomDir = bloomDir)
    // tick 1 built the filter over the committed table → tick 2 is warm
    val tok1 = graft.ops.AnnIndex.inputToken(
      TranscriptTable.read(spark, table).select("doc_id", "text"))
    assert(graft.ops.BloomDedup.bloomFresh(spark, bloomDir, tok1),
      "filter must be fresh for the next tick")

    // tick 2: exact dup (gated through the bloom path), near-dup, fresh
    graft.jobs.IncrementalPipeline.runBatch(spark,
      docs((2000L, enText(1)), (2001L, enText(2) + " with tail words"),
        (2002L, enText(5))),
      table, sigDir, "b002", bloomDir = bloomDir)
    val after2 = TranscriptTable.read(spark, table)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after2 == Set(1000L, 1001L, 1002L, 2002L), after2.toString)

    // the filter was APPENDED (not rebuilt) and re-pinned to the new table
    val tok2 = graft.ops.AnnIndex.inputToken(
      TranscriptTable.read(spark, table).select("doc_id", "text"))
    assert(graft.ops.BloomDedup.bloomFresh(spark, bloomDir, tok2))
    val (nKeys, _) = graft.ops.BloomDedup.bloomLoad(spark, bloomDir)
    assert(nKeys == 4L, s"3 seed keys + 1 tick-2 survivor, got $nKeys")

    // tick 3 against the evolving corpus: dup of a tick-2 survivor drops
    graft.jobs.IncrementalPipeline.runBatch(spark,
      docs((3000L, enText(5)), (3001L, enText(6))),
      table, sigDir, "b003", bloomDir = bloomDir)
    val fin = TranscriptTable.read(spark, table)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fin == Set(1000L, 1001L, 1002L, 2002L, 3001L), fin.toString)
    Seq(table, sigDir, bloomDir).foreach(rmrf)
  }

  test("incremental pipeline sketch store: appended per tick, merge == direct rebuild") {
    val table = "/tmp/graft_inc_pipeline_sk"
    val sigDir = "/tmp/graft_inc_pipeline_sk_sigs"
    val sketchDir = "/tmp/graft_inc_pipeline_sk_sketch"
    val postDir = "/tmp/graft_inc_pipeline_sk_postings"
    Seq(table, sigDir, sketchDir, postDir).foreach(rmrf)
    val sp = spark
    import sp.implicits._
    def enText(seed: Long): String = (0 until 60).map(i =>
      "the word" + graft.jobs.Synth.mix(seed * 97 + i).toHexString.take(3) +
        " of this and that for is").mkString(" ")
    def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

    graft.jobs.IncrementalPipeline.runBatch(spark,
      docs((1L, enText(1)), (2L, enText(2))),
      table, sigDir, "b001", sketchDir = sketchDir, postingsDir = postDir)
    val hllFiles1 = new java.io.File(s"$sketchDir/hll")
      .listFiles.count(_.getName.endsWith(".parquet"))
    val postFiles1 = new java.io.File(s"$postDir/postings")
      .listFiles.count(_.getName.endsWith(".parquet"))
    graft.jobs.IncrementalPipeline.runBatch(spark,
      docs((3L, enText(3)), (4L, enText(4))),
      table, sigDir, "b002", sketchDir = sketchDir, postingsDir = postDir)
    // tick 2 APPENDED (files grew), and the store is pinned to the table
    val hllFiles2 = new java.io.File(s"$sketchDir/hll")
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(hllFiles2 > hllFiles1, "tick 2 must append, not rebuild")
    val tok = graft.ops.AnnIndex.inputToken(
      TranscriptTable.read(spark, table).select("doc_id", "text"))
    assert(graft.ops.Sketches.sketchStoreFresh(spark, sketchDir, tok))
    // read-side merge == direct sketches over the final table
    val corpus = TranscriptTable.read(spark, table).select("doc_id", "text")
      .withColumn("term",
        explode(expr("filter(split(lower(text), '\\\\W+'), x -> x != '')")))
      .select("term").localCheckpoint()
    val (hll, cms) = graft.ops.Sketches.readSketchStore(spark, sketchDir)
    val hllDirect = graft.ops.Sketches.hllSketch(corpus, "term")
    val cmsDirect = graft.ops.Sketches.cmsSketch(corpus, "term")
    assert(hll.except(hllDirect).isEmpty && hllDirect.except(hll).isEmpty)
    assert(cms.except(cmsDirect).isEmpty && cmsDirect.except(cms).isEmpty)
    // the DD doc-length leg rides the same append/merge contract
    val dd = graft.ops.Sketches.readDdStore(spark, sketchDir)
    val ddDirect = graft.ops.Sketches.ddSketch(
      TranscriptTable.read(spark, table).select(
        size(expr("filter(split(lower(text), '\\\\W+'), x -> x != '')"))
          .cast("long").as("dl")), "dl")
    assert(dd.except(ddDirect).isEmpty && ddDirect.except(dd).isEmpty)
    // the BM25 postings store rode the same ladder: tick 2 APPENDED and
    // store-backed retrieval equals an in-memory index over the table
    val postFiles2 = new java.io.File(s"$postDir/postings")
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(postFiles2 > postFiles1, "postings tick 2 must append")
    assert(graft.ops.Bm25.postingsStoreFresh(spark, postDir, tok))
    val q = Seq((1L, enText(1).split(" ").take(4).mkString(" ")))
      .toDF("query_id", "query_text")
    val fromStore = graft.ops.Bm25.topKStore(spark, postDir, q, k = 3)
    val direct = graft.ops.Bm25.topK(
      TranscriptTable.read(spark, table).select("doc_id", "text"), q, k = 3)
    assert(fromStore.exceptAll(direct).isEmpty &&
      direct.exceptAll(fromStore).isEmpty)
    Seq(table, sigDir, sketchDir, postDir).foreach(rmrf)
  }

  test("schema evolution: added columns resolve from manifests, old rows read null") {
    // Iceberg-model evolution: each manifest records its batch schema;
    // readers plan the scan with the UNION resolved from manifests ALONE
    // (no data-file footer scan — the mergeSchema option reads every
    // footer, a job of its own at 100 TB). Adding columns is supported;
    // type changes are rejected with a clear error.
    val out = "/tmp/graft_schema_evo"
    rmrf(out)
    val sp = spark
    import sp.implicits._
    TranscriptTable.writeBatch(Seq((1L, "x"), (2L, "y")).toDF("id", "text"), out, "b000")
    TranscriptTable.writeBatch(Seq((3L, "z", "en")).toDF("id", "text", "lang"), out, "b001")
    val full = TranscriptTable.read(spark, out)
    assert(full.columns.toSeq == Seq("id", "text", "lang"))
    val rows = full.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSeq
    assert(rows == Seq((1L, "x", None), (2L, "y", None), (3L, "z", Some("en"))))
    // time travel to BEFORE the column existed: the 2-column schema
    assert(TranscriptTable.readAsOf(spark, out, "b000").columns.toSeq == Seq("id", "text"))
    // compaction reads and carries the union — no silent column drop
    TranscriptTable.compact(spark, out, Seq("b000", "b001"), "b002")
    val comp = TranscriptTable.read(spark, out)
    assert(comp.columns.toSeq == Seq("id", "text", "lang"))
    assert(comp.count() == 3 && comp.filter(col("lang").isNotNull).count() == 1)
    // a type CHANGE is rejected AT COMMIT TIME (the Iceberg model): the
    // offending write fails; the table stays readable for everyone else
    val e = intercept[IllegalArgumentException] {
      TranscriptTable.writeBatch(Seq((4L, "w", 7)).toDF("id", "text", "lang"), out, "b003")
    }
    assert(e.getMessage.contains("ADDING columns only"), e.getMessage)
    assert(!TranscriptTable.isCommitted(out, "b003"), "bad batch must not commit")
    assert(TranscriptTable.read(spark, out).count() == 3, "table stays readable")
    rmrf(out)
  }

  test("schema evolution: nested nullability flags never fail the union") {
    // Two logically identical batches can differ ONLY in nested nullability:
    // writeBatch records the pre-write df.schema (containsNull as
    // constructed, often false), while commitStaged records a post-parquet-
    // read schema (Spark normalizes nested fields to nullable). The union
    // must be nullability-insensitive or a valid table becomes unreadable
    // (ADVICE r5 medium finding).
    val out = "/tmp/graft_schema_nulls"
    rmrf(out)
    val sp = spark
    import sp.implicits._
    val strict = Seq((1L, Seq(1, 2))).toDF("id", "xs") // containsNull=false
    assert(!strict.schema("xs").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    TranscriptTable.writeBatch(strict, out, "b000")
    // second batch: the SAME data committed via the staged path, whose
    // recorded schema is the post-parquet-read (relaxed) form
    TranscriptTable.writeData(Seq((2L, Seq(3))).toDF("id", "xs"), out, "b001")
    val reread = spark.read.parquet(TranscriptTable.dataDir(out, "b001"))
    assert(reread.schema("xs").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    TranscriptTable.commit(out, "b001", Map("schema" -> reread.schema.json))
    // both read paths and compaction plan with the relaxed union
    assert(TranscriptTable.read(spark, out).count() == 2)
    TranscriptTable.compact(spark, out, Seq("b000", "b001"), "b002")
    assert(TranscriptTable.read(spark, out).count() == 2)
    rmrf(out)
  }

  test("compaction: atomic supersede, resume stays idempotent, vacuum reclaims") {
    val out = "/tmp/graft_test_compact"
    rmrf(out)
    val turns = Synth.turns(spark, 0.001, 4)
    ExtractJob.run(spark, turns, out, nBatches = 4, saltPartitions = 8)
    val n1 = TranscriptTable.read(spark, out).count()
    def digest() = TranscriptTable.read(spark, out)
      .agg(expr("bit_xor(xxhash64(conv_id, turn_idx, coalesce(ex.content,'')))"))
      .head.getLong(0)
    val d1 = digest()
    def dataFiles() = TranscriptTable.liveBatches(out).map { b =>
      new java.io.File(TranscriptTable.dataDir(out, b))
        .listFiles().count(_.getName.endsWith(".parquet"))
    }.sum
    val files1 = dataFiles()

    // compact the first three batches into one file
    TranscriptTable.compact(spark, out, Seq("b000", "b001", "b002"), "c000")
    assert(TranscriptTable.liveBatches(out) == Seq("b003", "c000"))
    assert(TranscriptTable.committedBatches(out).length == 5) // manifests stay
    assert(TranscriptTable.read(spark, out).count() == n1)
    assert(digest() == d1, "compaction must not change content")
    assert(dataFiles() < files1, s"expected fewer files than $files1")
    // manifest-only row count is stable (compaction manifest carries the sum)
    assert(TranscriptTable.committedRowCount(out) == n1)
    // lineage still sums to the total through the carried batch
    assert(TranscriptTable.readLineage(spark, out)
      .agg(sum("n_turns")).head.getLong(0) == n1)

    // resume stays idempotent: replaced ids still read as committed, so a
    // re-run of the producer does not resurrect their data
    assert(TranscriptTable.isCommitted(out, "b001"))
    ExtractJob.run(spark, turns, out, nBatches = 4, saltPartitions = 8)
    assert(TranscriptTable.read(spark, out).count() == n1)

    // pre-compaction time travel still works until vacuum
    assert(TranscriptTable.readAsOf(spark, out, "b001").count() > 0)
    assert(TranscriptTable.liveBatches(out, "b001") == Seq("b000", "b001"))

    // double compaction of the same ids is rejected
    intercept[IllegalArgumentException] {
      TranscriptTable.compact(spark, out, Seq("b000"), "c001")
    }

    TranscriptTable.vacuum(out)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(TranscriptTable.dataDir(out, "b000"))))
    assert(TranscriptTable.read(spark, out).count() == n1)
    assert(digest() == d1, "post-vacuum snapshot unchanged")

    // a compaction id must sort AFTER the batches it replaces, or asOf
    // snapshots between them would double-read
    intercept[IllegalArgumentException] {
      TranscriptTable.compact(spark, out, Seq("b003"), "a000")
    }
    rmrf(out)
  }

  test("manifest commit is CAS: two racing writers -> one winner, clean loser") {
    val out = "/tmp/graft_test_race"
    rmrf(out)
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    TranscriptTable.writeData(df, out, "b000") // staged, uncommitted
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until 2).map { i =>
      new Thread(() => {
        barrier.await()
        try {
          TranscriptTable.commit(out, "b000", Map("writer" -> i.toString))
          results.add(s"ok-$i")
        } catch {
          case _: IllegalStateException => results.add(s"lost-$i")
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val rs = results.toArray.map(_.toString).toSeq
    assert(rs.count(_.startsWith("ok")) == 1, rs.toString)
    assert(rs.count(_.startsWith("lost")) == 1, rs.toString)
    // exactly one manifest, fully parseable, no tmp litter
    assert(TranscriptTable.committedBatches(out) == Seq("b000"))
    val mdir = TranscriptTable.manifestDir(out).toFile
    assert(mdir.listFiles().count(_.getName.endsWith(".tmp")) == 0)
    val manifest = new String(Files.readAllBytes(
      TranscriptTable.manifestDir(out).resolve("manifest-b000.json")), "UTF-8")
    assert(manifest.contains("\"batch_id\": \"b000\"") && manifest.endsWith("}\n"))
    assert(TranscriptTable.read(spark, out).count() == 2)
    rmrf(out)
  }

  test("pivot: conditional-aggregate form equals Dataset.pivot with one fewer shuffle") {
    // q20's known-vocabulary pivot is written as conditional aggregates;
    // this pins (a) result equality with the built-in pivot operator and
    // (b) the plan advantage that justifies the choice: pivot() compiles
    // to TWO hash-partitioning exchanges (pre-aggregate on (user, type),
    // re-shuffle on user for PivotFirst), the conditional form to ONE
    val dir = "/root/testdata/sf0.001"
    val types = Seq("click", "error", "purchase", "signup", "view")
    val q20 = SparkEntry.queries("q20_pivot")(spark, dir)
    val piv = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("user_id") +: types.map(c => coalesce(col(c), lit(0L)).as(c)): _*)
      .orderBy("user_id")
    assert(q20.collect().toSeq == piv.collect().toSeq)
    def shuffles(df: org.apache.spark.sql.DataFrame): Int =
      "hashpartitioning".r.findAllIn(df.queryExecution.executedPlan.toString).length
    val (sCond, sPivot) = (shuffles(q20), shuffles(piv))
    assert(sCond < sPivot, s"conditional=$sCond pivot=$sPivot")
  }

  test("catalyst plan quality: pruning, pushdown, broadcast join") {
    val dir = "/root/testdata/sf0.001"
    // column pruning reaches the parquet scan
    val q7 = SparkEntry.queries("q7_doc_stats")(spark, dir)
    val q7plan = q7.queryExecution.executedPlan.toString
    assert(q7plan.contains("ReadSchema"), q7plan.take(800))
    assert(!q7plan.substring(q7plan.indexOf("ReadSchema")).contains("n_chars"),
      "n_chars must be pruned from the scan:\n" + q7plan.take(800))
    // predicate pushdown
    val filtered = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") === 42L).select("l_quantity")
    val fplan = filtered.queryExecution.executedPlan.toString
    assert(fplan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]"),
      "filter must push to parquet:\n" + fplan.take(800))
    // broadcast join strategy picked for small dim
    val q3plan = SparkEntry.queries("q3_cust_orders")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q3plan.contains("BroadcastHashJoin"), q3plan.take(800))
    // extraction job shuffles exactly where designed: one exchange for the
    // salt repartition in the map stage
    val turns = Synth.turns(spark, 0.001, 4)
    val explan = ExtractJob.extractTurns(spark, turns, 8)
      .queryExecution.executedPlan.toString
    assert(explan.contains("Exchange hashpartitioning(xxhash64"),
      "salt shuffle must hash on xxhash64(conv_id, turn_idx)")
  }

  test("custom catalyst expression: ws_token_count codegen matches udf") {
    import graft.ops.WsTokenCount
    WsTokenCount.register(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaExpr = docs.selectExpr("doc_id", "ws_token_count(text) as n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaScala = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split("[ \t\n\r\f]+").count(_.nonEmpty)).toMap
    assert(viaExpr == viaScala)
    // codegen actually happens (not fallback): plan contains the project
    val plan = docs.selectExpr("ws_token_count(text)").queryExecution.executedPlan.toString
    assert(plan.contains("ws_token_count") || plan.contains("WsTokenCount"))
  }

  test("salting balances the skewed long-tail conversation across tasks") {
    // north rule: one 500-turn conversation must not pin a single task.
    // After the salt shuffle, per-partition row counts should be near-uniform.
    val turns = Synth.turns(spark, 0.001, 4)
    val parts = 16
    val sizes = turns
      .repartition(parts, xxhash64(col("conv_id"), col("turn_idx")))
      .groupBy(spark_partition_id().as("pid")).count()
      .collect().map(_.getLong(1))
    assert(sizes.length == parts)
    val mean = sizes.sum.toDouble / sizes.length
    assert(sizes.max < mean * 1.5 && sizes.min > mean * 0.5,
      s"salted partitions skewed: ${sizes.mkString(",")}")
    // contrast: partitioning by conv_id alone leaves a fat partition
    val unsalted = turns.repartition(parts, col("conv_id"))
      .groupBy(spark_partition_id()).count().collect().map(_.getLong(1))
    assert(unsalted.max > sizes.max, "salt should strictly improve balance")
  }

  test("spark session extensions register native functions") {
    // GraftExtensions is wired via spark.sql.extensions on real clusters;
    // here we invoke it against the session's extension injection directly
    val sql = "SELECT ws_token_count('a b  c') AS n"
    graft.ops.WsTokenCount.register(spark)
    assert(spark.sql(sql).head.getInt(0) == 3)
    // the 64-bit hash expressions: SQL registration + exact equality with
    // the function-API kernels (one kernel, two entries — by construction,
    // but pinned here against accidental divergence)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => graft.ops.SimHash64(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fingerprint64", exprs => graft.ops.Fingerprint64(exprs.head), "scala_udf")
    val t = "the quick brown fox, The QUICK brown fox"
    assert(spark.sql(s"SELECT simhash64('$t') AS h").head.getLong(0) ==
      graft.ops.Dedup.simhash(t))
    assert(spark.sql(s"SELECT fingerprint64('$t') AS h").head.getLong(0) ==
      graft.ops.TextAnalysis.fingerprint(t))
    // codegen path evaluates over a real column scan too
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    val viaExpr = docs.select(col("doc_id"),
      graft.ops.HashExprs.simhash64(col("text")).as("h")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaFn = docs.collect()
      .map(r => (r.getAs[Long]("doc_id"), graft.ops.Dedup.simhash(r.getAs[String]("text")))).toMap
    assert(viaExpr == viaFn)
    // cosine_sim from SQL (the fourth injected native function)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => graft.ops.CosineSim(exprs.head, exprs(1)), "scala_udf")
    val c = spark.sql(
      "SELECT cosine_sim(array(cast(3.0 as float), cast(4.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS c").head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12, c.toString)
    // non-string arguments are rejected at ANALYSIS time (clear error),
    // matching built-in expression behavior — not a codegen ClassCastException
    for (bad <- Seq("SELECT simhash64(123)", "SELECT fingerprint64(array(1,2))",
        "SELECT ws_token_count(123)")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] { spark.sql(bad).collect() }
      assert(e.getMessage.contains("requires a string argument"), s"$bad -> ${e.getMessage}")
    }
  }

  test("typed lineage aggregator merges across partitions") {
    import graft.ops.LineageAgg
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val rowEnc: Encoder[LineageAgg.LineageRow] = Encoders.product
    val rows = (0 until 1000).map(i =>
      LineageAgg.LineageRow(s"c${i % 7}", i, if (i % 3 == 0) null else s"content$i"))
    val ds1 = spark.createDataset(rows)(rowEnc).repartition(1)
    val ds8 = spark.createDataset(rows)(rowEnc).repartition(8)
    val a1 = ds1.select(LineageAgg.aggregator.toColumn).head
    val a8 = ds8.select(LineageAgg.aggregator.toColumn).head
    assert(a1 == a8, "digest must be partitioning-independent")
    assert(a1.nTurns == 1000 && a1.nContent == rows.count(_.content != null))
  }

  test("set ops: anti-join fixture diff finds no drift") {
    // the Tier-2 fixture-diff primitive (SURVEY.md §2.9 set ops): extracted
    // output vs golden join on (conv_id, turn_idx) -> left_anti must be empty
    val turns = Synth.turns(spark, 0.001, 4).limit(200).cache()
    val out = ExtractJob.extractTurns(spark, turns, 4)
      .select(col("conv_id"), col("turn_idx"),
        coalesce(col("ex.content"), lit("")).as("content")) // equi-join null semantics
    val golden = out.collect() // golden := current output (self-diff)
    val goldenDf = spark.createDataFrame(
      java.util.Arrays.asList(golden: _*), out.schema)
    val drift = out.join(broadcast(goldenDf), Seq("conv_id", "turn_idx", "content"), "left_anti")
    assert(drift.count() == 0)
    turns.unpersist()
  }

  test("frozen per-turn digests over the full sf0.001 table") {
    // Tier-2 per-turn text-equality oracle (FIXTURES.md §3.2): one digest per
    // turn over every extracted text field, frozen at round 1. Any semantic
    // drift in parser/features/model/meta rules fails here turn-by-turn.
    val turns = Synth.turns(spark, 0.001, 4).collect()
      .sortBy(r => (r.getString(0), r.getInt(1)))
    val lines = turns.map { r =>
      val ex = Extract.extract(r.getAs[String]("text"))
      val payload = Seq(ex.content, ex.headline, ex.author, ex.rawAuthor,
        ex.title, ex.url, ex.hostname, ex.sitename, ex.description,
        String.valueOf(ex.date), ex.video,
        Option(ex.breadcrumbs).map(_.mkString(";")).orNull,
        Option(ex.categories).map(_.mkString(";")).orNull,
        ex.nBlocks.toString).map(String.valueOf).mkString("")
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(payload.getBytes("UTF-8")).take(8)
        .map(b => f"$b%02x").mkString
      s"${r.getString(0)}\t${r.getInt(1)}\t$d"
    }
    val goldenPath = Paths.get("src/test/resources/turn_digests_sf0001.tsv")
    if (!Files.exists(goldenPath)) {
      Files.write(goldenPath, lines.mkString("\n").getBytes("UTF-8"))
      info(s"frozen ${lines.length} per-turn digests")
    } else {
      val frozen = new String(Files.readAllBytes(goldenPath), "UTF-8").split("\n")
      assert(lines.length == frozen.length)
      var bad = 0
      lines.zip(frozen).foreach { case (a, b) => if (a != b) { bad += 1
        if (bad <= 3) info(s"drift: $a vs $b") } }
      assert(bad == 0, s"$bad/${lines.length} turns drifted from frozen goldens")
    }
  }

  test("frozen extraction goldens (drift guard)") {
    // Golden digests frozen from the validated implementation (round 1).
    // If a refactor changes ANY extracted content/title for these pinned
    // turns, this fails — the per-turn text-equality contract.
    val picks = Seq(("conv-00000000", 0), ("conv-00000000", 1), ("conv-00000002", 0),
      ("conv-00000003", 1), ("conv-00000019", 3))
    val got = picks.map { case (c, t) =>
      val turn = Synth.makeTurn(c.stripPrefix("conv-").toLong, t)
      val ex = Extract.extract(turn.text)
      val s = Seq(ex.content, ex.headline, ex.title, ex.author, ex.url,
        String.valueOf(ex.date), ex.video).map(String.valueOf).mkString("|")
      java.lang.Long.toHexString(graft.jobs.Synth.mix(s.hashCode.toLong))
    }
    val goldenPath = Paths.get("src/test/resources/extraction_goldens.txt")
    if (!Files.exists(goldenPath)) {
      Files.write(goldenPath, got.mkString("\n").getBytes("UTF-8"))
      info("goldens frozen: " + got.mkString(","))
    } else {
      val frozen = new String(Files.readAllBytes(goldenPath), "UTF-8").split("\n").toSeq
      assert(got == frozen, "extraction output drifted from frozen goldens")
    }
  }
}
