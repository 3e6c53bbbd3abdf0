package graft.jobs

import graft.ops.{AnnIndex, AsOfJoin, Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the dedup/ANN family: the driver's documents/embeddings
  * tables are ~500 rows, which exercises correctness but not shape. This
  * main synthesizes 100x bigger inputs DISTRIBUTED (no driver
  * materialization) and times the operators at both sizes, so the
  * "would this survive 100x?" question has measured evidence:
  *
  *   runMain graft.jobs.ScaleProbe [nDocs] [nVecs] [cpus]
  *
  * Prints one JSON line with per-op seconds and result counts. Planted
  * structure: every 20th doc is a near-dup of its predecessor (3 of 120
  * tokens replaced, 3-gram J ~ 0.86), so minhash/cluster outputs have a
  * known expected scale (~n/20 pairs). Embeddings are unit-norm uniform
  * vectors, dim 64. */
object ScaleProbe {

  def synthDocs(spark: SparkSession, n: Int, partitions: Int,
      nTokens: Int = 120): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val base: Long = if (id % 20 == 1) id - 1 else id
      val toks = Array.tabulate(nTokens) { i =>
        "w" + ((Synth.mix(base * 131 + i) & 0xfffL).toHexString)
      }
      if (id % 20 == 1) { // near-dup: replace 3 consecutive tokens
        toks(50) = "x" + id; toks(51) = "y" + id; toks(52) = "z" + id
      }
      (id, toks.mkString(" "))
    }.toDF("doc_id", "text")
  }

  /** Docs of 12 lines — 9 globally-unique (id in the text, so uniqueness
    * is structural, not hash-probabilistic) + 3 banner lines shared
    * corpus-wide — for the line-dedup probe: expected kept = 9 per doc
    * at any size, dup set = exactly 3 rows. */
  def synthLineDocs(spark: SparkSession, n: Int, partitions: Int): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val sb = new StringBuilder(600)
      var j = 0
      while (j < 12) {
        if (j % 4 == 3) sb.append("shared banner line number ").append(j / 4)
        else sb.append("u").append(java.lang.Long.toHexString(Synth.mix(id * 37 + j)))
          .append(" unique line of doc ").append(id)
        sb.append('\n')
        j += 1
      }
      (id, sb.toString)
    }.toDF("doc_id", "text")
  }

  /** `plantEvery > 0`: every plantEvery-th vector is a near-dup of its
    * predecessor (first component nudged 0.02 — cos stays > 0.999), giving
    * the scaled near-dup probe a known recall target at any size. */
  def synthVecs(spark: SparkSession, n: Int, dim: Int, partitions: Int,
      plantEvery: Int = 0): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val planted = plantEvery > 0 && id % plantEvery == 1
      val base: Long = if (planted) id - 1 else id
      val v = Array.tabulate(dim)(i =>
        ((Synth.mix(base * 257 + i) >>> 11).toDouble / (1L << 53) - 0.5).toFloat)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      val u = v.map(_ / norm)
      if (planted) u(0) = u(0) + 0.02f
      (id, u)
    }.toDF("vec_id", "embedding")
  }

  /** English-looking synth docs that SURVIVE the curation filters (langId
    * 'en', quality above the 0.3 floor — the stopword lattice carries
    * both), for the pipeline-tick probe. With `corpusN > 0` (batch mode):
    * ~5% of docs clone a corpus doc's text exactly and another ~5%
    * near-dup it (leading tokens changed, 3-gram Jaccard ~0.95), so the
    * cross-corpus exact and banded joins both do real candidate work. */
  def synthEnDocs(spark: SparkSession, n: Int, partitions: Int,
      idOffset: Long = 0L, corpusN: Int = 0): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val id = i + idOffset
      val mode =
        if (corpusN > 0 && i % 20 == 1) 1      // exact clone of a corpus doc
        else if (corpusN > 0 && i % 20 == 2) 2 // near-dup of a corpus doc
        else 0
      val base = if (mode > 0) i % corpusN else id
      val sb = new StringBuilder(900)
      var j = 0
      while (j < 15) {
        val w1 = "word" + (Synth.mix(base * 131 + j) & 0xffffL).toHexString
        val w2 = "item" + (Synth.mix(base * 131 + 64 + j) & 0xffffL).toHexString
        sb.append("the ").append(w1).append(" of this ").append(w2)
          .append(" and that for is ")
        j += 1
      }
      val text0 = sb.toString.trim
      val text = if (mode == 2) "altered leading tokens here " +
        text0.substring(text0.indexOf(' ') + 1) else text0
      (id, text)
    }.toDF("doc_id", "text")
  }

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Incremental progress line so a crashed run still shows which step it
    * died in (the JSON summary only prints at the end). */
  private def mark(step: String, sec: Double): Unit =
    println(f"[probe] $step done in $sec%.1f s")

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(50000)
    val nVecs = if (args.length > 1) args(1).toInt else 100000
    val cpus = if (args.length > 2) args(2) else "32"
    // optional section filter (docs|vecs|asof) to isolate one family
    val sections: Set[String] = if (args.length > 3) args(3).split(',').toSet
      else Set("docs", "vecs", "asof")
    val spark = graft.Bench.session(cpus)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]

    for (n <- Seq(500, nDocs) if sections("docs")) {
      // localCheckpoint inside the ops materializes the synth once per op;
      // write-to-parquet-first would hide the synth cost identically at
      // both sizes, so keep it in (it is the same per-row work as a scan)
      val docs = synthDocs(spark, n, cpus.toInt).localCheckpoint()
      val (p, tp) = time(Dedup.minhashPairs(docs, threshold = 0.7).count())
      val (c, tc) = time(Dedup.duplicateClusters(docs, threshold = 0.7).count())
      val (s, ts) = time(Dedup.simhashPairs(docs, maxDist = 3).count())
      val (e, te) = time(Dedup.exactGroups(docs).count())
      out(s"docs_${n}_minhash_pairs") = p; out(s"docs_${n}_minhash_sec") = tp
      out(s"docs_${n}_cluster_rows") = c; out(s"docs_${n}_cluster_sec") = tc
      out(s"docs_${n}_simhash_pairs") = s; out(s"docs_${n}_simhash_sec") = ts
      out(s"docs_${n}_exact_groups") = e; out(s"docs_${n}_exact_sec") = te
      val (bpeTok, tb) = time {
        val model = graft.ops.Bpe.train(docs, nMerges = 256)
        graft.ops.Bpe.tokenCounts(docs, model)
          .agg(sum(col("bpe_tokens"))).head.getLong(0)
      }
      mark(s"docs_$n", tp + tc + ts + te + tb)
      out(s"docs_${n}_bpe_total_tokens") = bpeTok; out(s"docs_${n}_bpe_sec") = tb
    }

    // incremental dedup shape: a 10%-sized batch against the corpus, with
    // and without the persisted signature store — the stored form must
    // skip the corpus signature pass (the dominant cost as corpus >> batch)
    if (sections("docs")) {
      val corpus = synthDocs(spark, nDocs, cpus.toInt).localCheckpoint()
      val incoming = synthDocs(spark, nDocs / 10, cpus.toInt)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
        .localCheckpoint()
      val (nd1, tDirect) = time(
        Dedup.nearDedupAgainst(incoming, corpus, threshold = 0.7).count())
      val sigDir = s"${System.getProperty("java.io.tmpdir")}/graft_scaleprobe_sigs"
      // corpus is in-memory here (no files -> no freshness token), so the
      // store build always runs; with a parquet corpus it is once-per-version
      val (_, tBuild) = time(Dedup.buildSignatureStore(corpus, sigDir))
      // the caller barriers the read store ONCE per batch: three consumers
      // (hot count, banded join, estimate join) must not re-scan parquet
      val (nd2, tStored) = time {
        val sigs = Dedup.readSignatureStore(spark, sigDir).localCheckpoint()
        Dedup.nearDedupAgainst(incoming, corpus,
          threshold = 0.7, corpusSigs = Some(sigs)).count()
      }
      require(nd1 == nd2, s"stored-sig dedup mismatch: $nd1 vs $nd2")
      out("incdedup_direct_sec") = tDirect
      out("incdedup_sigstore_build_sec") = tBuild
      out("incdedup_stored_sec") = tStored
      mark("incremental_dedup", tDirect + tBuild + tStored)
    }

    if (sections("vecs")) {
    val vecs = synthVecs(spark, nVecs, 64, cpus.toInt)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_scaleprobe_ann"
    graft.table.TranscriptTable // touch nothing; keep imports minimal
    val q = vecs.orderBy("vec_id").select("embedding").head.getSeq[Float](0).toArray
    // persist the synth as parquet so the index build has a real file input
    val src = s"${System.getProperty("java.io.tmpdir")}/graft_scaleprobe_vecs"
    vecs.write.mode("overwrite").parquet(src)
    val vecsP = spark.read.parquet(src)
    val (_, tBuild) = time(AnnIndex.buildLsh(vecsP, dir, nBits = 10, rebuild = true))
    val (probeRows, tProbe) = time(AnnIndex.probeLsh(spark, dir, q, 50).count())
    val (_, tBrute) = time(Similarity.bruteForceTopK(vecsP, q, 50).count())
    val (_, tFresh) = time(AnnIndex.buildLsh(vecsP, dir, nBits = 10)) // no-op
    mark("index_build", tBuild)
    out(s"vecs_${nVecs}_index_build_sec") = tBuild
    out(s"vecs_${nVecs}_probe_rows") = probeRows
    out(s"vecs_${nVecs}_probe_sec") = tProbe
    mark("probe+brute", tProbe + tBrute)
    out(s"vecs_${nVecs}_brute_sec") = tBrute
    out(s"vecs_${nVecs}_fresh_rebuild_sec") = tFresh
    // incremental maintenance vs rebuild (r5): appending a 10% batch must
    // cost O(batch), not O(corpus) — the appendLsh claim, measured
    val newSrc = s"${System.getProperty("java.io.tmpdir")}/graft_scaleprobe_vecs_new"
    synthVecs(spark, nVecs / 10, 64, cpus.toInt)
      .select((col("vec_id") + 100000000L).as("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(newSrc)
    val newP = spark.read.parquet(newSrc)
    val (_, tAppend) = time(AnnIndex.appendLsh(newP, dir, batchId = "probe1"))
    mark("index_append_10pct", tAppend)
    out(s"vecs_${nVecs}_append10pct_sec") = tAppend
    out(s"vecs_${nVecs}_rebuild_sec_for_comparison") = tBuild
    // fixed-bit form CAPPED at 200k: per-bucket work is quadratic in
    // n/2^nBits, and at 1M uniform vectors the 12-bit form degenerates
    // (244-row buckets, 122M array-carrying candidates -> 237 s on a good
    // run, GC livelock on a loaded one — measured, which is the point)
    val nFixed = math.min(nVecs, 200000)
    val vecsFixed = if (nFixed == nVecs) vecsP
      else vecsP.filter(col("vec_id") < nFixed)
    val (nd, tNd) = time(
      Similarity.cosinePairs(vecsFixed, threshold = 0.9, nBits = 12).count())
    mark("neardup_fixedbit", tNd)
    out(s"vecs_${nFixed}_neardup_fixedbit_pairs") = nd
    out(s"vecs_${nFixed}_neardup_fixedbit_sec") = tNd
    // the scale form runs at FULL size: count-driven bucket sizing +
    // 6-table OR — work stays linear in n with recall held
    val (nds, tNds) = time(
      Similarity.cosinePairsScaled(vecsP, threshold = 0.9).count())
    mark("neardup_scaled", tNds)
    out(s"vecs_${nVecs}_neardup_scaled_pairs") = nds
    out(s"vecs_${nVecs}_neardup_scaled_sec") = tNds
    }

    // one more decade on the embedding probe (VERDICT r4 item 8a): the
    // scaled SRP form at nVecs (run with 10M), with planted near-dups so
    // the run measures recall as well as shape. Pass `vecsbig` explicitly.
    if (sections("vecsbig")) {
      val src = s"${System.getProperty("java.io.tmpdir")}/graft_scaleprobe_vecsbig"
      synthVecs(spark, nVecs, 64, cpus.toInt * 4, plantEvery = 1000)
        .write.mode("overwrite").parquet(src)
      val vecsP = spark.read.parquet(src)
      val planted = (nVecs - 2) / 1000 + 1 // ids 1, 1001, 2001, ...
      val (nds, tNds) = time(
        Similarity.cosinePairsScaled(vecsP, threshold = 0.9).count())
      mark(s"neardup_scaled_$nVecs", tNds)
      require(nds >= (planted * 0.95).toLong,
        s"recall collapsed at $nVecs: $nds pairs vs $planted planted")
      out(s"vecs_${nVecs}_neardup_scaled_pairs") = nds
      out(s"vecs_${nVecs}_neardup_scaled_planted") = planted
      out(s"vecs_${nVecs}_neardup_scaled_sec") = tNds
    }

    // signature-store probe on a LONG-document corpus (VERDICT r4 item 8b):
    // at sf-scale doc lengths the corpus signature pass is too cheap for
    // the store to matter (BENCH.md documents the null result); with
    // ~3000-token docs the shingle+minhash pass dominates and the
    // persisted store must WIN. The corpus is parquet-backed, so the warm
    // build is also exercised as a zero-job freshness no-op.
    if (sections("sigstore")) {
      val corpusSrc = s"${System.getProperty("java.io.tmpdir")}/graft_scaleprobe_longdocs"
      synthDocs(spark, nDocs, cpus.toInt, nTokens = 3000)
        .write.mode("overwrite").parquet(corpusSrc)
      val corpus = spark.read.parquet(corpusSrc)
      val incoming = synthDocs(spark, nDocs / 10, cpus.toInt, nTokens = 3000)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
        .localCheckpoint()
      val (nd1, tDirect) = time(
        Dedup.nearDedupAgainst(incoming, corpus, threshold = 0.7).count())
      mark("longdocs_direct", tDirect)
      // no cleanup needed: the corpus parquet was just rewritten, so a
      // stale store's freshness token can never match — the build runs cold
      val sigDir = s"${System.getProperty("java.io.tmpdir")}/graft_scaleprobe_longsigs"
      val (_, tBuild) = time(Dedup.buildSignatureStore(corpus, sigDir))
      val (_, tWarm) = time(Dedup.buildSignatureStore(corpus, sigDir)) // token no-op
      val (nd2, tStored) = time {
        val sigs = Dedup.readSignatureStore(spark, sigDir).localCheckpoint()
        Dedup.nearDedupAgainst(incoming, corpus,
          threshold = 0.7, corpusSigs = Some(sigs)).count()
      }
      mark("longdocs_stored", tBuild + tStored)
      require(nd1 == nd2, s"stored-sig long-doc dedup mismatch: $nd1 vs $nd2")
      out("longdocs_direct_sec") = tDirect
      out("longdocs_sigstore_build_sec") = tBuild
      out("longdocs_sigstore_warm_sec") = tWarm
      out("longdocs_stored_sec") = tStored
    }

    // as-of skew probe: ~94% of 1M left rows on ONE key — the plain form
    // serializes that key into a single window task; the bucketed form
    // spreads it over ts-buckets + a tiny carry pass
    if (sections("asof")) {
      import spark.implicits._
      def gen(n: Int, salt: Long) = spark.range(0, n, 1, cpus.toInt).map { id =>
        val h = Synth.mix(id * 31 + salt)
        val k = if ((h & 15L) != 15L) 0L else (h >>> 4) & 63L
        (k, (h >>> 16) & 0xFFFFFL, id)
      }
      val lAsof = gen(1000000, 1).toDF("k", "ts", "l_id").localCheckpoint()
      val rAsof = gen(100000, 2).toDF("k", "ts", "r_id").localCheckpoint()
      val (np, tPlain) = time(AsOfJoin.asOf(lAsof, rAsof, Seq("k"), "ts").count())
      val (nb, tBuck) = time(AsOfJoin.asOfBucketed(lAsof, rAsof, Seq("k"), "ts",
        floor(col("ts") / 4096)).count())
      require(np == nb, s"skew probe mismatch: $np vs $nb")
      out("asof_1m_hotkey_plain_sec") = tPlain
      out("asof_1m_hotkey_bucketed_sec") = tBuck
      // auto-routing: the bounded skew probe must see the ~94%-hot key and
      // route this shape to the bucketed form
      val (share, sampled) = AsOfJoin.keySkew(lAsof, rAsof, Seq("k"))
      require(share >= 0.2, s"skew probe must detect the hot key: $share")
      val (na, tAuto) = time(AsOfJoin.asOfAuto(lAsof, rAsof, Seq("k"), "ts",
        floor(col("ts") / 4096)).count())
      require(na == np, s"auto probe mismatch: $na vs $np")
      out("asof_skew_top_share") = share
      out("asof_skew_sampled_rows") = sampled
      out("asof_1m_hotkey_auto_sec") = tAuto
    }

    // full ongoing-pipeline tick (VERDICT r5 item 5): appendLsh was
    // measured O(batch); this measures the COMPOSED tick
    // (IncrementalPipeline.runBatch = replay guard -> warm-sig
    // curateIncremental -> CAS commit -> store append). Claim under test:
    // with the signature store warm, per-tick wall is flat in CORPUS size
    // at fixed batch size — so the probe seeds two corpora a decade apart
    // (nDocs/10 and nDocs), runs 3 warm ticks of the SAME batch size on
    // each, and one cold tick (store deleted) as the contrast that DOES
    // scale with the corpus. Pass `pipeline` explicitly (e.g. nDocs=1M).
    // exact-substring dedup: the planted near-dups share two long token
    // runs (the 3-token edit at 50-52 splits the 120-token stream), so
    // expected spans ~= 4 per planted pair — a known target at any size.
    // The probe question is linearity of the window-fingerprint exchange.
    if (sections("substr")) {
      for (n <- Seq(500, nDocs)) {
        val docs = synthDocs(spark, n, cpus.toInt).localCheckpoint()
        val (sp, tSp) = time(
          graft.ops.SubstringDedup.duplicateSpans(docs, n = 20).count())
        val (cut, tCut) = time(
          graft.ops.SubstringDedup.dedup(docs, n = 20)
            .agg(sum(col("n_tok_before") - col("n_tok_after"))).head.getLong(0))
        out(s"substr_${n}_spans") = sp; out(s"substr_${n}_spans_sec") = tSp
        out(s"substr_${n}_tokens_cut") = cut; out(s"substr_${n}_cut_sec") = tCut
        mark(s"substr_$n", tSp + tCut)
      }
    }

    // line-level dedup: docs of 12 lines — 9 globally-unique + 3 banner
    // lines shared corpus-wide — so expected kept lines = 9n EXACTLY at
    // any size. Probe question: the dup-set aggregation's output stays
    // tiny (3 rows here) while the corpus explodes linearly.
    if (sections("linededup")) {
      for (n <- Seq(500, nDocs)) {
        val docs = synthLineDocs(spark, n, cpus.toInt).localCheckpoint()
        val (r, tLd) = time(
          graft.ops.LineDedup.dedupLines(docs, minCount = 2)
            .agg(sum(col("n_lines_before")), sum(col("n_lines_after"))).head)
        out(s"linededup_${n}_before") = r.getLong(0)
        out(s"linededup_${n}_after") = r.getLong(1)
        out(s"linededup_${n}_sec") = tLd
        mark(s"linededup_$n", tLd)
      }
    }

    // SemDeDup: planted near-dups (cos > 0.999) at every 20th vector;
    // cells sized to a ~256-vector target so candidate volume stays
    // ~n*256 regardless of n. Reported recall = found / planted — the
    // only loss mechanism is a planted pair straddling a cell boundary.
    if (sections("semdedup")) {
      for (n <- Seq(math.max(1000, nVecs / 10), nVecs); nAssign <- Seq(1, 2)) {
        val vecs = synthVecs(spark, n, 64, cpus.toInt, plantEvery = 20)
          .localCheckpoint()
        val nCells = math.max(8, n / 256)
        val (found, tSd) = time(
          graft.ops.SemDedup.semDedupPairs(vecs, tau = 0.99, nCells = nCells,
            maxCell = 4096, nAssign = nAssign).count())
        out(s"semdedup_${n}_a${nAssign}_pairs") = found
        out(s"semdedup_${n}_a${nAssign}_planted") = n / 20
        out(s"semdedup_${n}_a${nAssign}_sec") = tSd
        mark(s"semdedup_${n}_a$nAssign", tSd)
      }
    }

    // PQ: encode once (16 bytes/vector vs 256), ADC shortlist + exact
    // refine vs brute force — the memory half of the ANN scale story.
    // Recall target: refined ~= brute (measured 0.96-0.98 at driver SFs).
    if (sections("pq")) {
      val vecs = synthVecs(spark, nVecs, 64, cpus.toInt).localCheckpoint()
      val q = vecs.orderBy("vec_id").select("embedding").head.getSeq[Float](0).toArray
      val (model, tTrain) = time(graft.ops.Pq.train(vecs, m = 16, k = 64))
      val (codes, tEnc) = time(graft.ops.Pq.encode(vecs, model).localCheckpoint())
      val (adcIds, tAdc) = time(
        graft.ops.Pq.adcTopK(codes, model, q, 50).collect().map(_.getLong(0)).toSet)
      val (bruteIds, tBrute) = time(
        Similarity.bruteForceTopK(vecs, q, 50).collect().map(_.getLong(0)).toSet)
      out("pq_train_sec") = tTrain
      out("pq_encode_sec") = tEnc
      out("pq_adc_sec") = tAdc
      out("pq_brute_sec") = tBrute
      out("pq_adc_recall50") = (adcIds & bruteIds).size
      // refine-multiplier tradeoff: uniform-random vectors are the
      // adversarial case (the true top-50 cosines nearly tie), so the
      // shortlist needed for a recall target is the honest reading here
      var tRefTotal = 0.0
      for (refine <- Seq(4, 16, 64)) {
        val (refIds, tRef) = time(
          graft.ops.Pq.adcTopKRefined(codes, vecs, model, q, 50, refine = refine)
            .collect().map(_.getLong(0)).toSet)
        out(s"pq_refined_r${refine}_sec") = tRef
        out(s"pq_refined_r${refine}_recall50") = (refIds & bruteIds).size
        tRefTotal += tRef
      }
      mark("pq", tTrain + tEnc + tAdc + tRefTotal + tBrute)
    }

    // IVF x PQ composition (VERDICT r6 #1): at nVecs (run with 1M), the
    // composed read path vs its two halves. ivf-only reads raw floats from
    // the probed cells; pq-only ADC-scans the whole corpus's byte codes;
    // ivfpq reads byte codes from the probed cells only and refines the
    // bounded shortlist — O(probed cells) I/O at 16x compression. All
    // three arms are measured against the same persisted parquet source,
    // probe-only (builds timed separately), with recall vs brute.
    if (sections("ivfpq")) {
      val src = s"${System.getProperty("java.io.tmpdir")}/graft_scaleprobe_ivfpq_src"
      synthVecs(spark, nVecs, 64, cpus.toInt).write.mode("overwrite").parquet(src)
      val vecsP = spark.read.parquet(src)
      val q = vecsP.orderBy("vec_id").select("embedding").head
        .getSeq[Float](0).toArray
      val (bruteIds, tBrute) = time(
        Similarity.bruteForceTopK(vecsP, q, 50).collect().map(_.getLong(0)).toSet)
      out("ivfpq_brute_sec") = tBrute
      // ivf-only arm — nProbe swept: uniform-random vectors are the
      // adversarial case for cell pruning (the true top-50 cosines nearly
      // tie and scatter across cells), so recall-vs-cells-probed is the
      // honest reading, same convention as the pq section's refine sweep
      val dIvf = s"${System.getProperty("java.io.tmpdir")}/graft_scaleprobe_ivf_idx"
      rmrf(dIvf)
      val (_, tBuildIvf) = time(AnnIndex.buildIvf(vecsP, dIvf, nCells = 256))
      out("ivfpq_arm_ivf_build_sec") = tBuildIvf
      var tIvfTotal = 0.0
      for (np <- Seq(8, 32, 64)) {
        val (ivfIds, tIvf) = time(
          AnnIndex.probeIvf(spark, dIvf, q, 50, nProbe = np)
            .collect().map(_.getLong(0)).toSet)
        out(s"ivfpq_arm_ivf_np${np}_probe_sec") = tIvf
        out(s"ivfpq_arm_ivf_np${np}_recall50") = (ivfIds & bruteIds).size
        tIvfTotal += tIvf
      }
      mark("ivfpq_arm_ivf", tBuildIvf + tIvfTotal)
      // pq-only arm (full-corpus ADC + refine): codes persisted like an
      // index so the probe measures the scan, not the encode
      val dCodes = s"${System.getProperty("java.io.tmpdir")}/graft_scaleprobe_pq_codes"
      val (model, tTrainPq) = time(graft.ops.Pq.train(vecsP, m = 16, k = 64))
      val (_, tEnc) = time(graft.ops.Pq.encode(vecsP, model)
        .write.mode("overwrite").parquet(dCodes))
      val codesP = spark.read.parquet(dCodes)
      val (pqIds, tPq) = time(
        graft.ops.Pq.adcTopKRefined(codesP, vecsP, model, q, 50, refine = 4)
          .collect().map(_.getLong(0)).toSet)
      out("ivfpq_arm_pq_build_sec") = tTrainPq + tEnc
      out("ivfpq_arm_pq_probe_sec") = tPq
      out("ivfpq_arm_pq_recall50") = (pqIds & bruteIds).size
      mark("ivfpq_arm_pq", tTrainPq + tEnc + tPq)
      // composed arm — same nProbe sweep; the claim under test is that at
      // equal cells probed the composed probe matches the ivf-only arm's
      // recall (refine is exact over a 4x shortlist) at byte-scan cost
      val dBoth = s"${System.getProperty("java.io.tmpdir")}/graft_scaleprobe_ivfpq_idx"
      rmrf(dBoth)
      val (_, tBuildBoth) = time(
        AnnIndex.buildIvfPq(vecsP, dBoth, nCells = 256, m = 16, kCodes = 64))
      out("ivfpq_arm_ivfpq_build_sec") = tBuildBoth
      var tBothTotal = 0.0
      for (np <- Seq(8, 32, 64); refine <- Seq(4, 16)) {
        val (bothIds, tBoth) = time(
          AnnIndex.probeIvfPq(spark, dBoth, q, 50, nProbe = np, refine = refine)
            .collect().map(_.getLong(0)).toSet)
        out(s"ivfpq_arm_ivfpq_np${np}_r${refine}_probe_sec") = tBoth
        out(s"ivfpq_arm_ivfpq_np${np}_r${refine}_recall50") = (bothIds & bruteIds).size
        tBothTotal += tBoth
      }
      mark("ivfpq_arm_composed", tBuildBoth + tBothTotal)
    }

    // Sequence packing: the two-pass prefix sum must hold its advantage
    // over the naive single global window as n grows (the window form
    // serializes the whole corpus into one task). Synth docs are ~120
    // tokens, capacity 2048 -> ~n/17 sequences.
    if (sections("pack")) {
      val docs = synthDocs(spark, nDocs, cpus.toInt)
        .withColumn("ws_tokens",
          graft.ops.WsTokenCount.ws_token_count(col("text")))
        .select("doc_id", "ws_tokens")
        .localCheckpoint()
      val (n64, tP64) = time(
        graft.ops.Packing.packSequences(docs, 2048L, "probe", ranges = 64).count())
      val (n1, tP1) = time(
        graft.ops.Packing.packSequences(docs, 2048L, "probe", ranges = 1).count())
      require(n64 == n1, s"two-pass placement mismatch: $n64 vs $n1")
      out("pack_rows") = n64
      out("pack_ranges64_sec") = tP64
      out("pack_ranges1_single_window_sec") = tP1
      val (nMix, tMix) = time(
        graft.ops.Sampling.temperatureMix(
          docs.withColumn("lang",
            when(col("doc_id") % 100 < 90, "big").otherwise("small")),
          totalBudget = nDocs / 10L, alpha = 0.5, salt = "probe",
          bucketed = true).count())
      out("tempmix_kept") = nMix
      out("tempmix_bucketed_sec") = tMix
      mark("pack", tP64 + tP1 + tMix)
    }

    // Bloom dedup gate: build over nVecs keys, then the per-batch shapes
    // the filter exists for — a mostly-new batch (the common tick) and an
    // append — against the direct corpus-scan anti-join. The gate must
    // (a) stay exact, (b) make the warm mostly-new tick corpus-scan-free,
    // (c) append in O(batch).
    if (sections("bloom")) {
      import spark.implicits._
      val n = nVecs.toLong
      val tmp = System.getProperty("java.io.tmpdir")
      val corpusPath = s"$tmp/graft_scaleprobe_bloom_corpus"
      rmrf(corpusPath)
      spark.range(n).select(col("id").as("doc_id"),
          concat(lit("bloom probe key "), col("id"), lit(" body")).as("text"))
        .write.mode("overwrite").parquet(corpusPath)
      val corpus = spark.read.parquet(corpusPath)
      val bdir = s"$tmp/graft_scaleprobe_bloom"
      rmrf(bdir)
      val (_, tBuild) = time(
        graft.ops.BloomDedup.buildBloom(corpus, bdir, shards = 64))
      // batch: 10% new keys + 1% exact copies
      val batch = spark.range(n, n + n / 10).select(col("id").as("doc_id"),
          concat(lit("new key "), col("id"), lit(" body")).as("text"))
        .unionByName(spark.range(n / 100).select(
          (col("id") + 2 * n).as("doc_id"),
          concat(lit("bloom probe key "), col("id"), lit(" body")).as("text")))
        .localCheckpoint()
      val (kept, tGate) = time(
        graft.ops.BloomDedup.dedupAgainst(batch, bdir).count())
      val (keptDirect, tDirect) = time(
        Dedup.exactDedupAgainst(batch, corpus).count())
      // the third arm: anti-join against the persisted (pre-hashed) key
      // store with NO bloom gate — isolates what the filter itself buys
      // (cleared-row short-circuit + shard pruning) from what the store
      // buys (not re-hashing the corpus text every batch)
      val (keptStore, tStore) = time {
        val store = spark.read.parquet(s"$bdir/keys").select("h1", "h2").distinct()
        val hp = udf((m: String) => graft.ops.BloomDedup.hashPair(m))
        batch.withColumn("__hp", hp(md5(col("text"))))
          .withColumn("h1", col("__hp._1")).withColumn("h2", col("__hp._2"))
          .join(store, Seq("h1", "h2"), "left_anti").count()
      }
      require(kept == keptDirect && kept == keptStore && kept == n / 10,
        s"bloom gate must be exact: $kept vs $keptDirect/$keptStore (want ${n / 10})")
      out("bloom_store_antijoin_sec") = tStore
      // the approximate (Dolma) form: map-side only, corpus untouched —
      // the O(batch)-regardless-of-corpus regime; kept undercounts by
      // the fp draw, which the exact arms above bound
      val (keptApprox, tApprox) = time(
        graft.ops.BloomDedup.dedupAgainstApprox(batch, bdir).count())
      require(keptApprox <= kept,
        s"approx form must only over-drop: $keptApprox vs $kept")
      out("bloom_approx_gate_sec") = tApprox
      out("bloom_approx_fp_dropped") = kept - keptApprox
      val (_, tAppend) = time(
        graft.ops.BloomDedup.appendBloom(batch, bdir, Some(1L)))
      val (nk, bpk) = graft.ops.BloomDedup.bloomLoad(spark, bdir)
      out("bloom_keys") = n
      out("bloom_build_sec") = tBuild
      out("bloom_gate_sec") = tGate
      out("bloom_direct_antijoin_sec") = tDirect
      out("bloom_append_sec") = tAppend
      out("bloom_keys_after_append") = nk
      out("bloom_bits_per_key_now") = bpk
      mark("bloom", tBuild + tGate + tDirect + tAppend)
    }

    // DSIR importance resampling at size: fit two hashed-gram models
    // (exchange bounded by B after map-side combine), score the corpus in
    // one map pass (no shuffle — plan-pinned in DsirSpec), Gumbel top-k.
    // Planted contract: 1-in-100 docs carry the target's marker phrase;
    // the top-k draw must be dominated by planted docs.
    if (sections("dsir")) {
      val n = nDocs
      val docs = synthDocs(spark, n, cpus.toInt)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(100)) === 0,
            concat(col("text"), lit(" curated quality reference corpus phrase")))
          .otherwise(col("text")))
        .localCheckpoint()
      val target = synthDocs(spark, 200, cpus.toInt)
        .select((col("doc_id") + 50000000L).as("doc_id"),
          concat(col("text"), lit(" curated quality reference corpus phrase")).as("text"))
        .localCheckpoint()
      val (model, tFit) = time(graft.ops.Dsir.fit(target, docs, nBuckets = 10000))
      val (_, tScore) = time(
        graft.ops.Dsir.logWeights(docs, model)
          .agg(sum(col("log_weight"))).head.getDouble(0))
      val k = math.max(10, n / 200)
      val (sample, tSample) = time(
        graft.ops.Dsir.resample(docs, model, k, "probe")
          .select("doc_id").collect().map(_.getLong(0)))
      val planted = sample.count(_ % 100 == 0)
      require(planted >= (k * 0.8).toInt,
        s"importance bias lost at $n docs: $planted/$k planted drawn")
      out(s"dsir_${n}_fit_sec") = tFit
      out(s"dsir_${n}_score_sec") = tScore
      out(s"dsir_${n}_sample_sec") = tSample
      out(s"dsir_${n}_planted_in_top") = s"$planted/$k"
      mark(s"dsir_$n", tFit + tScore + tSample)
    }

    // Bloom probe routing (VERDICT r6 #3): broadcast vs cogrouped probe
    // at filter sizes where the broadcast starts to hurt. Run with nVecs
    // = 100M+ (10 bits/key -> 125 MB of bit arrays) — below that the
    // broadcast form wins outright and the auto-route's threshold keeps
    // it. Both arms must flag the identical hit set (correctness is
    // pinned in BloomDedupSpec; here it is re-checked at size).
    if (sections("bloomroute")) {
      val tmp = System.getProperty("java.io.tmpdir")
      for (n <- Seq(nVecs.toLong / 10, nVecs.toLong / 3, nVecs.toLong)) {
        val corpusPath = s"$tmp/graft_scaleprobe_bloomroute_corpus"
        rmrf(corpusPath)
        spark.range(n).select(col("id").as("doc_id"),
            concat(lit("route key "), col("id"), lit(" body")).as("text"))
          .write.mode("overwrite").parquet(corpusPath)
        val corpus = spark.read.parquet(corpusPath)
        val bdir = s"$tmp/graft_scaleprobe_bloomroute"
        rmrf(bdir)
        val (_, tBuild) = time(
          graft.ops.BloomDedup.buildBloom(corpus, bdir, shards = 256))
        val filterMb = graft.ops.BloomDedup.bloomLoad(spark, bdir) match {
          case (keys, bpk) => keys * bpk / 8 / 1048576.0
        }
        // 1M-row batch, 90% new / 10% seen — the steady-state tick shape
        val b = math.max(100000L, n / 100)
        val batch = spark.range(n, n + b * 9 / 10).select(col("id").as("doc_id"),
            concat(lit("new key "), col("id"), lit(" body")).as("text"))
          .unionByName(spark.range(b / 10).select(
            (col("id") + 2 * n).as("doc_id"),
            concat(lit("route key "), col("id"), lit(" body")).as("text")))
          .localCheckpoint()
        // min-of-2 per arm (the bench convention): one-shot timings at
        // 100M+ scale conflate the arm with GC/page-cache blips — the
        // first sweep here measured 12.7 s and 0.7 s for the SAME
        // broadcast arm at adjacent sizes
        def arm(route: String): (Long, Double, Double) = {
          val runs = (1 to 2).map { _ =>
            time(graft.ops.BloomDedup.mightContainAuto(batch, bdir,
                routeHint = Some(route))
              .filter(col("bloom_hit")).count())
          }
          (runs.head._1, runs.map(_._2).min, runs.map(_._2).max)
        }
        val (hitsB, tBroadcast, tBroadcastSlow) = arm("broadcast")
        val (hitsC, tCogroup, tCogroupSlow) = arm("cogroup")
        require(hitsB == hitsC,
          s"route arms disagree at n=$n: broadcast=$hitsB cogroup=$hitsC")
        out(s"bloomroute_${n}_filter_mb") = filterMb
        out(s"bloomroute_${n}_build_sec") = tBuild
        out(s"bloomroute_${n}_batch_rows") = b
        out(s"bloomroute_${n}_broadcast_sec") = tBroadcast
        out(s"bloomroute_${n}_broadcast_slow_sec") = tBroadcastSlow
        out(s"bloomroute_${n}_cogroup_sec") = tCogroup
        out(s"bloomroute_${n}_cogroup_slow_sec") = tCogroupSlow
        mark(s"bloomroute_$n", tBuild + tBroadcast + tCogroup)
      }
    }

    // Manifest data skipping: one month of synthetic events compacted
    // into 32 ts-clustered files; a 3-day range query through readRange
    // vs the full-scan filter. The honest scale metric is files OPENED
    // (the plan numbers) — wall clock at local scale is page-cached.
    if (sections("skip")) {
      val n = nVecs.toLong
      val tmp = System.getProperty("java.io.tmpdir")
      val table = s"$tmp/graft_scaleprobe_skiptbl"
      rmrf(table)
      val ev = spark.range(n).select(col("id").as("event_id"),
        (lit(1704067200L) + col("id") * (30L * 86400) / n).as("ts_s"),
        pmod(col("id") * 2654435761L, lit(1000)).as("user_id"))
      graft.table.TranscriptTable.writeBatch(
        ev.repartitionByRange(32, col("ts_s")).sortWithinPartitions("ts_s"),
        table, "b000", statsCols = Seq("ts_s"))
      val lo = 1704067200L + 10L * 86400; val hi = lo + 3L * 86400
      val plan = graft.table.TranscriptTable.planRange(table, "ts_s", lo, hi)
      val (nPruned, tPruned) = time(
        graft.table.TranscriptTable.readRange(spark, table, "ts_s", lo, hi).count())
      val (nFull, tFull) = time(
        graft.table.TranscriptTable.read(spark, table)
          .filter(col("ts_s") >= lo && col("ts_s") <= hi).count())
      require(nPruned == nFull, s"pruned read changed results: $nPruned vs $nFull")
      out("skip_rows") = n
      out("skip_files_total") = plan.nFilesTotal
      out("skip_files_skipped") = plan.nFilesSkipped
      out("skip_pruned_sec") = tPruned
      out("skip_full_scan_sec") = tFull
      mark("skip", tPruned + tFull)
    }

    // Copy-on-write DELETE / MERGE: the scale claim is that a key-range
    // purge or CDC upsert costs ONLY the overlapping batches, vs the
    // naive read-filter-rewrite of the whole table. 8 time-sliced
    // batches (the natural append layout; ts monotone in id, so both
    // columns cluster), 3-day purge + a 200k-key merge with inserts
    // past the max.
    if (sections("cow")) {
      val n = nVecs.toLong
      val tmp = System.getProperty("java.io.tmpdir")
      val table = s"$tmp/graft_scaleprobe_cowtbl"
      rmrf(table)
      val t0 = 1704067200L
      val month = 30L * 86400
      val ev = spark.range(n).select(col("id").as("event_id"),
        (lit(t0) + col("id") * month / n).as("ts_s"),
        pmod(col("id") * 2654435761L, lit(1000)).as("user_id"))
      (0 until 8).foreach { b =>
        graft.table.TranscriptTable.writeBatch(
          ev.filter(col("ts_s") >= t0 + b * month / 8 &&
              col("ts_s") < t0 + (b + 1) * month / 8)
            .repartitionByRange(4, col("ts_s")).sortWithinPartitions("ts_s"),
          table, f"b$b%03d", statsCols = Seq("ts_s", "event_id"))
      }
      val lo = t0 + 10L * 86400; val hi = lo + 3L * 86400
      val (stDel, tDel) = time(graft.table.TranscriptTable
        .deleteRange(spark, table, "ts_s", lo, hi, "d100"))
      require(stDel.nBatchesRewritten <= 2,
        s"3-day purge must stay inside <= 2 of 8 week-ish batches: $stDel")
      // the O(table) strawman every engine without manifest bounds pays:
      // read-filter-rewrite the full table
      val straw = s"$tmp/graft_scaleprobe_cowstraw"
      rmrf(straw)
      val (_, tStraw) = time(
        graft.table.TranscriptTable.read(spark, table)
          .filter(!(col("ts_s") >= lo && col("ts_s") <= hi))
          .write.mode("overwrite").parquet(straw))
      // CDC merge: re-value an n/50-id run (inside batch 0 — n/10 + n/50
      // = 0.12n < n/8 at every n, so the section no longer assumes n is
      // big enough for a fixed 100k run to fit) + n/100 inserts far past
      // the max id — exact membership prune must hold at ONE batch
      val upd = ev.filter(col("event_id") >= n / 10 &&
          col("event_id") < n / 10 + math.max(1L, n / 50))
        .withColumn("user_id", lit(-1L))
        .unionByName(ev.filter(col("event_id") < math.max(1L, n / 100))
          .withColumn("event_id", col("event_id") + lit(3L * n)))
      val (stM, tMerge) = time(graft.table.TranscriptTable
        .mergeKeys(spark, table, "event_id", upd, "m200"))
      require(stM.nBatchesRewritten == 1,
        s"outlier inserts must not widen the merge rewrite: $stM")
      out("cow_rows") = n
      out("cow_delete_batches_rewritten") =
        s"${stDel.nBatchesRewritten}/${stDel.nBatchesTotal}"
      out("cow_delete_rows_purged") = stDel.rowsBefore - stDel.rowsAfter
      out("cow_delete_sec") = tDel
      out("cow_full_rewrite_sec") = tStraw
      out("cow_merge_batches_rewritten") =
        s"${stM.nBatchesRewritten}/${stM.nBatchesTotal}"
      out("cow_merge_sec") = tMerge
      mark("cow", tDel + tStraw + tMerge)
    }

    // Adversarial LAYOUTS for skipping + CoW (VERDICT r6 #7): the uniform
    // monotone probes above are the friendly case. Here: (a) late-arriving
    // events — each weekly batch carries a 10% tail of rows up to 2 days
    // old, plus one full-month backfill batch, so ts bounds OVERLAP across
    // batches; (b) a zipf-hot user_id and a STRIDED CDC key set (every
    // 50th id — updates scattered over the table's whole history, the
    // realistic upsert shape), which defeats membership pruning in every
    // batch because every batch genuinely holds update keys. The contract
    // under test: pruning degrades to MORE BATCHES TOUCHED, never to
    // wrong rows.
    if (sections("cowskew")) {
      val n = nVecs.toLong
      val tmp = System.getProperty("java.io.tmpdir")
      val table = s"$tmp/graft_scaleprobe_cowskew"
      rmrf(table)
      val t0 = 1704067200L
      val month = 30L * 86400
      val week = month / 8
      // ts mostly in the ingest week but 10% late by up to 2 days;
      // user_id zipf-ish (hash^2 concentrates mass near 0 — a hot-key
      // stand-in). NOTE Column./ on integers is DOUBLE division in Spark
      // SQL — every integer-semantics expression here floors explicitly.
      val ev = spark.range(n).select(col("id").as("event_id"),
        (lit(t0) + floor(col("id") * month / n).cast("long")
          - when(pmod(col("id"), lit(10)) === 0,
              pmod(col("id") * 40503L, lit(2L * 86400))).otherwise(0L))
          .as("ts_s"),
        pmod(pmod(col("id") * 2654435761L, lit(1000))
          * pmod(col("id") * 2654435761L, lit(1000)), lit(997)).as("user_id"))
        .withColumn("ts_s", greatest(col("ts_s"), lit(t0)))
        .localCheckpoint()
      (0 until 8).foreach { b =>
        // assignment by ORIGINAL (pre-lateness) slot keeps each batch a
        // week's ingest; the late rows make its ts bounds overlap the
        // previous batch
        graft.table.TranscriptTable.writeBatch(
          ev.filter(floor(col("event_id") * 8 / n).cast("long") === b)
            .repartitionByRange(2, col("ts_s")).sortWithinPartitions("ts_s"),
          table, f"b$b%03d", statsCols = Seq("ts_s", "event_id"))
      }
      // the backfill batch: a sliver spanning the WHOLE month (bounds as
      // wide as the table — prunable by nothing range-shaped)
      graft.table.TranscriptTable.writeBatch(
        ev.filter(pmod(col("event_id"), lit(5000)) === 0)
          .select(col("event_id") + lit(10L * n) as "event_id", col("ts_s"),
            col("user_id"))
          .coalesce(1).sortWithinPartitions("ts_s"),
        table, "b008", statsCols = Seq("ts_s", "event_id"))
      val total = graft.table.TranscriptTable.read(spark, table).count()
      // (c) range-read pruning over the OVERLAPPING layout itself (before
      // any rewrite consolidates it): still correct, fewer files skipped
      // than the clustered `skip` section — that DELTA is the honest cost
      // of the layout; Z-order/compaction is the cure
      val planPre = graft.table.TranscriptTable.planRange(table, "ts_s",
        t0 + 20L * 86400, t0 + 23L * 86400)
      val (nPrunedPre, tPrunedPre) = time(
        graft.table.TranscriptTable.readRange(spark, table, "ts_s",
          t0 + 20L * 86400, t0 + 23L * 86400).count())
      val nFullPre = graft.table.TranscriptTable.read(spark, table)
        .filter(col("ts_s") >= t0 + 20L * 86400 &&
          col("ts_s") <= t0 + 23L * 86400).count()
      require(nPrunedPre == nFullPre,
        s"skew-layout pruned read: $nPrunedPre vs $nFullPre")
      out("cowskew_preread_files_skipped") =
        s"${planPre.nFilesSkipped}/${planPre.nFilesTotal}"
      out("cowskew_preread_sec") = tPrunedPre
      // (a) 3-day purge: overlapping weekly batches + the late tail of the
      // NEXT week + the backfill all rewrite; the rest must be untouched
      val lo = t0 + 10L * 86400; val hi = lo + 3L * 86400
      val (stDel, tDel) = time(graft.table.TranscriptTable
        .deleteRange(spark, table, "ts_s", lo, hi, "d100"))
      require(stDel.nBatchesRewritten <= 4,
        s"late-arrival overlap must widen the purge to <= 4 of 9 " +
          s"(own 1-2 weeks + next week's late tail + backfill): $stDel")
      val after = graft.table.TranscriptTable.read(spark, table)
      val (nKept, tVerify) = time(after.count())
      val nInRange = after
        .filter(col("ts_s") >= lo && col("ts_s") <= hi).count()
      require(nInRange == 0, s"purge left $nInRange in-range rows behind")
      require(nKept == total - stDel.rowsBefore + stDel.rowsAfter,
        s"row accounting broke: $nKept kept of $total")
      out("cowskew_rows") = n
      out("cowskew_delete_batches_rewritten") =
        s"${stDel.nBatchesRewritten}/${stDel.nBatchesTotal}"
      out("cowskew_delete_sec") = tDel
      out("cowskew_verify_sec") = tVerify
      // (b) CDC merge with a STRIDED key set (every 50th id): update keys
      // live in EVERY weekly batch and in the delete's consolidation
      // batch — membership pruning must degrade to ALL live batches
      // touched (never skip a live key; only the disjoint-id backfill
      // could be skipped, and it was already consolidated by the delete)
      // and the upsert must stay exact
      val upd = ev.filter(pmod(col("event_id"), lit(50)) === 0)
        .withColumn("user_id", lit(-1L))
        .localCheckpoint()
      val nUpd = upd.count()
      val (stM, tMerge) = time(graft.table.TranscriptTable
        .mergeKeys(spark, table, "event_id", upd, "m200"))
      require(stM.nBatchesRewritten == stM.nBatchesTotal,
        s"strided keys live in every batch — pruning must touch " +
          s"them all (never skip a live key): $stM")
      // upsert semantics: every update key lands (replaced where live,
      // re-inserted where the purge removed it)
      val updated = graft.table.TranscriptTable.read(spark, table)
        .filter(col("user_id") === -1L).count()
      require(updated == nUpd,
        s"merge correctness under the skewed layout: $updated vs $nUpd")
      out("cowskew_merge_batches_rewritten") =
        s"${stM.nBatchesRewritten}/${stM.nBatchesTotal}"
      out("cowskew_merge_sec") = tMerge
      // (c) range-read pruning over the overlapping layout: still correct,
      // fewer files skipped than the clustered `skip` section (that DELTA
      // is the honest cost of the layout; Z-order/compaction is the cure)
      val plan = graft.table.TranscriptTable.planRange(table, "ts_s",
        t0 + 20L * 86400, t0 + 23L * 86400)
      val (nPruned, tPruned) = time(
        graft.table.TranscriptTable.readRange(spark, table, "ts_s",
          t0 + 20L * 86400, t0 + 23L * 86400).count())
      val nFull = graft.table.TranscriptTable.read(spark, table)
        .filter(col("ts_s") >= t0 + 20L * 86400 &&
          col("ts_s") <= t0 + 23L * 86400).count()
      require(nPruned == nFull, s"skew-layout pruned read: $nPruned vs $nFull")
      out("cowskew_read_files_skipped") =
        s"${plan.nFilesSkipped}/${plan.nFilesTotal}"
      out("cowskew_read_sec") = tPruned
      mark("cowskew", tDel + tVerify + tMerge + tPruned)
    }

    if (sections("pipeline")) {
      val batchN = math.max(1000, nDocs / 50)
      for (n <- Seq(math.max(2 * batchN, nDocs / 10), nDocs)) {
        val tmp = System.getProperty("java.io.tmpdir")
        val table = s"$tmp/graft_scaleprobe_pipe_$n"
        val sigDir = s"$tmp/graft_scaleprobe_pipesigs_$n"
        rmrf(table); rmrf(sigDir)
        val seed = synthEnDocs(spark, n, cpus.toInt)
        val (_, tSeed) = time(
          IncrementalPipeline.runBatch(spark, seed, table, sigDir, "b000"))
        mark(s"pipe_${n}_seed", tSeed)
        out(s"pipe_${n}_seed_sec") = tSeed
        for (k <- 1 to 3) {
          val batch = synthEnDocs(spark, batchN, cpus.toInt,
            idOffset = 20000000L * k, corpusN = n)
          val (_, tTick) = time(IncrementalPipeline.runBatch(
            spark, batch, table, sigDir, f"b$k%03d"))
          mark(s"pipe_${n}_tick$k", tTick)
          out(s"pipe_${n}_tick${k}_warm_sec") = tTick
        }
        // cold contrast: the store is gone, so the tick pays the full
        // corpus signature pass — the cost the warm path amortizes away
        rmrf(sigDir)
        val coldBatch = synthEnDocs(spark, batchN, cpus.toInt,
          idOffset = 90000000L, corpusN = n)
        val (_, tCold) = time(IncrementalPipeline.runBatch(
          spark, coldBatch, table, sigDir, "b099"))
        mark(s"pipe_${n}_cold_tick", tCold)
        out(s"pipe_${n}_tick_cold_sec") = tCold
        val rows = graft.table.TranscriptTable.committedRowCount(table)
        require(rows > (n * 3L) / 4,
          s"pipeline probe curated away the corpus: $rows of ~$n+ docs kept")
        out(s"pipe_${n}_rows_committed") = rows
      }
    }

    // Bucketed co-located layout (write-once / join-many): at size, the
    // claim is per-JOIN cost — the bucketed layout joins with zero
    // exchanges while the plain layout re-shuffles BOTH sides every
    // query. The write-time delta (one hash exchange) is the amortized
    // price; min-of-2 per arm (the bench convention) so codegen warmup
    // doesn't masquerade as shuffle cost.
    if (sections("bucketed")) {
      val n = nVecs.toLong
      val tmp = System.getProperty("java.io.tmpdir")
      val ev = spark.range(0, n, 1, cpus.toInt).select(
        col("id").as("event_id"),
        pmod(col("id") * 2654435761L, lit(math.max(1000L, n / 100))).as("user_id"),
        (col("id") % 97).cast("double").as("value"))
      val tot = ev.groupBy("user_id").agg(
        count(lit(1)).as("n_ev"), sum("value").as("sv"))
      val pEv = s"$tmp/graft_scaleprobe_bkt_plain_ev"
      val pTot = s"$tmp/graft_scaleprobe_bkt_plain_tot"
      rmrf(pEv); rmrf(pTot)
      val (_, tWpEv) = time(ev.write.mode("overwrite").parquet(pEv))
      val (_, tWpTot) = time(tot.write.mode("overwrite").parquet(pTot))
      rmrf(s"$tmp/graft_scaleprobe_bkt_ev"); rmrf(s"$tmp/graft_scaleprobe_bkt_tot")
      val (_, tWbEv) = time(graft.table.Bucketed.write(
        ev, "probe_bkt_ev", s"$tmp/graft_scaleprobe_bkt_ev", Seq("user_id"), 64))
      val (_, tWbTot) = time(graft.table.Bucketed.write(
        tot, "probe_bkt_tot", s"$tmp/graft_scaleprobe_bkt_tot", Seq("user_id"), 64))
      def minOf2(body: => Long): (Long, Double) = {
        val runs = (1 to 2).map(_ => time(body))
        (runs.head._1, runs.map(_._2).min)
      }
      // wall clock at LOCAL scale is the wrong metric for this layout —
      // a single-JVM shuffle moves bytes at memory speed. The claim is
      // bytes-not-moved, so count shuffle-write bytes per arm: on a
      // cluster those bytes are the network.
      val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      def shuffled(body: => Long): (Long, Long) = {
        // drain in-flight listener events from prior work before sampling
        Thread.sleep(500); shuffleBytes.set(0L)
        val r = body
        Thread.sleep(500) // listener bus is async
        (r, shuffleBytes.get)
      }
      val (cB, tJoinBkt) = minOf2(
        graft.table.Bucketed.cojoin(spark, "probe_bkt_ev", "probe_bkt_tot",
          Seq("user_id")).count())
      val (cP, tJoinPlain) = minOf2(
        spark.read.parquet(pEv).hint("MERGE")
          .join(spark.read.parquet(pTot), Seq("user_id")).count())
      require(cB == cP && cB == n, s"layouts disagree: bucketed=$cB plain=$cP")
      val (_, bytesBkt) = shuffled(
        graft.table.Bucketed.cojoin(spark, "probe_bkt_ev", "probe_bkt_tot",
          Seq("user_id")).count())
      val (_, bytesPlain) = shuffled(
        spark.read.parquet(pEv).hint("MERGE")
          .join(spark.read.parquet(pTot), Seq("user_id")).count())
      spark.sparkContext.removeSparkListener(listener)
      // the count() ACTION adds its own final-agg exchange (~60 B/task —
      // 64 partial counts to one row); the JOIN contributes zero, which
      // is what the plan require above pins. So the byte budget here is
      // the count residue, and the plain arm must be orders beyond it.
      require(bytesBkt < 64L * 1024,
        s"bucketed join shuffled real data, saw $bytesBkt B (count residue is ~4 KB)")
      require(bytesPlain > 100L * math.max(1L, bytesBkt),
        s"plain arm shuffled only $bytesPlain B vs bucketed $bytesBkt B — " +
          "the layout comparison lost its signal")
      out("bucketed_join_shuffle_mb_bucketed") = bytesBkt / 1048576.0
      out("bucketed_join_shuffle_mb_plain") = bytesPlain / 1048576.0
      val planB = graft.table.Bucketed.cojoin(spark, "probe_bkt_ev",
        "probe_bkt_tot", Seq("user_id")).queryExecution.executedPlan.toString
      require(!planB.contains("Exchange"), "bucketed probe join shuffled")
      // aggregation on the bucket key: same zero-exchange dividend
      val (_, tAggBkt) = minOf2(graft.table.Bucketed.table(spark, "probe_bkt_ev")
        .groupBy("user_id").agg(sum("value")).count())
      val (_, tAggPlain) = minOf2(spark.read.parquet(pEv)
        .groupBy("user_id").agg(sum("value")).count())
      out("bucketed_rows") = n
      out("bucketed_write_plain_sec") = tWpEv + tWpTot
      out("bucketed_write_bucketed_sec") = tWbEv + tWbTot
      out("bucketed_join_bucketed_sec") = tJoinBkt
      out("bucketed_join_plain_sec") = tJoinPlain
      out("bucketed_agg_bucketed_sec") = tAggBkt
      out("bucketed_agg_plain_sec") = tAggPlain
      mark("bucketed", tWbEv + tWbTot + tJoinBkt + tJoinPlain)
    }

    // BM25: index build should be linear in the corpus (one combined
    // groupBy); query cost should track the QUERY TERMS' posting lists
    // (~n/vocab per term here), never the corpus row count — the
    // postings frame must not re-shuffle at scoring time.
    if (sections("bm25")) {
      val tmp = System.getProperty("java.io.tmpdir")
      for (n <- Seq(math.max(500, nDocs / 10), nDocs)) {
        val docs = synthDocs(spark, n, cpus.toInt).localCheckpoint()
        val pDir = s"$tmp/graft_scaleprobe_bm25_$n"
        rmrf(pDir)
        var pc = 0L
        // index to a term-sorted parquet layout (the at-scale shape:
        // term-clustered row groups make the query-term IN-filter prune
        // real I/O)
        val (_, tIdx) = time {
          val p = graft.ops.Bm25.index(docs)
          p.repartition(cpus.toInt, col("term")).sortWithinPartitions("term")
            .write.mode("overwrite").parquet(pDir)
          pc = spark.read.parquet(pDir).count()
        }
        val postings = spark.read.parquet(pDir)
        val stats = Some(graft.ops.Bm25.corpusStats(postings))
        val queries = docs.filter(col("doc_id") % math.max(1, n / 16) === 3)
          .limit(16)
          .select(col("doc_id").as("query_id"),
            expr("array_join(slice(split(text, ' '), 1, 5), ' ')")
              .as("query_text")).localCheckpoint()
        // warm queries with index-time stats: pruned scan vs full scan
        val (rk, tQ) = time(graft.ops.Bm25.topKIndexed(
          postings, queries, k = 10, stats = stats).count())
        val (_, tQFull) = time(graft.ops.Bm25.topKIndexed(
          postings, queries, k = 10, stats = stats, pushdown = false).count())
        out(s"bm25_${n}_postings") = pc
        out(s"bm25_${n}_index_sec") = tIdx
        out(s"bm25_${n}_topk_rows") = rk
        out(s"bm25_${n}_query_sec") = tQ
        out(s"bm25_${n}_query_fullscan_sec") = tQFull
        mark(s"bm25_$n", tIdx + tQ + tQFull)
      }
    }

    // BM25 under ZIPF term skew (r8, VERDICT ask): the 7b probes used a
    // uniform vocabulary; real corpora are zipfian, and the postings
    // layout's hot row groups (stopword terms with df ≈ N) are the
    // untested shape. Token ranks are drawn log-uniformly (≈ zipf s=1)
    // over a 50k vocabulary, so rank-1..5 terms appear in ~every doc
    // while the tail is sparse. Measured per query class: a STOPWORD
    // query (top-5 ranks) vs a DISCRIMINATIVE query (mid/tail ranks),
    // each with the IN-filter pushdown on and off, plus each class's
    // per-term df and candidate volume — the honest basis for the
    // "is a df-cap warranted" call.
    if (sections("bm25zipf")) {
      val tmp = System.getProperty("java.io.tmpdir")
      val n = nDocs
      val vocab = 50000
      val dl = 120
      val docs = spark.range(0L, n, 1L, cpus.toInt)
        .select(col("id").as("doc_id"),
          expr(s"""array_join(transform(sequence(1, $dl),
            i -> concat('t', cast(exp(ln(cast($vocab as double)) *
              ((pmod(xxhash64(id * $dl + i), 1000000) + 1) / 1000000.0d))
              as int))), ' ')""").as("text"))
        .localCheckpoint()
      val pDir = s"$tmp/graft_scaleprobe_bm25zipf_$n"
      rmrf(pDir)
      val (_, tIdx) = time {
        graft.ops.Bm25.index(docs)
          .repartition(cpus.toInt, col("term")).sortWithinPartitions("term")
          .write.mode("overwrite").parquet(pDir)
      }
      val postings = spark.read.parquet(pDir)
      val stats = Some(graft.ops.Bm25.corpusStats(postings))
      def q(name: String, terms: Seq[String]): Unit = {
        val queries = spark.range(1).select(lit(7L).as("query_id"),
          lit(terms.mkString(" ")).as("query_text"))
        val dfs = postings.filter(col("term").isin(terms: _*))
          .groupBy("term").agg(count(lit(1)).as("df"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val cand = terms.map(t => dfs.getOrElse(t, 0L)).sum
        val (rk, tQ) = time(graft.ops.Bm25.topKIndexed(
          postings, queries, k = 10, stats = stats).count())
        val (_, tQFull) = time(graft.ops.Bm25.topKIndexed(
          postings, queries, k = 10, stats = stats, pushdown = false).count())
        out(s"bm25zipf_${name}_dfs") = terms.map(t => dfs.getOrElse(t, 0L)).mkString(",")
        out(s"bm25zipf_${name}_candidates") = cand
        out(s"bm25zipf_${name}_rows") = rk
        out(s"bm25zipf_${name}_pruned_sec") = tQ
        out(s"bm25zipf_${name}_fullscan_sec") = tQFull
        mark(s"bm25zipf_$name", tQ + tQFull)
      }
      out("bm25zipf_docs") = n
      out("bm25zipf_index_sec") = tIdx
      q("stopword", Seq("t1", "t2", "t3", "t4", "t5"))
      q("discriminative", Seq("t9731", "t18251", "t27779", "t36643", "t45007"))
      q("mixed", Seq("t1", "t2", "t9731", "t27779", "t45007"))
    }

    // BM25 postings store: O(batch) append vs full rebuild, with the
    // retrieval-equality require (appended store == rebuilt store on the
    // same queries — the meta scalars accumulate additively, so a drift
    // would move scores and fail the exceptAll).
    if (sections("bm25store")) {
      val tmp = System.getProperty("java.io.tmpdir")
      val n = nDocs
      val dir = s"$tmp/graft_scaleprobe_bm25store"
      val dir2 = s"$dir-full"
      rmrf(dir); rmrf(dir2)
      val base = synthDocs(spark, n, cpus.toInt).localCheckpoint()
      val batch = synthDocs(spark, math.max(50, n / 10), cpus.toInt)
        .select((col("doc_id") + 10L * n).as("doc_id"), col("text"))
        .localCheckpoint()
      val (_, tBuild) = time(graft.ops.Bm25.buildPostingsStore(base, dir))
      val (_, tApp) = time(
        graft.ops.Bm25.appendPostingsStore(batch, dir, Some(7L)))
      val (_, tFull) = time(
        graft.ops.Bm25.buildPostingsStore(base.unionByName(batch), dir2))
      val queries = base.filter(col("doc_id") % math.max(1, n / 8) === 3)
        .limit(8)
        .select(col("doc_id").as("query_id"),
          expr("array_join(slice(split(text, ' '), 1, 5), ' ')")
            .as("query_text")).localCheckpoint()
      val fromAppend = graft.ops.Bm25.topKStore(spark, dir, queries, 10)
      val fromRebuild = graft.ops.Bm25.topKStore(spark, dir2, queries, 10)
      require(fromAppend.exceptAll(fromRebuild).isEmpty &&
        fromRebuild.exceptAll(fromAppend).isEmpty,
        "appended postings store diverged from a rebuild")
      out("bm25store_docs") = n
      out("bm25store_build_sec") = tBuild
      out("bm25store_append10pct_sec") = tApp
      out("bm25store_rebuild_sec") = tFull
      mark("bm25store", tBuild + tApp + tFull)
    }

    // Per-key top-k under a 95%-hot key: does the plain
    // window+rank-filter form funnel the hot key through one task, or does
    // Spark's InferWindowGroupLimit already cut the exchange to <= k rows
    // per (key, map partition)?  Verdict (pinned in TopKSpec): the
    // built-in partial WindowGroupLimit below the exchange IS the
    // two-stage escape — a hand-rolled (key, partition-id) pre-rank adds a
    // second exchange for nothing.  Both arms measured here to keep the
    // decision honest across Spark upgrades; the emitted ROWS (not just
    // counts) are require-pinned equal via exceptAll both ways.
    // NOTE the key must be non-foldable — a literal key degenerates the
    // window arm to TakeOrderedAndProject and measures nothing.
    if (sections("topk")) {
      import org.apache.spark.sql.expressions.Window
      val n = 20000000L
      val k = 10
      val cand = spark.range(0L, n, 1L, cpus.toInt).select(
        when(col("id") % 100 < 95, lit(0L))
          .otherwise(col("id") % 999 + 1).as("key"),
        col("id"),
        (col("id") % 9973).cast("double").as("score")).localCheckpoint()
      val nKeys = 1000L
      val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
      val winDf = cand.withColumn("r", row_number().over(w))
        .filter(col("r") <= k)
      val wLocal = Window.partitionBy(col("key"), col("_pid"))
        .orderBy(col("score").desc, col("id"))
      val twoDf = cand.withColumn("_pid", spark_partition_id())
        .withColumn("_r1", row_number().over(wLocal)).filter(col("_r1") <= k)
        .drop("_r1", "_pid")
        .withColumn("r", row_number().over(w)).filter(col("r") <= k)
      // min-of-2 per arm (the bench convention) — single cold timings at
      // this size are dominated by first-touch of the checkpointed blocks
      val (c1, t1a) = time(winDf.count()); val (_, t1b) = time(winDf.count())
      val (c2, t2a) = time(twoDf.count()); val (_, t2b) = time(twoDf.count())
      val t1 = t1a min t1b; val t2 = t2a min t2b
      require(c1 == nKeys * k && c2 == c1, s"arms disagree: $c1 vs $c2")
      // untimed: same COUNT is not same ROWS — a tie-ordering regression
      // in either arm would slip a count check, so pin set equality
      require(winDf.exceptAll(twoDf.select(winDf.columns.map(col): _*))
          .isEmpty &&
        twoDf.select(winDf.columns.map(col): _*).exceptAll(winDf).isEmpty,
        "topk arms emitted different rows at equal counts")
      val plan = winDf.queryExecution.executedPlan.toString
      require(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
        "InferWindowGroupLimit stopped firing — revisit hot-key top-k")
      out("topk_hotkey_rows") = n
      out("topk_window_sec") = t1
      out("topk_handrolled_twostage_sec") = t2
      mark("topk", t1 + t2)
    }

    // Sketches: the build is one map pass + an m-bounded groupBy, so the
    // sketch row count must stay <= 4096 while n grows 10x; the merge of
    // k batch sketches is O(k*m) — corpus-size-independent by
    // construction (each input is already register-bounded).
    if (sections("sketch")) {
      for (n <- Seq(nVecs.toLong, nVecs.toLong * 10)) {
        val keys = spark.range(0L, n, 1L, cpus.toInt)
          .select(concat(lit("k"), col("id")).as("key"))
        var sk: DataFrame = null
        val (nr, tSk) = time {
          sk = graft.ops.Sketches.hllSketch(keys, "key").localCheckpoint()
          sk.count()
        }
        require(nr <= 4096, s"hll sketch outgrew its registers: $nr")
        val est = graft.ops.Sketches.hllEstimate(sk).head.getDouble(2)
        out(s"hll_${n}_regs") = nr
        out(s"hll_${n}_sec") = tSk
        out(s"hll_${n}_est") = est
        out(s"hll_${n}_err_pct") = 100.0 * (est / n - 1.0)
        mark(s"hll_$n", tSk)
      }
      val batches = (0 until 20).map { b =>
        graft.ops.Sketches.hllSketch(
          spark.range(b * 100000L, (b + 1) * 100000L, 1, cpus.toInt)
            .select(concat(lit("k"), col("id")).as("key")), "key")
          .localCheckpoint()
      }
      val (mr, tM) = time(graft.ops.Sketches.hllMerge(batches).count())
      val estM = graft.ops.Sketches.hllEstimate(
        graft.ops.Sketches.hllMerge(batches)).head.getDouble(2)
      out("hll_merge20_regs") = mr
      out("hll_merge20_sec") = tM
      out("hll_merge20_err_pct") = 100.0 * (estM / 2000000.0 - 1.0)
      mark("hll_merge20", tM)
      val docs = synthDocs(spark, nDocs, cpus.toInt).localCheckpoint()
      val occ = docs.select(explode(split(col("text"), " ")).as("term"))
        .localCheckpoint()
      var cms: DataFrame = null
      val (cc, tC) = time {
        cms = graft.ops.Sketches.cmsSketch(occ, "term").localCheckpoint()
        cms.count()
      }
      require(cc <= 4096, s"cms sketch outgrew its counters: $cc")
      val (hh, tH) = time(
        graft.ops.Sketches.cmsEstimate(cms, occ.distinct(), "term").count())
      out("cms_counters") = cc
      out("cms_build_sec") = tC
      out("cms_probe_keys") = hh
      out("cms_probe_sec") = tH
      mark("sketch_cms", tC + tH)
      // DD quantile sketch: bucket count must stay bounded while n grows
      // 10x (log-linear buckets: <= 64 octaves x 32 x 2 + 2 no matter the
      // input), and the extracted quantiles must hold the 1/(2s) bound
      // against closed-form truth (values are a known permutation of 1..n)
      for (n <- Seq(nVecs.toLong, nVecs.toLong * 10)) {
        val vs = spark.range(0L, n, 1L, cpus.toInt)
          .select((col("id") + 1L).as("v"))
        var dd: DataFrame = null
        val (dr, tD) = time {
          dd = graft.ops.Sketches.ddSketch(vs, "v").localCheckpoint()
          dd.count()
        }
        require(dr <= 4098, s"dd sketch outgrew its buckets: $dr")
        val qs = graft.ops.Sketches.ddQuantiles(dd, Seq(0.5, 0.99))
          .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(3)))
        qs.foreach { case (q, rank, est) =>
          val truth = rank.toDouble // rank-th smallest of 1..n is rank
          require(math.abs(est / truth - 1.0) <= 1.0 / 64,
            s"dd quantile bound broke at n=$n q=$q: est=$est true=$truth")
        }
        out(s"dd_${n}_buckets") = dr
        out(s"dd_${n}_sec") = tD
        mark(s"dd_$n", tD)
      }
    }

    val json = out.map {
      case (k, v: Double) => f""""$k":$v%.3f"""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")
    println(json)
    spark.stop()
  }

  private def rmrf(p: String): Unit = graft.util.Fs.rmrf(p)
}
