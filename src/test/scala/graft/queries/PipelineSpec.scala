package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants relating the training-data pipeline ops to first principles on
  * sf0.001 — the oracle gate proves exact values; these pin the semantics.
  */
class PipelineSpec extends SparkSpec {

  test("q208 z-order pruned scan: partition filter in the plan, most buckets skipped") {
    val df = Pipeline.zorderPrunedScan(spark, sfDir)
    df.collect()
    val plan = org.apache.spark.sql.GraftSqlBridge.executedPlan(df).toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("file_id"),
      s"no partition pruning in:\n${plan.take(1500)}")
    // quantitative skip: the manifest-selected buckets are a small minority
    val manifest = Pipeline.zorderLayout(spark, sfDir).collect()
    val st = graft.tables.Tables.lineitem(spark, sfDir)
      .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey")).head()
    def cut(lo: Long, hi: Long, p: Long) = lo + (hi - lo + 1) * p / 100
    val (bpl, bph) = (cut(st.getLong(0), st.getLong(1), 10), cut(st.getLong(0), st.getLong(1), 20))
    val (bsl, bsh) = (cut(st.getLong(2), st.getLong(3), 30), cut(st.getLong(2), st.getLong(3), 50))
    val kept = manifest.count(r =>
      r.getLong(3) >= bpl && r.getLong(2) <= bph &&
      r.getLong(5) >= bsl && r.getLong(4) <= bsh)
    assert(kept > 0 && kept * 4 <= manifest.length,
      s"z-order skipped too little: $kept of ${manifest.length} buckets read")
  }

  test("chunk dedup conserves chunks: sum(n_kept) = distinct chunks, kept ≤ total per doc") {
    val out = Pipeline.chunkDedup(spark, sfDir).collect()
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)))
    val keptSum = out.map(_.getLong(2)).sum
    val distinctChunks = graft.tables.Tables.documents(spark, sfDir)
      .select(explode(expr(
        "transform(sequence(0, (size(split(lower(text), ' '))-1) div 10), " +
        "i -> concat_ws(' ', slice(split(lower(text), ' '), i*10+1, 10)))")).as("c"))
      .distinct().count()
    assert(keptSum == distinctChunks, s"kept=$keptSum distinct=$distinctChunks")
  }

  test("substring dedup: span counts follow token counts; fractions bounded") {
    val toks = graft.tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(expr("filter(split(lower(text), ' '), x -> x <> '')")).as("nt"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Pipeline.substringDedup(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (doc, nSpans, nDup, frac) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nSpans == toks(doc) - 15L, s"doc $doc: $nSpans spans for ${toks(doc)} tokens")
      assert(nDup >= 0 && nDup <= nSpans)
      assert(frac >= 0.0 && frac <= 1.0)
    }
    // Docs shorter than the window are excluded by construction.
    assert(out.map(_.getLong(0)).toSet == toks.filter(_._2 >= 16).keySet)
  }

  test("decontamination flags every exact copy of a benchmark doc") {
    val docs = graft.tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("h"),
        size(split(col("text"), " ")).as("n"))
    val bench = docs.filter(col("doc_id") < 20).select(col("h")).distinct()
    // exact copies with ≥ 7 tokens have ≥ 5 trigrams, all shared → must flag
    val copies = docs.filter(col("doc_id") >= 20 && col("n") >= 7)
      .join(bench, "h").select("doc_id").collect().map(_.getLong(0)).toSet
    val flagged = Pipeline.decontaminate(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(copies.subsetOf(flagged),
      s"unflagged benchmark copies: ${copies.diff(flagged)}")
  }

  test("PII redaction counts follow the synthesis rule and the clean text has no hits") {
    val rows = Pipeline.piiRedact(spark, sfDir).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (if (id % 3 != 0) 1 else 0), s"doc $id email count")
      assert(r.getLong(2) == (if (id % 2 == 0) 1 else 0), s"doc $id phone count")
    }
  }

  test("sequence packing conserves docs and tokens per language") {
    val packed = Pipeline.packSequences(spark, sfDir)
      .groupBy("lang").agg(sum("n_docs").as("d"), sum("tok_total").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val truth = graft.tables.Tables.documents(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("d"),
        sum(size(split(col("text"), " "))).as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(packed == truth)
  }

  test("z-order layout conserves rows and clusters both dims (tight per-file ranges)") {
    val out = Pipeline.zorderLayout(spark, sfDir).collect()
    val li = graft.tables.Tables.lineitem(spark, sfDir)
    assert(out.map(_.getLong(1)).sum == li.count())
    val (pkLo, pkHi) = { val r = li.agg(min("l_partkey"), max("l_partkey")).collect()(0)
                         (r.getLong(0), r.getLong(1)) }
    // With an 8-bit z-prefix (4 bits/dim), each bucket covers ~1/16 of each
    // quantized dim; allow 2x for quantization edges on the raw values.
    val maxSpan = out.map(r => r.getLong(3) - r.getLong(2)).max
    assert(maxSpan <= (pkHi - pkLo) / 8,
      s"per-file partkey span $maxSpan too wide vs global ${pkHi - pkLo}")
  }

  test("vocab coverage reaches 95% of tokens with a vocab no larger than the distinct words") {
    val out = Pipeline.vocabCoverage(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (v, cov, tot) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cov * 100 >= tot * 95, s"lang ${r.getString(0)} under-covered")
      assert(cov <= tot && v >= 1)
    }
  }

  test("repetition ratio is 1 - distinct/total and bounded in [0, 1)") {
    Pipeline.repetition(spark, sfDir).collect().foreach { r =>
      val (t, d, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(d <= t && ratio >= 0.0 && ratio < 1.0)
      assert(math.abs(ratio - (1.0 - d.toDouble / t.toDouble)) == 0.0)
    }
  }

  test("mix weights: shares sum to 1 and weight x share = 1/k exactly") {
    val rows = Pipeline.mixWeights(spark, sfDir).collect()
    val k = rows.length.toDouble
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-12)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) * r.getDouble(2) - 1.0 / k) < 1e-12,
        s"weight*share != 1/k for ${r.getString(0)}")
    }
  }

  test("model quality filter: weights match the public recipe; logits match an independent JVM recomputation") {
    // The pinned literal table IS the md5-derived recipe (first hex byte of
    // the bucket index, mod 15, minus 7) — if one drifts, this fails.
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val recipe = (0 until 64).map(b => Integer.parseInt(md5hex(b.toString).take(2), 16) % 15 - 7)
    assert(Pipeline.clfWeights == recipe)
    // Independent scoring: tokenize + hash + sum in plain Scala, no Spark SQL.
    val expected = graft.tables.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().map { r =>
        val toks = r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)
        val logit = toks.map(t => recipe(Integer.parseInt(md5hex(t).take(2), 16) % 64).toLong).sum
        r.getLong(0) -> (toks.length, logit)
      }.toMap
    val out = Pipeline.modelQualityFilter(spark, sfDir).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (doc, n, logit, keep) = (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3))
      assert((n, logit) == expected(doc), s"doc $doc: got ($n,$logit) want ${expected(doc)}")
      assert(keep == (logit * 5 > n * -7L))
    }
  }

  test("filter funnel: stages are monotone and consistent with the standalone gates") {
    val rows = Pipeline.filterFunnel(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val stages = Seq("0_raw", "1_quality", "2_model", "3_exact_dedup", "4_near_dedup")
    assert(rows.keySet == stages.toSet)
    val counts = stages.map(rows)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"funnel not monotone: $rows")
    assert(rows("0_raw") == graft.tables.Tables.documents(spark, sfDir).count())
    // stage 2 must equal composing the standalone q47 and q142 gates
    val q47keep = TextAnalysis.qualityScore(spark, sfDir)
      .filter(col("score") >= 0.25).select("doc_id")
    val q142keep = Pipeline.modelQualityFilter(spark, sfDir)
      .filter(col("keep")).select("doc_id")
    assert(rows("2_model") == q47keep.join(q142keep, "doc_id").count())
  }

  test("unigram log-prob scores are within the information-theoretic bounds") {
    val toks = graft.tables.Tables.documents(spark, sfDir)
      .select(explode(expr("filter(split(lower(text), ' '), x -> x <> '')")).as("w"))
    val total = toks.count().toDouble
    val maxFreq = toks.groupBy("w").count()
      .agg(max("count")).collect()(0).getLong(0).toDouble
    val (lo, hi) = (-math.log(maxFreq / total), math.log(total))
    val rows = Pipeline.unigramLogprob(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nll = r.getDouble(2)
      assert(nll >= lo - 1e-6 && nll <= hi + 1e-6,
        s"doc ${r.getLong(0)}: avg_nll=$nll outside [$lo, $hi]")
    }
  }

  test("snapshot diff statuses partition the union of both snapshots exactly") {
    val diff = Pipeline.snapshotDiff(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("substr(md5(CAST(doc_id AS STRING)), 1, 1) AS b").collect()
      .map(_.getString(0))
    val (added, removed, changed) =
      (docs.count(_ == "f"), docs.count(_ == "e"), docs.count(_ == "0"))
    assert(diff.getOrElse("added", 0L) == added)
    assert(diff.getOrElse("removed", 0L) == removed)
    assert(diff.getOrElse("changed", 0L) == changed)
    assert(diff.values.sum == docs.length, "statuses must partition the key union")
  }

  test("quality median gate keeps at least half of every source and totals conserve") {
    val rows = Pipeline.qualityMedianGate(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // score >= its source's median holds for at least half the source (by
    // definition of a continuous median), and never more than all of it.
    rows.foreach { case (src, total, kept) =>
      assert(kept * 2 >= total && kept <= total,
        s"source $src: kept $kept of $total violates the median bound")
    }
    // Per-source totals cover exactly the scoreable (non-empty-token) docs.
    val scoreable = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("source", "filter(split(lower(text), ' '), x -> x <> '') AS toks")
      .where("size(toks) > 0").groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r._1 -> r._2).toMap == scoreable)
  }

  test("q184 content-defined chunks realign after a prefix insertion (the CDC claim)") {
    import spark.implicits._
    // doc 2 = doc 1 with 7 junk tokens INSERTED at the front: every
    // fixed-window chunking misaligns from token 0, but content-defined
    // boundaries depend only on token hashes, so both docs chunk
    // identically from the first boundary onward.
    val base = (0 until 300).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, s"x0 x1 x2 x3 x4 x5 x6 $base"),
                   (3L, (0 until 100).map(i => s"z$i").mkString(" ")))
    val tmp = java.nio.file.Files.createTempDirectory("cdc").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("synth"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Pipeline.cdcChunks(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (n1, c1, d1, dt1) = rows(1L)
    val (n2, c2, d2, dt2) = rows(2L)
    assert(n1 == 300 && n2 == 307)
    assert(d1 >= 1 && d2 >= 1, s"no realigned shared chunks: doc1=$d1 doc2=$d2")
    // the differing heads: at least one chunk per doc is NOT shared
    assert(d1 < c1 && d2 < c2, s"heads cannot be shared: $rows")
    // every shared chunk is bit-identical content → same total shared tokens
    assert(dt1 == dt2, s"shared-token totals drifted: $dt1 vs $dt2")
    assert(rows(3L)._3 == 0, "unrelated doc must share nothing")
  }

  test("q183 profiles k columns in ONE scan per table (the melt claim, plan-pinned)") {
    val df = Pipeline.dataProfile(spark, sfDir)
    df.collect()
    val plan = org.apache.spark.sql.GraftSqlBridge.executedPlan(df).toString
    val scans = "Scan parquet".r.findAllIn(plan.split("== Initial Plan ==")(0)).length
    assert(scans == 2, s"expected 2 scans (documents + events) for 5 profiled columns, got $scans")
  }
}
