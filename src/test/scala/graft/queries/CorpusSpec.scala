package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-construction invariants on sf0.001. The oracle gate proves value
  * equality against DuckDB; these pin the properties that make the operators
  * safe at scale: partitioning-independence of the hash sample, stratum
  * bounds, and percentile ordering.
  */
class CorpusSpec extends SparkSpec {

  test("hash sample is a pure function of the data: identical under repartition") {
    val base = Corpus.sampleHash(spark, sfDir).collect().map(_.getLong(0)).toSet
    // Same predicate applied after an adversarial repartition: rand()-based
    // sample() would change membership here; md5-prefix must not.
    val docs = graft.tables.Tables.documents(spark, sfDir).repartition(13)
    val re = docs
      .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < lit("29"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(base == re)
  }

  test("stratified sample respects per-stratum bounds and approximate rates") {
    val rows = Corpus.sampleStratified(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, total, sampled) =>
      assert(sampled <= total, s"$lang sampled > total")
      val rate = if (lang == "en") 128.0 / 256 else if (lang == "de") 64.0 / 256 else 26.0 / 256
      // md5 prefixes are uniform; at sf0.001 strata are small (~20 docs), so
      // allow a wide binomial tolerance — this guards inverted thresholds,
      // not exact rates.
      assert(math.abs(sampled.toDouble / total - rate) < 0.35,
        s"$lang rate ${sampled.toDouble / total} far from $rate")
    }
  }

  test("clean corpus never exceeds the deduped document count") {
    val cleaned = Corpus.cleanCorpus(spark, sfDir)
      .agg(sum("n_docs")).collect()(0).getLong(0)
    val deduped = Dedup.dedupExact(spark, sfDir).count()
    assert(cleaned <= deduped)
    assert(cleaned > 0)
  }

  test("token percentiles are ordered and the approx sketch passes its bound") {
    val rows = TextAnalysis.tokenPercentiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p25, p50, p90) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p25 <= p50 && p50 <= p90, s"unordered percentiles: $p25 $p50 $p90")
      assert(r.getBoolean(4), s"approx p50 outside 10% of exact for ${r.getString(0)}")
    }
  }

  test("histogram buckets partition all documents exactly once") {
    val hist = TextAnalysis.tokenHistogram(spark, sfDir).collect()
    val total = hist.map(_.getLong(1)).sum
    val docs = graft.tables.Tables.documents(spark, sfDir).count()
    assert(total == docs)
    hist.foreach { r =>
      val (b, mn, mx) = (r.getLong(0), r.getInt(2), r.getInt(3))
      assert(mn >= b * 20 && mx < (b + 1) * 20, s"bucket $b range [$mn,$mx] out of bounds")
    }
  }

  test("q150 curriculum plans no unpartitioned window (seq is arithmetic, not a global row_number)") {
    val df = Corpus.curriculum(spark, sfDir)
    // Gate on the optimized LOGICAL plan (AQE-independent): every Window
    // must carry a non-empty PARTITION BY. A global window would force the
    // entire corpus through one task — the 100 TB serialization point the
    // arithmetic seq exists to avoid.
    val logical = df.queryExecution.optimizedPlan
    val windows = logical.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, "expected the per-lang rank window")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"unpartitioned window in q150 plan:\n$w")
    }
    // And the manifest sort survives as a global Sort (range exchange at
    // the physical layer), never a driver-side collect.
    val sorts = logical.collect {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort if s.global => s
    }
    assert(sorts.nonEmpty, "expected the global manifest sort")
    // Sanity: seq really is the contiguous 1..N interleave.
    val rows = df.select("seq", "lang_rank").collect()
    val seqs = rows.map(_.getLong(0)).sorted
    assert(seqs.head == 1L && seqs.last == seqs.length.toLong
      && seqs.distinct.length == seqs.length, "seq must be a 1..N permutation")
  }

  test("dedup-aware weights: one row per doc, cluster weights sum to 1, sizes match q62") {
    val w = Corpus.dedupAwareWeights(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(w.length == nDocs && w.map(_._1).distinct.length == w.length)
    // Soft-dedup invariant: every cluster contributes exactly 1 expected
    // epoch copy — weight · size = 1 per row, and total weight = #clusters.
    w.foreach { case (id, sz, sw) =>
      assert(sz >= 1 && math.abs(sw * sz - 1.0) < 1e-12, s"doc $id: $sw × $sz ≠ 1") }
    // Docs in a q62 cluster carry that cluster's member count; singletons 1.
    val q62 = Dedup.dedupCluster(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    w.foreach { case (id, sz, _) =>
      assert(sz == q62.getOrElse(id, 1L), s"doc $id size $sz vs q62 ${q62.get(id)}") }
  }

  test("cross-source minhash estimate covers all source pairs and tracks exact union Jaccard") {
    val est = Dedup.crossSourceMinhash(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    // Exact per-source shingle-union Jaccard, recomputed in the JVM.
    val bySrc = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("source", "lower(text) AS t").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").filter(_.nonEmpty)))
      .groupBy(_._1)
      .map { case (s, rows) =>
        s -> rows.flatMap(_._2.sliding(3).filter(_.length == 3).map(_.mkString(" "))).toSet }
    val sources = bySrc.keys.toSeq.sorted
    val pairs = for (i <- sources.indices; j <- i + 1 until sources.length)
      yield (sources(i), sources(j))
    assert(est.keySet == pairs.toSet, s"pair coverage: ${est.keySet} vs $pairs")
    pairs.foreach { case (s1, s2) =>
      val (a, b) = (bySrc(s1), bySrc(s2))
      val exact = a.intersect(b).size.toDouble / a.union(b).size
      val e = est((s1, s2))
      assert(e >= 0.0 && e <= 1.0)
      // 64 slots ⇒ stderr √(J(1−J)/64) ≤ 0.0625; 4σ bound.
      assert(math.abs(e - exact) <= 0.25,
        s"($s1,$s2): sketch $e vs exact $exact — estimator broken")
    }
  }

  test("q185 cluster split leaks NO near-dup pair; the doc-keyed rule does leak here") {
    import org.apache.spark.sql.functions._
    def splitOf(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val h = substring(md5(key.cast("string")), 1, 2)
      when(h < lit("cc"), "train").when(h < lit("e6"), "val").otherwise("test")
    }
    val perDoc = graft.tables.Tables.documents(spark, sfDir).select("doc_id")
      .join(Dedup.ccLabels(spark, sfDir), Seq("doc_id"), "left")
      .select(col("doc_id"),
        splitOf(coalesce(col("cluster_id"), col("doc_id"))).as("cluster_split"),
        splitOf(col("doc_id")).as("doc_split"))
    val pairs = Dedup.nearDupPairs(spark, sfDir).select("id_a", "id_b")
      .join(perDoc.toDF("id_a", "ca", "da"), "id_a")
      .join(perDoc.toDF("id_b", "cb", "db"), "id_b")
      .select("ca", "cb", "da", "db").collect()
    assert(pairs.nonEmpty, "corpus has no near-dup pairs to test leakage on")
    val clusterLeaks = pairs.count(r => r.getString(0) != r.getString(1))
    val docLeaks = pairs.count(r => r.getString(2) != r.getString(3))
    assert(clusterLeaks == 0, s"cluster-keyed split leaked $clusterLeaks pairs")
    assert(docLeaks > 0,
      "doc-keyed split leaked nothing here — the motivating contrast no longer holds, re-check the corpus")
    // Totals agree with the registered report.
    val n = Corpus.clusterSplit(spark, sfDir).agg(sum("n_docs")).collect()(0).getLong(0)
    assert(n == graft.tables.Tables.documents(spark, sfDir).count())
  }
}
