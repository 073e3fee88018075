package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** First-principles invariants for the vector-search family on sf0.001 —
  * exact values are the DuckDB oracle's job; these pin the geometry.
  */
class SimilaritySpec extends SparkSpec {

  test("PQ coding: every centroid block codes to itself at distance zero") {
    // vec_id < 16 ARE the codebook (q59/q116 convention) — nearest
    // sub-centroid of a centroid's own block must be itself, exactly.
    val self = Similarity.pqCodes(spark, sfDir)
      .filter(col("vec_id") < 16).collect()
    assert(self.length == 16 * 8)
    self.foreach { r =>
      assert(r.getLong(2) == r.getLong(0),
        s"block ${r.getInt(1)} of centroid ${r.getLong(0)} coded to ${r.getLong(2)}")
      assert(r.getDouble(3) == 0.0)
    }
  }

  test("PQ coding: 8 blocks per vector, codes in [0, 16)") {
    val rows = Similarity.pqCodes(spark, sfDir).collect()
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 8))
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 16))
  }

  test("semantic dedup: drops point at lower-id keepers and survivors stay pairwise distinct") {
    val dropped = Similarity.semanticDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(dropped.nonEmpty)
    dropped.foreach { case (vid, dupOf, cs) =>
      assert(dupOf < vid, s"keeper $dupOf not lower than dropped $vid")
      assert(cs >= 0.35 && cs <= 1.0)
    }
    // greedy-by-id is idempotent on the survivor set: no surviving vector
    // may still have a ≥-threshold lower-id SURVIVING neighbor whose id is
    // its recorded keeper (the keeper is always the minimal similar id, and
    // minimal ids are never dropped by a yet-lower similar id transitively
    // below them within the same cluster chain).
    val droppedIds = dropped.map(_._1).toSet
    val minKeepers = dropped.map(_._2).toSet
    assert((minKeepers -- droppedIds).nonEmpty,
      "every keeper was itself dropped — the greedy ordering is broken")
  }

  test("semantic dedup: cluster population is capped — no pair bucket exceeds the split bound") {
    // The scale guarantee q131 ships: clusters above semDeDupCap are split
    // into ceil(size/cap) sub-buckets BEFORE pairing, so per-bucket
    // candidate-pair counts stay O(cap²) regardless of corpus size. Pin
    // (a) the split arity, (b) that at least one cluster actually split at
    // this scale (the cap is deliberately small so the path is exercised),
    // and (c) the empirical per-bucket population bound on this fixture.
    val cap = Similarity.semDeDupCap
    val assign = Similarity.ivfAssignFull(spark, sfDir)
    val sizes = assign.groupBy("cent_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sizes.values.exists(_ > cap), "no cluster exceeds the cap — test scale too small")
    val buckets = assign
      .withColumn("nsub", ceil(count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("cent_id")) / cap.toDouble).cast("long"))
      .withColumn("sub", col("vec_id") % col("nsub"))
      .groupBy("cent_id", "sub").count().collect()
    buckets.foreach { r =>
      val (cid, n) = (r.getLong(0), r.getLong(2))
      val nsub = math.ceil(sizes(cid).toDouble / cap).toLong
      assert(nsub == math.max(1L, nsub))
      // modulo splitting is balance-by-expectation, not a hard partition
      // bound; on the dense-id fixture it stays within 2× of the cap.
      assert(n <= 2L * cap, s"bucket ($cid, ${r.getLong(1)}) holds $n > ${2 * cap}")
    }
    // and every bucket's pair count is bounded by C(2*cap, 2) = O(cap²)
    val maxPairs = buckets.map(r => r.getLong(2) * (r.getLong(2) - 1) / 2).max
    assert(maxPairs <= (2L * cap) * (2L * cap - 1) / 2)
  }

  test("coarse assignment materializes once and the IVF family plans against the cache") {
    // Plan-shape pin for the shared-substrate rule: q59/q131/q132 all
    // consume ONE persisted coarse assignment per (session, corpus). A
    // refactor that drops the reuse would recompute the corpus×16 cosine
    // pass per consumer without failing any correctness test — this fails.
    Similarity.evictCaches(spark)
    Similarity.annIvf(spark, sfDir).collect() // builds + materializes the assignment
    val sd = Similarity.semanticDedup(spark, sfDir)
    assert(sd.queryExecution.executedPlan.toString.contains("graft_assign"),
      "semantic dedup does not scan the materialized assignment")
    sd.collect()
    assert(Similarity.ivfPqAdc(spark, sfDir)
      .queryExecution.executedPlan.toString.contains("graft_assign"),
      "IVF-PQ does not scan the materialized assignment")
    // re-running family members must reuse the same materialized table
    // (max_by over the 16 candidate sims must not reappear in the plan)
    Similarity.annIvf(spark, sfDir).collect()
    assert(!Similarity.annIvf(spark, sfDir)
      .queryExecution.optimizedPlan.toString.contains("max_by"),
      "the shared assignment was rebuilt instead of reused")
  }

  test("the normed vector table materializes once across the ANN family") {
    // Same shared-substrate gate as the coarse assignment, one level down:
    // the parsed+normed embedding corpus materializes once (as parquet —
    // the in-memory cache row-decodes array columns, measured 2x executor
    // CPU), and both a brute-force ranker and an index-family member scan
    // that one table without re-deriving the norms.
    Similarity.evictCaches(spark)
    Similarity.cosineTopK(spark, sfDir).collect() // builds + materializes
    val lsh = Similarity.annLsh(spark, sfDir)
    assert(lsh.queryExecution.executedPlan.toString.contains("graft_vecs"),
      "LSH does not scan the materialized vector table")
    assert(!lsh.queryExecution.optimizedPlan.toString.contains("embedding"),
      "LSH re-derives the vector table from the raw embedding column")
    lsh.collect()
    Similarity.cosineTopK(spark, sfDir).collect()
    Similarity.evictCaches(spark)
  }

  test("IVF-PQ plan shape: no cartesian product; search joins are broadcast") {
    // AQE's toString prints the final AND initial plans — keep the first
    // section only so joins aren't double-counted.
    val plan = Similarity.ivfPqAdc(spark, sfDir).queryExecution.executedPlan
      .toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct"),
      "IVF-PQ plan contains an unbounded cartesian")
    assert(plan.contains("BroadcastHashJoin"),
      "codebook/probe-table joins are not broadcast")
    // Every nested-loop join must be the bounded centroid cross: Cross with
    // a BROADCAST build side (the 16-centroid dim). Four instances are
    // expected — Spark replays the assignment subtree per consumer (corpus
    // codes, codebook residuals, probe tables), but three of the four carry
    // a pushed vec_id predicate so only ONE is a full corpus pass.
    val nlj = "BroadcastNestedLoopJoin[^\n]*".r.findAllIn(plan).toSeq
    assert(nlj.nonEmpty && nlj.forall(_.contains("Cross")),
      s"unexpected nested-loop join kinds: $nlj")
    assert(nlj.size <= 4, s"${nlj.size} nested-loop joins — assignment subtree fan-out grew")
  }

  test("semantic decontamination matches an independent JVM recomputation") {
    val vecs = graft.tables.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val eval = vecs.filter(_._1 < 20)
    val expected = vecs.filter(_._1 >= 20).flatMap { case (id, v) =>
      val hits = eval.toSeq.map { case (eid, ev) => (eid, cos(v, ev)) }
        .filter(_._2 >= 0.25)
      if (hits.isEmpty) None
      else {
        val best = hits.minBy { case (eid, cs) => (-cs, eid) }
        Some(id -> (hits.size.toLong, best._1))
      }
    }
    val out = Similarity.semanticDecontaminate(spark, sfDir).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val (id, n, bestEval, bestCs) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert((n, bestEval) == expected(id), s"doc $id: got ($n,$bestEval)")
      assert(bestCs >= 0.25 - 5e-5 && bestCs <= 1.0)
    }
  }

  test("ADC search ranks by table-lookup sums that bound true distance from below-ish: recall floor holds") {
    // ADC approximates squared-L2 by per-block nearest-centroid lookups;
    // on this corpus the approximation must keep a usable share of the true
    // top-5 (a broken code/table join collapses recall to ~0).
    val recalls = Similarity.pqRecall(spark, sfDir).collect().map(_.getDouble(2))
    assert(recalls.length == 10)
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0))
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.2, s"mean ADC recall $mean — codes or tables likely broken")
  }

  test("q199 SQ8 rerank: exact cosines on its candidates, high recall vs brute force") {
    val out = Similarity.sq8Rerank(spark, sfDir).collect()
    assert(out.length == 50) // 10 probes × top-5
    // per probe: ranks 1..5, cosine non-increasing
    out.groupBy(_.getLong(0)).foreach { case (p, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 5), s"probe $p ranks")
      val cs = sorted.map(_.getDouble(4))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"probe $p order")
    }
    // the re-rank is EXACT on whatever the int8 gate admits, so every
    // returned cosine must equal the brute-force value for that pair —
    // recall measures only the gate. At 64 dims/32 candidates the int8
    // quantization error is far below inter-neighbor gaps on this corpus;
    // a broken code dot or candidate join collapses this to ~0.
    val brute = Similarity.cosineTopK(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    val hits = out.count(r => brute.contains((r.getLong(0), r.getLong(2))))
    assert(hits >= 45, s"recall@5 over 10 probes: $hits/50")
    out.filter(r => brute.contains((r.getLong(0), r.getLong(2)))).foreach { r =>
      assert(r.getDouble(4) == brute((r.getLong(0), r.getLong(2))),
        s"rerank cosine drifted from brute force for ${(r.getLong(0), r.getLong(2))}")
    }
  }

  test("k-means: distributed result equals a from-scratch single-threaded Lloyd run") {
    // Independent recomputation on the driver — same spec (1e-6 quantized
    // grid, md5-min seeds, convergence-capped assignment passes, floor-mean
    // updates, min cent_id tie-break), zero shared code with the query
    // under test.
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(f => math.floor(f.toDouble * 1e6).toLong).toArray))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    var cents = raw.sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(8).map(_._2.clone)
    def assignAll() = raw.map { case (id, v) =>
      val ds = cents.map(c => c.indices.map(i => (v(i) - c(i)) * (v(i) - c(i))).sum)
      val cid = ds.indices.minBy(i => (ds(i), i))
      (id, cid, ds(cid))
    }
    var asg = assignAll()
    var converged = false
    for (_ <- 1 until Similarity.kmeansMaxRounds if !converged) {
      val byC = asg.groupBy(_._2)
      val next = Array.tabulate(8) { cid =>
        byC.get(cid).fold(cents(cid)) { members =>
          val vs = members.map(m => raw.find(_._1 == m._1).get._2)
          Array.tabulate(64)(d =>
            math.floor(vs.map(_(d)).sum.toDouble / vs.length).toLong)
        }
      }
      converged = next.indices.forall(i => next(i).sameElements(cents(i)))
      cents = next
      if (!converged) asg = assignAll()
    }
    val expected = asg.groupBy(_._2).map { case (cid, ms) =>
      (cid, ms.length.toLong, ms.map(_._3).sum) }.toSet
    val got = Similarity.kmeansLloyd(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, s"distributed k-means diverged: $got vs $expected")
  }

  test("incremental assignment agrees with the trainer's own final assignment") {
    // Batch vectors are corpus vectors, and assignment is a pure function
    // of (vector, converged centroids) — so the incremental path must land
    // every batch vector in exactly the bucket the trainer's final pass
    // did, at the same distance. Any drift means the ingest path and the
    // index disagree about the metric or the centroids.
    val trained = Similarity.kmeansTrained(spark, sfDir)._1
      .select("vec_id", "cent_id", "d").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val inc = Similarity.annIncrementalAssign(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(inc.nonEmpty)
    inc.foreach { case (id, cid, d2) =>
      assert(trained(id) == ((cid, d2)),
        s"vec $id: incremental ($cid, $d2) vs trained ${trained(id)}")
    }
    // And the batch rule really is a strict subset of the corpus.
    assert(inc.length < trained.size)
  }

  test("hybrid fusion plans every ranking cut on the native top-K operator, never a window") {
    val plan = Similarity.hybridFusion(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial") && plan.contains("TopKPerKeyFinal"),
      s"native top-K exec missing from hybrid fusion plan:\n$plan")
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window ("),
      s"window-based ranking crept into hybrid fusion:\n$plan")
  }

  test("hybrid fusion equals an independent JVM recomputation of both rankers") {
    val K = 16
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "lower(text) AS t").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val shingles = docs.map { case (id, ws) =>
      id -> ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet }.toMap
    val dfCount = shingles.values.flatten.groupBy(identity).map { case (s, v) => s -> v.size }
    val idx = shingles.map { case (id, ss) => id -> ss.filter(dfCount(_) <= 100) }
    def lexTop(p: Long): Seq[(Long, Long)] =
      idx.keys.filter(_ != p).toSeq
        .map(d => d -> idx(d).intersect(idx(p)).size)
        .filter(_._2 > 0)
        .sortBy { case (d, ov) => (-ov, d) }.take(K).zipWithIndex
        .map { case ((d, _), i) => d -> (K - i).toLong }
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(f => math.floor(f.toDouble * 1e6).toLong).toArray))
      .toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    def denseTop(p: Long): Seq[(Long, Long)] =
      vecs.keys.filter(_ != p).toSeq
        .map(d => d -> d2(vecs(p), vecs(d)))
        .sortBy { case (d, dist) => (dist, d) }.take(K).zipWithIndex
        .map { case ((d, _), i) => d -> (K - i).toLong }
    val expected = (0L until 10L).flatMap { p =>
      val fused = (lexTop(p) ++ denseTop(p))
        .groupBy(_._1).map { case (d, vs) => d -> vs.map(_._2).sum }.toSeq
        .sortBy { case (d, s) => (-s, d) }.take(5).zipWithIndex
      fused.map { case ((d, s), i) => (p, i + 1, d, s) }
    }.toSet
    val got = Similarity.hybridFusion(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, s"hybrid fusion diverged from reference")
  }

  test("IVF-with-trained-centroids: candidates come only from each probe's nprobe=2 buckets and ranks are exact within them") {
    // The train→index handoff (q156): every returned candidate must live in
    // one of its probe's two nearest trained-centroid buckets, and the
    // top-5 must equal a driver-side exhaustive scan RESTRICTED to those
    // buckets (integer L2 on the 1e-6 grid — exact, no float tolerance).
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(f => math.floor(f.toDouble * 1e6).toLong).toArray))
      .toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    var cents = raw.toSeq.sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(8).map(_._2.clone).toArray
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    def assignAll() = raw.map { case (id, v) =>
      id -> cents.indices.minBy(i => (d2(v, cents(i)), i)) }
    var asg = assignAll()
    var converged = false
    for (_ <- 1 until Similarity.kmeansMaxRounds if !converged) {
      val byC = asg.groupBy(_._2)
      val next = Array.tabulate(8) { cid =>
        byC.get(cid).fold(cents(cid)) { ms =>
          val vs = ms.keys.map(raw).toSeq
          Array.tabulate(64)(d =>
            math.floor(vs.map(_(d)).sum.toDouble / vs.length).toLong)
        }
      }
      converged = next.indices.forall(i => next(i).sameElements(cents(i)))
      cents = next
      if (!converged) asg = assignAll()
    }
    val got = Similarity.annIvfTrained(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val probes = raw.keys.filter(_ < 10)
    val expected = probes.flatMap { p =>
      val pv = raw(p)
      val buckets = cents.indices.sortBy(i => (d2(pv, cents(i)), i)).take(2).toSet
      raw.keys.filter(c => c != p && buckets(asg(c)))
        .map(c => (c, d2(pv, raw(c)))).toSeq
        .sortBy { case (c, d) => (d, c) }.take(5).zipWithIndex
        .map { case ((c, d), i) => (p, i + 1, c, d) }
    }.toSet
    assert(got.toSet == expected, "q156 top-5 differs from bucket-restricted reference")
  }

  test("q192 graph index is symmetric, degree-sane, and layers nest (lvl-k nodes are on every layer below)") {
    val edges = Similarity.hnswEdges(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(edges.nonEmpty)
    // symmetrized: every (layer, a, b) has (layer, b, a)
    assert(edges.forall { case (l, a, b) => edges((l, b, a)) },
      "graph must be symmetric after closure")
    assert(edges.forall { case (_, a, b) => a != b }, "no self loops")
    // layer nesting: an edge's endpoints on layer l must both exist on l
    // (levels are per-node; layer-l participation means lvl >= l)
    val stats = Similarity.hnswStats(spark, sfDir).collect()
    val nodesPerLayer = stats.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(nodesPerLayer(0) > nodesPerLayer.getOrElse(1, 0L),
      "layer 1 must be a sparse subset of layer 0")
  }

  test("q192 bucket cap: inert when inactive, deterministic + structurally sound when forced") {
    def edgeSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // cap >= corpus: nsub = 1 everywhere — identical to the default build
    val default = edgeSet(Similarity.hnswEdges(spark, sfDir))
    val loose = edgeSet(Similarity.hnswEdgesCapped(spark, sfDir, 1000000))
    assert(loose == default, "an inactive cap must not change the graph")
    // forced split (cap 20 on ~60-member buckets): the capped graph stays
    // symmetric, self-loop-free, deterministic, and keeps every layer
    val c1 = edgeSet(Similarity.hnswEdgesCapped(spark, sfDir, 20))
    val c2 = edgeSet(Similarity.hnswEdgesCapped(spark, sfDir, 20))
    assert(c1 == c2, "capped build must be deterministic")
    assert(c1 != default, "cap 20 should actually engage the split here")
    assert(c1.forall { case (l, a, b) => a != b && c1((l, b, a)) })
    assert(Set(0, 1, 2).subsetOf(c1.map(_._1)), "every layer keeps edges")
  }

  test("q193 graph-ANN recall@5 is at least IVF's at this scale (the family-completeness claim)") {
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val brute = Similarity.cosineTopK(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val approx = df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      brute.count(approx).toDouble / brute.size
    }
    val ivf = recall(Similarity.annIvf(spark, sfDir))
    val hnswHits = {
      val brute = Similarity.cosineTopK(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val rows = Similarity.hnswRecall(spark, sfDir).collect()
      rows.map(_.getLong(1)).sum.toDouble / brute.size
    }
    assert(hnswHits >= ivf - 1e-9,
      s"graph ANN recall $hnswHits must be >= IVF recall $ivf at equal-or-smaller probe budget")
  }

  test("q193 serving guard: compact broadcast index through a real exchange, no float vectors, no driver collect") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Similarity.hnswRecall(spark, sfDir).queryExecution.executedPlan
      val beam = plan.collectFirst { case e: graft.plans.BeamSearchExec => e }
      assert(beam.nonEmpty, s"q193 must serve through BeamSearchExec:\n$plan")
      // The index reaches executors via a size-guarded BroadcastExchange
      // (driver-memory-accounted, hard too-large error) — the r11 verdict's
      // scale fix: never a raw driver-side collect of corpus data.
      assert(beam.get.right.isInstanceOf[BroadcastExchangeExec] ||
        beam.get.right.isInstanceOf[ReusedExchangeExec],
        s"index side must be a BroadcastExchange:\n${beam.get.right}")
      // ...and the payload is the COMPACT index (SQ8 bytes + adjacency):
      // the float vector table must never ride the serving broadcast.
      val cat = beam.get.right.schema.catalogString
      assert(!cat.contains("double") && !cat.contains("float"),
        s"serving broadcast must carry no floats: $cat")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
