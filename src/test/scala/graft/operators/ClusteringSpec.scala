package graft.operators

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** Reference union-find. */
  private def ufClusters(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("nearDupClusters equals union-find on a random pair graph") {
    val rnd = new scala.util.Random(13)
    val pairs = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2).distinct
    val got = Clustering.nearDupClusters(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ufClusters(pairs))
  }

  test("nearDupClusters converges on a chain (diameter > 2)") {
    val chain = (0L until 11L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = Clustering.nearDupClusters(chain.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 10L).map(_ -> 0L).toMap)
  }

  test("nearDupClustersStar equals union-find on random pair graphs") {
    for (seed <- Seq(7, 13, 99)) {
      val rnd = new scala.util.Random(seed)
      val pairs = Seq.fill(80)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
        .filter(p => p._1 != p._2).distinct
      val got = Clustering.nearDupClustersStar(pairs.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == ufClusters(pairs), s"seed $seed")
    }
  }

  test("nearDupClustersStar handles a deep chain in logarithmic rounds") {
    // diameter-100 chain: label propagation would need ~100 rounds; the
    // star alternation must finish well inside maxIter = 12 (~log2(100)
    // doubling rounds plus the convergence-confirming round).
    val chain = (0L until 101L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = Clustering.nearDupClustersStar(chain.toDF("id_a", "id_b"),
      maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 100L).map(_ -> 0L).toMap)
  }

  test("nearDupClustersStar matches nearDupClusters on the same input") {
    val rnd = new scala.util.Random(41)
    val pairs = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2).distinct.toDF("id_a", "id_b")
    val a = Clustering.nearDupClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Clustering.nearDupClustersStar(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("representatives keeps exactly one row per cluster") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val clustered = Clustering.nearDupClusters(pairs)
    val reps = Clustering.representatives(clustered)
      .collect().map(_.getLong(0)).sorted
    assert(reps.toSeq == Seq(1L, 10L))
  }

  test("auto-select resolves a shallow clique graph on the fast path") {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = Clustering.nearDupClustersAuto(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("non-converged probe leaves no cached blocks behind") {
    // the auto-selector makes the nearDupClusters throw path ROUTINE for
    // deep graphs — every probe must clean up its localCheckpoint blocks
    // (edges persist + per-round checkpoints), or each fallback leaks
    // probeRounds' worth of storage until the ContextCleaner notices
    val pairs = (0L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    intercept[IllegalStateException] {
      Clustering.nearDupClusters(pairs, maxIter = 3)
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persisted RDDs: $leaked")
    // same contract for the star path's non-convergence throw
    intercept[IllegalStateException] {
      Clustering.nearDupClustersStar(pairs, maxIter = 1)
    }
    val leakedStar = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leakedStar.isEmpty, s"star path leaked persisted RDDs: $leakedStar")
  }

  test("auto-select falls back to star on a deep chain and stays correct") {
    // a 60-node path: diameter 59 >> the 6-round probe, so label
    // propagation cannot converge and the star fallback must produce the
    // full component anyway
    val pairs = (0L until 59L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Clustering.nearDupClustersAuto(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 60 && out.values.forall(_ == 0L))
  }
}

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  test("trainingCorpus drops low-quality, duplicate, and contaminated docs") {
    val benchText = "alpha beta gamma delta epsilon zeta eta theta"
    val goodText = "the cat and the dog sat in the warm sun and it was good"
    val bench = Seq((1L, "en", benchText)).toDF("doc_id", "lang", "text")
    val docs = Seq(
      (10L, "en", goodText),          // kept (cluster representative)
      (11L, "en", goodText),          // near-dup of 10 -> dropped
      (12L, "en", benchText),         // contaminated -> dropped
      (13L, "en", "x"),               // low quality -> dropped
      (14L, "en", "a quick brown fox jumps over the lazy dog again and again")
    ).toDF("doc_id", "lang", "text")
    val out = Pipelines.trainingCorpus(docs, bench,
      qualityMin = 0.2,
      minhash = Dedup.MinHashParams(numHashes = 32, bands = 8, shingle = 3,
        threshold = 0.5),
      contamN = 3, contamMin = 3, testFraction = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(3)))
    assert(out.map(_._1).toSeq == Seq(10L, 14L))
    assert(out.forall(r => r._2 == "train" || r._2 == "test"))
  }

  test("gatedContamination: a vocabulary-disjoint benchmark skips the " +
      "join (O(k) sizing only); a shared-vocab benchmark fires the gate " +
      "and the kept path is bit-identical to the ungated pairs") {
    val train = (0 until 30).map(i =>
      (100L + i, (0 until 12).map(j => s"tr${i % 5}w$j").mkString(" ")))
      .toDF("doc_id", "text")
    // disjoint vocabulary: no shingle hash can be shared, the synopses
    // intersect empty, the estimate is exactly 0 -> skip
    val far = Seq((1L, (0 until 12).map(j => s"benchonly$j").mkString(" ")))
      .toDF("doc_id", "text")
    val (fired0, empty) = Pipelines.gatedContamination(train, far,
      "doc_id", "text", n = 3, minShared = 2)
    assert(!fired0, "disjoint-vocabulary benchmark must skip the join")
    assert(empty.collect().isEmpty)
    assert(empty.columns.toSeq ==
      Seq("train_id", "bench_id", "shared_ngrams"),
      "the skip path must keep the contract schema")
    // shared vocabulary: the gate fires and the result is the direct
    // contaminationPairs output, bit-for-bit
    val near = Seq((1L, (0 until 12).map(j => s"tr0w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val (fired1, pairs) = Pipelines.gatedContamination(train, near,
      "doc_id", "text", n = 3, minShared = 2)
    assert(fired1, "shared-vocabulary benchmark must fire the gate")
    val direct = TextOps.contaminationPairs(train, near,
      "doc_id", "text", n = 3, minShared = 2)
    val got = pairs.collect().toSeq
    assert(got == direct.collect().toSeq)
    assert(got.nonEmpty, "premise: the shared-vocab fixture must overlap")
  }

  test("trainingCorpus collapses an adversarial CHAIN of near-dups") {
    // doc i = unique 15-word block H_i ++ H_{i+1}: adjacent docs share
    // exactly one block (shingle-Jaccard ≈ 0.30), docs 2+ apart share
    // NOTHING — the duplicate graph is a 20-node PATH, the shape where
    // min-label propagation needs diameter rounds; the pipeline's star
    // path must still collapse it to one representative. Bands of 1 row
    // (32 independent probes) make banding recall ≈ 1 at J = 0.3, so the
    // path premise is not at the mercy of the 4-row banding curve.
    def block(k: Int) = (0 until 15).map(j => s"b${k}w$j")
    val docs = (0 until 20).map { i =>
      (i.toLong + 100L, "en", (block(i) ++ block(i + 1)).mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val p = Dedup.MinHashParams(numHashes = 32, bands = 32, shingle = 3,
      threshold = 0.05)
    // confirm the premise: the pair graph is exactly the consecutive path
    val pairs = Dedup.minHashNearDupPairs(docs, "doc_id", "text", p)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (100L until 119L).map(i => (i, i + 1)).toSet,
      s"premise: expected a pure 20-node path, got $pairs")
    val bench = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    val out = Pipelines.trainingCorpus(docs, bench,
      qualityMin = 0.0, minhash = p, contamN = 3, contamMin = 999,
      testFraction = 0.5)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(100L), s"only the chain minimum survives, got $out")
  }
  test("leakageSafeSplit co-assigns every near-dup pair; singletons match " +
      "the plain split") {
    // same 20-node path as above: a chain A~B~...~T must land ENTIRELY on
    // one side even though only adjacent docs are pairwise similar
    def block(k: Int) = (0 until 15).map(j => s"c${k}w$j")
    val chain = (0 until 20).map { i =>
      (i.toLong + 100L, (block(i) ++ block(i + 1)).mkString(" "))
    }
    val singletons = (0 until 30).map(i =>
      (i.toLong + 500L, (0 until 20).map(j => s"u${i}x$j").mkString(" ")))
    val docs = (chain ++ singletons).toDF("doc_id", "text")
    val p = Dedup.MinHashParams(numHashes = 32, bands = 32, shingle = 3,
      threshold = 0.05)
    val out = Pipelines.leakageSafeSplit(docs, p, testFraction = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == 50)
    // no pair straddles: the whole chain shares cluster 100 and one side
    val chainRows = out.filter(_._1 < 500L)
    assert(chainRows.forall(_._2 == 100L))
    assert(chainRows.map(_._3).distinct.length == 1)
    // singletons: cluster = own id, split = the plain per-doc hash split
    val single = out.filter(_._1 >= 500L)
    assert(single.forall(r => r._2 == r._1))
    val plain = Sampling.trainTestSplit(
      singletons.toDF("doc_id", "text"), "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(single.forall(r => plain(r._1) == r._3))
    // both sides are populated (hash rule really splits at f = 0.5)
    assert(single.map(_._3).distinct.length == 2)
  }
}

class IncrementalIngestSpec extends SparkSpec {
  import spark.implicits._

  test("incrementalIngest drops exact dups, near dups, and low quality") {
    val goodText = "the cat and the dog sat in the warm sun and it was good"
    // one appended token: J = 12/13, so a band collision is ~certain
    val nearText = goodText + " indeed"
    val corpus = Seq((1L, "en", goodText),
      (2L, "en", "some other corpus document about completely other things"))
      .toDF("doc_id", "lang", "text")
    val batch = Seq(
      (10L, "en", goodText),  // exact dup of corpus 1 -> dropped
      (11L, "en", nearText),  // near dup of corpus 1 -> dropped
      (12L, "en", "x"),       // low quality -> dropped
      (13L, "en", "a quick brown fox jumps over the lazy dog again and again")
    ).toDF("doc_id", "lang", "text")
    val out = Pipelines.incrementalIngest(batch, corpus,
      qualityMin = 0.2,
      minhash = Dedup.MinHashParams(numHashes = 32, bands = 8, shingle = 3,
        threshold = 0.5),
      testFraction = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(3)))
    assert(out.map(_._1).toSeq == Seq(13L))
    assert(out.forall(r => r._2 == "train" || r._2 == "test"))
  }
}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (0L until 2000L).toDF("doc_id")

  test("trainTestSplit is disjoint, exhaustive, and key-stable") {
    val s1 = Sampling.trainTestSplit(ids, "doc_id", 0.2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = Sampling.trainTestSplit(ids, "doc_id", 0.2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 == s2, "same key must get the same split on every run")
    assert(s1.size == 2000)
    val testFrac = s1.values.count(_ == "test").toDouble / 2000
    assert(math.abs(testFrac - 0.2) < 0.05, s"test fraction $testFrac")
  }

  test("sampleByHash fraction lands near the target and nests monotonically") {
    val s10 = Sampling.sampleByHash(ids, "doc_id", 0.10)
      .collect().map(_.getLong(0)).toSet
    val s25 = Sampling.sampleByHash(ids, "doc_id", 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(math.abs(s10.size / 2000.0 - 0.10) < 0.04)
    assert(math.abs(s25.size / 2000.0 - 0.25) < 0.05)
    // smaller fraction is a subset of the larger: stable growing samples
    assert(s10.subsetOf(s25))
  }

  test("weightedSample: heavy weights dominate and match the window-rank twin") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.roundHalfUp
    // two strata; within 'a', 20 heavy rows (w = 1e6) and 20 light (w = 1):
    // ln(u)/w for every heavy row (>= -1e-5) beats every light row's best
    // (<= ln(9999.5/10000) ~= -5e-5), so the heavy rows must sweep the top-k
    val rows = (0L until 40L).map(i =>
      (i, if (i < 20) 1000000L else 1L, "a")) ++
      (100L until 120L).map(i => (i, i, "b"))
    val df = rows.toDF("doc_id", "w", "grp")
    val out = Sampling.weightedSample(df, "doc_id", "w", "grp", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.length == 10, "k rows per stratum")
    assert(out.filter(_._1 == "a").forall(_._3 < 20L),
      "heavy-weight rows must win stratum a")
    // parity with the window row_number formulation over the same rank key
    graft.functions.GraftFunctions.register(spark)
    val skey = roundHalfUp(
      log((Sampling.hashBucket(col("doc_id")).cast("double") + lit(0.5)) /
        lit(10000.0)) / col("w").cast("double"), 9)
    val w2 = Window.partitionBy(col("grp"))
      .orderBy(col("skey").desc, col("doc_id"))
    val want = df.withColumn("skey", skey)
      .withColumn("rk", row_number().over(w2).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("grp"), col("rk"), col("doc_id"), col("skey"))
      .orderBy(col("grp"), col("rk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == want.toSeq)
  }

  test("capPerGroup keeps exactly k per group in stable hash order") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = (0L until 100L).map(i => (i, "s" + (i % 3))).toDF("doc_id", "source")
    val out = Sampling.capPerGroup(df, "doc_id", "source", k = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.groupBy(_._1).forall(_._2.length == 7))
    // parity with the window row_number formulation over the same order
    graft.functions.GraftFunctions.register(spark)
    val want = df.withColumn("bkt", Sampling.hashBucket(col("doc_id")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("bkt"), col("doc_id")))
        .cast("long"))
      .filter(col("rk") <= 7)
      .select(col("source"), col("rk"), col("doc_id"), col("bkt"))
      .orderBy(col("source"), col("rk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == want.toSeq)
  }

  test("weightedSample excludes non-positive weights and is deterministic") {
    val df = Seq((1L, 5L, "g"), (2L, 0L, "g"), (3L, -4L, "g"), (4L, 2L, "g"))
      .toDF("doc_id", "w", "grp")
    val out1 = Sampling.weightedSample(df, "doc_id", "w", "grp", k = 10)
      .collect().map(_.getLong(2)).toSeq
    val out2 = Sampling.weightedSample(df, "doc_id", "w", "grp", k = 10)
      .collect().map(_.getLong(2)).toSeq
    assert(out1.toSet == Set(1L, 4L), "zero/negative weights excluded")
    assert(out1 == out2)
  }

  test("temperatureMix: alpha=1 keeps natural proportions, alpha=0 equalizes") {
    // skewed strata: 1600 'big', 300 'mid', 100 'rare'
    val df = ((0 until 1600).map(i => (i.toLong, "big")) ++
      (2000 until 2300).map(i => (i.toLong, "mid")) ++
      (3000 until 3100).map(i => (i.toLong, "rare")))
      .toDF("doc_id", "stratum")
    def kept(alpha: Double) =
      Sampling.temperatureMix(df, "doc_id", "stratum", alpha, 0.25)
        .groupBy("stratum").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val nat = kept(1.0) // every stratum sampled at ~targetFrac
    assert(math.abs(nat("big") / 1600.0 - 0.25) < 0.05, nat.toString)
    assert(math.abs(nat("mid") / 300.0 - 0.25) < 0.08, nat.toString)

    val eq = kept(0.0) // equal target counts: 2000*0.25/3 ≈ 167 each
    assert(eq("rare") == 100L, "rare stratum capped at full retention")
    assert(math.abs(eq("big") - 167L) < 30, eq.toString)
    assert(math.abs(eq("mid") - 167L) < 30, eq.toString)
    // tail share rises monotonically as alpha falls
    assert(eq("big") < nat("big") && eq("rare") > nat("rare"))
  }

  test("temperatureMixEpochs upsamples rare strata and hits expected totals") {
    val df = ((0 until 1800).map(i => (i.toLong, "big")) ++
      (2000 until 2200).map(i => (i.toLong, "rare")))
      .toDF("doc_id", "stratum")
    // alpha=0: equal targets of 1000 each -> rare gets ~5 copies per row
    val out = Sampling.temperatureMixEpochs(df, "doc_id", "stratum", 0.0, 1.0)
      .groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(out("big") - 1000L) < 80, out.toString)
    assert(math.abs(out("rare") - 1000L) < 80, out.toString)
    // copy indexes are dense per key
    import org.apache.spark.sql.functions.{col, count, lit, max}
    val reps = Sampling.temperatureMixEpochs(df, "doc_id", "stratum", 0.0, 1.0)
      .filter(col("stratum") === "rare").groupBy("doc_id")
      .agg(max("rep").as("mx"), count(lit(1)).as("n"))
      .collect()
    reps.foreach(r => assert(r.getLong(1) == r.getLong(2), r.toString))
  }

  test("temperatureMix is deterministic and a subset of the input") {
    val df = (0 until 500).map(i => (i.toLong, if (i % 5 == 0) "a" else "b"))
      .toDF("doc_id", "stratum")
    val r1 = Sampling.temperatureMix(df, "doc_id", "stratum", 0.5, 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val r2 = Sampling.temperatureMix(df, "doc_id", "stratum", 0.5, 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r1 == r2)
    assert(r1.subsetOf((0L until 500L).toSet))
  }

  test("hash buckets decorrelate consecutive keys (no contiguous runs)") {
    val sample = Sampling.sampleByHash(ids, "doc_id", 0.25)
      .collect().map(_.getLong(0)).sorted
    // a contiguous id range would show long runs; mixed hashes should not
    val maxRun = sample.foldLeft((0, 0, -10L)) { case ((best, cur, prev), id) =>
      val c = if (id == prev + 1) cur + 1 else 1
      (math.max(best, c), c, id)
    }._1
    assert(maxRun < 10, s"suspicious contiguous run of $maxRun ids")
  }
}
