package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // hot key 0 holds half the fact rows — the salting target
  private lazy val facts = ((1 to 500).map(_ => 0L) ++ (1 to 500).map(_.toLong % 7))
    .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "row_id")
  private lazy val dims = (0L to 6L).map(i => (i, s"d$i")).toDF("k", "attr")

  test("saltedJoin is row-identical to the plain join") {
    val plain = facts.join(dims, "k").select("row_id", "attr")
    val salted = Skew.saltedJoin(facts, dims, "k", factor = 8).select("row_id", "attr")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin left_outer keeps unmatched rows exactly once") {
    val extra = facts.unionByName(Seq((99L, -1)).toDF("k", "row_id"))
    val out = Skew.saltedJoin(extra, dims, "k", factor = 4, joinType = "left_outer")
    assert(out.filter(col("row_id") === -1).count() == 1)
    assert(out.filter(col("row_id") === -1).select("attr").first().isNullAt(0))
  }

  test("saltedJoin rejects right/full outer (exploded right would duplicate rows)") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(facts, dims, "k", joinType = "right_outer")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(facts, dims, "k", joinType = "full")
    }
  }

  test("keySkewProfile surfaces the hot key with its share") {
    val prof = Skew.keySkewProfile(facts, "k", topN = 3).collect()
    assert(prof.head.getLong(0) == 0L)
    assert(prof.head.getAs[Double]("share") > 0.5)
  }
}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1L to 10000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
    .toDF("id", "grp")

  test("deterministicSample: reproducible, partition-invariant, ~fraction") {
    val s1 = Sampling.deterministicSample(df, "id", 0.3).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.deterministicSample(df.repartition(13), "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2)                       // partitioning must not matter
    assert(math.abs(s1.size - 3000) < 200) // ~binomial tolerance
    val other = Sampling.deterministicSample(df, "id", 0.3, salt = "s1")
      .collect().map(_.getLong(0)).toSet
    assert(other != s1)                    // salt draws an independent sample
  }

  test("stratifiedSample applies per-stratum fractions") {
    val out = Sampling.stratifiedSample(df, "grp",
      fractions = Map("a" -> 0.5), defaultFraction = 0.05, idCol = "id")
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(out("a") - 2500) < 200)
    assert(math.abs(out("b") - 250) < 80)
  }

  test("temperatureMixture flattens head sources and hits the token budget") {
    // head source 10x the tail's tokens
    val docs = ((1L to 1000L).map(i => (i, "head", 100L)) ++
      (1001L to 1100L).map(i => (i, "tail", 100L))).toDF("id", "src", "tok")
    val out = Sampling.temperatureMixture(docs, "src", "tok", "id", targetFrac = 0.3)
    val rates = out.groupBy("src").agg(
        count(lit(1)).as("n"), first(col("mix_rate")).as("rate"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // τ=0.5: head weight sqrt(10)≈3.16x tail's, so per-TOKEN rate is
    // ~3.16x HIGHER for the tail (flattening), head rate lower than flat 0.3
    assert(rates("head")._2 < 0.3)
    assert(rates("tail")._2 > rates("head")._2 * 2.5)
    // total sampled tokens ~ 30% of 110k = 33k -> n_docs ~ 330
    val total = rates.values.map(_._1).sum
    assert(math.abs(total - 330) < 70, s"sampled $total docs, expected ~330")
    // partition-invariant and reproducible
    val again = Sampling.temperatureMixture(docs.repartition(7), "src", "tok", "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(again == out.collect().map(_.getLong(0)).toSet)
  }

  test("weightedSample: k per group, weight-biased, partition-invariant") {
    // one heavy row per group (w=100000) among 500 light rows (w=1)
    val rows = (1L to 1000L).map { i =>
      val grp = if (i % 2 == 0) "a" else "b"
      val w = if (i <= 2) 100000L else 1L
      (i, grp, w)
    }
    val wdf = rows.toDF("id", "grp", "w")
    val out = Sampling.weightedSample(wdf, "id", "w", k = 5, Seq("grp"))
    val byGrp = out.collect().groupBy(_.getString(1))
    assert(byGrp("a").length == 5 && byGrp("b").length == 5)
    // the 1e5-weight rows are near-certain picks (P(miss) < 1e-20)
    assert(byGrp("b").exists(_.getLong(0) == 1L))
    assert(byGrp("a").exists(_.getLong(0) == 2L))
    // partition-invariant draw
    val again = Sampling.weightedSample(wdf.repartition(7), "id", "w", k = 5, Seq("grp"))
      .collect().map(_.getLong(0)).toSet
    assert(again == out.collect().map(_.getLong(0)).toSet)
    // a different salt draws a different light-row set
    val other = Sampling.weightedSample(wdf, "id", "w", k = 5, Seq("grp"), salt = "ws1")
      .collect().map(_.getLong(0)).toSet
    assert(other != again)
    // ungrouped TakeOrdered path: exactly k rows, includes both heavies
    val flat = Sampling.weightedSample(wdf, "id", "w", k = 4)
      .collect().map(_.getLong(0)).toSet
    assert(flat.size == 4 && flat.contains(1L) && flat.contains(2L))
    // zero/negative weights never sampled
    val withZero = Sampling.weightedSample(
      wdf.withColumn("w", when(col("id") === 1L, lit(0L)).otherwise(col("w"))),
      "id", "w", k = 5, Seq("grp")).collect().map(_.getLong(0)).toSet
    assert(!withZero.contains(1L))
  }

  test("tokenBudgetPlan: exact counts, flattened weights, budget allocation") {
    val docs = ((1L to 100L).map(i => (i, "head", "en")) ++
      (101L to 104L).map(i => (i, "tail", "de")))
      .toDF("id", "src", "lang")
      .withColumn("text", lit("a b c d")) // 4 tokens each
    val out = Sampling.tokenBudgetPlan(docs, Seq("src", "lang"),
      graft.functions.TextFunctions.token_count(col("text")), budget = 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5), r.getLong(6))).toMap
    val (headTok, headShare, headW, headPlan) = out("head")
    val (tailTok, _, tailW, tailPlan) = out("tail")
    assert(headTok == 400L && tailTok == 16L)
    assert(math.abs(headShare - 400.0 / 416) < 1e-5)
    // τ=0.5 flattening: weight ratio = sqrt(400/16) = 5, not 25
    assert(math.abs(headW / tailW - 5.0) < 0.01)
    // allocation sums to ≤ budget and splits by weight
    assert(headPlan + tailPlan <= 1000L && math.abs(headPlan - 833) <= 1)
  }

  test("epochCappedPlan: cap binds on the tiny source, shortfall reported") {
    val docs = ((1L to 100L).map(i => (i, "head", "en")) ++
      (101L to 104L).map(i => (i, "tail", "de")))
      .toDF("id", "src", "lang")
      .withColumn("text", lit("a b c d")) // head: 400 tokens, tail: 16
    val out = Sampling.epochCappedPlan(docs, Seq("src", "lang"),
      graft.functions.TextFunctions.token_count(col("text")),
      budget = 1000L, maxEpochs = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(4), r.getLong(5), r.getDouble(6), r.getLong(7), r.getLong(8)))
      .toMap
    val (hPpm, hDes, hEp, hAct, hShort) = out("head")
    val (tPpm, tDes, tEp, tAct, tShort) = out("tail")
    // weights are the τ=0.5 ppm quantization: 5:1 head:tail
    assert(math.abs(hPpm.toDouble / tPpm - 5.0) < 0.01)
    // head is data-rich: desired ≈ 833 < 400·4 → uncapped, zero shortfall
    assert(hEp < 4.0 && hAct == hDes && hShort == 0L, out("head").toString)
    // tail desired ≈ 166 > 16·4 = 64 → cap binds at exactly 4 epochs
    assert(tEp == 4.0 && tAct == 64L && tShort == tDes - 64L && tShort > 0L,
      out("tail").toString)
  }

  test("epochCappedPlan: corpus-scale budget does not wrap the ppm products") {
    // budget·ppm ≈ 8.3e20 overflows Long (silent wrap pre-fix: desired
    // came out NEGATIVE); the DECIMAL(38,0) products stay exact
    val docs = ((1L to 100L).map(i => (i, "head")) ++
      (101L to 104L).map(i => (i, "tail")))
      .toDF("id", "src")
      .withColumn("text", lit("a b c d")) // head: 400 tokens, tail: 16
    val out = Sampling.epochCappedPlan(docs, Seq("src"),
      graft.functions.TextFunctions.token_count(col("text")),
      budget = 1000000000000000L, maxEpochs = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(6), r.getLong(7))).toMap
    val (hPpm, hDes, hAct, hShort) = out("head")
    // isq: head 20000000, tail 4000000 → ppm = 2e7·1e6 div 2.4e7
    assert(hPpm == 833333L, s"ppm $hPpm")
    assert(hDes == 833333L * 1000000000L, s"desired wrapped? $hDes")
    // cap binds everywhere at this budget: 4 epochs over 400 tokens
    assert(hAct == 1600L && hShort == hDes - 1600L && hShort > 0L)
  }
}

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Decontamination

  private lazy val bench = Seq((100L, "the secret eval question about spark internals"))
    .toDF("doc_id", "text")
  private lazy val corpus = Seq(
    (1L, "the secret eval question about spark internals appears verbatim here"),
    (2L, "a completely unrelated training document with fresh content"),
    (3L, "tiny doc")
  ).toDF("doc_id", "text")

  test("overlapReport flags verbatim leakage, not fresh docs") {
    val rep = Decontamination.overlapReport(corpus, bench, n = 3, threshold = 0.2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rep(1L).getAs[Boolean]("contaminated"))
    assert(rep(1L).getAs[Long]("n_overlap") >= 5)
    assert(!rep(2L).getAs[Boolean]("contaminated") && rep(2L).getAs[Long]("n_overlap") == 0)
    assert(!rep(3L).getAs[Boolean]("contaminated")) // whole-text shingle, no match
  }

  test("decontaminate drops only the flagged docs") {
    val kept = Decontamination.decontaminate(corpus, bench, n = 3, threshold = 0.2)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 3L))
  }

  test("semanticOverlapReport flags the cosine-duplicate, ties break to smallest bench id") {
    val benchE = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),
      (11L, Array(1.0f, 0.0f, 0.0f)), // identical to 10 — tie on cosine
      (12L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val corpusE = Seq(
      (1L, Array(2.0f, 0.0f, 0.0f)),  // parallel to bench 10/11 → cosine 1.0
      (2L, Array(0.0f, 0.0f, 3.0f)),  // orthogonal to all → cosine 0.0
      (3L, Array(1.0f, 1.0f, 0.0f))   // 45° to 10/11/12 → ~0.7071
    ).toDF("vec_id", "embedding")
    val rep = Decontamination.semanticOverlapReport(corpusE, benchE, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rep(1L).getAs[Boolean]("contaminated"))
    assert(rep(1L).getAs[Long]("best_match") == 10L) // not 11: smallest id wins the tie
    assert(rep(1L).getAs[Double]("best_cosine") == 1.0)
    assert(!rep(2L).getAs[Boolean]("contaminated"))
    assert(rep(2L).getAs[Double]("best_cosine") == 0.0)
    assert(!rep(3L).getAs[Boolean]("contaminated"))
    assert(math.abs(rep(3L).getAs[Double]("best_cosine") - 0.707107) < 1e-6)
  }
}

class RepetitionSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.TextAnalysis

  test("repetitionMetrics: duplicate-word and top-bigram fractions") {
    val docs = Seq(
      (1L, "spam spam spam spam"),            // all dup words, one bigram repeated
      (2L, "all words here are unique now"),  // no repetition
      (3L, "one")                             // degenerate single word
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Double]("dup_word_frac") == 0.75)   // 1 - 1/4
    assert(m(1L).getAs[Double]("top_bigram_frac") == 1.0)  // "spam spam" x3
    assert(m(2L).getAs[Double]("dup_word_frac") == 0.0)
    assert(m(2L).getAs[Double]("top_bigram_frac") == 0.2)  // 5 distinct of 5
    assert(m(3L).getAs[Long]("n_words") == 1)
    assert(m(3L).getAs[Double]("dup_word_frac") == 0.0)
  }
}

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin matches latest right row with ts <= left ts, per key") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (2L, ts("2024-01-01 12:00:00"), 100L),
      (3L, ts("2024-01-01 09:00:00"), 200L)   // before any right row
    ).toDF("id", "ts", "k")
    val right = Seq(
      (ts("2024-01-01 09:30:00"), 100L, "a"),
      (ts("2024-01-01 11:00:00"), 100L, "b"),
      (ts("2024-01-01 10:00:00"), 200L, "c")
    ).toDF("ts", "k", "payload")
    val out = AsOf.join(left, right, keyCols = Seq("k"), tsCol = "ts",
      payloadCols = Seq("payload")).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("asof_payload")).toMap
    assert(out(1L) == "a")   // 10:00 -> latest prior is 09:30
    assert(out(2L) == "b")   // 12:00 -> 11:00
    assert(out(3L) == null)  // nothing precedes 09:00 for key 200
  }

  test("asofJoin: equal timestamps count as matches (<=)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("id", "ts", "k")
    val right = Seq((ts("2024-01-01 10:00:00"), 1L, "same")).toDF("ts", "k", "payload")
    val out = AsOf.join(left, right, Seq("k"), "ts", Seq("payload")).collect()
    assert(out(0).getAs[String]("asof_payload") == "same")
  }

  test("asofJoin: a matched row's NULL payload is returned, not an older value") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, ts("2024-01-01 12:00:00"), 1L)).toDF("id", "ts", "k")
    val right = Seq(
      (ts("2024-01-01 09:00:00"), 1L, Some("old")),
      (ts("2024-01-01 11:00:00"), 1L, None: Option[String]) // the as-of match
    ).toDF("ts", "k", "payload")
    val out = AsOf.join(left, right, Seq("k"), "ts", Seq("payload")).collect()
    assert(out(0).getAs[String]("asof_payload") == null,
      "NULL payload of the matched row must win over an older non-null one")
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval equals the naive theta-join, without the cross product") {
    val points = (1 to 500).map(i => (i.toLong, i * 0.7)).toDF("pid", "v")
    val intervals = (1 to 40).map(i => (i.toLong, i * 8.0, i * 8.0 + 12.5))
      .toDF("iid", "lo", "hi")
    val fast = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 10.0)
      .select("pid", "iid")
    val naive = points.join(intervals,
      col("v") >= col("lo") && col("v") <= col("hi")).select("pid", "iid")
    assert(fast.count() == naive.count() && fast.count() > 0)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    // the physical join is an equi-join on the bucket, not a nested loop
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a cross product:\n$plan")
  }

  test("empty intervals side returns an empty result, like any join") {
    val points = Seq((1L, 10.0)).toDF("pid", "v")
    val intervals = Seq.empty[(Long, Double, Double)].toDF("iid", "lo", "hi")
    assert(RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 5.0).isEmpty)
  }

  test("boundary inclusivity: both endpoints match") {
    val points = Seq((1L, 10.0), (2L, 22.5), (3L, 22.5000001)).toDF("pid", "v")
    val intervals = Seq((9L, 10.0, 22.5)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 5.0)
      .select("pid").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L))
  }

  test("intervalOverlap equals the naive theta-join, each pair exactly once") {
    val left = (1 to 200).map(i => (i.toLong, i * 1.3, i * 1.3 + 7.0))
      .toDF("lid", "llo", "lhi")
    val right = (1 to 60).map(i => (i.toLong, i * 4.0, i * 4.0 + 11.0))
      .toDF("rid", "rlo", "rhi")
    val fast = RangeJoin.intervalOverlap(left, "llo", "lhi", right, "rlo", "rhi", 8.0)
      .select("lid", "rid")
    val naive = left.join(right,
      col("llo") <= col("rhi") && col("rlo") <= col("lhi")).select("lid", "rid")
    assert(fast.count() == naive.count() && fast.count() > 0)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
      "bucketized overlap join must emit exactly the theta-join pairs, no dups")
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"overlap join fell back to a cross product:\n$plan")
  }

  test("intervalOverlap: touching endpoints overlap; disjoint do not") {
    val left = Seq((1L, 0.0, 10.0), (2L, 30.0, 40.0)).toDF("lid", "llo", "lhi")
    val right = Seq((7L, 10.0, 20.0), (8L, 41.0, 50.0)).toDF("rid", "rlo", "rhi")
    val got = RangeJoin.intervalOverlap(left, "llo", "lhi", right, "rlo", "rhi", 5.0)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 7L)),
      "inclusive ends: [0,10]×[10,20] touch → overlap; [30,40]×[41,50] disjoint")
  }
}
