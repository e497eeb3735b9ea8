package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

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

  test("minhashNearDups finds near pair but not unrelated") {
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)), s"near pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
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
}
