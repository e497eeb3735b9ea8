package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val spec = Bloom.BloomSpec(mBits = 1024, k = 3)

  test("positions are deterministic and in [0, mBits)") {
    val vals = Seq("a", "b", "a little longer shingle text").toDF("v")
    val rows = vals.select(Bloom.positions(col("v"), spec).as("p"))
      .collect().map(_.getAs[scala.collection.Seq[Long]]("p"))
    assert(rows.forall(ps => ps.length == 3 && ps.forall(p => p >= 0 && p < 1024)))
    val again = vals.select(Bloom.positions(col("v"), spec).as("p"))
      .collect().map(_.getAs[scala.collection.Seq[Long]]("p"))
    assert(rows.toSeq == again.toSeq)
  }

  test("no false negatives: every built value passes mightContain") {
    val members = (1 to 200).map(i => s"member shingle $i").toDF("v")
    val bm = Bloom.build(members, "v", spec)
    val n = members.filter(Bloom.mightContain(col("v"), bm, spec)).count()
    assert(n == 200)
  }

  test("false-positive rate of non-members is small but bitmap-bounded") {
    val members = (1 to 200).map(i => s"member shingle $i").toDF("v")
    val bm = Bloom.build(members, "v", spec)
    val setBits = bm.map(java.lang.Long.bitCount).sum
    assert(setBits > 0 && setBits <= 600) // <= k * n, minus collisions
    val probes = (1 to 2000).map(i => s"absent probe $i").toDF("v")
    val fp = probes.filter(Bloom.mightContain(col("v"), bm, spec)).count()
    // load factor ~0.44 -> expected fp ~ 0.44^3 ~ 8.5%; generous bound
    assert(fp < 500, s"false-positive count $fp implausibly high")
  }

  test("toBitmapWords: distributed packed words equal the driver-side bitmap") {
    val members = (1 to 200).map(i => s"member shingle $i").toDF("v")
    val bits = Bloom.buildBits(members, "v", spec)
    val driver = Bloom.toBitmap(bits, spec)
    val words = Bloom.toBitmapWords(bits).collect()
      .map(r => r.getAs[Long]("word_idx").toInt -> r.getAs[Long]("word")).toMap
    // sparse relation: only non-zero words appear, each equal to the array slot
    assert(words.values.forall(_ != 0L))
    driver.zipWithIndex.foreach { case (w, i) =>
      assert(words.getOrElse(i, 0L) == w, s"word $i mismatch")
    }
  }

  test("empty filter rejects everything; spec validates its arguments") {
    val bm = new Array[Long](spec.words)
    val probes = Seq("x", "y").toDF("v")
    assert(probes.filter(Bloom.mightContain(col("v"), bm, spec)).count() == 0)
    intercept[IllegalArgumentException](Bloom.BloomSpec(mBits = 100))
    intercept[IllegalArgumentException](
      Bloom.mightContain(col("v"), new Array[Long](3), spec))
  }

  test("prefilterOverlap: exact columns match overlapReport; candidates bound overlap") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma completely different tail here"),
      (3L, "nothing shared with the benchmark at all ever")).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val exact = Decontamination.overlapReport(docs, bench, n = 3, threshold = 0.3)
      .select("id", "n_shingles", "n_overlap", "overlap_frac", "contaminated")
    val bloom = Bloom.prefilterOverlap(docs, bench, n = 3, threshold = 0.3, spec)
    val b = bloom.collect().map(r => r.getAs[Long]("id") -> r).toMap
    exact.collect().foreach { e =>
      val r = b(e.getAs[Long]("id"))
      assert(r.getAs[Long]("n_shingles") == e.getAs[Long]("n_shingles"))
      assert(r.getAs[Long]("n_overlap") == e.getAs[Long]("n_overlap"))
      assert(r.getAs[Boolean]("contaminated") == e.getAs[Boolean]("contaminated"))
      assert(r.getAs[Long]("n_candidates") >= r.getAs[Long]("n_overlap"))
      assert(r.getAs[Long]("n_candidates") <= r.getAs[Long]("n_shingles"))
    }
  }
}

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "shared header line\nunique first body\nshared footer line"),
    (2L, "shared header line\nunique second body\nshared footer line"),
    (3L, "Shared Header Line\nunique third body"), // case-normalized dup
    (4L, "shared header line")                     // loses its only line
  ).toDF("doc_id", "text")

  test("cross-document lines drop everywhere but the min-id owner, order kept") {
    val out = Dedup.lineDedup(docs).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    // doc 1 owns both shared lines (min id) and keeps everything
    assert(out(1L).getAs[String]("text") ==
      "shared header line\nunique first body\nshared footer line")
    assert(out(1L).getAs[Long]("n_kept") == 3 && out(1L).getAs[Int]("n_lines") == 3)
    // doc 2 loses header+footer, keeps its unique middle line
    assert(out(2L).getAs[String]("text") == "unique second body")
    assert(out(2L).getAs[Long]("n_kept") == 1)
    // doc 3's case-variant header normalizes to the shared key -> dropped
    assert(out(3L).getAs[String]("text") == "unique third body")
    // doc 4 keeps nothing but still appears
    assert(out(4L).getAs[String]("text") == "" && out(4L).getAs[Long]("n_kept") == 0)
  }

  test("maxDocsPerLine=2 tolerates two-document lines") {
    val out = Dedup.lineDedup(docs, maxDocsPerLine = 2).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("text")).toMap
    // footer appears in exactly 2 docs -> kept in both; header in 3 -> min-id only
    assert(out(2L) == "unique second body\nshared footer line")
    assert(out(3L) == "unique third body")
  }
}

/** Exact duplicated-substring spans (relational substring dedup). */
class DuplicateSpansSpec extends SparkSpec {
  import spark.implicits._

  private def spans(docs: org.apache.spark.sql.DataFrame, l: Int) =
    Dedup.duplicateSpans(docs, minTokens = l).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("start_tok"),
        r.getAs[Long]("end_tok"), r.getAs[Long]("span_tokens"))).sorted

  test("cross-doc shared run: only the non-canonical copy is spanned") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "x y a b c d z")).toDF("doc_id", "text")
    // shared 4-token run "a b c d": doc1 holds the canonical first grams
    assert(spans(docs, 3).toSeq == Seq((2L, 2L, 5L, 4L)))
  }

  test("within-doc repetition keeps exactly one copy") {
    val docs = Seq((7L, "p q r p q r p q r")).toDF("doc_id", "text")
    // grams at pos 0..2 are the canonical copies; pos 3..6 form one island
    // covering tokens 3..8 = the 2nd and 3rd "p q r"
    assert(spans(docs, 3).toSeq == Seq((7L, 3L, 8L, 6L)))
  }

  test("short docs and unique docs produce no spans") {
    val docs = Seq(
      (1L, "too short"),
      (2L, "all tokens here are completely unique today"),
      (3L, "other words without any overlap whatsoever now")).toDF("doc_id", "text")
    assert(spans(docs, 3).isEmpty)
  }
}

class RemoveDuplicateSpansSpec extends SparkSpec {
  import spark.implicits._

  test("removal keeps exactly one copy of every duplicated run") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "x y a b c d z"),
      (7L, "p q r p q r p q r")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, minTokens = 3).collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[String]("text") == "a b c d e") // canonical, untouched
    assert(out(1L).getAs[Long]("n_removed") == 0)
    assert(out(2L).getAs[String]("text") == "x y z")
    assert(out(2L).getAs[Long]("n_tokens") == 7 && out(2L).getAs[Long]("n_removed") == 4)
    assert(out(7L).getAs[String]("text") == "p q r")
    assert(out(7L).getAs[Long]("n_removed") == 6)
  }
}
