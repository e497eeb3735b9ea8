package graft.functions

import graft.SparkSpec
import graft.core.MinHash
import org.apache.spark.sql.functions._
import SketchFunctions._

class SketchFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("minhash_agg matches single-threaded core sketch") {
    val values = (1 to 500).map(i => s"val$i")
    val df = values.toDF("v").repartition(4) // force distributed merge
    val digest = df.agg(minhash_agg(col("v"))).collect()(0)
      .getAs[scala.collection.Seq[Long]](0).toArray
    assert(digest.sameElements(MinHash.sketch(values)))
  }

  test("minhash_agg skips nulls") {
    val df = Seq(Some("a"), None, Some("b"), None).toDF("v")
    val digest = df.agg(minhash_agg(col("v"))).collect()(0)
      .getAs[scala.collection.Seq[Long]](0).toArray
    assert(digest.sameElements(MinHash.sketch(Seq("a", "b"))))
  }

  test("minhash_words_agg tokenizes on whitespace") {
    val df = Seq("hello  world", "hello spark").toDF("v")
    val digest = df.agg(minhash_words_agg(col("v"))).collect()(0)
      .getAs[scala.collection.Seq[Long]](0).toArray
    assert(digest.sameElements(MinHash.sketch(Seq("hello", "world", "spark"))))
  }

  test("minhash_jaccard estimates overlap between grouped digests") {
    // group A: k1..k1000, group B: k501..k1500 => true J = 1/3
    val df = ((1 to 1000).map(i => ("a", s"k$i")) ++
              (501 to 1500).map(i => ("b", s"k$i"))).toDF("g", "v")
    val sketches = df.groupBy("g").agg(minhash_agg(col("v")).as("mh"))
    val j = sketches.as("x").join(sketches.as("y"), $"x.g" < $"y.g")
      .select(minhash_jaccard($"x.mh", $"y.mh")).collect()(0).getDouble(0)
    assert(math.abs(j - 1.0 / 3.0) < 0.15, s"J=$j")
  }

  test("xxhash32 column matches core") {
    val out = Seq("abc").toDF("v").select(xxhash32(col("v"))).collect()(0).getLong(0)
    assert(out == MinHash.xxhash32("abc"))
  }

  test("md5_low32 native expression matches the built-in md5/conv chain") {
    // the former implementation, kept verbatim as the equivalence oracle
    def oldChain(c: org.apache.spark.sql.Column) = {
      val h = md5(c)
      conv(concat(substring(h, 23, 2), substring(h, 21, 2),
        substring(h, 19, 2), substring(h, 17, 2)), 16, 10).cast("long")
    }
    val vals = Seq("", "a", "abc", "tok:icws:3:1", "héllo wörld",
      "0", "a" * 300) ++ (1 to 200).map(i => s"key$i:slot${i % 7}")
    val df = vals.toDF("v")
    val rows = df.select(md5_low32(col("v")).as("nw"),
      oldChain(col("v")).as("od")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    // null in, null out — same as the built-in chain
    val n = Seq[Option[String]](None).toDF("v")
      .select(md5_low32(col("v"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("minhash_bands: identical digests share all bands, disjoint share none") {
    val a = (1 to 300).map(i => ("a", s"v$i"))
    val b = (1 to 300).map(i => ("b", s"v$i"))     // same set
    val c = (1 to 300).map(i => ("c", s"w$i"))     // disjoint
    val sk = (a ++ b ++ c).toDF("g", "v").groupBy("g")
      .agg(minhash_agg(col("v")).as("mh"))
      .select(col("g"), explode(minhash_bands(col("mh"), 20)).as("band"))
    val ab = sk.as("x").join(sk.as("y"),
      $"x.band" === $"y.band" && $"x.g" < $"y.g")
      .groupBy($"x.g", $"y.g").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ab(("a", "b")) == 20L)
    assert(!ab.contains(("a", "c")) && !ab.contains(("b", "c")))
  }
}

class DateFunctionsSpec extends SparkSpec {
  import spark.implicits._
  import DateFunctions._

  test("lenient parse handles many formats") {
    val cases = Seq(
      "2021-03-05" -> "2021-03-05 00:00:00",
      "2021-03-05 14:30:00" -> "2021-03-05 14:30:00",
      "03/05/2021" -> "2021-03-05 00:00:00",
      "5-Mar-2021" -> "2021-03-05 00:00:00",
      "Mar 5, 2021" -> "2021-03-05 00:00:00",
      "20210305" -> "2021-03-05 00:00:00",
      "2021-03-05T14:30:00" -> "2021-03-05 14:30:00",
      "1614988800" -> "2021-03-06 00:00:00")
    val df = cases.map(_._1).toDF("s")
      .select(date_format(lenient_date_parse(col("s")), "yyyy-MM-dd HH:mm:ss").as("t"))
    val got = df.collect().map(_.getString(0))
    assert(got.sameElements(cases.map(_._2)), got.mkString(","))
  }

  test("non-dates yield null and is_parseable_date false") {
    val df = Seq("hello", "12.5", "", "not a date 2020").toDF("s")
    assert(df.select(lenient_date_parse(col("s"))).collect().forall(_.isNullAt(0)))
    assert(df.select(is_parseable_date(col("s"))).collect().forall(!_.getBoolean(0)))
  }
}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._
  import TextFunctions._

  test("token_count / punct_ratio / fingerprint basics") {
    val r = Seq("Hello, world! This is   a test.")
      .toDF("t")
      .select(token_count(col("t")), punct_ratio(col("t")), doc_fingerprint(col("t")),
        stopword_ratio(col("t")))
      .collect()(0)
    assert(r.getInt(0) == 6)
    assert(r.getDouble(1) > 0 && r.getDouble(1) < 0.2)
    assert(r.getString(2).length == 32)
    assert(r.getDouble(3) > 0.2) // "this","is","a" of 6
  }

  test("word_shingles and array_jaccard") {
    val df = Seq(("a b c d", "b c d e")).toDF("x", "y")
    val r = df.select(
      word_shingles(col("x"), 2).as("sx"),
      word_shingles(col("y"), 2).as("sy"))
      .select(array_jaccard(col("sx"), col("sy")))
      .collect()(0).getDouble(0)
    // bigrams x: {a b, b c, c d}; y: {b c, c d, d e}; J = 2/4
    assert(r == 0.5, s"J=$r")
  }

  test("char_shingles") {
    val r = Seq("abcd").toDF("t").select(char_shingles(col("t"), 3))
      .collect()(0).getAs[scala.collection.Seq[String]](0)
    assert(r == Seq("abc", "bcd"))
  }

  test("lang_id picks marker language; und for empty") {
    val df = Seq(
      "the cat is on the mat and the dog",
      "der hund ist nicht das problem und der test",
      "le chat est une belle chose que les gens",
      "el perro es una cosa que los gatos",
      "我是在的了有我是的",
      "").toDF("t").select(lang_id(col("t")))
    val got = df.collect().map(_.getString(0))
    assert(got.sameElements(Array("en", "de", "fr", "es", "zh", "und")), got.mkString(","))
  }
}
