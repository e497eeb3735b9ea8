package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WebSpec extends SparkSpec {
  import spark.implicits._

  private def parts(url: String): (String, String, String, String) = {
    val r = Web.withUrlParts(Seq(url).toDF("url"), "url")
      .select("url_scheme", "url_host", "url_path", "url_domain").first()
    (r.getString(0), r.getString(1), r.getString(2), r.getString(3))
  }

  test("URL decomposition: scheme, host, path, registered domain") {
    assert(parts("https://www.example.com/a/b?q=1#f") ==
      ("https", "www.example.com", "/a/b", "example.com"))
    assert(parts("http://sub.deep.example.co.uk:8080/x") ==
      ("http", "sub.deep.example.co.uk", "/x", "example.co.uk"))
    assert(parts("ftp://user:pw@files.example.org/pub") ==
      ("ftp", "files.example.org", "/pub", "example.org"))
    assert(parts("https://EXAMPLE.COM") == ("https", "example.com", null, "example.com"))
    assert(parts("https://localhost/admin") == ("https", "localhost", "/admin", "localhost"))
  }

  test("malformed URLs yield null parts") {
    Seq("not a url", "www.example.com/no-scheme", "http//missing.colon", "")
      .foreach { u =>
        val (s, h, p, d) = parts(u)
        assert(s == null && h == null && p == null && d == null, s"url: '$u'")
      }
  }

  test("per-domain cap keeps a deterministic subset of at most N per domain") {
    val docs = (1 to 300).map { i =>
      val host = s"www.site${i % 5}.com"
      (i.toLong, s"https://$host/doc/$i")
    }.toDF("id", "url")
    val withParts = Web.withUrlParts(docs, "url")
    val capped = Web.perDomainCap(withParts, maxPerDomain = 10, "id", "mix1")
    val perDomain = capped.groupBy("url_domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perDomain.values.forall(_ == 10) && perDomain.size == 5)
    // re-run selects the identical set (pure hash order)
    val again = Web.perDomainCap(withParts, maxPerDomain = 10, "id", "mix1")
      .select("id").as[Long].collect().sorted
    assert(capped.select("id").as[Long].collect().sorted.sameElements(again))
    // different salt selects a different set (overwhelmingly likely)
    val other = Web.perDomainCap(withParts, maxPerDomain = 10, "id", "mix2")
      .select("id").as[Long].collect().sorted
    assert(!again.sameElements(other))
  }

  test("malformed rows are dropped unless keepMalformed") {
    val docs = Seq((1L, "https://a.example.com/x"), (2L, "garbage"))
      .toDF("id", "url")
    val withParts = Web.withUrlParts(docs, "url")
    assert(Web.perDomainCap(withParts, 5, "id", "s").count() == 1)
    assert(Web.perDomainCap(withParts, 5, "id", "s", keepMalformed = true).count() == 2)
  }

  test("under-cap domains keep every row") {
    val docs = (1 to 7).map(i => (i.toLong, s"https://only.example.net/$i")).toDF("id", "url")
    val capped = Web.perDomainCap(Web.withUrlParts(docs, "url"), 100, "id", "s")
    assert(capped.count() == 7)
  }

  test("canonicalUrl: safe normalizations collapse surface variants") {
    val variants = Seq(
      "https://shop.example.com/item/7?a=1&b=2",
      "HTTPS://WWW.Shop.Example.COM:443/item/7?b=2&a=1",
      "https://shop.example.com/item/7/?a=1&utm_source=x&b=2#frag",
      "https://user@shop.example.com/item/7?fbclid=z&a=1&b=2")
    val out = variants.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
      .select(Web.canonicalUrl(col("url")).as("c")).as[String].collect()
    assert(out.toSet == Set("https://shop.example.com/item/7?a=1&b=2"))
    // root path and empty query stay minimal; malformed → null
    val edge = Seq((1L, "http://a.example.com/"), (2L, "http://a.example.com"),
      (3L, "not a url"))
      .toDF("id", "url")
      .select(Web.canonicalUrl(col("url")).as("c")).collect().map(r => Option(r.getString(0)))
    assert(edge(0) == Some("http://a.example.com") && edge(0) == edge(1))
    assert(edge(2).isEmpty)
  }

  test("urlDedup groups variants under one canonical key, min-id keeper") {
    val docs = Seq(
      (10L, "https://x.example.com/p?b=2&a=1"),
      (11L, "https://WWW.X.example.com/p/?a=1&b=2#f"),
      (12L, "https://x.example.com/q"))
      .toDF("id", "url")
    val out = Web.urlDedup(docs, "url", "id").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("https://x.example.com/p?a=1&b=2") == ((2L, 10L, 21L)))
    assert(out("https://x.example.com/q") == ((1L, 12L, 12L)))
  }
}
