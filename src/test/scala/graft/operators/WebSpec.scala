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
}
