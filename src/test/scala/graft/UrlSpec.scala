package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.Url

/** URL canonicalization + eTLD+1 (r14 verdict task #7) against
  * hand-picked URLs: case, default/explicit ports, path slash rules,
  * tracking-param removal + param sort, fragment drop, and the
  * bounded public-suffix grouping.
  */
class UrlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def canon(urls: String*): Seq[(String, String)] = {
    import spark.implicits._
    urls.toDF("url")
      .select(Url.canonicalize(col("url")).as("c"),
        Url.etld1(Url.host(col("url"))).as("e"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
  }

  test("scheme/host lowercase, default ports stripped, explicit kept") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/b").head._1 ===
      "https://www.example.com/A/b") // path case is NOT touched
    assert(canon("http://example.com:80/x").head._1 ===
      "http://example.com/x")
    assert(canon("http://example.com:8080/x").head._1 ===
      "http://example.com:8080/x") // non-default port survives
    assert(canon("https://example.com:80/x").head._1 ===
      "https://example.com:80/x") // 80 is NOT https' default
  }

  test("path: empty becomes /, trailing slashes stripped otherwise") {
    assert(canon("https://example.com").head._1 === "https://example.com/")
    assert(canon("https://example.com/").head._1 === "https://example.com/")
    assert(canon("https://example.com/a/b/").head._1 ===
      "https://example.com/a/b")
    assert(canon("https://example.com/a//").head._1 ===
      "https://example.com/a")
  }

  test("query: tracking params out, survivors sorted, empty set dropped") {
    assert(canon("https://e.com/p?utm_source=x&b=2&gclid=g&a=1&ref=tw")
      .head._1 === "https://e.com/p?a=1&b=2")
    assert(canon("https://e.com/p?b=2&a=1").head._1 ===
      "https://e.com/p?a=1&b=2") // order never splits identity
    assert(canon("https://e.com/p?utm_campaign=z&fbclid=f&msclkid=m")
      .head._1 === "https://e.com/p") // all tracking → no '?'
    // 'referrer=x' is NOT 'ref=' — the tracking match is anchored+exact
    assert(canon("https://e.com/p?referrer=x").head._1 ===
      "https://e.com/p?referrer=x")
  }

  test("fragments are dropped; empty query string is dropped") {
    assert(canon("https://e.com/p#sec-2").head._1 === "https://e.com/p")
    assert(canon("https://e.com/p?#x").head._1 === "https://e.com/p")
  }

  test("eTLD+1: multi-label suffixes take 3 labels, others 2") {
    assert(canon("https://news.sub.example.co.uk/x").head._2 ===
      "example.co.uk")
    assert(canon("https://deep.www.example.com/x").head._2 === "example.com")
    assert(canon("https://shop.site.com.au/x").head._2 === "site.com.au")
    assert(canon("https://example.org/x").head._2 === "example.org")
    // a bare registrable domain is its own eTLD+1
    assert(canon("https://example.co.uk/x").head._2 === "example.co.uk")
  }

  test("eTLD+1 real PSL: wildcard rules (*.ck) add a suffix label") {
    // *.ck makes zzz.ck a public suffix, so the registrable domain is
    // one label deeper than a plain ccTLD would give
    assert(canon("https://a.b.zzz.ck/x").head._2 === "b.zzz.ck")
    assert(canon("https://b.zzz.ck/x").head._2 === "b.zzz.ck")
    // a host that IS a wildcard-made public suffix has no registrable
    // domain — it comes back unchanged (the documented convention)
    assert(canon("https://zzz.ck/x").head._2 === "zzz.ck")
  }

  test("eTLD+1 real PSL: exception rules (!www.ck) beat the wildcard") {
    // !www.ck: the public suffix is ck, so www.ck itself registers
    assert(canon("https://www.ck/x").head._2 === "www.ck")
    assert(canon("https://a.www.ck/x").head._2 === "www.ck")
    assert(canon("https://deep.a.www.ck/x").head._2 === "www.ck")
    // the Japanese city exceptions under *.kawasaki.jp
    assert(canon("https://sub.city.kawasaki.jp/x").head._2 ===
      "city.kawasaki.jp")
    // while a non-excepted sibling stays under the wildcard
    assert(canon("https://sub.other.kawasaki.jp/x").head._2 ===
      "sub.other.kawasaki.jp")
  }

  test("eTLD+1 real PSL: deepest exact rules (4 labels) and defaults") {
    // pvt.k12.ma.us is a 4-label exact rule
    assert(canon("https://site.pvt.k12.ma.us/x").head._2 ===
      "site.pvt.k12.ma.us")
    assert(canon("https://deep.site.pvt.k12.ma.us/x").head._2 ===
      "site.pvt.k12.ma.us")
    // an unknown TLD falls to the implicit `*` default rule: 1-label
    // public suffix, 2-label registrable domain
    assert(canon("https://foo.bar.unknowntld/x").head._2 ===
      "bar.unknowntld")
    // a bare public suffix (exact rule) comes back unchanged
    assert(canon("https://co.uk/x").head._2 === "co.uk")
  }

  test("the pre-round-16 bounded-subset fixture keeps its shape") {
    import spark.implicits._
    val got = Seq("news.example.co.uk", "a.example.com", "example.org",
      "x.y.site.com.br").toDF("h")
      .select(Url.etld1Subset(col("h"))).collect().map(_.getString(0))
    assert(got.toSeq === Seq(
      "example.co.uk", "example.com", "example.org", "site.com.br"))
  }

  test("Psl parsed the bundled ICANN list, not a stub") {
    import graft.ext.Psl
    assert(Psl.exactRules.size > 7000, Psl.exactRules.size)
    assert(Psl.wildcardBases.contains("ck"))
    assert(Psl.exceptionRules.contains("www.ck"))
    assert(Psl.exactRules.contains("pvt.k12.ma.us"))
    // the three sets are disjoint encodings of distinct rule kinds
    assert((Psl.exactRules & Psl.exceptionRules).isEmpty)
  }

  test("synthUrl canonicalizes to one identity per content id") {
    import spark.implicits._
    // doc_ids 6 and 36: same host slot (%5==1), same path id (%97),
    // same id param (%50)? — pick a pair engineered to collide after
    // canonicalization: 6 and 306 share %5, %97 needs care; instead
    // assert the weaker invariant that canonicalization strips every
    // tracking param and fragment the generator injects
    val cs = (0L to 23L).toDF("doc_id")
      .select(Url.canonicalize(
        Url.synthUrl(col("doc_id"), lit("en"), lit("wiki"))).as("c"))
      .collect().map(_.getString(0))
    cs.foreach { c =>
      assert(!c.contains("utm_") && !c.contains("gclid") &&
        !c.contains("ref=tw") && !c.contains("#"), c)
      assert(c.startsWith("http://") || c.startsWith("https://"), c)
      assert(c.contains("?id=") && c.contains("&src=wiki"), c)
    }
    // default-port combos strip, non-default combos survive:
    assert(!cs(0).contains(":443")) // doc 0: https + :443 → stripped
    assert(!cs(1).contains(":80")) // doc 1: http + :80 → stripped
    assert(cs(2).contains(":8080")) // explicit non-default port
    assert(cs(4).contains(":443")) // doc 4: http + :443 is NOT default
    assert(cs(5).contains(":80")) // doc 5: https + :80 is NOT default
    // trailing slash from even ids is stripped: no path ends in '/'
    cs.foreach(c => assert(!c.split("\\?")(0).endsWith("/"), c))
  }
}
