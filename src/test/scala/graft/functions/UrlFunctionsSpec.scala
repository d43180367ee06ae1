package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toSeq.toDF("u")
      .select(UrlFunctions.canonicalizeUrl(col("u"))).as[String]
      .collect().toSeq

  test("canonicalizeUrl: the documented contract, step by step") {
    assert(canon("HTTPS://WWW.Site.COM/Path?id=2#frag")
      == Seq("https://site.com/Path?id=2")) // path case preserved
    assert(canon("https://site.com/p/?utm_source=a&id=2&utm_campaign=b")
      == Seq("https://site.com/p?id=2"))
    // tracking-only query disappears entirely
    assert(canon("https://site.com/p?utm_source=a&ref=x")
      == Seq("https://site.com/p"))
    // variants of the same page collapse to one key
    val variants = canon(
      "HTTPS://WWW.Site.com/p/?utm_source=feed&id=7#s",
      "https://site.com/p?id=7&utm_campaign=x",
      "https://Site.COM/p?id=7")
    assert(variants.distinct == Seq("https://site.com/p?id=7"), variants)
    // www only strips at the authority, scheme-less passes through
    assert(canon("https://notwww.site.com/a")
      == Seq("https://notwww.site.com/a"))
    assert(canon("relative/path?ref=x") == Seq("relative/path"))
  }
}
