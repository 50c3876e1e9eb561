package graft.sources

import graft.SparkSpec
import graft.sources.FeedChange.FeedFingerprint

class FeedChangeSpec extends SparkSpec {

  private def fp(etag: Option[String] = None, len: Option[Long] = None,
                 md5: Option[String] = None) = FeedFingerprint(etag, len, md5)

  test("304 means unchanged; first fetch always changed") {
    assert(!FeedChange.feedChanged(Some(fp(etag = Some("abc"))), 304, fp()))
    assert(FeedChange.feedChanged(None, 200, fp(md5 = Some("x"))))
  }

  test("length or md5 drift marks changed; identical md5 unchanged") {
    val prev = fp(len = Some(100L), md5 = Some("aaaa"))
    assert(FeedChange.feedChanged(Some(prev), 200, fp(len = Some(101L), md5 = Some("aaaa"))))
    assert(FeedChange.feedChanged(Some(prev), 200, fp(len = Some(100L), md5 = Some("bbbb"))))
    assert(!FeedChange.feedChanged(Some(prev), 200, fp(len = Some(100L), md5 = Some("aaaa"))))
  }

  test("conditional headers only with a prior etag") {
    assert(FeedChange.conditionalHeaders(None).isEmpty)
    assert(FeedChange.conditionalHeaders(Some(fp(etag = Some("W/\"v1\"")))) ==
      Map("If-None-Match" -> "W/\"v1\""))
  }

  test("md5Hex matches the jvm digest") {
    assert(FeedChange.md5Hex("hello world".getBytes) ==
      "5eb63bbbe01eeed093cb22bb8f5acdc3")
  }
}
