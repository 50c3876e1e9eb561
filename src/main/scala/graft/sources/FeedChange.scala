package graft.sources

/** Feed change detection for polled sources (S6 metadata,
  * `icalendar_calendar_v1.rb:712-739` `feed_changed?` + `_make_ics_request`
  * `:265-290`): skip re-processing when the feed is byte-identical, using
  * conditional-GET metadata and a content hash.
  *
  * Driver-side IO concern by design (SURVEY §7.3): executors never make the
  * conditional requests; this just decides whether a fetched feed enters the
  * expansion pipeline.
  */
object FeedChange {

  final case class FeedFingerprint(
      etag: Option[String],
      contentLength: Option[Long],
      contentMd5: Option[String])

  /** Headers for the conditional GET (If-None-Match). */
  def conditionalHeaders(prev: Option[FeedFingerprint]): Map[String, String] =
    prev.flatMap(_.etag).map(e => Map("If-None-Match" -> e)).getOrElse(Map.empty)

  /** Decide whether the feed changed. Order mirrors the reference: a 304
    * short-circuits; else differing length or differing body md5 means
    * changed; identical md5 means unchanged even without an etag. */
  def feedChanged(prev: Option[FeedFingerprint], status: Int,
                  current: FeedFingerprint): Boolean = {
    if (status == 304) return false
    prev match {
      case None => true
      case Some(p) =>
        if (p.contentLength.isDefined && current.contentLength.isDefined &&
          p.contentLength != current.contentLength) true
        else if (p.contentMd5.isDefined && current.contentMd5.isDefined)
          p.contentMd5 != current.contentMd5
        else true
    }
  }

  /** Streaming md5 of feed bytes (computed while parsing — one pass). */
  def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
}
