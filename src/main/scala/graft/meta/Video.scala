package graft.meta

import graft.dom.{HtmlParser, Node}

/** Port of get_advance_fields (extractnet/metadata_extraction/video.py:46-197)
  * minus the three network-dependent rules (aljazeera, NBC __NEXT_DATA__,
  * speechkit), which are excluded under zero egress (SURVEY.md §2.6). */
object Video {

  val YtEmbedUrl = "https://www.youtube.com/embed/"
  val YtVideo = "https://www.youtube.com/watch?v="
  val VoxEmbedUrl = "https://volume.vox-cdn.com/embed/"
  val CnbcEmbedUrl = "https://player.cnbc.com/p/gZWlPC/cnbc_global?playertype=synd&byGuid="
  val Blacklisted = Seq("www.googletagmanager.com")
  val ValidAudioExtension = Seq(".mp3", ".wav", ".aac", "flac", ".vox", "webm")

  final case class AdvanceFields(audio: Seq[String], video: String, content: String)

  /** bs4-style class match: exact attribute value or token membership.
    * For a single-token `want` the set-equality clause is subsumed by token
    * membership, so the common case is a no-allocation token scan; the
    * multi-token set comparison keeps the regex path. */
  private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 11.toChar

  private def containsToken(v: String, want: String): Boolean = {
    val n = v.length
    var i = 0
    while (i < n) {
      while (i < n && isAsciiWs(v.charAt(i))) i += 1
      var j = i
      while (j < n && !isAsciiWs(v.charAt(j))) j += 1
      if (j - i == want.length && v.regionMatches(i, want, 0, want.length)) return true
      i = j
    }
    false
  }

  private def classMatches(n: Node, want: String): Boolean =
    n.attr("class").exists { v =>
      if (v == want) true
      else if (!want.contains(' ')) containsToken(v, want)
      else v.split("\\s+").toSet == want.split("\\s+").toSet
    }

  def getAdvanceFields(rawHtml: String): AdvanceFields =
    getAdvanceFields(HtmlParser.parse(rawHtml), rawHtml)

  /** Shared-parse variant (the reference re-parses with bs4; one parse is
    * behavior-neutral — same DOM, same ladder). */
  def getAdvanceFields(tree: Node, rawHtml: String): AdvanceFields = {
    if (tree == null) return AdvanceFields(null, null, null)

    // ---- audio
    var audioUrls: Seq[String] = null
    tree.find(_.tag == "audio").foreach { audioTag =>
      audioTag.attr("src").foreach { src =>
        val isMpeg = audioTag.attr("type").contains("audio/mpeg")
        if (isMpeg || ValidAudioExtension.contains(src.takeRight(4))) {
          if (audioUrls == null) audioUrls = Seq.empty
          audioUrls = audioUrls :+ src
        }
      }
      audioTag.findAll(n => n.tag == "source" && n != audioTag).foreach { s =>
        if (audioUrls == null) audioUrls = Seq.empty
        s.attr("src").foreach(v => audioUrls = audioUrls :+ v)
      }
    }

    // ---- video ladder
    var videoUrl: String = null
    val ytIframe = tree.find(n => n.tag == "iframe" && n.attr("id").contains("video"))
    if (ytIframe.exists(_.attr("src").isDefined)) {
      val src = ytIframe.get.attr("src").get
      if (src.startsWith(YtEmbedUrl)) {
        val id = src.split("\\?", 2)(0).replace(YtEmbedUrl, "")
        videoUrl = YtVideo + id
      }
    } else if (tree.find(n => n.tag == "div" &&
        n.attr("data-test").contains("VideoPlaceHolder") &&
        classMatches(n, "PlaceHolder-wrapper")).isDefined) {
      val d = tree.find(n => n.tag == "div" &&
        n.attr("data-test").contains("VideoPlaceHolder") &&
        classMatches(n, "PlaceHolder-wrapper")).get
      d.attr("data-vilynx-id").foreach(id => videoUrl = CnbcEmbedUrl + id)
    } else if (tree.find(n => n.tag == "div" && classMatches(n, "main-article-body")).exists(
        _.find(c => c.tag == "div" && c.attr("id").contains("vdoContainer")).isDefined)) {
      // aljazeera rule needs the network — excluded; video stays null
    } else if (tree.find(n => n.tag == "div" && classMatches(n, "vxp-media__summary")).isDefined) {
      // BBC rule: data-playable JSON on the media player figure
      val mp = tree.find(n => n.tag == "div" && classMatches(n, "media-player-wrapper"))
      for {
        w <- mp
        fig <- w.find(_.tag == "figure")
        dp <- fig.attr("data-playable")
        node <- JsonLd.parse(dp)
        settings = node.get("settings")
        if settings != null && settings.has("externalEmbedUrl")
      } videoUrl = settings.get("externalEmbedUrl").asText
    } else if (tree.find(n => n.tag == "div" && classMatches(n, "c-video-embed volume-video")).isDefined) {
      tree.find(n => n.tag == "div" && classMatches(n, "c-video-embed volume-video")).get
        .attr("data-volume-uuid").foreach(u => videoUrl = VoxEmbedUrl + u)
    } else if (tree.find(n => n.tag == "meta" && n.attr("property").contains("og:video"))
        .exists(_.attr("content").exists(c => !c.contains("xml")))) {
      videoUrl = tree.find(n => n.tag == "meta" && n.attr("property").contains("og:video"))
        .get.attr("content").get
    } else if (rawHtml.contains(YtEmbedUrl)) {
      val idx = rawHtml.indexOf(YtEmbedUrl)
      val postfix = rawHtml.substring(idx, math.min(idx + 100, rawHtml.length))
      videoUrl = postfix.split("\"", 2)(0).replace("\\", "")
    } else if (tree.find(n => n.tag == "div" && n.attr("id").contains("art_video") &&
        classMatches(n, "YTplayer")).isDefined) {
      tree.find(n => n.tag == "div" && n.attr("id").contains("art_video") &&
        classMatches(n, "YTplayer")).get
        .attr("data-ytid").foreach(id => videoUrl = YtVideo + id)
    } else if (tree.find(n => n.tag == "script" && n.attr("id").contains("__NEXT_DATA__") &&
        n.attr("type").contains("application/json")).isDefined) {
      // NBC rule needs the network (akamai) — excluded; video stays null
    } else if (tree.find(n => n.tag == "video" && n.attr("id").contains("video_player"))
        .exists(_.find(_.tag == "source").isDefined)) {
      tree.find(n => n.tag == "video" && n.attr("id").contains("video_player")).get
        .find(_.tag == "source").get.attr("src").foreach(videoUrl = _)
    } else if (tree.find(n => n.tag == "video-player" && n.attr("video-type").contains("youtube")).isDefined) {
      tree.find(n => n.tag == "video-player" && n.attr("video-type").contains("youtube")).get
        .attr("source").foreach(videoUrl = _)
    }

    // sized-iframe override (video.py:170-174): runs unconditionally
    tree.find(n => n.tag == "iframe" && n.hasAttr("width") && n.hasAttr("height")).foreach { ifr =>
      if (ifr.attr("width").get != "0" && ifr.attr("height").get != "0")
        videoUrl = ifr.attr("content").orNull
    }

    if (videoUrl != null) {
      if (videoUrl.startsWith(YtEmbedUrl)) {
        val id = videoUrl.split("\\?", 2)(0).replace(YtEmbedUrl, "")
        videoUrl = YtVideo + id
      }
      if (videoUrl != null && videoUrl.startsWith("//")) videoUrl = "https:" + videoUrl
    }
    if (videoUrl != null && Blacklisted.exists(videoUrl.contains)) videoUrl = null

    AdvanceFields(audioUrls, videoUrl, null)
  }
}
