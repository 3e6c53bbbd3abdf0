package graft.meta

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.util.regex.Pattern
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Port of extractnet/metadata_extraction/json_ld.py.
  * `metadata` is the mutable dict threaded through the precedence chain. */
object JsonLd {

  private val mapper = new ObjectMapper()

  val JsonArticleSchema: Set[String] = Set("article", "backgroundnewsarticle",
    "blogposting", "medicalscholarlyarticle", "newsarticle",
    "opinionnewsarticle", "reportagenewsarticle", "scholarlyarticle",
    "socialmediaposting", "liveblogposting")
  val JsonPublisherSchema: Set[String] = Set("newsmediaorganization", "organization", "webpage", "website")

  val JsonMinify: Pattern = Pattern.compile("(\"(?:\\\\\"|[^\"])*\")|\\s")

  def minify(s: String): String = {
    val m = JsonMinify.matcher(s)
    val sb = new java.lang.StringBuilder
    while (m.find()) if (m.group(1) != null) sb.append(m.group(1))
    sb.toString
  }

  def parse(s: String): Option[JsonNode] =
    try Option(mapper.readTree(s)) catch { case _: Exception => None }

  private def str(n: JsonNode): String = if (n == null || !n.isTextual) null else n.asText

  /** extract_json (json_ld.py:17-104). Mutates `md` in place. */
  def extractJson(schema0: JsonNode, md: mutable.LinkedHashMap[String, Any]): Unit = {
    val schemaList: Seq[JsonNode] =
      if (schema0.isArray) schema0.elements.asScala.toSeq else Seq(schema0)

    schemaList.filter(n => n != null && !n.isNull).foreach { parentNode =>
      if (parentNode.isObject) {
        val ctx = parentNode.get("@context")
        val ctxOk = ctx != null && ctx.isTextual &&
          ctx.asText.takeRight(10).equalsIgnoreCase("schema.org")
        if (ctxOk) {
          val contents: Seq[JsonNode] =
            if (parentNode.has("@graph")) {
              val g = parentNode.get("@graph")
              if (g.isArray) g.elements.asScala.toSeq else Seq(g)
            } else if (parentNode.has("@type") && parentNode.get("@type").isTextual &&
                parentNode.get("@type").asText.toLowerCase.contains("liveblogposting") &&
                parentNode.has("liveBlogUpdate")) {
              val l = parentNode.get("liveBlogUpdate")
              if (l.isArray) l.elements.asScala.toSeq else Seq(l)
            } else schemaList

          contents.filter(n => n != null && !n.isNull && n.isObject).foreach { content =>
            // publisher
            val pub = content.get("publisher")
            if (pub != null && pub.isObject && pub.has("name"))
              md("sitename") = str(pub.get("name"))

            val typeNode = content.get("@type")
            val contentType: String =
              if (typeNode == null) null
              else if (typeNode.isArray && typeNode.size > 0 && typeNode.get(0).isTextual)
                typeNode.get(0).asText.toLowerCase
              else if (typeNode.isTextual) typeNode.asText.toLowerCase
              else null

            if (contentType != null) {
              if (JsonPublisherSchema.contains(contentType)) {
                Seq("name", "alternateName").foreach { candidate =>
                  val c = content.get(candidate)
                  if (c != null && !c.isNull && c.isTextual) {
                    val cur = md.get("sitename").orNull.asInstanceOf[String]
                    if (cur == null || (cur.length < c.asText.length && contentType != "webpage"))
                      md("sitename") = c.asText
                    val cur2 = md.get("sitename").orNull.asInstanceOf[String]
                    if (cur2 != null && cur2.startsWith("http") && !c.asText.startsWith("http"))
                      md("sitename") = c.asText
                  }
                }
              } else if (contentType == "person") {
                val nm = content.get("name")
                if (nm != null && nm.isTextual && !nm.asText.startsWith("http"))
                  md("name") = TextUtils.normalizeAuthors(
                    md.get("name").orNull.asInstanceOf[String], nm.asText)
              } else if (JsonArticleSchema.contains(contentType)) {
                // authors
                if (content.has("author")) {
                  var authorsNode = content.get("author")
                  if (authorsNode.isTextual) {
                    parse(authorsNode.asText) match {
                      case Some(parsed) => authorsNode = parsed
                      case None =>
                        md("name") = TextUtils.normalizeAuthors(
                          md.get("name").orNull.asInstanceOf[String], authorsNode.asText)
                        authorsNode = null
                    }
                  }
                  if (authorsNode != null) {
                    val authors =
                      if (authorsNode.isArray) authorsNode.elements.asScala.toSeq
                      else Seq(authorsNode)
                    authors.filter(_.isObject).foreach { author =>
                      val atype = author.get("@type")
                      if (atype == null || (atype.isTextual && atype.asText == "Person")) {
                        val nm = author.get("name")
                        if (nm != null && !nm.isNull) {
                          val authorName =
                            if (nm.isArray)
                              nm.elements.asScala.flatMap(e => Option(str(e))).mkString("; ")
                                .stripPrefix("; ").stripSuffix("; ")
                            else str(nm)
                          if (authorName != null)
                            md("name") = TextUtils.normalizeAuthors(
                              md.get("name").orNull.asInstanceOf[String], authorName)
                        } else if (author.has("givenName") && author.has("familyName")) {
                          val parts = Seq("givenName", "additionalName", "familyName")
                            .flatMap(k => Option(str(author.get(k))))
                          md("name") = TextUtils.normalizeAuthors(
                            md.get("name").orNull.asInstanceOf[String], parts.mkString(" "))
                        }
                      }
                    }
                  }
                }
                // category
                val cats = md.get("categories").orNull
                if ((cats == null || cats == Nil) && content.has("articleSection")) {
                  val as = content.get("articleSection")
                  if (as.isTextual) md("categories") = Seq(as.asText)
                  else if (as.isArray)
                    md("categories") = as.elements.asScala.flatMap(e => Option(str(e))).toSeq
                }
                // title
                if (md.get("title").orNull == null) {
                  if (content.has("name") && contentType == "article")
                    md("title") = str(content.get("name"))
                  else if (content.has("headline"))
                    md("title") = str(content.get("headline"))
                }
              }
            }
          }
        }
      }
    }
  }

  /** criteria_fulfilled (metadata.py:37-43). */
  def criteriaFulfilled(md: mutable.LinkedHashMap[String, Any]): Boolean = {
    val keys = Seq("author", "sitename", "categories", "title", "name")
    keys.forall(md.contains) && keys.forall { k =>
      md(k) match {
        case null => false
        case s: String => s.nonEmpty
        case seq: Seq[_] => seq.nonEmpty
        case _ => true
      }
    }
  }
}
