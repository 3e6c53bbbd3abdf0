package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL / domain-level corpus filtering — the UT1-blocklist stage every
  * web-scale curation pipeline (CCNet, RefinedWeb, FineWeb) runs before
  * any text heuristic: resolve each document's URL to its registrable
  * domain and drop documents whose domain sits on a blocklist.
  *
  * Domain resolution is the repo's real PSL matcher
  * ([[graft.meta.UrlUtils.extractDomain]] — longest-match with wildcard,
  * exception and private-section rules, the same semantics the reference
  * reaches through the `tld` library, url_utils.py:93-102), so blocklist
  * entries written as registrable domains ("badsite.co.uk") match every
  * host under them ("a.b.badsite.co.uk") and never over-match a sibling
  * registration.
  *
  * Scale shape: the corpus is map-only through the domain UDF (no
  * shuffle); the blocklist — even UT1's ~4M domains is ~100 MB — is
  * distinct'd and BROADCAST, so the whole stage adds zero exchanges on
  * the corpus side. For a blocklist past broadcast scale, pass
  * `broadcastList = false` to fall back to a shuffle join (the corpus
  * pays one exchange on the domain key — documented, not silent). */
object UrlFilter {

  /** Registrable domain of a URL via the PSL matcher; null for URLs the
    * reference's parser rejects (non-http(s) scheme, no host). */
  private val domainUdf = udf((u: String) => graft.meta.UrlUtils.extractDomain(u))

  /** Adds `domainCol` = registrable domain of `urlCol` (map-only). */
  def withDomain(df: DataFrame, urlCol: String = "url",
      domainCol: String = "domain"): DataFrame =
    df.withColumn(domainCol, domainUdf(col(urlCol)))

  /** Audit frame: every input row with its resolved `domain` and a
    * `blocked` verdict (no row silently dropped — the caller sees WHY).
    * Unresolvable URLs (null domain) are never blocked: a blocklist can
    * only speak about domains it names. `blocklist` must carry a
    * `domain` column of registrable domains. */
  def auditBlocklist(df: DataFrame, blocklist: DataFrame,
      urlCol: String = "url", broadcastList: Boolean = true): DataFrame = {
    val list = {
      val d = blocklist.select(col("domain").as("_blk_domain"))
        .where(col("_blk_domain").isNotNull).distinct()
        .withColumn("_blk", lit(true))
      if (broadcastList) broadcast(d) else d
    }
    withDomain(df, urlCol)
      .join(list, col("domain") === col("_blk_domain"), "left")
      .withColumn("blocked", coalesce(col("_blk"), lit(false)))
      .drop("_blk", "_blk_domain")
  }

  /** The corpus minus blocklisted documents: broadcast LEFT ANTI on the
    * resolved domain. Null domains have no match and are KEPT (same
    * policy as [[auditBlocklist]]). */
  def filterBlocklist(df: DataFrame, blocklist: DataFrame,
      urlCol: String = "url", broadcastList: Boolean = true): DataFrame = {
    val list = {
      val d = blocklist.select(col("domain")).where(col("domain").isNotNull)
        .distinct()
      if (broadcastList) broadcast(d) else d
    }
    withDomain(df, urlCol)
      .join(list, Seq("domain"), "left_anti")
      // withDomain REPLACES any caller-supplied "domain" column (the
      // resolved registrable domain is the operator's contract), so the
      // output must not emit it twice — a duplicate name breaks every
      // downstream select/join/write
      .select((df.columns.filterNot(_ == "domain") :+ "domain").map(col): _*)
  }
}
