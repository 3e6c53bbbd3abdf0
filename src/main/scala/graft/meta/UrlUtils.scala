package graft.meta

import java.util.regex.Pattern
import java.time.LocalDateTime

/** Port of extractnet/metadata_extraction/url_utils.py. */
object UrlUtils {

  private val NetlocRe = Pattern.compile("(?<=\\w):(?:80|443|8000|8080|5000)")
  private val Typical = Pattern.compile("/+")
  private val DomainPrefix = Pattern.compile("^www[0-9]*\\.")

  private val MonthNames = "oct|jan|feb|mar|may|jun|jul|aug|sep|nov|dec|apr"
  /** URL_DATE regex ladder (url_utils.py:11-16), tried in order. */
  private val UrlDate: Seq[Pattern] = Seq(
    Pattern.compile("\\/(\\d{4})\\/(\\d{1,2}|" + MonthNames + ")\\/(?:(\\d{2})\\/)"),
    Pattern.compile("\\/(\\d{4})\\/(\\d{1,2}|" + MonthNames + ")\\/"),
    Pattern.compile("\\/(\\d{4})-(\\d{1,2}|" + MonthNames + ")\\/(?:(\\d{2})\\/)"),
    Pattern.compile("\\/(\\d{4})\\/"))

  private val SMonth = Vector("", "jan", "feb", "mar", "apr", "may", "jun",
    "jul", "aug", "sep", "oct", "nov", "dec")

  /** FUTURE_YEAR = current year + 1000 (url_utils.py:10) — deterministic
    * stand-in pinned to the fixture era's semantics. */
  private val FutureYear = 3022

  /** parse_url_date (url_utils.py:22-52): (year, month, day), -1 = absent. */
  def parseUrlDate(token: Seq[String]): (Int, Int, Int) = {
    var year = -1; var month = -1; var day = -1
    if (token.length == 3) {
      year = token(0).toInt
      day = token(2).toInt
      month = if (SMonth.contains(token(1))) SMonth.indexOf(token(1)) else token(1).toInt
    } else if (token.length == 2) {
      year = token(0).toInt
      month = if (SMonth.contains(token(1))) SMonth.indexOf(token(1)) else token(1).toInt
    } else {
      if (token(0).length == 4) year = token(0).toInt
      else if (token(0).length == 2) month = token(0).toInt
    }
    (year, month, day)
  }

  /** date_updater (url_utils.py:54-75), incl. the Feb/31 `day-1` quirk. */
  def dateUpdater(tok: (Int, Int, Int), date0: LocalDateTime): LocalDateTime = {
    var date = date0
    val (year, month, day) = tok
    if (year > 100 && date.getYear != year && year < FutureYear)
      date = date.withYear(year)
    if (month > 0 && month < 13 && date.getMonthValue != month) {
      // Python date.replace(month=) raises when the current day doesn't fit
      // the new month (then the reference passes); Java withMonth would
      // silently clamp the day instead — so check explicitly.
      val daysInNewMonth = java.time.YearMonth.of(date.getYear, month).lengthOfMonth()
      if (date.getDayOfMonth <= daysInNewMonth) date = date.withMonth(month)
    }
    if (day > 0 && day < 32 && day != date.getDayOfMonth) {
      try date = date.withDayOfMonth(day)
      catch { case _: Exception => date = date.withDayOfMonth(day - 1) }
    }
    date
  }

  /** validate_date (url_utils.py:77-91): fix a date using URL tokens. */
  def validateDate(url: String, date: LocalDateTime): LocalDateTime = {
    if (url == null || date == null) return date
    var groups: Seq[String] = null
    val it = UrlDate.iterator
    while (groups == null && it.hasNext) {
      val m = it.next().matcher(url)
      if (m.find()) {
        val gs = (1 to m.groupCount).map(m.group).filter(_ != null)
        groups = gs
      }
    }
    if (groups == null) date
    else dateUpdater(parseUrlDate(groups), date)
  }

  // defined BEFORE the suffix tables that reference it (val init order)
  private val UsStateCodes = Seq(
    "al", "ak", "az", "ar", "ca", "co", "ct", "de", "dc", "fl", "ga",
    "hi", "id", "il", "in", "ia", "ks", "ky", "la", "me", "md", "ma",
    "mi", "mn", "ms", "mo", "mt", "ne", "nv", "nh", "nj", "nm", "ny",
    "nc", "nd", "oh", "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx",
    "ut", "vt", "va", "wa", "wv", "wi", "wy")

  /** Two-level public suffixes: a sizeable subset of the (public) Public
    * Suffix List covering the common ccTLD second-level registries — the
    * same data the reference reaches through the `tld` library
    * (url_utils.py:93-102). Registrable domain = one label beyond the
    * longest matching suffix. */
  private val TwoLevelTlds: Set[String] = {
    // second-level registry labels shared by many ccTLDs
    val common = Seq("com", "net", "org", "gov", "edu", "mil", "ac", "co")
    val ccWithCommon = Seq(
      "ae", "ar", "au", "bd", "bh", "bn", "bo", "br", "bz", "cn", "co",
      "cy", "do", "ec", "eg", "et", "gh", "gt", "hk", "id", "il", "in",
      "jm", "jo", "ke", "kh", "kw", "lb", "lk", "ma", "mm", "mt", "mx",
      "my", "ng", "ni", "np", "nz", "om", "pa", "pe", "pg", "ph", "pk",
      "pl", "pr", "py", "qa", "sa", "sg", "sv", "th", "tr", "tw", "ua",
      "ug", "uk", "uy", "ve", "vn", "za", "zm", "zw")
    val generated = for (cc <- ccWithCommon; l <- common) yield s"$l.$cc"
    // registries with their own label sets (not the common pattern)
    val specific = Seq(
      // .jp / .kr / .tw style
      "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
      "gr.jp", "lg.jp",
      "co.kr", "or.kr", "ne.kr", "re.kr", "pe.kr", "go.kr", "ac.kr",
      "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr",
      "idv.tw", "game.tw", "ebiz.tw", "club.tw",
      // UK extras
      "me.uk", "ltd.uk", "plc.uk", "sch.uk", "nhs.uk", "police.uk",
      // Australia / NZ extras
      "id.au", "asn.au", "csiro.au", "act.au", "nsw.au", "qld.au",
      "vic.au", "wa.au", "sa.au", "tas.au", "nt.au",
      "geek.nz", "gen.nz", "kiwi.nz", "maori.nz", "school.nz", "cri.nz",
      "govt.nz", "iwi.nz", "parliament.nz", "health.nz",
      // Europe
      "gov.pl", "info.pl", "waw.pl", "edu.pl",
      "tm.fr", "asso.fr", "nom.fr", "gouv.fr",
      "co.at", "or.at", "ac.at", "gv.at",
      "co.it", "edu.it", "gov.it",
      "co.hu", "info.hu", "org.hu", "priv.hu",
      "com.de", "com.se", "co.dk", "co.no", "priv.no",
      "gov.gr", "edu.gr", "net.gr", "org.gr", "com.gr",
      "com.pt", "edu.pt", "gov.pt", "org.pt", "net.pt",
      "com.es", "nom.es", "org.es", "gob.es", "edu.es",
      "co.nl", "com.fr", "co.ua", "in.ua", "kiev.ua",
      "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
      "co.cz", "co.pl",
      // Americas
      "com.ag", "com.bs", "com.cu", "com.ht", "com.lc", "com.vc",
      "gob.mx", "edu.mx", "net.mx", "org.mx",
      "gov.br", "net.br", "org.br", "edu.br", "mil.br", "art.br",
      "blog.br", "dev.br", "eco.br", "esp.br", "etc.br", "far.br",
      "flog.br", "imb.br", "ind.br", "inf.br", "jor.br", "med.br",
      "mus.br", "not.br", "ntr.br", "odo.br", "ppg.br", "pro.br",
      "psc.br", "rec.br", "slg.br", "srv.br", "tmp.br", "tur.br",
      "tv.br", "vet.br", "wiki.br", "zlg.br",
      "gob.ar", "int.ar", "musica.ar", "tur.ar",
      "gob.bo", "gob.cl", "gob.do", "gob.ec", "gob.es", "gob.gt",
      "gob.hn", "gob.ni", "gob.pa", "gob.pe", "gob.sv", "gob.ve",
      "com.cl", "com.co", "nom.co",
      // Africa / Middle East / Asia extras
      "co.il", "muni.il", "idf.il", "k12.il",
      "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke", "sc.ke",
      "co.tz", "go.tz", "hotel.tz", "info.tz", "me.tz", "mobi.tz",
      "ne.tz", "or.tz", "sc.tz", "tv.tz",
      "co.zw", "co.zm", "co.mz", "co.ao", "co.bw", "co.ls", "co.na",
      "co.ug", "go.ug", "ne.ug", "or.ug", "sc.ug",
      "co.in", "firm.in", "gen.in", "ind.in", "nic.in", "res.in",
      "co.th", "go.th", "in.th", "mi.th", "or.th",
      "co.id", "go.id", "my.id", "or.id", "web.id", "sch.id", "biz.id",
      "com.np", "name.vn", "pro.vn", "info.vn", "health.vn",
      "gov.sg", "per.sg",
      "idv.hk", "inc.hk",
      "fin.ec", "info.ec", "med.ec", "pro.ec", "k12.ec",
      "name.ae", "pro.ae", "sch.ae",
      "med.sa", "pub.sa", "sch.sa",
      // round-5 growth toward the full list (all real PSL rules):
      // Costa Rica registry set
      "ac.cr", "co.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
      // Turkey beyond the common pattern
      "k12.tr", "bel.tr", "pol.tr", "av.tr", "dr.tr", "gen.tr",
      "web.tr", "name.tr", "info.tr", "biz.tr", "tv.tr", "tel.tr",
      // Ukraine city registries (PSL ua section)
      "kyiv.ua", "lviv.ua", "odesa.ua", "odessa.ua", "kharkiv.ua",
      "kharkov.ua", "dnipropetrovsk.ua", "donetsk.ua", "zaporizhzhe.ua",
      // round-6 growth (all real PSL rules):
      // Canadian provinces/territories + federal
      "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca", "ns.ca",
      "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca",
      "gc.ca",
      // Italian regions + major city/province registries
      "piemonte.it", "lombardia.it", "veneto.it", "lazio.it",
      "campania.it", "sicilia.it", "toscana.it", "puglia.it",
      "calabria.it", "sardegna.it", "liguria.it", "marche.it",
      "abruzzo.it", "umbria.it", "molise.it", "basilicata.it",
      "roma.it", "milano.it", "napoli.it", "torino.it", "firenze.it",
      "bologna.it", "genova.it", "palermo.it", "venezia.it",
      // French professional registries
      "avocat.fr", "aeroport.fr", "cci.fr", "chambagri.fr",
      "experts-comptables.fr", "greta.fr", "huissier-justice.fr",
      "medecin.fr", "notaires.fr", "pharmacien.fr", "port.fr",
      "veterinaire.fr",
      // Polish city registries
      "warszawa.pl", "krakow.pl", "wroclaw.pl", "poznan.pl", "lodz.pl",
      "gda.pl", "gdansk.pl", "katowice.pl", "lublin.pl", "szczecin.pl",
      "bialystok.pl", "torun.pl",
      // round-7 growth (all real PSL rules, added as EXPLICIT entries —
      // precision over the common-pattern generator, which over-generates
      // labels some registries never opened):
      // Central Asia / Caucasus
      "com.kz", "edu.kz", "gov.kz", "mil.kz", "net.kz", "org.kz",
      "co.uz", "com.uz", "net.uz", "org.uz",
      "org.kg", "net.kg", "com.kg", "edu.kg", "gov.kg", "mil.kg",
      "com.az", "net.az", "int.az", "gov.az", "org.az", "edu.az",
      "info.az", "pp.az", "mil.az", "name.az", "pro.az", "biz.az",
      "com.ge", "edu.ge", "gov.ge", "org.ge", "mil.ge", "net.ge", "pvt.ge",
      "com.am", "commune.am", "net.am", "org.am",
      "com.by", "gov.by", "mil.by", "of.by",
      "gov.mn", "edu.mn", "org.mn",
      // Baltics / Eastern Europe
      "com.lv", "edu.lv", "gov.lv", "org.lv", "mil.lv", "id.lv",
      "net.lv", "asn.lv", "conf.lv",
      "gov.lt",
      "com.ee", "edu.ee", "gov.ee", "riik.ee", "lib.ee", "med.ee",
      "org.ee", "pri.ee", "aip.ee", "fie.ee",
      "ac.ru", "edu.ru", "gov.ru", "int.ru", "mil.ru", "test.ru",
      // Balkans
      "co.rs", "org.rs", "edu.rs", "ac.rs", "gov.rs", "in.rs",
      "com.mk", "org.mk", "net.mk", "edu.mk", "gov.mk", "inf.mk", "name.mk",
      "com.ba", "edu.ba", "gov.ba", "mil.ba", "net.ba", "org.ba",
      "arts.ro", "com.ro", "firm.ro", "info.ro", "nom.ro", "nt.ro",
      "org.ro", "rec.ro", "store.ro", "tm.ro", "www.ro",
      "iz.hr", "from.hr", "name.hr", "com.hr",
      // Western / Northern Europe extras
      "gov.ie", "aland.fi", "int.pt", "publ.pt", "nome.pt",
      "net.is", "com.is", "edu.is", "gov.is", "org.is", "int.is",
      "biz.cy", "ekloges.cy", "ltd.cy", "name.cy", "press.cy",
      "pro.cy", "tm.cy", "parliament.cy",
      // Middle East / North Africa
      "ac.ir", "co.ir", "gov.ir", "id.ir", "net.ir", "org.ir", "sch.ir",
      "gov.iq", "edu.iq", "mil.iq", "com.iq", "org.iq", "net.iq",
      "com.tn", "gov.tn", "net.tn", "org.tn", "ind.tn", "info.tn",
      "perso.tn", "tourism.tn",
      "com.dz", "org.dz", "net.dz", "gov.dz", "edu.dz", "asso.dz",
      "pol.dz", "art.dz",
      "com.ly", "net.ly", "gov.ly", "plc.ly", "edu.ly", "sch.ly",
      "med.ly", "org.ly", "id.ly",
      // Sub-Saharan Africa
      "art.sn", "com.sn", "edu.sn", "gouv.sn", "org.sn", "perso.sn",
      "univ.sn",
      "ac.mw", "co.mw", "com.mw", "gov.mw", "org.mw",
      "sch.ng", "name.ng", "mobi.ng", "i.ng",
      "web.za", "nom.za", "alt.za", "school.za",
      // Macau + Korea regional registries
      "com.mo", "net.mo", "org.mo", "edu.mo", "gov.mo",
      "seoul.kr", "busan.kr", "daegu.kr", "incheon.kr", "gwangju.kr",
      "daejeon.kr", "ulsan.kr", "gyeonggi.kr", "gangwon.kr",
      "chungbuk.kr", "chungnam.kr", "jeonbuk.kr", "jeonnam.kr",
      "gyeongbuk.kr", "gyeongnam.kr", "jeju.kr",
      // Indonesia extras, Americas extras, Samoa, Trinidad
      "desa.id", "ponpes.id",
      "gub.uy", "coop.py",
      "co.tt", "com.tt", "org.tt", "net.tt", "biz.tt", "info.tt",
      "pro.tt", "name.tt", "edu.tt", "gov.tt",
      "com.ws", "net.ws", "org.ws", "gov.ws", "edu.ws",
      // round-7b growth (all real PSL rules; the conservative
      // com/edu/gov/net/org-style sets of registries the table still
      // mis-split — Central America, Levant, Indian Ocean, Caribbean,
      // Pacific, plus the .me/.lk/.ht long sets):
      "com.hn", "edu.hn", "org.hn", "net.hn", "mil.hn",
      "com.ps", "edu.ps", "gov.ps", "net.ps", "org.ps", "plo.ps", "sec.ps",
      "com.sy", "edu.sy", "gov.sy", "mil.sy", "net.sy", "org.sy",
      "com.ye", "edu.ye", "gov.ye", "net.ye", "mil.ye", "org.ye",
      "com.al", "edu.al", "gov.al", "mil.al", "net.al", "org.al",
      "co.me", "net.me", "org.me", "edu.me", "ac.me", "gov.me",
      "its.me", "priv.me",
      "com.gi", "ltd.gi", "gov.gi", "mod.gi", "edu.gi", "org.gi",
      "com.ky", "edu.ky", "gov.ky", "net.ky", "org.ky",
      "biz.bb", "co.bb", "com.bb", "edu.bb", "gov.bb", "info.bb",
      "net.bb", "org.bb", "store.bb", "tv.bb",
      "com.ai", "net.ai", "off.ai", "org.ai",
      "com.dm", "net.dm", "org.dm",
      "net.bs", "org.bs", "edu.bs", "gov.bs",
      "com.ms", "edu.ms", "gov.ms", "net.ms", "org.ms",
      "co.gy", "com.gy", "edu.gy", "gov.gy", "net.gy", "org.gy",
      "com.to", "gov.to", "net.to", "org.to", "edu.to", "mil.to",
      "com.vu", "edu.vu", "net.vu", "org.vu",
      "com.sb", "edu.sb", "gov.sb", "net.sb", "org.sb",
      "com.pf", "org.pf", "edu.pf",
      "asso.nc", "nom.nc",
      "com.mu", "net.mu", "org.mu", "gov.mu", "ac.mu", "co.mu", "or.mu",
      "org.mg", "nom.mg", "gov.mg", "prd.mg", "tm.mg", "edu.mg",
      "mil.mg", "com.mg", "co.mg",
      "ac.rw", "co.rw", "coop.rw", "gov.rw", "int.rw", "mil.rw", "net.rw",
      "org.ci", "or.ci", "com.ci", "co.ci", "edu.ci", "ed.ci", "ac.ci",
      "net.ci", "go.ci", "asso.ci", "int.ci", "presse.ci", "md.ci",
      "gouv.ci",
      "co.cm", "com.cm", "gov.cm", "net.cm",
      "com.sd", "net.sd", "org.sd", "edu.sd", "med.sd", "tv.sd",
      "gov.sd", "info.sd",
      "sch.lk", "ngo.lk", "soc.lk", "web.lk", "ltd.lk", "assn.lk",
      "grp.lk", "hotel.lk", "int.lk",
      "aero.mv", "biz.mv", "com.mv", "coop.mv", "edu.mv", "gov.mv",
      "info.mv", "int.mv", "mil.mv", "museum.mv", "name.mv", "net.mv",
      "org.mv", "pro.mv",
      "com.bt", "edu.bt", "gov.bt", "net.bt", "org.bt",
      "com.af", "edu.af", "gov.af", "net.af", "org.af",
      "int.la", "net.la", "info.la", "edu.la", "gov.la", "per.la",
      "com.la", "org.la",
      "tm.mc", "asso.mc",
      "nom.ad",
      "edu.cu", "org.cu", "net.cu", "gov.cu", "inf.cu",
      "shop.ht", "firm.ht", "info.ht", "adult.ht", "net.ht", "pro.ht",
      "org.ht", "med.ht", "art.ht", "coop.ht", "pol.ht", "asso.ht",
      "edu.ht", "rel.ht", "gouv.ht", "perso.ht")
    // China province second-levels (PSL cn section: 2-letter codes)
    val cnProvinces = Seq("ah", "bj", "cq", "fj", "gd", "gs", "gx", "gz",
      "ha", "hb", "he", "hi", "hl", "hn", "jl", "js", "jx", "ln", "nm",
      "nx", "qh", "sc", "sd", "sh", "sn", "sx", "tj", "xj", "xz", "yn",
      "zj").map(p => s"$p.cn")
    // US state registries (r6): every state code is a public suffix
    val usStates = UsStateCodes.map(st => s"$st.us")
    // Bulgaria (r7): every single letter and digit is a second-level
    // registry (a.bg .. z.bg, 0.bg .. 9.bg — the real PSL bg section)
    val bgSingles = (('a' to 'z') ++ ('0' to '9')).map(c => s"$c.bg")
    (generated ++ specific ++ cnProvinces ++ usStates ++ bgSingles).toSet
  }

  /** Multi-level public suffixes beyond the two-level table (PSL public
    * section: au state education registries, jp prefectures) plus the
    * POPULAR PRIVATE-SECTION suffixes — the `tld` library the reference
    * uses (url_utils.py:93-102) searches the private section by default,
    * so `foo.github.io` must yield `foo.github.io`, not `github.io`. */
  private val ExtraSuffixes: Set[String] = Set(
    // .au state education registries
    "act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au", "sa.edu.au",
    "tas.edu.au", "vic.edu.au", "wa.edu.au",
    // .jp prefecture registries (r5: all 47 prefectures — the full PSL set)
    "tokyo.jp", "osaka.jp", "kyoto.jp", "hokkaido.jp", "okinawa.jp",
    "aichi.jp", "fukuoka.jp", "hiroshima.jp", "nagano.jp", "niigata.jp",
    "saitama.jp", "chiba.jp", "kanagawa.jp", "hyogo.jp", "shizuoka.jp",
    "aomori.jp", "iwate.jp", "miyagi.jp", "akita.jp", "yamagata.jp",
    "fukushima.jp", "ibaraki.jp", "tochigi.jp", "gunma.jp", "toyama.jp",
    "ishikawa.jp", "fukui.jp", "yamanashi.jp", "gifu.jp", "mie.jp",
    "shiga.jp", "wakayama.jp", "nara.jp", "tottori.jp", "shimane.jp",
    "okayama.jp", "yamaguchi.jp", "tokushima.jp", "kagawa.jp", "ehime.jp",
    "kochi.jp", "saga.jp", "nagasaki.jp", "kumamoto.jp", "oita.jp",
    "miyazaki.jp", "kagoshima.jp",
    // private section: hosting / platform suffixes (high-traffic subset)
    "github.io", "gitlab.io", "wordpress.com", "tumblr.com", "weebly.com",
    "blogspot.com", "blogspot.co.uk", "blogspot.de", "blogspot.fr",
    "blogspot.it", "blogspot.nl", "blogspot.se", "blogspot.jp",
    "blogspot.in", "blogspot.mx", "blogspot.com.br", "blogspot.com.au",
    "herokuapp.com", "azurewebsites.net", "cloudfront.net",
    "elasticbeanstalk.com", "firebaseapp.com", "web.app", "netlify.app",
    "vercel.app", "pages.dev", "workers.dev", "s3.amazonaws.com",
    "appspot.com", "cloudfunctions.net", "glitch.me", "readthedocs.io",
    "neocities.org", "ngrok.io", "duckdns.org", "dyndns.org", "wixsite.com",
    // r5 growth: more high-traffic private-section rules
    "myshopify.com", "pythonanywhere.com", "surge.sh", "now.sh",
    "onrender.com", "fly.dev", "deno.dev", "gitbook.io", "bitbucket.io",
    "streamlit.app", "hf.space", "repl.co", "webflow.io", "ghost.io",
    "substack.com", "carrd.co", "notion.site",
    // r7 growth: more private-section platform suffixes
    "amplifyapp.com", "r2.dev", "framer.app", "framer.website") ++
    // r6: the us k12/community-college/library registries (third-level
    // under every state). NOT uniform across states: the real PSL removed
    // k12 for hi/nd/ri/sd/wv (Mozilla bugs 614565, 947705 — those states
    // run a single statewide domain) and lib for wv (bug 941670), so
    // those six rules must NOT be generated.
    UsStateCodes.flatMap { st =>
      val k12 = if (Set("hi", "nd", "ri", "sd", "wv")(st)) Nil
                else Seq(s"k12.$st.us")
      val lib = if (st == "wv") Nil else Seq(s"lib.$st.us")
      k12 ++ Seq(s"cc.$st.us") ++ lib
    } ++
    // r6: the blogspot ccTLD family beyond the r4 subset (PSL private)
    Seq("blogspot.ca", "blogspot.ch", "blogspot.cl", "blogspot.co.il",
      "blogspot.co.nz", "blogspot.co.za", "blogspot.cz", "blogspot.dk",
      "blogspot.es", "blogspot.fi", "blogspot.gr", "blogspot.hk",
      "blogspot.hu", "blogspot.ie", "blogspot.kr", "blogspot.no",
      "blogspot.pt", "blogspot.ro", "blogspot.ru", "blogspot.sg",
      "blogspot.tw")

  /** Wildcard rules `*.X`: EVERY label under X is itself a public suffix
    * (PSL wildcard TLDs; the jp city registries; *.sch.uk; EC2). */
  private val WildcardSuffixes: Set[String] = Set(
    "bd", "ck", "er", "fj", "gu", "jm", "kh", "mm", "np", "pg",
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp", "sapporo.jp",
    "sendai.jp", "yokohama.jp", "sch.uk", "compute.amazonaws.com")

  /** Exception rules `!X`: X is registrable even though a wildcard covers
    * it (PSL: www.ck and the jp city governments). */
  private val ExceptionRules: Set[String] = Set(
    "www.ck", "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp")

  /** Label count of the prevailing public suffix of `labels`, per the PSL
    * algorithm: exceptions beat everything (suffix = exception minus its
    * leftmost label), else the longest matching plain/wildcard rule, else
    * the implicit 1-label default rule. */
  private def publicSuffixLabels(labels: Array[String]): Int = {
    var k = labels.length
    while (k >= 1) {
      if (ExceptionRules.contains(labels.takeRight(k).mkString("."))) return k - 1
      k -= 1
    }
    var best = 1
    k = 2
    while (k <= labels.length) {
      val tail = labels.takeRight(k).mkString(".")
      if (TwoLevelTlds.contains(tail) || ExtraSuffixes.contains(tail)) best = k
      if (WildcardSuffixes.contains(labels.takeRight(k - 1).mkString("."))) best = k
      k += 1
    }
    best
  }

  /** extract_domain (url_utils.py:93-102): registrable domain, www-stripped
    * like the reference's DOMAIN_PREFIX sub on the fld. Suffix resolution
    * is a real PSL matcher (longest match, wildcard and exception rules,
    * private section included — the `tld` library's default) over an
    * embedded subset of the public list. */
  def extractDomain(url: String): String = {
    if (url == null) return null
    val hostStart = url.indexOf("://")
    if (hostStart < 0) return null
    val scheme = url.substring(0, hostStart).toLowerCase
    if (scheme != "http" && scheme != "https") return null
    var host = url.substring(hostStart + 3)
    val slash = host.indexWhere(c => c == '/' || c == '?' || c == '#')
    if (slash >= 0) host = host.substring(0, slash)
    val at = host.lastIndexOf('@')
    if (at >= 0) host = host.substring(at + 1)
    val colon = host.indexOf(':')
    if (colon >= 0) host = host.substring(0, colon)
    host = host.toLowerCase
    val labels = host.split("\\.").filter(_.nonEmpty)
    if (labels.length < 2) return null
    val ns = publicSuffixLabels(labels)
    // host == suffix keeps the old fixture-pinned behavior (return as-is);
    // otherwise registrable = suffix + one label
    val fld = labels.takeRight(math.min(labels.length, ns + 1)).mkString(".")
    DomainPrefix.matcher(fld).replaceFirst("").toLowerCase
  }

  final case class ParsedUrl(scheme: String, netloc: String, path: String,
      query: String, fragment: String) {
    def geturl: String = {
      val sb = new java.lang.StringBuilder
      if (scheme.nonEmpty) sb.append(scheme).append("://")
      sb.append(netloc).append(path)
      if (query.nonEmpty) sb.append('?').append(query)
      if (fragment.nonEmpty) sb.append('#').append(fragment)
      sb.toString
    }
    def port: Option[Int] = {
      val i = netloc.lastIndexOf(':')
      if (i >= 0 && i < netloc.length - 1 && netloc.substring(i + 1).forall(_.isDigit))
        Some(netloc.substring(i + 1).toInt)
      else None
    }
  }

  /** urllib.parse.urlparse-ish split. */
  def parseUrl(url: String): ParsedUrl = {
    var rest = url
    var fragment = ""
    val hash = rest.indexOf('#')
    if (hash >= 0) { fragment = rest.substring(hash + 1); rest = rest.substring(0, hash) }
    var scheme = ""
    val sc = rest.indexOf("://")
    if (sc >= 0) { scheme = rest.substring(0, sc).toLowerCase; rest = rest.substring(sc + 3) }
    else {
      val c = rest.indexOf(':')
      if (c > 0 && rest.substring(0, c).forall(ch => ch.isLetterOrDigit || ch == '+' || ch == '-' || ch == '.')
          && rest.substring(0, c).headOption.exists(_.isLetter) && !rest.substring(c + 1).startsWith("//")) {
        // scheme:opaque — treat rest as path with empty netloc
        scheme = rest.substring(0, c).toLowerCase
        return ParsedUrl(scheme, "", rest.substring(c + 1), "", fragment)
      }
    }
    var query = ""
    val q = rest.indexOf('?')
    if (q >= 0) { query = rest.substring(q + 1); rest = rest.substring(0, q) }
    val (netloc, path) =
      if (sc >= 0) {
        val slash = rest.indexOf('/')
        if (slash >= 0) (rest.substring(0, slash), rest.substring(slash)) else (rest, "")
      } else ("", rest)
    ParsedUrl(scheme, netloc, path, query, fragment)
  }

  /** url_is_valid (url_utils.py:107-124). */
  def urlIsValid(url: String): Option[ParsedUrl] = {
    if (url == null) return None
    val p = try parseUrl(url) catch { case _: Exception => return None }
    if (p.scheme != "http" && p.scheme != "https") return None
    if (p.netloc.length < 5 || (p.netloc.startsWith("www.") && p.netloc.length < 8)) return None
    Some(p)
  }

  /** url_normalizer (url_utils.py:126-154): port strip (80/443), path
    * collapse, lowercase scheme/netloc, query keys sorted. */
  def urlNormalizer(p0: ParsedUrl): String = {
    var p = p0
    if (p.port.exists(pt => pt == 80 || pt == 443))
      p = p.copy(netloc = NetlocRe.matcher(p.netloc).replaceAll(""))
    p = p.copy(
      scheme = p.scheme.toLowerCase,
      netloc = p.netloc.toLowerCase,
      path = Typical.matcher(p.path).replaceAll("/"))
    if (p.query.nonEmpty) {
      // parse_qs drops blank values; keys sorted; values re-encoded
      val pairs = p.query.split("&").toSeq.flatMap { kv =>
        if (kv.isEmpty) None
        else {
          val i = kv.indexOf('=')
          val (k, v) = if (i >= 0) (kv.substring(0, i), kv.substring(i + 1)) else (kv, "")
          if (v.isEmpty) None else Some((urlDecode(k), urlDecode(v)))
        }
      }
      val grouped = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
      pairs.foreach { case (k, v) => grouped(k) = grouped.getOrElse(k, Vector.empty) :+ v }
      val newQuery = grouped.keys.toSeq.sorted.flatMap { k =>
        grouped(k).map(v => urlEncode(k) + "=" + urlEncode(v))
      }.mkString("&")
      p = p.copy(query = newQuery)
    }
    p.geturl
  }

  private def urlDecode(s: String): String =
    try java.net.URLDecoder.decode(s, "UTF-8") catch { case _: Exception => s }
  private def urlEncode(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
}
