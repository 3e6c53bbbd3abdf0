package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.sql.Timestamp

/** One row of the input transcript table (BASELINE.json input_hint):
  * (conv_id, turn_idx, role, text, tool, ts). */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** Deterministic synthetic transcript generator (FIXTURES.md): every field is
  * a pure function of (seed=42, conv_id, turn_idx) — resume-safe and
  * regenerable. Payload classes cycle through the constructs whose semantics
  * are pinned by reference fixtures; the turns-per-conversation distribution
  * is long-tailed (Zipf-ish) to exercise skew handling. */
object Synth {

  val Seed = 42L

  /** splitmix64 — stable across JVMs (no String.hashCode). */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def h(conv: Long, turn: Long, salt: Long): Long =
    mix(mix(mix(Seed + salt) ^ conv) ^ turn)
  private def pick[T](xs: IndexedSeq[T], k: Long): T =
    xs(((k % xs.length + xs.length) % xs.length).toInt)

  /** Long-tailed turns per conversation: avg ≈ 15, tail to ~500. */
  def turnsPerConv(c: Long): Int = {
    val base = 1 + (mix(c * 31 + 7) & 0x7fffffffL).toInt % 17
    val mid = if (c % 19 == 0) 60 else 0
    val tail = if (c % 191 == 0) 500 else 0
    base + mid + tail
  }

  // ------------------------------------------------------------- payloads
  private val Names = Vector("Alice Chen", "Bob Marley", "Carol Danvers",
    "David Oyelowo", "Eve Polastri", "Frank Ocean", "Grace Hopper", "Hank Pym")
  private val CjkBylines = Vector("記者王小明／台北報導", "撰文／李大華",
    "（林美麗／台北報導）", "【財訊快報張三丰】", "鉅亨網編輯陳小春")
  private val Sites = Vector("Example News", "Daily Graft", "Spark Times", "Turn Post")
  private val Domains = Vector("example.com", "dailygraft.org", "sparktimes.net", "turnpost.io")
  private val Words = Vector("analysis", "pipeline", "cluster", "vector",
    "window", "shuffle", "catalyst", "tungsten", "lineage", "manifest",
    "partition", "executor", "broadcast", "watermark", "checkpoint", "batch")
  private val Greek = Vector("δογ", "été", "报道一出", "データ", "résumé")

  private def sentence(k: Long, n: Int): String =
    (0 until n).map(i => pick(Words, h(k, i, 11))).mkString(" ") + "."

  private def isoDate(k: Long): String = {
    val y = 2015 + (h(k, 1, 13) & 0x7L).toInt
    val m = 1 + (h(k, 2, 13) & 0xBL).toInt % 12
    val d = 1 + (h(k, 3, 13) & 0x1fL).toInt % 28
    f"$y%04d-$m%02d-$d%02d"
  }

  /** Full article page modeled on page_for_testing.html. */
  private def pagePayload(c: Long, t: Long): String = {
    val k = h(c, t, 1)
    val title = s"${pick(Words, k).capitalize} ${pick(Words, k + 1)} report"
    s"""<html>
<body>
<h1>$title</h1>
<div id="content">
    <b class="title">${sentence(k + 2, 6)}</b>
    <p id="para">A paragraph with <a class="link" href="l${k % 7}.html">a link</a> and ${sentence(k + 3, 5)}
    <p>${sentence(k + 4, 8)}
    <blockquote>${sentence(k + 5, 5)}</blockquote>
    <div class="image_css" id="image1"><img src="img.jpg"></div>
    <p>${sentence(k + 6, 9)}
    <h2>${sentence(k + 7, 4)}</h2>
    <p>${sentence(k + 8, 7)}
</div>
<div class="begin_comments">
    <div id="comment1">
        <p>${sentence(k + 9, 4)}</p>
        <p>${sentence(k + 10, 3)} <a href="spam.html">${sentence(k + 11, 3)}</a>
    </div>
</div>
<div class="footer"><a href="f.html"><img src="f.jpg"></a>Footer text
</div>
</html>"""
  }

  /** Head-metadata-rich page: og tags, meta names, canonical, JSON-LD,
    * time@datetime, license anchor (meta_rich class). */
  private def metaRichPayload(c: Long, t: Long): String = {
    val k = h(c, t, 2)
    val author = pick(Names, k)
    val site = pick(Sites, k + 1)
    val dom = pick(Domains, k + 1)
    val date = isoDate(k)
    val title = s"${pick(Words, k + 2).capitalize} ${pick(Words, k + 3)} deep dive"
    val slug = pick(Words, k + 4)
    s"""<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="UTF-8">
<title>$title - $site</title>
<meta property="og:title" content="$title">
<meta property="og:description" content="${sentence(k + 5, 10)}">
<meta property="og:url" content="https://www.$dom/$slug/">
<meta property="og:site_name" content="$site">
<meta name="author" content="$author">
<meta name="keywords" content="${pick(Words, k + 6)}, ${pick(Words, k + 7)}">
<meta property="article:published_time" content="${date}T08:30:00Z">
<link rel="canonical" href="https://www.$dom/$slug/">
<script type="application/ld+json">{"@context":"https://schema.org","@type":"NewsArticle","headline":"$title","datePublished":"$date","author":[{"@type":"Person","name":"$author"}],"publisher":{"@type":"Organization","name":"$site"}}</script>
</head>
<body>
<article>
<h1 class="entry-title">$title</h1>
<p class="byline">By $author</p>
<time datetime="$date">$date</time>
<p>${sentence(k + 8, 20)}</p>
<p>${sentence(k + 9, 18)}</p>
<p>${sentence(k + 10, 16)}</p>
<footer><a rel="license" href="https://creativecommons.org/licenses/by-sa/4.0/">CC BY-SA</a></footer>
</article>
</body>
</html>"""
  }

  private def mediaPayload(c: Long, t: Long): String = {
    val k = h(c, t, 3)
    val vid = s"vid${(k & 0xffff).toHexString}"
    val mp3 = s"https://cdn.${pick(Domains, k)}/a${k % 100}.mp3"
    s"""<html><head><title>media page</title></head><body>
<div class="player"><audio src="$mp3"><source src="${mp3.replace(".mp3", "_hq.mp3")}"></audio></div>
<div class="embed"><iframe id="video" width="0" height="0" src="https://www.youtube.com/embed/$vid?autoplay=0"></iframe></div>
<p>${sentence(k + 1, 12)}</p>
<p>${sentence(k + 2, 9)}</p>
</body></html>"""
  }

  private val BylinePrefixes = Vector("By", "Par", "Door", "Von")

  // lowercase accents only: their mojibake second byte lands in latin-1's
  // printable 0xA0-0xBF band; uppercase accents (Å, Ó) would mojibake into
  // C1 control chars whose survival through HTML text nodes is not a
  // contract worth pinning here (FixEncoding unit tests cover them)
  private val AccentedNames = Vector(
    "José García", "Zoë Müller", "André Côté", "François Biarnès",
    "Renée Fournier", "Seán Brennan")

  /** UTF-8 bytes mis-decoded as latin-1 — the classic mojibake shape that
    * fix_encoding (FixEncoding) must repair downstream. */
  private def mojibake(s: String): String =
    new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)

  private def bylinePayload(c: Long, t: Long): String = {
    val k = h(c, t, 4)
    val by =
      if ((k & 1) == 0) {
        if (((k >>> 4) & 7L) == 0L)
          // mojibake sub-variant: the byline arrives double-read (UTF-8 as
          // latin-1); normalize_authors' fix_encoding pass must repair it
          s"By ${mojibake(pick(AccentedNames, k))} and ${pick(Names, k + 2)}"
        else
          // multilingual byline markers (en/fr strip, nl/de kept by the CRF)
          s"${pick(BylinePrefixes, k >>> 3)} ${pick(Names, k)}, ${pick(Names, k + 1)} and ${pick(Names, k + 2)}"
      } else pick(CjkBylines, k)
    s"""<html><body><div class="article">
<span class="author">$by</span>
<p>${sentence(k + 3, 14)}</p>
<p>${sentence(k + 4, 11)}</p>
</div></body></html>"""
  }

  private val Dows = Vector("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
  private val Mons = Vector("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  /** "Tue, 03 Jun 2008 09:05:07 GMT" from "2008-06-03". */
  private def rfc1123(iso: String): String = {
    val d = java.time.LocalDate.parse(iso)
    f"${Dows(d.getDayOfWeek.getValue - 1)}, ${d.getDayOfMonth}%02d ${Mons(d.getMonthValue - 1)} ${d.getYear} 09:05:07 GMT"
  }

  /** "03.06.2008" from "2008-06-03". */
  private def dotted(iso: String): String = {
    val d = java.time.LocalDate.parse(iso)
    f"${d.getDayOfMonth}%02d.${d.getMonthValue}%02d.${d.getYear}"
  }

  private val MonthFull = Vector("January", "February", "March", "April",
    "May", "June", "July", "August", "September", "October", "November",
    "December")

  /** Ordinal long forms: "June 3rd, 2008" / "3rd of June 2008". */
  private def ordinalDate(iso: String, dayFirst: Boolean): String = {
    val d = java.time.LocalDate.parse(iso)
    val day = d.getDayOfMonth
    val suf = if (day % 100 / 10 == 1) "th" else day % 10 match {
      case 1 => "st"; case 2 => "nd"; case 3 => "rd"; case _ => "th"
    }
    val mon = MonthFull(d.getMonthValue - 1)
    if (dayFirst) s"$day$suf of $mon ${d.getYear}"
    else s"$mon $day$suf, ${d.getYear}"
  }

  private val MonthsDe = Vector("Januar", "Februar", "März", "April", "Mai",
    "Juni", "Juli", "August", "September", "Oktober", "November", "Dezember")
  private val MonthsFr = Vector("janvier", "février", "mars", "avril", "mai",
    "juin", "juillet", "août", "septembre", "octobre", "novembre", "décembre")
  private val MonthsEs = Vector("enero", "febrero", "marzo", "abril", "mayo",
    "junio", "julio", "agosto", "septiembre", "octubre", "noviembre", "diciembre")
  private val MonthsDeAbbr = Vector("Jan.", "Feb.", "März", "Apr.", "Mai",
    "Juni", "Juli", "Aug.", "Sept.", "Okt.", "Nov.", "Dez.")
  private val MonthsFrAbbr = Vector("janv.", "févr.", "mars", "avr.", "mai",
    "juin", "juil.", "août", "sept.", "oct.", "nov.", "déc.")

  private val MonthsRu = Vector("января", "февраля", "марта", "апреля",
    "мая", "июня", "июля", "августа", "сентября", "октября", "ноября",
    "декабря")
  private val MonthsRuAbbr = Vector("янв.", "фев.", "мар.", "апр.", "мая",
    "июн.", "июл.", "авг.", "сен.", "окт.", "ноя.", "дек.")

  // round-5 locale wheel (tr/sv/da/no/cs/sk/ar — VERDICT r4 item 5)
  private val MonthsTr = Vector("Ocak", "Şubat", "Mart", "Nisan", "Mayıs",
    "Haziran", "Temmuz", "Ağustos", "Eylül", "Ekim", "Kasım", "Aralık")
  private val MonthsTrAscii = Vector("Ocak", "Subat", "Mart", "Nisan",
    "Mayis", "Haziran", "Temmuz", "Agustos", "Eylul", "Ekim", "Kasim",
    "Aralik")
  private val MonthsSv = Vector("januari", "februari", "mars", "april",
    "maj", "juni", "juli", "augusti", "september", "oktober", "november",
    "december")
  private val MonthsDa = Vector("januar", "februar", "marts", "april",
    "maj", "juni", "juli", "august", "september", "oktober", "november",
    "december")
  private val MonthsNo = Vector("januar", "februar", "mars", "april", "mai",
    "juni", "juli", "august", "september", "oktober", "november",
    "desember")
  private val MonthsCs = Vector("ledna", "února", "března", "dubna",
    "května", "června", "července", "srpna", "září", "října", "listopadu",
    "prosince")
  private val MonthsCsAscii = Vector("ledna", "unora", "brezna", "dubna",
    "kvetna", "cervna", "cervence", "srpna", "zari", "rijna", "listopadu",
    "prosince")
  private val MonthsSk = Vector("januára", "februára", "marca", "apríla",
    "mája", "júna", "júla", "augusta", "septembra", "októbra", "novembra",
    "decembra")
  private val MonthsSkAscii = Vector("januara", "februara", "marca",
    "aprila", "maja", "juna", "jula", "augusta", "septembra", "oktobra",
    "novembra", "decembra")
  private val MonthsAr = Vector("يناير", "فبراير", "مارس", "أبريل", "مايو",
    "يونيو", "يوليو", "أغسطس", "سبتمبر", "أكتوبر", "نوفمبر", "ديسمبر")
  private val MonthsArLev = Vector("كانون الثاني", "شباط", "آذار", "نيسان",
    "أيار", "حزيران", "تموز", "آب", "أيلول", "تشرين الأول", "تشرين الثاني",
    "كانون الأول")
  // round-5b wheel (id/hi/he; vi is a numbered-month form, no table)
  private val MonthsId = Vector("Januari", "Februari", "Maret", "April",
    "Mei", "Juni", "Juli", "Agustus", "September", "Oktober", "November",
    "Desember")
  private val MonthsHi = Vector("जनवरी", "फरवरी", "मार्च", "अप्रैल", "मई",
    "जून", "जुलाई", "अगस्त", "सितंबर", "अक्टूबर", "नवंबर", "दिसंबर")
  private val MonthsHe = Vector("בינואר", "בפברואר", "במרץ", "באפריל",
    "במאי", "ביוני", "ביולי", "באוגוסט", "בספטמבר", "באוקטובר", "בנובמבר",
    "בדצמבר")
  // round-6 wheel (th/fa Gregorian months + hijri calendar months)
  private val MonthsTh = Vector("มกราคม", "กุมภาพันธ์", "มีนาคม", "เมษายน",
    "พฤษภาคม", "มิถุนายน", "กรกฎาคม", "สิงหาคม", "กันยายน", "ตุลาคม",
    "พฤศจิกายน", "ธันวาคม")
  private val MonthsFa = Vector("ژانویه", "فوریه", "مارس", "آوریل", "مه",
    "ژوئن", "ژوئیه", "اوت", "سپتامبر", "اکتبر", "نوامبر", "دسامبر")
  private val MonthsHijri = Vector("محرم", "صفر", "ربيع الأول",
    "ربيع الآخر", "جمادى الأولى", "جمادى الآخرة", "رجب", "شعبان", "رمضان",
    "شوال", "ذو القعدة", "ذو الحجة")
  private val ArabicDigits = "٠١٢٣٤٥٦٧٨٩"
  private def arabicNum(n: Int): String =
    n.toString.map(c => ArabicDigits(c - '0'))

  /** Form-wheel notches 8-15: ru genitive/abbr, zh/ja 年月日, ko 년월일,
    * and timezone-offset ISO/RFC-1123 datetimes (literal wall-clock). */
  private def intlDate2(iso: String, form: Int, k: Long): String = {
    val d = java.time.LocalDate.parse(iso)
    val hh = ((k >>> 12) & 0x7fffL) % 24
    val mm = ((k >>> 27) & 0x7fffL) % 60
    form match {
      case 8  => s"${d.getDayOfMonth} ${MonthsRu(d.getMonthValue - 1)} ${d.getYear}"
      case 9  => s"${d.getDayOfMonth} ${MonthsRuAbbr(d.getMonthValue - 1)} ${d.getYear} г."
      case 10 => s"${d.getYear}年${d.getMonthValue}月${d.getDayOfMonth}日"
      case 11 => s"${d.getYear}년 ${d.getMonthValue}월 ${d.getDayOfMonth}일"
      case 12 => f"${iso}T$hh%02d:$mm%02d:00+02:00"
      case 13 => f"${iso}T$hh%02d:$mm%02d:07Z"
      case 14 => rfc1123(iso).stripSuffix("GMT") + "+0200"
      case _  => s"${d.getDayOfMonth} ${MonthsRu(d.getMonthValue - 1)} ${d.getYear} г."
    }
  }

  /** Form-wheel notches 16-31 (round 5): tr/sv/da/no/cs/sk/ar month-name
    * forms (16-23, 27-31) and extensive-mode free-text numeric forms
    * (24-26 — these are emitted as a visible <p>, not a <time> element,
    * so only findDate's extensive sweep can recover them). */
  private def intlDate3(iso: String, form: Int): String = {
    val d = java.time.LocalDate.parse(iso)
    val m = d.getMonthValue - 1
    val day = d.getDayOfMonth
    val y = d.getYear
    form match {
      case 16 => s"$day ${MonthsTr(m)} $y"
      case 17 => s"den $day ${MonthsSv(m)} $y"
      case 18 => s"$day. ${MonthsDa(m)} $y"
      case 19 => s"$day. ${MonthsCs(m)} $y"
      case 20 => s"$day. ${MonthsSk(m)} $y"
      case 21 => s"$day ${MonthsAr(m)} $y"
      case 22 => s"$day ${MonthsArLev(m)} $y"
      case 23 => s"$day. ${MonthsNo(m)} $y"
      case 24 => f"Publicerad $day%02d-${m + 1}%02d-$y" // dashed day-first
      case 25 => s"Opdateret $day/${m + 1}/$y" // slashed day-first
      case 26 => // US m/d/yyyy only when unambiguous (day > 12), else dashed
        if (day > 12) s"Posted ${m + 1}/$day/$y" else f"Posted $day%02d-${m + 1}%02d-$y"
      case 27 => s"$day. ${MonthsCsAscii(m)} $y"
      case 28 => s"$day. ${MonthsSkAscii(m)} $y"
      case 29 => s"$day ${MonthsSv(m)} $y"
      case 30 => s"$day ${MonthsTrAscii(m)} $y"
      case _  => s"$day. ${MonthsDa(m).take(3)}. $y"
    }
  }

  /** Form-wheel notches 32-63: (form & 7) selects the language — 0-3
    * id/vi/hi/he (round 5b, bit 44; formerly `& 3`), 4-7 th/fa/hijri
    * (round 6 — the widening re-deals the bit-2-set half of the 5b
    * notches, a datedUrl-confined digest drift). The hijri forms embed a
    * calendar-derived date (the wheel entropy drawn from the Gregorian
    * target's day-of-year), in ASCII digits (6) or Arabic-Indic digits
    * with the هـ era suffix (7). */
  private def intlDate4(iso: String, form: Int): String = {
    val d = java.time.LocalDate.parse(iso)
    val m = d.getMonthValue - 1
    val day = d.getDayOfMonth
    val y = d.getYear
    // a plausible hijri date derived from the same entropy: years
    // 1426-1457 AH convert to 2005-2035 CE, inside the validity ladder
    val hy = 1426 + ((y + d.getDayOfYear) % 32)
    val hm = 1 + (d.getMonthValue + day) % 12
    val hd = 1 + (day * 7 + m) % 29
    (form & 7) match {
      case 0 => s"$day ${MonthsId(m)} $y"
      case 1 => s"ngày $day tháng ${m + 1} năm $y"
      case 2 => s"$day ${MonthsHi(m)} $y"
      case 3 => s"$day ${MonthsHe(m)} $y"
      case 4 => s"$day ${MonthsTh(m)} $y"
      case 5 => s"$day ${MonthsFa(m)} $y"
      case 6 => s"$hd ${MonthsHijri(hm - 1)} $hy"
      case _ => s"${arabicNum(hd)} ${MonthsHijri(hm - 1)} ${arabicNum(hy)} هـ"
    }
  }

  /** de/fr/es day-first visible date forms (+ ISO datetime with clock). */
  private def intlDate(iso: String, lang: Int): String = {
    val d = java.time.LocalDate.parse(iso)
    lang match {
      case 0 => s"${d.getDayOfMonth}. ${MonthsDe(d.getMonthValue - 1)} ${d.getYear}"
      case 1 =>
        val day = if (d.getDayOfMonth == 1) "1er" else d.getDayOfMonth.toString
        s"$day ${MonthsFr(d.getMonthValue - 1)} ${d.getYear}"
      case 2 => s"${d.getDayOfMonth} de ${MonthsEs(d.getMonthValue - 1)} de ${d.getYear}"
      case 3 => s"${d.getDayOfMonth}. ${MonthsDeAbbr(d.getMonthValue - 1)} ${d.getYear}"
      case _ => s"${d.getDayOfMonth} ${MonthsFrAbbr(d.getMonthValue - 1)} ${d.getYear}"
    }
  }

  private def datedUrlPayload(c: Long, t: Long): String = {
    val k = h(c, t, 5)
    val dom = pick(Domains, k)
    val date = isoDate(k).replace("-", "/")
    // variants 0/1: the date arrives ONLY as a visible <time> element
    // (RFC-1123 / dd.MM.yyyy) and the canonical URL is undated — findDate
    // step 3 must parse the text form (a URL date would override it by the
    // pinned validate_date quirk, so it is removed in these variants)
    val variant = ((k >>> 7) & 3L).toInt
    val ordinalForm = ((k >>> 9) & 1L) == 1L
    // variant-0 form wheel, widened three times: bits 9-11 give forms 0-7
    // (0/1 keep the exact pre-widening shapes, 2-6 de/fr/es day-first, 7
    // ISO datetime with clock); bit 42 is the round-4 high bit selecting
    // forms 8-15 (ru/zh/ko + timezone-offset datetimes); bit 43 is the
    // round-5 high bit selecting forms 16-31 (tr/sv/da/no/cs/sk/ar +
    // extensive-mode free-text numerics) — each widening uses a
    // previously-unused bit, so lower forms keep their exact assignment
    // when it is 0
    val form0 = ((k >>> 9) & 7L).toInt + (((k >>> 42) & 1L).toInt << 3) +
      (((k >>> 43) & 1L).toInt << 4) + (((k >>> 44) & 1L).toInt << 5)
    val timeEl = variant match {
      case 0 => form0 match {
        case 0 => s"\n<time>${rfc1123(isoDate(k + 9))}</time>"
        case 1 => s"\n<time>${ordinalDate(isoDate(k + 9), dayFirst = false)}</time>"
        case 7 => s"\n<time>${isoDate(k + 9)} ${"%02d:%02d".format(
          ((k >>> 12) & 0x7fffL) % 24, ((k >>> 27) & 0x7fffL) % 60)}</time>"
        // 32-63 (bit 44): id/vi/hi/he day-first forms
        case f if f >= 32 => s"\n<time>${intlDate4(isoDate(k + 9), f)}</time>"
        // 24-26: free-text numeric date in a plain paragraph — only the
        // extensive-mode visible-text sweep can recover it
        case f if f >= 24 && f <= 26 => s"\n<p>${intlDate3(isoDate(k + 9), f)}</p>"
        case f if f >= 16 => s"\n<time>${intlDate3(isoDate(k + 9), f)}</time>"
        case f if f >= 8 => s"\n<time>${intlDate2(isoDate(k + 9), f, k)}</time>"
        case f => s"\n<time>${intlDate(isoDate(k + 9), f - 2)}</time>"
      }
      case 1 =>
        if (ordinalForm) s"\n<time>${ordinalDate(isoDate(k + 9), dayFirst = true)}</time>"
        else s"\n<time>${dotted(isoDate(k + 9))}</time>"
      case _ => ""
    }
    val path = if (variant <= 1) pick(Words, k + 1)
      else s"$date/${pick(Words, k + 1)}"
    s"""<html><head>
<link rel="canonical" href="https://www.$dom/$path/">
<title>dated page - ${pick(Sites, k)}</title>
</head><body>
<h1>${sentence(k + 2, 5)}</h1>$timeEl
<p>${sentence(k + 3, 13)}</p>
<p>${sentence(k + 4, 10)}</p>
</body></html>"""
  }

  private def unicodePayload(c: Long, t: Long): String = {
    val k = h(c, t, 6)
    s"""<div><div class="content ®">${pick(Greek, k)} ${sentence(k + 1, 6)}</div>
<div><a href="s.html">${pick(Greek, k + 2)}</a></div>
<p>${pick(Greek, k + 3)} ${sentence(k + 4, 7)}</p></div>"""
  }

  private def tinyPayload(c: Long, t: Long): String = {
    val k = h(c, t, 7)
    s"<html><p>${sentence(k, 4)}</p></html>"
  }

  private def blankPayload(c: Long, t: Long): String =
    """<html><head><script>var x = 1;</script></head><body><script>render();</script></body></html>"""

  private def markdownPayload(c: Long, t: Long): String = {
    val k = h(c, t, 8)
    s"# ${pick(Words, k).capitalize}\n\n${sentence(k + 1, 12)}\n\n- ${pick(Words, k + 2)}\n- ${pick(Words, k + 3)}"
  }

  private def toolOutputPayload(c: Long, t: Long): String = {
    val k = h(c, t, 9)
    if (((k >>> 5) & 3L) == 0L)
      // HTML-rendered tool output with table + list markup (the blockifier
      // must flow <td>/<li> text into blocks like the reference's lxml walk)
      s"""<html><body>
<h2>${pick(Words, k).capitalize} results</h2>
<table>
<tr><th>metric</th><th>value</th></tr>
<tr><td>${pick(Words, k + 2)}</td><td>${k & 0xffL}</td></tr>
<tr><td>${pick(Words, k + 3)}</td><td>${(k >>> 8) & 0xffL}</td></tr>
</table>
<ul>
<li>${sentence(k + 4, 5)}</li>
<li>${sentence(k + 5, 4)}</li>
<li>nested <ol><li>${pick(Words, k + 6)}</li><li>${pick(Words, k + 7)}</li></ol></li>
</ul>
<p>${sentence(k + 8, 10)}</p>
</body></html>"""
    else
      s"""{"status": "ok", "rows": ${(k & 0xffffL)}, "elapsed_ms": ${(k >>> 16) & 0xfffL}, "note": "${pick(Words, k + 1)}"}"""
  }

  /** All five og:* incl. og:author — exercises the examine_meta OpenGraph
    * short-circuit (the only path where og_properties survives). */
  private def ogFullPayload(c: Long, t: Long): String = {
    val k = h(c, t, 12)
    val dom = pick(Domains, k)
    s"""<html><head>
<meta property="og:title" content="${pick(Words, k).capitalize} og story">
<meta property="og:author" content="${pick(Names, k + 1)}">
<meta property="og:url" content="https://www.$dom/${pick(Words, k + 2)}/">
<meta property="og:description" content="${sentence(k + 3, 9)}">
<meta property="og:site_name" content="${pick(Sites, k + 4)}">
<meta property="og:image" content="https://www.$dom/i.jpg">
</head><body>
<h1>${pick(Words, k).capitalize} og story</h1>
<p>${sentence(k + 5, 15)}</p>
<p>${sentence(k + 6, 12)}</p>
</body></html>"""
  }

  /** Category/tag xpath containers + article:section fallback. */
  private def catstagsPayload(c: Long, t: Long): String = {
    val k = h(c, t, 13)
    val cat1 = pick(Words, k)
    val cat2 = pick(Words, k + 1)
    val tag1 = pick(Words, k + 2)
    s"""<html><head><title>tagged page</title>
<meta property="article:section" content="${pick(Words, k + 3)}">
</head><body>
<h1>tagged ${sentence(k + 4, 3)}</h1>
<div class="post-info">
  <a href="/category/$cat1/">${cat1.capitalize}</a>
  <a href="/category/$cat2/">${cat2.capitalize}</a>
</div>
<div class="tags"><a href="/tags/$tag1/">$tag1</a></div>
<p>${sentence(k + 5, 14)}</p>
</body></html>"""
  }

  /** Footer CC-text license fallback (strict TEXT_LICENSE_REGEX path) +
    * itemprop metas + twitter backup sitename + x-default alternate. */
  private def licenseItempropPayload(c: Long, t: Long): String = {
    val k = h(c, t, 14)
    val dom = pick(Domains, k)
    s"""<html><head><title>itemprop page</title>
<meta content="${pick(Names, k + 1)}" itemprop="author">
<meta content="${sentence(k + 2, 8)}" itemprop="description">
<meta content="${pick(Words, k + 3).capitalize} itemprop headline" itemprop="headline">
<meta name="twitter:site" content="@${pick(Words, k + 4)}">
<link rel="alternate" hreflang="x-default" href="https://www.$dom/${pick(Words, k + 5)}/">
</head><body>
<h1>${pick(Words, k + 3).capitalize} itemprop headline</h1>
<p>${sentence(k + 6, 16)}</p>
<div class="footer"><a href="https://example.org/about">cc by-nc-sa 3.0</a></div>
</body></html>"""
  }

  /** Verbatim reference fixture as a turn payload (FIXTURES.md §2: payload
    * classes include verbatim reference fixture documents). */
  private lazy val pageForTesting: String = {
    val in = getClass.getResourceAsStream("/graft/fixtures/page_for_testing.html")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** PDF turn payload (north rule "PDF/layout parse"): deterministic
    * one-page PDF carried in the string column via Latin-1. */
  private def pdfPayload(c: Long, t: Long): String = {
    val k = h(c, t, 15)
    val lines = Seq(
      s"${pick(Words, k).capitalize} ${pick(Words, k + 1)} quarterly report",
      sentence(k + 2, 10),
      sentence(k + 3, 8))
    new String(graft.dom.PdfText.synthPdf(lines), "ISO-8859-1")
  }

  /** Payload class cycled deterministically per (conv, turn). */
  def payload(c: Long, t: Long): String = {
    val cls = ((h(c, t, 0) & 0x7fffffffL) % 17).toInt
    cls match {
      case 0 | 1 => pagePayload(c, t)
      case 2 | 3 => metaRichPayload(c, t)
      case 4 => mediaPayload(c, t)
      case 5 => bylinePayload(c, t)
      case 6 => datedUrlPayload(c, t)
      case 7 => unicodePayload(c, t)
      case 8 => tinyPayload(c, t)
      case 9 => blankPayload(c, t)
      case 10 => markdownPayload(c, t)
      case 11 => toolOutputPayload(c, t)
      case 12 => ogFullPayload(c, t)
      case 13 => catstagsPayload(c, t)
      case 14 => licenseItempropPayload(c, t)
      case 15 => pageForTesting
      case 16 => pdfPayload(c, t)
    }
  }

  def role(c: Long, t: Long): String = {
    val cls = ((h(c, t, 0) & 0x7fffffffL) % 17).toInt
    if (cls == 11) "tool"
    else if (t == 0) "user"
    else if ((h(c, t, 10) & 3) == 0) "user"
    else "assistant"
  }

  def makeTurn(c: Long, t: Int): Turn = {
    val r = role(c, t)
    Turn(
      conv_id = f"conv-$c%08d",
      turn_idx = t,
      role = r,
      text = payload(c, t),
      tool = if (r == "tool") "run_query" else null,
      ts = new Timestamp(1700000000000L + c * 3600000L + t * 30000L))
  }

  /** Number of conversations for a scale factor: sf=0.1 ≈ 60k turns. */
  def convsForSf(sf: Double): Long = math.max(4, (sf * 40000).toLong)

  def turns(spark: SparkSession, sf: Double, partitions: Int = 32): DataFrame = {
    import spark.implicits._
    val n = convsForSf(sf)
    spark.range(0, n, 1, partitions)
      .flatMap(c => (0 until turnsPerConv(c)).iterator.map(t => makeTurn(c, t)))
      .toDF()
  }
}
