package graft.feats

import graft.blocks.Block
import java.nio.charset.StandardCharsets.UTF_8
import java.util.regex.Pattern

/** Per-block feature transformers, ported from behavior of the reference
  * kernels (extractnet/features/_kohlschuetter.pyx, _weninger.pyx,
  * _readability.cc, css.py). Production column layout (nn_models.py:16-21):
  * kohlschuetter(6) ++ weninger(2) ++ readability(1) ++ css(43) = 52,
  * first 9 are the GRU "input", last 43 the "css" projection input. */
object Features {

  // ------------------------------------------------------- kohlschuetter
  /** (ld[i-1], td[i-1], ld[i], td[i], ld[i+1], td[i+1]) zero-padded; needs
    * >= 3 blocks (features/_kohlschuetter.pyx:9-39). */
  def kohlschuetter(blocks: IndexedSeq[Block]): Array[Array[Double]] = {
    val n = blocks.length
    require(n >= 3, "at least 3 blocks are needed to make Kohlschuetter features")
    Array.tabulate(n) { i =>
      val prev = if (i > 0) blocks(i - 1) else null
      val next = if (i < n - 1) blocks(i + 1) else null
      Array(
        if (prev == null) 0.0 else prev.linkDensity,
        if (prev == null) 0.0 else prev.textDensity,
        blocks(i).linkDensity, blocks(i).textDensity,
        if (next == null) 0.0 else next.linkDensity,
        if (next == null) 0.0 else next.textDensity)
    }
  }

  // ------------------------------------------------------------ weninger
  /** scipy.ndimage.gaussian_filter 1-D, order 0, truncate=4.0, mode
    * 'reflect' ((d c b a | a b c d)). */
  def gaussianFilter1d(x: Array[Double], sigma: Double = 1.0): Array[Double] = {
    val radius = (4.0 * sigma + 0.5).toInt
    val w = Array.tabulate(2 * radius + 1)(i => math.exp(-0.5 * (i - radius) * (i - radius) / (sigma * sigma)))
    val wsum = w.sum
    var i = 0
    while (i < w.length) { w(i) /= wsum; i += 1 }
    val n = x.length
    val out = new Array[Double](n)
    def reflect(j0: Int): Int = {
      var j = j0
      while (j < 0 || j >= n) {
        if (j < 0) j = -j - 1
        else j = 2 * n - 1 - j
      }
      j
    }
    i = 0
    while (i < n) {
      var acc = 0.0
      var k = -radius
      while (k <= radius) { acc += w(k + radius) * x(reflect(i + k)); k += 1 }
      out(i) = acc
      i += 1
    }
    out
  }

  /** sx_sdx (features/_weninger.pyx:29-70): smoothed x and smoothed
    * abs-forward-mean-difference, alpha=3. */
  def sxSdx(x: Array[Double], sigma: Double = 1.0): Array[Array[Double]] = {
    val n = x.length
    val alpha = 3
    val dx = new Array[Double](n)
    var k = 0
    while (k < n - 1) {
      val start = k + 1
      val end = math.min(k + 1 + alpha, n)
      var s = 0.0
      var j = start
      while (j < end) { s += x(j); j += 1 }
      dx(k) = math.abs(s / (end - start) - x(k))
      k += 1
    }
    if (n >= 2) dx(n - 1) = math.abs(0.5 * (x(n - 1) + x(n - 2)) - x(n - 1))
    else if (n == 1) dx(0) = 0.0
    val sx = gaussianFilter1d(x, sigma)
    val sdx = gaussianFilter1d(dx, sigma)
    Array.tabulate(n)(i => Array(sx(i), sdx(i)))
  }

  /** content-to-tag ratio: UTF-8 byte length of text / max(tagcount, 1). */
  def weninger(blocks: IndexedSeq[Block], sigma: Double = 1.0): Array[Array[Double]] =
    sxSdx(blocks.map(b => graft.blocks.Blockifier.utf8Length(b.text).toDouble / math.max(b.tagcount, 1.0)).toArray, sigma)

  // --------------------------------------------------------- readability
  /** Literal port of _readability_features (features/_readability.cc:12-123),
    * including the assign-inside-ancestor-loop quirk (net effect preserved). */
  def readability(blocks: IndexedSeq[Block]): Array[Double] = {
    val n = blocks.length
    val features = new Array[Double](n)
    val scores = scala.collection.mutable.HashMap.empty[Int, Double]
    val ldNum = scala.collection.mutable.HashMap.empty[Int, Double]
    val ldDen = scala.collection.mutable.HashMap.empty[Int, Double]
    val valid = scala.collection.mutable.HashSet.empty[Int]

    var k = 0
    while (k < n) {
      val b = blocks(k)
      val textLen = graft.blocks.Blockifier.utf8Length(b.text).toDouble
      b.classWeights.foreach { case (id, w) => scores(id) = w.toDouble }
      if (b.ancestors.nonEmpty) {
        b.ancestors.foreach { a =>
          ldNum(a) = ldNum.getOrElse(a, 0.0) + b.linkDensity * textLen
          ldDen(a) = ldDen.getOrElse(a, 0.0) + textLen
        }
        if (textLen > 25 && (b.blockStartTag == "div" || b.blockStartTag == "p")) {
          val parent = b.ancestors.last
          scores(parent) = scores.getOrElse(parent, 0.0) +
            (1 + math.min((textLen / 100).toInt, 3))
          valid += parent
        }
      }
      k += 1
    }
    // scale by link density
    scores.keysIterator.toArray.foreach { id =>
      scores(id) = scores(id) * (1.0 - ldNum.getOrElse(id, 0.0) / math.max(ldDen.getOrElse(id, 0.0), 1.0))
    }
    var maxScore = -1.0e20
    var aValid = false
    scores.foreach { case (id, s) => if (valid.contains(id)) { aValid = true; if (s > maxScore) maxScore = s } }
    maxScore = math.max(maxScore, 1.0)
    if (!aValid) return features

    k = 0
    while (k < n) {
      val b = blocks(k)
      if (b.ancestors.nonEmpty) {
        var blockMax = -1e20
        var aValidAnc = false
        b.ancestors.foreach { id =>
          if (valid.contains(id)) {
            aValidAnc = true
            val s = scores.getOrElse(id, 0.0)
            if (s > blockMax) blockMax = s
          }
          features(k) = if (aValidAnc) math.max(blockMax / maxScore, 0.0) else 0.0
        }
      }
      k += 1
    }
    features
  }

  // ----------------------------------------------------------------- css
  private val AttributeTokens: Array[String] = Array(
    "menu", "widget", "nav", "top", "content", "breadcrumb", "block", "title",
    "button", "header", "ss", "post", "tag", "line", "foot", "para", "link",
    "published", "date", "modif", "article", "click", "body", "card", "timestamp",
    "comment", "meta", "alt", "time", "depth", "author", "tool", "keyword",
    "url", "name")
  private val AttributeTags: Array[String] = Array(
    "div", "h1", "h2", "h3", "h4", "h5", "h6", "html", "p", "span", "table", "author")
  private val NameAttributes = Pattern.compile("(author)|(name)|(publisher)|(contribute)|(label)")
  private val CtxAttributes = Pattern.compile("(By )|(記者)|(編輯)|(eporte)|(文)|( and )")
  private val CtxSymbol = Pattern.compile("[／]")
  private val DateLike = Pattern.compile("[0-9一二三四五六七八九月年日]+")
  private val SentenceSplits = Pattern.compile("[.。,，]+")

  // the five patterns above are pure existence tests over literals / char
  // classes; manual scans are semantics-identical and avoid the regex
  // engine in what profiling showed to be the single hottest frame of the
  // whole extraction (every block × every turn pays these five finds)
  private def hasDateLikeChar(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= '0' && c <= '9') || c == '一' || c == '二' || c == '三' ||
          c == '四' || c == '五' || c == '六' || c == '七' || c == '八' ||
          c == '九' || c == '月' || c == '年' || c == '日') return true
      i += 1
    }
    false
  }
  private def hasSentenceSplit(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.' || c == '。' || c == ',' || c == '，') return true
      i += 1
    }
    false
  }

  /** The 8 handcrafted CSS features (features/css.py:44-79). `css_text` is
    * "<id> <class> " (trailing space), lengths measured in chars. */
  def cssHandcrafted(b: Block): Array[Double] = {
    val cssText = b.cssId + " " + b.cssClass + " "
    val text = b.text
    val f = new Array[Double](8)
    if (cssText.contains("author") || cssText.contains("name") ||
        cssText.contains("publisher") || cssText.contains("contribute") ||
        cssText.contains("label")) f(0) = 1
    if (text.contains("By ") || text.contains("記者") || text.contains("編輯") ||
        text.contains("eporte") || text.indexOf('文') >= 0 ||
        text.contains(" and ")) f(1) = 1
    if (text.indexOf('／') >= 0) f(2) = 1
    val tagIdx = if (b.blockStartElementTag == null) -1 else AttributeTags.indexOf(b.blockStartElementTag)
    if (tagIdx >= 0) f(3) = tagIdx + 1
    f(4) = cssText.length
    if (hasDateLikeChar(text)) f(5) = 1
    if (hasSentenceSplit(text)) f(6) = 1
    f(7) = text.length
    f
  }

  /** CSS features (43 cols). In the production FeatureUnion the 35 class-token
    * flags are ALWAYS ZERO: the weninger/readability kernels bytes-cast the
    * shared Block objects in place, so css.py's str-keyed lookup
    * `'class' not in block.css` zero-fills them (verified quirk, SURVEY §2.3).
    * Set `degenerate=false` for the faithful standalone-transformer variant. */
  def css(blocks: IndexedSeq[Block], degenerate: Boolean = true): Array[Array[Double]] =
    blocks.map { b =>
      val flags = new Array[Double](AttributeTokens.length)
      if (!degenerate) {
        var i = 0
        while (i < AttributeTokens.length) {
          if (b.cssClass.contains(AttributeTokens(i))) flags(i) = 1
          i += 1
        }
      }
      flags ++ cssHandcrafted(b)
    }.toArray

  // ------------------------------------------------------------ assembly
  /** Production 52-column matrix in float64 (cast to float32 at the model
    * boundary by the caller). */
  def assemble(blocks: IndexedSeq[Block]): Array[Array[Double]] = {
    val k = kohlschuetter(blocks)
    val w = weninger(blocks)
    val r = readability(blocks)
    val c = css(blocks)
    Array.tabulate(blocks.length)(i => k(i) ++ w(i) ++ Array(r(i)) ++ c(i))
  }
}

/** StandardizedFeature equivalent (features/standardized.py): (x-μ)/σ per
  * column with a fitted scaler — training-time only in the reference;
  * provided as a plain column op for the operator inventory. */
object Standardize {
  def fit(rows: Array[Array[Double]]): (Array[Double], Array[Double]) = {
    val d = rows.head.length
    val mean = new Array[Double](d)
    val std = new Array[Double](d)
    rows.foreach(r => (0 until d).foreach(j => mean(j) += r(j)))
    (0 until d).foreach(j => mean(j) /= rows.length)
    rows.foreach(r => (0 until d).foreach(j => std(j) += (r(j) - mean(j)) * (r(j) - mean(j))))
    (0 until d).foreach(j => std(j) = math.sqrt(std(j) / rows.length))
    (mean, std)
  }
  def transform(rows: Array[Array[Double]], mean: Array[Double], std: Array[Double]): Array[Array[Double]] =
    rows.map(_.zipWithIndex.map { case (v, j) => if (std(j) == 0) 0.0 else (v - mean(j)) / std(j) })
}

/** ClusteredWeningerFeatures equivalent (features/weninger.py:49-107):
  * KMeans(4) over the per-document Weninger matrix, the cluster nearest the
  * origin snapped to (0,0); predict content=1 for any non-zero cluster.
  * Deterministic k-means++-free init (points sorted by norm, spread picks)
  * — training-support operator, not in the production inference path. */
object ClusteredWeninger {
  def fitPredict(blocks: IndexedSeq[graft.blocks.Block], k: Int = 4, maxIter: Int = 50): Array[Int] = {
    val x = Features.weninger(blocks)
    val n = x.length
    if (n == 0) return Array.empty
    val sorted = x.sortBy(p => p(0) * p(0) + p(1) * p(1))
    var centers = Array.tabulate(math.min(k, n))(i => sorted(i * (n - 1) / math.max(1, math.min(k, n) - 1)).clone())
    var iter = 0
    var moved = true
    val assign = new Array[Int](n)
    while (iter < maxIter && moved) {
      moved = false
      var i = 0
      while (i < n) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < centers.length) {
          val dx = x(i)(0) - centers(c)(0); val dy = x(i)(1) - centers(c)(1)
          val d = dx * dx + dy * dy
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        if (assign(i) != best) { assign(i) = best; moved = true }
        i += 1
      }
      centers = Array.tabulate(centers.length) { c =>
        val members = (0 until n).filter(assign(_) == c)
        if (members.isEmpty) centers(c)
        else Array(members.map(x(_)(0)).sum / members.size, members.map(x(_)(1)).sum / members.size)
      }
      iter += 1
    }
    // cluster closest to origin -> 0 (not-content); others -> 1
    val zero = centers.zipWithIndex.minBy { case (c, _) => c(0) * c(0) + c(1) * c(1) }._2
    assign.map(a => if (a == zero) 0 else 1)
  }
}
