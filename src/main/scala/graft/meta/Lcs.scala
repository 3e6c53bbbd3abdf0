package graft.meta

/** Port of extractnet/lcs.pyx: LCS matrix + per-token inclusion check (the
  * block-labeling primitive behind the block_corrected fixtures). */
object Lcs {

  def lcsMatrix(x: IndexedSeq[String], y: IndexedSeq[String]): Array[Array[Int]] = {
    val m = x.length; val n = y.length
    require(math.min(m + 1, n + 1) < 65535)
    val c = Array.ofDim[Int](m + 1, n + 1)
    var i = 1
    while (i <= m) {
      var j = 1
      while (j <= n) {
        c(i)(j) =
          if (x(i - 1) == y(j - 1)) c(i - 1)(j - 1) + 1
          else math.max(c(i)(j - 1), c(i - 1)(j))
        j += 1
      }
      i += 1
    }
    c
  }

  /** check_inclusion (lcs.pyx:78-103): v(i) = x(i) ∈ LCS(x, y). */
  def checkInclusion(x: IndexedSeq[String], y: IndexedSeq[String]): Seq[Boolean] = {
    if (y.isEmpty) return Seq.fill(x.length)(false)
    val c = lcsMatrix(x, y)
    var i = x.length
    var j = y.length
    val ret = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    while (i > 0 || j > 0) {
      if (i > 0 && j > 0 && x(i - 1) == y(j - 1)) { ret += true; i -= 1; j -= 1 }
      else if (j > 0 && (i == 0 || c(i)(j - 1) >= c(i - 1)(j))) j -= 1
      else if (i > 0 && (j == 0 || c(i)(j - 1) < c(i - 1)(j))) { ret += false; i -= 1 }
    }
    ret.reverse.toSeq
  }
}
