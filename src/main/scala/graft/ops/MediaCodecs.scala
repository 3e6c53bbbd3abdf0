package graft.ops

/** From-scratch, dependency-free media codecs for the multimodal column
  * path: BMP (image), WAV/PCM (audio), and GVID (a trivial frame container
  * for the video frame-sample op). These replace the round-1 decode stub —
  * header parse, sample extraction and the error paths are real; exotic
  * variants (compressed BMP, float WAV, inter-frame codecs) are out of
  * scope by design and fail soft with None.
  *
  * All parsing is little-endian over byte arrays, no java.imageio / sound
  * APIs — executors need nothing on the classpath. */
object MediaCodecs {

  final case class MediaInfo(width: Int, height: Int, sampleRateHz: Int,
      durationMs: Int, nFrames: Int)

  // ------------------------------------------------------------- LE helpers
  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putI32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }

  // ------------------------------------------------------------------- BMP
  /** 24bpp uncompressed BITMAPINFOHEADER BMP. Pixels are (r,g,b) triples in
    * row-major top-down order; the file stores rows bottom-up, BGR, padded
    * to 4-byte row boundaries. */
  object Bmp {
    def encode(width: Int, height: Int, rgb: Array[(Int, Int, Int)]): Array[Byte] = {
      require(rgb.length == width * height, s"${rgb.length} != $width*$height")
      val rowBytes = width * 3
      val pad = (4 - rowBytes % 4) % 4
      val dataSize = (rowBytes + pad) * height
      val out = new Array[Byte](54 + dataSize)
      out(0) = 'B'; out(1) = 'M'
      putI32(out, 2, out.length); putI32(out, 10, 54)
      putI32(out, 14, 40); putI32(out, 18, width); putI32(out, 22, height)
      putU16(out, 26, 1); putU16(out, 28, 24)
      putI32(out, 30, 0); putI32(out, 34, dataSize)
      putI32(out, 38, 2835); putI32(out, 42, 2835)
      var o = 54
      var row = height - 1 // bottom-up
      while (row >= 0) {
        var x = 0
        while (x < width) {
          val (r, g, b) = rgb(row * width + x)
          out(o) = b.toByte; out(o + 1) = g.toByte; out(o + 2) = r.toByte
          o += 3; x += 1
        }
        o += pad
        row -= 1
      }
      out
    }

    /** Decode to (info, luma samples in [0,1], row-major top-down).
      * Rec.601 luma: (299 R + 587 G + 114 B) / 1000 / 255. */
    def decode(bytes: Array[Byte]): Option[(MediaInfo, Array[Float])] = {
      if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
      val dataOffset = i32(bytes, 10)
      val hdrSize = i32(bytes, 14)
      if (hdrSize < 40) return None
      val width = i32(bytes, 18)
      val heightRaw = i32(bytes, 22)
      val bottomUp = heightRaw > 0
      val height = math.abs(heightRaw)
      val bpp = u16(bytes, 28)
      val compression = i32(bytes, 30)
      if (bpp != 24 || compression != 0 || width <= 0 || height == 0) return None
      // adversarial-header guards: a negative dataOffset or an int-overflowed
      // width*3 / width*height would index out of (or allocate past) bounds
      if (dataOffset < 54 || heightRaw == Int.MinValue) return None
      val rowBytes = width.toLong * 3
      val stride = rowBytes + (4 - rowBytes % 4) % 4
      if (dataOffset.toLong + stride * height > bytes.length) return None
      if (width.toLong * height > Int.MaxValue / 8) return None // cap pixels
      val strideI = stride.toInt // <= bytes.length after the check above
      val luma = new Array[Float](width * height)
      var y = 0
      while (y < height) {
        val srcRow = if (bottomUp) height - 1 - y else y
        var x = 0
        val base = dataOffset + srcRow * strideI
        while (x < width) {
          val bl = bytes(base + x * 3) & 0xff
          val g = bytes(base + x * 3 + 1) & 0xff
          val r = bytes(base + x * 3 + 2) & 0xff
          luma(y * width + x) = (299 * r + 587 * g + 114 * bl).toFloat / (1000f * 255f)
          x += 1
        }
        y += 1
      }
      Some((MediaInfo(width, height, 0, 0, 1), luma))
    }
  }

  // ------------------------------------------------------------------- WAV
  /** RIFF/WAVE, PCM 16-bit mono. */
  object Wav {
    def encode(sampleRateHz: Int, samples: Array[Short]): Array[Byte] = {
      val dataSize = samples.length * 2
      val out = new Array[Byte](44 + dataSize)
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      putI32(out, 4, 36 + dataSize)
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      putI32(out, 16, 16); putU16(out, 20, 1); putU16(out, 22, 1)
      putI32(out, 24, sampleRateHz); putI32(out, 28, sampleRateHz * 2)
      putU16(out, 32, 2); putU16(out, 34, 16)
      out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
      putI32(out, 40, dataSize)
      var i = 0
      while (i < samples.length) { putU16(out, 44 + i * 2, samples(i) & 0xffff); i += 1 }
      out
    }

    /** Decode to (info, samples normalized to [0,1]) by chunk walk —
      * tolerates extra chunks (LIST, fact, ...) before fmt/data. */
    def decode(bytes: Array[Byte]): Option[(MediaInfo, Array[Float])] = {
      if (bytes.length < 44) return None
      if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
          bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E') return None
      var o = 12
      var sampleRate = 0; var channels = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      while (o + 8 <= bytes.length) {
        val id = new String(bytes, o, 4, "US-ASCII")
        val size = i32(bytes, o + 4)
        if (size < 0 || o + 8 + size > bytes.length) return None
        id match {
          case "fmt " if size >= 16 =>
            val fmt = u16(bytes, o + 8)
            if (fmt != 1) return None // PCM only
            channels = u16(bytes, o + 10)
            sampleRate = i32(bytes, o + 12)
            bits = u16(bytes, o + 22)
          case "data" => dataOff = o + 8; dataLen = size
          case _ =>
        }
        o += 8 + size + (size & 1) // chunks are word-aligned
      }
      if (sampleRate <= 0 || channels != 1 || bits != 16 || dataOff < 0) return None
      val n = dataLen / 2
      val out = new Array[Float](n)
      var i = 0
      while (i < n) {
        val s = (u16(bytes, dataOff + i * 2) << 16) >> 16 // sign-extend
        out(i) = (s.toFloat / 32768f + 1f) / 2f
        i += 1
      }
      Some((MediaInfo(0, 0, sampleRate, (n.toLong * 1000 / sampleRate).toInt, 1), out))
    }
  }

  // ------------------------------------------------------------------ GVID
  /** Trivial frame container for the video frame-sample op:
    * "GVID" u16 nFrames u16 fps, then per frame: u32 length + BMP bytes.
    * Decoding samples the middle frame (the standard thumbnail pick). */
  object Gvid {
    def encode(fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      val total = 8 + frames.map(4 + _.length).sum
      val out = new Array[Byte](total)
      out(0) = 'G'; out(1) = 'V'; out(2) = 'I'; out(3) = 'D'
      putU16(out, 4, frames.length); putU16(out, 6, fps)
      var o = 8
      frames.foreach { f =>
        putI32(out, o, f.length)
        System.arraycopy(f, 0, out, o + 4, f.length)
        o += 4 + f.length
      }
      out
    }

    def decode(bytes: Array[Byte]): Option[(MediaInfo, Array[Float])] = {
      if (bytes.length < 8 || bytes(0) != 'G' || bytes(1) != 'V' ||
          bytes(2) != 'I' || bytes(3) != 'D') return None
      val nFrames = u16(bytes, 4)
      val fps = u16(bytes, 6)
      if (nFrames <= 0 || fps <= 0) return None
      val target = nFrames / 2 // middle-frame sample
      var o = 8
      var idx = 0
      while (o + 4 <= bytes.length && idx <= target) {
        val len = i32(bytes, o)
        if (len < 0 || o + 4 + len > bytes.length) return None
        if (idx == target) {
          return Bmp.decode(java.util.Arrays.copyOfRange(bytes, o + 4, o + 4 + len))
            .map { case (info, luma) =>
              (info.copy(sampleRateHz = 0, durationMs = nFrames * 1000 / fps,
                nFrames = nFrames), luma)
            }
        }
        o += 4 + len
        idx += 1
      }
      None
    }
  }

  /** Kind-dispatched decode: (info, samples) or None on malformed input.
    * The catch is the fail-soft boundary the per-codec parsers rely on —
    * adversarial headers (negative offsets, width*height overflow, truncated
    * chunks) must yield a decode_ok=false row, never a task failure: at
    * 100 TB a poison payload must not kill a batch. OutOfMemoryError is
    * deliberately NOT caught: every decode allocation is bounded by a small
    * multiple of the input payload (BMP's length check forces the pixel data
    * inside the input; WAV/GVID allocate <= 2x input), so an OOM here means
    * real executor memory pressure — the JVM's fatal-error path must see it
    * rather than Spark retrying a task in a corrupted heap. */
  def decode(bytes: Array[Byte], kind: String): Option[(MediaInfo, Array[Float])] =
    try kind match {
      case "image" => Bmp.decode(bytes)
      case "audio" => Wav.decode(bytes)
      case "video" => Gvid.decode(bytes)
      case _       => None
    } catch {
      case _: IndexOutOfBoundsException | _: NegativeArraySizeException |
           _: ArithmeticException | _: IllegalArgumentException => None
    }
}
