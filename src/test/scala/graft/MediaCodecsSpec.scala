package graft

import graft.ops.{MediaCodecs, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** Golden round-trips for the from-scratch media codecs: known pixels in,
  * exact luma out (including the BMP 4-byte row-padding and bottom-up row
  * order), known PCM samples in, exact normalized values out, and the GVID
  * middle-frame sampling rule. */
class MediaCodecsSpec extends AnyFunSuite {

  test("bmp round-trip: exact luma, padded odd-width rows, top-down order") {
    // 3x2, width*3 = 9 bytes/row -> 3 pad bytes must be skipped on decode
    val px = Array(
      (255, 0, 0), (0, 255, 0), (0, 0, 255), // top row: R G B
      (0, 0, 0), (255, 255, 255), (128, 128, 128)) // bottom row
    val bytes = MediaCodecs.Bmp.encode(3, 2, px)
    assert(bytes(0) == 'B' && bytes(1) == 'M')
    assert(bytes.length == 54 + 12 * 2, "9-byte rows padded to 12")
    val Some((info, luma)) = MediaCodecs.Bmp.decode(bytes)
    assert(info.width == 3 && info.height == 2)
    // Rec.601: R=.299 G=.587 B=.114 of full scale; decode returns top-down
    val exp = Array(0.299f, 0.587f, 0.114f, 0f, 1f, 128f * 1000f / (1000f * 255f))
    luma.zip(exp).foreach { case (got, e) =>
      assert(math.abs(got - e) < 1e-4, s"$got vs $e")
    }
  }

  test("bmp rejects malformed headers without throwing") {
    assert(MediaCodecs.Bmp.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaCodecs.Bmp.decode(new Array[Byte](54)).isEmpty) // no magic
    val ok = MediaCodecs.Bmp.encode(2, 2, Array.fill(4)((1, 2, 3)))
    assert(MediaCodecs.Bmp.decode(ok.take(40)).isEmpty) // truncated
    // claimed size beyond buffer
    val lying = ok.clone(); lying(18) = 100.toByte
    assert(MediaCodecs.Bmp.decode(lying).isEmpty)
    // adversarial headers: negative dataOffset (0x80000000) and
    // int-overflowing width — must be None, not a thrown exception
    val negOff = ok.clone()
    negOff(10) = 0; negOff(11) = 0; negOff(12) = 0; negOff(13) = 0x80.toByte
    assert(MediaCodecs.Bmp.decode(negOff).isEmpty)
    val hugeW = ok.clone()
    hugeW(18) = 0; hugeW(19) = 0; hugeW(20) = 0; hugeW(21) = 0x40.toByte // 0x40000000
    assert(MediaCodecs.Bmp.decode(hugeW).isEmpty)
    // the dispatch boundary is fail-soft for any codec surprise
    assert(MediaCodecs.decode(negOff, "image").isEmpty)
  }

  test("wav round-trip: exact sample normalization and metadata") {
    val samples = Array[Short](0, Short.MaxValue, Short.MinValue, 16384, -16384)
    val bytes = MediaCodecs.Wav.encode(8000, samples)
    val Some((info, out)) = MediaCodecs.Wav.decode(bytes)
    assert(info.sampleRateHz == 8000)
    assert(info.durationMs == samples.length * 1000 / 8000)
    val exp = samples.map(s => (s.toFloat / 32768f + 1f) / 2f)
    assert(out.length == samples.length)
    out.zip(exp).foreach { case (g, e) => assert(g == e, s"$g vs $e") }
    assert(out(0) == 0.5f && out(2) == 0f) // silence mid-scale, min at 0
  }

  test("wav rejects non-PCM / stereo / truncated") {
    val ok = MediaCodecs.Wav.encode(8000, Array[Short](1, 2, 3))
    assert(MediaCodecs.Wav.decode(ok.take(30)).isEmpty)
    val stereo = ok.clone(); stereo(22) = 2 // channels=2
    assert(MediaCodecs.Wav.decode(stereo).isEmpty)
    val ieee = ok.clone(); ieee(20) = 3 // float format
    assert(MediaCodecs.Wav.decode(ieee).isEmpty)
  }

  test("gvid samples the middle frame") {
    def solidBmp(level: Int) =
      MediaCodecs.Bmp.encode(2, 2, Array.fill(4)((level, level, level)))
    val clip = MediaCodecs.Gvid.encode(fps = 4,
      Seq(solidBmp(0), solidBmp(128), solidBmp(255)))
    val Some((info, luma)) = MediaCodecs.Gvid.decode(clip)
    assert(info.nFrames == 3 && info.durationMs == 750)
    // middle frame (idx 1) is the 128-level one
    luma.foreach(v => assert(math.abs(v - 128f / 255f) < 1e-4, v.toString))
  }

  test("multimodal features over real synthetic payloads decode cleanly") {
    val img = Multimodal.synthPayload(7, "image")
    val aud = Multimodal.synthPayload(7, "audio")
    val vid = Multimodal.synthPayload(7, "video")
    assert(MediaCodecs.decode(img, "image").exists(_._2.length == 48)) // 8x6
    assert(MediaCodecs.decode(aud, "audio").exists(_._2.length == 96))
    assert(MediaCodecs.decode(vid, "video").exists(_._2.length == 16)) // 4x4 frame
    // kind mismatch fails soft
    assert(MediaCodecs.decode(img, "audio").isEmpty)
    assert(MediaCodecs.decode(aud, "video").isEmpty)
  }
}
