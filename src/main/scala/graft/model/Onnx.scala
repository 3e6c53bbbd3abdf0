package graft.model

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal ONNX protobuf reader: extracts float initializers (name, dims,
  * data) from a model file. Hand-rolled varint walker — no protobuf
  * dependency (zero-egress build). Reads the model graph laid out in
  * /root/reference/extractnet/models/news_net.onnx (structure documented in
  * SURVEY.md §2.4). */
object Onnx {

  final case class Tensor(name: String, dims: Array[Int], data: Array[Float])

  private final class Reader(val b: Array[Byte]) {
    def varint(i0: Int): (Long, Int) = {
      var r = 0L; var s = 0; var i = i0
      while (true) {
        val x = b(i) & 0xff; i += 1
        r |= (x & 0x7fL) << s
        if ((x & 0x80) == 0) return (r, i)
        s += 7
      }
      throw new IllegalStateException
    }
  }

  /** Iterate protobuf fields in [lo, hi); callback(fieldNo, wireType, varintVal, lenLo, lenHi). */
  private def fields(r: Reader, lo: Int, hi: Int)(f: (Int, Int, Long, Int, Int) => Unit): Unit = {
    var i = lo
    while (i < hi) {
      val (tag, i1) = r.varint(i)
      val fn = (tag >> 3).toInt
      val wt = (tag & 7).toInt
      wt match {
        case 0 => val (v, i2) = r.varint(i1); f(fn, wt, v, 0, 0); i = i2
        case 1 => f(fn, wt, 0, i1, i1 + 8); i = i1 + 8
        case 2 =>
          val (ln, i2) = r.varint(i1)
          f(fn, wt, 0, i2, i2 + ln.toInt); i = i2 + ln.toInt
        case 5 => f(fn, wt, 0, i1, i1 + 4); i = i1 + 4
        case other => throw new IllegalStateException(s"wire type $other")
      }
    }
  }

  def readInitializers(bytes: Array[Byte]): Map[String, Tensor] = {
    val r = new Reader(bytes)
    var out = Map.empty[String, Tensor]
    var graphLo = -1; var graphHi = -1
    fields(r, 0, bytes.length) { (fn, wt, _, lo, hi) =>
      if (fn == 7 && wt == 2) { graphLo = lo; graphHi = hi }
    }
    require(graphLo >= 0, "no graph in onnx file")
    fields(r, graphLo, graphHi) { (fn, wt, _, lo, hi) =>
      if (fn == 5 && wt == 2) { // initializer: TensorProto
        var name = ""
        val dims = scala.collection.mutable.ArrayBuffer.empty[Int]
        var dtype = -1
        var rawLo = -1; var rawHi = -1
        fields(r, lo, hi) { (f2, w2, v2, l2, h2) =>
          f2 match {
            case 1 if w2 == 0 => dims += v2.toInt
            case 2 if w2 == 0 => dtype = v2.toInt
            case 8 if w2 == 2 => name = new String(bytes, l2, h2 - l2, "UTF-8")
            case 9 if w2 == 2 => rawLo = l2; rawHi = h2
            case _ =>
          }
        }
        if (dtype == 1 && rawLo >= 0) { // FLOAT raw_data
          val n = (rawHi - rawLo) / 4
          val arr = new Array[Float](n)
          val bb = ByteBuffer.wrap(bytes, rawLo, rawHi - rawLo).order(ByteOrder.LITTLE_ENDIAN)
          var i = 0
          while (i < n) { arr(i) = bb.getFloat(); i += 1 }
          out += name -> Tensor(name, dims.toArray, arr)
        } else if (dtype == 7 && rawLo >= 0) { // INT64 (shape constants) — skip
        }
      }
    }
    out
  }

  def loadResource(path: String): Map[String, Tensor] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    try readInitializers(in.readAllBytes()) finally in.close()
  }
}
