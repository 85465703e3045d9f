package graft.multimodal

import java.nio.charset.StandardCharsets.US_ASCII

/** Dependency-free binary PPM (P6) codec — the "trivial format" real
  * decoder for the multimodal pipeline (replaces round-3's declared
  * decode stub). P6 is the simplest raster format with a genuine
  * header-then-pixels structure: `P6 <w> <h> <maxval>` as
  * whitespace-separated ASCII tokens ('#'-comments allowed between
  * them), one whitespace byte, then w·h packed RGB triples. A
  * production build swaps this object for a JNI JPEG/PNG decoder with
  * the same signature; everything around it (mapPartitions batching,
  * schema, shuffle behavior) is format-agnostic. */
object Ppm {

  /** A decoded 8-bit RGB raster. */
  case class Image(width: Int, height: Int, rgb: Array[Byte]) {
    /** Mean of channel c (0=R,1=G,2=B) — the "pixel statistics" a real
      * feature extractor computes post-decode. */
    def meanChannel(c: Int): Double = {
      require(c >= 0 && c < 3)
      var s = 0L; var i = c
      while (i < rgb.length) { s += rgb(i) & 0xff; i += 3 }
      s.toDouble / (rgb.length / 3)
    }
  }

  def encode(img: Image): Array[Byte] = {
    require(img.rgb.length == img.width * img.height * 3,
      s"raster length ${img.rgb.length} != ${img.width}x${img.height}x3")
    s"P6\n${img.width} ${img.height}\n255\n".getBytes(US_ASCII) ++ img.rgb
  }

  /** Strict decode: malformed input throws IllegalArgumentException
    * (a pipeline must distinguish "bad image" from "bad code"). */
  def decode(bytes: Array[Byte]): Image = {
    var pos = 0
    def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"not a P6 PPM: $msg")
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def token(): String = {
      var done = false
      while (!done && pos < bytes.length) {
        if (isWs(bytes(pos))) pos += 1
        else if (bytes(pos) == '#') { // comment runs to end of line
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else done = true
      }
      val st = pos
      while (pos < bytes.length && !isWs(bytes(pos))) pos += 1
      if (st == pos) err("truncated header")
      new String(bytes, st, pos - st, US_ASCII)
    }
    def intToken(what: String): Int = {
      val t = token()
      try t.toInt catch { case _: NumberFormatException => err(s"bad $what: '$t'") }
    }
    if (token() != "P6") err("bad magic")
    val w = intToken("width"); val h = intToken("height")
    if (w <= 0 || h <= 0) err(s"bad dimensions ${w}x$h")
    val maxv = intToken("maxval")
    if (maxv != 255) err(s"unsupported maxval $maxv")
    // exactly ONE whitespace byte separates header from raster (spec)
    if (pos >= bytes.length || !isWs(bytes(pos))) err("missing raster separator")
    pos += 1
    val need = w * h * 3
    if (bytes.length - pos < need) err(s"raster truncated: need $need, have ${bytes.length - pos}")
    Image(w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + need))
  }
}
