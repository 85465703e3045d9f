package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Dependency-free RIFF/WAVE PCM-16 codec — the audio sibling of [[Ppm]]
  * (the multimodal contract covers image AND audio payloads). Real
  * chunked-container parsing: a WAV file is `RIFF <size> WAVE` followed
  * by tagged chunks; decoders must skip unknown chunks (LIST, fact, cue)
  * including the spec's odd-size pad byte to find `fmt ` and `data`.
  * A production build swaps this for an MP3/FLAC JNI decoder with the
  * same signature; the Spark-side plumbing is format-agnostic. */
object Wav {

  /** Decoded PCM-16 audio: interleaved samples. */
  case class Clip(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def nFrames: Int = samples.length / channels
    def durationMicros: Long = nFrames.toLong * 1000000L / sampleRate
    /** Root-mean-square amplitude (int64-exact sum of squares). */
    def rms: Double = {
      if (samples.isEmpty) return 0.0
      var s = 0L; var i = 0
      while (i < samples.length) { s += samples(i).toLong * samples(i); i += 1 }
      math.sqrt(s.toDouble / samples.length)
    }
    def peak: Int = if (samples.isEmpty) 0 else samples.iterator.map(s => math.abs(s.toInt)).max
    /** Sign changes across consecutive samples of channel 0 — the
      * classic cheap pitch/noisiness proxy. */
    def zeroCrossings: Long = {
      var n = 0L; var i = channels
      while (i < samples.length) {
        if ((samples(i) >= 0) != (samples(i - channels) >= 0)) n += 1
        i += channels
      }
      n
    }
  }

  def encode(clip: Clip): Array[Byte] = {
    require(clip.sampleRate > 0 && clip.channels > 0, "bad clip params")
    require(clip.samples.length % clip.channels == 0, "ragged interleave")
    val dataLen = clip.samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(clip.channels.toShort)
      .putInt(clip.sampleRate)
      .putInt(clip.sampleRate * clip.channels * 2) // byte rate
      .putShort((clip.channels * 2).toShort)       // block align
      .putShort(16)                                // bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    clip.samples.foreach(buf.putShort)
    buf.array()
  }

  /** Strict decode: malformed/unsupported input throws
    * IllegalArgumentException; unknown chunks are skipped per spec. */
  def decode(bytes: Array[Byte]): Clip = {
    def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"not a PCM-16 WAV: $msg")
    if (bytes.length < 12) err("truncated container")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); buf.get(t); new String(t, "US-ASCII")
    }
    if (tag() != "RIFF") err("bad magic")
    buf.getInt // declared riff size; real files often lie — trust chunks
    if (tag() != "WAVE") err("not a WAVE form")
    var fmt: Option[(Int, Int)] = None // (channels, sampleRate)
    var data: Option[Array[Byte]] = None
    while (buf.remaining() >= 8 && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(); val sz = buf.getInt
      if (sz < 0 || sz > buf.remaining()) err(s"chunk '$id' overruns container")
      id match {
        case "fmt " =>
          if (sz < 16) err("fmt chunk too small")
          val audioFormat = buf.getShort
          if (audioFormat != 1) err(s"unsupported codec $audioFormat (PCM only)")
          val channels = buf.getShort.toInt
          val rate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align (derived)
          val bits = buf.getShort
          if (bits != 16) err(s"unsupported bit depth $bits")
          if (channels <= 0 || rate <= 0) err(s"bad fmt: ch=$channels rate=$rate")
          buf.position(buf.position() + (sz - 16)) // fmt extensions
          fmt = Some((channels, rate))
        case "data" =>
          val d = new Array[Byte](sz); buf.get(d); data = Some(d)
        case _ => // LIST/fact/cue/…: skip, honoring the odd-size pad byte
          buf.position(buf.position() + sz + (sz & 1))
      }
    }
    val (channels, rate) = fmt.getOrElse(err("missing fmt chunk"))
    val d = data.getOrElse(err("missing data chunk"))
    if (d.length % (2 * channels) != 0) err("data not frame-aligned")
    val sb = ByteBuffer.wrap(d).order(ByteOrder.LITTLE_ENDIAN).asShortBuffer()
    val samples = new Array[Short](d.length / 2)
    sb.get(samples)
    Clip(rate, channels, samples)
  }
}
