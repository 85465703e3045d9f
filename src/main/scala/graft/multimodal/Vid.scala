package graft.multimodal

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.US_ASCII

/** Dependency-free indexed video container — the third modality of the
  * multimodal pipeline (image [[Ppm]], audio [[Wav]], video here; the
  * reference's media surface is the tweet `entities`/`context_annotations`
  * attachment model, reference src/main.py:90, and the BinaryType-column
  * posture is the BASELINE north star's multimodal extension). The
  * format mirrors the structure of real frame-indexed containers
  * (MJPEG-in-AVI, fMP4 with an index box): a fixed header, a frame
  * INDEX of (offset-implied) lengths, then the frame payloads — each
  * frame an independently-encoded still (P6 PPM).
  *
  * The property that matters at 100 TB is the index: keyframe SAMPLING
  * reads the ~bytes of the k sampled frames and never touches, let
  * alone decodes, the rest of the payload (MediaSuite proves it by
  * splicing a corrupt non-sampled frame that full decode rejects but
  * sampling sails past). A production build swaps [[Ppm]] per frame for
  * a JNI H.264 intra-frame decoder with the same signature.
  *
  * Layout (big-endian int32s):
  *   "GVID" | fps | frameCount | len[0..frameCount) | frame bytes…
  */
object Vid {

  case class Video(fps: Int, frames: Array[Array[Byte]]) {
    def durationMicros: Long =
      if (fps <= 0) 0L else frames.length.toLong * 1000000L / fps
  }

  private val Magic = "GVID".getBytes(US_ASCII)

  def encode(v: Video): Array[Byte] = {
    require(v.fps > 0, s"fps must be positive: ${v.fps}")
    val head = ByteBuffer.allocate(12 + 4 * v.frames.length)
    head.put(Magic).putInt(v.fps).putInt(v.frames.length)
    v.frames.foreach(f => head.putInt(f.length))
    head.array() ++ v.frames.flatten
  }

  private def err(msg: String): Nothing =
    throw new IllegalArgumentException(s"not a GVID container: $msg")

  /** Parse ONLY the header + index: fps, and each frame's (offset,
    * length) into the byte array. O(frameCount) work, no frame bytes
    * touched — the metadata-only read a planner does before deciding
    * which frames a task will fetch. */
  def index(bytes: Array[Byte]): (Int, Array[(Int, Int)]) = {
    if (bytes.length < 12 || !bytes.take(4).sameElements(Magic)) err("bad magic")
    val bb = ByteBuffer.wrap(bytes, 4, bytes.length - 4)
    val fps = bb.getInt()
    val n = bb.getInt()
    if (fps <= 0) err(s"non-positive fps $fps")
    if (n < 0 || 12L + 4L * n > bytes.length) err(s"index for $n frames exceeds payload")
    var off = 12 + 4 * n
    val idx = Array.tabulate(n) { _ =>
      val len = bb.getInt()
      if (len < 0) err(s"negative frame length $len")
      val e = (off, len); off += len; e
    }
    if (off != bytes.length) err(s"frame bytes end at $off, container has ${bytes.length}")
    (fps, idx)
  }

  /** Full strict decode: every frame run through the PPM parser. */
  def decode(bytes: Array[Byte]): Video = {
    val (fps, idx) = index(bytes)
    Video(fps, idx.map { case (off, len) =>
      val f = java.util.Arrays.copyOfRange(bytes, off, off + len)
      Ppm.decode(f) // validate — a container of non-frames is malformed
      f
    })
  }

  /** Decode k evenly-spaced frames via the index — touches only those
    * frames' bytes. Returns (frameIdx, decoded image). */
  def sampleFrames(bytes: Array[Byte], k: Int): Array[(Int, Ppm.Image)] = {
    val (_, idx) = index(bytes)
    if (idx.isEmpty || k <= 0) Array.empty
    else {
      val picks = (0 until math.min(k, idx.length))
        .map(j => idx.length.toLong * j / math.min(k, idx.length))
        .map(_.toInt).distinct
      picks.map { i =>
        val (off, len) = idx(i)
        (i, Ppm.decode(java.util.Arrays.copyOfRange(bytes, off, off + len)))
      }.toArray
    }
  }
}
