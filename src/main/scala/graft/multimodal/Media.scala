package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed media record: opaque binary payload + typed metadata struct —
  * the multimodal column model (images/audio/video ride through the
  * relational engine as BinaryType + metadata, SURVEY.md §2.J8). */
case class MediaMeta(mime: String, width: Int, height: Int)
case class MediaRecord(doc_id: Long, payload: Array[Byte], meta: MediaMeta)

/** Extracted features per media item: decoded dimensions, per-channel
  * pixel means, a 16-bucket intensity histogram over the decoded
  * raster, and sampled "keyframes". */
case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                         mean_r: Double, mean_g: Double, mean_b: Double,
                         byte_hist: Array[Long], frames: Array[Array[Byte]])

/** Extracted audio features: duration + loudness + zero-crossing rate
  * (rms micro-scaled to int64 for cross-run exactness). */
case class AudioFeatures(doc_id: Long, sample_rate: Int, channels: Int,
                         duration_micros: Long, rms_micros: Long,
                         peak: Int, zero_crossings: Long)

/** Extracted video features from SAMPLED keyframes only: container
  * stats (frame count, fps, duration) from the index, per-sampled-frame
  * mean intensity and a scene-change signal (mean abs raster delta
  * between consecutive sampled frames), all micro-scaled to int64. */
case class VideoFeatures(doc_id: Long, n_frames: Int, fps: Int,
                         duration_micros: Long, n_sampled: Int,
                         frame_means_micros: Array[Long],
                         scene_delta_micros: Long)

/** Multimodal processing pipeline: binary payloads are REAL images
  * (binary PPM, see [[Ppm]]) decoded by a real header-then-raster
  * parser — no codec stub. The plumbing is the part that matters at
  * 100 TB: `mapPartitions` + `grouped(batchSize)` is the Scala/Tungsten
  * analogue of `mapInPandas` — the decoder sees bounded batches of rows
  * per partition, so peak memory is batchSize × payload, independent of
  * partition size. Swapping [[Ppm]] for a JNI JPEG decoder changes no
  * line outside `decode`.
  */
object Media {

  /** Media table derived from documents: payload = an actual encoded
    * P6 image whose dimensions derive from n_chars and whose raster is
    * the document's UTF-8 bytes tiled across the pixels — deterministic,
    * and a genuine exercise of the decoder on every row. */
  def load(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"n_chars")
      .map { r =>
        val txt = r.getString(1).getBytes("UTF-8")
        val n = r.getLong(2)
        val w = (n % 13).toInt + 4
        val h = (n % 7).toInt + 4
        val rgb = Array.tabulate(w * h * 3)(i =>
          if (txt.isEmpty) 0.toByte else txt(i % txt.length))
        MediaRecord(r.getLong(0), Ppm.encode(Ppm.Image(w, h, rgb)),
          MediaMeta("image/x-portable-pixmap", w, h))
      }
  }

  /** "Frame sampling": n evenly-spaced fixed-width byte slices of the
    * DECODED raster — the shape of video keyframe extraction (each
    * frame is itself a binary column downstream). */
  def frameSample(raster: Array[Byte], n: Int, width: Int): Array[Array[Byte]] =
    if (raster.isEmpty) Array.empty
    else Array.tabulate(n) { k =>
      val off = (raster.length.toLong * k / n).toInt
      raster.slice(off, math.min(off + width, raster.length))
    }

  /** Audio table derived from events: payload = a real RIFF/PCM-16 WAV
    * whose samples are a deterministic sawtooth keyed by event_id —
    * every row exercises the chunked-container parser. */
  def loadAudio(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.events(spark, dir)
      .select($"event_id")
      .limit(512)
      .map { r =>
        val id = r.getLong(0)
        val n = (id % 400).toInt + 40 // 40–439 frames
        val period = (id % 97).toInt + 8
        val samples = Array.tabulate(n)(i =>
          ((i % period) * 2000 - period * 1000).toShort)
        MediaRecord(id, Wav.encode(Wav.Clip(8000, 1, samples)),
          MediaMeta("audio/wav", n, 1))
      }
  }

  /** Extracted audio features: duration, loudness, zero-crossing rate. */
  def extractAudioFeatures(ds: Dataset[MediaRecord],
                           batchSize: Int = 64): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val clip = Wav.decode(r.payload)
          AudioFeatures(r.doc_id, clip.sampleRate, clip.channels,
            clip.durationMicros, math.floor(clip.rms * 1000000).toLong,
            clip.peak, clip.zeroCrossings)
        }
      }
    }
  }

  /** Video table derived from documents: payload = a real GVID container
    * of 3–8 same-sized P6 frames whose rasters are the document's bytes
    * tiled at a per-frame offset (so consecutive frames differ and the
    * scene-change signal is non-trivial). */
  def loadVideo(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"n_chars")
      .map { r =>
        val txt = r.getString(1).getBytes("UTF-8")
        val n = r.getLong(2)
        val w = (n % 11).toInt + 4
        val h = (n % 5).toInt + 4
        val nFrames = (n % 6).toInt + 3
        val frames = Array.tabulate(nFrames) { f =>
          val rgb = Array.tabulate(w * h * 3)(i =>
            if (txt.isEmpty) 0.toByte else txt((i + f * 7) % txt.length))
          Ppm.encode(Ppm.Image(w, h, rgb))
        }
        val fps = (r.getLong(0) % 28).toInt + 2
        MediaRecord(r.getLong(0), Vid.encode(Vid.Video(fps, frames)),
          MediaMeta("video/x-gvid", w, h))
      }
  }

  /** Batched keyframe-sampled video features — the index-driven path:
    * per record, parse the container index, decode only `k` sampled
    * frames, never the rest (the 100 TB property: feature cost scales
    * with k, not with video length). Same bounded-memory mapPartitions
    * shape as the other modalities. */
  def extractVideoFeatures(ds: Dataset[MediaRecord], k: Int = 3,
                           batchSize: Int = 64): Dataset[VideoFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val (fps, idx) = Vid.index(r.payload)
          val sampled = Vid.sampleFrames(r.payload, k)
          val means = sampled.map { case (_, img) =>
            var s = 0L; img.rgb.foreach(b => s += (b & 0xff))
            s * 1000000L / math.max(img.rgb.length, 1)
          }
          val delta =
            if (sampled.length < 2) 0L
            else {
              var acc = 0L; var nPix = 0L
              sampled.sliding(2).foreach { case Array((_, a), (_, b)) =>
                val m = math.min(a.rgb.length, b.rgb.length)
                var i = 0
                while (i < m) { acc += math.abs((a.rgb(i) & 0xff) - (b.rgb(i) & 0xff)); i += 1 }
                nPix += m
              }
              acc * 1000000L / math.max(nPix, 1)
            }
          VideoFeatures(r.doc_id, idx.length, fps,
            idx.length.toLong * 1000000L / fps, sampled.length, means, delta)
        }
      }
    }
  }

  /** Batched feature extraction over each partition — bounded-memory,
    * partition-preserving (no shuffle). Each record's payload is decoded
    * by the real PPM parser; features are pixel statistics of the
    * decoded raster. */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "vectorized" call per batch ≙ a mapInPandas pandas batch
        batch.iterator.map { r =>
          val img = Ppm.decode(r.payload)
          val hist = Array.fill(16)(0L)
          img.rgb.foreach(b => hist((b & 0xff) % 16) += 1)
          MediaFeatures(r.doc_id, r.payload.length, img.width, img.height,
            img.meanChannel(0), img.meanChannel(1), img.meanChannel(2),
            hist, frameSample(img.rgb, 4, 8))
        }
      }
    }
  }
}
