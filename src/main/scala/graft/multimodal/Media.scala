package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed media record: opaque binary payload + typed metadata struct —
  * the multimodal column model (images/audio/video ride through the
  * relational engine as BinaryType + metadata, SURVEY.md §2.J8). */
case class MediaMeta(mime: String, width: Int, height: Int)
case class MediaRecord(doc_id: Long, payload: Array[Byte], meta: MediaMeta)

/** Extracted features per media item. */
case class MediaFeatures(doc_id: Long, n_bytes: Int,
                         byte_hist: Array[Long], frames: Array[Array[Byte]])

/** Multimodal processing pipeline. The *plumbing* — schema, encoders,
  * partition-preserving batched execution, frame-sample shapes — is real
  * and tested; the codec call itself is STUBBED (no image/audio libs in
  * this container) behind a deterministic fake, marked below.
  *
  * `mapPartitions` + `grouped(batchSize)` is the Scala/Tungsten analogue
  * of `mapInPandas`: the decode UDF sees bounded batches of rows per
  * partition, so peak memory is batchSize × payload, independent of
  * partition size — the property that matters at 100 TB.
  */
object Media {

  /** Media table derived from documents: payload = utf-8 bytes of text
    * (stand-in for image bytes), metadata deterministic from n_chars. */
  def load(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"n_chars")
      .map { r =>
        val bytes = r.getString(1).getBytes("UTF-8")
        val n = r.getLong(2)
        MediaRecord(r.getLong(0), bytes,
          MediaMeta("image/fake", (n % 640).toInt + 1, (n % 480).toInt + 1))
      }
  }

  /** Deterministic stand-in for a real codec. A production build swaps
    * this single function for e.g. a JNI image decoder; everything
    * around it (batching, schema, shuffle behavior) is unchanged.
    * STUB: byte histogram ≙ "decoded pixel statistics". */
  private def decodeStub(payload: Array[Byte]): Array[Long] = {
    val hist = Array.fill(16)(0L)
    payload.foreach(b => hist((b & 0xff) % 16) += 1)
    hist
  }

  /** "Frame sampling": n evenly-spaced fixed-width byte slices — the
    * shape of video keyframe extraction (each frame is itself a binary
    * column downstream). */
  def frameSample(payload: Array[Byte], n: Int, width: Int): Array[Array[Byte]] =
    if (payload.isEmpty) Array.empty
    else Array.tabulate(n) { k =>
      val off = (payload.length.toLong * k / n).toInt
      payload.slice(off, math.min(off + width, payload.length))
    }

  /** Batched feature extraction over each partition — bounded-memory,
    * partition-preserving (no shuffle). */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "vectorized" call per batch ≙ a mapInPandas pandas batch
        batch.iterator.map { r =>
          MediaFeatures(r.doc_id, r.payload.length,
            decodeStub(r.payload), frameSample(r.payload, 4, 8))
        }
      }
    }
  }
}
