package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One weighted-sample candidate: the A-ES key is a pure function of
  * (doc_id, w) — see ops.TextAnalysis.aesKeyMicros. */
case class WDoc(doc_id: Long, lang: String, w: Long, key_micros: Long)

/** Per-language carried state: the running top-K plus a monotone
  * EMISSION SEQUENCE number — it advances once per delivered row,
  * INCLUDING re-deliveries (an at-least-once source replaying a batch
  * advances it), so it is a snapshot ordinal for Update-mode sinks,
  * NOT a count of distinct documents seen. Only the sample content is
  * re-delivery-invariant; consumers wanting "docs seen" should count
  * upstream of the sampler. */
case class WTopK(items: List[WDoc], emit_seq: Long)

case class WSample(lang: String, rk: Long, doc_id: Long, w: Long,
                   key_micros: Long, emit_seq: Long)

/** §2.I × L42 — the STREAMING form of Efraimidis–Spirakis weighted
  * sampling without replacement (VERDICT r9 #7): the daily-cadence
  * pipeline (reference main.tf:217) wants each micro-batch folded into
  * a per-group top-K that is at all times exactly the sample the batch
  * operator would draw over everything seen so far. A-ES makes that
  * merge trivially correct: keys are pure functions of (doc_id, w), and
  * top-K of a union == top-K of (top-K ∪ top-K), so the carried state
  * is K rows per group — `transformWithState` ValueState (I6e), RocksDB
  * provider, no corpus retention. Re-delivered docs are idempotent (the
  * key is deterministic, the merge dedups on doc_id), which is what an
  * at-least-once source needs. StreamingSuite proves the
  * stream-accumulated sample equals batch q_sample_weighted on the same
  * corpus for an arbitrary micro-batch split. */
object WeightedSample {

  val K = 5

  class TopKProcessor(k: Int) extends StatefulProcessor[String, WDoc, WSample] {
    @transient private var st: ValueState[WTopK] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[WTopK]("wtopk",
        Encoders.product[WTopK], TTLConfig.NONE)
    override def handleInputRows(lang: String, rows: Iterator[WDoc],
        tv: TimerValues): Iterator[WSample] = {
      val prev = if (st.exists()) st.get() else WTopK(Nil, 0L)
      // bounded O(K) fold — never materialize the batch's group (a whale
      // group in one micro-batch must not buffer in heap): each row
      // either displaces into the ≤K sorted buffer or is dropped.
      // The SAMPLE is idempotent under re-delivery: keys are pure
      // functions of the doc, so a duplicate already in the buffer is
      // skipped and one outside the buffer re-loses deterministically.
      // emit_seq still advances per delivered row (see WTopK) — state
      // and emitted rows DO change on duplicate delivery; only the
      // sample content is invariant.
      var buf = prev.items
      var n = prev.emit_seq
      rows.foreach { d =>
        n += 1L
        if (!buf.exists(_.doc_id == d.doc_id)) {
          buf = (d :: buf).sortBy(x => (-x.key_micros, x.doc_id)).take(k)
        }
      }
      val next = WTopK(buf, n)
      st.update(next)
      buf.iterator.zipWithIndex.map { case (d, i) =>
        WSample(lang, i + 1L, d.doc_id, d.w, d.key_micros, next.emit_seq)
      }
    }
  }

  /** documents-shaped input (doc_id, lang, text) → keyed candidates,
    * via the SAME key expression as the batch operator. */
  def prep(docs: DataFrame): Dataset[WDoc] = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select($"doc_id", $"lang", size(split($"text", " ")).cast("long").as("w"))
      .withColumn("key_micros", graft.ops.TextAnalysis.aesKeyMicros($"doc_id", $"w"))
      .as[WDoc]
  }

  /** Per-language running weighted sample over a (possibly streaming)
    * candidate set; Update mode emits the refreshed top-K per batch. */
  def topKStream(docs: Dataset[WDoc], k: Int = K): Dataset[WSample] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.groupByKey(_.lang)
      .transformWithState(new TopKProcessor(k), TimeMode.None(), OutputMode.Update())
  }
}
