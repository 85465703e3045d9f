package graft

import graft.multimodal.{Media, Ppm, Vid}

/** The real multimodal codec (VERDICT r3 next-#7): a dependency-free
  * binary-PPM decoder exercised on hand-authored fixture bytes, plus
  * the decode → pixel-stats pipeline end-to-end on the documents-derived
  * media table. */
class MediaSuite extends SparkSpec {

  test("PPM decode: hand-authored P6 fixture with comment parses to known pixels") {
    // 2x1 image: one red pixel, one mid-gray pixel; a '#' comment
    // between header tokens per the spec
    val bytes = "P6\n# fixture\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](255.toByte, 0, 0, 128.toByte, 128.toByte, 128.toByte)
    val img = Ppm.decode(bytes)
    assert(img.width == 2 && img.height == 1)
    assert(img.rgb.map(_ & 0xff).toSeq == Seq(255, 0, 0, 128, 128, 128))
    assert(img.meanChannel(0) == (255 + 128) / 2.0)
    assert(img.meanChannel(1) == (0 + 128) / 2.0)
    assert(img.meanChannel(2) == (0 + 128) / 2.0)
  }

  test("PPM encode/decode round-trips arbitrary rasters") {
    val rnd = new scala.util.Random(7L)
    for ((w, h) <- Seq((1, 1), (5, 3), (16, 16))) {
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val back = Ppm.decode(Ppm.encode(Ppm.Image(w, h, rgb)))
      assert(back.width == w && back.height == h)
      assert(back.rgb.toSeq == rgb.toSeq)
    }
  }

  test("PPM decode rejects malformed input with a real exception") {
    def bad(bytes: Array[Byte], why: String): Unit = {
      val e = intercept[IllegalArgumentException](Ppm.decode(bytes))
      assert(e.getMessage.contains("not a P6 PPM"), s"$why: ${e.getMessage}")
    }
    bad("P5\n1 1\n255\n   ".getBytes("US-ASCII"), "wrong magic")
    bad("P6\n1 1\n65535\n  ".getBytes("US-ASCII"), "16-bit maxval")
    bad("P6\n2 2\n255\nxx".getBytes("US-ASCII"), "truncated raster")
    bad("P6\nX 1\n255\n".getBytes("US-ASCII"), "non-numeric width")
  }

  test("media pipeline decodes real payloads: meta dims == decoded dims, stats sane") {
    val feats = Media.extractFeatures(Media.load(spark, sfDir).repartition(5), batchSize = 32)
    val metas = Media.load(spark, sfDir).collect().map(r => r.doc_id -> r.meta).toMap
    val rows = feats.collect()
    assert(rows.length == 500)
    rows.foreach { f =>
      val m = metas(f.doc_id)
      assert(f.width == m.width && f.height == m.height,
        s"doc ${f.doc_id}: decoded ${f.width}x${f.height} != meta ${m.width}x${m.height}")
      assert(f.byte_hist.sum == f.width.toLong * f.height * 3)
      Seq(f.mean_r, f.mean_g, f.mean_b).foreach(v => assert(v >= 0 && v <= 255))
    }
  }

  test("WAV encode/decode round-trips PCM-16; unknown chunks are skipped per spec") {
    import graft.multimodal.Wav
    val clip = Wav.Clip(44100, 2, Array.tabulate(400)(i => ((i * 37) % 4001 - 2000).toShort))
    val rt = Wav.decode(Wav.encode(clip))
    assert(rt.sampleRate == clip.sampleRate && rt.channels == clip.channels)
    assert(rt.samples.toSeq == clip.samples.toSeq)
    // splice an odd-sized LIST chunk between fmt and data: a spec-correct
    // reader must skip it (incl. the pad byte) and still find data
    val enc = Wav.encode(clip)
    val (head, tail) = enc.splitAt(36) // RIFF(12) + fmt chunk(8+16)
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++ Array[Byte](0)
    val spliced = head ++ listChunk ++ tail
    val got = Wav.decode(spliced)
    assert(got.sampleRate == 44100 && got.channels == 2)
    assert(got.samples.toSeq == clip.samples.toSeq)
  }

  test("WAV decode rejects malformed input with a real exception") {
    import graft.multimodal.Wav
    val good = Wav.encode(Wav.Clip(8000, 1, Array[Short](1, 2, 3)))
    def bad(b: Array[Byte]) =
      intercept[IllegalArgumentException](Wav.decode(b))
    bad(Array[Byte](1, 2, 3))                       // truncated container
    bad("RIFX".getBytes ++ good.drop(4))            // bad magic
    bad(good.take(20))                              // missing chunks
    val nonPcm = good.clone; nonPcm(20) = 3         // audioFormat = IEEE float
    bad(nonPcm)
  }

  test("audio pipeline: features are deterministic and physically consistent") {
    val feats = graft.multimodal.Media.extractAudioFeatures(
      graft.multimodal.Media.loadAudio(spark, sfDir)).collect()
    assert(feats.nonEmpty)
    val again = graft.multimodal.Media.extractAudioFeatures(
      graft.multimodal.Media.loadAudio(spark, sfDir)).collect()
    assert(feats.map(_.rms_micros).sorted.toSeq == again.map(_.rms_micros).sorted.toSeq)
    feats.foreach { f =>
      assert(f.sample_rate == 8000 && f.channels == 1)
      assert(f.duration_micros > 0 && f.peak >= 0 && f.peak <= 32767)
      assert(f.rms_micros <= f.peak.toLong * 1000000,
        s"rms above peak for ${f.doc_id}")
    }
  }

  test("GVID encode/decode round-trips; strict rejection of malformed containers") {
    def frame(seed: Int): Array[Byte] =
      Ppm.encode(Ppm.Image(4, 3, Array.tabulate(36)(i => ((i * 31 + seed) % 251).toByte)))
    val v = Vid.Video(12, Array(frame(1), frame(2), frame(3)))
    val bytes = Vid.encode(v)
    val back = Vid.decode(bytes)
    assert(back.fps == 12 && back.frames.length == 3)
    assert(back.frames.zip(v.frames).forall { case (a, b) => a.sameElements(b) })
    assert(back.durationMicros == 3L * 1000000L / 12)
    def bad(b: Array[Byte]): Unit =
      assertThrows[IllegalArgumentException](Vid.decode(b))
    bad("NOPE".getBytes ++ bytes.drop(4))      // bad magic
    bad(bytes.take(10))                        // truncated header
    bad(bytes.dropRight(5))                    // frame bytes shorter than index
    bad(bytes ++ Array[Byte](0))               // trailing junk past the index
  }

  test("GVID sampling decodes ONLY the sampled frames (index-driven random access)") {
    def frame(seed: Int): Array[Byte] =
      Ppm.encode(Ppm.Image(4, 3, Array.tabulate(36)(i => ((i * 17 + seed) % 251).toByte)))
    // frame 1 of 4 is CORRUPT (index intact, payload garbage): a full
    // strict decode must reject the container, but sampling k=2 picks
    // frames 0 and 2 and must sail past the bad bytes untouched
    val corrupt = Array.fill(frame(9).length)(0x7f.toByte)
    val bytes = Vid.encode(Vid.Video(6, Array(frame(0), corrupt, frame(2), frame(3))))
    assertThrows[IllegalArgumentException](Vid.decode(bytes))
    val sampled = Vid.sampleFrames(bytes, 2)
    assert(sampled.map(_._1).toSeq == Seq(0, 2), s"picked ${sampled.map(_._1).toSeq}")
    assert(sampled.forall(_._2.width == 4))
    // k >= frame count degrades to every frame — and then the corrupt one throws
    assertThrows[IllegalArgumentException](Vid.sampleFrames(bytes, 4))
  }

  test("video pipeline: index-driven features are deterministic, duration consistent") {
    val feats = graft.multimodal.Media.extractVideoFeatures(
      graft.multimodal.Media.loadVideo(spark, sfDir)).collect()
    assert(feats.nonEmpty)
    val again = graft.multimodal.Media.extractVideoFeatures(
      graft.multimodal.Media.loadVideo(spark, sfDir)).collect()
    assert(feats.map(f => (f.doc_id, f.scene_delta_micros)).sorted.toSeq ==
      again.map(f => (f.doc_id, f.scene_delta_micros)).sorted.toSeq)
    feats.foreach { f =>
      assert(f.n_frames >= 3 && f.n_frames <= 8)
      assert(f.n_sampled <= 3 && f.n_sampled >= 1)
      assert(f.duration_micros == f.n_frames.toLong * 1000000L / f.fps)
      assert(f.frame_means_micros.forall(m => m >= 0 && m <= 255000000L))
      assert(f.scene_delta_micros >= 0 && f.scene_delta_micros <= 255000000L)
    }
  }
}
