package graft

import graft.multimodal.{Media, Ppm}

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
}
