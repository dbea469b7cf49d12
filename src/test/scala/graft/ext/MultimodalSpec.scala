package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "hello world"), (1L, "spark engine"), (2L, ""))
    .toDF("doc_id", "text")

  test("binary payload wrapping: schema + byte size metadata") {
    val m = Multimodal.asBinaryPayload(docs, "text", "text/plain")
    assert(m.schema("content").dataType == BinaryType)
    assert(m.schema("media_meta").dataType == Multimodal.metadataSchema)
    val sizes = m.select($"doc_id", $"media_meta.byte_size")
      .as[(Long, Long)].collect().toMap
    assert(sizes == Map(0L -> 11L, 1L -> 12L, 2L -> 0L))
  }

  test("feature extraction runs partition-parallel and is deterministic") {
    val m = Multimodal.asBinaryPayload(docs, "text").repartition(3)
    val f = Multimodal.extractFeatures(m)
    assert(f.schema("features").dataType ==
      ArrayType(FloatType, containsNull = false))
    val rows = f.select($"doc_id", $"features").as[(Long, Seq[Float])]
      .collect().toMap
    assert(rows(0L).length == Multimodal.featureDim)
    assert(rows(2L).forall(_ == 0.0f)) // empty payload → zero features
    // determinism: same input → same features
    val again = Multimodal.extractFeatures(m)
      .select($"doc_id", $"features").as[(Long, Seq[Float])].collect().toMap
    assert(again == rows)
  }

  test("frame sampling and byte-budget repartitioning") {
    val m = Multimodal.asBinaryPayload(docs, "text")
    assert(Multimodal.sampleEveryN(m, "doc_id", 2)
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(0L, 2L))
    val rp = Multimodal.repartitionByBytes(m, targetPartitionMB = 1)
    assert(rp.rdd.getNumPartitions == 1) // tiny payload → single partition
    assert(rp.count() == 3)
  }

  test("resize recomputes typed metadata alongside the byte transform") {
    val m = Multimodal.asBinaryPayload(docs, "text")
      // pretend the payloads are 4x2 'images'
      .withColumn("media_meta",
        org.apache.spark.sql.functions.struct(
          $"media_meta.media_type", $"media_meta.byte_size",
          org.apache.spark.sql.functions.lit(4).as("width"),
          org.apache.spark.sql.functions.lit(2).as("height"),
          $"media_meta.duration_ms"))
    val r = Multimodal.resizeTo(m, w = 2, h = 1)
    val rows = r.select("doc_id", "media_meta.width",
        "media_meta.height", "media_meta.byte_size", "content")
      .collect()
      .map(x => x.getLong(0) ->
        ((x.getInt(1), x.getInt(2), x.getLong(3),
          x.getAs[Array[Byte]](4)))).toMap
    rows.values.foreach { case (w, h, size, bytes) =>
      assert(w == 2 && h == 1)
      assert(size == bytes.length,
        "byte_size metadata must match the transformed payload")
    }
    // 2x1 is a quarter of 4x2: "hello world" (11 bytes) → 11*2/8 = 2;
    // an empty source payload stays empty
    assert(rows(0L)._4.length == 2)
    assert(rows(2L)._4.length == 0)
  }

  private def solidImage(w: Int, h: Int, rgb: Int, fmt: String)
      : Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("doc_id", "content").withColumn("media_meta", struct(
      lit("application/octet-stream").as("media_type"),
      octet_length($"content").cast("long").as("byte_size"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))
      .cast(Multimodal.metadataSchema))

  test("imageInfo reads real headers; decodeImage decodes real pixels") {
    val png = solidImage(31, 17, 0xFF0000, "png")
    val info = Multimodal.imageInfo(png)
    assert(info == Some(Multimodal.ImageInfo("png", 31, 17, 3)),
      s"got $info")
    val img = Multimodal.decodeImage(png).get
    assert(img.getWidth == 31 && img.getHeight == 17)
    assert((img.getRGB(15, 8) & 0xFFFFFF) == 0xFF0000,
      "decoded pixel must be the painted red")
    // non-images are None, not an exception
    assert(Multimodal.imageInfo("not an image".getBytes) == None)
    assert(Multimodal.decodeImage("not an image".getBytes) == None)
    assert(Multimodal.imageInfo(Array.emptyByteArray) == None)
  }

  test("feature extraction uses ACTUAL pixels for decodable images") {
    val red = solidImage(8, 8, 0xFF0000, "png")
    val blue = solidImage(8, 8, 0x0000FF, "png")
    val m = mediaDf(Seq((0L, red), (1L, blue),
      (2L, "plain bytes".getBytes("UTF-8")))).repartition(3)
    val feats = Multimodal.extractFeatures(m)
      .select($"doc_id", $"features").as[(Long, Seq[Float])]
      .collect().toMap
    // solid red: meanR = 1, meanG = meanB = 0, luma = 0.299, spread 0
    assert(math.abs(feats(0L)(0) - 1.0f) < 1e-3, s"${feats(0L)}")
    assert(feats(0L)(1) < 1e-3 && feats(0L)(2) < 1e-3)
    assert(math.abs(feats(0L)(3) - 0.299f) < 1e-3)
    assert(feats(0L)(4) < 1e-3)
    // solid blue: meanB = 1, luma = 0.114
    assert(math.abs(feats(1L)(2) - 1.0f) < 1e-3, s"${feats(1L)}")
    assert(math.abs(feats(1L)(3) - 0.114f) < 1e-3)
    // non-image rows fall back to the deterministic stub
    assert(feats(2L) ==
      Multimodal.decodeStub("plain bytes".getBytes("UTF-8")).toSeq)
    // a NULL payload must not kill the task anywhere in the chain
    assert(Multimodal.decodeStub(null).toSeq ==
      Seq.fill(Multimodal.featureDim)(0.0f))
    val withNull = mediaDf(Seq((0L, red)))
      .unionByName(mediaDf(Seq((1L, null))))
    val nf = Multimodal.extractFeatures(withNull)
      .select($"doc_id", $"features").as[(Long, Seq[Float])]
      .collect().toMap
    assert(nf(1L) == Seq.fill(Multimodal.featureDim)(0.0f))
    assert(Multimodal.resizeTo(withNull, 2, 2).count() == 2,
      "null rows pass through resize untouched")
  }

  test("null media_meta struct: probeMeta and resizeTo stay total") {
    val png = solidImage(5, 3, 0x00FF00, "png")
    // recognizable payload under a NULL metadata STRUCT — the probe
    // must synthesize the row from the header, not NPE the task
    val m = Seq((0L, png), (1L, "plain bytes".getBytes("UTF-8")))
      .toDF("doc_id", "content")
      .withColumn("media_meta",
        lit(null).cast(Multimodal.metadataSchema))
    val probed = Multimodal.probeMeta(m)
      .select($"doc_id", $"media_meta.media_type",
        $"media_meta.width", $"media_meta.height")
      .as[(Long, String, Option[Int], Option[Int])].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(probed(0L) == (("image/png", Some(5), Some(3))),
      s"header-synthesized metadata: $probed")
    // unrecognized payload keeps its (null) metadata untouched
    assert(probed(1L) == ((null, None, None)))
    // resize over the same null-meta frame: decodable rescales for
    // real, the stub path survives the missing struct too
    val r = Multimodal.resizeTo(m, 2, 2)
      .select($"doc_id", $"media_meta.width", $"media_meta.height")
      .as[(Long, Int, Int)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(0L) == ((2, 2)) && r(1L) == ((2, 2)), s"resized: $r")
  }

  test("resize rescales real images and re-encodes as PNG") {
    val png = solidImage(16, 8, 0x00FF00, "png")
    val jpg = solidImage(16, 8, 0x808080, "jpg")
    val m = mediaDf(Seq((0L, png), (1L, jpg)))
    val r = Multimodal.resizeTo(m, w = 4, h = 2)
    val rows = r.select("doc_id", "media_meta.media_type",
        "media_meta.width", "media_meta.height",
        "media_meta.byte_size", "content").collect()
      .map(x => x.getLong(0) -> ((x.getString(1), x.getInt(2),
        x.getInt(3), x.getLong(4), x.getAs[Array[Byte]](5)))).toMap
    rows.foreach { case (id, (mt, w, h, size, bytes)) =>
      assert(mt == "image/png", s"doc $id re-encodes as png, got $mt")
      assert(w == 4 && h == 2)
      assert(size == bytes.length)
      // the output must decode for real, at the requested dimensions
      val back = Multimodal.decodeImage(bytes).get
      assert(back.getWidth == 4 && back.getHeight == 2, s"doc $id")
    }
    // a solid green source stays solid green through bilinear resize
    val backPx = Multimodal.decodeImage(rows(0L)._5).get.getRGB(1, 1)
    assert((backPx & 0xFFFFFF) == 0x00FF00, f"got ${backPx & 0xFFFFFF}%06x")
  }

  test("probeMeta fills width/height/media_type from real headers only") {
    val png = solidImage(12, 5, 0x123456, "png")
    val m = mediaDf(Seq((0L, png), (1L, "opaque".getBytes("UTF-8"))))
    val probed = Multimodal.probeMeta(m)
      .select("doc_id", "media_meta.media_type", "media_meta.width",
        "media_meta.height").collect()
      .map(x => x.getLong(0) -> ((x.getString(1),
        Option(x.get(2)), Option(x.get(3))))).toMap
    assert(probed(0L) == (("image/png", Some(12), Some(5))))
    assert(probed(1L) ==
      (("application/octet-stream", None, None)),
      "non-image rows keep their declared metadata")
  }

  private def wavBytes(sampleRate: Float, channels: Int, nFrames: Int)
      : Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
    val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audioInfo reads real WAV headers; probeMeta fills duration") {
    // 8000 Hz stereo, 4000 frames = exactly 500 ms
    val wav = wavBytes(8000f, 2, 4000)
    val info = Multimodal.audioInfo(wav)
    assert(info == Some(Multimodal.AudioInfo("wav", 2, 8000, 500L)),
      s"got $info")
    assert(Multimodal.audioInfo("not audio".getBytes) == None)
    // an image payload is NOT misdetected as audio and vice versa
    val png = solidImage(4, 4, 0xFFFFFF, "png")
    assert(Multimodal.audioInfo(png) == None)
    assert(Multimodal.imageInfo(wav) == None)
    // probeMeta routes each payload to its real header: image rows get
    // w/h, audio rows get duration_ms, opaque rows keep declared meta
    val m = mediaDf(Seq((0L, wav), (1L, png),
      (2L, "opaque".getBytes("UTF-8"))))
    val probed = Multimodal.probeMeta(m)
      .select("doc_id", "media_meta.media_type", "media_meta.width",
        "media_meta.duration_ms").collect()
      .map(x => x.getLong(0) -> ((x.getString(1), Option(x.get(2)),
        Option(x.get(3))))).toMap
    assert(probed(0L) == (("audio/wav", None, Some(500L))), s"$probed")
    assert(probed(1L)._1 == "image/png" && probed(1L)._2 == Some(4))
    assert(probed(2L) == (("application/octet-stream", None, None)))
  }

  test("audio features come from ACTUAL samples: sine RMS and ZCR") {
    import javax.sound.sampled._
    // 0.5 s of a 400 Hz sine at 8 kHz mono, amplitude 0.5
    val rate = 8000f; val n = 4000; val freq = 400.0; val amp = 0.5
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val v = math.round(amp * math.sin(2 * math.Pi * freq * i / rate)
        * 32767).toInt
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, out)
    val wav = out.toByteArray

    val m = mediaDf(Seq((0L, wav), (1L, "plain".getBytes("UTF-8"))))
    val feats = Multimodal.extractFeatures(m)
      .select($"doc_id", $"features").as[(Long, Seq[Float])]
      .collect().toMap
    val f = feats(0L)
    // sine RMS = amp/sqrt(2) ≈ 0.3536; mean|x| = 2·amp/π ≈ 0.3183;
    // zero crossings = 2 per cycle → 2·400/8000 = 0.1 per sample
    assert(math.abs(f(0) - 0.3536f) < 0.01, s"rms: $f")
    assert(math.abs(f(1) - 0.3183f) < 0.01, s"mean|x|: $f")
    assert(math.abs(f(2) - 0.1f) < 0.005, s"zcr: $f")
    assert(math.abs(f(3) - 0.5f) < 0.01, s"peak: $f")
    assert(math.abs(f(7)) < 0.01, s"dc offset ~0: $f")
    // non-audio falls back to the stub
    assert(feats(1L) == Multimodal.decodeStub("plain".getBytes).toSeq)
  }

  test("videoInfo parses real ISO-BMFF boxes: brand, duration, size") {
    def u32(v: Long): Array[Byte] = java.nio.ByteBuffer.allocate(4)
      .putInt(v.toInt).array()
    def b(t: String, body: Array[Byte]): Array[Byte] =
      u32(body.length + 8L) ++ t.getBytes("US-ASCII") ++ body
    val ftyp = b("ftyp", "isom".getBytes("US-ASCII") ++ u32(1))
    // mvhd v0: ver/flags + ctime + mtime + timescale=1000 + dur=5500
    val mvhd = b("mvhd",
      u32(0) ++ u32(0) ++ u32(0) ++ u32(1000) ++ u32(5500))
    // tkhd: ver/flags + filler, 16.16 fixed-point 640x360 at the tail
    val tkhd = b("tkhd",
      u32(0) ++ u32(0) ++ u32(0) ++ u32(640L << 16) ++ u32(360L << 16))
    val mp4 = ftyp ++ b("moov", mvhd ++ b("trak", tkhd))

    assert(Multimodal.videoInfo(mp4) ==
      Some(Multimodal.VideoInfo("isom", 5500L, 640, 360)))
    assert(Multimodal.videoInfo("not video".getBytes) == None)
    assert(Multimodal.videoInfo(solidImage(4, 4, 0, "png")) == None)
    // truncated/header-only boxes must yield None, never throw
    assert(Multimodal.videoInfo(ftyp ++ u32(8) ++
      "mvhd".getBytes("US-ASCII")) == None)
    assert(Multimodal.videoInfo(mp4.take(mp4.length - 6).toArray) !=
      null) // partial tail: parses what it can or None, no exception
    // the spec's unknown-duration sentinel must not become ~49 days
    val mvhdUnk = b("mvhd",
      u32(0) ++ u32(0) ++ u32(0) ++ u32(1000) ++ u32(0xFFFFFFFFL))
    assert(Multimodal.videoInfo(
      ftyp ++ b("moov", mvhdUnk ++ b("trak", tkhd))) ==
      Some(Multimodal.VideoInfo("isom", -1L, 640, 360)))
    // ...but in a VERSION-1 mvhd, 0xFFFFFFFF is a legitimate 64-bit
    // duration (~49.7 days), not the sentinel (which is all-ones 64)
    val mvhdV1 = b("mvhd", Array[Byte](1, 0, 0, 0) ++
      Array.fill[Byte](16)(0) ++ u32(1000) ++ u32(0) ++ u32(0xFFFFFFFFL))
    assert(Multimodal.videoInfo(
      ftyp ++ b("moov", mvhdV1 ++ b("trak", tkhd))) ==
      Some(Multimodal.VideoInfo("isom", 4294967295L, 640, 360)))
    // probeMeta routes it: video/mp4 with real width/height/duration
    val probed = Multimodal.probeMeta(mediaDf(Seq((0L, mp4))))
      .select("media_meta.media_type", "media_meta.width",
        "media_meta.height", "media_meta.duration_ms").head()
    assert(probed.getString(0) == "video/mp4" && probed.getInt(1) == 640
      && probed.getInt(2) == 360 && probed.getLong(3) == 5500L,
      s"got $probed")
  }

  test("resize upscale never overflows: payload is clamped, not wrapped") {
    // dimensionless payload (1x1 fallback) upscaled to 2048x2048:
    // keep = len * 2^22 overflows Int if narrowed before the clamp
    val m = Multimodal.asBinaryPayload(docs.filter($"doc_id" === 0L),
      "text")
    val r = Multimodal.resizeTo(m, w = 2048, h = 2048)
    val bytes = r.select("content").collect()(0).getAs[Array[Byte]](0)
    assert(bytes.length == "hello world".length,
      s"upscale keeps the full payload, got ${bytes.length}")
  }

  private def gradientImage(w: Int, h: Int,
      tweak: (Int, Int) => Int = (_, _) => 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = math.min(255,
          (x * 255 / math.max(1, w - 1) + tweak(x, y)).max(0))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out), "no png writer")
    out.toByteArray
  }

  test("dHash: real PNG decode -> exact block-mean grid -> stable hash") {
    val base = gradientImage(90, 64)
    val grid = Multimodal.grayGrid9x8(
      Multimodal.decodeImage(base).get)
    assert(grid.length == 72 && grid.forall(v => v >= 0 && v <= 255))
    // a left-to-right gradient compares every adjacent pair upward:
    // dHash is all-zero bits (g[c] > g[c+1] never holds)
    val h0 = Multimodal.dHash64(grid.toSeq)
    assert(h0 == 0L, s"monotone gradient must hash to 0, got $h0")
    // re-encoding the identical pixels hashes identically
    val h1 = Multimodal.dHash64(Multimodal.grayGrid9x8(
      Multimodal.decodeImage(gradientImage(90, 64)).get).toSeq)
    assert(h1 == h0)
    // a local bright patch flips only the comparison bits its grid
    // cells participate in: small positive Hamming distance
    val patched = gradientImage(90, 64,
      (x, y) => if (x >= 20 && x < 30 && y >= 8 && y < 16) 200 else 0)
    val h2 = Multimodal.dHash64(Multimodal.grayGrid9x8(
      Multimodal.decodeImage(patched).get).toSeq)
    val dist = java.lang.Long.bitCount(h0 ^ h2)
    assert(dist >= 1 && dist <= 8,
      s"a 10x8-pixel patch must flip a few bits, not $dist")
  }

  test("dHash64 equals q196's in-plan aggregate form on the same grid") {
    val grid = (0 until 72).map(i =>
      ((i * 37 + 11) % 256).toLong)
    val want = Multimodal.dHash64(grid)
    val got = spark.sql(
      s"""SELECT aggregate(sequence(0, 62), 0L, (acc, k) -> acc +
         |  IF(element_at(g, CAST(k div 8 AS INT) * 9
         |       + CAST(k % 8 AS INT) + 1) >
         |     element_at(g, CAST(k div 8 AS INT) * 9
         |       + CAST(k % 8 AS INT) + 2),
         |     shiftleft(1L, CAST(k AS INT)), 0L)) AS h
         |FROM (SELECT array(${grid.mkString("L,")}L) AS g)""".stripMargin)
      .head().getLong(0)
    assert(got == want,
      "the SQL-expression dHash and the driver dHash64 must agree")
  }

  test("dHashOf: images hash via pixels, other payloads via byte fold") {
    val img = gradientImage(45, 32)
    val df = mediaDf(Seq((1L, img), (2L, img),
      (3L, "not an image at all".getBytes("UTF-8"))))
    val got = Multimodal.dHashOf(df)
      .select("doc_id", "dhash").as[(Long, Long)].collect().toMap
    assert(got(1L) == got(2L), "identical images must collide")
    assert(got(1L) == 0L, "gradient hashes 0 through the pixel path")
    assert(got(3L) != got(1L) || got(3L) == 0L)
    assert(got.values.forall(_ >= 0L), "63-bit hash stays positive")
  }

  // ------------------------------------------------------------------
  // audio near-dup fingerprint
  // ------------------------------------------------------------------

  private def sineWav(freq: Double, n: Int = 4000, amp: Double = 0.5,
      rate: Float = 8000f): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val v = math.round(amp * math.sin(2 * math.Pi * freq * i / rate)
        * 32767).toInt
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audioFingerprint equals q199's in-plan expression form") {
    // deterministic pseudo-samples in the synthetic domain (the q199
    // fixture shape: 216 centered values), plus a sign-rich ramp —
    // the JVM function and the SQL expression must agree bit for bit
    // on the SAME samples, which is what lets the oracle replay the
    // fingerprint
    val cases = Seq(
      (0 until 216).map(j => ((j * 37 + 11) % 256) - 128).toArray,
      (0 until 216).map(j =>
        (if (j % 3 == 0) -1 else 1) * ((j * 97) % 127)).toArray)
    val inPlan = cases.zipWithIndex
      .map { case (s, i) => (i.toLong, s.map(_.toLong).toSeq) }
      .toDF("id", "sm")
      .withColumn("fp", expr(graft.queries.TextQ.audioFpFromSmE))
      .select("id", "fp").as[(Long, Long)].collect().toMap
    cases.zipWithIndex.foreach { case (s, i) =>
      assert(Multimodal.audioFingerprint(s) == inPlan(i.toLong),
        s"JVM and in-plan fingerprints diverge on case $i")
    }
  }

  test("audioFingerprintOf: real WAV decode path, stable + discriminating") {
    val wavA = sineWav(400.0)
    val wavB = sineWav(1900.0) // very different spectral shape
    val m = Seq((0L, wavA), (1L, wavA.clone()), (2L, wavB),
      (3L, "not audio at all".getBytes("UTF-8")))
      .toDF("doc_id", "content")
    val fps = Multimodal.audioFingerprintOf(m)
      .select("doc_id", "afp").as[(Long, Long)].collect().toMap
    assert(fps(0L) == fps(1L), "identical audio → identical fingerprint")
    assert(java.lang.Long.bitCount(fps(0L) ^ fps(2L)) > 3,
      "different waveforms land far apart")
    assert(fps.values.forall(_ >= 0L), "63-bit hash stays positive")
    // the real path went through ACTUAL samples: the same PCM through
    // the public decode + fingerprint agrees
    val (_, samples) = Multimodal.decodeAudio(wavA).get
    assert(fps(0L) == Multimodal.audioFingerprint(
      samples.map(x => math.round(x * 32768f))))
    // non-audio payloads fold bytes deterministically — stable too
    val fps2 = Multimodal.audioFingerprintOf(m)
      .select("doc_id", "afp").as[(Long, Long)].collect().toMap
    assert(fps2 == fps)
  }

  test("audio fingerprints serve through the shared dHash index") {
    val idx = tmpDir("afpidx")
    val b1 = Multimodal.audioFingerprintOf(
      Seq((1L, sineWav(400.0))).toDF("doc_id", "content"))
      .select("doc_id", "afp")
    Multimodal.dHashIncremental(b1, "doc_id", "afp", idx)
    val b2 = Multimodal.audioFingerprintOf(
      Seq((10L, sineWav(400.0)), (11L, sineWav(1900.0)))
        .toDF("doc_id", "content"))
      .select("doc_id", "afp")
    val got = pairsOf(
      Multimodal.dHashIncremental(b2, "doc_id", "afp", idx))
    assert(got == Set((1L, 10L, 0)),
      s"the exact copy matches its historical twin, the novel " +
        s"waveform stays: $got")
  }

  // ------------------------------------------------------------------
  // incremental dHash index
  // ------------------------------------------------------------------

  // hand-built hashes with controlled band structure:
  //   h0 = all-zero; h1 = h0 with bits 0,1 flipped (band 0 differs,
  //   bands 1-3 shared, Hamming 2); h2 = one bit flipped in EVERY
  //   band (no shared band with h0 — banding must never pair it,
  //   and Hamming 4 > 3 confirms the miss is correct); h3 = copy of
  //   h1; h4 = far from everything
  private val h0 = 0L
  private val h1 = 3L
  private val h2 = (1L << 1) | (1L << 17) | (1L << 33) | (1L << 49)
  private val h3 = 3L
  private val h4 = 0x5555555555555555L

  private def pairsOf(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long, Int)] =
    df.select("a_id", "b_id", "hamming").as[(Long, Long, Int)]
      .collect().toSet

  test("dHashIncremental: banded blocking + exact Hamming verification") {
    val idx = tmpDir("dhidx")
    val b1 = Seq((1L, h0), (2L, h2)).toDF("doc_id", "dhash")
    val b2 = Seq((10L, h1), (11L, h3), (12L, h4)).toDF("doc_id", "dhash")
    Multimodal.dHashIncremental(b1, "doc_id", "dhash", idx)
    val got = pairsOf(
      Multimodal.dHashIncremental(b2, "doc_id", "dhash", idx))
    // (1,10)/(1,11): historical h0 vs batch h1 twins, Hamming 2 via
    // three shared bands; (10,11): in-batch exact copies; h2 shares
    // no band with anything; h4 is far from everything
    assert(got == Set((1L, 10L, 2), (1L, 11L, 2), (10L, 11L, 0)))
    // the index stores 4 band rows per doc, full hash riding along
    val rows = graft.sink.CdcTable.read(spark, idx)
    assert(rows.count() == 5L * 4)
    assert(rows.columns.toSet == Set("doc_id", "band_key", "dhash"))
  }

  test("dHashIncremental radius narrows the verified pairs") {
    val idx = tmpDir("dhidx_r1")
    Multimodal.dHashIncremental(
      Seq((1L, h0)).toDF("doc_id", "dhash"), "doc_id", "dhash", idx,
      radius = 1)
    val got = pairsOf(Multimodal.dHashIncremental(
      Seq((10L, h1), (11L, h3)).toDF("doc_id", "dhash"),
      "doc_id", "dhash", idx, radius = 1))
    assert(got == Set((10L, 11L, 0)),
      "Hamming-2 candidates are blocked but fail radius-1 verification")
    intercept[IllegalArgumentException] {
      Multimodal.dHashIncremental(
        Seq((20L, h0)).toDF("doc_id", "dhash"), "doc_id", "dhash", idx,
        radius = 4)
    }
  }

  test("dHash index: compactIndex fold + retractIndex, probes unchanged") {
    val idx = tmpDir("dhidx_maint")
    Multimodal.dHashIncremental(
      Seq((1L, h0), (2L, h2)).toDF("doc_id", "dhash"),
      "doc_id", "dhash", idx)
    Multimodal.dHashIncremental(
      Seq((10L, h1), (11L, h3)).toDF("doc_id", "dhash"),
      "doc_id", "dhash", idx)
    val commitsBefore = graft.sink.CdcTable.log(idx).size
    Dedup.compactIndex(spark, idx)
    assert(graft.sink.CdcTable.log(idx).size == commitsBefore + 1)
    assert(graft.sink.CdcTable.read(spark, idx).count() == 4L * 4,
      "fold collapses to one DISTINCT row set")
    // probe after the fold sees exactly the pre-fold candidates
    val p1 = pairsOf(Multimodal.dHashIncremental(
      Seq((20L, h1)).toDF("doc_id", "dhash"), "doc_id", "dhash", idx))
    assert(p1 == Set((1L, 20L, 2), (10L, 20L, 0), (11L, 20L, 0)))
    // right-to-be-forgotten: doc 10's band rows retract (per-doc
    // ownership — the band_key → doc_id route)
    val removed = Dedup.retractIndex(spark, idx, Seq(10L).toDF("id"))
    assert(removed == 4L)
    val p2 = pairsOf(Multimodal.dHashIncremental(
      Seq((30L, h1)).toDF("doc_id", "dhash"), "doc_id", "dhash", idx))
    assert(p2 == Set((1L, 30L, 2), (11L, 30L, 0), (20L, 30L, 0)),
      "retracted doc no longer serves as a match; survivors still do")
  }

  test("dHashDedupStreamToTable: kept-only index, exactly-once restart") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = tmpDir("dhsidx")
    val out = tmpDir("dhsout")
    val ckpt = tmpDir("dhsckpt")
    // content flows as BINARY payloads; hashes come from dHashOf's
    // deterministic byte-fold stub — validate the fixture's distance
    // structure first so the assertions below test the STREAM, not
    // luck (exact copies hash equal; the novel docs must be > 3 bits
    // from everything else)
    val cA = "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa" * 8
    val cB = "0123456789!@#$%^&*()_+{}[]<>?,./;:ZYXWVU" * 11
    val cC = "the quick brown fox jumps over lazy dogs" * 5
    def payload(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "body")
        .withColumn("content", encode(col("body"), "UTF-8"))
        .drop("body")
    val fixture = Multimodal.dHashOf(
      payload(Seq((0L, cA), (1L, cB), (2L, cC))), "content")
      .select("doc_id", "dhash").as[(Long, Long)].collect().toMap
    for (Seq(x, y) <- fixture.keys.toSeq.sorted.combinations(2))
      assert(java.lang.Long.bitCount(fixture(x) ^ fixture(y)) > 3,
        s"fixture docs $x/$y must be mutually novel")

    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF.toDF("doc_id", "body")
      .withColumn("content", encode(col("body"), "UTF-8"))
      .drop("body")
    val q = Multimodal.dHashDedupStreamToTable(stream, "content",
      "doc_id", idx, out, ckpt)
    try {
      mem.addData((10L, cA), (11L, cB))
      q.processAllAvailable()
      // 20 is an exact copy of historical 10 → dropped; 21 novel
      mem.addData((20L, cA), (21L, cC))
      q.processAllAvailable()
    } finally q.stop()
    // restart from the checkpoint: the index lookback still covers
    // everything kept before the restart
    val q2 = Multimodal.dHashDedupStreamToTable(stream, "content",
      "doc_id", idx, out, ckpt)
    try {
      mem.addData((30L, cB), (31L, cA)) // both copies of kept docs
      q2.processAllAvailable()
    } finally q2.stop()
    val ids = graft.sink.CdcTable.read(spark, out)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(10L, 11L, 21L),
      s"copies dropped across the restart, novel docs kept: $ids")
    // kept-only index: 3 kept docs × 4 bands
    assert(graft.sink.CdcTable.read(spark, idx).count() == 3L * 4)
  }
}
