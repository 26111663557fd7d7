package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def docs() = {
    import spark.implicits._
    Seq((1L, "hello world", "en", "srcA", 11L), (2L, "abc", "en", "srcB", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("typed decode pipeline produces deterministic features per payload") {
    val f1 = Multimodal.featuresOf(spark, docs()).collect()
      .map(r => r.getLong(0) -> r).toMap
    val f2 = Multimodal.featuresOf(spark, docs()).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(f1.keySet === Set(1L, 2L))
    assert(f1(1L).getInt(1) === 11) // n_bytes = utf8 length
    assert(f1(2L).getInt(1) === 3)
    // deterministic across runs
    f1.foreach { case (k, r) => assert(r === f2(k)) }
  }

  test("undecodable payloads surface as NULL features + decodable=false, never fakes") {
    val rows = Multimodal.featuresOf(spark, docs()).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      // container metadata stays real
      assert(r.getInt(1) > 0, "n_bytes")
      assert(r.getString(2).startsWith("fake/"), "format")
      // no shipped codec decodes fake/* payloads: honest NULLs
      assert(!r.getBoolean(3), "decodable")
      (4 to 10).foreach(i => assert(r.isNullAt(i), s"feature col $i must be NULL"))
    }
  }

  test("real decodes keep their feature values; only markers become NULL") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaFile(7L, Multimodal.solidBmp(5, 4, 10, 20, 30), "image/bmp"),
      Multimodal.MediaFile(8L, Array[Byte](1, 2), "fake/srcA")).toDS()
    val got = Multimodal.decode(media).collect().map(f => f.doc_id -> f).toMap
    assert((got(7L).width, got(7L).height, got(7L).n_frames) === ((5, 4, 1)))
    assert((got(8L).width, got(8L).height, got(8L).n_frames) === ((0, 0, 0)))
  }

  test("deterministic container round-trip matches its closed form per modality") {
    import spark.implicits._
    // ids cover each modality several times, incl. 0 and a 4-digit id
    val ids = (0L to 11L) :+ 1234L
    val docsDf = ids.map(i => (i, s"doc $i", "en", "srcA", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Multimodal.decodedFeatures(spark, docsDf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === ids.toSet)
    ids.foreach { id =>
      val (w, h) = ((id % 31 + 2).toInt, (id % 17 + 2).toInt)
      val k = 299 * ((id * 37) % 256) + 587 * ((id * 59) % 256) + 114 * ((id * 83) % 256)
      val r = got(id)
      assert((r.getInt(1), r.getInt(2)) === ((w, h)), s"dims of $id")
      (id % 3).toInt match {
        case 0 => // MP4: header-only, duration from mvhd
          assert(r.getInt(3) === 0)
          assert(r.getLong(4) === id % 9000 + 500)
          assert(r.getDouble(5) === 0.0)
        case 1 => // AVI: avih fields + lossless first-frame luma
          val frames = (id % 50 + 1).toInt
          val uspf = 20000L + (id % 100) * 100L
          assert(r.getInt(3) === frames)
          assert(r.getLong(4) === uspf * frames / 1000L)
          assert(r.getDouble(5) === k / 1000.0, s"solid-BMP frame luma of $id")
        case _ => // BMP image
          assert(r.getInt(3) === 1)
          assert(r.getLong(4) === 0L)
          assert(r.getDouble(5) === k / 1000.0, s"solid-BMP luma of $id")
      }
    }
  }

  test("real image decode: synthesized PNG/JPEG bytes yield true pixel dims") {
    import spark.implicits._
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 17) & 0xFFFFFF)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    val media = Seq(
      Multimodal.MediaFile(1L, imageBytes(17, 9, "png"), "image/png"),
      Multimodal.MediaFile(2L, imageBytes(33, 21, "jpg"), "image/jpeg"),
      Multimodal.MediaFile(3L, Array[Byte](1, 2, 3), "image/png"), // corrupt
      Multimodal.MediaFile(4L, "not an image".getBytes("UTF-8"), "fake/srcA")
    ).toDS()
    val got = Multimodal.decode(media).collect().map(f => f.doc_id -> f).toMap
    assert((got(1L).width, got(1L).height, got(1L).n_frames) === ((17, 9, 1)))
    assert((got(2L).width, got(2L).height, got(2L).n_frames) === ((33, 21, 1)))
    assert(got(1L).decoded && got(2L).decoded)
    // undecodable image bytes -> explicit decoded=false marker, not a fake
    assert(!got(3L).decoded)
    assert((got(3L).width, got(3L).height, got(3L).n_frames) === ((0, 0, 0)))
    // formats no shipped codec handles get the same marker — no fake dims
    assert(!got(4L).decoded)
    assert((got(4L).width, got(4L).height, got(4L).n_frames) === ((0, 0, 0)))
  }

  test("real audio decode: synthesized WAV yields true rate/channels/frames") {
    import spark.implicits._
    import javax.sound.sampled._
    def wavBytes(rate: Float, channels: Int, frames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, channels, true, false)
      val pcm = new Array[Byte](frames * fmt.getFrameSize)
      pcm.indices.foreach(i => pcm(i) = ((i * 37) & 0x7F).toByte)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val media = Seq(
      Multimodal.MediaFile(1L, wavBytes(8000f, 1, 800), "audio/wav"),
      Multimodal.MediaFile(2L, wavBytes(44100f, 2, 441), "audio/wav"),
      Multimodal.MediaFile(3L, Array[Byte](9, 9, 9), "audio/wav") // corrupt
    ).toDS()
    val got = Multimodal.decode(media).collect().map(f => f.doc_id -> f).toMap
    assert((got(1L).sample_rate, got(1L).channels, got(1L).n_frames) === ((8000, 1, 800)))
    assert((got(2L).sample_rate, got(2L).channels, got(2L).n_frames) === ((44100, 2, 441)))
    assert((got(1L).width, got(1L).height) === ((0, 0))) // audio has no pixel dims
    assert(got(1L).decoded && got(2L).decoded)
    // undecodable audio bytes -> explicit decoded=false marker, like images
    assert(!got(3L).decoded)
    assert((got(3L).sample_rate, got(3L).channels, got(3L).n_frames) === ((0, 0, 0)))
  }

  test("real video container-header decode: synthesized MP4 and AVI yield true dims/duration") {
    import spark.implicits._
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def le32(v: Long): Array[Byte] = be32(v).reverse
    def cc(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ cc(typ) ++ payload
    // mvhd v0: version/flags(4) created(4) modified(4) timescale(4) duration(4) + trailer
    def mvhd(timescale: Long, duration: Long): Array[Byte] =
      box("mvhd", Array.fill[Byte](12)(0) ++ be32(timescale) ++ be32(duration) ++
        Array.fill[Byte](80)(0))
    // tkhd v0: width/height as 16.16 fixed point at payload offsets 76/80
    def tkhd(w: Int, h: Int): Array[Byte] =
      box("tkhd", Array.fill[Byte](76)(0) ++ be32(w.toLong << 16) ++ be32(h.toLong << 16))
    val mp4 = box("ftyp", cc("isom") ++ be32(0)) ++
      box("moov", mvhd(1000, 7500) ++ box("trak", tkhd(640, 360)))
    // avih: usPerFrame @0, totalFrames @16, width @32, height @36 (40 bytes)
    val avih = cc("avih") ++ le32(40) ++
      le32(33333) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(90) ++ le32(0) ++
      le32(1) ++ le32(0) ++ le32(320) ++ le32(240)
    val hdrl = cc("LIST") ++ le32(4L + avih.length) ++ cc("hdrl") ++ avih
    val avi = cc("RIFF") ++ le32(4L + hdrl.length) ++ cc("AVI ") ++ hdrl
    val media = Seq(
      Multimodal.MediaFile(1L, mp4, "video/mp4"),
      Multimodal.MediaFile(2L, avi, "video/x-msvideo"),
      Multimodal.MediaFile(3L, Array[Byte](5, 5, 5, 5), "video/mp4") // corrupt
    ).toDS()
    val got = Multimodal.decode(media).collect().map(f => f.doc_id -> f).toMap
    // MP4: tkhd 16.16 dims, mvhd duration 7500/1000 s = 7500 ms
    assert((got(1L).width, got(1L).height, got(1L).duration_ms) === ((640, 360, 7500L)))
    // AVI: avih dims, 90 frames at 33333 us/frame = 2999 ms
    assert((got(2L).width, got(2L).height, got(2L).n_frames, got(2L).duration_ms) ===
      ((320, 240, 90, 2999L)))
    assert(got(1L).decoded && got(2L).decoded)
    // undecodable video bytes -> explicit decoded=false marker, like
    // images/audio
    assert(!got(3L).decoded)
    assert((got(3L).width, got(3L).height, got(3L).n_frames, got(3L).duration_ms) ===
      ((0, 0, 0, 0L)))
  }

  test("a real parse with all-zero header fields still reports decoded=true") {
    import spark.implicits._
    def le32(v: Long): Array[Byte] = Array((v & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
    // the motivating case for the explicit flag: a VALID AVI whose avih
    // fields are ALL ZERO — inferring decodability from feature values
    // would misreport this as undecodable
    val avih = cc("avih") ++ le32(40) ++ Array.fill[Byte](40)(0)
    val hdrl = cc("LIST") ++ le32(4L + avih.length) ++ cc("hdrl") ++ avih
    val avi = cc("RIFF") ++ le32(4L + hdrl.length) ++ cc("AVI ") ++ hdrl
    val media = Seq(
      Multimodal.MediaFile(1L, avi, "video/x-msvideo"),
      Multimodal.MediaFile(2L, Array[Byte](1, 2, 3), "video/x-msvideo")).toDS()
    val decoded = Multimodal.decode(media)
    val got = decoded.collect().map(f => f.doc_id -> f).toMap
    assert(got(1L).decoded, "zeroed avih is still a successful parse")
    assert((got(1L).width, got(1L).height, got(1L).n_frames, got(1L).duration_ms) ===
      ((0, 0, 0, 0L)))
    assert(!got(2L).decoded)
    // and through the features projection: decodable=true keeps the (zero)
    // fields while decodable=false rows get NULLs — same zero values,
    // distinguished only by the decoder's own flag
    val feats = Multimodal.featuresOfMedia(decoded).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(feats(1L).getBoolean(3), "decodable must follow the flag")
    assert(feats(1L).getInt(4) === 0)
    assert(!feats(2L).getBoolean(3))
    (4 to 10).foreach(i => assert(feats(2L).isNullAt(i)))
  }

  test("MJPEG-in-AVI first-frame pixels decode for real (exact luma round-trip)") {
    import spark.implicits._
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def le32(v: Long): Array[Byte] = be32(v).reverse
    def cc(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
    // paint a deterministic gradient, JPEG-encode it — the movi payload
    val img = new java.awt.image.BufferedImage(
      32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32)
      img.setRGB(x, y, ((x * 8) << 16) | ((y * 10) << 8) | ((x + y) & 0xFF))
    val jout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", jout)
    val jpeg = jout.toByteArray
    def chunk(id: String, payload: Array[Byte]): Array[Byte] =
      cc(id) ++ le32(payload.length) ++ payload ++
        (if (payload.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    val avih = cc("avih") ++ le32(40) ++
      le32(33333) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(1) ++ le32(0) ++ le32(32) ++ le32(24)
    val hdrl = cc("LIST") ++ le32(4L + avih.length) ++ cc("hdrl") ++ avih
    val frame = chunk("00dc", jpeg)
    val movi = cc("LIST") ++ le32(4L + frame.length) ++ cc("movi") ++ frame
    val body = hdrl ++ movi
    val avi = cc("RIFF") ++ le32(4L + body.length) ++ cc("AVI ") ++ body
    // independent expectation: decode OUR OWN jpeg bytes and apply the
    // documented BT.601 integer-milliluma mean — must match EXACTLY
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    var sum = 0L
    for (y <- 0 until decoded.getHeight; x <- 0 until decoded.getWidth) {
      val rgb = decoded.getRGB(x, y)
      sum += 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)
    }
    val expected = sum.toDouble / (decoded.getWidth.toLong * decoded.getHeight) / 1000.0
    // a header-only AVI (no movi list) is the inter-frame-codec shape:
    // real container fields, luma 0
    val headerOnly = cc("RIFF") ++ le32(4L + hdrl.length) ++ cc("AVI ") ++ hdrl
    val media = Seq(
      Multimodal.MediaFile(1L, avi, "video/x-msvideo"),
      Multimodal.MediaFile(2L, headerOnly, "video/x-msvideo")).toDS()
    val got = Multimodal.decode(media).collect().map(f => f.doc_id -> f).toMap
    assert((got(1L).width, got(1L).height, got(1L).n_frames) === ((32, 24, 1)))
    assert(got(1L).luma_mean === expected, "frame pixels must round-trip exactly")
    assert(expected > 1.0, "gradient frame must have non-trivial luminance")
    assert(got(2L).luma_mean === 0.0, "no movi frame -> no pixel stats")
    assert(got(2L).width === 32, "header fields still decode without frames")
  }

  test("video parsers refuse hostile/truncated containers without throwing") {
    // direct unit coverage of the byte walkers: truncated boxes, lying
    // sizes, zero-size boxes, empty arrays
    assert(Multimodal.parseMp4(Array.emptyByteArray).isEmpty)
    assert(Multimodal.parseAvi(Array.emptyByteArray).isEmpty)
    assert(Multimodal.parseMp4("RIFFgarbage not mp4 at all".getBytes).isEmpty)
    assert(Multimodal.parseAvi("RIFFxxxxNOTA".getBytes).isEmpty)
    // a box claiming a size far beyond the buffer must parse to nothing
    val lying = Array[Byte](0x7F, -1, -1, -1) ++ "moov".getBytes("ISO-8859-1") ++
      Array.fill[Byte](16)(0)
    assert(Multimodal.parseMp4(lying).isEmpty)
  }

  test("real image resize: scaled PNG re-decodes at the target dimensions") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(
      20, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 20).foreach(x => (0 until 10).foreach(y =>
      img.setRGB(x, y, (x * 13 + y * 7) & 0xFFFFFF)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val media = Seq(
      Multimodal.MediaFile(1L, out.toByteArray, "image/png"),
      Multimodal.MediaFile(2L, "plain bytes".getBytes("UTF-8"), "fake/srcA")
    ).toDS()
    val resized = Multimodal.resizeImages(media, 8, 4)
    val feats = Multimodal.decode(resized).collect().map(f => f.doc_id -> f).toMap
    assert((feats(1L).width, feats(1L).height) === ((8, 4)))
    // non-image rows pass through byte-identical
    val passthrough = resized.collect().find(_.doc_id == 2L).get
    assert(passthrough.content.toSeq === "plain bytes".getBytes("UTF-8").toSeq)
    assert(passthrough.format === "fake/srcA")
  }

  test("frame sampling explodes to one row per non-empty frame") {
    val frames = Multimodal
      .sampleFrames(Multimodal.attachPayload(docs()), nFrames = 3, frameBytes = 4)
      .collect()
    // doc 1: 11 bytes -> frames of 4,4,3 bytes; doc 2: 3 bytes -> 1 frame
    val byDoc = frames.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byDoc === Map(1L -> 3, 2L -> 1))
    assert(frames.forall(_.getInt(1) < 3))
  }

  test("metadata projection prunes the binary column at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("mm").toString
    Multimodal.attachPayload(docs()).write.mode("overwrite").parquet(dir)
    val meta = spark.read.parquet(dir)
      .select(col("doc_id"), octet_length(col("content")).as("n_bytes"))
    // content must be read (octet_length needs it), but format must not be:
    val plan = meta.queryExecution.executedPlan.toString
    assert(!plan.contains("format"), s"format column not pruned:\n$plan")
  }
}
