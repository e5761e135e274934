package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Byte-level PNG header probe: real parse on valid headers, nulls on
  * anything else.
  */
class MultimodalSpec extends SparkSpec {

  test("jpegDims: segment walk to SOF; bad magic / truncation yield null") {
    import spark.implicits._
    // SOI, APP0 (len 4, skipped), SOF0 with height 0x00F0=240 width 0x0140=320
    val good = "FFD8" + "FFE00004AABB" + "FFC0001108" + "00F0" + "0140" +
      "03011100021100031100"
    val df = Seq(
      (1L, good),
      (2L, "89504E470D0A1A0A"),          // PNG magic — not a JPEG
      (3L, "FFD8FFE00004AABB"),          // truncated before any SOF
      (4L, "FFD8FFC000")                 // SOF but dimension words cut off
    ).toDF("id", "hexs").select(col("id"), unhex(col("hexs")).as("content"))
    val dims = graft.expressions.ImageExprs.jpegDims(col("content"))
    val got = df.select(col("id"), dims.getField("width").as("w"),
        dims.getField("height").as("h"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getAs[Integer]("w")), Option(r.getAs[Integer]("h")))).toMap
    assert(got(1L) === ((Some(320), Some(240))))
    assert(got(2L) === ((None, None)))
    assert(got(3L) === ((None, None)))
    assert(got(4L) === ((None, None)))
  }

  test("mp4Meta: box walk to mvhd, v0 and v1; junk and truncation yield null") {
    import spark.implicits._
    val ftyp = "00000010" + "66747970" + "69736F6D" + "00000000"
    // v0: timescale 0x00015F90 = 90000, duration 0x000186A0 = 100000
    val v0 = ftyp + "00000024" + "6D6F6F76" +
      "0000001C" + "6D766864" + "00000000" +
      "00000000" + "00000000" + "00015F90" + "000186A0"
    // v1: 64-bit times; timescale 1000, duration 0x1_00000001 (> 32 bit)
    val v1 = ftyp + "00000030" + "6D6F6F76" +
      "00000028" + "6D766864" + "01000000" +
      "0000000000000000" + "0000000000000000" +
      "000003E8" + "0000000100000001"
    val df = Seq(
      (1L, v0),
      (2L, v1),
      (3L, "89504E470D0A1A0A"),                    // PNG magic — not BMFF
      (4L, ftyp + "00000024" + "6D6F6F76" + "0000001C" + "6D766864"), // cut mvhd
      (5L, ftyp)                                   // no moov at all
    ).toDF("id", "hexs").select(col("id"), unhex(col("hexs")).as("content"))
    val m = graft.expressions.MediaExprs.mp4Meta(col("content"))
    val got = df.select(col("id"), m.getField("timescale").as("ts"),
        m.getField("duration").as("dur"), m.getField("version").as("v"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getAs[Integer]("ts")), Option(r.getAs[java.lang.Long]("dur")),
          Option(r.getAs[Integer]("v")))).toMap
    assert(got(1L) === ((Some(90000), Some(100000L), Some(0))))
    assert(got(2L) === ((Some(1000), Some(4294967297L), Some(1))))
    assert(got(3L) === ((None, None, None)))
    assert(got(4L) === ((None, None, None)))
    assert(got(5L) === ((None, None, None)))
  }

  test("pngDims: parses IHDR dims; non-PNG bytes yield nulls") {
    import spark.implicits._
    // width 300 (0x12C), height 200 (0xC8) — real big-endian IHDR words
    val png = "89504E470D0A1A0A0000000D49484452" + "0000012C" + "000000C8" + "08"
    val df = Seq(
      (1L, png),
      (2L, "FFD8FFE000104A464946"), // JPEG magic — not a PNG
      (3L, "0089504E")              // too short / misaligned
    ).toDF("id", "hexs").select(col("id"), unhex(col("hexs")).as("content"))
    val (isPng, w, h) = Multimodal.pngDims(col("content"))
    val got = df.select(col("id"), isPng.as("p"), w.as("w"), h.as("h"))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.getAs[java.lang.Long]("w")),
         Option(r.getAs[java.lang.Long]("h")))).toMap
    assert(got(1L) === ((true, Some(300L), Some(200L))))
    assert(got(2L) === ((false, None, None)))
    assert(got(3L) === ((false, None, None)))
  }

  test("decode: real ImageIO round trip (PNG/GIF/BMP), junk classifies null") {
    import spark.implicits._
    // PNG through the operator's own encoder
    val png = Multimodal.renderPng(7L, 33, 21)
    // GIF and BMP through the JDK's other built-in writers
    def enc(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, png), (2L, enc("gif", 15, 9)), (3L, enc("bmp", 8, 5)),
      (4L, "definitely not an image".getBytes("UTF-8")),
      (5L, png.take(20))) // truncated PNG: classify, never throw
      .toDF("id", "content")
    val got = Multimodal.extractFeatures(rows).collect()
      .map(f => f.id -> ((f.width, f.height, f.channels))).toMap
    assert(got(1L) === ((Some(33), Some(21), Some(3))))
    assert(got(2L)._1 === Some(15))
    assert(got(2L)._2 === Some(9))
    assert(got(3L) === ((Some(8), Some(5), Some(3))))
    assert(got(4L) === ((None, None, None)))
    assert(got(5L) === ((None, None, None)))
  }

  test("bmpDims: little-endian signed dims; top-down height folded; non-BMP null") {
    import spark.implicits._
    val head = "424D" + "00000000" + "00000000" + "36000000" + "28000000"
    val df = Seq(
      // 640 × 480 bottom-up: 0x280 LE, 0x1E0 LE
      (1L, head + "80020000" + "E0010000"),
      // 16 × 32 TOP-DOWN: height stored as -32 = 0xFFFFFFE0 LE
      (2L, head + "10000000" + "E0FFFFFF"),
      (3L, "474946383961AABB") // GIF magic — not a BMP
    ).toDF("id", "hexs").select(col("id"), unhex(col("hexs")).as("content"))
    val (isBmp, w, h) = Multimodal.bmpDims(col("content"))
    val got = df.select(col("id"), isBmp.as("b"), w.as("w"), h.as("h"))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.getAs[java.lang.Long]("w")),
         Option(r.getAs[java.lang.Long]("h")))).toMap
    assert(got(1L) === ((true, Some(640L), Some(480L))))
    assert(got(2L) === ((true, Some(16L), Some(32L))))
    assert(got(3L) === ((false, None, None)))
  }

  test("pixelStats: decoded component sum equals the generating function") {
    // closed-form sum over the 3×2 raster of v = (id·2654435761 + 7x
    // + 131y) & 0xFFFFFF, components (v>>16) + ((v>>8)&255) + (v&255)
    val id = 9L
    def comps(v: Long): Long = (v >> 16) + ((v >> 8) & 255) + (v & 255)
    val expect = (for (y <- 0 until 2; x <- 0 until 3)
      yield comps((id * 2654435761L + x * 7 + y * 131) & 0xFFFFFF)).sum
    val f = Multimodal.decode(id, Multimodal.renderPng(id, 3, 2))
    assert(f.width === Some(3) && f.height === Some(2))
    import spark.implicits._
    val got = Multimodal.pixelStats(
        Seq((id, Multimodal.renderPng(id, 3, 2)),
            (77L, "not an image".getBytes("UTF-8"))).toDF("id", "content"))
      .collect().map(p => p.id -> ((p.n_px, p.px_sum))).toMap
    assert(got(id) === ((Some(6L), Some(expect))))
    assert(got(77L) === ((None, None)))   // classify, never throw
  }

  test("resizeStats: nearest-neighbor kernel samples exactly; junk is null") {
    // 4×2 source → 2×1: kernel samples src (0,0) and (2,0)
    val id = 5L
    def comps(v: Long): Long = (v >> 16) + ((v >> 8) & 255) + (v & 255)
    def px(x: Int, y: Int): Long =
      comps((id * 2654435761L + x * 7 + y * 131) & 0xFFFFFF)
    import spark.implicits._
    val got = graft.operators.Multimodal.resizeStats(
        Seq((id, graft.operators.Multimodal.renderPng(id, 4, 2)),
            (9L, Array[Byte](1, 2, 3))).toDF("id", "content"), 2, 1)
      .collect().map(r => r.id -> ((r.rw, r.rh, r.px_sum))).toMap
    assert(got(id) === ((Some(2), Some(1), Some(px(0, 0) + px(2, 0)))))
    assert(got(9L) === ((None, None, None)))
  }

  test("audioStats: WAVE round trip sums exact PCM samples; junk is null") {
    val id = 123L
    val n = (id % 50 + 10).toInt
    val expect = (0 until n).map(i => (id * 31 + i * 17) % 65536 - 32768).sum
    val a = Multimodal.decodeAudio(id, Multimodal.renderWav(id))
    assert(a.n_samples === Some(n.toLong))
    assert(a.sample_sum === Some(expect))
    assert(a.sample_rate === Some(8000))
    val junk = Multimodal.decodeAudio(1L, Array[Byte](1, 2, 3, 4))
    assert(junk === Multimodal.AudioStats(1L, None, None, None))
    // a structurally valid RIFF/WAVE whose format the summing contract
    // rejects (8-bit) classifies as null too, not as a wrong number
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(Array[Byte](1, 2, 3, 4)), fmt8, 4)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val nonPcm16 = Multimodal.decodeAudio(2L, bos.toByteArray)
    assert(nonPcm16 === Multimodal.AudioStats(2L, None, None, None))
  }

  test("sampleFrames descriptors are demuxer-honest: monotone, in-range offsets") {
    // video decode is descriptor-only (no codec in the JDK); this pins
    // the seam's contract so it stays verifiable until a codec exists:
    // a real demuxer must be able to SEEK to every descriptor's offset,
    // so offsets are monotone non-decreasing per payload, start at 0,
    // and live inside [0, n_bytes) for non-empty payloads — including
    // payloads shorter than the frame count (offsets then repeat, never
    // overshoot)
    import spark.implicits._
    val docs = Seq(
      (1L, "x" * 1000),   // normal payload
      (2L, "ab"),         // shorter than the frame count
      (3L, "y" * 7)       // length not divisible by n
    ).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(
        Multimodal.withBinary(docs, "doc_id", "text", "video/mp4"), 3)
      .orderBy("id", "frame_idx")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3), r.getLong(4)))
    assert(frames.length === 9)
    frames.groupBy(_._1).foreach { case (id, fs) =>
      val sorted = fs.sortBy(_._2)
      assert(sorted.head._3 === 0L, s"id=$id first offset must be 0")
      sorted.sliding(2).foreach {
        case Array((_, _, o1, _), (_, _, o2, _)) =>
          assert(o1 <= o2, s"id=$id offsets not monotone: $o1 > $o2")
        case _ => ()
      }
      sorted.foreach { case (_, i, off, nb) =>
        assert(off >= 0L && off < nb, s"id=$id frame=$i offset $off outside [0,$nb)")
        assert(off === i.toLong * nb / 3, s"id=$id frame=$i offset not floor(i*len/n)")
      }
    }
  }

  test("dHash: 2x NN upscale hashes identical; brightness shift invariant; distinct patterns differ") {
    import spark.implicits._
    val rows = Seq(
      (1L, Multimodal.renderPng(42L, 20, 16)),
      (2L, Multimodal.renderPngScaled(42L, 20, 16, 2)), // exact 2x twin
      (3L, Multimodal.renderPng(43L, 20, 16)),          // different pattern
      (4L, Array[Byte](1, 2, 3)))                       // undecodable
      .toDF("id", "content")
    val got = Multimodal.dHash(rows).collect()
      .map(d => d.id -> d.dhash).toMap
    assert(got(1L).isDefined && got(1L) === got(2L)) // scale-invariant
    assert(got(3L).isDefined && got(1L) != got(3L)) // discriminates
    assert(got(4L).isEmpty)                          // junk -> null
    // cluster query: twin joins its original's cluster with keeper=min
    val clusters = graft.SparkEntry.queries("m_dhash_neardup")(
        spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    clusters.keys.filter(_ >= 100000L).foreach { twin =>
      assert(clusters(twin)._1 === clusters(twin - 100000L)._1,
        s"twin $twin not clustered with its original")
      assert(clusters(twin)._2 >= 2L)
    }
  }

  test("EXIF orientation: both TIFF byte orders, rejects out-of-range/missing") {
    import spark.implicits._
    def hexBytes(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def exifBe(v: Int): String =
      "FFD8FFE10022457869660000" + "4D4D002A00000008" + "0001" +
        "01120003" + "00000001" + f"$v%04X0000" + "00000000"
    def exifLe(v: Int): String =
      "FFD8FFE10022457869660000" + "49492A0008000000" + "0100" +
        "12010300" + "01000000" + f"$v%02X000000" + "00000000"
    // a non-orientation tag only (0x011A XResolution) — probe must
    // return null, not misread the value field
    val noTag = "FFD8FFE10022457869660000" + "4D4D002A00000008" + "0001" +
      "011A0003" + "00000001" + "00480000" + "00000000"
    val rows = Seq(
      1L -> exifBe(1), 2L -> exifBe(8), 3L -> exifLe(1), 4L -> exifLe(6),
      5L -> exifBe(0), 6L -> exifBe(9), // out of range -> null
      7L -> noTag)
      .map { case (id, h) => (id, hexBytes(h)) }.toDF("id", "content")
    val got = rows.select(col("id"),
        graft.expressions.ImageExprs.exifOrientation(col("content")))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(got === Map(1L -> Some(1), 2L -> Some(8), 3L -> Some(1),
      4L -> Some(6), 5L -> None, 6L -> None, 7L -> None))
  }

  test("AVI demux: frames, dims, and exact sums round-trip the container") {
    val id = 42L
    val avi = Multimodal.renderAviRaw(id, 8, 6, 3)
    assert(Multimodal.aviDims(avi) === Some((8, 6, 24, 0)))
    val frames = Multimodal.demuxAvi(avi)
    assert(frames.map(_._1) == Seq(0, 1, 2))
    assert(frames.forall { case (_, kind, p) => kind == "db" && p.length == 144 })
    // every frame's byte sum equals the closed-form generating sum
    frames.foreach { case (f, _, payload) =>
      val want = 3L * (0 until 48)
        .map(p => ((id * 31 + f * 7 + p) % 256 + 256) % 256).sum
      assert(payload.map(_ & 0xFF).map(_.toLong).sum == want, s"frame $f")
    }
    // bottom-up flip: the FIRST stored row is the generating function's
    // LAST raster row (p = 40..47), so demux really is decoding layout,
    // not just summing bytes
    val first = frames.head._3.take(24).grouped(3).map(_(0) & 0xFF).toSeq
    assert(first == (40 until 48).map(p => (id * 31 + p) % 256).map(_.toInt))
  }

  test("AVI demux: compressed chunks are a NULL seam, garbage is empty") {
    import spark.implicits._
    // flip one chunk's fourcc to the compressed '00dc': demux keeps the
    // frame slot, stats must yield NULLs for it and stay exact elsewhere
    val avi = Multimodal.renderAviRaw(7L, 8, 6, 2)
    val idx = {
      var i = avi.length - 1
      var found = -1
      while (i >= 3 && found < 0) {
        if (avi(i - 3) == '0' && avi(i - 2) == '0' &&
            avi(i - 1) == 'd' && avi(i) == 'b') found = i
        i -= 1
      }
      found
    }
    avi(idx) = 'c' // last frame becomes '00dc'
    val stats = Multimodal.aviFrameStats(
        Seq((7L, avi)).toDF("id", "content")).collect()
    assert(stats.length == 2)
    assert(stats.find(_.frame_idx == 0).get.px_sum.isDefined)
    assert(stats.find(_.frame_idx == 1).get.px_sum.isEmpty)
    // malformed container -> zero rows, never a crash
    assert(Multimodal.demuxAvi("not a riff file".getBytes).isEmpty)
    assert(Multimodal.demuxAvi(Array.empty[Byte]).isEmpty)
    // truncated mid-chunk -> STRICT: the whole container is discarded,
    // a partial prefix of frames must not look like a complete decode
    assert(Multimodal.demuxAvi(avi.take(avi.length - 50)).isEmpty)
    // hostile declared size near Int.MaxValue: the Long bounds check
    // must reject it (Int arithmetic would wrap and pass) — and the
    // stats path must yield zero rows, not a crash
    val hostile = Multimodal.renderAviRaw(1L, 8, 6, 1)
    // first chunk after 'AVI ' is 'LIST'; poison its size field
    hostile(16) = 0xF0.toByte; hostile(17) = 0xFF.toByte
    hostile(18) = 0xFF.toByte; hostile(19) = 0x7F.toByte
    assert(Multimodal.demuxAvi(hostile).isEmpty)
    val survived = Multimodal.aviFrameStats(
      Seq((1L, hostile), (2L, null.asInstanceOf[Array[Byte]]),
        (3L, Multimodal.renderAviRaw(3L, 8, 6, 1)))
        .toDF("id", "content")).collect()
    assert(survived.map(_.id).toSeq == Seq(3L),
      "hostile + null payloads must vanish, valid ones must survive")
  }

  test("AVI MJPEG: genuinely compressed '00dc' chunks decode end-to-end") {
    import spark.implicits._
    // three constant-gray frames (a constant block is DC-only, so JPEG
    // quantization error at q=0.95 is at most a couple of levels per
    // component — tight enough to assert against the generating value)
    val w = 16; val h = 16
    val vals = Seq(64, 128, 192)
    val frames = vals.map { v =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(v, v, v))
      g.fillRect(0, 0, w, h); g.dispose()
      img
    }
    val avi = Multimodal.renderAviMjpeg(w, h, frames)
    // container sanity: it IS an MJPG AVI with compressed chunks
    assert(Multimodal.aviDims(avi).map(_._4) === Some(Multimodal.MJPG))
    assert(Multimodal.demuxAvi(avi).map(_._2) === Seq("dc", "dc", "dc"))
    val stats = Multimodal.aviFrameStats(
      Seq((11L, avi)).toDF("id", "content")).collect().sortBy(_.frame_idx)
    assert(stats.length === 3)
    stats.zip(vals).foreach { case (fr, v) =>
      assert(fr.w === Some(w) && fr.h === Some(h),
        s"frame ${fr.frame_idx}: decoded dims missing — codec slot dead")
      val expect = v.toLong * w * h * 3
      val tol = 3L * w * h * 3 // ±3 levels/component of DC quantization
      assert(fr.px_sum.exists(s => math.abs(s - expect) <= tol),
        s"frame ${fr.frame_idx}: px_sum ${fr.px_sum} not within $tol of $expect")
    }
    // a non-MJPEG compressed stream still surfaces as a NULL descriptor:
    // flip biCompression to an unknown codec and the same chunks stop
    // decoding instead of crashing or lying
    val unknown = avi.clone()
    var i = 0
    var strfOff = -1
    while (i < unknown.length - 4 && strfOff < 0) {
      if (unknown(i) == 's' && unknown(i + 1) == 't' &&
          unknown(i + 2) == 'r' && unknown(i + 3) == 'f') strfOff = i
      i += 1
    }
    val compOff = strfOff + 8 + 16 // strf hdr(8) + biSize..biBitCount(16)
    unknown(compOff) = 'X'; unknown(compOff + 1) = '2'
    unknown(compOff + 2) = '6'; unknown(compOff + 3) = '4'
    val nulls = Multimodal.aviFrameStats(
      Seq((12L, unknown)).toDF("id", "content")).collect()
    assert(nulls.length === 3 && nulls.forall(_.px_sum.isEmpty))
  }

  test("AVI demux: audio-first multi-stream container routes to the vids stream") {
    def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length + (payload.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(cc.getBytes("US-ASCII")); b.putInt(payload.length); b.put(payload)
      b.array()
    }
    def list(tag: String, children: Array[Byte]*): Array[Byte] = {
      val body = children.foldLeft(Array.empty[Byte])(_ ++ _)
      val b = java.nio.ByteBuffer.allocate(12 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes("US-ASCII")); b.putInt(4 + body.length)
      b.put(tag.getBytes("US-ASCII")); b.put(body)
      b.array()
    }
    def strh(typ: String): Array[Byte] =
      typ.getBytes("US-ASCII") ++ new Array[Byte](52)
    // a WAVEFORMATEX-ish strf whose leading ints would parse as
    // absurd dims if misread as a BITMAPINFOHEADER
    val audioStrf = Array.tabulate[Byte](18)(i => (0xEE - i).toByte)
    val videoStrf = {
      val b = java.nio.ByteBuffer.allocate(40)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(40); b.putInt(8); b.putInt(6) // biSize, w, h
      b.putShort(1); b.putShort(24); b.putInt(0) // planes, bpp, BI_RGB
      b.putInt(144); b.array()
    }
    val frame = Array.tabulate[Byte](144)(i => (i % 256).toByte)
    val body = list("hdrl",
        list("strl", chunk("strh", strh("auds")), chunk("strf", audioStrf)),
        list("strl", chunk("strh", strh("vids")), chunk("strf", videoStrf))) ++
      list("movi", chunk("00wb", Array.fill[Byte](32)(0x55)),
        chunk("01db", frame))
    val avi = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("AVI ".getBytes("US-ASCII")).put(body).array()
    assert(Multimodal.aviVideoStream(avi) === Some(1))
    // dims come from the VIDS strf, not the audio one listed first
    assert(Multimodal.aviDims(avi) === Some((8, 6, 24, 0)))
    // demux follows stream 1's '01db' chunks; the audio '00wb' is skipped
    val frames = Multimodal.demuxAvi(avi)
    assert(frames.map(f => (f._1, f._2)) == Seq((0, "db")))
    assert(frames.head._3.toSeq == frame.toSeq)
  }

  test("aviSceneDiffs: SAD recomputed from the generating function") {
    import spark.implicits._
    val id = 11L
    val df = Seq((id, Multimodal.renderAviScenes(id, 8, 6, 9)))
      .toDF("id", "content")
    val got = Multimodal.aviSceneDiffs(df).collect()
      .map(d => (d.frame_idx, d.sad)).sortBy(_._1)
    def v(f: Int, p: Int): Long =
      (((id * 31 + (f / 4) * 131 + f * 3 + p * 5) % 256) + 256) % 256
    val want = (1 until 9).map(f =>
      (f, 3L * (0 until 48).map(p => math.abs(v(f, p) - v(f - 1, p))).sum))
    assert(got.toSeq == want)
    // the construction separates: cuts (f = 4, 8) spike over 9000,
    // within-scene drift stays under 1182
    want.foreach { case (f, sad) =>
      if (f % 4 == 0) assert(sad > 9000, s"cut at $f too small: $sad")
      else assert(sad <= 1182, s"drift at $f too large: $sad")
    }
  }

  test("m_audio_segments: islands match the block pattern ground truth") {
    import spark.implicits._
    // (id + b) % 3 != 0 marks loud blocks; for id = 7 that is blocks
    // {0,1, 3,4, 6,7} -> three segments
    val out = SparkEntry.queries("m_audio_segments")(
      spark, "/root/testdata/sf0.001")
      .filter(col("id") === 7L).orderBy(col("seg_start"))
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.toSeq == Seq((0, 1, 2L), (3, 4, 2L), (6, 7, 2L)))
    // and globally: every segment's frames are truly loud blocks
    val all = SparkEntry.queries("m_audio_segments")(
      spark, "/root/testdata/sf0.001").collect()
    all.foreach { r =>
      val (id, s, e) = (r.getLong(0), r.getInt(1), r.getInt(2))
      (s to e).foreach(b => assert((id + b) % 3 != 0,
        s"id $id segment [$s,$e] contains quiet block $b"))
      assert(r.getLong(3) == (e - s + 1).toLong)
    }
  }

  test("aviSceneDiffs: strict on mixed/malformed clips, lenient per id") {
    import spark.implicits._
    // a clip whose strf says 24bpp BI_RGB but whose frame is truncated
    // must yield ZERO diffs for that id; a healthy sibling id survives
    val bad = Multimodal.renderAviScenes(5L, 8, 6, 4)
    val truncated = java.util.Arrays.copyOf(bad, bad.length - 10)
    val out = Multimodal.aviSceneDiffs(Seq(
      (5L, truncated),
      (6L, Multimodal.renderAviScenes(6L, 8, 6, 4))).toDF("id", "content"))
      .collect()
    assert(out.forall(_.id == 6L) && out.length == 3)
  }

  test("codecInventory: containers, fourCCs, chunk counts, decodability") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val mp4 = {
      val b = java.nio.ByteBuffer.allocate(16)
      b.putInt(16); b.put("ftypisom".getBytes("US-ASCII")); b.putInt(0)
      b.array()
    }
    val rows = Multimodal.codecInventory(Seq(
      (1L, Multimodal.renderAviRaw(1L, 8, 6, 3)),
      (2L, Multimodal.renderAviMjpeg(8, 6, Seq(img, img))),
      (3L, Multimodal.renderAviCompressed(8, 6, "H264",
        Seq(Array[Byte](1, 2, 3)))),
      (4L, mp4),
      (5L, "not a container at all".getBytes("US-ASCII")),
      (6L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "content")).collect().map(c => c.id -> c).toMap
    assert(rows(1L).container === "avi")
    assert(rows(1L).codec === Some("DIB "))
    assert(rows(1L).n_video_chunks === 3 && rows(1L).decodable)
    assert(rows(2L).codec === Some("MJPG"))
    assert(rows(2L).n_video_chunks === 2 && rows(2L).decodable)
    assert(rows(3L).codec === Some("H264"))
    assert(rows(3L).n_video_chunks === 1 && !rows(3L).decodable)
    assert(rows(4L).container === "mp4" && rows(4L).codec === Some("isom")
      && !rows(4L).decodable)
    assert(rows(5L).container === "unknown" && rows(5L).codec === None)
    assert(rows(6L).container === "unknown" && !rows(6L).decodable)
  }
}
