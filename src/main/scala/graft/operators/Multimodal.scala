package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs per-partition over the binary batches.
  *
  * Image decode is REAL: `decode` runs the JDK's own `javax.imageio`
  * readers (PNG, GIF, BMP, JPEG, WBMP ship with every JRE — no
  * external codec needed), yielding true pixel dimensions and
  * color-model channel counts; payloads no reader recognizes classify
  * as null-dimensioned rather than erroring. Audio/video decoders are
  * NOT in the JDK, so those payloads take the same null path and the
  * frame-sampling operator emits descriptors, not decoded frames — the
  * per-partition execution shape (one decoder per partition, batch
  * iteration, never a driver-side loop) is exactly where a production
  * AV codec drops in.
  */
object Multimodal {

  // javax.imageio defaults to a DISK-backed stream cache — every
  // ImageIO.read/write spills the payload to a temp file first, so
  // decode throughput rides the state of the temp filesystem (observed
  // 6-8x swings on the same fixture). In-memory payloads never need
  // it; MemoryCache streams keep the per-partition decode CPU-bound.
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaMeta(n_bytes: Long, mime: String, digest: String)
  final case class MediaFeatures(id: Long, width: Option[Int],
                                 height: Option[Int], channels: Option[Int],
                                 digest: String)

  /** Attach a binary `content` column + metadata struct to (id, payload)
    * rows. With real media, `content` comes straight off the
    * `binaryFile` source instead.
    */
  def withBinary(df: DataFrame, idCol: String, payloadCol: String,
                 mime: String): DataFrame =
    df.select(col(idCol).as("id"),
      encode(col(payloadCol), "UTF-8").as("content"),
      struct(
        octet_length(encode(col(payloadCol), "UTF-8")).cast("long").as("n_bytes"),
        lit(mime).as("mime"),
        md5(encode(col(payloadCol), "UTF-8")).as("digest")).as("meta"))

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes).map(b => f"$b%02x").mkString

  /** REAL image decode via the JDK's `javax.imageio` (PNG/GIF/BMP/
    * JPEG/WBMP readers are part of the JRE): true pixel width/height
    * and the color model's component count. Classify, never throw —
    * unrecognized or corrupt payloads yield null dimensions (ImageIO
    * returns null for unknown formats; a reader crashing on a
    * truncated file is caught the same way).
    */
  private[graft] def decode(id: Long, content: Array[Byte]): MediaFeatures = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (img == null) MediaFeatures(id, None, None, None, md5Hex(content))
    else MediaFeatures(id, Some(img.getWidth), Some(img.getHeight),
      Some(img.getColorModel.getNumComponents), md5Hex(content))
  }

  /** Deterministic RGB test image rendered through the REAL encoder
    * (`ImageIO.write`, PNG): the generate side of the
    * generate-then-decode round-trip gate. Pixel values derive from
    * (id, x, y) so every payload differs.
    */
  private[graft] def renderPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((id * 2654435761L + x * 7 + y * 131) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The exact sc× nearest-neighbor upscale of [[renderPng]]'s image:
    * pixel (x, y) carries the base pattern at (x/sc, y/sc). Because
    * the NN floor arithmetic nests (⌊⌊sc·q⌋/sc⌋ = ⌊q⌋), any probe
    * that NN-resamples this image hits exactly the pixels it would
    * have hit on the original — the fixture for resize-invariance
    * gates like [[dHash]].
    */
  private[graft] def renderPngScaled(id: Long, w: Int, h: Int,
                                     sc: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w * sc, h * sc, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h * sc) {
      var x = 0
      while (x < w * sc) {
        img.setRGB(x, y,
          ((id * 2654435761L + (x / sc) * 7 + (y / sc) * 131) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Distributed feature extraction: one decoder per partition, rows
    * streamed through it — the execution shape for any per-payload
    * media op (resize, transcode, embed).
    */
  def extractFeatures(df: DataFrame): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (native handles etc.)
        it.map { case (id, bytes) => decode(id, bytes) }
      }
  }

  /** REAL (not stubbed) image-header probe: PNG signature check and
    * IHDR width/height, as pure binary column arithmetic — substring
    * into the big-endian dimension words, hex, parse. No codec library
    * involved, runs inside whole-stage codegen, so a 100 TB image
    * corpus gets dimension filtering ("drop icons under 64px") at scan
    * speed without ever invoking a decoder. Non-PNG payloads yield
    * null dimensions.
    */
  def pngDims(content: org.apache.spark.sql.Column)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
         org.apache.spark.sql.Column) = {
    val isPng = hex(substring(content, 1, 8)) === "89504E470D0A1A0A"
    val w = conv(hex(substring(content, 17, 4)), 16, 10).cast("long")
    val h = conv(hex(substring(content, 21, 4)), 16, 10).cast("long")
    (isPng, when(isPng, w), when(isPng, h))
  }

  /** REAL GIF header probe: GIF87a/GIF89a magic plus the
    * little-endian logical-screen dimensions at offsets 7 and 9 —
    * codegen'd column arithmetic like the PNG/WAV probes. Non-GIF
    * payloads yield (false, null, null). */
  def gifDims(content: org.apache.spark.sql.Column)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
         org.apache.spark.sql.Column) = {
    val sig = hex(substring(content, 1, 6))
    val isGif = sig === "474946383961" || sig === "474946383761"
    (isGif, when(isGif, leUint(content, 7, 2)),
      when(isGif, leUint(content, 9, 2)))
  }

  /** Little-endian unsigned int read: bytes at 1-based `off`
    * (width `n`), hex'd per byte and concatenated most-significant
    * first. Pure column algebra — the audio counterpart of the PNG
    * probe's big-endian reads.
    */
  private def leUint(c: org.apache.spark.sql.Column, off: Int, n: Int)
      : org.apache.spark.sql.Column =
    conv(concat((off + n - 1 to off by -1)
      .map(i => hex(substring(c, i, 1))): _*), 16, 10).cast("long")

  /** REAL BMP header probe: "BM" magic plus the little-endian signed
    * INT32 width/height at BITMAPINFOHEADER offsets 19/23 (1-based).
    * Height may legitimately be negative (top-down rows) — its
    * magnitude is the pixel height, so the sign is folded out the way
    * any raster reader does. Same codegen'd column algebra as the
    * PNG/GIF probes; non-BMP payloads yield (false, null, null).
    */
  def bmpDims(content: org.apache.spark.sql.Column)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
         org.apache.spark.sql.Column) = {
    val isBmp = hex(substring(content, 1, 2)) === "424D"
    def leInt32(off: Int): org.apache.spark.sql.Column = {
      val u = leUint(content, off, 4)
      when(u >= 2147483648L, u - 4294967296L).otherwise(u)
    }
    val h = leInt32(23)
    (isBmp, when(isBmp, leInt32(19)),
      when(isBmp, when(h < 0, -h).otherwise(h)))
  }

  /** REAL ID3v2 (MP3 tag) header probe: "ID3" magic, major version,
    * and the 28-bit SYNCSAFE tag size (four 7-bit groups, high bit of
    * every byte zero — the MP3 framing trick that keeps tag bytes from
    * mimicking an audio sync word). Same codegen'd column algebra as
    * the other probes; non-ID3 payloads yield (false, null, null).
    */
  def id3Meta(content: org.apache.spark.sql.Column)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
         org.apache.spark.sql.Column) = {
    val isId3 = hex(substring(content, 1, 3)) === "494433"
    def b(i: Int): org.apache.spark.sql.Column = leUint(content, i, 1)
    val size = b(7) * 2097152L + b(8) * 16384L + b(9) * 128L + b(10)
    (isId3, when(isId3, b(4)), when(isId3, size))
  }

  /** REAL WAV (RIFF) header probe: container magic check plus
    * channels / sample rate / bits-per-sample from the canonical fmt
    * chunk offsets — codegen'd column arithmetic, no audio library.
    * Non-WAV payloads yield nulls. (Assumes the standard layout with
    * `fmt ` as the first chunk — true for the overwhelming majority of
    * real files; a chunk-walking variant would follow JpegDims'
    * expression pattern.)
    */
  def wavMeta(content: org.apache.spark.sql.Column)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
         org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val isWav = hex(substring(content, 1, 4)) === "52494646" && // "RIFF"
      hex(substring(content, 9, 8)) === "57415645666D7420"      // "WAVEfmt "
    (isWav,
      when(isWav, leUint(content, 23, 2)),  // channels
      when(isWav, leUint(content, 25, 4)),  // sample rate
      when(isWav, leUint(content, 35, 2)))  // bits per sample
  }

  /** Frame-sampling plumbing for video-like payloads: emit `n` evenly
    * indexed frame descriptors per payload (a real implementation
    * replaces the descriptor with decoded frame bytes — the JDK ships
    * no video codec, so the decode seam stays a stub here).
    *
    * Each descriptor carries a byte offset a real demuxer could seek
    * to: evenly spaced floor(i·len/n) positions — monotone
    * non-decreasing in frame_idx and always inside [0, n_bytes) for a
    * non-empty payload (exact integer arithmetic, no doubles). This
    * keeps the seam verifiable until a codec exists: swapping in a
    * real demuxer only REPLACES the offset source (the container's
    * sample table) — the descriptor contract is already load-bearing.
    */
  def sampleFrames(df: DataFrame, n: Int): DataFrame =
    df.select(col("id"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_idx"),
        col("meta.digest").as("digest"),
        col("meta.n_bytes").cast("bigint").as("n_bytes"))
      .select(col("id"), col("frame_idx"),
        concat(col("digest"), lit(":"), col("frame_idx").cast("string"))
          .as("frame_key"),
        expr(s"(CAST(frame_idx AS BIGINT) * n_bytes) div ${n.toLong}")
          .as("byte_offset"),
        col("n_bytes"))

  // ------------------------------------------------------------------
  // Pixel-level image statistics (REAL decoded raster, not headers)
  // ------------------------------------------------------------------

  final case class PixelStats(id: Long, n_px: Option[Long],
                              px_sum: Option[Long])

  /** Exact sum of all 8-bit color components (R+G+B per pixel) of a
    * decoded raster. PNG truecolor is lossless, so the sum over a
    * decoded image equals the sum over the values the encoder wrote —
    * an exact-integer witness that the DECODED PIXELS are right, not
    * just the header dimensions.
    */
  private[graft] def pixelComponentSum(
      img: java.awt.image.BufferedImage): Long = {
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val v = img.getRGB(x, y)
        sum += ((v >> 16) & 0xFF) + ((v >> 8) & 0xFF) + (v & 0xFF)
        x += 1
      }
      y += 1
    }
    sum
  }

  /** Per-payload pixel statistics via the real ImageIO decode: pixel
    * count and exact component sum; undecodable payloads yield nulls.
    * Same per-partition decoder shape as `extractFeatures`.
    */
  def pixelStats(df: DataFrame): Dataset[PixelStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img == null) PixelStats(id, None, None)
        else PixelStats(id, Some(img.getWidth.toLong * img.getHeight),
          Some(pixelComponentSum(img)))
      })
  }

  final case class ResizeStats(id: Long, rw: Option[Int], rh: Option[Int],
                               px_sum: Option[Long])

  /** REAL image resize over the decoded raster: the standard
    * nearest-neighbor kernel, sampled explicitly (src = ⌊dst·srcDim /
    * dstDim⌋, exact integer arithmetic) rather than through Java2D's
    * implementation-defined filtered scaler — so the resized image is
    * bit-deterministic and its exact component sum is closed-form
    * predictable from the generating function. Emits the resized
    * dimensions and that sum; undecodable payloads yield nulls. Same
    * per-partition decoder shape as the other media ops (a production
    * resize kernel drops into the same seam).
    */
  def resizeStats(df: DataFrame, w2: Int, h2: Int): Dataset[ResizeStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img == null) ResizeStats(id, None, None, None)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var y2 = 0
          while (y2 < h2) {
            val sy = y2 * h / h2
            var x2 = 0
            while (x2 < w2) {
              val v = img.getRGB(x2 * w / w2, sy)
              sum += ((v >> 16) & 0xFF) + ((v >> 8) & 0xFF) + (v & 0xFF)
              x2 += 1
            }
            y2 += 1
          }
          ResizeStats(id, Some(w2), Some(h2), Some(sum))
        }
      })
  }

  final case class DHash(id: Long, dhash: Option[String])

  /** Difference-hash (dHash) perceptual fingerprint over the decoded
    * raster: nearest-neighbor resample to 9×8 (the same explicit
    * ⌊dst·srcDim/dstDim⌋ kernel as [[resizeStats]] — bit-deterministic,
    * no Java2D filtering), per-pixel brightness = r+g+b (an exact
    * integer, monotone in luminance — comparisons don't need the /3),
    * then bit(x,y) = bright(x+1,y) > bright(x,y) over each row: 64
    * bits emitted as a '0'/'1' string key. Constant-brightness shifts
    * and — because NN floor arithmetic nests (⌊⌊2q⌋/2⌋ = ⌊q⌋) — exact
    * integer upscales leave the hash IDENTICAL, which is what makes
    * it a resize-invariant dedup key. Undecodable payloads yield
    * null. Same per-partition decoder seam as the other media ops.
    */
  def dHash(df: DataFrame): Dataset[DHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img =
          try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img == null) DHash(id, None)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          def bright(x2: Int, y2: Int): Int = {
            val v = img.getRGB(x2 * w / 9, y2 * h / 8)
            ((v >> 16) & 0xFF) + ((v >> 8) & 0xFF) + (v & 0xFF)
          }
          val sb = new java.lang.StringBuilder(64)
          var y2 = 0
          while (y2 < 8) {
            var x2 = 0
            while (x2 < 8) {
              sb.append(if (bright(x2 + 1, y2) > bright(x2, y2)) '1' else '0')
              x2 += 1
            }
            y2 += 1
          }
          DHash(id, Some(sb.toString))
        }
      })
  }

  // ------------------------------------------------------------------
  // Sample-level audio statistics (REAL javax.sound.sampled decode)
  // ------------------------------------------------------------------

  final case class AudioStats(id: Long, n_samples: Option[Long],
                              sample_sum: Option[Long],
                              sample_rate: Option[Int])

  final case class AudioSamples(id: Long, samples: Option[Seq[Int]])

  /** Full decoded PCM sample vector (16-bit signed mono only, like
    * [[decodeAudio]]): the input surface for sample-level DSP
    * (spectrogram frames). Anything undecodable yields None — classify,
    * never throw.
    */
  private[graft] def decodeSamples(id: Long, content: Array[Byte])
      : AudioSamples =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        AudioSamples(id, None)
      else {
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          out(i) =
            if (fmt.isBigEndian)
              (bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xFF)
            else
              (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xFF)
          i += 1
        }
        AudioSamples(id, Some(out.toSeq))
      }
    } catch { case _: Exception => AudioSamples(id, None) }

  /** Per-payload decoded samples: per-partition decoder over binary
    * batches; the DSP downstream stays pure column algebra.
    */
  def audioSamples(df: DataFrame): Dataset[AudioSamples] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeSamples(id, bytes) })
  }

  /** Deterministic 16-bit signed PCM mono WAV rendered through the
    * REAL encoder (`AudioSystem.write`, WAVE container): the generate
    * side of the audio round-trip gate. `id % 50 + 10` samples at
    * 8 kHz, sample(i) = (id·31 + i·17) mod 2¹⁶ − 2¹⁵.
    */
  private[graft] def renderWav(id: Long): Array[Byte] =
    renderWavPcm((0 until (id % 50 + 10).toInt).map(i =>
      ((id * 31 + i * 17) % 65536 - 32768).toInt))

  /** Activity-structured PCM: 8 blocks of 8 samples; block b is LOUD
    * (|s| ≥ 16384, alternating sign) when (id + b) % 3 != 0 and QUIET
    * (|s| ≤ 64) otherwise — so energy-based voice-activity detection
    * has exact ground truth with per-id-varying segment boundaries.
    */
  private[graft] def renderWavSegments(id: Long): Array[Byte] =
    renderWavPcm((0 until 64).map { i =>
      val loud = (id + i / 8) % 3 != 0
      if (loud)
        ((if (i % 2 == 1) 1 else -1) *
          (16384 + (id * 31 + i * 17) % 16384)).toInt
      else ((id * 31 + i * 17) % 129 - 64).toInt
    })

  /** 16-bit mono 8 kHz WAVE through the REAL encoder, from explicit
    * sample values — the generate side shared by [[renderWav]] and
    * [[renderWavSegments]].
    */
  private[graft] def renderWavPcm(samples: Seq[Int]): Array[Byte] = {
    val n = samples.length
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = samples(i)
      data(2 * i) = (s & 0xFF).toByte            // little-endian PCM
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
      /* signed = */ true, /* bigEndian = */ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled`: the WAVE
    * reader parses the container, reports the format, and streams PCM
    * frames; the exact integer sample sum witnesses the decoded
    * SAMPLES, the way `pixelStats` witnesses decoded pixels. Only
    * 16-bit signed PCM is summed (the fixture's format); anything the
    * audio stack cannot parse yields nulls — classify, never throw.
    */
  private[graft] def decodeAudio(id: Long, content: Array[Byte])
      : AudioStats =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        AudioStats(id, None, None, None)
      else {
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        var sum = 0L
        var i = 0
        while (i < n) {
          val s =
            if (fmt.isBigEndian)
              (bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xFF)
            else
              (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xFF)
          sum += s
          i += 1
        }
        AudioStats(id, Some(n.toLong), Some(sum),
          Some(fmt.getSampleRate.toInt))
      }
    } catch { case _: Exception => AudioStats(id, None, None, None) }

  /** Per-payload audio statistics: per-partition decoder over binary
    * batches, like every other media op here.
    */
  def audioStats(df: DataFrame): Dataset[AudioStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeAudio(id, bytes) })
  }

  // ------------------------------------------------------------------
  // AVI (RIFF) demux + raw-frame pixel extraction — REAL video frames
  // ------------------------------------------------------------------
  //
  // Uncompressed AVI ('DIB ' streams, BI_RGB '00db' chunks) needs no
  // codec: each frame is a raw bottom-up BGR24 raster inside a RIFF
  // container. Demuxing the container and summing decoded components
  // is therefore a complete, honest video pipeline — container parse →
  // per-frame extraction → pixel arithmetic. The '00dc' compressed
  // seam is a working codec SLOT, not a stub: Motion-JPEG ('MJPG')
  // chunks — each a standalone JPEG — decode through the JDK's own
  // ImageIO; codecs with no JDK decoder (H.264 etc.) surface as NULL
  // descriptors, exactly where a native codec library would plug in.

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Deterministic uncompressed AVI: `nFrames` bottom-up BGR24 frames
    * of w×h where every component of pixel p (row-major, top-down
    * index) in frame f is `(id*31 + f*7 + p) mod 256` — a generating
    * function an external engine can replay in closed form. w*3 must
    * be DWORD-aligned (no row padding) so the byte sum IS the
    * component sum.
    */
  private[graft] def renderAviRaw(id: Long, w: Int, h: Int,
                                  nFrames: Int): Array[Byte] =
    renderAviWith(w, h, nFrames)((f, p) =>
      ((((id * 31 + f * 7 + p) % 256) + 256) % 256).toInt)

  /** Shared container writer: uncompressed RIFF/AVI, one '00db' BGR24
    * bottom-up frame per `f`, per-component value `pix(f, p)` at
    * TOP-DOWN row-major pixel index p (all three components equal).
    */
  private[graft] def renderAviWith(w: Int, h: Int, nFrames: Int)(
      pix: (Int, Int) => Int): Array[Byte] = {
    require((w * 3) % 4 == 0, s"row stride $w*3 must be DWORD-aligned")
    val frameBytes = w * h * 3
    val out = new java.io.ByteArrayOutputStream()
    // RIFF(12) + LIST hdrl hdr(12) + avih(64) + LIST strl hdr(12)
    // + strh(64) + strf(48) = 212
    val buf = java.nio.ByteBuffer.allocate(212)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def put4(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    val moviSize = 4 + nFrames * (8 + frameBytes)
    val hdrlSize = 4 + (8 + 56) + (8 + (4 + (8 + 56) + (8 + 40)))
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    put4("RIFF"); buf.putInt(riffSize); put4("AVI ")
    put4("LIST"); buf.putInt(hdrlSize); put4("hdrl")
    put4("avih"); buf.putInt(56)
    buf.putInt(40000) // us/frame (25 fps)
    buf.putInt(frameBytes * 25) // max bytes/sec
    buf.putInt(0); buf.putInt(0) // padding, flags
    buf.putInt(nFrames); buf.putInt(0) // total frames, initial frames
    buf.putInt(1) // streams
    buf.putInt(frameBytes) // suggested buffer
    buf.putInt(w); buf.putInt(h)
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0) // reserved
    put4("LIST"); buf.putInt(4 + (8 + 56) + (8 + 40)); put4("strl")
    put4("strh"); buf.putInt(56)
    put4("vids"); put4("DIB ")
    buf.putInt(0); buf.putInt(0); buf.putInt(0) // flags, prio+lang, initial
    buf.putInt(1); buf.putInt(25) // scale, rate -> 25 fps
    buf.putInt(0); buf.putInt(nFrames) // start, length
    buf.putInt(frameBytes); buf.putInt(-1); buf.putInt(0) // bufsize, quality, samplesize
    buf.putShort(0.toShort); buf.putShort(0.toShort) // rcFrame l,t
    buf.putShort(w.toShort); buf.putShort(h.toShort) // rcFrame r,b
    put4("strf"); buf.putInt(40)
    buf.putInt(40); buf.putInt(w); buf.putInt(h) // biSize, biWidth, biHeight (+ = bottom-up)
    buf.putShort(1.toShort); buf.putShort(24.toShort) // planes, bitcount
    buf.putInt(0) // BI_RGB
    buf.putInt(frameBytes); buf.putInt(0); buf.putInt(0)
    buf.putInt(0); buf.putInt(0)
    out.write(buf.array(), 0, buf.position())
    // LIST movi with one '00db' raw chunk per frame
    val movi = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    movi.put("LIST".getBytes("US-ASCII")); movi.putInt(moviSize)
    movi.put("movi".getBytes("US-ASCII"))
    out.write(movi.array(), 0, 12)
    var f = 0
    while (f < nFrames) {
      val ch = java.nio.ByteBuffer.allocate(8 + frameBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      ch.put("00db".getBytes("US-ASCII")); ch.putInt(frameBytes)
      // bottom-up rows, but the generating index p is the TOP-DOWN
      // row-major pixel number — the demuxer must undo the flip to
      // recover it (and the component SUM is orientation-invariant)
      var row = h - 1
      while (row >= 0) {
        var x = 0
        while (x < w) {
          val p = row * w + x
          val v = pix(f, p)
          ch.put(v.toByte); ch.put(v.toByte); ch.put(v.toByte)
          x += 1
        }
        row -= 1
      }
      out.write(ch.array(), 0, ch.position())
      f += 1
    }
    out.toByteArray
  }

  /** 'MJPG' as a BITMAPINFOHEADER biCompression value (the fourcc read
    * little-endian, how AVI stores it). */
  private[graft] val MJPG: Int =
    'M'.toInt | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)

  /** Motion-JPEG AVI: same RIFF layout as [[renderAviWith]] but the
    * video stream is genuinely COMPRESSED — handler/biCompression
    * 'MJPG', one '00dc' chunk per frame whose payload is a real JPEG
    * produced by the JDK's own ImageIO encoder. This is the one
    * compressed-video codec a zero-dependency JVM can round-trip, so
    * specs use it to prove the '00dc' seam in [[aviFrameStats]] is a
    * working codec slot, not a permanent NULL.
    */
  private[graft] def renderAviMjpeg(w: Int, h: Int,
      frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val payloads = frames.map { img =>
      val bos = new java.io.ByteArrayOutputStream()
      val writer =
        javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.95f)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      writer.dispose(); ios.close()
      bos.toByteArray
    }
    renderAviCompressed(w, h, "MJPG", payloads)
  }

  /** A compressed-stream AVI with an ARBITRARY codec fourcc (handler
    * and biCompression both set to it) wrapping the given opaque
    * '00dc' payloads: the fixture for codecs the JVM can NOT decode
    * (H.264, VP9, …) — m_codec_inventory uses it to prove the
    * inventory pass classifies foreign codecs without touching a
    * decoder. Layout identical to [[renderAviWith]].
    */
  private[graft] def renderAviCompressed(w: Int, h: Int, codec: String,
      payloads: Seq[Array[Byte]]): Array[Byte] = {
    require(codec.length == 4, s"codec fourcc must be 4 chars: '$codec'")
    val codecInt = codec(0).toInt | (codec(1).toInt << 8) |
      (codec(2).toInt << 16) | (codec(3).toInt << 24)
    val maxLen = payloads.map(_.length).max
    val out = new java.io.ByteArrayOutputStream()
    val buf = java.nio.ByteBuffer.allocate(212)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def put4(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    val moviSize = 4 + payloads.map(p => 8 + p.length + (p.length & 1)).sum
    val hdrlSize = 4 + (8 + 56) + (8 + (4 + (8 + 56) + (8 + 40)))
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    put4("RIFF"); buf.putInt(riffSize); put4("AVI ")
    put4("LIST"); buf.putInt(hdrlSize); put4("hdrl")
    put4("avih"); buf.putInt(56)
    buf.putInt(40000); buf.putInt(maxLen * 25)
    buf.putInt(0); buf.putInt(0)
    buf.putInt(payloads.length); buf.putInt(0)
    buf.putInt(1); buf.putInt(maxLen)
    buf.putInt(w); buf.putInt(h)
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0)
    put4("LIST"); buf.putInt(4 + (8 + 56) + (8 + 40)); put4("strl")
    put4("strh"); buf.putInt(56)
    put4("vids"); put4(codec)
    buf.putInt(0); buf.putInt(0); buf.putInt(0)
    buf.putInt(1); buf.putInt(25)
    buf.putInt(0); buf.putInt(payloads.length)
    buf.putInt(maxLen); buf.putInt(-1); buf.putInt(0)
    buf.putShort(0.toShort); buf.putShort(0.toShort)
    buf.putShort(w.toShort); buf.putShort(h.toShort)
    put4("strf"); buf.putInt(40)
    buf.putInt(40); buf.putInt(w); buf.putInt(h)
    buf.putShort(1.toShort); buf.putShort(24.toShort)
    buf.putInt(codecInt)
    buf.putInt(maxLen); buf.putInt(0); buf.putInt(0)
    buf.putInt(0); buf.putInt(0)
    out.write(buf.array(), 0, buf.position())
    val movi = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    movi.put("LIST".getBytes("US-ASCII")); movi.putInt(moviSize)
    movi.put("movi".getBytes("US-ASCII"))
    out.write(movi.array(), 0, 12)
    payloads.foreach { p =>
      val hdr = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      hdr.put("00dc".getBytes("US-ASCII")); hdr.putInt(p.length)
      out.write(hdr.array(), 0, 8)
      out.write(p, 0, p.length)
      if ((p.length & 1) == 1) out.write(0) // RIFF pad byte
    }
    out.toByteArray
  }

  /** Scene-structured AVI: same container as [[renderAviRaw]] but the
    * generating function jumps at every 4th frame ((f div 4)·131 —
    * a "cut") and drifts gently inside a scene (f·3 — "motion"), so a
    * real consecutive-frame-difference detector has something true to
    * find. Per-component values:
    * v(f, p) = (id·31 + (f div 4)·131 + f·3 + p·5) mod 256.
    */
  private[graft] def renderAviScenes(id: Long, w: Int, h: Int,
                                     nFrames: Int): Array[Byte] =
    renderAviWith(w, h, nFrames)((f, p) =>
      ((((id * 31 + (f / 4) * 131 + f * 3 + p * 5) % 256) + 256) % 256).toInt)

  /** Generic strict RIFF walk: visits every chunk as
    * (fourcc, payloadOff, size); descends into LISTs. Returns false —
    * and the caller must DISCARD partial results — on any malformed
    * chunk (negative or out-of-bounds size). All bound arithmetic runs
    * in Long: a hostile size near Int.MaxValue must fail the bounds
    * check, not wrap around it. Odd sizes consume a RIFF pad byte.
    */
  private def walkRiff(bytes: Array[Byte], off0: Int, end: Int)(
      visit: (String, Int, Int) => Unit): Boolean = {
    var off = off0
    while (off + 8 <= end) {
      val cc = fourcc(bytes, off)
      val sz = le32(bytes, off + 4)
      if (sz < 0 || off.toLong + 8L + sz > end) return false
      if (cc == "LIST") {
        if (!walkRiff(bytes, off + 12, off + 8 + sz)(visit)) return false
      } else visit(cc, off + 8, sz)
      val next = off.toLong + 8L + sz + (sz & 1)
      if (next > end) return false
      off = next.toInt
    }
    true
  }

  private def isAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" &&
      fourcc(bytes, 8) == "AVI "

  /** Index of the FIRST 'vids' stream among the strl headers (AVI
    * chunk ids are per-stream: stream N's video chunks are "NNdb" /
    * "NNdc"), or None if no video stream / malformed. An AVI that
    * lists audio first is routine — hardcoding stream 0 would demux
    * the wrong chunks.
    */
  private[graft] def aviVideoStream(bytes: Array[Byte]): Option[Int] = {
    if (!isAvi(bytes)) return None
    var idx = -1
    var vid: Option[Int] = None
    val ok = walkRiff(bytes, 12, bytes.length) { (cc, off, sz) =>
      if (cc == "strh" && sz >= 4) {
        idx += 1
        if (vid.isEmpty && fourcc(bytes, off) == "vids") vid = Some(idx)
      }
    }
    if (ok) vid else None
  }

  /** Walk the RIFF tree and return the VIDEO-stream chunks of the
    * 'movi' list in stream order: (frame_idx, kind, payload) with kind
    * "db" (uncompressed raster) or "dc" (compressed — surfaced so the
    * caller can route it to a codec; the honest stub seam). STRICT:
    * any malformed chunk (bad size, truncation) discards the whole
    * container — a partial prefix of frames must not masquerade as a
    * complete decode.
    */
  private[graft] def demuxAvi(bytes: Array[Byte])
      : Seq[(Int, String, Array[Byte])] = {
    val vidIdx = aviVideoStream(bytes) match {
      case Some(i) => f"$i%02d"
      case None => return Seq.empty
    }
    val out = Seq.newBuilder[(Int, String, Array[Byte])]
    var frame = 0
    val ok = walkRiff(bytes, 12, bytes.length) { (cc, off, sz) =>
      if (cc.startsWith(vidIdx) && (cc.endsWith("db") || cc.endsWith("dc"))) {
        out += ((frame, cc.substring(2),
          java.util.Arrays.copyOfRange(bytes, off, off + sz)))
        frame += 1
      }
    }
    if (ok) out.result() else Seq.empty
  }

  /** Frame dimensions from the strf BITMAPINFOHEADER of the first
    * 'vids' stream (the strf FOLLOWING that stream's strh — an audio
    * stream's strf is a WAVEFORMATEX and must not be misread as one).
    * Returns (width, |height|, bitcount, compression). */
  private[graft] def aviDims(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (!isAvi(bytes)) return None
    var res: Option[(Int, Int, Int, Int)] = None
    var lastStrhIsVids = false
    val ok = walkRiff(bytes, 12, bytes.length) { (cc, off, sz) =>
      if (cc == "strh" && sz >= 4)
        lastStrhIsVids = fourcc(bytes, off) == "vids"
      else if (cc == "strf" && sz >= 24 && lastStrhIsVids && res.isEmpty)
        res = Some((le32(bytes, off + 4), math.abs(le32(bytes, off + 8)),
          (bytes(off + 14) & 0xFF) | ((bytes(off + 15) & 0xFF) << 8),
          le32(bytes, off + 16)))
    }
    if (ok) res else None
  }

  final case class AviFrame(id: Long, frame_idx: Int, w: Option[Int],
                            h: Option[Int], px_sum: Option[Long])

  /** Per-frame exact component sums of every uncompressed frame in an
    * AVI payload column — demux + raw decode per partition. A
    * compressed ('dc') frame yields NULL stats (codec seam); a
    * malformed, truncated, or null container yields ZERO rows for
    * that id (strict: a partial prefix of frames never masquerades as
    * a complete decode); and — like every decoder in this module —
    * the per-record body is a catch-all seam, so one hostile payload
    * can never fail the task.
    */
  def aviFrameStats(df: DataFrame): Dataset[AviFrame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        try {
          val dims = aviDims(bytes)
          demuxAvi(bytes).map { case (f, kind, payload) =>
            dims match {
              case Some((w, h, 24, 0)) if kind == "db" &&
                  payload.length == w * h * 3 =>
                var s = 0L
                var i = 0
                while (i < payload.length) { s += (payload(i) & 0xFF); i += 1 }
                AviFrame(id, f, Some(w), Some(h), Some(s))
              // the codec slot: Motion-JPEG is the one compressed codec
              // the zero-dependency JVM ships a decoder for (each 'dc'
              // chunk is a standalone JPEG) — decode it for real; other
              // codecs (no JDK decoder exists) stay NULL descriptors
              case Some((_, _, _, MJPG)) if kind == "dc" =>
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(payload))
                if (img == null) AviFrame(id, f, None, None, None)
                else {
                  var s = 0L
                  var y = 0
                  while (y < img.getHeight) {
                    var x = 0
                    while (x < img.getWidth) {
                      val rgb = img.getRGB(x, y)
                      s += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) +
                        (rgb & 0xFF)
                      x += 1
                    }
                    y += 1
                  }
                  AviFrame(id, f, Some(img.getWidth), Some(img.getHeight),
                    Some(s))
                }
              case _ => AviFrame(id, f, None, None, None)
            }
          }
        } catch { case _: Exception => Seq.empty }
      })
  }

  final case class CodecInfo(id: Long, container: String,
                             codec: Option[String], n_video_chunks: Int,
                             decodable: Boolean)

  /** Per-file codec inventory: container kind, video codec fourcc,
    * video chunk count, and whether THIS JVM can actually decode the
    * stream (raw 'DIB ' always; 'MJPG' iff an ImageIO JPEG reader is
    * registered; any other codec — and any non-AVI container — no).
    *
    * This is the budgeting pass a 100 TB multimodal scan runs BEFORE
    * scheduling decode work: one per-partition header walk (no pixel
    * decode, no shuffle, columns pruned to id+content), after which
    * the pipeline knows exactly what fraction of the corpus its
    * decoders cover and routes the rest to the documented NULL seam
    * instead of discovering it mid-job. AVI codec = biCompression
    * when set, else the strh handler; MP4 reports the ftyp major
    * brand (the header fixture carries no track table); anything
    * unrecognized or malformed is container "unknown".
    */
  def codecInventory(df: DataFrame): Dataset[CodecInfo] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // probe the decoder registry once per partition, not per row
        val hasJpeg = javax.imageio.ImageIO
          .getImageReadersByFormatName("jpeg").hasNext
        it.map { case (id, bytes) =>
          try {
            if (isAvi(bytes)) {
              val dims = aviDims(bytes)
              val comp = dims.map(_._4)
              val codec = comp match {
                case Some(0) => aviHandler(bytes).orElse(Some("DIB "))
                case Some(c) => Some(fourccOfInt(c))
                case None => aviHandler(bytes)
              }
              var n = 0
              aviVideoStream(bytes).foreach { i =>
                val pfx = f"$i%02d"
                walkRiff(bytes, 12, bytes.length) { (cc, _, _) =>
                  if (cc.startsWith(pfx) &&
                      (cc.endsWith("db") || cc.endsWith("dc"))) n += 1
                }
              }
              // decodable means THIS module's decoders would produce
              // pixels: raw requires the BGR24 layout aviFrameStats
              // reads; MJPG requires a registered JPEG reader
              val dec = dims.exists(d => d._4 == 0 && d._3 == 24) ||
                (comp.contains(MJPG) && hasJpeg)
              CodecInfo(id, "avi", codec, n, dec)
            } else if (bytes != null && bytes.length >= 12 &&
                fourcc(bytes, 4) == "ftyp") {
              CodecInfo(id, "mp4", Some(fourcc(bytes, 8)), 0,
                decodable = false)
            } else CodecInfo(id, "unknown", None, 0, decodable = false)
          } catch {
            case _: Exception => CodecInfo(id, "unknown", None, 0,
              decodable = false)
          }
        }
      }
  }

  /** fccHandler of the first 'vids' strh, or None. */
  private def aviHandler(bytes: Array[Byte]): Option[String] = {
    var h: Option[String] = None
    val ok = walkRiff(bytes, 12, bytes.length) { (cc, off, sz) =>
      if (cc == "strh" && sz >= 8 && h.isEmpty &&
          fourcc(bytes, off) == "vids")
        h = Some(fourcc(bytes, off + 4))
    }
    if (ok) h else None
  }

  /** A biCompression value back to its fourcc string (little-endian). */
  private def fourccOfInt(c: Int): String =
    new String(Array((c & 0xFF).toByte, ((c >> 8) & 0xFF).toByte,
      ((c >> 16) & 0xFF).toByte, ((c >> 24) & 0xFF).toByte), "US-ASCII")

  final case class SceneDiff(id: Long, frame_idx: Int, sad: Long)

  /** Consecutive-frame difference from REAL demuxed AVI frames: for
    * each adjacent pair of uncompressed ('db') frames, the exact sum
    * of absolute per-component differences (SAD) — the standard
    * shot-boundary signal (a cut is a SAD spike; within-scene motion
    * is a low hum). One demux per payload per partition; the working
    * set is bounded by the payload already in memory as the binary
    * column value (frame pairs are compared in a single pass).
    * Mixed-codec clips are strict like [[aviFrameStats]]: any
    * compressed or size-mismatched frame aborts that id's diffs (a
    * partial diff sequence would silently shift scene boundaries).
    */
  def aviSceneDiffs(df: DataFrame): Dataset[SceneDiff] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        try {
          aviDims(bytes) match {
            case Some((w, h, 24, 0)) =>
              val frames = demuxAvi(bytes)
              if (frames.exists { case (_, kind, payload) =>
                    kind != "db" || payload.length != w * h * 3 })
                Seq.empty
              else
                frames.sliding(2).collect {
                  case Seq((f0, _, prev), (f1, _, cur)) if f1 == f0 + 1 =>
                    var s = 0L
                    var i = 0
                    while (i < cur.length) {
                      s += math.abs((cur(i) & 0xFF) - (prev(i) & 0xFF))
                      i += 1
                    }
                    SceneDiff(id, f1, s)
                }.toSeq
            case _ => Seq.empty
          }
        } catch { case _: Exception => Seq.empty }
      })
  }
}
