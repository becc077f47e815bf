package graft.mm

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}

/** Real video decode + temporal fingerprint for the multimodal pipeline —
  * the moving-picture analog of [[ImagePhash]] (PNG) and
  * [[AudioFingerprint]] (WAV), closing the brief's image/audio/video
  * triple.
  *
  * The container ships no media fixtures, so the engine GENERATES its own:
  * deterministic 10-frame 16x16 grayscale clips (integer arithmetic on the
  * media id — replayable in plain SQL), encoded to real multi-frame
  * animated GIF containers with the JDK's ImageIO GIF writer (GIF89a,
  * genuine LZW compression per frame). Downstream kernels then do genuine
  * video work: parse the GIF container, decode every frame's LZW stream,
  * and fingerprint the frame-to-frame spectral motion — the
  * sign-of-difference recipe shared with the audio path (Haitsma & Kalker,
  * ISMIR 2002), with per-frame DCT band coefficients over the frame's
  * column-sum profile standing in for filterbank energies.
  *
  * Exactness contract (what lets a SQL oracle verify a real decoder):
  *  - palette GIF is LOSSLESS for 8-bit grayscale: frames are encoded
  *    TYPE_BYTE_INDEXED over an identity gray palette (index i = gray i),
  *    LZW is lossless, and decoding reads the COLOR value (getRGB's low
  *    byte), so decode(encode(frames)) == frames bit-for-bit regardless
  *    of how the writer orders the palette;
  *  - the per-frame transform runs in FIXED-POINT integer arithmetic:
  *    cosines pre-quantized to round(cos*2^14) ([[VCosQ]], StrictMath),
  *    column sums and band coefficients exact 64-bit sums, fingerprint
  *    bits integer comparisons. No float leaves the kernel, so DuckDB
  *    replays the identical computation from the pixel formula + the
  *    injected cosine table.
  *
  * Clip design mirrors the image/audio corpora: ids fall in [[Groups]]
  * families (id % Groups shares a base clip) and each id perturbs
  * ~1/[[PertMod]] of its pixels by inversion — same-family renditions
  * (the re-encoded/transcoded-clip situation video dedup exists for) land
  * a small hamming apart, cross-family fingerprints are far.
  */
object VideoFingerprint {
  /** frame edge: 16x16 pixels per frame */
  val Side = 16
  /** frames per clip */
  val Frames = 10
  val Groups = 25
  val PertMod = 97
  /** spectral bands per frame (DCT frequencies over the column profile) */
  val Bands = 8
  /** fixed-point scale for the quantized cosine table (2^14) */
  val CosScale = 16384L

  /** Largest media id the pixel formula is defined for — same loud-at-the-
    * same-boundary contract as [[ImagePhash.MaxId]]/[[AudioFingerprint.MaxId]]:
    * the pert polynomial id*1315423911 + f*97003 + x*2654435741 +
    * y*2246822519 must stay in Long range at the largest (f, x, y). */
  val MaxId: Long =
    (Long.MaxValue - (Frames - 1).toLong * 97003L -
      (Side - 1).toLong * 2654435741L - (Side - 1).toLong * 2246822519L) /
      1315423911L

  /** Deterministic grayscale value in [0, 254] for (id, frame, x, y); the
    * SQL mirror lives in [[graft.queries.MiscQueries]]'s gifPixelCtes.
    * The base pans with the frame index (x + 3f drift — genuine motion,
    * so frame-difference bits carry signal) and slopes in x at a
    * PER-FAMILY rate (101 + 6g, all distinct and nonzero mod 255): the
    * fingerprint reads COLUMN-SUM profiles, and a family entering only as
    * an additive offset would smooth away under the sum (the g-multiplier
    * 2654435761 ≡ 1 mod 255 — measured: cross-family hamming collapsed to
    * med 2); a per-family slope changes the profile's SHAPE, which the
    * band coefficients separate cleanly. Perturbation flips pixels to
    * 254 - base exactly like the image corpus. */
  def pixel(id: Long, f: Int, x: Int, y: Int): Int = {
    require(id >= 0 && id <= MaxId,
      s"media id $id outside the pixel formula's exact domain [0, $MaxId]")
    val g = id % Groups
    val base = ((g * 2654435761L + (x + 3 * f).toLong * (101L + 6L * g) +
      y.toLong * 65027L) % 255L).toInt
    val pert = (id * 1315423911L + f.toLong * 97003L +
      x.toLong * 2654435741L + y.toLong * 2246822519L) % PertMod
    if (pert == 0L) 254 - base else base
  }

  /** Frame `f` of a media id as a row-major Side x Side grid. */
  def frameGrid(id: Long, f: Int): Array[Int] = {
    val out = new Array[Int](Side * Side)
    var y = 0
    while (y < Side) {
      var x = 0
      while (x < Side) { out(y * Side + x) = pixel(id, f, x, y); x += 1 }
      y += 1
    }
    out
  }

  /** All [[Frames]] frames of a clip. */
  def clip(id: Long): Array[Array[Int]] =
    Array.tabulate(Frames)(f => frameGrid(id, f))

  /** identity gray palette: index i = gray (i, i, i) — what makes the
    * palette codec lossless for 8-bit grayscale */
  private def grayPalette: IndexColorModel = {
    val ramp = Array.tabulate(256)(_.toByte)
    new IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** Per-thread scratch frame image, rewritten per frame: the writer
    * consumes the raster synchronously inside writeToSequence, so reuse
    * across frames and clips is safe and saves a BufferedImage + palette
    * allocation per frame. */
  private val scratchFrame = ThreadLocal.withInitial[BufferedImage] { () =>
    new BufferedImage(Side, Side, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
  }

  private def toIndexed(grid: Array[Int]): BufferedImage = {
    val img = scratchFrame.get()
    val raster = img.getRaster
    var y = 0
    while (y < Side) {
      var x = 0
      while (x < Side) { raster.setSample(x, y, 0, grid(y * Side + x)); x += 1 }
      y += 1
    }
    img
  }

  /** Per-thread GIF writer/reader: the ImageIO plugin-registry lookup is
    * expensive per call (measured: ~2.4 ms/clip end-to-end with per-clip
    * lookups + ImageIO's default DISK-backed stream caches — a temp file
    * per call; reuse + in-memory streams cut the kernel an order of
    * magnitude). ImageWriter/ImageReader are not thread-safe, so each of
    * the 32 local executor threads gets its own via ThreadLocal — the
    * same once-per-task-not-once-per-row rule the mapPartitions kernels
    * document. */
  private val gifWriter = ThreadLocal.withInitial[javax.imageio.ImageWriter] {
    () => ImageIO.getImageWritersByFormatName("gif").next()
  }
  private val gifReader = ThreadLocal.withInitial[javax.imageio.ImageReader] {
    () => ImageIO.getImageReadersByFormatName("gif").next()
  }

  /** Encode frame grids as a real multi-frame animated GIF (GIF89a
    * container, per-frame LZW) via the JDK ImageIO sequence writer. */
  def encodeGif(frames: Array[Array[Int]]): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    val writer = gifWriter.get()
    val bos = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      // one type specifier for every frame (all frames share the scratch
      // image's type); default metadata still built per frame — the GIF
      // writer mutates the local-color-table node during a sequence write
      val spec = new ImageTypeSpecifier(scratchFrame.get())
      frames.foreach { grid =>
        val img = toIndexed(grid)
        val meta = writer.getDefaultImageMetadata(spec, writer.getDefaultWriteParam)
        writer.writeToSequence(new IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence()
      ios.flush()
    } finally {
      writer.setOutput(null) // keep the thread-local writer reusable
      ios.close()
    }
    bos.toByteArray
  }

  /** Decode GIF bytes back to per-frame grayscale grids — the REAL video-
    * decode step (GIF container parse + per-frame LZW decode), not a
    * stand-in. Reads the COLOR value (getRGB low byte; R=G=B by
    * construction), so the round-trip is exact even if the writer
    * reordered the palette. */
  def decodeFrames(bytes: Array[Byte]): Array[Array[Int]] = {
    val reader = gifReader.get()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      require(n >= 1, "bytes are not a decodable GIF")
      Array.tabulate(n) { i =>
        val img = reader.read(i)
        require(img.getWidth == Side && img.getHeight == Side,
          s"expected ${Side}x$Side frames, got ${img.getWidth}x${img.getHeight}")
        val out = new Array[Int](Side * Side)
        var y = 0
        while (y < Side) {
          var x = 0
          while (x < Side) {
            out(y * Side + x) = img.getRGB(x, y) & 0xff
            x += 1
          }
          y += 1
        }
        out
      }
    } finally {
      reader.setInput(null) // keep the thread-local reader reusable
      iis.close()
    }
  }

  /** Quantized DCT-II basis over the column profile:
    * VCosQ(u)(x) = round(cos(pi*(2x+1)*u/32) * 2^14) for u in [0,8),
    * x in [0,16) — StrictMath + the .5-boundary assert, the same
    * bit-identical-everywhere contract as [[ImagePhash.CosQ]]. */
  val VCosQ: Array[Array[Long]] = Array.tabulate(Bands, Side) { (u, x) =>
    val c = StrictMath.cos(Math.PI * (2 * x + 1) * u / (2.0 * Side)) * CosScale
    require(math.abs(c - math.floor(c) - 0.5) > 1e-6,
      s"VCosQ($u)($x) = $c sits within 1e-6 of a rounding boundary")
    Math.round(c)
  }

  /** Per-frame band coefficients C(f)(u) = sum_x colsum(f, x)*VCosQ(u)(x),
    * where colsum(f, x) = sum_y pixel(f, x, y) — exact 64-bit integers
    * (colsum < 2^12, times 2^14, 16 terms -> < 2^30). */
  def bandCoefs(frames: Array[Array[Int]]): Array[Array[Long]] = {
    require(frames.length == Frames, s"expected $Frames frames, got ${frames.length}")
    frames.map { grid =>
      val colsum = new Array[Long](Side)
      var y = 0
      while (y < Side) {
        var x = 0
        while (x < Side) { colsum(x) += grid(y * Side + x); x += 1 }
        y += 1
      }
      Array.tabulate(Bands) { u =>
        val row = VCosQ(u)
        var acc = 0L
        var x = 0
        while (x < Side) { acc += colsum(x) * row(x); x += 1 }
        acc
      }
    }
  }

  /** Temporal sign-of-difference fingerprint — the exact bit rule of
    * [[AudioFingerprint.fingerprint]] over per-FRAME band coefficients:
    * bit (f-1)*7 + m (f in [1,10), m in [0,7)) is set iff
    * (C(f,m) - C(f,m+1)) - (C(f-1,m) - C(f-1,m+1)) > 0. 9 frame-deltas x
    * 7 band-diffs = 63 bits — a positive BIGINT on every engine, and the
    * same width the shared banded hamming-LSH machinery expects. */
  def fingerprint(frames: Array[Array[Int]]): Long = {
    val c = bandCoefs(frames)
    var h = 0L
    var f = 1
    while (f < Frames) {
      var m = 0
      while (m < Bands - 1) {
        val d = (c(f)(m) - c(f)(m + 1)) - (c(f - 1)(m) - c(f - 1)(m + 1))
        if (d > 0) h |= 1L << ((f - 1) * (Bands - 1) + m)
        m += 1
      }
      f += 1
    }
    h
  }

  /** Decode + fingerprint: the real-video kernel
    * [[Multimodal.perceptualHashes]] dispatches to for `video/gif`. */
  def fingerprintGif(bytes: Array[Byte]): Long = fingerprint(decodeFrames(bytes))

  /** Decoded-pixel histogram features across ALL frames (16 bins over
    * [0, 255], L1-normalized float32) — the real-video analog of the
    * byte-histogram fallback, dispatched from
    * [[Multimodal.extractFeatures]]. 2560 pixels per clip; counts are
    * recovered exactly by round(f * 2560). */
  def frameFeatures(bytes: Array[Byte]): Array[Float] = {
    val frames = decodeFrames(bytes)
    val hist = new Array[Float](16)
    var n = 0
    frames.foreach { grid =>
      var i = 0
      while (i < grid.length) { hist(grid(i) / 16) += 1f; i += 1 }
      n += grid.length
    }
    var j = 0
    while (j < 16) { hist(j) /= math.max(n, 1).toFloat; j += 1 }
    hist
  }
}
