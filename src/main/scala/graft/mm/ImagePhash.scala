package graft.mm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real image decode + perceptual hash for the multimodal pipeline.
  *
  * The container ships no media fixtures, so the engine GENERATES its own:
  * deterministic 32x32 grayscale pixel grids (integer arithmetic on the
  * media id — replayable in plain SQL), encoded to real PNG bytes with the
  * JDK's ImageIO. Downstream kernels then do genuine image work: parse the
  * PNG container, decode the raster, and hash the low-frequency DCT
  * spectrum — the classic pHash recipe (Zauner, "Implementation and
  * benchmarking of perceptual image hash functions", 2010; the same
  * average-threshold low-frequency rule as the reference pHash library).
  *
  * Exactness contract (what lets a SQL oracle verify a real decoder):
  *  - grayscale PNG is LOSSLESS: decode(encode(grid)) == grid bit-for-bit,
  *    so pixel values are a pure integer function of the media id;
  *  - the 2-D DCT runs in FIXED-POINT integer arithmetic (the JPEG
  *    integer-DCT trick): cosines are pre-quantized to round(cos*2^14)
  *    constants, every product/sum is exact in 64-bit integers, and the
  *    threshold rule (63*coeff > sum of the 63 AC coefficients) is an
  *    integer comparison. No float leaves the kernel, so DuckDB replays
  *    the identical computation from the pixel formula + the same
  *    quantized cosine table injected as literals.
  *
  * Grid design: images fall in [[Groups]] families (id % Groups shares a
  * base image) and each id perturbs ~1/[[PertMod]] of its pixels by
  * inversion — same-family renditions land a small hamming apart (the
  * re-encoded/recompressed-asset situation pHash dedup exists for), while
  * cross-family hashes are far.
  */
object ImagePhash {
  val Size = 32
  val Groups = 25
  val PertMod = 97
  /** fixed-point scale for the quantized cosine table (2^14) */
  val CosScale = 16384L

  /** Largest media id the pixel formula is defined for: beyond it, the
    * pert polynomial id*1315423911 + x*2654435741 + y*2246822519 exceeds
    * Long range at the largest (x, y) — Java would WRAP silently (a
    * negative pert breaks the inversion rule and with it the PNG
    * losslessness the oracle scheme rests on) while DuckDB raises a
    * BIGINT-overflow error, so the engines would neither agree nor fail
    * alike. The bound subtracts the worst-case x/y addends BEFORE
    * dividing, so every (id, x, y) in-domain is exact. Guarded so both
    * sides fail loudly at the same boundary. */
  val MaxId: Long =
    (Long.MaxValue - 31L * 2654435741L - 31L * 2246822519L) / 1315423911L

  /** Deterministic grayscale value in [0, 254] for (id, x, y); the SQL
    * mirror lives in [[graft.queries.MiscQueries.pngPhashCtes]]. */
  def pixel(id: Long, x: Int, y: Int): Int = {
    require(id >= 0 && id <= MaxId,
      s"media id $id outside the pixel formula's exact domain [0, $MaxId]")
    val g = id % Groups
    val base = ((g * 2654435761L + x.toLong * 40503L + y.toLong * 65027L) % 255L).toInt
    val pert = (id * 1315423911L + x.toLong * 2654435741L + y.toLong * 2246822519L) % PertMod
    if (pert == 0L) 254 - base else base
  }

  /** Row-major (index = y*Size + x) 32x32 grid for a media id. */
  def pixelGrid(id: Long): Array[Int] = {
    val out = new Array[Int](Size * Size)
    var y = 0
    while (y < Size) {
      var x = 0
      while (x < Size) { out(y * Size + x) = pixel(id, x, y); x += 1 }
      y += 1
    }
    out
  }

  /** Per-thread PNG writer/reader + in-memory streams: `ImageIO.write`
    * and `ImageIO.read` scan the global plugin registry AND spin up a
    * DISK-backed stream cache (a temp file) on every call — per-row costs
    * that serialize/thrash a 32-thread encode or decode stage. Same
    * once-per-task rule as [[VideoFingerprint]]'s GIF codec and
    * [[AudioFingerprint]]'s WAV providers; the codec plugin doing the
    * actual PNG deflate/inflate work is unchanged. */
  private val pngWriter = ThreadLocal.withInitial[javax.imageio.ImageWriter] {
    () => ImageIO.getImageWritersByFormatName("png").next()
  }
  private val pngReader = ThreadLocal.withInitial[javax.imageio.ImageReader] {
    () => ImageIO.getImageReadersByFormatName("png").next()
  }

  /** Encode a square grayscale grid as real PNG bytes (JDK ImageIO). */
  def encodePng(pixels: Array[Int], size: Int = Size): Array[Byte] = {
    require(pixels.length == size * size, s"grid must be ${size}x$size")
    val img = new BufferedImage(size, size, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) { raster.setSample(x, y, 0, pixels(y * size + x)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    val writer = pngWriter.get()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(img)
      ios.flush()
    } finally {
      writer.setOutput(null) // keep the thread-local writer reusable
      ios.close()
    }
    bos.toByteArray
  }

  /** Decode PNG bytes back to a row-major square grayscale grid — the
    * REAL image-decode step (container parse + inflate + defilter), not a
    * stand-in. Grayscale PNG is lossless, so this inverts [[encodePng]]
    * exactly. Returns (pixels, size). */
  def decodeGraySized(bytes: Array[Byte]): (Array[Int], Int) = {
    val reader = pngReader.get()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(bytes))
    val img = try {
      reader.setInput(iis)
      try reader.read(0)
      catch { case _: javax.imageio.IIOException => null }
    } finally {
      reader.setInput(null) // keep the thread-local reader reusable
      iis.close()
    }
    require(img != null, "bytes are not a decodable image")
    require(img.getWidth == img.getHeight, s"expected a square image, got ${img.getWidth}x${img.getHeight}")
    val size = img.getWidth
    val raster = img.getRaster
    val out = new Array[Int](size * size)
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) { out(y * size + x) = raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (out, size)
  }

  /** [[decodeGraySized]] pinned to the [[Size]]x[[Size]] corpus grids (the
    * pHash/feature kernels assume the full-resolution grid). */
  def decodeGray(bytes: Array[Byte]): Array[Int] = {
    val (px, size) = decodeGraySized(bytes)
    require(size == Size, s"expected ${Size}x$Size, got ${size}x$size")
    px
  }

  /** Area-average downsample by an integer factor, in EXACT integer
    * arithmetic: each factor x factor block becomes the truncating mean
    * (sum DIV factor²) — the nearest-area-pooling resize a SQL oracle can
    * replay bit-for-bit (all inputs non-negative, so Java's truncation
    * toward zero equals floor division on both engines). */
  def downsample(pixels: Array[Int], size: Int, factor: Int): Array[Int] = {
    require(factor >= 1 && size % factor == 0,
      s"factor $factor must divide the image size $size")
    val out = new Array[Int](size / factor * (size / factor))
    val n = size / factor
    var yy = 0
    while (yy < n) {
      var xx = 0
      while (xx < n) {
        var s = 0
        var dy = 0
        while (dy < factor) {
          var dx = 0
          while (dx < factor) {
            s += pixels((yy * factor + dy) * size + (xx * factor + dx))
            dx += 1
          }
          dy += 1
        }
        out(yy * n + xx) = s / (factor * factor)
        xx += 1
      }
      yy += 1
    }
    out
  }

  /** Quantized DCT-II basis: CosQ(u)(x) = round(cos(pi*(2x+1)*u/64) * 2^14)
    * for u in [0,8), x in [0,32). Fixed constants — identical on driver,
    * executors, and (as injected literals) in the oracle. StrictMath.cos
    * (fdlibm) is bit-specified on every JVM/platform, so a heterogeneous
    * cluster cannot round a table entry differently from the driver that
    * built the oracle literals; the init-time check below additionally
    * proves no quantized value sits near a .5 rounding boundary (measured
    * min distance 0.0105), so even a 1-ulp cos difference could never
    * flip an entry. */
  val CosQ: Array[Array[Long]] = Array.tabulate(8, Size) { (u, x) =>
    val c = StrictMath.cos(Math.PI * (2 * x + 1) * u / (2.0 * Size)) * CosScale
    require(math.abs(c - math.floor(c) - 0.5) > 1e-6,
      s"CosQ($u)($x) = $c sits within 1e-6 of a rounding boundary")
    Math.round(c)
  }

  /** Classic pHash over a decoded grid, in exact integer arithmetic:
    * separable fixed-point 2-D DCT, keep the top-left 8x8 coefficients,
    * drop DC, set bit (u*8+v-1) iff 63*C(u,v) > sum of the 63 AC
    * coefficients (the average-threshold rule kept integral). 63 bits so
    * the hash stays a positive BIGINT on every engine. */
  def phash(pixels: Array[Int]): Long = {
    // G(u, y) = sum_x p(x, y) * CosQ(u)(x)
    val g = Array.ofDim[Long](8, Size)
    var u = 0
    while (u < 8) {
      val row = CosQ(u)
      var y = 0
      while (y < Size) {
        var s = 0L
        var x = 0
        while (x < Size) { s += pixels(y * Size + x) * row(x); x += 1 }
        g(u)(y) = s
        y += 1
      }
      u += 1
    }
    // C(u, v) = sum_y G(u, y) * CosQ(v)(y); AC sum + threshold bits
    val c = Array.ofDim[Long](8, 8)
    var acSum = 0L
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        val row = CosQ(v)
        var s = 0L
        var y = 0
        while (y < Size) { s += g(u)(y) * row(y); y += 1 }
        c(u)(v) = s
        if (u != 0 || v != 0) acSum += s
        v += 1
      }
      u += 1
    }
    var h = 0L
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        if ((u != 0 || v != 0) && 63L * c(u)(v) > acSum)
          h |= 1L << (u * 8 + v - 1)
        v += 1
      }
      u += 1
    }
    h
  }

  /** Decode + hash: the real-image kernel [[Multimodal.perceptualHashes]]
    * dispatches to for `image/png` payloads. */
  def phashImage(bytes: Array[Byte]): Long = phash(decodeGray(bytes))

  /** Decoded-pixel histogram features (16 bins over [0,255], L1-normalized
    * float32) — the real-image analog of the byte-histogram fallback. */
  def pixelFeatures(bytes: Array[Byte]): Array[Float] = {
    val px = decodeGray(bytes)
    val hist = new Array[Float](16)
    var i = 0
    while (i < px.length) { hist(px(i) / 16) += 1f; i += 1 }
    val n = math.max(px.length, 1).toFloat
    var j = 0
    while (j < 16) { hist(j) /= n; j += 1 }
    hist
  }
}
