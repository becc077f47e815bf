package graft.mm

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.ServiceLoader
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, UnsupportedAudioFileException}
import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}
import scala.jdk.CollectionConverters._

/** Real audio decode + spectral fingerprint for the multimodal pipeline —
  * the WAV analog of [[ImagePhash]]'s PNG path.
  *
  * The container ships no media fixtures, so the engine GENERATES its own:
  * deterministic mono int16 PCM waveforms (integer arithmetic on the media
  * id — replayable in plain SQL), encoded to real WAV containers with the
  * JDK's `javax.sound.sampled`. Downstream kernels then do genuine audio
  * work: parse the RIFF/WAVE container, decode the PCM stream, and
  * fingerprint the short-time spectrum — the classic sign-of-difference
  * recipe (Haitsma & Kalker, "A highly robust audio fingerprinting
  * system", ISMIR 2002: bits are signs of band-energy differences across
  * adjacent frames and adjacent bands), here over fixed-point DCT band
  * coefficients instead of filterbank energies so every step stays in
  * exact 64-bit integers.
  *
  * Exactness contract (what lets a SQL oracle verify a real decoder):
  *  - 16-bit PCM WAV is LOSSLESS: decode(encode(samples)) == samples
  *    bit-for-bit, so sample values are a pure integer function of the
  *    media id;
  *  - the short-time transform runs in FIXED-POINT integer arithmetic:
  *    cosines are pre-quantized to round(cos*2^14) constants
  *    ([[ACosQ]], StrictMath so the table is bit-identical on every JVM),
  *    each frame-band coefficient is an exact 64-bit sum (|s| <= 2^15,
  *    |c| <= 2^14, 128 terms -> < 2^37), and the fingerprint bits are
  *    integer comparisons. No float leaves the kernel, so DuckDB replays
  *    the identical computation from the sample formula + the same
  *    quantized cosine table injected as literals.
  *
  * Waveform design mirrors the image corpus: ids fall in [[Groups]]
  * families (id % Groups shares a base waveform) and each id perturbs
  * ~1/[[PertMod]] of its samples by a low-12-bit flip (xor 0xFFF — see
  * the sample formula's doc for why that, not a full bitwise NOT, is the
  * "inversion") — same-family renditions land a small hamming apart (the
  * re-encoded/transcoded-asset situation audio dedup exists for), while
  * cross-family fingerprints are far.
  */
object AudioFingerprint {
  /** samples per analysis frame (the short-time window) */
  val FrameLen = 128
  /** number of frames per clip */
  val Frames = 10
  /** total samples per clip: 10 frames x 128 = 1280 (2,560 PCM bytes) */
  val Samples: Int = FrameLen * Frames
  val Groups = 25
  val PertMod = 97
  /** spectral bands per frame (DCT frequencies u in [0, Bands)) */
  val Bands = 8
  /** fixed-point scale for the quantized cosine table (2^14) */
  val CosScale = 16384L
  /** carried in the WAV header; irrelevant to the math */
  val SampleRate = 8000f

  /** Largest media id the sample formula is defined for — same contract
    * as [[ImagePhash.MaxId]]: beyond it the pert polynomial
    * id*1315423911 + i*2654435741 exceeds Long range at the largest i,
    * where Java would wrap silently but DuckDB raises a BIGINT-overflow
    * error. Guarded so both engines fail loudly at the same boundary. */
  val MaxId: Long =
    (Long.MaxValue - (Samples - 1).toLong * 2654435741L) / 1315423911L

  /** Deterministic int16 sample for (id, i); the SQL mirror lives in
    * [[graft.queries.MiscQueries]]'s wavPcmCtes. The perturbation flips
    * the LOW 12 BITS (xor 0xFFF — two's-complement-exact in both Java
    * long and DuckDB BIGINT, and closed over int16): a ~2^12 amplitude
    * nudge on ~1/97 of the samples, sized so same-family renditions land
    * a small fingerprint hamming apart while staying within int16. */
  def sample(id: Long, i: Int): Int = {
    require(id >= 0 && id <= MaxId,
      s"media id $id outside the sample formula's exact domain [0, $MaxId]")
    val g = id % Groups
    val base = (g * 2654435761L + i.toLong * 40503L) % 65536L - 32768L
    val pert = (id * 1315423911L + i.toLong * 2654435741L) % PertMod
    (if (pert == 0L) base ^ 0xFFFL else base).toInt
  }

  /** The full [[Samples]]-sample PCM clip for a media id. */
  def pcm(id: Long): Array[Short] = {
    val out = new Array[Short](Samples)
    var i = 0
    while (i < Samples) { out(i) = sample(id, i).toShort; i += 1 }
    out
  }

  private def audioFormat = new AudioFormat(SampleRate, 16, 1, true, false)

  /** Per-thread WAV codec providers: `AudioSystem.write` and
    * `AudioSystem.getAudioInputStream` consult the JDK's GLOBAL provider
    * registry on every call, and that lookup is synchronized
    * (`JDK13Services.getProviders`) — with 32 executor threads encoding
    * concurrently the lock serializes the whole embarrassingly-parallel
    * stage (measured: the parallel WAV stage ran ~3x slower than serial
    * until the registry left the per-row path). Resolving the same SPI
    * providers once per thread via `ServiceLoader` keeps the identical
    * JDK codec doing the identical RIFF work — only the synchronized
    * per-row registry consultation is gone. Same once-per-task rule as
    * [[VideoFingerprint]]'s thread-local GIF writer/reader. */
  private val wavWriter = ThreadLocal.withInitial[AudioFileWriter] { () =>
    ServiceLoader.load(classOf[AudioFileWriter]).iterator().asScala
      .find(w => w.isFileTypeSupported(AudioFileFormat.Type.WAVE))
      .getOrElse(sys.error("no WAV writer provider on this JVM"))
  }
  private val wavReaders = ThreadLocal.withInitial[Array[AudioFileReader]] {
    () => ServiceLoader.load(classOf[AudioFileReader]).iterator().asScala.toArray
  }

  /** Encode int16 samples as a real WAV container (RIFF header + LE PCM)
    * via the JDK sound stack. */
  def encodeWav(samples: Array[Short]): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(bytes), audioFormat, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    val n = wavWriter.get().write(ais, AudioFileFormat.Type.WAVE, bos)
    require(n > 0, "no WAV writer available")
    bos.toByteArray
  }

  /** Format negotiation over the thread-local provider list — the same
    * first-reader-that-accepts dispatch `AudioSystem.getAudioInputStream`
    * performs, minus its synchronized registry lookup. */
  private def openAudioStream(bytes: Array[Byte]): AudioInputStream = {
    val readers = wavReaders.get()
    var i = 0
    while (i < readers.length) {
      // each attempt gets a fresh stream: a rejecting reader may have
      // consumed header bytes past its own reset guarantee
      try return readers(i).getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: UnsupportedAudioFileException => }
      i += 1
    }
    throw new UnsupportedAudioFileException(
      s"no provider of ${readers.length} could decode the stream")
  }

  /** Decode WAV bytes back to int16 samples — the REAL audio-decode step
    * (RIFF container parse + format negotiation + PCM read), not a
    * stand-in. 16-bit PCM is lossless, so this inverts [[encodeWav]]
    * exactly. */
  def decodePcm(bytes: Array[Byte]): Array[Short] = {
    val ais = openAudioStream(bytes)
    val fmt = ais.getFormat
    require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
      fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"expected mono 16-bit LE signed PCM, got $fmt")
    val raw = ais.readAllBytes()
    val out = new Array[Short](raw.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
      i += 1
    }
    out
  }

  /** Quantized DCT-II basis for the short-time transform:
    * ACosQ(u)(x) = round(cos(pi*(2x+1)*u/256) * 2^14) for u in [0,8),
    * x in [0,128). StrictMath.cos (fdlibm) is bit-specified on every
    * JVM/platform; the init-time check proves no quantized value sits
    * near a .5 rounding boundary, so the table is identical on driver,
    * executors, and (as injected literals) in the oracle. */
  val ACosQ: Array[Array[Long]] = Array.tabulate(Bands, FrameLen) { (u, x) =>
    val c = StrictMath.cos(Math.PI * (2 * x + 1) * u / (2.0 * FrameLen)) * CosScale
    require(math.abs(c - math.floor(c) - 0.5) > 1e-6,
      s"ACosQ($u)($x) = $c sits within 1e-6 of a rounding boundary")
    Math.round(c)
  }

  /** Frame-band coefficient matrix C(n)(u) = sum_x s(n*128+x)*ACosQ(u)(x)
    * — exact 64-bit integers (< 2^37 in magnitude). */
  def bandCoefs(s: Array[Short]): Array[Array[Long]] = {
    require(s.length == Samples, s"expected $Samples samples, got ${s.length}")
    Array.tabulate(Frames, Bands) { (n, u) =>
      val row = ACosQ(u)
      var acc = 0L
      var x = 0
      while (x < FrameLen) { acc += s(n * FrameLen + x) * row(x); x += 1 }
      acc
    }
  }

  /** Haitsma–Kalker sign-of-difference fingerprint over the coefficient
    * matrix: bit (n-1)*7 + m (n in [1,10), m in [0,7)) is set iff
    * (C(n,m) - C(n,m+1)) - (C(n-1,m) - C(n-1,m+1)) > 0 — the frame-delta
    * of the band-delta, the ISMIR'02 bit rule with DCT coefficients in
    * place of filterbank energies. 9 frames x 7 band-diffs = 63 bits, so
    * the fingerprint stays a positive BIGINT on every engine. */
  def fingerprint(s: Array[Short]): Long = {
    val c = bandCoefs(s)
    var h = 0L
    var n = 1
    while (n < Frames) {
      var m = 0
      while (m < Bands - 1) {
        val d = (c(n)(m) - c(n)(m + 1)) - (c(n - 1)(m) - c(n - 1)(m + 1))
        if (d > 0) h |= 1L << ((n - 1) * (Bands - 1) + m)
        m += 1
      }
      n += 1
    }
    h
  }

  /** Decode + fingerprint: the real-audio kernel
    * [[Multimodal.perceptualHashes]] dispatches to for `audio/wav`. */
  def fingerprintWav(bytes: Array[Byte]): Long = fingerprint(decodePcm(bytes))

  /** Decoded-sample histogram features (16 bins over the int16 range,
    * L1-normalized float32) — the real-audio analog of the byte-histogram
    * fallback, dispatched from [[Multimodal.extractFeatures]]. */
  def sampleFeatures(bytes: Array[Byte]): Array[Float] = {
    val s = decodePcm(bytes)
    val hist = new Array[Float](16)
    var i = 0
    while (i < s.length) { hist((s(i) + 32768) / 4096) += 1f; i += 1 }
    val n = math.max(s.length, 1).toFloat
    var j = 0
    while (j < 16) { hist(j) /= n; j += 1 }
    hist
  }
}
