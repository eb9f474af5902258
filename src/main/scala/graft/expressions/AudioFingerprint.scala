package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** 64-bit perceptual audio fingerprint — the audio twin of
  * [[ImagePHash]], in the published Haitsma–Kalker (Philips robust
  * hash) shape reduced to one signature per clip: decode PCM
  * (javax.sound — WAV/AIFF/AU, the same stack as [[AudioDecodeStats]]),
  * downmix to mono, split the first ~10 s into 9 time segments, measure
  * energy in 8 log-spaced frequency bands per segment (one Goertzel
  * recurrence per band — no FFT dependency), then bit (s·8 + b) = "band
  * b got louder from segment s to segment s+1".
  *
  * Robustness by construction: bits are energy COMPARISONS, so any
  * global gain change (volume, lossy re-encode amplitude drift) cancels;
  * band frequencies are absolute Hz and segments are fractions of the
  * clip, so the same material at a different sample rate fingerprints
  * (nearly) identically. Unrelated material lands ~32 bits away —
  * Hamming-threshold near-dup rides
  * [[graft.dedup.Dedup.hammingNearDupPairs]] unchanged.
  *
  * Deterministic double arithmetic over the decoded samples: the same
  * bytes hash identically on any executor. Null for null/empty/
  * undecodable payloads. CodegenFallback like the other decode kernels —
  * one opaque library call per asset row. */
case class AudioFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_audio_fingerprint expects a binary payload, got ${dt.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audio_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    AudioFingerprint.fingerprint(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): AudioFingerprint =
    copy(child = newChild)
}

object AudioFingerprint {

  /** 9 segments → 8 transition rows of 8 band bits. */
  private val Segments = 9
  /** Log-spaced analysis bands (Hz), ~1.6× apart, inside speech/music
    * energy and below the Nyquist of common rates. */
  private[graft] val BandsHz: Array[Double] =
    Array(250, 400, 640, 1024, 1638, 2621, 4194, 6710).map(_.toDouble)
  /** Analysis window cap: fingerprint the first 10 seconds. */
  private val MaxSeconds = 10.0

  /** Goertzel power of `x(from until to)` at normalized frequency
    * `f/sr` — |Σ x·e^{-i2πft/sr}|², one real recurrence. */
  private def goertzel(x: Array[Double], from: Int, to: Int, freqPerSr: Double): Double = {
    val w = 2.0 * math.Pi * freqPerSr
    val coeff = 2.0 * math.cos(w)
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
    var i = from
    while (i < to) {
      s0 = x(i) + coeff * s1 - s2
      s2 = s1; s1 = s0
      i += 1
    }
    s1 * s1 + s2 * s2 - coeff * s1 * s2
  }

  /** Fingerprint of decoded mono samples at `sampleRate`; null when the
    * clip is too short to segment. */
  private[graft] def ofSamples(x: Array[Double], sampleRate: Double): java.lang.Long = {
    if (x.length < Segments * 2) return null
    val nyquistBands = BandsHz.count(_ < sampleRate / 2.0)
    val e = Array.ofDim[Double](Segments, BandsHz.length)
    var s = 0
    while (s < Segments) {
      val from = (s.toLong * x.length / Segments).toInt
      val to = ((s + 1L) * x.length / Segments).toInt
      val n = (to - from).toDouble
      var b = 0
      while (b < nyquistBands) {
        // normalize by segment length so unequal segment sizes (clip
        // length not divisible by 9) don't bias the comparisons
        e(s)(b) = goertzel(x, from, to, BandsHz(b) / sampleRate) / (n * n)
        b += 1
      }
      s += 1
    }
    // deadband: comparisons between two near-silent cells flip on
    // quantization/resampling noise (measured: up to 8 twin bits without
    // it); requiring the rise to clear a small fraction of the clip's
    // loudest cell suppresses exactly those noise bits while leaving
    // every real transition (orders of magnitude above) untouched
    var maxE = 0.0
    var ms = 0
    while (ms < Segments) {
      var mb = 0
      while (mb < BandsHz.length) { if (e(ms)(mb) > maxE) maxE = e(ms)(mb); mb += 1 }
      ms += 1
    }
    val tau = 1e-4 * maxE
    var bits = 0L
    var t = 0
    while (t < Segments - 1) {
      var b = 0
      while (b < BandsHz.length) {
        // bands above Nyquist hold 0.0 on both sides -> bit stays 0,
        // keeping fingerprints comparable across sample rates
        if (e(t + 1)(b) > e(t)(b) + tau) bits |= 1L << (t * 8 + b)
        b += 1
      }
      t += 1
    }
    bits
  }

  /** Decode + fingerprint; null when the bytes don't decode. */
  private[graft] def fingerprint(bytes: Array[Byte]): java.lang.Long = {
    if (bytes == null || bytes.isEmpty) return null
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(bytes)))
      try {
        val src = in.getFormat
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          2 * src.getChannels, src.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
        val sr = target.getSampleRate.toDouble
        val channels = target.getChannels
        val maxFrames = (sr * MaxSeconds).toLong
        val frameBytes = 2 * channels
        val raw = pcm.readNBytes(
          (math.min(maxFrames, Int.MaxValue / frameBytes) * frameBytes).toInt)
        val nFrames = raw.length / frameBytes
        val mono = new Array[Double](nFrames)
        var f = 0
        while (f < nFrames) {
          var c = 0
          var sum = 0.0
          while (c < channels) {
            val o = f * frameBytes + 2 * c
            sum += ((raw(o) & 0xff) | (raw(o + 1) << 8)).toShort.toDouble
            c += 1
          }
          mono(f) = sum / channels
          f += 1
        }
        ofSamples(mono, sr)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => null }
  }
}
