package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Real audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU —
  * public standard library, no external codec, the audio twin of
  * [[ImageDecodeStats]]): sample rate, channel count, bit depth, frame
  * count, duration, and the RMS amplitude of a deterministic bounded
  * prefix of the signal.
  *
  * Returns null for null/empty/undecodable payloads (the
  * "is this a valid audio file" filter and the stats extractor in one
  * pass). `rms` alone is null when the header parses but the sample
  * encoding isn't linear PCM in 8/16-bit (e.g. float WAV, µ-law) —
  * header stats are still real for those.
  *
  * Long recordings are NOT fully scanned: RMS reads at most 65536 frames
  * from the front (an hour of audio costs the same as a clip, and the
  * result is a pure, reproducible function of the bytes). Normalized to
  * full scale [0, 1] and rounded to 6 decimals for engine-stable
  * downstream math.
  *
  * Decode is an opaque library call → CodegenFallback, one call per
  * asset row, like [[ImageDecodeStats]].
  */
case class AudioDecodeStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_audio_stats expects a binary payload, got ${dt.sql}")
  }

  override def dataType: DataType = AudioDecodeStats.schema

  override def nullable: Boolean = true

  override def prettyName: String = "graft_audio_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) null
    else
      try {
        val in = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val frames = in.getFrameLength
          val rate = fmt.getSampleRate
          val durationMs: Any =
            if (frames >= 0 && rate > 0) (frames * 1000.0 / rate).toLong else null
          InternalRow(
            rate.toInt,
            fmt.getChannels,
            fmt.getSampleSizeInBits,
            if (frames >= 0) frames else null,
            durationMs,
            rmsPrefix(in, fmt, frames))
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** RMS of up to 65536 leading frames, full-scale normalized; null for
    * non-PCM-integer encodings. */
  private def rmsPrefix(
      in: javax.sound.sampled.AudioInputStream,
      fmt: javax.sound.sampled.AudioFormat,
      frames: Long): Any = {
    import javax.sound.sampled.AudioFormat.Encoding
    val bits = fmt.getSampleSizeInBits
    val pcmSigned = fmt.getEncoding == Encoding.PCM_SIGNED
    val pcmUnsigned = fmt.getEncoding == Encoding.PCM_UNSIGNED
    if (!(bits == 16 && pcmSigned) && !(bits == 8 && (pcmSigned || pcmUnsigned)))
      return null
    val frameSize = fmt.getFrameSize
    if (frameSize <= 0) return null
    val maxFrames = if (frames >= 0) math.min(frames, 65536L) else 65536L
    val want = (maxFrames * frameSize).toInt
    val buf = new Array[Byte](want)
    var off = 0
    var n = in.read(buf, 0, want)
    while (n > 0 && off + n < want) { off += n; n = in.read(buf, off, want - off) }
    val got = if (n > 0) off + n else off
    val usable = got - got % frameSize
    if (usable <= 0) return null
    var sum = 0.0
    var k = 0L
    var i = 0
    if (bits == 16) {
      val big = fmt.isBigEndian
      while (i + 1 < usable) {
        val s =
          if (big) ((buf(i) << 8) | (buf(i + 1) & 0xff)).toShort
          else ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
        val x = s / 32768.0
        sum += x * x
        k += 1
        i += 2
      }
    } else {
      while (i < usable) {
        val x =
          if (pcmUnsigned) ((buf(i) & 0xff) - 128) / 128.0
          else buf(i) / 128.0
        sum += x * x
        k += 1
        i += 1
      }
    }
    math.rint(math.sqrt(sum / k) * 1e6) / 1e6
  }

  override protected def withNewChildInternal(newChild: Expression): AudioDecodeStats =
    copy(child = newChild)
}

object AudioDecodeStats {
  val schema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("rms", DoubleType, nullable = true)))
}
