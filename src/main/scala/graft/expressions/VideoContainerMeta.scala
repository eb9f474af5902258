package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Video CONTAINER metadata from payload bytes — no codec required.
  *
  * Parses the two public container formats by their published byte
  * layouts (pure arithmetic over the header bytes, no library call):
  *
  *   - MP4 / ISO BMFF (ISO/IEC 14496-12): a box walk over
  *     [u32 BE size][4cc type] framing — `ftyp` yields the brand,
  *     `moov/mvhd` yields timescale+duration, each `moov/trak` counts a
  *     track, and `trak/tkhd` carries presentation width/height as 16.16
  *     fixed-point (the max over tracks is the frame size; audio tracks
  *     report 0×0).
  *   - AVI / RIFF: chunk walk over [4cc][u32 LE size] framing to the
  *     `hdrl/avih` main header — dwMicroSecPerFrame × dwTotalFrames
  *     yields duration, dwStreams the track count, dwWidth/dwHeight the
  *     frame size.
  *
  * Returns null for null/empty/unrecognized/corrupt payloads — the "is
  * this a real video container" filter and the metadata extractor in one
  * pass, the same contract as [[ImageDecodeStats]]/[[AudioDecodeStats]].
  * FRAME decode stays stubbed (no codec ships in this container, see
  * [[graft.multimodal.Multimodal]]); container metadata is the real,
  * spec-pinned part a curation pipeline filters and shards on.
  *
  * Box/chunk walks are bounded: every child range is strictly inside its
  * parent and the recursion is capped, so a crafted size field can't loop
  * or scan past the payload. CodegenFallback like the other decoders —
  * one call per asset row, cost in the parse itself.
  */
case class VideoContainerMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_video_meta expects a binary payload, got ${dt.sql}")
  }

  override def dataType: DataType = VideoContainerMeta.schema

  override def nullable: Boolean = true

  override def prettyName: String = "graft_video_meta"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try VideoContainerMeta.parse(b).orNull
    catch { case scala.util.control.NonFatal(_) => null }
  }

  override protected def withNewChildInternal(newChild: Expression): VideoContainerMeta =
    copy(child = newChild)
}

object VideoContainerMeta {

  /** (container, brand, duration_ms, n_tracks, width, height). Width and
    * height are null when no track declares a frame size (audio-only MP4);
    * duration is null when the header carries none. */
  val schema: StructType = StructType(Seq(
    StructField("container", StringType, nullable = false),
    StructField("brand", StringType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("n_tracks", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  private[expressions] def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private[expressions] def u64be(b: Array[Byte], o: Int): Long =
    (u32be(b, o) << 32) | u32be(b, o + 4)

  private[expressions] def u32le(b: Array[Byte], o: Int): Long =
    ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) |
      ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)

  private[expressions] def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private[graft] def parse(b: Array[Byte]): Option[InternalRow] =
    if (b.length < 12) None
    else if (fourcc(b, 4) == "ftyp") parseMp4(b)
    else if (fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI ") parseAvi(b)
    else None

  // ------------------------------------------------------------- MP4

  private final class Mp4State {
    var brand: String = null
    var durationMs: Option[Long] = None
    var tracks: Int = 0
    var width: Int = 0
    var height: Int = 0
  }

  /** Walk the boxes in [start, end); containers recurse (bounded depth). */
  private def walkBoxes(
      b: Array[Byte], start: Int, end: Int, depth: Int, st: Mp4State): Unit = {
    if (depth > 8) return
    var p = start
    while (p + 8 <= end) {
      val size32 = u32be(b, p)
      val typ = fourcc(b, p + 4)
      var payload = p + 8L
      val boxEnd: Long =
        if (size32 == 0L) end.toLong // "to end of file"
        else if (size32 == 1L) {     // 64-bit largesize follows the type
          if (p + 16 > end) return
          payload = p + 16L
          p + u64be(b, p + 8)
        } else p + size32
      if (boxEnd < payload || boxEnd > end) return // corrupt size: stop
      val ps = payload.toInt
      val pe = boxEnd.toInt
      typ match {
        case "ftyp" if st.brand == null && ps + 4 <= pe =>
          st.brand = fourcc(b, ps)
        case "moov" =>
          walkBoxes(b, ps, pe, depth + 1, st)
        case "trak" =>
          st.tracks += 1
          walkBoxes(b, ps, pe, depth + 1, st)
        case "mvhd" if ps + 4 <= pe =>
          val v = b(ps) & 0xff
          // v0: ver/flags(4) c(4) m(4) timescale(4) duration(4)
          // v1: ver/flags(4) c(8) m(8) timescale(4) duration(8)
          if (v == 0 && ps + 20 <= pe) {
            val ts = u32be(b, ps + 12)
            val dur = u32be(b, ps + 16)
            if (ts > 0) st.durationMs = Some(dur * 1000L / ts)
          } else if (v == 1 && ps + 32 <= pe) {
            val ts = u32be(b, ps + 20)
            val dur = u64be(b, ps + 24)
            if (ts > 0) st.durationMs = Some(dur * 1000L / ts)
          }
        case "tkhd" if ps + 4 <= pe =>
          val v = b(ps) & 0xff
          // width/height are 16.16 fixed at the end of the box:
          // v0 at payload+76/+80, v1 (8-byte times) at +88/+92
          val wOff = if (v == 1) 88 else 76
          if (ps + wOff + 8 <= pe) {
            val w = (u32be(b, ps + wOff) >> 16).toInt
            val h = (u32be(b, ps + wOff + 4) >> 16).toInt
            if (w > 0 && h > 0) { // video track: keep the largest frame
              if (w.toLong * h > st.width.toLong * st.height) {
                st.width = w; st.height = h
              }
            }
          }
        case _ => () // leaf box we don't read — skip
      }
      if (boxEnd <= p) return // no forward progress: corrupt
      p = pe
    }
  }

  private def parseMp4(b: Array[Byte]): Option[InternalRow] = {
    val st = new Mp4State
    walkBoxes(b, 0, b.length, 0, st)
    // a bare ftyp with no moov is a stub, not a parseable container
    if (st.tracks == 0 && st.durationMs.isEmpty) None
    else Some(InternalRow(
      UTF8String.fromString("mp4"),
      if (st.brand == null) null else UTF8String.fromString(st.brand.trim),
      st.durationMs.map(Long.box).orNull,
      st.tracks,
      if (st.width > 0) Int.box(st.width) else null,
      if (st.height > 0) Int.box(st.height) else null))
  }

  // ------------------------------------------------------------- AVI

  /** Walk RIFF chunks in [start, end) looking for hdrl/avih. */
  private def findAvih(b: Array[Byte], start: Int, end: Int, depth: Int): Int = {
    if (depth > 8) return -1
    var p = start
    while (p + 8 <= end) {
      val id = fourcc(b, p)
      val size = u32le(b, p + 4)
      val dataStart = p + 8
      val dataEnd = dataStart + size
      if (dataEnd > end || dataEnd < dataStart) return -1
      if (id == "avih") return dataStart
      if (id == "LIST" && size >= 4) {
        // LIST data = [4cc listType][sub-chunks]
        val found = findAvih(b, dataStart + 4, dataEnd.toInt, depth + 1)
        if (found >= 0) return found
      }
      val next = dataEnd + (size & 1L) // chunks are word-aligned
      if (next <= p) return -1
      p = next.toInt
    }
    -1
  }

  private def parseAvi(b: Array[Byte]): Option[InternalRow] = {
    val avih = findAvih(b, 12, b.length, 0)
    // avih (AVIMAINHEADER): usPerFrame, maxBytesPerSec, padding, flags,
    // totalFrames, initialFrames, streams, bufSize, width, height — 10×u32
    if (avih < 0 || avih + 40 > b.length) None
    else {
      val usPerFrame = u32le(b, avih)
      val totalFrames = u32le(b, avih + 16)
      val streams = u32le(b, avih + 24).toInt
      val w = u32le(b, avih + 32).toInt
      val h = u32le(b, avih + 36).toInt
      Some(InternalRow(
        UTF8String.fromString("avi"),
        null,
        if (usPerFrame > 0) Long.box(totalFrames * usPerFrame / 1000L) else null,
        streams,
        if (w > 0) Int.box(w) else null,
        if (h > 0) Int.box(h) else null))
    }
  }
}
