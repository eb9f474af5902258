package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Per-frame byte ranges and timestamps from an MP4's sample tables —
  * the frame INDEX, no codec required.
  *
  * ISO BMFF (ISO/IEC 14496-12) stores, per track, everything needed to
  * locate every sample (frame) without decoding anything:
  *
  *   - `stsc` maps chunks to samples-per-chunk (run-length encoded),
  *   - `stco`/`co64` gives each chunk's absolute byte offset,
  *   - `stsz` gives each sample's byte size,
  *   - `stts` gives decode-time deltas (run-length encoded),
  *   - `stss` lists sync samples (keyframes; absent = every sample).
  *
  * This expression walks to the first video track (`hdlr` handler
  * `vide`), expands those tables, and returns one row per sample:
  * `(idx, offset, size, pts_ms, sync)` with `offset` the sample's
  * absolute byte position and `pts_ms` its decode time scaled by the
  * track's `mdhd` timescale. A fetch layer can then read EXACTLY the
  * keyframe bytes it wants (every nth frame, sync-only, a time window)
  * instead of shipping whole videos — at 100 TB of video the frame
  * index is the difference between scanning petabytes and scanning the
  * sampled kilobytes. Actual pixel decode stays out of scope (no codec
  * ships here; see [[graft.multimodal.Multimodal]]).
  *
  * Output is capped at `maxSamples` rows (memory bound per row); null
  * for null/non-MP4 payloads, MP4s without a video track, or corrupt/
  * missing sample tables. All box walks are range-bounded and
  * depth-capped like [[VideoContainerMeta]].
  */
case class Mp4FrameIndex(child: Expression, maxSamples: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType =>
      if (maxSamples >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"maxSamples must be >= 1, got $maxSamples")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_mp4_frames expects a binary payload, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(Mp4FrameIndex.frameSchema, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_mp4_frames"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try Mp4FrameIndex.parse(b, maxSamples).orNull
    catch { case scala.util.control.NonFatal(_) => null }
  }

  override protected def withNewChildInternal(newChild: Expression): Mp4FrameIndex =
    copy(child = newChild)
}

object Mp4FrameIndex {
  import VideoContainerMeta.{u32be, u64be, fourcc}

  val frameSchema: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("size", IntegerType, nullable = false),
    StructField("pts_ms", LongType, nullable = false),
    StructField("sync", BooleanType, nullable = false)))

  /** Sample tables of one track, as raw payload ranges. */
  private final class Tables {
    var timescale: Long = 0
    var stts: Int = -1; var sttsEnd: Int = -1
    var stsz: Int = -1; var stszEnd: Int = -1
    var stsc: Int = -1; var stscEnd: Int = -1
    var stco: Int = -1; var stcoEnd: Int = -1; var co64 = false
    var stss: Int = -1; var stssEnd: Int = -1
    def complete: Boolean = stts >= 0 && stsz >= 0 && stsc >= 0 && stco >= 0
  }

  /** Find the direct child box `typ` of [start, end); returns (payloadStart,
    * payloadEnd) or null. */
  private def findBox(b: Array[Byte], start: Int, end: Int, typ: String): (Int, Int) = {
    var p = start
    while (p + 8 <= end) {
      val size32 = u32be(b, p)
      var payload = p + 8L
      val boxEnd: Long =
        if (size32 == 0L) end.toLong
        else if (size32 == 1L) {
          if (p + 16 > end) return null
          payload = p + 16L
          p + u64be(b, p + 8)
        } else p + size32
      if (boxEnd < payload || boxEnd > end) return null
      if (fourcc(b, p + 4) == typ) return (payload.toInt, boxEnd.toInt)
      if (boxEnd <= p) return null
      p = boxEnd.toInt
    }
    null
  }

  /** All direct children of type `typ` (for trak iteration). */
  private def findBoxes(b: Array[Byte], start: Int, end: Int, typ: String): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var p = start
    var done = false
    while (!done && p + 8 <= end) {
      val size32 = u32be(b, p)
      var payload = p + 8L
      val boxEnd: Long =
        if (size32 == 0L) end.toLong
        else if (size32 == 1L) { // 64-bit largesize follows the type
          if (p + 16 > end) -1L // truncated largesize header: stop
          else { payload = p + 16L; p + u64be(b, p + 8) }
        } else p + size32
      if (boxEnd < payload || boxEnd > end || boxEnd <= p) done = true
      else {
        if (fourcc(b, p + 4) == typ) out += ((payload.toInt, boxEnd.toInt))
        p = boxEnd.toInt
      }
    }
    out.result()
  }

  /** Locate the first video track WITH complete sample tables — a trak
    * whose minf/stbl is missing or whose tables are incomplete (or whose
    * timescale is zero) is skipped, not fatal: an MP4 with a defective
    * first video track and a valid second one still yields its index. */
  private def videoTables(b: Array[Byte]): Tables = {
    val moov = findBox(b, 0, b.length, "moov")
    if (moov == null) return null
    for ((ts, te) <- findBoxes(b, moov._1, moov._2, "trak")) {
      val mdia = findBox(b, ts, te, "mdia")
      if (mdia != null) {
        val hdlr = findBox(b, mdia._1, mdia._2, "hdlr")
        // hdlr payload: ver/flags(4) pre_defined(4) handler_type(4)
        val isVideo = hdlr != null && hdlr._1 + 12 <= hdlr._2 &&
          fourcc(b, hdlr._1 + 8) == "vide"
        if (isVideo) {
          val t = new Tables
          val mdhd = findBox(b, mdia._1, mdia._2, "mdhd")
          if (mdhd != null && mdhd._1 + 4 <= mdhd._2) {
            val v = b(mdhd._1) & 0xff
            // v0: ver/flags(4) c(4) m(4) timescale(4); v1: 8-byte times
            if (v == 0 && mdhd._1 + 16 <= mdhd._2) t.timescale = u32be(b, mdhd._1 + 12)
            else if (v == 1 && mdhd._1 + 24 <= mdhd._2) t.timescale = u32be(b, mdhd._1 + 20)
          }
          val minf = findBox(b, mdia._1, mdia._2, "minf")
          val stbl = if (minf == null) null else findBox(b, minf._1, minf._2, "stbl")
          if (stbl != null) {
            def grab(typ: String): (Int, Int) = findBox(b, stbl._1, stbl._2, typ)
            grab("stts") match { case null => (); case (s, e) => t.stts = s; t.sttsEnd = e }
            grab("stsz") match { case null => (); case (s, e) => t.stsz = s; t.stszEnd = e }
            grab("stsc") match { case null => (); case (s, e) => t.stsc = s; t.stscEnd = e }
            grab("stco") match { case null => (); case (s, e) => t.stco = s; t.stcoEnd = e }
            if (t.stco < 0) grab("co64") match {
              case null => ()
              case (s, e) => t.stco = s; t.stcoEnd = e; t.co64 = true
            }
            grab("stss") match { case null => (); case (s, e) => t.stss = s; t.stssEnd = e }
            if (t.complete && t.timescale > 0) return t
          }
        }
      }
    }
    null
  }

  private[graft] def parse(b: Array[Byte], maxSamples: Int): Option[GenericArrayData] = {
    if (b.length < 12 || fourcc(b, 4) != "ftyp") return None
    val t = videoTables(b)
    if (t == null) return None

    // stsz: ver/flags(4) sample_size(4) count(4) [sizes...]
    if (t.stsz + 12 > t.stszEnd) return None
    val uniformSize = u32be(b, t.stsz + 4)
    val nSamples0 = u32be(b, t.stsz + 8)
    if (nSamples0 <= 0) return None
    val nSamples = math.min(nSamples0, maxSamples.toLong).toInt
    def sampleSize(i: Int): Long =
      if (uniformSize > 0) uniformSize
      else {
        val o = t.stsz + 12 + 4 * i
        if (o + 4 > t.stszEnd) -1 else u32be(b, o)
      }

    // stco/co64: ver/flags(4) count(4) [offsets...]
    if (t.stco + 8 > t.stcoEnd) return None
    val nChunks = u32be(b, t.stco + 4).toInt
    def chunkOffset(c: Int): Long = {
      val w = if (t.co64) 8 else 4
      val o = t.stco + 8 + w * c
      if (o + w > t.stcoEnd) -1
      else if (t.co64) u64be(b, o) else u32be(b, o)
    }

    // stsc: ver/flags(4) count(4) [(first_chunk, spc, desc)...] — runs
    if (t.stsc + 8 > t.stscEnd) return None
    val nStsc = u32be(b, t.stsc + 4).toInt
    def stscEntry(i: Int): (Long, Long) = {
      val o = t.stsc + 8 + 12 * i
      if (o + 12 > t.stscEnd) null else (u32be(b, o), u32be(b, o + 4))
    }

    // stts: ver/flags(4) count(4) [(count, delta)...] — decode deltas
    if (t.stts + 8 > t.sttsEnd) return None
    val nStts = u32be(b, t.stts + 4).toInt

    // stss: ver/flags(4) count(4) [sample numbers, 1-based] (optional)
    val syncSet: java.util.HashSet[Long] =
      if (t.stss < 0) null
      else {
        if (t.stss + 8 > t.stssEnd) return None
        val n = u32be(b, t.stss + 4).toInt
        val s = new java.util.HashSet[Long](math.max(16, n * 2))
        var i = 0
        while (i < n) {
          val o = t.stss + 8 + 4 * i
          if (o + 4 > t.stssEnd) return None
          s.add(u32be(b, o))
          i += 1
        }
        s
      }

    val rows = new Array[AnyRef](nSamples)
    var sample = 0          // 0-based global sample index
    var chunk = 0           // 0-based chunk index
    var stscIdx = 0
    var pts = 0L            // cumulative decode time in timescale units
    var sttsIdx = 0
    var sttsLeft = 0L       // samples left in current stts run
    var sttsDelta = 0L
    while (sample < nSamples && chunk < nChunks) {
      // samples-per-chunk for this chunk: advance the stsc run whose
      // first_chunk (1-based) is the last one <= chunk+1
      while (stscIdx + 1 < nStsc && {
          val nxt = stscEntry(stscIdx + 1)
          nxt != null && nxt._1 <= chunk + 1
        }) stscIdx += 1
      val ent = stscEntry(stscIdx)
      if (ent == null) return None
      val spc = ent._2.toInt
      var off = chunkOffset(chunk)
      if (off < 0 || spc <= 0) return None
      var j = 0
      while (j < spc && sample < nSamples) {
        val sz = sampleSize(sample)
        if (sz < 0) return None
        if (sttsLeft == 0) {
          if (sttsIdx >= nStts) return None
          val o = t.stts + 8 + 8 * sttsIdx
          if (o + 8 > t.sttsEnd) return None
          sttsLeft = u32be(b, o)
          sttsDelta = u32be(b, o + 4)
          sttsIdx += 1
          if (sttsLeft <= 0) return None
        }
        val sync = syncSet == null || syncSet.contains(sample + 1L)
        rows(sample) = InternalRow(
          sample, off, sz.toInt, pts * 1000L / t.timescale, sync)
        off += sz
        pts += sttsDelta
        sttsLeft -= 1
        sample += 1
        j += 1
      }
      chunk += 1
    }
    if (sample < nSamples) None // tables shorter than stsz promised
    else Some(new GenericArrayData(rows))
  }
}
