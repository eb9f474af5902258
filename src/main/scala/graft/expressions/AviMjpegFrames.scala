package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** REAL per-frame pixel decode for MJPEG-in-AVI video — the one video
  * codec this environment can genuinely decode, because each MJPEG frame
  * is a standalone JPEG and the JDK ships a JPEG decoder.
  *
  * The AVI RIFF layout (public format, chunk walk like
  * [[VideoContainerMeta]]): `hdrl` declares the streams (`strl/strh`
  * carries fccType `vids` + handler fourcc), `movi` carries the frame
  * chunks named `NNdc`/`NNdb` where NN is the stream ordinal. This
  * expression finds the first `vids` stream whose handler is `MJPG`
  * (case-insensitive), slices each of its frame chunks out of the
  * payload, and runs the SAME ImageIO kernel as
  * [[ImageDecodeStats]] on every frame: per frame, its byte range in
  * the container plus decoded width/height and per-channel pixel means.
  * Non-AVI payloads, AVIs with no MJPEG video stream, and streams whose
  * chunks don't decode all yield null; undecodable individual chunks
  * (padding, dropped frames) are skipped.
  *
  * Other codecs (H.264 etc.) remain out of scope — their frames need a
  * codec library this container doesn't ship; for those the container
  * metadata ([[VideoContainerMeta]]) and the MP4 byte-range index
  * ([[Mp4FrameIndex]]) stay the real surface. Chunk walks are
  * range-bounded and depth-capped; output is capped at `maxFrames`.
  */
case class AviMjpegFrames(child: Expression, maxFrames: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType =>
      if (maxFrames >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"maxFrames must be >= 1, got $maxFrames")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_avi_mjpeg_frames expects a binary payload, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(AviMjpegFrames.frameSchema, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_avi_mjpeg_frames"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try AviMjpegFrames.parse(b, maxFrames).orNull
    catch { case scala.util.control.NonFatal(_) => null }
  }

  override protected def withNewChildInternal(newChild: Expression): AviMjpegFrames =
    copy(child = newChild)
}

object AviMjpegFrames {
  import VideoContainerMeta.{fourcc, u32le}

  /** Byte range of the frame in the container + its decoded pixels. */
  val frameSchema: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("size", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  /** Iterate direct RIFF chunks of [start, end): f(id, dataStart, dataEnd)
    * returns false to stop. Word-aligned advance, corrupt sizes stop the
    * walk (no loop, no scan past the payload). */
  private def walkChunks(b: Array[Byte], start: Int, end: Int)(
      f: (String, Int, Int) => Boolean): Unit = {
    var p = start
    var go = true
    while (go && p + 8 <= end) {
      val id = fourcc(b, p)
      val size = u32le(b, p + 4)
      val ds = p + 8
      val de = ds + size
      if (de > end || de < ds) return
      go = f(id, ds, de.toInt)
      val next = de + (size & 1L) // chunks are word-aligned
      if (next <= p) return
      p = next.toInt
    }
  }

  /** Ordinal of the first `vids` stream with an MJPG handler, or -1.
    * Frame chunk ids are keyed by stream ORDINAL across all strl lists,
    * so every strl counts even when the match is already found. */
  private def mjpegStreamIndex(b: Array[Byte]): Int = {
    var found = -1
    var ord = 0
    walkChunks(b, 12, b.length) { (id, ds, de) =>
      if (id == "LIST" && de - ds >= 4 && fourcc(b, ds) == "hdrl") {
        walkChunks(b, ds + 4, de) { (id2, ds2, de2) =>
          if (id2 == "LIST" && de2 - ds2 >= 4 && fourcc(b, ds2) == "strl") {
            walkChunks(b, ds2 + 4, de2) { (id3, ds3, de3) =>
              if (id3 == "strh" && ds3 + 8 <= de3 && found < 0) {
                val isMjpegVideo = fourcc(b, ds3) == "vids" &&
                  fourcc(b, ds3 + 4).equalsIgnoreCase("MJPG")
                if (isMjpegVideo) found = ord
              }
              true
            }
            ord += 1
          }
          true
        }
        false // hdrl found and scanned; stop the top-level walk
      } else true
    }
    found
  }

  private[graft] def parse(b: Array[Byte], maxFrames: Int): Option[GenericArrayData] = {
    if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return None
    val si = mjpegStreamIndex(b)
    if (si < 0) return None
    val tag = f"$si%02d"
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    walkChunks(b, 12, b.length) { (id, ds, de) =>
      if (id == "LIST" && de - ds >= 4 && fourcc(b, ds) == "movi") {
        walkChunks(b, ds + 4, de) { (cid, cds, cde) =>
          if (out.size < maxFrames && cde > cds &&
              cid.startsWith(tag) && (cid.endsWith("dc") || cid.endsWith("db"))) {
            val stats = ImageDecodeStats.decode(
              java.util.Arrays.copyOfRange(b, cds, cde))
            if (stats != null)
              out += InternalRow(
                out.size, cds.toLong, cde - cds,
                stats.getInt(0), stats.getInt(1),
                stats.getDouble(3), stats.getDouble(4), stats.getDouble(5))
          }
          out.size < maxFrames
        }
        false // one movi list per AVI
      } else true
    }
    if (out.isEmpty) None else Some(new GenericArrayData(out.toArray[Any]))
  }
}
