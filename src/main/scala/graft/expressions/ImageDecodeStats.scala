package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Real image decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP — public
  * standard library, no external codec): width, height, raster channel
  * count, and per-channel means of a deterministic pixel sample.
  *
  * Returns null for null/empty/undecodable payloads (ImageIO returns null
  * for formats it has no reader for; decoder exceptions are caught) — the
  * "is this a valid image" filter and the stats extractor in one pass.
  *
  * Large images are NOT fully scanned: pixels are sampled on a fixed
  * stride grid capped at ~64k samples (stride = ceil(sqrt(w·h/65536))),
  * so a 100-megapixel scan costs the same as a thumbnail and the result
  * is still a pure, reproducible function of the bytes. Means are rounded
  * to 6 decimals for engine-stable downstream math.
  *
  * Decode is an opaque library call, so this is a CodegenFallback
  * expression — it cannot sit inside a generated loop the way
  * [[ArrayDot]] does, and it doesn't need to: one call per asset row,
  * with the cost in the decoder itself.
  */
case class ImageDecodeStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_image_stats expects a binary payload, got ${dt.sql}")
  }

  override def dataType: DataType = ImageDecodeStats.schema

  override def nullable: Boolean = true

  override def prettyName: String = "graft_image_stats"

  override protected def nullSafeEval(input: Any): Any =
    ImageDecodeStats.decode(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): ImageDecodeStats =
    copy(child = newChild)
}

object ImageDecodeStats {
  /** (width, height, channels, mean_r, mean_g, mean_b). */
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  /** The decode kernel itself — one payload in, a [[schema]]-shaped row
    * out (null when the bytes don't decode). Shared with
    * [[AviMjpegFrames]], which feeds it each MJPEG frame chunk. */
  private[expressions] def decode(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.isEmpty) return null
    try {
      // explicit MemoryCacheImageInputStream: the InputStream overload
      // consults ImageIO's global use-cache flag, which by default
      // spools every payload to a temp FILE before decoding — per-row
      // executor disk IO for bytes that are already in memory
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new ByteArrayInputStream(bytes))
      // ImageIO.read closes the stream on the decode path but NOT on
      // the no-reader null path, and a second close() throws — swallow
      val img =
        try javax.imageio.ImageIO.read(iis)
        finally (try iis.close() catch { case _: java.io.IOException => () })
      if (img == null) null
      else {
        val w = img.getWidth
        val h = img.getHeight
        val stride =
          math.max(1, math.ceil(math.sqrt(w.toLong * h / 65536.0)).toInt)
        var sr = 0L; var sg = 0L; var sb = 0L; var n = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            n += 1
            x += stride
          }
          y += stride
        }
        def mean(s: Long) = math.rint(s * 1e6 / n) / 1e6
        InternalRow(
          w, h, img.getRaster.getNumBands,
          mean(sr), mean(sg), mean(sb))
      }
    } catch { case scala.util.control.NonFatal(_) => null }
  }
}
