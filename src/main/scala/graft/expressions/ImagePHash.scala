package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Perceptual image hashes for near-duplicate detection WITHOUT an
  * embedding model: 64-bit dHash (gradient hash) and 64-bit pHash
  * (DCT hash) from one decode — both public-arithmetic constructions
  * (difference hash: adjacent-cell luminance comparisons on a 9×8
  * downsample; DCT hash: 32×32 luminance → 2D DCT-II → sign of the 8×8
  * low-frequency block against its median, DC excluded). Recompressed,
  * resized, or mildly edited copies land within a few bits; unrelated
  * images differ in ~32 — Hamming-threshold near-dup then rides the
  * existing SimHash pigeonhole machinery
  * ([[graft.dedup.Dedup.hammingNearDupPairs]]).
  *
  * Determinism: the downsample is an exact integer box average over the
  * decoded raster (no Graphics2D interpolation, whose output is
  * platform-dependent), luminance is integer BT.601
  * ((299r + 587g + 114b)/1000), and the DCT is plain double arithmetic —
  * the same bytes hash identically on any executor. Null for
  * null/empty/undecodable payloads, like [[ImageDecodeStats]]. Decode is
  * an opaque ImageIO call, hence CodegenFallback: one call per asset
  * row, cost dominated by the decoder.
  */
case class ImagePHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_image_phash expects a binary payload, got ${dt.sql}")
  }

  override def dataType: DataType = ImagePHash.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_phash"

  override protected def nullSafeEval(input: Any): Any =
    ImagePHash.hashes(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): ImagePHash =
    copy(child = newChild)
}

object ImagePHash {
  /** (dhash, phash) — both 64-bit signatures. */
  val schema: StructType = StructType(Seq(
    StructField("dhash", LongType, nullable = false),
    StructField("phash", LongType, nullable = false)))

  /** Integer box-average downsample of the decoded image to `tw`×`th`
    * BT.601 luminance values. Box x (resp. y) spans source columns
    * [x·w/tw, (x+1)·w/tw) — exact integer boundaries, every source pixel
    * in exactly one box. */
  private[expressions] def luma(
      img: java.awt.image.BufferedImage, tw: Int, th: Int): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Double](tw * th)
    var by = 0
    while (by < th) {
      val y0 = (by.toLong * h / th).toInt
      val y1 = ((by + 1L) * h / th).toInt.max(y0 + 1)
      var bx = 0
      while (bx < tw) {
        val x0 = (bx.toLong * w / tw).toInt
        val x1 = ((bx + 1L) * w / tw).toInt.max(x0 + 1)
        var sum = 0L
        var y = y0
        while (y < h.min(y1)) {
          var x = x0
          while (x < w.min(x1)) {
            val rgb = img.getRGB(x, y)
            sum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        val n = (w.min(x1) - x0).toLong * (h.min(y1) - y0)
        out(by * tw + bx) = sum.toDouble / (1000.0 * n)
        bx += 1
      }
      by += 1
    }
    out
  }

  /** dHash: 9×8 luminance grid, bit (y·8 + x) set iff cell (x,y) is
    * brighter than its right neighbor — 64 horizontal gradients. */
  private[graft] def dhash(img: java.awt.image.BufferedImage): Long = {
    val g = luma(img, 9, 8)
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x) > g(y * 9 + x + 1)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** pHash: 32×32 luminance → 2D DCT-II → the 8×8 lowest-frequency
    * block; bit (v·8 + u) set iff coefficient (u,v) exceeds the median of
    * the 63 non-DC coefficients (DC itself compares against the median
    * too, but carries no structure — the classic construction). */
  /** DCT-II basis for the 8 low frequencies over 32 samples — shared by
    * every row (hoisted: rebuilding 256 cosines per image would put
    * redundant trig in the hot decode path). */
  private val DctN = 32
  private val DctCos: Array[Array[Double]] =
    Array.tabulate(8, DctN)((k, i) => math.cos((2 * i + 1) * k * math.Pi / (2.0 * DctN)))

  private[graft] def phash(img: java.awt.image.BufferedImage): Long = {
    val n = DctN
    val g = luma(img, n, n)
    val cos = DctCos
    // separable DCT-II, low 8 frequencies only: cost 2·8·32·32 mults
    // rows: for each source row y, low 8 horizontal frequencies
    val rowDct = Array.ofDim[Double](n, 8)
    var y = 0
    while (y < n) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < n) { s += g(y * n + x) * cos(u)(x); x += 1 }
        rowDct(y)(u) = s
        u += 1
      }
      y += 1
    }
    val coef = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < n) { s += rowDct(yy)(u) * cos(v)(yy); yy += 1 }
        coef(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    // median of the 63 AC coefficients (index 0 is DC)
    val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
    java.util.Arrays.sort(ac)
    val median = (ac(30) + ac(31)) / 2.0
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (coef(i) > median) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** Decode + both hashes; null when the bytes don't decode. */
  private[graft] def hashes(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.isEmpty) return null
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val img =
        try javax.imageio.ImageIO.read(iis)
        finally (try iis.close() catch { case _: java.io.IOException => () })
      if (img == null) null
      else InternalRow(dhash(img), phash(img))
    } catch { case scala.util.control.NonFatal(_) => null }
  }
}
