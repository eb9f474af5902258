package graft.functions

import graft.expressions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast, Expression, ExpressionInfo, Literal, Lower, ShiftLeft, StringSplit, StringTrim}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DoubleType, LongType, StringType}

/** SQL bindings for graft's native Catalyst kernels, so `spark.sql`
  * users (and SQL-only tools) get the same codegen'd inner loops as the
  * Scala API:
  *
  *   - `graft_dot(a, b)` — double-precision dot product of two arrays
  *   - `graft_simhash64(text)` — 64-bit SimHash over whitespace tokens
  *   - `graft_minhash(shingles, numHashes)` — MinHash signature of a
  *     pre-shingled hash array (compose with `graft_shingle_hashes`;
  *     numHashes must be a literal)
  *   - `graft_shingle_hashes(text, k)` — distinct word-k-gram hashes
  *     (k literal)
  *   - `graft_morton(a, b)` — Z-order interleave of two ints
  *   - `graft_image_stats(payload)` — ImageIO decode to
  *     (width, height, channels, mean_r, mean_g, mean_b); null if the
  *     bytes don't decode
  *   - `graft_audio_stats(payload)` — javax.sound.sampled decode to
  *     (sample_rate, channels, bits, n_frames, duration_ms, rms); null
  *     if the bytes don't parse as WAV/AIFF/AU
  *   - `graft_video_meta(payload)` — MP4 box / AVI RIFF container parse
  *     to (container, brand, duration_ms, n_tracks, width, height);
  *     null if the bytes aren't a recognized container
  *   - `graft_mp4_frames(payload[, max_samples])` — MP4 sample-table
  *     frame index: array of (idx, offset, size, pts_ms, sync) per
  *     video sample; null if no video track / tables (max_samples
  *     literal, default 100000)
  *   - `graft_avi_mjpeg_frames(payload[, max_frames])` — REAL MJPEG
  *     frame decode from an AVI container: array of (idx, offset, size,
  *     width, height, mean_r, mean_g, mean_b) per decoded frame; null
  *     if no MJPG video stream (max_frames literal, default 10000)
  *   - `graft_normalize(text[, form])` — Unicode normalization (NFC/
  *     NFD/NFKC/NFKD, form literal, default NFKC) with C0/C1 control
  *     characters other than tab/newline/CR stripped
  *
  * Two wiring routes, same registrations:
  *   - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *     (or `SparkSession.builder().withExtensions(new GraftExtensions)`)
  *   - runtime: `GraftFunctions.register(spark)` on a live session.
  */
object GraftFunctions {

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def litString(e: Expression, fn: String, arg: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a string literal, got $other")
  }

  /** whitespace tokens of lower(trim(text)) — the library's standard
    * tokenizer ([[graft.text.TextAnalysis.tokens]]) as a catalyst tree. */
  private def tokensOf(e: Expression): Expression =
    StringSplit(Lower(StringTrim(Cast(e, StringType))), Literal("\\s+"), Literal(-1))

  /** Bit-interleave of the lower 32 bits (mirrors
    * [[graft.io.Tables.mortonCode]], built directly from catalyst nodes —
    * Column-composed trees don't resolve inside a FunctionBuilder). */
  private def mortonOf(a: Expression, b: Expression): Expression = {
    def spread(e: Expression): Expression = {
      def step(x: Expression, shift: Int, mask: Long): Expression =
        BitwiseAnd(BitwiseOr(x, ShiftLeft(x, Literal(shift))), Literal(mask))
      val x0 = BitwiseAnd(Cast(e, LongType), Literal(0xffffffffL))
      val x1 = step(x0, 16, 0x0000ffff0000ffffL)
      val x2 = step(x1, 8, 0x00ff00ff00ff00ffL)
      val x3 = step(x2, 4, 0x0f0f0f0f0f0f0f0fL)
      val x4 = step(x3, 2, 0x3333333333333333L)
      step(x4, 1, 0x5555555555555555L)
    }
    BitwiseOr(spread(a), ShiftLeft(spread(b), Literal(1)))
  }

  /** (name, builder) for every SQL function graft exposes. */
  val builders: Seq[(String, FunctionBuilder)] = Seq(
    "graft_dot" -> { args =>
      require(args.length == 2, "graft_dot(a, b) takes 2 arguments")
      ArrayDot(Cast(args(0), ArrayType(DoubleType)), Cast(args(1), ArrayType(DoubleType)))
    },
    "graft_simhash64" -> { args =>
      require(args.length == 1, "graft_simhash64(text) takes 1 argument")
      SimHash64Expr(tokensOf(args(0)))
    },
    "graft_minhash" -> { args =>
      require(args.length == 2, "graft_minhash(shingles, numHashes) takes 2 arguments")
      ShingleMinHash(args(0), litInt(args(1), "graft_minhash", "numHashes"))
    },
    "graft_shingle_hashes" -> { args =>
      require(args.length == 2, "graft_shingle_hashes(text, k) takes 2 arguments")
      WordShingleHashes(Cast(args(0), StringType), litInt(args(1), "graft_shingle_hashes", "k"))
    },
    "graft_morton" -> { args =>
      require(args.length == 2, "graft_morton(a, b) takes 2 arguments")
      mortonOf(args(0), args(1))
    },
    "graft_image_stats" -> { args =>
      require(args.length == 1, "graft_image_stats(payload) takes 1 argument")
      ImageDecodeStats(Cast(args(0), BinaryType))
    },
    "graft_audio_stats" -> { args =>
      require(args.length == 1, "graft_audio_stats(payload) takes 1 argument")
      AudioDecodeStats(Cast(args(0), BinaryType))
    },
    "graft_video_meta" -> { args =>
      require(args.length == 1, "graft_video_meta(payload) takes 1 argument")
      VideoContainerMeta(Cast(args(0), BinaryType))
    },
    "graft_mp4_frames" -> { args =>
      require(args.length == 1 || args.length == 2,
        "graft_mp4_frames(payload[, max_samples]) takes 1-2 arguments")
      val cap =
        if (args.length == 2) litInt(args(1), "graft_mp4_frames", "max_samples")
        else 100000
      Mp4FrameIndex(Cast(args(0), BinaryType), cap)
    },
    "graft_avi_mjpeg_frames" -> { args =>
      require(args.length == 1 || args.length == 2,
        "graft_avi_mjpeg_frames(payload[, max_frames]) takes 1-2 arguments")
      val cap =
        if (args.length == 2) litInt(args(1), "graft_avi_mjpeg_frames", "max_frames")
        else 10000
      AviMjpegFrames(Cast(args(0), BinaryType), cap)
    },
    "graft_normalize" -> { args =>
      require(args.length == 1 || args.length == 2,
        "graft_normalize(text[, form]) takes 1-2 arguments")
      val form =
        if (args.length == 2) litString(args(1), "graft_normalize", "form") else "NFKC"
      NormalizeText(Cast(args(0), StringType), form)
    },
    "graft_deflate_ratio" -> { args =>
      require(args.length == 1, "graft_deflate_ratio(text) takes 1 argument")
      DeflateRatio(Cast(args(0), StringType))
    },
    "graft_md5_bits52" -> { args =>
      require(args.length == 1, "graft_md5_bits52(text) takes 1 argument")
      Md5Bits52(Cast(args(0), StringType))
    },
    "graft_html_text" -> { args =>
      require(args.length == 1, "graft_html_text(html) takes 1 argument")
      HtmlText(Cast(args(0), StringType))
    },
    "graft_ngram_slots" -> { args =>
      require(args.length == 2, "graft_ngram_slots(tokens, buckets) takes 2 arguments")
      NgramSlots(args(0), litInt(args(1), "graft_ngram_slots", "buckets"))
    })

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft.functions.GraftFunctions", name)

  /** Register every graft SQL function on a live session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info(name), b)
    }

  /** Inject into a SparkSessionExtensions (the spark.sql.extensions
    * route — sessions built with the config get the functions without
    * any code call). */
  def inject(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), b))
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` — registers the
  * SQL kernel bindings and the (conf-gated, default-off) plan-audit
  * enforcement rule. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.inject(ext)
    ext.injectOptimizerRule(_ => graft.plans.AuditRule)
  }
}
