package graft.tools

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Scratch verification driver — edit freely; not part of the library. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    def hashesOf(bytes: Array[Byte]): (Long, Long) = {
      val r = graft.expressions.ImagePHash.hashes(bytes)
      (r.getLong(0), r.getLong(1))
    }

    // pinned fixture candidates
    val p7 = Multimodal.testPatternPng(7L)
    val (d7, p7h) = hashesOf(p7)
    println(f"seed7 png     dhash=0x$d7%016xL phash=0x$p7h%016xL")
    // twins
    val jpeg = Multimodal.jpegReencode(p7, 0.7f)
    val (dj, pj) = hashesOf(jpeg)
    println(s"seed7 jpeg    dH=${ham(d7, dj)} pH=${ham(p7h, pj)}")
    val small = Multimodal.testPatternPng(7L, size = 48, block = 6)
    val (ds, ps) = hashesOf(small)
    println(s"seed7 48px    dH=${ham(d7, ds)} pH=${ham(p7h, ps)}")
    val jq3 = Multimodal.jpegReencode(p7, 0.3f)
    val (dq, pq) = hashesOf(jq3)
    println(s"seed7 jpeg.3  dH=${ham(d7, dq)} pH=${ham(p7h, pq)}")

    // distance distribution across 60 distinct seeds + twin distances
    val hs = (0 until 60).map { i =>
      val (d, p) = hashesOf(Multimodal.testPatternPng(i.toLong))
      (i, d, p)
    }
    val cross = for {
      (i, di, pi) <- hs; (j, dj2, pj2) <- hs if i < j
    } yield (ham(di, dj2), ham(pi, pj2))
    println(s"cross-seed minima: dhash=${cross.map(_._1).min} phash=${cross.map(_._2).min}")
    val twins = (0 until 60).map { i =>
      val base = Multimodal.testPatternPng(i.toLong)
      val (d0, p0) = hashesOf(base)
      val (d1, p1) = hashesOf(Multimodal.jpegReencode(base, 0.7f))
      val (d2, p2) = hashesOf(Multimodal.testPatternPng(i.toLong, 48, 6))
      (ham(d0, d1), ham(p0, p1), ham(d0, d2), ham(p0, p2), ham(p1, p2))
    }
    println(s"twin maxima: jpeg dH=${twins.map(_._1).max} pH=${twins.map(_._2).max} " +
      s"resize dH=${twins.map(_._3).max} pH=${twins.map(_._4).max} jpeg-vs-resize pH=${twins.map(_._5).max}")
  }
}
