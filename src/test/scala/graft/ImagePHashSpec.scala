package graft

import graft.expressions.ImagePHash
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Perceptual image hashes: pinned fixture values, planted-twin
  * robustness (recompressed + resized copies), and the Hamming near-dup
  * pipeline over real decoded images. */
class ImagePHashSpec extends SparkSpec {
  import spark.implicits._

  private def hashesOf(bytes: Array[Byte]): (Long, Long) = {
    val r = ImagePHash.hashes(bytes)
    (r.getLong(0), r.getLong(1))
  }
  private def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("pinned fixture hashes: deterministic down to the bit") {
    val (d, p) = hashesOf(Multimodal.testPatternPng(7L))
    assert(d === 0xe646b2468d9b2c4cL, f"dhash drifted: 0x$d%016x")
    assert(p === 0x4f3b6f4091cbe389L, f"phash drifted: 0x$p%016x")
    // and stable across repeated decodes
    assert(hashesOf(Multimodal.testPatternPng(7L)) === ((d, p)))
  }

  test("planted twins land within a few bits; unrelated images far away") {
    val seeds = (0 until 40).map(_.toLong)
    val base = seeds.map(s => s -> hashesOf(Multimodal.testPatternPng(s))).toMap
    seeds.foreach { s =>
      val png = Multimodal.testPatternPng(s)
      val (d0, p0) = base(s)
      // recompressed twin (lossy JPEG, quality .7)
      val (dj, pj) = hashesOf(Multimodal.jpegReencode(png, 0.7f))
      assert(ham(d0, dj) <= 4 && ham(p0, pj) <= 4,
        s"seed $s jpeg twin too far: d=${ham(d0, dj)} p=${ham(p0, pj)}")
      // resized twin (same pattern at 75% resolution)
      val (dr, pr) = hashesOf(Multimodal.testPatternPng(s, size = 48, block = 6))
      assert(ham(d0, dr) <= 4 && ham(p0, pr) <= 4,
        s"seed $s resized twin too far: d=${ham(d0, dr)} p=${ham(p0, pr)}")
    }
    for (a <- seeds; b <- seeds if a < b) {
      assert(ham(base(a)._1, base(b)._1) > 10,
        s"seeds $a/$b dhash too close: ${ham(base(a)._1, base(b)._1)}")
      assert(ham(base(a)._2, base(b)._2) > 10,
        s"seeds $a/$b phash too close: ${ham(base(a)._2, base(b)._2)}")
    }
  }

  test("imageHashes drops undecodable payloads; hashes match the kernel") {
    val rows = Seq(
      (1L, Multimodal.testPatternPng(1L)),
      (2L, "not an image".getBytes("UTF-8")),
      (3L, Multimodal.testPatternPng(3L)),
      (4L, Array.empty[Byte])).toDF("img_id", "payload")
    val out = Multimodal.imageHashes(rows, "img_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1L, 3L))
    val (d1, p1) = hashesOf(Multimodal.testPatternPng(1L))
    assert(out.head === ((1L, d1, p1)))
  }

  test("imageNearDupPairs finds exactly the planted twin triangles") {
    val imgs = (0 until 25).flatMap { i =>
      val png = Multimodal.testPatternPng(i.toLong)
      Seq(
        (i.toLong, png),
        (i + 100000L, Multimodal.jpegReencode(png, 0.7f)),
        (i + 200000L, Multimodal.testPatternPng(i.toLong, 48, 6)))
    }.toDF("img_id", "payload")
    for (kind <- Seq("phash", "dhash")) {
      val pairs = Multimodal
        .imageNearDupPairs(imgs, "img_id", "payload", maxHamming = 8, hash = kind)
        .select($"id_a".cast("long"), $"id_b".cast("long"))
        .as[(Long, Long)].collect().toSet
      val expected = (0 until 25).flatMap { i =>
        Seq((i.toLong, i + 100000L), (i.toLong, i + 200000L),
          (i + 100000L, i + 200000L))
      }.toSet
      assert(pairs === expected, s"$kind: got ${pairs.size}, want ${expected.size}")
    }
  }

  test("hash expression: null for undecodable, plan is a pure projection") {
    val df = Seq((1L, "zzz".getBytes("UTF-8"))).toDF("id", "payload")
      .select(Multimodal.decodeImageHashes($"payload").as("h"))
    assert(df.head().isNullAt(0))
    val plan = Multimodal.imageHashes(
      Seq((1L, Multimodal.testPatternPng(1L))).toDF("img_id", "payload"),
      "img_id", "payload").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hashing must not shuffle:\n$plan")
  }
}
