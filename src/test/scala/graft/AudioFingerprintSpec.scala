package graft

import graft.expressions.AudioFingerprint
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Perceptual audio fingerprint: pinned fixture value, planted-twin
  * robustness (volume change + resample), and Hamming near-dup over
  * real decoded WAV bytes. */
class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def fp(bytes: Array[Byte]): Long = {
    val v = AudioFingerprint.fingerprint(bytes)
    assert(v != null, "fingerprint must decode")
    v
  }
  private def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("pinned fixture fingerprint: deterministic down to the bit") {
    assert(fp(Multimodal.testToneWav(7L)) === 0x2014208280091210L,
      f"fingerprint drifted: 0x${fp(Multimodal.testToneWav(7L))}%016x")
  }

  test("volume and resample twins land within a bit; unrelated clips far away") {
    val seeds = (0 until 30).map(_.toLong)
    val base = seeds.map(s => s -> fp(Multimodal.testToneWav(s))).toMap
    seeds.foreach { s =>
      // gain change: energy comparisons cancel it exactly
      assert(ham(base(s), fp(Multimodal.testToneWav(s, amplitude = 0.2))) <= 2,
        s"seed $s volume twin too far")
      // same material at half the sample rate
      assert(ham(base(s), fp(Multimodal.testToneWav(s, sampleRate = 22050))) <= 2,
        s"seed $s resampled twin too far")
    }
    for (a <- seeds; b <- seeds if a < b)
      assert(ham(base(a), base(b)) > 8,
        s"seeds $a/$b too close: ${ham(base(a), base(b))}")
  }

  test("audioNearDupPairs finds exactly the planted twin triangles") {
    val clips = (0 until 20).flatMap { i =>
      Seq(
        (i.toLong, Multimodal.testToneWav(i.toLong)),
        (i + 100000L, Multimodal.testToneWav(i.toLong, amplitude = 0.2)),
        (i + 200000L, Multimodal.testToneWav(i.toLong, sampleRate = 22050)))
    }.toDF("clip_id", "payload")
    val pairs = Multimodal.audioNearDupPairs(clips, "clip_id", "payload", maxHamming = 5)
      .select($"id_a".cast("long"), $"id_b".cast("long"))
      .as[(Long, Long)].collect().toSet
    val expected = (0 until 20).flatMap { i =>
      Seq((i.toLong, i + 100000L), (i.toLong, i + 200000L), (i + 100000L, i + 200000L))
    }.toSet
    assert(pairs === expected, s"got ${pairs.size}, want ${expected.size}")
  }

  test("undecodable payloads: null from the expression, dropped by the table") {
    val rows = Seq(
      (1L, Multimodal.testToneWav(1L)),
      (2L, "not audio".getBytes("UTF-8")),
      (3L, Array.empty[Byte])).toDF("clip_id", "payload")
    val out = Multimodal.audioFingerprints(rows, "clip_id", "payload")
      .select("clip_id").as[Long].collect().toSeq
    assert(out === Seq(1L))
    // too-short clips (cannot segment) are null too, not garbage
    assert(AudioFingerprint.ofSamples(new Array[Double](5), 44100.0) === null)
  }
}
