package graft.tools

import graft.expressions.AudioFingerprint
import graft.multimodal.Multimodal

/** Scratch verification driver — edit freely; not part of the library. */
object Drive {
  def main(args: Array[String]): Unit = {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    def fp(bytes: Array[Byte]): Long = {
      val v = AudioFingerprint.fingerprint(bytes)
      require(v != null, "fingerprint null")
      v
    }

    val f7 = fp(Multimodal.testToneWav(7L))
    println(f"seed7 wav fp=0x$f7%016xL")
    println(s"seed7 quiet   dH=${ham(f7, fp(Multimodal.testToneWav(7L, amplitude = 0.2)))}")
    println(s"seed7 22050   dH=${ham(f7, fp(Multimodal.testToneWav(7L, sampleRate = 22050)))}")
    println(s"seed7 16000   dH=${ham(f7, fp(Multimodal.testToneWav(7L, sampleRate = 16000)))}")
    println(s"seed7 longer  dH=${ham(f7, fp(Multimodal.testToneWav(7L, seconds = 3.0)))}")

    val hs = (0 until 60).map(i => fp(Multimodal.testToneWav(i.toLong)))
    val cross = for (i <- hs.indices; j <- hs.indices if i < j) yield ham(hs(i), hs(j))
    println(s"cross-seed min=${cross.min} median=${cross.sorted.apply(cross.size / 2)}")
    val twins = (0 until 60).map { i =>
      val b = fp(Multimodal.testToneWav(i.toLong))
      (ham(b, fp(Multimodal.testToneWav(i.toLong, amplitude = 0.2))),
        ham(b, fp(Multimodal.testToneWav(i.toLong, sampleRate = 22050))))
    }
    println(s"twin maxima: quiet=${twins.map(_._1).max} resampled=${twins.map(_._2).max}")
  }
}
