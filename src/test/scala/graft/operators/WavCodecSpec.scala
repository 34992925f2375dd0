package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The WAV codec must be a REAL RIFF implementation: chunk walking
  * (including the spec's odd-size pad byte), header validation, and
  * loud failure on malformed input.
  */
class WavCodecSpec extends AnyFunSuite {

  private val tone = Array[Short](0, 100, -50, 200, -200, 0, 3, -3)

  test("round-trip without metadata chunk") {
    val d = WavCodec.decode16(WavCodec.encode16(8000, tone))
    assert(d.nSamples === 8 && d.sampleRate === 8000)
    assert(d.sumSq === tone.map(s => s.toLong * s).sum)
    assert(d.maxAbs === 200)
    // strict sign flips: 100→-50, -50→200, 200→-200, 3→-3 = 4
    // (-200→0 and 0→3 are not strict flips)
    assert(d.zeroCross === 4)
  }

  test("chunk walk: decoder skips LIST chunks of even AND odd length") {
    for (meta <- Seq("ab", "abc")) { // even and odd → pad-byte branch
      val bytes = WavCodec.encode16(16000, tone, Some(meta.getBytes("US-ASCII")))
      val d = WavCodec.decode16(bytes)
      assert(d.nSamples === 8 && d.sampleRate === 16000,
        s"meta length ${meta.length} broke the chunk walk")
      assert(d.sumSq === tone.map(s => s.toLong * s).sum)
    }
  }

  test("malformed inputs fail loudly") {
    val good = WavCodec.encode16(8000, tone)
    intercept[IllegalArgumentException](WavCodec.decode16(good.take(20)))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](WavCodec.decode16(badMagic))
    val notWave = good.clone(); notWave(8) = 'A'.toByte
    intercept[IllegalArgumentException](WavCodec.decode16(notWave))
    val stereo = good.clone(); stereo(22) = 2.toByte
    intercept[IllegalArgumentException](WavCodec.decode16(stereo))
    val bits8 = good.clone(); bits8(34) = 8.toByte
    intercept[IllegalArgumentException](WavCodec.decode16(bits8))
    // chunk size overrunning the payload must be rejected, not read OOB
    val overrun = good.clone()
    overrun(40) = (overrun(40) + 64).toByte // inflate data chunk size
    intercept[IllegalArgumentException](WavCodec.decode16(overrun))
  }

  test("empty-signal edge: zero samples decode to zeroed features") {
    val d = WavCodec.decode16(WavCodec.encode16(8000, Array.empty[Short],
      Some("x".getBytes("US-ASCII"))))
    assert(d.nSamples === 0 && d.sumSq === 0L && d.zeroCross === 0 && d.maxAbs === 0)
  }
}
