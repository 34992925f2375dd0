package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal real WAV (RIFF) codec for the multimodal audio slot:
  * 16-bit PCM mono, canonical RIFF container — `RIFF` outer chunk,
  * `WAVE` form type, `fmt ` chunk (validated: PCM tag, mono, 16-bit),
  * then a chunk WALK to the `data` chunk (real WAV files carry `LIST`/
  * `fact`/cue chunks between fmt and data, so a decoder that assumes
  * data at byte 36 is not a decoder — this one skips unknown chunks by
  * their declared size, including the odd-size pad byte the RIFF spec
  * requires).
  *
  * Together with [[BmpCodec]] this makes the image AND audio decode
  * slots real format implementations: the container has no media
  * libraries, so hand-parsed uncompressed formats are the honest
  * stand-in; a deployment swaps decode16 for a codec-library call with
  * the same Spark-side contract (binary in, typed features out).
  */
object WavCodec {

  final case class Decoded(
      nSamples: Int, sampleRate: Int,
      sumSq: Long, zeroCross: Int, maxAbs: Int)

  /** Encode mono 16-bit PCM at `sampleRate`; `extraChunk` optionally
    * inserts an unknown chunk between `fmt ` and `data` (what real
    * encoders do with LIST/INFO metadata) so decoders must walk.
    */
  def encode16(sampleRate: Int, samples: Array[Short],
      extraChunk: Option[Array[Byte]] = None): Array[Byte] = {
    val dataSize = samples.length * 2
    val extra = extraChunk.map { b =>
      val padded = if (b.length % 2 == 1) b :+ 0.toByte else b
      val cb = ByteBuffer.allocate(8 + padded.length).order(ByteOrder.LITTLE_ENDIAN)
      cb.put("LIST".getBytes("US-ASCII")).putInt(b.length).put(padded)
      cb.array()
    }.getOrElse(Array.emptyByteArray)
    val riffSize = 4 + (8 + 16) + extra.length + (8 + dataSize)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(1) // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2) // block align
    buf.putShort(16) // bits/sample
    buf.put(extra)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  /** Parse 16-bit PCM mono WAV: validates the RIFF/WAVE/fmt contract,
    * WALKS chunks to `data` (skipping unknown chunks by declared size
    * + RIFF pad byte), and returns the audio-feature summary: sample
    * count, rate, energy (Σ s²), zero crossings (strict sign flips),
    * peak |s|.
    */
  def decode16(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 44, s"truncated WAV: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    require(tag(0) == "RIFF", "bad RIFF magic")
    require(8 + buf.getInt(4) <= bytes.length, "RIFF size exceeds payload")
    require(tag(8) == "WAVE", "not a WAVE form")
    var pos = 12
    var sampleRate = -1
    var fmtSeen = false
    var result: Option[Decoded] = None
    while (result.isEmpty && pos + 8 <= bytes.length) {
      val ct = tag(pos)
      val csize = buf.getInt(pos + 4)
      require(csize >= 0 && pos + 8 + csize <= bytes.length,
        s"chunk $ct size $csize overruns payload")
      ct match {
        case "fmt " =>
          require(csize >= 16, "fmt chunk too small")
          require(buf.getShort(pos + 8) == 1, "only PCM supported")
          require(buf.getShort(pos + 10) == 1, "only mono supported")
          sampleRate = buf.getInt(pos + 12)
          require(buf.getShort(pos + 22) == 16, "only 16-bit supported")
          fmtSeen = true
        case "data" =>
          require(fmtSeen, "data chunk before fmt")
          require(csize % 2 == 0, "odd data size for 16-bit samples")
          val n = csize / 2
          var i = 0; var sq = 0L; var zc = 0; var mx = 0; var prev = 0
          while (i < n) {
            val s = buf.getShort(pos + 8 + 2 * i).toInt
            sq += s.toLong * s
            if (i > 0 && ((s > 0 && prev < 0) || (s < 0 && prev > 0))) zc += 1
            if (math.abs(s) > mx) mx = math.abs(s)
            prev = s
            i += 1
          }
          result = Some(Decoded(n, sampleRate, sq, zc, mx))
        case _ => // unknown chunk (LIST, fact, cue ...): skip it
      }
      pos += 8 + csize + (csize % 2) // RIFF pads odd chunks by one byte
    }
    result.getOrElse(sys.error("no data chunk found"))
  }

  /** Parse the same contract as [[decode16]] but return the raw sample
    * payload (the API frame-level features build on — q367's VAD
    * segmentation needs the waveform, not just the summary). Same
    * chunk-walking validation path.
    */
  def decodeSamples16(bytes: Array[Byte]): Array[Short] = {
    require(bytes.length >= 44, s"truncated WAV: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WAVE", "bad RIFF/WAVE magic")
    var pos = 12
    var fmtSeen = false
    var result: Option[Array[Short]] = None
    while (result.isEmpty && pos + 8 <= bytes.length) {
      val ct = tag(pos)
      val csize = buf.getInt(pos + 4)
      require(csize >= 0 && pos + 8 + csize <= bytes.length,
        s"chunk $ct size $csize overruns payload")
      ct match {
        case "fmt " =>
          require(csize >= 16 && buf.getShort(pos + 8) == 1 &&
            buf.getShort(pos + 10) == 1 && buf.getShort(pos + 22) == 16,
            "only mono 16-bit PCM supported")
          fmtSeen = true
        case "data" =>
          require(fmtSeen && csize % 2 == 0, "bad data chunk")
          result = Some(Array.tabulate(csize / 2)(i =>
            buf.getShort(pos + 8 + 2 * i)))
        case _ => ()
      }
      pos += 8 + csize + (csize % 2)
    }
    result.getOrElse(sys.error("no data chunk found"))
  }
}
