package graft.sources

/** Dependency-free WAV (RIFF/WAVE) PCM codec — the real byte-format
  * decode behind the multimodal audio family (mm04), replacing the
  * code-points-as-samples stand-in. Same discipline and untrusted-input
  * contract as [[Bmp]]/[[Xls]]/[[Xlsx]]: the RIFF container and the
  * canonical WAVE chunks are openly specified (the Multimedia
  * Programming Interface and Data Specification, and every audio
  * toolchain's docs); every malformed input fails as
  * `IllegalArgumentException`, never any other crash, never an
  * unbounded allocation (FuzzSpec mutates a valid base).
  *
  * Supported surface: mono uncompressed PCM, 32-bit signed samples
  * (format tag 1) — wide enough to carry any Unicode code point the
  * synthesis side emits, which 16-bit PCM cannot (code points reach
  * 0x10FFFF). The chunk walk skips unknown chunks (LIST/INFO metadata
  * etc.) including the spec's odd-size pad byte, and requires `fmt `
  * before `data` — the order every writer produces and the only one
  * that lets a streaming reader validate samples as they arrive.
  *
  * [[encodePcm32]] is the synthesis half (the corpus has no real audio
  * column; the harness materializes one deterministically); the decoder
  * genuinely parses the container back, so a chunk-walk or sample-read
  * bug changes recovered amplitudes and breaks the mm04 oracle row —
  * oracle-gated end-to-end, like [[Bmp]].
  */
object Wav {

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Sample-count cap (2^24 ≈ 16M samples = 64 MiB) — the
    * allocation-bomb guard for corrupted `data` chunk sizes.
    */
  private val MaxSamples = 1 << 24

  /** Decode to signed 32-bit sample amplitudes (as Long). */
  def decode(bytes: Array[Byte]): Array[Long] =
    try decode0(bytes)
    catch {
      case e: IllegalArgumentException => throw e
      // NonFatal only (see Bmp.decode): VM errors surface as-is
      case scala.util.control.NonFatal(e) =>
        throw new IllegalArgumentException(s"malformed WAV: $e", e)
    }

  private def decode0(b: Array[Byte]): Array[Long] = {
    require(b.length >= 12, s"WAV: ${b.length} bytes, need >= 12")
    require(tag(b, 0) == "RIFF", "WAV: missing RIFF magic")
    require(tag(b, 8) == "WAVE", "WAV: missing WAVE form type")
    // RIFF size field is informational for this reader; the chunk walk
    // below bounds itself by the actual byte length
    var o = 12
    var sawFmt = false
    while (o + 8 <= b.length) {
      val id = tag(b, o)
      val size = i32(b, o + 4)
      require(size >= 0, s"WAV: negative chunk size in '$id'")
      // Long arithmetic: a corrupted size near Int.MaxValue overflows
      // the Int sum and the check would pass on a truncated chunk —
      // reject here, not via the downstream AIOOBE rebrand (r12 ADVICE)
      require(o.toLong + 8L + size <= b.length, s"WAV: truncated '$id' chunk")
      if (id == "fmt ") {
        require(size >= 16, s"WAV: fmt chunk too small ($size)")
        val fmtTag = u16(b, o + 8)
        require(fmtTag == 1, s"WAV: format tag $fmtTag unsupported (PCM only)")
        val channels = u16(b, o + 10)
        require(channels == 1, s"WAV: $channels channels unsupported (mono)")
        require(i32(b, o + 12) > 0, "WAV: bad sample rate")
        val bps = u16(b, o + 22)
        require(bps == 32, s"WAV: $bps bits/sample unsupported (32-bit PCM)")
        sawFmt = true
      } else if (id == "data") {
        require(sawFmt, "WAV: data chunk before fmt")
        require(size % 4 == 0, s"WAV: data size $size not sample-aligned")
        val n = size / 4
        require(n <= MaxSamples, s"WAV: $n samples exceeds the cap")
        val out = new Array[Long](n)
        var i = 0
        while (i < n) { out(i) = i32(b, o + 8 + 4 * i).toLong; i += 1 }
        return out
      }
      // unknown chunks (LIST, fact, …) are skipped; odd sizes carry a
      // pad byte per the RIFF spec. Next offset computed in Long then
      // narrowed: the bounds require above proves o+8+size fits an array
      // index, and the +1 pad keeps it ≤ length+1 — but the arithmetic
      // stays overflow-free by construction, not by accident
      o = (o.toLong + 8L + size + (size & 1)).toInt
    }
    throw new IllegalArgumentException(
      if (sawFmt) "WAV: no data chunk" else "WAV: no fmt chunk")
  }

  /** Encode signed 32-bit PCM mono — the synthesis half. Every sample
    * must fit int32; the synthesis side's code points (≤ 0x10FFFF) do.
    */
  def encodePcm32(samples: Array[Long], sampleRate: Int = 16000)
      : Array[Byte] = {
    require(sampleRate > 0, s"encodePcm32: bad sample rate $sampleRate")
    require(samples.forall(s => s >= Int.MinValue && s <= Int.MaxValue),
      "encodePcm32: sample out of int32 range")
    val dataSize = samples.length * 4
    val out = new Array[Byte](44 + dataSize)
    def putTag(o: Int, s: String): Unit = {
      var i = 0
      while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(o: Int, v: Int): Unit = {
      var i = 0
      while (i < 4) { out(o + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    putTag(0, "RIFF"); put32(4, 36 + dataSize); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16)
    put16(20, 1) // PCM
    put16(22, 1) // mono
    put32(24, sampleRate)
    put32(28, sampleRate * 4) // byte rate
    put16(32, 4) // block align
    put16(34, 32) // bits/sample
    putTag(36, "data"); put32(40, dataSize)
    var i = 0
    while (i < samples.length) { put32(44 + 4 * i, samples(i).toInt); i += 1 }
    out
  }
}
