package graft.pipeline

/** A REAL in-JVM audio codec for the multimodal pipeline — the audio
  * sibling of [[Bmp]]: canonical-form RIFF/WAVE, PCM (format 1), mono,
  * 16-bit little-endian samples. Pure byte math, no external library,
  * so the container's no-codec constraint doesn't apply; the decoder
  * parses actual RIFF magics, the fmt chunk's audio-format/channel/
  * bit-depth/sample-rate fields, and the data chunk's length, then
  * streams the signed LE16 samples — get the endianness, the sign
  * extension, or the 44-byte layout wrong and the position-weighted
  * checksum diverges from the oracle.
  *
  * The canonical 44-byte layout implemented (what `encode` writes and
  * `decode` validates):
  *   - bytes 0-3   'RIFF', 4-7 chunk size (LE u32, 36 + data bytes)
  *   - bytes 8-11  'WAVE'
  *   - bytes 12-15 'fmt ', 16-19 subchunk size (16)
  *   - bytes 20-21 audio format (1 = PCM), 22-23 channels (1)
  *   - bytes 24-27 sample rate (LE u32)
  *   - bytes 28-31 byte rate (rate·2), 32-33 block align (2)
  *   - bytes 34-35 bits per sample (16)
  *   - bytes 36-39 'data', 40-43 data size (LE u32, 2·n_samples)
  *   - samples: signed 16-bit little-endian, mono
  *
  * Decode failures are LOUD (`IllegalArgumentException` naming the
  * offending field) — a truncated or non-WAV payload must never yield
  * silent garbage features.
  */
object Wav {

  /** Decoded stats of one WAV, all integer-exact:
    *   - `s_sum` / `s_abs_sum` — signed and magnitude sums (DC offset
    *     and loudness proxies);
    *   - `s_wsum` = Σ (i+1)·sᵢ — the unique-weight ORDER checksum
    *     (catches endianness/offset mistakes a plain sum can't see);
    *   - `peak` = max |sᵢ|;
    *   - `zero_crossings` — count of sign transitions between
    *     consecutive samples (sample < 0 vs sample ≥ 0), the classic
    *     integer-exact pitch/noisiness proxy.
    * Bounds: |s| ≤ 32768, so s_wsum needs ~log2(32768·n²) bits — Long
    * overflows only past ~10^13 samples per clip.
    */
  final case class Stats(sample_rate: Long, n_samples: Long, n_bytes: Long,
      s_sum: Long, s_abs_sum: Long, s_wsum: Long, peak: Long,
      zero_crossings: Long)

  private def le16u(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Signed 16-bit LE read — the sign extension IS the decode. */
  private def le16s(b: Array[Byte], off: Int): Int = le16u(b, off).toShort.toInt

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    putLe16(b, off, v & 0xffff)
    putLe16(b, off + 2, (v >>> 16) & 0xffff)
  }

  private def putMagic(b: Array[Byte], off: Int, m: String): Unit = {
    var i = 0
    while (i < m.length) { b(off + i) = m.charAt(i).toByte; i += 1 }
  }

  /** Encode `n` mono PCM16 samples given by `sample(i)` (masked to the
    * signed 16-bit range) at `sampleRate` Hz as a canonical 44-byte-
    * header WAV byte array.
    */
  def encode(sampleRate: Int, n: Int, sample: Int => Int): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    require(n > 0, s"bad sample count $n")
    val b = new Array[Byte](44 + 2 * n)
    putMagic(b, 0, "RIFF"); putLe32(b, 4, 36 + 2 * n)
    putMagic(b, 8, "WAVE")
    putMagic(b, 12, "fmt "); putLe32(b, 16, 16)
    putLe16(b, 20, 1) // PCM
    putLe16(b, 22, 1) // mono
    putLe32(b, 24, sampleRate)
    putLe32(b, 28, sampleRate * 2) // byte rate
    putLe16(b, 32, 2) // block align
    putLe16(b, 34, 16) // bits per sample
    putMagic(b, 36, "data"); putLe32(b, 40, 2 * n)
    var i = 0
    while (i < n) {
      putLe16(b, 44 + 2 * i, sample(i) & 0xffff)
      i += 1
    }
    b
  }

  /** Validated header facts — one loud parse shared by both decoders. */
  private final case class Header(sampleRate: Int, n: Int)

  private def parseHeader(bytes: Array[Byte]): Header = {
    require(bytes.length >= 44,
      s"WAV too short: ${bytes.length} bytes < 44-byte header")
    def magic(off: Int, want: String): Unit = {
      val got = new String(bytes, off, want.length, "US-ASCII")
      require(got == want, s"not a canonical WAV: '$got' at $off, want '$want'")
    }
    magic(0, "RIFF"); magic(8, "WAVE"); magic(12, "fmt "); magic(36, "data")
    val fmtSize = le32(bytes, 16)
    require(fmtSize == 16, s"unsupported fmt-chunk size $fmtSize (only 16)")
    val audioFormat = le16u(bytes, 20)
    require(audioFormat == 1, s"unsupported audio format $audioFormat (only PCM)")
    val channels = le16u(bytes, 22)
    require(channels == 1, s"unsupported channel count $channels (only mono)")
    val bps = le16u(bytes, 34)
    require(bps == 16, s"unsupported bits-per-sample $bps (only 16)")
    val sampleRate = le32(bytes, 24)
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val dataBytes = le32(bytes, 40)
    require(dataBytes >= 2 && dataBytes % 2 == 0,
      s"bad data-chunk size $dataBytes")
    require(44L + dataBytes <= bytes.length,
      s"truncated WAV: need ${44L + dataBytes} bytes, have ${bytes.length}")
    Header(sampleRate, dataBytes / 2)
  }

  /** Parse a canonical mono PCM16 WAV and return its [[Stats]] in one
    * streaming pass (no sample array materialized).
    */
  def decode(bytes: Array[Byte]): Stats = {
    val hd = parseHeader(bytes)
    var sSum = 0L; var sAbs = 0L; var sWsum = 0L
    var peak = 0L; var zc = 0L
    var prevNeg = false
    var i = 0
    while (i < hd.n) {
      val v = le16s(bytes, 44 + 2 * i)
      sSum += v; sAbs += math.abs(v)
      sWsum += (i + 1L) * v
      if (math.abs(v) > peak) peak = math.abs(v)
      val neg = v < 0
      if (i > 0 && neg != prevNeg) zc += 1
      prevNeg = neg
      i += 1
    }
    Stats(hd.sampleRate.toLong, hd.n.toLong, bytes.length.toLong,
      sSum, sAbs, sWsum, peak, zc)
  }

  /** Parse into the full sample array (the representation the frame
    * feature pass windows over; same loud validation as [[decode]]).
    */
  def decodeSamples(bytes: Array[Byte]): (Int, Array[Int]) = {
    val hd = parseHeader(bytes)
    val out = new Array[Int](hd.n)
    var i = 0
    while (i < hd.n) { out(i) = le16s(bytes, 44 + 2 * i); i += 1 }
    (hd.sampleRate, out)
  }
}
