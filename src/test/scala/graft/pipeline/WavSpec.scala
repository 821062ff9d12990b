package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The WAV codec against HAND-CRAFTED golden bytes (pinning the decoder
  * to the actual RIFF layout, not merely the encoder's conventions),
  * plus round-trip, frame-feature, and loud-failure properties.
  */
class WavSpec extends AnyFunSuite {

  /** A 4-sample mono PCM16 clip at 8000 Hz written out BYTE BY BYTE:
    * samples 1000, -1000, 0, -32768 (max-negative exercises sign
    * extension). Data size = 8, file = 52 bytes.
    */
  private val golden: Array[Byte] = (Array[Int](
    'R', 'I', 'F', 'F', 44, 0, 0, 0, // chunk size 36 + 8
    'W', 'A', 'V', 'E',
    'f', 'm', 't', ' ', 16, 0, 0, 0, // fmt, size 16
    1, 0, // PCM
    1, 0, // mono
    0x40, 0x1f, 0, 0, // 8000 Hz
    0x80, 0x3e, 0, 0, // byte rate 16000
    2, 0, // block align
    16, 0, // bits per sample
    'd', 'a', 't', 'a', 8, 0, 0, 0) ++ Array[Int](
    0xe8, 0x03, // 1000
    0x18, 0xfc, // -1000
    0x00, 0x00, // 0
    0x00, 0x80 // -32768
  )).map(_.toByte)

  test("decodes the hand-crafted golden WAV exactly") {
    val s = Wav.decode(golden)
    assert(s.sample_rate == 8000L && s.n_samples == 4L && s.n_bytes == 52L)
    assert(s.s_sum == 1000L - 1000L + 0L - 32768L)
    assert(s.s_abs_sum == 1000L + 1000L + 0L + 32768L)
    // position weights 1..4
    assert(s.s_wsum == 1L * 1000 + 2L * -1000 + 3L * 0 + 4L * -32768)
    assert(s.peak == 32768L)
    // sign sequence: +, -, + (0 is non-negative), - → 3 crossings
    assert(s.zero_crossings == 3L)
  }

  test("encode/decode round-trips the planted formula at every geometry") {
    for (id <- 0L until 40L) {
      val h = Hashing.h60(id.toString)
      val (n, rate) = Multimodal.wavGeom(h)
      val bytes = Wav.encode(rate, n, Multimodal.wavSample(h))
      val s = Wav.decode(bytes)
      assert(s.sample_rate == rate.toLong && s.n_samples == n.toLong)
      assert(s.n_bytes == 44L + 2 * n)
      val want = (0 until n).map(Multimodal.wavSample(h))
      assert(s.s_sum == want.map(_.toLong).sum)
      assert(s.s_wsum == want.zipWithIndex.map {
        case (v, i) => (i + 1L) * v }.sum)
      val (r2, samples) = Wav.decodeSamples(bytes)
      assert(r2 == rate && samples.toSeq == want)
    }
  }

  test("frame features: energy, tail frame, within-frame crossings") {
    import org.apache.spark.sql.SparkSession
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    // 10 samples → frames of 4: [3,-3,3,-3], [2,2,-2,-2], [5,5] (tail)
    val vals = Array(3, -3, 3, -3, 2, 2, -2, -2, 5, 5)
    val assets = Seq(Multimodal.Asset(7L,
      Wav.encode(8000, vals.length, vals(_)), "audio/wav")).toDS()
    val got = Multimodal.wavFrameFeatures(assets, frameLen = 4).collect()
      .map(f => f.frame_idx -> ((f.n_in_frame, f.energy, f.zero_crossings)))
      .toMap
    assert(got(0L) == ((4L, 36L, 3L)))
    assert(got(1L) == ((4L, 16L, 1L)))
    assert(got(2L) == ((2L, 50L, 0L))) // short tail frame
  }

  test("malformed input fails loudly") {
    def bad(mutate: Array[Byte] => Unit, want: String): Unit = {
      val b = golden.clone()
      mutate(b)
      val e = intercept[IllegalArgumentException](Wav.decode(b))
      assert(e.getMessage.contains(want), s"got: ${e.getMessage}")
    }
    bad(b => b(0) = 'X', "not a canonical WAV")
    bad(b => b(20) = 3, "audio format") // non-PCM
    bad(b => b(22) = 2, "channel count") // stereo
    bad(b => b(34) = 8, "bits-per-sample")
    bad(b => b(40) = 100, "truncated") // data size past payload
    intercept[IllegalArgumentException](Wav.decode(golden.take(20)))
  }
}
