package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The GVF1 video container: frame addressing by seek, round-trips,
  * stride sampling (incl. tail behavior), and loud demux failures.
  */
class VidSpec extends AnyFunSuite {

  private def frameOf(seed: Int): Array[Byte] =
    Bmp.encode(2 + seed % 3, 2, (x, y, c) => seed + 11 * x + 5 * y + c)

  test("frame() seeks to exactly the encoded frame bytes") {
    val frames = (0 until 4).map(frameOf)
    val v = Vid.encode(frames)
    assert(Vid.frameCount(v) == 4)
    for (i <- 0 until 4)
      assert(Vid.frame(v, i).toSeq == frames(i).toSeq, s"frame $i")
  }

  test("sampled frames decode to the planted per-frame formula") {
    import org.apache.spark.sql.SparkSession
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val got = Multimodal.sampleVideoFrames(
        Multimodal.vidAssetsFromDocuments(docs), stride = 2).collect()
    assert(got.nonEmpty)
    got.foreach { fr =>
      val h = Hashing.h60(fr.asset_id.toString)
      val (w, hh) = Multimodal.bmpDims(h)
      assert(fr.frame_idx % 2 == 0)
      assert(fr.frame_idx < Multimodal.vidFrames(h))
      assert(fr.width == w && fr.height == hh)
      var sum = 0L; var wsum = 0L
      for (y <- 0 until hh; x <- 0 until w; c <- 0 until 3) {
        val v = Multimodal.vidFramePixel(h, fr.frame_idx.toInt)(x, y, c)
        sum += v
        wsum += ((y.toLong * w + x) * 3 + c + 1) * v
      }
      assert(fr.px_sum == sum && fr.px_wsum == wsum,
        s"asset ${fr.asset_id} frame ${fr.frame_idx}")
    }
    // per-asset sampled count = ceil(nf / 2) — the tail rule
    val byAsset = got.groupBy(_.asset_id).view.mapValues(_.length).toMap
    byAsset.foreach { case (id, n) =>
      val nf = Multimodal.vidFrames(Hashing.h60(id.toString))
      assert(n == (nf + 1) / 2, s"asset $id sampled $n of $nf")
    }
  }

  test("malformed containers fail loudly") {
    val v = Vid.encode(Seq(frameOf(1), frameOf(2)))
    val badMagic = v.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](Vid.frameCount(badMagic))
    intercept[IllegalArgumentException](Vid.frame(v, 2)) // out of range
    intercept[IllegalArgumentException](Vid.frame(v.take(20), 1)) // truncated
    intercept[IllegalArgumentException](Vid.encode(Seq.empty))
    // a corrupted frame payload fails in the BMP decoder, not silently
    val corrupt = v.clone(); corrupt(8 + 4) = 'X' // first frame's magic
    intercept[IllegalArgumentException](Bmp.decode(Vid.frame(corrupt, 0)))
    // a corrupt LENGTH prefix (negative / huge) fails the walk loudly —
    // never wraps the bound check or cycles the directory
    val negLen = v.clone(); negLen(8 + 3) = 0x80.toByte // frame-0 len < 0
    intercept[IllegalArgumentException](Vid.frame(negLen, 1))
    val hugeLen = v.clone()
    hugeLen(8 + 2) = 0xff.toByte; hugeLen(8 + 3) = 0x7f.toByte // ~2^31
    intercept[IllegalArgumentException](Vid.frame(hugeLen, 1))
  }
}
