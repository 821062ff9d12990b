package graft

import org.scalatest.funsuite.AnyFunSuite

class SessionTuningSpec extends AnyFunSuite {

  test("partitions floor at the core count for small inputs") {
    // sf0.1 is ~18 MB on disk — stays at cores (bench comparability).
    assert(SessionTuning.partitionsForBytes(0L, 32) == 32)
    assert(SessionTuning.partitionsForBytes(18L << 20, 32) == 32)
  }

  test("partitions derive the measured-working count at 30x") {
    // The calibration point: 247 MB (ScaleUp factor 30) must derive
    // >= 128 — the value g05 was measured to need on the 8 GiB JVM.
    val p = SessionTuning.partitionsForBytes(247L << 20, 32)
    assert(p >= 128, s"derived $p at the 30x OOM calibration point")
    assert(p <= 256, s"derived $p — erring high is fine, 8x high is not")
  }

  test("partitions scale with bytes, round up to powers of two") {
    val p100 = SessionTuning.partitionsForBytes(824L << 20, 32)
    assert(p100 >= 412 && (p100 & (p100 - 1)) == 0,
      s"100x (~824 MB) derived $p100")
    // Monotone in bytes.
    val seq = Seq(1L, 100L, 300L, 1000L, 5000L)
      .map(mb => SessionTuning.partitionsForBytes(mb << 20, 32))
    assert(seq == seq.sorted)
    // Backstop cap.
    assert(SessionTuning.partitionsForBytes(Long.MaxValue / 4, 32) ==
      SessionTuning.MaxPartitions)
  }

  test("autoConfs derives the AQE coalescing pair exactly in data-sized mode") {
    // Small input (sf0.1-like): partition count only — stock AQE
    // behavior and cross-round bench comparability are preserved.
    val small = java.nio.file.Files.createTempDirectory("tuning-small")
    java.nio.file.Files.write(small.resolve("a.parquet"), new Array[Byte](1 << 20))
    assert(SessionTuning.autoConfs(small.toString, 32) ==
      Seq("spark.sql.shuffle.partitions" -> "32"))
    // Data-sized input (30x calibration point, ~247 MB): the derived
    // partition count AND the coalescing confs that keep AQE from
    // repacking it toward the core count — advisory bytes pinned to
    // the SAME rate the count was derived from, so the knobs agree.
    val big = java.nio.file.Files.createTempDirectory("tuning-big")
    val chunk = new Array[Byte](1 << 20)
    val f = java.nio.file.Files.newOutputStream(big.resolve("b.parquet"))
    try (1 to 247).foreach(_ => f.write(chunk)) finally f.close()
    val confs = SessionTuning.autoConfs(big.toString, 32).toMap
    assert(confs("spark.sql.shuffle.partitions").toInt >= 128)
    assert(confs("spark.sql.adaptive.coalescePartitions.parallelismFirst") == "false")
    assert(confs("spark.sql.adaptive.advisoryPartitionSizeInBytes") ==
      SessionTuning.BytesPerShufflePartition.toString)
  }

  test("dirBytes sums recursively and tolerates missing paths") {
    val dir = java.nio.file.Files.createTempDirectory("tuning-spec")
    java.nio.file.Files.write(dir.resolve("a.bin"), new Array[Byte](1000))
    val sub = java.nio.file.Files.createDirectory(dir.resolve("sub"))
    java.nio.file.Files.write(sub.resolve("b.bin"), new Array[Byte](234))
    assert(SessionTuning.dirBytes(dir.toString) == 1234L)
    assert(SessionTuning.dirBytes(dir.resolve("nope").toString) == 0L)
  }
}
