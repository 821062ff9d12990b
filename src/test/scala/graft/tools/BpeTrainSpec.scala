package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Bpe

class BpeTrainSpec extends AnyFunSuite {

  test("trainer=auto selects the local trainer for driver-sized " +
      "vocabularies, the delta trainer at production merge counts " +
      "beyond the driver bound, full below the crossover; explicit " +
      "flags pass through") {
    // Driver-sized vocabulary: local at every merge count.
    assert(BpeTrain.selectTrainer("auto", 64, 100000L) == "local")
    assert(BpeTrain.selectTrainer("auto", 100000, 100000L) == "local")
    assert(BpeTrain.selectTrainer("auto", 64,
      Bpe.LocalTrainerMaxWords.toLong) == "local")
    // Beyond the driver bound: the measured distributed crossover
    // (BASELINE "BPE trainer crossover") — full wins ~10% at <=25k
    // merges, delta wins 1.9x at 100k; auto flips at the 32k point.
    val big = Bpe.LocalTrainerMaxWords + 1L
    assert(BpeTrain.selectTrainer("auto", 64, big) == "full")
    assert(BpeTrain.selectTrainer("auto", 25000, big) == "full")
    assert(BpeTrain.selectTrainer("auto", BpeTrain.AutoDeltaThreshold, big)
      == "delta")
    assert(BpeTrain.selectTrainer("auto", 100000, big) == "delta")
    assert(BpeTrain.selectTrainer("full", 100000, 100L) == "full")
    assert(BpeTrain.selectTrainer("delta", 64, 100L) == "delta")
    assert(BpeTrain.selectTrainer("local", 64, big) == "local")
  }
}
