package graft.tools

import org.scalatest.funsuite.AnyFunSuite

class BpeTrainSpec extends AnyFunSuite {

  test("trainer=auto selects the delta trainer at the production vocab " +
      "scale, full below the crossover; explicit flags pass through") {
    // The measured crossover (BASELINE "BPE trainer crossover"): full
    // wins ~10% at <=25k merges, delta wins 1.9x at 100k — auto flips
    // at the 32k production point.
    assert(BpeTrain.selectTrainer("auto", 64) == "full")
    assert(BpeTrain.selectTrainer("auto", 25000) == "full")
    assert(BpeTrain.selectTrainer("auto", BpeTrain.AutoDeltaThreshold)
      == "delta")
    assert(BpeTrain.selectTrainer("auto", 100000) == "delta")
    assert(BpeTrain.selectTrainer("full", 100000) == "full")
    assert(BpeTrain.selectTrainer("delta", 64) == "delta")
  }
}
