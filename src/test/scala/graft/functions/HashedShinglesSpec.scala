package graft.functions

import graft.SparkSpec
import graft.pipeline.{Hashing, Shingles, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** [[HashedShingles]] must be bit-identical to the higher-order composite
  * it replaces (`transform(wordShingles(tokens(text), n), h60)` — which
  * includes `array_distinct`), in BOTH hash modes, on adversarial inputs:
  * empty strings, consecutive/leading/trailing spaces (empty tokens),
  * docs shorter than n, repeated shingles, punctuation, non-ASCII.
  */
class HashedShinglesSpec extends SparkSpec {

  private val nasty = Seq(
    "", " ", "  ", "a", "a b", "a b c d e",
    "a  b   c", " leading", "trailing ", "a a a a a a",
    "Mixed CASE Text", "punct, marks! here?", "tab\tinside",
    "unicode é ü ß 中文 txt", "a b a b a b", "x " * 30)

  private def genDoc: Gen[String] =
    Gen.listOf(Gen.oneOf(
      Gen.oneOf("the", "cat", "sat", "on", "mat", "É", "ß", ""),
      Gen.alphaNumStr.map(_.take(6))))
      .map(_.mkString(" "))

  private def sampled(seed: Long, m: Int): Seq[String] =
    (0 until m).flatMap(i =>
      genDoc.apply(Gen.Parameters.default, Seed(seed + i)).toSeq)

  test("expression equals the HOF composite in both modes") {
    import spark.implicits._
    val docs = (nasty ++ sampled(7L, 60)).toDF("text")
    for ((mode, fast) <- Seq[(org.apache.spark.sql.Column => org.apache.spark.sql.Column, Boolean)](
        (Hashing.h60 _, false), (Hashing.fast60 _, true));
        n <- Seq(1, 2, 3, 5)) {
      val hof = transform(
        Shingles.wordShingles(TextAnalysis.tokens(col("text")), n),
        w => mode(w))
      val diff = docs.select(
        col("text"),
        HashedShingles(col("text"), n, fast).as("expr"),
        hof.as("hof"))
        .filter(not(col("expr") === col("hof")))
        .collect()
      assert(diff.isEmpty,
        s"n=$n fast=$fast mismatches: ${diff.take(3).mkString("; ")}")
    }
  }

  test("expression survives whole-stage codegen and null input") {
    // spark.range (not a local Seq, which would collapse to
    // LocalTableScan with no codegen stage at all) → the projection
    // containing the expression must sit INSIDE a WholeStageCodegen span.
    val df = spark.range(4)
      .select(when(col("id") =!= 1, concat(lit("w"), col("id"), lit(" x y")))
        .as("text"))
      .select(HashedShingles(col("text"), 2, fast = true).as("h"))
    val rows = df.collect()
    assert(rows.length == 4)
    assert(rows.count(_.isNullAt(0)) == 1) // null text -> null array
    // `*(n)` prefixes mark operators inside a WholeStageCodegen stage; the
    // projection carrying hashed_shingles must be starred (no fallback).
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [hashed_shingles"), plan)
  }
}
