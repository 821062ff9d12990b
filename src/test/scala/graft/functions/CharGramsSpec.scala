package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** [[CharGrams]] must be bit-identical to the higher-order composite it
  * replaces — `transform(sequence(1, length(tx) - (n-1)), i ⇒
  * substr(tx, i, n))` over `tx = lower(text)` — on adversarial inputs:
  * empty strings, docs shorter than n, repeated chars, spaces (grams
  * legitimately span word boundaries), punctuation, multi-byte UTF-8.
  */
class CharGramsSpec extends SparkSpec {

  private val nasty = Seq(
    "", " ", "ab", "abc", "a b c", "aaaaaa",
    "Mixed CASE Text", "punct, marks! here?", "tab\tinside",
    "unicode é ü ß 中文 txt", "ÉÜSS", "x" * 50)

  private def genDoc: Gen[String] =
    Gen.listOf(Gen.oneOf(
      Gen.oneOf("the", "cat", "É", "ß", "中", ""),
      Gen.alphaNumStr.map(_.take(6))))
      .map(_.mkString(" "))

  private def sampled(seed: Long, m: Int): Seq[String] =
    (0 until m).flatMap(i =>
      genDoc.apply(Gen.Parameters.default, Seed(seed + i)).toSeq)

  test("expression equals the substr composite, all positions, lowered") {
    import spark.implicits._
    val docs = (nasty ++ sampled(11L, 60)).toDF("text")
    for (n <- Seq(1, 2, 3, 5)) {
      val tx = lower(col("text"))
      val hof = when(length(tx) >= n,
        transform(sequence(lit(1), length(tx) - (n - 1)),
          i => tx.substr(i, lit(n))))
        .otherwise(array().cast("array<string>"))
      val diff = docs.select(col("text"),
          CharGrams(col("text"), n).as("expr"), hof.as("hof"))
        .filter(not(col("expr") === col("hof")))
        .collect()
      assert(diff.isEmpty,
        s"n=$n mismatches: ${diff.take(3).mkString("; ")}")
    }
  }

  test("raw mode (lowered=false) + posexplode equals the positional " +
      "substring composite editDistanceJoin replaced") {
    import spark.implicits._
    val docs = (nasty ++ sampled(23L, 60)).toDF("text")
    for (q <- Seq(2, 3, 5)) {
      val composite = docs
        .filter(length(col("text")) >= q)
        .select(col("text"),
          explode(expr(s"transform(sequence(1, length(text) - ${q - 1}), " +
            s"i -> struct(i AS pos, substring(text, i, $q) AS g))")).as("pg"))
        .select(col("text"), col("pg.pos").as("pos"), col("pg.g").as("g"))
      val kernel = docs
        .filter(length(col("text")) >= q)
        .select(col("text"),
          posexplode(CharGrams.raw(col("text"), q)).as(Seq("pos0", "g")))
        .select(col("text"), (col("pos0") + lit(1)).as("pos"), col("g"))
      assert(kernel.exceptAll(composite).isEmpty &&
        composite.exceptAll(kernel).isEmpty,
        s"q=$q positional mismatch vs substring composite")
    }
  }

  test("NULL input: intentional divergence from the composite " +
      "(NULL out, not empty array) — zero rows either way under explode") {
    import spark.implicits._
    val docs = Seq[String](null).toDF("text")
    val n = 3
    val tx = lower(col("text"))
    val hof = when(length(tx) >= n,
      transform(sequence(lit(1), length(tx) - (n - 1)),
        i => tx.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))
    val row = docs.select(CharGrams(col("text"), n).as("expr"), hof.as("hof"))
      .collect()(0)
    assert(row.isNullAt(0), "expression must null-propagate on NULL text")
    assert(row.getSeq[String](1).isEmpty,
      "the composite's when/otherwise returned empty array — the pinned delta")
    // both shapes contribute zero rows at the explode() call sites
    assert(docs.select(explode(CharGrams(col("text"), n))).count() == 0L)
    assert(docs.select(explode(hof)).count() == 0L)
  }

  test("registered SQL function and null/short-doc semantics") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val got = Seq(("ABcd"), ("x")).toDF("text")
      .selectExpr("char_grams(text, 3) AS g")
      .collect().map(_.getSeq[String](0).mkString(","))
    assert(got.toSeq == Seq("abc,bcd", ""))
    // null text stays null (UnaryExpression null propagation)
    val n = spark.sql("SELECT char_grams(CAST(NULL AS STRING), 3)")
      .collect()(0)
    assert(n.isNullAt(0))
    // optional 3rd arg: lowered=false preserves case
    val raw = spark.sql("SELECT char_grams('ABcd', 3, false)")
      .collect()(0).getSeq[String](0).mkString(",")
    assert(raw == "ABc,Bcd")
  }
}
