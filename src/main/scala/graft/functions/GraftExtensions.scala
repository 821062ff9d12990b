package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's native expressions, via the standard
  * `SparkSessionExtensions` injection point:
  *
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions
  *
  * or [[GraftExtensions.register]] on an existing session. After either,
  * plain SQL can call:
  *
  *   hashed_shingles(text, n, fast)   → array<bigint>
  *   micro_cosine(a, b)               → bigint (floor(cos·1e6))
  *   lsh_buckets(v, dim, planes, L)   → array<bigint>
  *   minhash_sig(hs, k)               → array<bigint>
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def boolLit(e: Expression, what: String): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      /* arguments */ "", /* examples */ "", /* note */ "",
      /* group */ "misc_funcs", /* since */ "0.1.0", /* deprecated */ "",
      /* source */ "built-in")

  val injections: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("hashed_shingles",
      info("hashed_shingles",
        "hashed_shingles(text, n, fast) - distinct hashed word n-shingles"),
      (args: Seq[Expression]) =>
        HashedShingles(args(0), intLit(args(1), "n"), boolLit(args(2), "fast"))),
    ("micro_cosine",
      info("micro_cosine",
        "micro_cosine(a, b) - floor(cosine(a,b)*1e6) over float arrays"),
      (args: Seq[Expression]) => MicroCosine(args(0), args(1))),
    ("lsh_buckets",
      info("lsh_buckets",
        "lsh_buckets(v, dim, planes, tables) - hyperplane LSH bucket ids"),
      (args: Seq[Expression]) =>
        LshBuckets(args(0), intLit(args(1), "dim"),
          intLit(args(2), "planes"), intLit(args(3), "tables"))),
    ("minhash_sig",
      info("minhash_sig",
        "minhash_sig(hs, k) - k-min universal-hash MinHash signature"),
      (args: Seq[Expression]) => MinHashSig(args(0), intLit(args(1), "k"))),
    ("char_grams",
      info("char_grams",
        "char_grams(text, n[, lowered]) - character n-grams in one pass; " +
          "lowered defaults true (grams of lower(text))"),
      (args: Seq[Expression]) => CharGrams(args(0), intLit(args(1), "n"),
        if (args.length >= 3) boolLit(args(2), "lowered") else true)),
    ("word_grams",
      info("word_grams",
        "word_grams(text, n[, lowered[, step]]) - space-joined word " +
          "n-grams in one pass (whole-text gram when shorter than n " +
          "words); lowered defaults true; gram starts advance by step " +
          "words (default 1; step = n gives non-overlapping segments)"),
      (args: Seq[Expression]) => WordGrams(args(0), intLit(args(1), "n"),
        if (args.length >= 3) boolLit(args(2), "lowered") else true,
        if (args.length >= 4) intLit(args(3), "step") else 1)))

  /** Register into an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
}
