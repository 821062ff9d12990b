package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale-up generator for the 10× efficiency evidence (VERDICT round 5
  * "Next round" #1): `runMain graft.tools.ScaleUp <srcSfDir> <outDir>
  * <factor>` writes a `factor`×-size copy of the heavy-family input
  * tables (lineitem, part, documents) by unioning key-shifted copies.
  *
  * The construction preserves per-copy structure EXACTLY, giving known
  * ground truth for scaling measurements:
  *
  *   - lineitem/part: every key is shifted by `k × span` with spans
  *     rounded up to a multiple of 10, so the derived co-purchase
  *     graph's `% 10` classes are copy-invariant and copies are
  *     DISJOINT (an order of copy j never references a part of copy i)
  *     — the graph becomes `factor` isomorphic islands: component
  *     count × factor, component sizes unchanged, degree distribution
  *     unchanged.
  *   - documents: `doc_id` shifted; for copies k > 0 every
  *     space-separated word gets a `~k` suffix. Word→word~k is a
  *     bijection, so shingle sets map bijectively and WITHIN-copy
  *     Jaccard/MinHash/SimHash structure is bit-equivalent in
  *     similarity space, while copies share zero shingles — so
  *     near-dup pair counts scale exactly ×factor, never
  *     quadratically (a naive text clone would make every doc an
  *     exact dup of its 9 clones and blow the pair graph up ×45).
  *
  * Output goes under the given outDir (e.g. /tmp/graft_sf1); the data
  * is regenerable and never committed.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorStr) = args
    val factor = factorStr.toLong
    // events.ts generations differ (TIMESTAMP(NANOS) vs timestamp[us]);
    // nanosAsLong tolerates the former, and the copy below round-trips
    // whichever shape it read — Tables.normalizeEventTs adapts on read.
    val spark = graft.Hgn.session("graft-scaleup", Map(
      "spark.sql.legacy.parquet.nanosAsLong" -> "true",
      "spark.ui.enabled" -> "false"))
    spark.sparkContext.setLogLevel("WARN")
    run(spark, srcDir, outDir, factor)
    spark.stop()
  }

  /** The generation body, session-agnostic so the test suite can
    * (re)generate the sf1 plan-guard directory on its own shared
    * session (VERDICT round 9 #2 — the guard must not depend on a
    * manual pre-step that, when skipped, silently cancels the test).
    */
  def run(spark: org.apache.spark.sql.SparkSession, srcDir: String,
      outDir: String, factor: Long): Unit = {
    require(factor >= 1, s"factor must be >= 1, got $factor")

    val copies = spark.range(factor).select(col("id").as("k"))
    // Loud-failure guards (ADVICE round 6): an empty table yields a null
    // max (NPE with an opaque message without the check), and the
    // copy-disjointness argument assumes non-negative keys — a negative
    // min id could make shifted copies overlap.
    def span(df: DataFrame, c: String): Long = {
      val row = df.agg(max(col(c).cast("long")), min(col(c).cast("long"))).head()
      require(!row.isNullAt(0),
        s"ScaleUp: key column '$c' has no rows — cannot derive a shift span")
      require(row.getLong(1) >= 0,
        s"ScaleUp: negative $c (min ${row.getLong(1)}) would overlap shifted copies")
      (row.getLong(0) / 10 + 1) * 10
    }

    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    val part = spark.read.parquet(s"$srcDir/part.parquet")
    val ordSpan = span(li, "l_orderkey")
    val partSpan = math.max(span(li, "l_partkey"), span(part, "p_partkey"))
    li.crossJoin(copies)
      .withColumn("l_orderkey", col("l_orderkey") + col("k") * ordSpan)
      .withColumn("l_partkey", col("l_partkey") + col("k") * partSpan)
      .drop("k")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/lineitem.parquet")
    part.crossJoin(copies)
      .withColumn("p_partkey", col("p_partkey") + col("k") * partSpan)
      .drop("k")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/part.parquet")

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val docSpan = span(docs, "doc_id")
    docs.crossJoin(copies)
      .withColumn("doc_id", col("doc_id") + col("k") * docSpan)
      .withColumn("text", when(col("k") === 0, col("text"))
        .otherwise(array_join(
          transform(split(col("text"), " "),
            w => concat(w, lit("~"), col("k").cast("string"))), " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("k")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")

    // embeddings: vec_id shifted; copy k's vectors get a per-copy RANDOM
    // SIGN FLIP per coordinate (hash-derived ±1 diagonal) — a diagonal
    // orthogonal transform applied uniformly within a copy preserves
    // every within-copy pairwise cosine exactly (per-copy ANN/LSH
    // structure identical in similarity space), while the effective
    // cross-copy sign pattern is random, driving cross-copy cosines to
    // ~0 — so p11-style near-dup pair counts scale linearly, never
    // quadratically. (A cyclic ROTATION does NOT work here: these
    // vectors carry shift structure and rotated copies stay correlated
    // — measured 110x pair growth at 10x before switching to flips.)
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val vecSpan = span(emb, "vec_id")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    emb.crossJoin(copies)
      .withColumn("vec_id", col("vec_id") + col("k") * vecSpan)
      .withColumn("embedding",
        when(col("k") === 0, col("embedding")).otherwise(
          transform(col("embedding"), (x, i) =>
            x * (pmod(xxhash64(col("k") * dim + i), lit(2)) * 2 - 1)
              .cast("float"))))
      .drop("k")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/embeddings.parquet")

    // events: ids and users shifted, timestamps kept — 10x keys over the
    // same time range scales streaming state (sessions, running stats,
    // window groups) by 10x, which is the dimension that matters.
    val ev = spark.read.parquet(s"$srcDir/events.parquet")
    val evSpan = span(ev, "event_id")
    val userSpan = span(ev, "user_id")
    ev.crossJoin(copies)
      .withColumn("event_id", col("event_id") + col("k") * evSpan)
      .withColumn("user_id", col("user_id") + col("k") * userSpan)
      .drop("k")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/events.parquet")

    println(s"[scaleup] wrote lineitem/part/documents/embeddings/events " +
      s"x$factor from $srcDir to $outDir")
  }
}
