package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("lsb rank: positions and zero saturation") {
    import spark.implicits._
    val got = Seq(1L, 2L, 3L, 8L, 12L, 1L << 40, 0L).toDF("x")
      .select(Sketches.lsbRank(col("x")).as("r"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(1, 2, 1, 4, 3, 41, Sketches.MaxRho))
  }

  test("estimate lands in the HLL error band and is deterministic") {
    import spark.implicits._
    val n = 20000
    val d = (1 to n).map(i => ("g", s"key_$i")).toDF("grp", "k")
    val run = () => Sketches.approxDistinct(d, "grp", "k").collect()
      .map(r => (r.getLong(1), r.getLong(2))).head
    val (rows, est) = run()
    assert(rows == n)
    // 1.04/sqrt(256) = 6.5% standard error; allow 4 sigma.
    assert(math.abs(est - n) < 0.26 * n, s"est $est vs $n")
    assert(run()._2 == est) // bit-identical re-run
  }

  test("duplicates do not inflate the estimate") {
    import spark.implicits._
    val dup = (1 to 5000).flatMap(i => Seq.fill(4)(("g", s"key_${i % 100}")))
      .toDF("grp", "k")
    val est = Sketches.approxDistinct(dup, "grp", "k").collect()
      .map(_.getLong(2)).head
    assert(est < 200, s"100 distinct keys estimated as $est")
  }

  test("bottom-k sample: deterministic, mergeable across shards") {
    import spark.implicits._
    val d = (1 to 500).map(i => ("g", i.toLong, s"text_$i"))
      .toDF("grp", "id", "t")
    val sample = Sketches.bottomKSample(d, "grp", "t", "id", 20).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("sample_rank")))
    assert(sample.length == 20)
    // Re-run is identical (content-keyed, no RNG).
    val again = Sketches.bottomKSample(d, "grp", "t", "id", 20).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("sample_rank")))
    assert(sample.toSeq == again.toSeq)
    // Mergeability: bottom-k of the union == bottom-k of the parts'
    // bottom-ks (the shard-combine property).
    val part1 = d.filter(col("id") <= 250)
    val part2 = d.filter(col("id") > 250)
    val combined = Sketches.bottomKSample(
      Sketches.bottomKSample(part1, "grp", "t", "id", 20)
        .unionByName(Sketches.bottomKSample(part2, "grp", "t", "id", 20))
        .drop("h", "sample_rank"),
      "grp", "t", "id", 20).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("sample_rank")))
    assert(combined.toSeq == sample.toSeq)
  }

  test("sketch algebra: union via register max, inclusion-exclusion") {
    import spark.implicits._
    // a = 1..2000, b = 1001..3000: |a|=|b|=2000, |union|=3000,
    // |inter|=1000.
    val d = ((1 to 2000).map(i => ("a", s"k$i")) ++
      (1001 to 3000).map(i => ("b", s"k$i"))).toDF("grp", "k")
    val r = Sketches.approxDistinctPair(d, "grp", "k", "a", "b").head()
    val (ea, eb, eu, ei) = (r.getAs[Long]("est_a"), r.getAs[Long]("est_b"),
      r.getAs[Long]("est_union"), r.getAs[Long]("est_inter"))
    assert(math.abs(ea - 2000) < 520 && math.abs(eb - 2000) < 520)
    assert(math.abs(eu - 3000) < 780)
    // Inclusion-exclusion compounds the three error bands; just pin the
    // scale and the exact identity.
    assert(ei == ea + eb - eu)
    assert(math.abs(ei - 1000) < 1000)
    // The union estimate must equal a direct sketch of the merged keys
    // (mergeability is exact, not approximate).
    val direct = Sketches.approxDistinct(
      d.withColumn("grp", lit("all")), "grp", "k").head().getAs[Long](2)
    assert(eu == direct)
  }

  test("count-min: estimate never under-counts, exact without collisions") {
    import spark.implicits._
    // 9 occurrences over 3 keys; width 2048 with 3 keys ≈ no collisions,
    // so estimates are EXACT here; the >= guarantee is separate below.
    val items = Seq("a", "a", "a", "b", "b", "c", "a", "c", "c").toDF("k")
    val sk = Sketches.countMinSketch(items, "k")
    val est = Sketches.countMinLookup(sk, Seq("a", "b", "c", "zz").toDF("k"), "k")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est_n")).toMap
    assert(est("a") == 4L && est("b") == 2L && est("c") == 3L)
    assert(est("zz") == 0L) // absent key, empty cells → 0, never NULL
    // Total counter mass per row equals the stream length.
    val perRow = sk.groupBy("cm_row").agg(sum("cnt").as("s"))
      .collect().map(_.getAs[Long]("s"))
    assert(perRow.length == 4 && perRow.forall(_ == 9L))
  }

  test("count-min: over-count-only guarantee on a colliding sketch") {
    import spark.implicits._
    // Tiny width FORCES collisions: every estimate must still be >= the
    // true count for every key in the stream.
    val words = (1 to 300).map(i => s"w${i % 37}").toDF("k")
    val truth = words.groupBy("k").agg(count(lit(1)).as("n_true"))
    val sk = Sketches.countMinSketch(words, "k", depth = 3, width = 16)
    val joined = Sketches.countMinLookup(sk, truth.select("k"), "k",
        depth = 3, width = 16)
      .join(truth, Seq("k")).collect()
    assert(joined.length == 37)
    joined.foreach { r =>
      assert(r.getAs[Long]("est_n") >= r.getAs[Long]("n_true"),
        s"under-count at ${r.getString(0)}")
    }
  }

  test("count-min: merged shard sketches equal the whole-stream sketch") {
    import spark.implicits._
    val all = (1 to 200).map(i => s"k${i % 23}").toDF("k")
    val s1 = Sketches.countMinSketch(all.filter(expr("hash(k) % 2 = 0")), "k")
    val s2 = Sketches.countMinSketch(all.filter(expr("hash(k) % 2 != 0")), "k")
    val merged = s1.union(s2).groupBy("cm_row", "pos")
      .agg(sum("cnt").as("cnt"))
    val whole = Sketches.countMinSketch(all, "k")
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
  }

  test("quantile sketch: exact nearest-rank when the group fits in k") {
    import spark.implicits._
    // 100 rows, values 1..100, k=200 => the sample IS the group and the
    // nearest-rank quantiles are exact: q(p) = ceil(p * 100).
    val d = (1 to 100).map(i => ("g", i.toLong, s"t$i", i.toLong))
      .toDF("grp", "id", "t", "v")
    val got = Sketches
      .quantileSketch(d, "grp", "v", "t", "id", 200,
        Seq(100, 2500, 5000, 9000, 10000))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(100L -> 1L, 2500L -> 25L, 5000L -> 50L,
      9000L -> 90L, 10000L -> 100L))
  }

  test("quantile sketch: sampled estimate lands in the error band") {
    import spark.implicits._
    val n = 20000
    val d = (1 to n).map(i => ("g", i.toLong, s"key_$i", i.toLong))
      .toDF("grp", "id", "t", "v")
    val got = Sketches
      .quantileSketch(d, "grp", "v", "t", "id", 1024,
        Seq(2500, 5000, 7500))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // Sample-quantile error ~ sqrt(p(1-p)/1024) <= 1.6% prob units;
    // allow 4 sigma => +-6.5% of the range.
    for ((p, q) <- got)
      assert(math.abs(q - p * n / 10000) < 0.065 * n, s"q($p) = $q")
    // Deterministic re-run.
    val again = Sketches
      .quantileSketch(d, "grp", "v", "t", "id", 1024,
        Seq(2500, 5000, 7500))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(again == got)
  }

  test("quantile sketch: rank-error bound holds on adversarial distributions") {
    // VERDICT round 9 #6: the band test above uses uniform values; pin
    // the sketch's actual CONTRACT — sample-quantile RANK error is
    // distribution-free, bounded by ~1.04·sqrt(p(1-p)/k) prob units
    // (+1/k nearest-rank discretization) REGARDLESS of the value
    // distribution — on the distributions that break naive quantile
    // estimators: a Pareto-style heavy tail (top value 4e8, median
    // ~1e5) and a 99/1 two-point mass. Everything is hash-deterministic,
    // so the asserts are stable across re-runs, not probabilistic.
    import spark.implicits._
    val n = 20000
    val k = 1024
    val probs = Seq(100, 2500, 5000, 7500, 9900, 9999)
    def bound(pBp: Int): Double = {
      val p = pBp / 10000.0
      4 * 1.04 * math.sqrt(p * (1 - p) / k) + 1.0 / k
    }
    def checkRanks(values: Seq[Long], label: String): Unit = {
      val d = values.zipWithIndex
        .map { case (v, i) => ("g", i.toLong, s"key_$i", v) }
        .toDF("grp", "id", "t", "v")
      val got = Sketches.quantileSketch(d, "grp", "v", "t", "id", k, probs)
        .collect().map(r => r.getLong(1).toInt -> r.getLong(2)).toMap
      val sorted = values.sorted
      for ((pBp, q) <- got) {
        // True rank of the estimate is an interval under duplicates:
        // [#{v < q}, #{v <= q}] / n must intersect p ± bound.
        val lo = sorted.count(_ < q) / n.toDouble
        val hi = sorted.count(_ <= q) / n.toDouble
        val p = pBp / 10000.0
        assert(lo <= p + bound(pBp) && hi >= p - bound(pBp),
          s"$label: q($pBp)=$q has rank [$lo,$hi], want $p +- ${bound(pBp)}")
      }
    }
    // Pareto-ish heavy tail: v_i = 4e8 / i^2 — six orders of magnitude
    // between head and tail, mass concentrated at tiny values.
    checkRanks((1 to n).map(i => 400000000L / (i.toLong * i)), "heavy-tail")
    // Two-point mass: 99% zeros, 1% ones (spread deterministically).
    checkRanks((1 to n).map(i => if (i % 100 == 0) 1L else 0L), "two-point")

    // Point-mass exactness: the far quantiles of the 99/1 mix resolve to
    // the exact mass points (the bound is far tighter than the gap).
    val twoPoint = (1 to n).map(i => ("g", i.toLong, s"key_$i",
      if (i % 100 == 0) 1L else 0L)).toDF("grp", "id", "t", "v")
    val tp = Sketches.quantileSketch(twoPoint, "grp", "v", "t", "id", k,
        Seq(5000, 9999))
      .collect().map(r => r.getLong(1).toInt -> r.getLong(2)).toMap
    assert(tp == Map(5000 -> 0L, 9999 -> 1L), tp.toString)

    // Constant column: every quantile IS the constant, exactly, even
    // when the group is sampled (m = k < group size).
    val const = (1 to 5000).map(i => ("g", i.toLong, s"key_$i", 42L))
      .toDF("grp", "id", "t", "v")
    val cq = Sketches.quantileSketch(const, "grp", "v", "t", "id", 64,
        Seq(1, 5000, 10000))
      .collect().map(r => r.getLong(1).toInt -> r.getLong(2)).toMap
    assert(cq == Map(1 -> 42L, 5000 -> 42L, 10000 -> 42L), cq.toString)
  }

  test("quantile sketch: merge of shard samples equals whole sketch") {
    import spark.implicits._
    val d = (1 to 5000).map(i => ("g", i.toLong, s"key_$i", i.toLong))
      .toDF("grp", "id", "t", "v")
    val probs = Seq(1000, 5000, 9000)
    val whole = Sketches.quantileSketch(d, "grp", "v", "t", "id", 256, probs)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // Sketch each shard, merge by re-sampling the union of samples,
    // query the merged sample — must equal the whole-data sketch.
    val shards = Seq(
      d.filter(col("id") % 3 === 0), d.filter(col("id") % 3 === 1),
      d.filter(col("id") % 3 === 2))
    val merged = Sketches.bottomKSample(
      shards.map(Sketches.bottomKSample(_, "grp", "t", "id", 256)
        .drop("h", "sample_rank")).reduce(_ unionByName _),
      "grp", "t", "id", 256)
    val got = Sketches.quantilesOfSample(merged, "grp", "v", "id", probs)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == whole)
  }

  test("sketch algebra: absent group estimates 0, never NULL") {
    import spark.implicits._
    val d = (1 to 100).map(i => ("a", s"k$i")).toDF("grp", "k")
    val r = Sketches.approxDistinctPair(d, "grp", "k", "a", "zz").head()
    assert(!r.anyNull, s"NULL leaked into $r")
    assert(r.getAs[Long]("est_b") == 0L)
    assert(r.getAs[Long]("est_union") == r.getAs[Long]("est_a"))
    assert(r.getAs[Long]("est_inter") == 0L)
    // Both groups absent: everything 0.
    val r2 = Sketches.approxDistinctPair(d, "grp", "k", "y", "zz").head()
    assert(Seq("est_a", "est_b", "est_union", "est_inter")
      .forall(c => r2.getAs[Long](c) == 0L))
  }

  test("streaming sketch over any batch split equals the batch sketch") {
    import spark.implicits._
    import graft.streaming.StreamingOps
    val n = 3000
    val d = (1 to n).map(i => (s"g${i % 2}", s"key_$i")).toDF("grp", "k")
    val batch = Sketches.approxDistinct(d, "grp", "k").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // Feed the same rows PRE-HASHED through the keyed streaming state,
    // split across several files (=> several micro-batches with
    // AvailableNow on a file source is not guaranteed, but register MAX
    // makes any split equivalent anyway — that's the property).
    val dir = java.nio.file.Files.createTempDirectory("sketch-stream")
    d.select(col("grp").as("key"), Hashing.h60(col("k")).as("h"))
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema("key STRING, h BIGINT")
      .parquet(s"$dir/in")
      .as[StreamingOps.SketchEvent]
    val q = StreamingOps.approxDistinctStream(stream)
      .writeStream.format("memory").queryName("sketch_stream_spec")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("sketch_stream_spec")
      .groupBy(col("key"))
      .agg(max(col("n_rows")).as("n"),
        max_by(col("est_distinct"), col("n_rows")).as("est"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == batch)
  }

  test("streaming count-min over any batch split equals the batch sketch") {
    import spark.implicits._
    import graft.streaming.StreamingOps
    val d = (1 to 1500).map(i => s"w${i % 31}").toDF("k")
    val batch = Sketches.countMinSketch(d, "k").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

    val dir = java.nio.file.Files.createTempDirectory("cm-stream")
    val depth = 4; val width = 2048L
    d.select(Hashing.h60(col("k")).as("h"))
      .select(col("h"),
        explode(array((0 until depth).map(lit): _*)).as("cm_row"))
      .select(col("cm_row"),
        pmod(col("h") + col("cm_row") * (lit(1L) + pmod(col("h"), lit(width - 1L))),
          lit(width)).as("pos"))
      .repartition(4) // several files: counter ADDITION makes any split equal
      .write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema("cm_row INT, pos BIGINT")
      .parquet(s"$dir/in")
      .as[StreamingOps.CellEvent]
    val q = StreamingOps.countMinStream(stream)
      .writeStream.format("memory").queryName("cm_stream_spec")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("cm_stream_spec")
      .groupBy(col("cm_row"), col("pos")).agg(max(col("cnt")).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == batch)
  }

  test("streaming bottom-k over any batch split equals the batch sample") {
    import spark.implicits._
    import graft.streaming.StreamingOps
    val k = 7
    val d = (1 to 2000).map(i => (s"g${i % 3}", s"text_$i", i.toLong))
      .toDF("grp", "txt", "id")
    val batch = Sketches.bottomKSample(d, "grp", "txt", "id", k)
      .select(col("grp"), col("id"), col("h"), col("sample_rank"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    val dir = java.nio.file.Files.createTempDirectory("bk-stream")
    d.select(col("grp").as("key"), Hashing.h60(col("txt")).as("h"),
        col("id").as("tie"))
      .repartition(4) // several files: min-merge makes any split equal
      .write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema("key STRING, h BIGINT, tie BIGINT")
      .parquet(s"$dir/in")
      .as[StreamingOps.BkEvent]
    val q = StreamingOps.bottomKStream(stream, k)
      .writeStream.format("memory").queryName("bk_stream_spec")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("bk_stream_spec")
      .groupBy(col("key"))
      .agg(max_by(col("sample"), col("n_seen")).as("sample"),
        max(col("n_seen")).as("n_seen"))
      .select(col("key"), col("n_seen"), posexplode(col("sample")))
      .collect().map(r => (r.getString(0), r.getStruct(3).getLong(1),
        r.getStruct(3).getLong(0), r.getInt(2).toLong + 1)).toSet
    assert(got == batch)
    // and the state really saw every row: n_seen sums to the input size
    val nSeen = spark.table("bk_stream_spec")
      .groupBy(col("key")).agg(max(col("n_seen")).as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(nSeen == 2000L)
  }

  test("groups sketch independently") {
    import spark.implicits._
    val d = ((1 to 1000).map(i => ("a", s"x$i")) ++
      (1 to 10).map(i => ("b", s"x$i"))).toDF("grp", "k")
    val got = Sketches.approxDistinct(d, "grp", "k").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("a") > 10 * got("b") / 2 && got("a") > 500)
    assert(got("b") < 30)
  }
}
