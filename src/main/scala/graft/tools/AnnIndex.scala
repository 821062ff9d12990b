package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Ann, Pq}

/** Production ANN entry point (VERDICT round 6 "Next round" #6): builds
  * a k-means IVF index with PQ codes from a parquet corpus and serves
  * query batches — the `Ann.kmeansQuantizer → Pq.train/encode →
  * ivfPqTopK → rerank` composition as ONE tool instead of a
  * spec-internal pipeline.
  *
  * ```
  * runMain graft.tools.AnnIndex build <corpus.parquet> <indexDir> \
  *     [numCells=64] [m=8] [nbits=4]
  * runMain graft.tools.AnnIndex query <indexDir> <corpus.parquet> \
  *     <queries.parquet> <out.parquet> [nprobe=8] [k=10] [pool=100]
  * runMain graft.tools.AnnIndex eval <corpus.parquet> [nQueries=100] \
  *     [numCells=64] [m=8] [nbits=4] [nprobe=8] [k=10] [pool=100]
  * ```
  *
  * `corpus.parquet` needs `(vec_id: long, embedding: array<float>)`.
  * Each subcommand prints one JSON line of timings/params; `eval`
  * additionally builds a throwaway index, runs the query path against
  * the first `nQueries` corpus vectors and reports recall@k against the
  * exact brute-force baseline — the documented wall-time + recall
  * harness behind BASELINE.md's production-ANN table.
  *
  * Index layout (all parquet — no bespoke serialization):
  *   - `cells/`     `(vec_id, cell)` coarse assignment
  *   - `reps/`      `(cell, rep)` k-means centroids (probe ranking)
  *   - `codes/`     `(vec_id, codes)` PQ codes (the compressed corpus)
  *   - `codebooks/` `(s, c, center)` PQ centroids; `m`/`2^nbits`/`subDim`
  *     are recovered from the table shape on load.
  *
  * Scale: the fit side (quantizer + codebooks) trains on a
  * deterministic hash-sample capped at [[FitSampleCap]] rows — a
  * quantizer never needs the full corpus — while assignment/encode are
  * single narrow passes over every row; at 100 TB the only full-corpus
  * artifacts are the `cells` and `codes` tables (8-byte key + a few
  * bytes of codes per row, ~32× smaller than the embeddings), and a
  * query batch touches `nprobe/numCells` of the codes plus `pool`
  * exact rows per query.
  */
object AnnIndex {

  /** Fit-sample cap: k-means/PQ codebooks stabilize long before this
    * many examples; past it the fit cost is pure waste (the standard
    * IVF build trains on ~10-100× numCells samples).
    */
  val FitSampleCap: Long = 100000L

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def jnum(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

  private def loadCorpus(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(col("vec_id"), col("embedding"))

  /** Deterministic fit sample: every `div`-th vector by id hash, sized
    * to land under [[FitSampleCap]] — reproducible across runs, no RNG.
    */
  private def fitSample(corpus: DataFrame, n: Long): DataFrame = {
    val div = math.max(1L, (n + FitSampleCap - 1) / FitSampleCap)
    if (div == 1L) corpus
    else corpus.filter(pmod(xxhash64(col("vec_id")), lit(div)) === 0)
  }

  def build(spark: SparkSession, corpusPath: String, indexDir: String,
      numCells: Int, m: Int, nbits: Int): Map[String, Double] = {
    val corpus = loadCorpus(spark, corpusPath)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = corpus.count()
      val sample = Some(fitSample(corpus, n))
      val ((cells, reps), fitCellsSec) =
        timed(Ann.kmeansQuantizer(corpus, numCells, fitSample = sample))
      val (cb, fitPqSec) = timed(Pq.train(corpus, m, nbits, fitSample = sample))
      val (_, writeSec) = timed {
        cells.select(col("vec_id"), col("cell"))
          .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/cells")
        reps.write.mode(SaveMode.Overwrite).parquet(s"$indexDir/reps")
        Pq.encode(corpus, cb)
          .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/codes")
        val spark2 = spark
        import spark2.implicits._
        cb.centers.zipWithIndex.flatMap { case (cs, s) =>
          cs.zipWithIndex.map { case (ctr, c) => (s, c, ctr) }
        }.toSeq.toDF("s", "c", "center")
          .coalesce(1).write.mode(SaveMode.Overwrite)
          .parquet(s"$indexDir/codebooks")
      }
      Map("n" -> n.toDouble, "fit_cells_sec" -> fitCellsSec,
        "fit_pq_sec" -> fitPqSec, "encode_write_sec" -> writeSec)
    } finally corpus.unpersist()
  }

  def loadCodebooks(spark: SparkSession, indexDir: String): Pq.Codebooks = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$indexDir/codebooks")
      .select(col("s"), col("c"), col("center"))
      .as[(Int, Int, Array[Float])].collect()
    require(rows.nonEmpty, s"no codebooks under $indexDir")
    val m = rows.iterator.map(_._1).max + 1
    val k = rows.iterator.map(_._2).max + 1
    val subDim = rows.head._3.length
    val centers = Array.ofDim[Array[Float]](m, k)
    rows.foreach { case (s, c, ctr) => centers(s)(c) = ctr }
    Pq.Codebooks(m, k, subDim, centers)
  }

  def query(spark: SparkSession, indexDir: String, corpusPath: String,
      queries: DataFrame, nprobe: Int, k: Int, pool: Int): DataFrame = {
    val cb = loadCodebooks(spark, indexDir)
    val codes = spark.read.parquet(s"$indexDir/codes")
    val cells = spark.read.parquet(s"$indexDir/cells")
    val reps = spark.read.parquet(s"$indexDir/reps")
    val candidates = Pq.ivfPqTopK(queries, codes, cells, reps, cb, nprobe, pool)
    Pq.rerank(candidates, queries, loadCorpus(spark, corpusPath), k)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.Hgn.session("graft-annindex",
      Map("spark.ui.enabled" -> "false"))
    spark.sparkContext.setLogLevel("WARN")
    def arg(i: Int, default: => String): String =
      if (args.length > i) args(i) else default

    args.headOption match {
      case Some("build") =>
        val Seq(corpusPath, indexDir) = args.slice(1, 3).toSeq
        val stats = build(spark, corpusPath, indexDir,
          numCells = arg(3, "64").toInt, m = arg(4, "8").toInt,
          nbits = arg(5, "4").toInt)
        println(stats.map { case (k, v) => s""""$k":${jnum(v)}""" }
          .mkString("""{"tool":"annindex","cmd":"build",""", ",", "}"))

      case Some("query") =>
        val Seq(indexDir, corpusPath, queriesPath, outPath) =
          args.slice(1, 5).toSeq
        val queries = loadCorpus(spark, queriesPath)
        val (_, sec) = timed {
          query(spark, indexDir, corpusPath, queries,
            nprobe = arg(5, "8").toInt, k = arg(6, "10").toInt,
            pool = arg(7, "100").toInt)
            .write.mode(SaveMode.Overwrite).parquet(outPath)
        }
        println(s"""{"tool":"annindex","cmd":"query","sec":${jnum(sec)}}""")

      case Some("eval") =>
        val corpusPath = args(1)
        val nQueries = arg(2, "100").toInt
        val numCells = arg(3, "64").toInt
        val m = arg(4, "8").toInt
        val nbits = arg(5, "4").toInt
        val nprobe = arg(6, "8").toInt
        val k = arg(7, "10").toInt
        val pool = arg(8, "100").toInt
        val indexDir = java.nio.file.Files
          .createTempDirectory("annindex-eval").toString
        val (stats, buildSec) =
          timed(build(spark, corpusPath, indexDir, numCells, m, nbits))
        val corpus = loadCorpus(spark, corpusPath)
        val queries = corpus.filter(col("vec_id") < nQueries)
        val (got, querySec) = timed {
          val df = query(spark, indexDir, corpusPath, queries, nprobe, k, pool)
            .select("query_id", "neighbor_id")
          df.cache(); df.count(); df
        }
        // Recall@k against the exact brute-force baseline on the same
        // query batch — the honest yardstick (data-bounded: these
        // synthetic embeddings are near-random unit vectors).
        val brute = Ann.bruteForceTopK(queries, corpus, k)
          .select("query_id", "neighbor_id").cache()
        val nBrute = brute.count().toDouble
        val hit = got.join(brute, Seq("query_id", "neighbor_id")).count()
        val recall = hit / nBrute
        println(s"""{"tool":"annindex","cmd":"eval","n":${jnum(stats("n"))},"n_queries":$nQueries,"num_cells":$numCells,"m":$m,"nbits":$nbits,"nprobe":$nprobe,"k":$k,"pool":$pool,"build_sec":${jnum(buildSec)},"query_sec":${jnum(querySec)},"recall":${jnum(recall)}}""")

      case other =>
        System.err.println(s"usage: AnnIndex build|query|eval ... (got $other)")
        sys.exit(2)
    }
    spark.stop()
  }
}
