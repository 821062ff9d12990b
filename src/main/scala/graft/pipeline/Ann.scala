package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two operators:
  *   - [[bruteForceTopK]]: exact cosine top-k of a (small) query set
  *     against the corpus — the correctness baseline. The query side is
  *     broadcast; the corpus is scanned once, fully parallel; the only
  *     shuffle is the final per-query top-k.
  *   - [[ivfTopK]]: inverted-file variant — both sides are bucketed by a
  *     coarse partition key and the join runs per-bucket (probe=1), the
  *     standard ANN scale path: at 100 TB the cross product never forms,
  *     and each bucket's work is an independent partition.
  *
  * Determinism across engines: cosine is computed on fixed-point
  * quantized components (floor(x*1000) as int64), so the dot/norm sums are
  * exact integers — immune to float summation order — and the final
  * double division + sqrt is a single identical IEEE op in Spark and
  * DuckDB. Ranking ties are broken by neighbor id. No UDFs — the inner
  * product is `zip_with` + `aggregate`, inside codegen.
  */
object Ann {

  /** Fixed-point quantized copy of a float-array column: floor(x*1000). */
  private def quantized(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  private def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Cosine over the quantized components, as double. */
  def cosine(a: Column, b: Column): Column = {
    val qa = quantized(a)
    val qb = quantized(b)
    qdot(qa, qb).cast("double") /
      sqrt(qdot(qa, qa).cast("double") * qdot(qb, qb).cast("double"))
  }

  /** Micro-cosine: floor(cos * 1e6) — the integer rank key the oracle can
    * reproduce bit-for-bit. Computed by the native single-pass
    * [[graft.functions.MicroCosine]] expression (bit-equal to
    * `floor(cosine(a,b)*1e6)` — differential-tested in VectorOpsSpec);
    * the zip_with/aggregate composite is kept as [[cosine]] for
    * reference and custom callers.
    */
  def microCosine(a: Column, b: Column): Column =
    graft.functions.MicroCosine(a, b)

  private def topK(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_micro").desc, col("neighbor_id"))
    pairs.select(col("query_id"), col("neighbor_id"), col("sim_micro"),
        row_number().over(w).cast("long").as("rank"))
      .filter(col("rank") <= k)
  }

  /** Exact cosine top-`k` for each query vector against the whole corpus
    * (self excluded). `queries`/`corpus`: `(vec_id, embedding)`.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val pairs = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        microCosine(col("qv"), col("cv")).as("sim_micro"))
    topK(pairs, k)
  }

  /** IVF-style top-`k`: only corpus vectors in the same coarse cell as the
    * query are scanned (probe=1). `cellCol` is the coarse quantizer's cell
    * id — a precomputed cluster/label column here; in a full IVF build it
    * would come from a k-means coarse quantizer, which changes the cell
    * assignment but not this operator's shape.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, cellCol: String, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      col(cellCol).as("cell"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      col(cellCol).as("cell"))
    val pairs = q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        microCosine(col("qv"), col("cv")).as("sim_micro"))
    topK(pairs, k)
  }

  /** Probed IVF top-`k`: each query scans its `nprobe` nearest cells —
    * the standard IVF recall lever over [[ivfTopK]]'s probe=1 (cell-
    * boundary neighbors are only reachable with nprobe > 1). Cell
    * proximity is micro-cosine to a DETERMINISTIC per-cell representative
    * (the minimum-id member), which keeps the operator oracle-
    * reproducible; swapping in k-means centroids changes the assignment
    * quality, not the operator's shape.
    *
    * Scale: the representative table is one row per cell — broadcast; the
    * query×cells assignment is the standard IVF probe cost (cells ≈
    * √corpus); the corpus is never replicated, each corpus row keeps its
    * single cell, so probing more cells fans out only the (tiny) query
    * side and no dedup is needed before the top-k.
    */
  def ivfTopKProbed(queries: DataFrame, corpus: DataFrame, cellCol: String,
      nprobe: Int, k: Int): DataFrame =
    ivfTopKProbedReps(queries, corpus, cellCol, minIdReps(corpus, cellCol),
      nprobe, k)

  /** Deterministic per-cell representative table: the minimum-`vec_id`
    * member's embedding, as `(cell, rep)` — the oracle-reproducible
    * stand-in for k-means centroids, shared by the probed-IVF and
    * composed IVF-PQ gates.
    */
  def minIdReps(corpus: DataFrame, cellCol: String): DataFrame =
    corpus.select(col(cellCol).as("cell"), col("embedding").as("rep"),
        row_number().over(
          Window.partitionBy(col(cellCol)).orderBy(col("vec_id"))).as("rn"))
      .filter(col("rn") === 1).drop("rn")

  /** [[ivfTopKProbed]] with a caller-supplied per-cell representative
    * table `reps`: `(cell, rep: array<float>)` — the hook the k-means
    * quantizer path plugs its centroids into. Shape is identical: reps
    * broadcast, query side fans out ≤ nprobe×, corpus never replicated.
    */
  def ivfTopKProbedReps(queries: DataFrame, corpus: DataFrame, cellCol: String,
      reps: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"), col(cellCol).as("cell"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("cell_sim").desc, col("cell"))
    val probed = q.crossJoin(broadcast(reps.select(col("cell"), col("rep"))))
      .select(col("query_id"), col("qv"), col("cell"),
        microCosine(col("qv"), col("rep")).as("cell_sim"))
      .select(col("query_id"), col("qv"), col("cell"),
        row_number().over(probeW).as("prb"))
      .filter(col("prb") <= nprobe)
      .drop("prb")
    val pairs = probed.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        microCosine(col("qv"), col("cv")).as("sim_micro"))
    topK(pairs, k)
  }

  /** Production IVF cell assignment: a k-means coarse quantizer
    * (spark.ml KMeans over the embedding column). Returns the corpus
    * with an added `cell` column (nearest centroid) and the centroid
    * table `(cell, rep: array<float>)` shaped for
    * [[ivfTopKProbedReps]] — swap this pair in for the deterministic
    * min-id-representative variant (which stays the ORACLE query: a
    * trained quantizer's assignment is partitioning-dependent, so it is
    * measured by the recall harness, not hash-gated).
    *
    * Scale: the fit runs on `fitSample` (a quantizer does not need the
    * full corpus — the standard IVF build trains on a small sample and
    * assigns everything); when no sample is given the corpus is capped
    * at [[Pq.MaxFitRows]] via the same deterministic hash-ordered top-k
    * (one TakeOrdered pass instead of a full-corpus KMeans — VERDICT
    * round 9 #7). Assignment is one narrow map over the corpus, and the
    * centroid table is `numCells` rows — broadcast material.
    */
  def kmeansQuantizer(corpus: DataFrame, numCells: Int, seed: Long = 42L,
      fitSample: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // L2-normalize before fit AND assignment: KMeans minimizes Euclidean
    // distance, the search metric is cosine — on unit vectors the two
    // orders agree (spherical k-means approximation), so cells follow
    // angular structure instead of vector magnitude.
    def featurized(df: DataFrame) = {
      val norm = sqrt(aggregate(col("embedding"),
        lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double")))
      // coalesce: an all-zero embedding (norm 0) normalizes to the zero
      // vector instead of null components (array_to_vector NPEs on
      // nulls) — the row still gets assigned to SOME cell.
      df.withColumn("__features", array_to_vector(
        transform(col("embedding"),
          x => coalesce(x.cast("double") / nullif(norm, lit(0.0d)), lit(0.0d))
            .cast("float"))))
    }
    val model = new KMeans()
      .setK(numCells).setSeed(seed)
      .setFeaturesCol("__features").setPredictionCol("__cell")
      .fit(featurized(fitSample.getOrElse(Pq.capFitRows(corpus))))
    val assigned = model.transform(featurized(corpus))
      .withColumn("cell", col("__cell").cast("int"))
      .drop("__features", "__cell")
    val spark = corpus.sparkSession
    import spark.implicits._
    val reps = model.clusterCenters.zipWithIndex
      .map { case (ctr, i) => (i, ctr.toArray.map(_.toFloat)) }
      .toSeq.toDF("cell", "rep")
    (assigned, reps)
  }

  /** Random-hyperplane LSH: `tables` independent hash tables of `planes`
    * sign bits each; a pair is an ANN candidate if it collides in ANY
    * table (the standard L-tables trade-off: per-table precision from k
    * planes, recall from L tables). Plane coefficients are deterministic
    * pseudo-random integers in [-1000, 1000] from a linear-congruential
    * formula over (table, plane, dim) — pure integer arithmetic that the
    * DuckDB oracle evaluates inline, and exact against the quantized
    * vectors, so bucketing is bit-identical across engines.
    *
    * Returns an array of `tables` bucket ids; explode + equi-join on
    * (table index, bucket) for candidate generation — the scale path that
    * replaces the all-pairs cross product.
    */
  def lshBuckets(v: Column, dim: Int, planes: Int, tables: Int): Column =
    graft.functions.LshBuckets(v, dim, planes, tables)

  /** DuckDB fragment for [[lshBuckets]]'s bucket of table `t` (`t` may be
    * a SQL variable, e.g. a range lambda binding).
    */
  def sqlLshBucket(v: String, dim: Int, planes: Int, t: String): String =
    s"""CAST(list_sum(list_transform(range(0, $planes), p ->
       |  CASE WHEN list_sum(list_transform(range(1, ${dim + 1}), i ->
       |      CAST(floor(CAST($v[CAST(i AS INT)] AS DOUBLE) * 1000) AS BIGINT) *
       |      ((1103515245 * ((($t * $planes + p) * $dim) + (i - 1)) + 12345) % 2001 - 1000))) >= 0
       |    THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END)) AS BIGINT)""".stripMargin

  /** Near-duplicate vector pairs: LSH-bucket candidates (any-table
    * collision), verified by exact fixed-point cosine ≥ `minMicroCos`
    * (micro-cosine units). Output `(id_a, id_b, sim_micro)`, id_a < id_b.
    */
  def embeddingDedup(corpus: DataFrame, dim: Int, planes: Int, tables: Int,
      minMicroCos: Long): DataFrame = {
    val withBuckets = corpus.select(col("vec_id"),
        posexplode(lshBuckets(col("embedding"), dim, planes, tables))
          .as(Seq("tbl", "bucket")))
    val candidates = withBuckets.as("a")
      .join(withBuckets.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .dropDuplicates()
    val ea = corpus.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val eb = corpus.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    candidates.join(ea, Seq("id_a")).join(eb, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        microCosine(col("va"), col("vb")).as("sim_micro"))
      .filter(col("sim_micro") >= minMicroCos)
  }

  /** Semantic dedup (SemDeDup shape, arXiv:2303.09540): cluster the
    * corpus with a coarse quantizer, then drop every vector that has a
    * LOWER-id clustermate with cosine ≥ `minMicroCos` — near-duplicate
    * *meanings*, which text-level shingle dedup cannot see. The greedy
    * keep-lowest-id rule (drop b iff ∃ a < b in the cluster with
    * sim ≥ τ, independent of a's own fate) is deterministic and
    * join-expressible, so the whole operator is one broadcast assignment
    * plus one cluster-keyed self-join.
    *
    * `reps` is the quantizer's representative table `(cluster, rep:
    * array<float>)` — the oracle query feeds the deterministic
    * min-vec_id pivots, production feeds [[kmeansQuantizer]] centroids
    * (identical shape, same swap contract as [[ivfTopKProbedReps]]).
    *
    * Scale: reps is numClusters rows — broadcast; assignment is a narrow
    * map; the only shuffle is the cluster-keyed self-join, whose
    * per-cluster quadratic is exactly the bounded within-cluster scan
    * SemDeDup prescribes (clusters ≈ √corpus keeps each bucket small;
    * skewed clusters are AQE skew-join territory).
    *
    * Output: `(vec_id, cluster, kept)` — one row per corpus vector.
    */
  def semDedup(corpus: DataFrame, reps: DataFrame,
      minMicroCos: Long): DataFrame = {
    val asgW = Window.partitionBy(col("vec_id"))
      .orderBy(col("psim").desc, col("cluster"))
    val asg = corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(reps.select(col("cluster"), col("rep"))))
      .select(col("vec_id"), col("embedding"), col("cluster"),
        microCosine(col("embedding"), col("rep")).as("psim"))
      .select(col("vec_id"), col("embedding"), col("cluster"),
        row_number().over(asgW).as("rn"))
      .filter(col("rn") === 1).drop("rn")
    val a = asg.select(col("cluster"), col("vec_id").as("id_a"),
      col("embedding").as("va"))
    val b = asg.select(col("cluster"), col("vec_id").as("id_b"),
      col("embedding").as("vb"))
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(microCosine(col("va"), col("vb")) >= minMicroCos)
      .select(col("id_b").as("vec_id")).dropDuplicates()
    asg.select(col("vec_id"), col("cluster"))
      .join(dropped.withColumn("dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("dup").isNull.as("kept"))
  }

  /** Deterministic pivot representatives for [[semDedup]]'s oracle mode:
    * the `numPivots` lowest-id vectors, as `(cluster, rep)` with
    * cluster = vec_id. DuckDB replays this table exactly; production
    * swaps in [[kmeansQuantizer]] output.
    */
  def lowIdPivots(corpus: DataFrame, numPivots: Int): DataFrame =
    corpus.filter(col("vec_id") < numPivots)
      .select(col("vec_id").as("cluster"), col("embedding").as("rep"))

  /** Corpus-size-SCALED deterministic pivots (VERDICT round 10 #4 — a
    * fixed pivot count makes [[semDedup]]'s within-cluster pair join
    * quadratic in corpus size, the one super-linear scaler in SCALE.md):
    * `k = max(minPivots, floor(sqrt(N)))`. √N is the balance point —
    * assignment costs `N·k`, the pair join `N·(N/k)`, so both sit at
    * `N^1.5` (the standard SemDeDup within-cluster-quadratic compromise;
    * either extreme pushes one side to N²). The count rides a 1-row
    * broadcast cross join — no driver action. Cross-engine exactness:
    * IEEE-754 `sqrt` is correctly rounded and `floor` is exact, so
    * Spark and DuckDB compute the identical k from the identical N
    * (even where `floor∘sqrt` deviates from ideal isqrt near perfect
    * squares, it deviates IDENTICALLY). Production still swaps in
    * [[kmeansQuantizer]] centroids; this scales the ORACLE path.
    */
  def scaledLowIdPivots(corpus: DataFrame, minPivots: Long = 8L): DataFrame = {
    require(minPivots >= 1, s"minPivots must be >= 1, got $minPivots")
    val kDf = corpus.agg(
      expr(s"greatest(${minPivots}L, CAST(floor(sqrt(count(1))) AS LONG))")
        .as("k"))
    corpus.crossJoin(broadcast(kDf))
      .filter(col("vec_id") < col("k"))
      .select(col("vec_id").as("cluster"), col("embedding").as("rep"))
  }
}
