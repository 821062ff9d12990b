package graft.queries

import graft.{QueryDef, Tables}
import graft.pipeline._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked LLM-data-pipeline operator family over the `documents`
  * and `embeddings` test tables: text analysis, exact/near dedup
  * (inverted-index Jaccard, MinHash-LSH, SimHash), similarity search
  * (brute-force + IVF), and the multimodal decode plumbing.
  *
  * Every query is deterministic end to end — hashes are the cross-engine
  * md5-derived [[Hashing.h60]], cosine is fixed-point quantized — so the
  * DuckDB oracle replays the identical algorithm and the driver's
  * hash-compare must match exactly, LSH probabilities notwithstanding.
  */
object PipelineQueries {

  private[queries] val SHINGLE_N = 3
  private val JACCARD_T = 0.3

  /** p46 stop-shingle cap: shingles in more than this many docs never
    * generate candidates. 5 bites at every test SF (max df is 7 at
    * sf0.01, 25 at sf0.1) so the capped selection is actually exercised,
    * not vacuously equal to uncapped.
    */
  private val CAP_DF = 5L

  /** p48 containment constants: excerpt length (tokens), minimum doc
    * tokens before an excerpt is planted (so excerpt ≠ whole doc and
    * Jaccard stays visibly below the containment), and the directional
    * threshold.
    */
  private val CONT_EXCERPT = 8
  private val CONT_MIN_TOKS = 12
  private val CONT_T = 0.9
  private val DUP_T = 0.8
  private val STRAT_K = 25
  private[queries] val MH_BANDS = 24
  private[queries] val MH_ROWS = 2
  private[queries] val MH_T = 0.5
  private val SH_BITS = 48
  private val SH_BANDS = 4
  private val SH_MAXHAM = 12
  private val ANN_K = 10
  private val ANN_NQ = 10
  private val IVF_K = 5
  private val NPROBE = 2
  private val PACK_BUDGET = 512L

  /** Multimodal constants for the planted BMP corpus (dims 2..9 a
    * side, see [[Multimodal.bmpDims]]): resize bound 4 so both the
    * no-op and the downscale branch occur, frame stride 2 so sampled
    * counts vary, and a 2×2 region lattice (12-component embedding).
    */
  private val BMP_MAXDIM = 4
  private val MM_STRIDE = 2
  private val MM_GRID = 2

  /** The planted edit-distance corpus (Spark side), shared by p44/p50:
    * every doc's first-[[ED_TITLE_TOKS]]-token "title" (id doubled)
    * plus, for doc_id ≡ 0 (mod 3) with a nonempty title, a one-char
    * deletion at a hash-derived position (id·2+1) — a guaranteed
    * dist-1 neighbor per planted pair.
    */
  private def edPlanted(s: SparkSession, dir: String): DataFrame = {
    val titles = t(s, dir, "documents").select(col("doc_id"),
      array_join(slice(TextAnalysis.tokens(col("text")), 1, ED_TITLE_TOKS), " ")
        .as("name"))
    val base = titles.select((col("doc_id") * 2).as("id"), col("name"))
    // length(name) > 0 mirrors the oracle's pert0 filter: an empty
    // title would make DuckDB abort on `% length(name)` (modulo by
    // zero) while Spark's pmod yields NULL — engine divergence on
    // degenerate input, so neither side perturbs empty titles.
    val pert = titles.filter(col("doc_id") % 3 === 0 && length(col("name")) > 0)
      .withColumn("pos",
        (pmod(Hashing.h60(col("name")), length(col("name")).cast("long")) + 1L)
          .cast("int"))
      .select((col("doc_id") * 2 + 1).as("id"),
        expr("concat(substring(name, 1, pos - 1), " +
          "substring(name, pos + 1, 100000))").as("name"))
    base.unionByName(pert)
  }

  /** Oracle CTEs replaying [[edPlanted]]: yields `rel(id, name)`. */
  private def sqlEdPlantedCtes: String =
    s"""titles AS (
       |  SELECT doc_id,
       |    array_to_string(list_slice(string_split(lower(text), ' '),
       |      1, $ED_TITLE_TOKS), ' ') AS name
       |  FROM documents
       |), base AS (
       |  SELECT doc_id * 2 AS id, name FROM titles
       |), pert0 AS (
       |  SELECT doc_id, name,
       |    CAST(${Hashing.sqlH60("name")} % length(name) AS INTEGER) + 1 AS pos
       |  FROM titles WHERE doc_id % 3 = 0 AND length(name) > 0
       |), pert AS (
       |  SELECT doc_id * 2 + 1 AS id,
       |    substr(name, 1, pos - 1) || substr(name, pos + 1, 100000) AS name
       |  FROM pert0
       |), rel AS (
       |  SELECT id, name FROM base UNION ALL SELECT id, name FROM pert
       |)""".stripMargin

  /** The planted containment corpus (Spark side), shared by p48/p49:
    * every doc (id doubled) plus, for doc_id ≡ 0 (mod 4) with ≥
    * [[CONT_MIN_TOKS]] tokens, its first-[[CONT_EXCERPT]]-token excerpt
    * as a "quote" doc at id·2+1 — containment 1.0 by construction,
    * Jaccard ≤ 6/n_sh, so the asymmetric detector is genuinely
    * exercised (the natural corpus has no such pairs; measured).
    */
  private def contPlanted(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val base = docs.select((col("doc_id") * 2).as("doc_id"), col("text"))
    val toks = TextAnalysis.tokens(col("text"))
    val exc = docs
      .filter(col("doc_id") % 4 === 0 && size(toks) >= CONT_MIN_TOKS)
      .select((col("doc_id") * 2 + 1).as("doc_id"),
        array_join(slice(toks, 1, CONT_EXCERPT), " ").as("text"))
    base.unionByName(exc)
  }

  /** Oracle CTEs replaying [[contPlanted]] + hashed shingle sets:
    * yields `h(id, hs, n)` and `post(id, s)`; callers append their
    * candidate/intersection CTEs producing `inter(id_a, id_b, c)`.
    */
  private def sqlContPlantedCtes: String =
    s"""base AS (
       |  SELECT doc_id * 2 AS id, text FROM documents
       |), exc AS (
       |  SELECT doc_id * 2 + 1 AS id,
       |    array_to_string(list_slice(string_split(lower(text), ' '),
       |      1, $CONT_EXCERPT), ' ') AS text
       |  FROM documents
       |  WHERE doc_id % 4 = 0
       |    AND len(string_split(lower(text), ' ')) >= $CONT_MIN_TOKS
       |), rel AS (
       |  SELECT id, text FROM base UNION ALL SELECT id, text FROM exc
       |), rtoks AS (
       |  SELECT id, string_split(lower(text), ' ') AS tokens FROM rel
       |), rsh AS (
       |  SELECT id, ${Shingles.sqlWordShingles("tokens", SHINGLE_N)} AS shingles
       |  FROM rtoks
       |), h AS (
       |  SELECT id, list_transform(shingles, s -> ${Hashing.sqlH60("s")}) AS hs,
       |    CAST(len(shingles) AS BIGINT) AS n FROM rsh
       |), post AS (SELECT id, unnest(hs) AS s FROM h)""".stripMargin

  /** Shared p48/p49 final projection over `inter(id_a, id_b, c)`. */
  private def sqlContSelect: String =
    s"""SELECT id_a, id_b,
       |  c / CAST(ha.n AS DOUBLE) AS cont_a_in_b,
       |  c / CAST(hb.n AS DOUBLE) AS cont_b_in_a
       |FROM inter JOIN h ha ON ha.id = id_a JOIN h hb ON hb.id = id_b
       |WHERE greatest(c / CAST(ha.n AS DOUBLE), c / CAST(hb.n AS DOUBLE))
       |  >= $CONT_T""".stripMargin

  /** Shared oracle CTE replaying the planted-BMP formula: per-doc hash
    * `h`, dims `w`×`hh` ([[Multimodal.bmpDims]]). Appended after a
    * `WITH `; callers add their own pixel CTEs on top.
    */
  private def sqlBmpDims: String =
    s"""d AS (
       |  SELECT doc_id, ${Hashing.sqlH60("CAST(doc_id AS VARCHAR)")} AS h
       |  FROM documents
       |), dims AS (
       |  SELECT doc_id, h, 2 + h % 8 AS w, 2 + (h // 8) % 8 AS hh FROM d
       |)""".stripMargin
  private val PQ_M = 8
  private val PQ_NBITS = 4
  private val PQ_SUBDIM = 8 // 64 / PQ_M
  private val PQ_RERANK_POOL = 50
  private val SEG_W = 8
  private val SEG_MIN_DOCS = 2L
  private val LM_MIN_COUNT = 2L
  private val TFIDF_K = 5
  private[queries] val BOTTOMK = 10
  private val QS_K = 64
  private val QS_PROBS = Seq(1000, 2500, 5000, 7500, 9000, 9900)
  // Corpus-size-scaled pivot rule (k = max(SEM_MIN_PIVOTS, ⌊√N⌋)):
  // cluster population tracks √N, so p34's assignment (N·k) and
  // within-cluster pair join (N²/k) BOTH sit at N^1.5 instead of the
  // fixed-k quadratic that made p34 the one super-linear 30x row in
  // SCALE.md before round 11. floor∘sqrt is bit-identical across
  // engines (IEEE correctly-rounded sqrt + exact floor).
  private val SEM_MIN_PIVOTS = 8L
  private val SEM_T = 400000L
  private val DSIR_BUCKETS = 1024
  private val DSIR_TARGET = Seq("src0", "src1", "src2")
  private val BLOOM_WORDS = 1024
  private val BLOOM_PROBES = 3
  private val BLOOM_M = BLOOM_WORDS.toLong * 63L
  private val DUPNG_MIN = 2L

  /** p51 duplicate-span window: 8 words is the classic "long enough to
    * not fire on idiom, short enough to catch real copying" exact-
    * substring unit; spans merge when gram starts are <= SPAN_L apart.
    */
  private val SPAN_L = 8
  private val SPAN_MIN_DOCS = 2L
  private[queries] val CM_DEPTH = 4
  private[queries] val CM_WIDTH = 2048
  private[queries] val CM_TOPK = 20
  private[queries] val WS_K = 15
  private val CHUNK_LEN = 32
  private val CHUNK_STRIDE = 16
  // BPE tokenizer family (p63/p65/p66): R merge rounds; token-grain
  // packing/chunking budgets are TOKEN-denominated (a word is >=1
  // subword tokens, so budgets sit above their word-grain cousins).
  private val BPE_MERGES = 16
  private val BPE_PACK_BUDGET = 1024L
  private val BPE_CHUNK_BUDGET = 64L
  private val BIGRAM_MIN = 2L
  /** p69 token-span window: ~the token cost of SPAN_L words under the
    * R=16 toy vocabulary (a word is >= 1 subword tokens), so the token-
    * grain detector fires on the same planted copying p51 sees.
    */
  private val TOK_SPAN_L = 12
  private val ED_MAX = 2
  // q is THE candidate-volume lever on low-entropy corpora: candidate
  // pairs scale as Σ_rare-grams df², and this synthetic corpus's word
  // vocabulary is fixed, so 5-grams inside shared word stems go hot as
  // the corpus grows (measured 7.2M candidate occurrences at 10x data
  // with q=5 vs 0.8M with q=7 — identical verified pairs at both).
  // Real corpora grow gram vocabulary with size (Heaps' law), which is
  // what keeps Ed-Join linear in production; q=7 restores that regime
  // here without changing results.
  private val ED_Q = 7
  private val ED_TITLE_TOKS = 8
  private val BM25_K = 10
  private val BM25_QUERIES = Seq(
    (0L, "join hash row"), (1L, "scan filter merge batch"),
    (2L, "customer query table"), (3L, "stream window order data"))

  /** DuckDB fragment: deterministic-codebook center component (s, c, i)
    * — must mirror [[Pq.deterministicCodebooks]] exactly.
    */
  private def pqCtr(s: String, c: String, i: String): String =
    s"((1103515245 * ((($s * ${1 << PQ_NBITS} + $c) * $PQ_SUBDIM) + $i) + 12345) % 2001 - 1000)"

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Session-cached exact-Jaccard pair table at JACCARD_T (the LOWER of
    * the two catalog thresholds). Prefix-filter candidates are COMPLETE,
    * so the table holds every pair with jaccard ≥ JACCARD_T and a
    * `filter(jaccard >= t)` of it is exactly `jaccardPairsPrefix(docs, n,
    * t)` for any t ≥ JACCARD_T — p14 derives its DUP_T pairs from it
    * instead of re-running shingling + the candidate join (VERDICT round
    * 3, "Next round" #1: p14 was ~30% of the whole driver bench). p04
    * itself still computes fresh — it MEASURES the pair operator, same
    * policy as g05.
    */
  private def pairsCached(s: SparkSession, dir: String): DataFrame =
    SessionCache(s, dir, s"jaccard_pairs_prefix@$JACCARD_T") {
      Dedup.jaccardPairsPrefix(t(s, dir, "documents"), SHINGLE_N, JACCARD_T)
    }

  /** Session-cached trained BPE merge table (round 16 — the g16/p14
    * attribution policy): p63 MEASURES training and always trains
    * fresh; the four derived token-grain queries (p65 packing, p66
    * chunking, p67 encode, p69 token spans) measure their OWN
    * operators over the trained table, which a real pipeline trains
    * once — so they share one session-cached table instead of each
    * re-running the 16-round loop. Cached as the mergesDF relation
    * (SessionCache holds DataFrames); the collect is merge-count-
    * bounded (= BPE_MERGES rows).
    */
  private def bpeMergesCached(s: SparkSession, dir: String): Seq[Bpe.Merge] =
    SessionCache(s, dir, s"bpe_merges@$BPE_MERGES") {
      Bpe.mergesDF(s, Bpe.train(t(s, dir, "documents"), BPE_MERGES))
    }.orderBy("rank").collect()
      .map(r => Bpe.Merge(r.getLong(0).toInt, r.getString(1), r.getString(2),
        r.getLong(4)))
      .toSeq

  /** Session-cached token-id encode relation (same policy): p67
    * MEASURES the encode operator and computes it fresh; p69 measures
    * the token-SPAN operators over an encoded corpus a real exporter
    * materializes once, so it reads the cached relation.
    */
  private def bpeEncodedCached(s: SparkSession, dir: String): DataFrame =
    SessionCache(s, dir, s"bpe_enc@$BPE_MERGES") {
      Bpe.encode(t(s, dir, "documents"), bpeMergesCached(s, dir))
    }

  // ---------------------------------------------------------------- SQL bits

  private val STOPLIST =
    TextAnalysis.EnglishStopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** tokens / shingles / hashed shingles per doc, shared prelude. */
  private val DOCS = s"""
    |toks AS (
    |  SELECT doc_id, text, string_split(lower(text), ' ') AS tokens FROM documents
    |),
    |sh AS (
    |  SELECT doc_id, ${Shingles.sqlWordShingles("tokens", SHINGLE_N)} AS shingles
    |  FROM toks
    |),
    |hsh AS (
    |  SELECT doc_id,
    |    shingles,
    |    len(shingles) AS n_sh,
    |    list_transform(shingles, s -> ${Hashing.sqlH60("s")} % ${Hashing.M}) AS hs
    |  FROM sh
    |)""".stripMargin

  private def sqlJaccard(interExpr: String, naExpr: String, nbExpr: String): String =
    s"$interExpr / CAST($naExpr + $nbExpr - $interExpr AS DOUBLE)"

  /** Dup-group resolution as DuckDB CTEs (exact-Jaccard pairs at DUP_T
    * → recursive-CTE connected components → min-id canonical member),
    * ending in `grp(doc_id, canonical_id)` — shared by p14 (the group
    * operator itself) and p45 (the group-aware split built on it).
    * Callers prepend `WITH RECURSIVE `.
    */
  private def sqlGroupCtes: String =
    s"""$DOCS,
       |post AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
       |  FROM post a JOIN post b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |),
       |pairs AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT id_a, id_b,
       |      ${sqlJaccard("common", "sa.n_sh", "sb.n_sh")} AS j
       |    FROM inter
       |    JOIN hsh sa ON sa.doc_id = id_a
       |    JOIN hsh sb ON sb.doc_id = id_b
       |  ) WHERE j >= $DUP_T
       |),
       |sym AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs
       |),
       |reach AS (
       |  SELECT DISTINCT src AS id, src AS r FROM sym
       |  UNION
       |  SELECT s.dst AS id, r.r FROM reach r JOIN sym s ON s.src = r.id
       |),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
       |grp AS (
       |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS canonical_id
       |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
       |)""".stripMargin

  /** Fixed-point micro-cosine between two FLOAT[] exprs (dim 64). */
  private def sqlMicroCos(a: String, b: String): String = {
    def qe(v: String) =
      s"CAST(floor(CAST($v[CAST(i AS INT)] AS DOUBLE) * 1000) AS BIGINT)"
    def qv(v: String) = s"list_transform(range(1, 65), i -> ${qe(v)})"
    s"""CAST(floor(
       |  CAST(list_sum(list_transform(range(1, 65), i ->
       |    ${qe(a)} * ${qe(b)})) AS DOUBLE) /
       |  sqrt(
       |    CAST(list_sum(list_transform(${qv(a)}, x -> x * x)) AS DOUBLE) *
       |    CAST(list_sum(list_transform(${qv(b)}, x -> x * x)) AS DOUBLE))
       |  * 1000000) AS BIGINT)""".stripMargin
  }

  /** p54 incremental-dedup split: batch = docs with doc_id ≡ INC_REM
    * (mod INC_MOD), corpus = the rest — a deterministic ~1/7th delta
    * both engines carve identically.
    */
  private[queries] val INC_MOD = 7L
  private[queries] val INC_REM = 3L

  /** p55 shard count — small enough that every shard is populated at
    * sf0.001, large enough that the partition-by-shard window matters.
    */
  private val SHUF_SHARDS = 8L

  /** p58 per-source cap — below the 25 docs/source at sf0.001 so the
    * cut actually bites at every test scale.
    */
  private val TOPK_PER_SOURCE = 15

  /** p57 contamination-span gram length — shorter than the p51/p53
    * SPAN_L=8 dedup unit because a benchmark leak is judged against a
    * DIFFERENT corpus (the 5% benchmark slice), and on the synthetic
    * tables only whole-doc duplicates straddle that split at L >= 5
    * (2 docs); L=4 flags 49 docs incl. partial/multi-span leaks, so
    * the oracle actually exercises the island merge.
    */
  private val CONTAM_SPAN_L = 4

  /** Video frame-sampling stride for p62 — 2 against planted frame
    * counts of 2..6, so both the every-other selection and the tail
    * behavior (odd counts sample the last frame, even counts don't)
    * are what the hash compare certifies.
    */
  private val VID_STRIDE = 2

  /** Frame length for the p61 audio frame-feature gate — small enough
    * that every planted clip (8..40 samples) yields multiple frames
    * including a short tail frame, so the windowing edge cases are what
    * the hash compare certifies.
    */
  private val WAV_FRAME_LEN = 8

  /** Shared planted-WAV oracle CTEs (p60/p61): the per-doc geometry and
    * the signed sample relation the Spark side must recover from genuine
    * RIFF/PCM16 bytes. Constants live above `queries` (object-init
    * order: the SQL strings interpolate eagerly).
    */
  private def sqlWavSamplesCtes: String =
    s"""d AS (
       |  SELECT doc_id, ${Hashing.sqlH60("CAST(doc_id AS VARCHAR)")} AS h
       |  FROM documents
       |), geo AS (
       |  SELECT doc_id, h, 8 + h % 33 AS n,
       |    8000 + ((h // 33) % 4) * 4000 AS sr
       |  FROM d
       |), s AS (
       |  SELECT doc_id, n, sr, i.i AS i,
       |    ((h + 97 * i.i) % 2001) - 1000 AS v
       |  FROM geo, UNNEST(range(0, n)) AS i(i)
       |)""".stripMargin

  // ---------------------------------------------------------------- queries

  val queries: Seq[QueryDef] = Seq(

    // ---- token counting + quality + language-ID, one narrow pass.
    QueryDef(
      "p01_text_stats",
      s"""WITH toks AS (
         |  SELECT doc_id, text, string_split(lower(text), ' ') AS tokens FROM documents
         |), stats AS (
         |  SELECT doc_id,
         |    CAST(len(tokens) AS BIGINT) AS n_tokens,
         |    CAST(len(regexp_extract_all(text, '${TextAnalysis.SubwordPattern}')) AS BIGINT) AS n_subwords,
         |    CAST(len(list_filter(tokens, w -> list_contains($STOPLIST, w))) AS BIGINT)
         |      / CAST(len(tokens) AS DOUBLE) AS stop_ratio,
         |    CAST(list_sum(list_transform(tokens, w -> length(w))) AS DOUBLE)
         |      / CAST(len(tokens) AS DOUBLE) AS mean_tok_len
         |  FROM toks
         |)
         |SELECT doc_id, n_tokens, n_subwords, stop_ratio, mean_tok_len,
         |  CASE WHEN stop_ratio >= 0.04 THEN 'en' ELSE 'und' END AS lang_pred,
         |  (n_tokens BETWEEN 5 AND 100000) AND mean_tok_len <= 15.0
         |    AND stop_ratio >= 0.01 AS quality_ok
         |FROM stats""".stripMargin) { (s, dir) =>
      val txt = col("text")
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(txt).as("n_tokens"),
        TextAnalysis.subwordCount(txt).as("n_subwords"),
        TextAnalysis.stopwordRatio(txt).as("stop_ratio"),
        TextAnalysis.meanTokenLen(txt).as("mean_tok_len"),
        TextAnalysis.languageId(txt).as("lang_pred"),
        TextAnalysis.qualityOk(txt).as("quality_ok"))
    },

    // ---- whole-doc + shingle (1-perm MinHash) fingerprints.
    QueryDef(
      "p02_fingerprints",
      s"""WITH $DOCS
         |SELECT h.doc_id,
         |  ${Hashing.sqlH60("lower(t.text)")} AS fp,
         |  CAST(list_min(list_transform(h.shingles, s -> ${Hashing.sqlH60("s")})) AS BIGINT) AS shingle_fp
         |FROM hsh h JOIN toks t ON t.doc_id = h.doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.docFingerprint(col("text")).as("fp"),
        TextAnalysis.shingleFingerprint(col("text"), SHINGLE_N).as("shingle_fp"))
    },

    // ---- exact dedup: deterministic survivor + group size per distinct
    // normalized text (keyed dropDuplicates shape, P5).
    QueryDef(
      "p03_exact_dedup",
      s"""SELECT ${Hashing.sqlH60("lower(text)")} AS text_hash,
         |  MIN(doc_id) AS canonical_id,
         |  COUNT(*) AS group_size
         |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
      Dedup.exact(t(s, dir, "documents"))
    },

    // ---- exact n-gram Jaccard near-dup via inverted-index join (complete
    // because J > 0 implies a shared shingle — never all-pairs).
    QueryDef(
      "p04_jaccard_pairs",
      s"""WITH $DOCS,
         |post AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
         |  FROM post a JOIN post b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT id_a, id_b, j AS jaccard FROM (
         |  SELECT id_a, id_b,
         |    ${sqlJaccard("common", "sa.n_sh", "sb.n_sh")} AS j
         |  FROM inter
         |  JOIN hsh sa ON sa.doc_id = id_a
         |  JOIN hsh sb ON sb.doc_id = id_b
         |) WHERE j >= $JACCARD_T""".stripMargin) { (s, dir) =>
      // Prefix-filtered plan (skew-free candidates, differential-tested
      // equal to the inverted-index plan); the oracle computes the same
      // exact result the simple way.
      Dedup.jaccardPairsPrefix(t(s, dir, "documents"), SHINGLE_N, JACCARD_T)
    },

    // ---- MinHash-LSH near-dup: shingle → minhash sig → band buckets →
    // bucket join → exact-Jaccard verify. The oracle replays the LSH
    // pipeline itself (same hash family), so the compare is exact.
    QueryDef(
      "p05_minhash_pairs", sqlMinhashPairs) { (s, dir) =>
      Dedup.minHashPairs(t(s, dir, "documents"), SHINGLE_N, MH_BANDS, MH_ROWS, MH_T)
    },

    // ---- SimHash signatures (48-bit, majority vote over shingle hashes).
    QueryDef(
      "p06_simhash",
      s"""WITH $DOCS,
         |hw AS (
         |  SELECT doc_id,
         |    list_transform(shingles, w -> ${Hashing.sqlH60("w")}) AS hs
         |  FROM sh
         |)
         |SELECT doc_id,
         |  CAST(list_sum(list_transform(range(0, $SH_BITS), i ->
         |    CASE WHEN list_sum(list_transform(hs, x -> ((x >> i) & 1) * 2 - 1)) > 0
         |         THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS simhash
         |FROM hw""".stripMargin) { (s, dir) =>
      Dedup.simHash(t(s, dir, "documents"), SH_BITS, SHINGLE_N)
        .select(col("id").as("doc_id"), col("simhash"))
    },

    // ---- SimHash near-dup pairs: band buckets (pigeonhole-complete for
    // hamming < bands) + bit_count(xor) verify.
    QueryDef(
      "p07_simhash_pairs",
      s"""WITH $DOCS,
         |hw AS (
         |  SELECT doc_id,
         |    list_transform(shingles, w -> ${Hashing.sqlH60("w")}) AS hs
         |  FROM sh
         |),
         |shh AS (
         |  SELECT doc_id,
         |    CAST(list_sum(list_transform(range(0, $SH_BITS), i ->
         |      CASE WHEN list_sum(list_transform(hs, x -> ((x >> i) & 1) * 2 - 1)) > 0
         |           THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS simhash
         |  FROM hw
         |),
         |banded AS (
         |  SELECT doc_id, simhash, CAST(j AS BIGINT) AS band,
         |    (simhash >> CAST(${SH_BITS / SH_BANDS} * j AS INT)) % ${1L << (SH_BITS / SH_BANDS)} AS key
         |  FROM shh, range(0, $SH_BANDS) t(j)
         |)
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= $SH_MAXHAM""".stripMargin) {
      (s, dir) =>
        Dedup.simHashPairs(t(s, dir, "documents"), SH_BITS, SH_BANDS, SH_MAXHAM,
            SHINGLE_N)
          .select(col("id_a"), col("id_b"), col("hamming"))
    },

    // ---- brute-force cosine top-k (exact ANN baseline), fixed-point
    // deterministic ranking.
    QueryDef(
      "p08_ann_brute",
      s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < $ANN_NQ),
         |pairs AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${sqlMicroCos("q.embedding", "c.embedding")} AS sim_micro
         |  FROM q JOIN embeddings c ON q.vec_id <> c.vec_id
         |)
         |SELECT query_id, neighbor_id, sim_micro, rank FROM (
         |  SELECT query_id, neighbor_id, sim_micro,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim_micro DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM pairs
         |) WHERE rank <= $ANN_K""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Ann.bruteForceTopK(emb.filter(col("vec_id") < ANN_NQ), emb, ANN_K)
    },

    // ---- IVF-style ANN: probe only the query's coarse cell (label).
    QueryDef(
      "p09_ann_ivf",
      s"""WITH pairs AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${sqlMicroCos("q.embedding", "c.embedding")} AS sim_micro
         |  FROM embeddings q JOIN embeddings c
         |    ON q.label = c.label AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id < $ANN_NQ
         |)
         |SELECT query_id, neighbor_id, sim_micro, rank FROM (
         |  SELECT query_id, neighbor_id, sim_micro,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim_micro DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM pairs
         |) WHERE rank <= $IVF_K""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Ann.ivfTopK(emb.filter(col("vec_id") < ANN_NQ), emb, "label", IVF_K)
    },

    // ---- probed IVF: each query scans its NPROBE nearest cells (by
    // micro-cosine to the cell's min-id representative) — the recall
    // lever probe=1 lacks at cell boundaries. Deterministic end to end,
    // so DuckDB reproduces cell choice and ranking bit-for-bit.
    QueryDef(
      "p18_ann_ivf_probed",
      s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < $ANN_NQ),
         |reps AS (
         |  SELECT label, embedding AS rep FROM (
         |    SELECT label, embedding,
         |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
         |    FROM embeddings) WHERE rn = 1
         |),
         |probed AS (
         |  SELECT query_id, label FROM (
         |    SELECT q.vec_id AS query_id, r.label,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${sqlMicroCos("q.embedding", "r.rep")} DESC, r.label) AS prb
         |    FROM q CROSS JOIN reps r) WHERE prb <= $NPROBE
         |),
         |pairs AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${sqlMicroCos("q.embedding", "c.embedding")} AS sim_micro
         |  FROM q JOIN probed p ON p.query_id = q.vec_id
         |  JOIN embeddings c ON c.label = p.label AND c.vec_id <> q.vec_id
         |)
         |SELECT query_id, neighbor_id, sim_micro, rank FROM (
         |  SELECT query_id, neighbor_id, sim_micro,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim_micro DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM pairs
         |) WHERE rank <= $IVF_K""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Ann.ivfTopKProbed(emb.filter(col("vec_id") < ANN_NQ), emb, "label",
        NPROBE, IVF_K)
    },

    // ---- per-source corpus report: the aggregation pass a curation
    // pipeline runs over every shard (counts, distinct content, quality
    // yield, token volume) — one groupBy, map-side combinable.
    QueryDef(
      "p12_corpus_stats",
      s"""WITH toks AS (
         |  SELECT doc_id, source, text, string_split(lower(text), ' ') AS tokens
         |  FROM documents
         |), per_doc AS (
         |  SELECT source,
         |    ${Hashing.sqlH60("lower(text)")} AS text_hash,
         |    CAST(len(tokens) AS BIGINT) AS n_tokens,
         |    CAST(len(list_filter(tokens, w -> list_contains($STOPLIST, w))) AS BIGINT)
         |      / CAST(len(tokens) AS DOUBLE) AS stop_ratio,
         |    CAST(list_sum(list_transform(tokens, w -> length(w))) AS DOUBLE)
         |      / CAST(len(tokens) AS DOUBLE) AS mean_tok_len
         |  FROM toks
         |)
         |SELECT source,
         |  COUNT(*) AS n_docs,
         |  COUNT(DISTINCT text_hash) AS n_distinct,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(SUM(CASE WHEN n_tokens BETWEEN 5 AND 100000
         |    AND mean_tok_len <= 15.0 AND stop_ratio >= 0.01
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_quality
         |FROM per_doc GROUP BY source""".stripMargin) { (s, dir) =>
      val txt = col("text")
      t(s, dir, "documents")
        .select(col("source"),
          Hashing.h60(lower(txt)).as("text_hash"),
          TextAnalysis.tokenCount(txt).as("n_tokens"),
          TextAnalysis.qualityOk(txt).as("ok"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("text_hash")).as("n_distinct"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_quality"))
    },

    // ---- training-set yield: quality gate -> exact dedup -> per-lang
    // yield, the canonical filter+dedup composition of a data pipeline.
    QueryDef(
      "p13_training_yield",
      s"""WITH toks AS (
         |  SELECT doc_id, lang, text, string_split(lower(text), ' ') AS tokens
         |  FROM documents
         |), survivors AS (
         |  SELECT lang, ${Hashing.sqlH60("lower(text)")} AS text_hash,
         |    CAST(len(tokens) AS BIGINT) AS n_tokens
         |  FROM toks
         |  WHERE len(tokens) BETWEEN 5 AND 100000
         |    AND CAST(list_sum(list_transform(tokens, w -> length(w))) AS DOUBLE)
         |      / CAST(len(tokens) AS DOUBLE) <= 15.0
         |    AND CAST(len(list_filter(tokens, w -> list_contains($STOPLIST, w))) AS BIGINT)
         |      / CAST(len(tokens) AS DOUBLE) >= 0.01
         |), deduped AS (
         |  SELECT lang, text_hash, MIN(n_tokens) AS n_tokens
         |  FROM survivors GROUP BY lang, text_hash
         |)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
         |FROM deduped GROUP BY lang""".stripMargin) { (s, dir) =>
      val txt = col("text")
      t(s, dir, "documents")
        .filter(TextAnalysis.qualityOk(txt))
        .select(col("lang"),
          Hashing.h60(lower(txt)).as("text_hash"),
          TextAnalysis.tokenCount(txt).as("n_tokens"))
        .groupBy("lang", "text_hash")
        .agg(min(col("n_tokens")).as("n_tokens"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"))
    },

    // ---- embedding-cosine near-dup: hyperplane-LSH candidates (4 tables
    // x 8 planes, any-table collision) verified by exact fixed-point
    // cosine — the vector-side dedup operator. The oracle replays the
    // identical LSH pipeline (inline integer plane coefficients), so the
    // compare is exact.
    QueryDef(
      "p11_embedding_dedup",
      s"""WITH buck AS (
         |  SELECT vec_id, CAST(t AS BIGINT) AS tbl,
         |    ${Ann.sqlLshBucket("embedding", 64, 8, "t")} AS bucket
         |  FROM embeddings, range(0, 4) tt(t)
         |),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM buck a JOIN buck b
         |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
         |)
         |SELECT id_a, id_b, sim_micro FROM (
         |  SELECT id_a, id_b,
         |    ${sqlMicroCos("ea.embedding", "eb.embedding")} AS sim_micro
         |  FROM cand
         |  JOIN embeddings ea ON ea.vec_id = id_a
         |  JOIN embeddings eb ON eb.vec_id = id_b
         |) WHERE sim_micro >= 400000""".stripMargin) { (s, dir) =>
      Ann.embeddingDedup(t(s, dir, "embeddings"), dim = 64, planes = 8,
        tables = 4, minMicroCos = 400000L)
    },

    // ---- multimodal decode, PIXEL-DERIVED (round 13; no stub): encode
    // a real 24-bit BMP per doc, then parse the BYTES back into the
    // full pixel grid and emit geometry + per-channel value sums
    // (channel sums catch a B/R swizzle a total sum is blind to). The
    // oracle replays the planted pixel formula; Spark must recover
    // every value from the encoded bytes.
    QueryDef(
      "p10_multimodal_decode",
      s"""WITH $sqlBmpDims, px AS (
         |  SELECT doc_id, w, hh, c.c AS c,
         |    ((h + 7 * x.x + 13 * y.y + 31 * c.c) % 256) AS v
         |  FROM dims,
         |    UNNEST(range(0, w)) AS x(x),
         |    UNNEST(range(0, hh)) AS y(y),
         |    UNNEST(range(0, 3)) AS c(c)
         |)
         |SELECT doc_id AS asset_id,
         |  CAST(54 + MIN(hh) * ((3 * MIN(w) + 3) // 4 * 4) AS BIGINT) AS n_bytes,
         |  CAST(MIN(w) AS BIGINT) AS width, CAST(MIN(hh) AS BIGINT) AS height,
         |  CAST(SUM(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS r_sum,
         |  CAST(SUM(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS g_sum,
         |  CAST(SUM(CASE WHEN c = 2 THEN v ELSE 0 END) AS BIGINT) AS b_sum
         |FROM px GROUP BY doc_id""".stripMargin) { (s, dir) =>
      Multimodal.decodeAssets(
        Multimodal.bmpAssetsFromDocuments(t(s, dir, "documents"))).toDF()
    },

    // ---- multimodal resize + frame-sample, PIXEL-DERIVED (round 13):
    // decode the real BMP grid, nearest-neighbor stride-resize to the
    // aspect-floor target, and CHECKSUM THE RESIZED PIXELS (so the pass
    // provably transformed pixels, not just dims); plus every-2nd-frame
    // sampling with the frame count derived from the real payload
    // length. The oracle recomputes each output pixel as the planted
    // formula at its floor-mapped source coordinate.
    QueryDef(
      "p21_multimodal_resize",
      s"""WITH $sqlBmpDims, rd AS (
         |  SELECT doc_id, h, w, hh,
         |    CASE WHEN greatest(w, hh) <= $BMP_MAXDIM THEN w
         |      ELSE greatest(1, w * $BMP_MAXDIM // greatest(w, hh)) END AS ow,
         |    CASE WHEN greatest(w, hh) <= $BMP_MAXDIM THEN hh
         |      ELSE greatest(1, hh * $BMP_MAXDIM // greatest(w, hh)) END AS oh
         |  FROM dims
         |), px AS (
         |  SELECT doc_id, w, hh, ow, oh,
         |    ((h + 7 * (x.x * w // ow) + 13 * (y.y * hh // oh) + 31 * c.c)
         |      % 256) AS v,
         |    ((y.y * ow + x.x) * 3 + c.c + 1) AS wt
         |  FROM rd,
         |    UNNEST(range(0, ow)) AS x(x),
         |    UNNEST(range(0, oh)) AS y(y),
         |    UNNEST(range(0, 3)) AS c(c)
         |), rz AS (
         |  SELECT doc_id AS asset_id,
         |    CAST(MIN(w) AS BIGINT) AS src_w, CAST(MIN(hh) AS BIGINT) AS src_h,
         |    CAST(MIN(ow) AS BIGINT) AS out_w, CAST(MIN(oh) AS BIGINT) AS out_h,
         |    CAST(SUM(v) AS BIGINT) AS px_sum,
         |    CAST(SUM(wt * v) AS BIGINT) AS px_wsum
         |  FROM px GROUP BY doc_id
         |), fr AS (
         |  SELECT doc_id AS asset_id,
         |    CAST(len(range(0,
         |      (54 + hh * ((3 * w + 3) // 4 * 4)) // 100 + 1, $MM_STRIDE))
         |      AS BIGINT) AS n_sampled
         |  FROM dims
         |)
         |SELECT r.asset_id, src_w, src_h, out_w, out_h, px_sum, px_wsum,
         |  n_sampled
         |FROM rz r JOIN fr USING (asset_id)""".stripMargin) { (s, dir) =>
      val assets = Multimodal.bmpAssetsFromDocuments(t(s, dir, "documents"))
      val resized = Multimodal.resizeAssets(assets, BMP_MAXDIM).toDF()
      val sampled = Multimodal.sampleFrames(assets, MM_STRIDE)
        .groupBy("asset_id").agg(count(lit(1)).as("n_sampled"))
      resized.join(sampled, Seq("asset_id"))
    },

    // ---- near-dup GROUP resolution: exact-Jaccard pairs at 0.8 →
    // union-find (connected components over the pair graph) → one
    // canonical (min-id) survivor per transitive group; docs in no pair
    // map to themselves. The oracle recomputes the pairs the simple way
    // and resolves groups with a recursive CTE.
    QueryDef(
      "p14_dup_groups",
      s"""WITH RECURSIVE $sqlGroupCtes
         |SELECT doc_id, canonical_id FROM grp""".stripMargin) {
      (s, dir) =>
        val docs = t(s, dir, "documents")
        Dedup.resolveDupGroups(docs,
          pairsCached(s, dir).filter(col("jaccard") >= DUP_T))
    },

    // ---- deterministic content-hash train/val/test split: stable under
    // re-ingestion, exact duplicates land in one split (no leakage from
    // copies). Emits per-split doc and token totals.
    QueryDef(
      "p15_train_split",
      s"""WITH toks AS (
         |  SELECT doc_id, text, string_split(lower(text), ' ') AS tokens FROM documents
         |)
         |SELECT
         |  CASE WHEN ${Hashing.sqlH60("lower(text)")} % 100 < 80 THEN 'train'
         |       WHEN ${Hashing.sqlH60("lower(text)")} % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(len(tokens)) AS BIGINT) AS n_tokens
         |FROM toks GROUP BY 1""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(
          TextAnalysis.splitAssign(col("text")).as("split"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    },

    // ---- intra-document repetition (Gopher-style quality signal):
    // fraction of repeated word n-grams — catches boilerplate/keyword
    // stuffing that cross-document dedup cannot see.
    QueryDef(
      "p16_repetition",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS tokens FROM documents
         |), g AS (
         |  SELECT doc_id,
         |    CAST(greatest(len(tokens) - ${SHINGLE_N - 1}, 1) AS BIGINT) AS total_grams,
         |    CAST(len(${Shingles.sqlWordShingles("tokens", SHINGLE_N)}) AS BIGINT)
         |      AS distinct_grams
         |  FROM toks
         |)
         |SELECT doc_id, total_grams, distinct_grams,
         |  1.0 - CAST(distinct_grams AS DOUBLE) / CAST(total_grams AS DOUBLE)
         |    AS rep_ratio
         |FROM g""".stripMargin) { (s, dir) =>
      val txt = col("text")
      t(s, dir, "documents").select(
        col("doc_id"),
        greatest(size(TextAnalysis.tokens(txt)) - (SHINGLE_N - 1), lit(1))
          .cast("long").as("total_grams"),
        size(Shingles.hashedWordShingles(txt, SHINGLE_N,
          Hashing.HashMode.Oracle)).cast("long").as("distinct_grams"),
        TextAnalysis.repetitionRatio(txt, SHINGLE_N).as("rep_ratio"))
    },

    // ---- stratified per-language cap (quota sampling for corpus
    // balancing): keep the K longest docs per language, deterministic
    // (n_tokens DESC, doc_id) ranking — the window top-k shape on the
    // pipeline side.
    QueryDef(
      "p17_stratified_cap",
      s"""WITH toks AS (
         |  SELECT doc_id, lang, string_split(lower(text), ' ') AS tokens FROM documents
         |), ranked AS (
         |  SELECT lang, doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY len(tokens) DESC, doc_id) AS rank
         |  FROM toks
         |)
         |SELECT lang, doc_id, n_tokens, CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= $STRAT_K""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n_tokens").desc, col("doc_id"))
      t(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= STRAT_K)
    },

    // ---- benchmark decontamination: fraction of each doc's hashed
    // shingles occurring in the "benchmark" subset (doc_id % 20 == 0 —
    // a stand-in eval suite). Broadcast semi-join on 8-byte keys; the
    // standard pre-training contamination gate.
    QueryDef(
      "p19_contamination",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS tokens FROM documents
         |), sh AS (
         |  SELECT doc_id, ${Shingles.sqlWordShingles("tokens", SHINGLE_N)} AS shingles
         |  FROM toks
         |), hsh AS (
         |  SELECT doc_id, list_transform(shingles, s -> ${Hashing.sqlH60("s")}) AS hs
         |  FROM sh
         |), bench AS (
         |  SELECT list(DISTINCT h) AS bl
         |  FROM (SELECT unnest(hs) AS h FROM hsh WHERE doc_id % 20 = 0)
         |)
         |SELECT doc_id, n_sh, n_hits,
         |  CAST(n_hits AS DOUBLE) / CAST(n_sh AS DOUBLE) AS contamination
         |FROM (
         |  SELECT h.doc_id, CAST(len(h.hs) AS BIGINT) AS n_sh,
         |    CAST(len(list_filter(h.hs, x -> list_contains(b.bl, x))) AS BIGINT) AS n_hits
         |  FROM hsh h CROSS JOIN bench b
         |  WHERE h.doc_id % 20 <> 0
         |)""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      Curation.contaminationScores(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0), SHINGLE_N)
    },

    // ---- sequence packing: concatenate-then-chunk per shard (source),
    // PACK_BUDGET-token context windows; per-bin doc/token totals. The
    // window cumsum partitions by shard, so it parallelizes instead of
    // forcing a global order through one task.
    QueryDef(
      "p20_seq_packing",
      s"""WITH toks AS (
         |  SELECT doc_id, source, string_split(lower(text), ' ') AS tokens FROM documents
         |), td AS (
         |  SELECT source AS shard, doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens FROM toks
         |), off AS (
         |  SELECT shard, doc_id, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
         |  FROM td
         |)
         |SELECT shard, CAST(start_offset // $PACK_BUDGET AS BIGINT) AS bin,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
         |FROM off GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Curation.packSequences(t(s, dir, "documents"), PACK_BUDGET)
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
    },

    // ---- multimodal feature extraction, PIXEL-DERIVED (round 13):
    // decode the real BMP grid and pool a 2×2 region lattice of integer
    // channel means — a 12-component embedding of genuinely
    // pixel-derived statistics (region of pixel (x,y) is floor
    // (x·G/w, y·G/h); mean is floor division, exact in Float32). The
    // oracle groups the planted formula's pixels by the same region
    // assignment; components compare as an ordered integer string, so
    // the batched decode→pool plumbing is hash-verified without
    // cross-engine float formatting.
    QueryDef(
      "p22_multimodal_embed",
      s"""WITH $sqlBmpDims, px AS (
         |  SELECT doc_id,
         |    (y.y * $MM_GRID // hh) * $MM_GRID + (x.x * $MM_GRID // w) AS reg,
         |    c.c AS c,
         |    ((h + 7 * x.x + 13 * y.y + 31 * c.c) % 256) AS v
         |  FROM dims,
         |    UNNEST(range(0, w)) AS x(x),
         |    UNNEST(range(0, hh)) AS y(y),
         |    UNNEST(range(0, 3)) AS c(c)
         |), comp AS (
         |  SELECT doc_id, reg, c,
         |    CAST(SUM(v) // COUNT(*) AS BIGINT) AS mean
         |  FROM px GROUP BY doc_id, reg, c
         |)
         |SELECT doc_id AS asset_id,
         |  array_to_string(list(mean ORDER BY reg, c), ',') AS emb_q
         |FROM comp GROUP BY doc_id""".stripMargin) { (s, dir) =>
      Multimodal.embedAssets(
          Multimodal.bmpAssetsFromDocuments(t(s, dir, "documents")), MM_GRID)
        .toDF()
        .select(col("asset_id"),
          concat_ws(",", transform(col("embedding"),
            x => x.cast("long"))).as("emb_q"))
    },

    // ---- product quantization, deterministic variant: integer LCG
    // codebooks + floor(x*1000) quantized vectors make encode argmin and
    // ADC scores exact Long arithmetic, so DuckDB replays the full
    // compressed-ANN pipeline (encode -> ADC scan -> top-k) bit-for-bit.
    // The trained-codebook path stays measured by PqSpec's recall
    // harness; this gate pins the operator mechanics.
    QueryDef(
      "p23_pq_adc",
      s"""WITH qv AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
         |  FROM embeddings
         |),
         |d AS (
         |  SELECT vec_id, s,
         |    list_transform(range(0, ${1 << PQ_NBITS}), c ->
         |      list_sum(list_transform(range(0, $PQ_SUBDIM), i ->
         |        (v[CAST(s * $PQ_SUBDIM + i + 1 AS INT)] - ${pqCtr("s", "c", "i")}) *
         |        (v[CAST(s * $PQ_SUBDIM + i + 1 AS INT)] - ${pqCtr("s", "c", "i")})
         |      ))) AS dists
         |  FROM qv, range(0, $PQ_M) ss(s)
         |),
         |cd AS (
         |  SELECT vec_id, s,
         |    CAST(list_position(dists, list_min(dists)) - 1 AS BIGINT) AS code
         |  FROM d
         |),
         |scores AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |    CAST(SUM(list_sum(list_transform(range(0, $PQ_SUBDIM), i ->
         |      q.v[CAST(n.s * $PQ_SUBDIM + i + 1 AS INT)] *
         |        ${pqCtr("n.s", "n.code", "i")}))) AS BIGINT) AS score
         |  FROM cd n CROSS JOIN qv q
         |  WHERE q.vec_id < $ANN_NQ AND q.vec_id <> n.vec_id
         |  GROUP BY 1, 2
         |)
         |SELECT query_id, neighbor_id, score, rank FROM (
         |  SELECT query_id, neighbor_id, score,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM scores
         |) WHERE rank <= $ANN_K""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val cb = Pq.deterministicCodebooks(64, PQ_M, PQ_NBITS)
      val codes = Pq.exactCodes(emb, cb)
      Pq.exactAdcTopK(emb.filter(col("vec_id") < ANN_NQ), codes, cb, ANN_K)
    },

    // ---- the TWO-STAGE PQ pipeline end to end: deterministic ADC
    // candidates (top-PQ_RERANK_POOL per query from the compressed
    // codes) re-ranked by the exact fixed-point cosine — the production
    // compressed-scan + exact-verify design, hash-gated because both
    // stages are integer-exact.
    QueryDef(
      "p24_pq_rerank",
      s"""WITH qv AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
         |  FROM embeddings
         |),
         |d AS (
         |  SELECT vec_id, s,
         |    list_transform(range(0, ${1 << PQ_NBITS}), c ->
         |      list_sum(list_transform(range(0, $PQ_SUBDIM), i ->
         |        (v[CAST(s * $PQ_SUBDIM + i + 1 AS INT)] - ${pqCtr("s", "c", "i")}) *
         |        (v[CAST(s * $PQ_SUBDIM + i + 1 AS INT)] - ${pqCtr("s", "c", "i")})
         |      ))) AS dists
         |  FROM qv, range(0, $PQ_M) ss(s)
         |),
         |cd AS (
         |  SELECT vec_id, s,
         |    CAST(list_position(dists, list_min(dists)) - 1 AS BIGINT) AS code
         |  FROM d
         |),
         |scores AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |    CAST(SUM(list_sum(list_transform(range(0, $PQ_SUBDIM), i ->
         |      q.v[CAST(n.s * $PQ_SUBDIM + i + 1 AS INT)] *
         |        ${pqCtr("n.s", "n.code", "i")}))) AS BIGINT) AS score
         |  FROM cd n CROSS JOIN qv q
         |  WHERE q.vec_id < $ANN_NQ AND q.vec_id <> n.vec_id
         |  GROUP BY 1, 2
         |),
         |pool AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score DESC, neighbor_id) AS rnk
         |    FROM scores
         |  ) WHERE rnk <= $PQ_RERANK_POOL
         |)
         |SELECT query_id, neighbor_id, sim_micro, rank FROM (
         |  SELECT p.query_id, p.neighbor_id,
         |    ${sqlMicroCos("eq.embedding", "en.embedding")} AS sim_micro,
         |    CAST(row_number() OVER (PARTITION BY p.query_id
         |      ORDER BY ${sqlMicroCos("eq.embedding", "en.embedding")} DESC,
         |        p.neighbor_id) AS BIGINT) AS rank
         |  FROM pool p
         |  JOIN embeddings eq ON eq.vec_id = p.query_id
         |  JOIN embeddings en ON en.vec_id = p.neighbor_id
         |) WHERE rank <= $ANN_K""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val queries = emb.filter(col("vec_id") < ANN_NQ)
      val cb = Pq.deterministicCodebooks(64, PQ_M, PQ_NBITS)
      val pool = Pq.exactAdcTopK(queries, Pq.exactCodes(emb, cb), cb,
        PQ_RERANK_POOL)
      Pq.rerank(pool, queries, emb, ANN_K)
    },

    // ---- the COMPOSED IVF-PQ pipeline (VERDICT round 6 "Next round"
    // #3): coarse cells restrict WHICH codes each query scans (p18's
    // probe assignment — top-NPROBE cells by micro-cosine to the min-id
    // representative), then ADC scores only the surviving codes (p23's
    // integer encode + lookup math). Everything is exact integer
    // arithmetic under deterministic codebooks, so DuckDB replays the
    // full cell-restricted compressed scan bit-for-bit — the last
    // spec-only composition becomes hash-gated.
    QueryDef(
      "p25_ivf_pq",
      s"""WITH qv AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
         |  FROM embeddings
         |),
         |q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < $ANN_NQ),
         |reps AS (
         |  SELECT label, embedding AS rep FROM (
         |    SELECT label, embedding,
         |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
         |    FROM embeddings) WHERE rn = 1
         |),
         |probed AS (
         |  SELECT query_id, label FROM (
         |    SELECT q.vec_id AS query_id, r.label,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${sqlMicroCos("q.embedding", "r.rep")} DESC, r.label) AS prb
         |    FROM q CROSS JOIN reps r) WHERE prb <= $NPROBE
         |),
         |d AS (
         |  SELECT vec_id, s,
         |    list_transform(range(0, ${1 << PQ_NBITS}), c ->
         |      list_sum(list_transform(range(0, $PQ_SUBDIM), i ->
         |        (v[CAST(s * $PQ_SUBDIM + i + 1 AS INT)] - ${pqCtr("s", "c", "i")}) *
         |        (v[CAST(s * $PQ_SUBDIM + i + 1 AS INT)] - ${pqCtr("s", "c", "i")})
         |      ))) AS dists
         |  FROM qv, range(0, $PQ_M) ss(s)
         |),
         |cd AS (
         |  SELECT vec_id, s,
         |    CAST(list_position(dists, list_min(dists)) - 1 AS BIGINT) AS code
         |  FROM d
         |),
         |scores AS (
         |  SELECT p.query_id AS query_id, n.vec_id AS neighbor_id,
         |    CAST(SUM(list_sum(list_transform(range(0, $PQ_SUBDIM), i ->
         |      qq.v[CAST(n.s * $PQ_SUBDIM + i + 1 AS INT)] *
         |        ${pqCtr("n.s", "n.code", "i")}))) AS BIGINT) AS score
         |  FROM cd n
         |  JOIN embeddings e ON e.vec_id = n.vec_id
         |  JOIN probed p ON p.label = e.label
         |  JOIN qv qq ON qq.vec_id = p.query_id
         |  WHERE p.query_id <> n.vec_id
         |  GROUP BY 1, 2
         |)
         |SELECT query_id, neighbor_id, score, rank FROM (
         |  SELECT query_id, neighbor_id, score,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM scores
         |) WHERE rank <= $IVF_K""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val corpus = emb.select(col("vec_id"), col("embedding"))
      val cb = Pq.deterministicCodebooks(64, PQ_M, PQ_NBITS)
      Pq.exactIvfPqTopK(
        corpus.filter(col("vec_id") < ANN_NQ),
        Pq.exactCodes(corpus, cb),
        emb.select(col("vec_id"), col("label").as("cell")),
        Ann.minIdReps(emb, "label"),
        cb, NPROBE, IVF_K)
    },

    // ---- CCNet-style inter-document boilerplate removal: drop every
    // exact 8-word span occurring in >= 2 distinct docs, reconstruct
    // each doc from surviving spans in order. Frequency counting is on
    // 8-byte hashes (text never shuffles); reconstruction is an
    // index-filter over the in-place segment array.
    QueryDef(
      "p26_segment_dedup",
      s"""WITH ws AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |), seg AS (
         |  SELECT doc_id,
         |    list_transform(range(CAST(ceil(len(w) / $SEG_W.0) AS BIGINT)),
         |      i -> array_to_string(
         |        list_slice(w, i * $SEG_W + 1, i * $SEG_W + $SEG_W), ' ')) AS segs
         |  FROM ws
         |), expl AS (
         |  SELECT doc_id, generate_subscripts(segs, 1) - 1 AS seg_idx,
         |    unnest(segs) AS seg
         |  FROM seg
         |), hashed AS (
         |  SELECT doc_id, seg_idx, seg, ${Hashing.sqlH60("seg")} AS h FROM expl
         |), boiler AS (
         |  SELECT h FROM hashed GROUP BY h
         |  HAVING count(DISTINCT doc_id) >= $SEG_MIN_DOCS
         |), kept AS (
         |  SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text
         |  FROM hashed WHERE h NOT IN (SELECT h FROM boiler) GROUP BY doc_id
         |), rm AS (
         |  SELECT doc_id, count(*) AS n_removed
         |  FROM hashed WHERE h IN (SELECT h FROM boiler) GROUP BY doc_id
         |)
         |SELECT s.doc_id, coalesce(k.clean_text, '') AS clean_text,
         |  CAST(len(s.segs) AS BIGINT) AS n_segs,
         |  CAST(coalesce(r.n_removed, 0) AS BIGINT) AS n_removed
         |FROM seg s
         |LEFT JOIN kept k ON k.doc_id = s.doc_id
         |LEFT JOIN rm r ON r.doc_id = s.doc_id""".stripMargin) { (s, dir) =>
      Dedup.segmentDedup(t(s, dir, "documents"), SEG_W, SEG_MIN_DOCS)
    },

    // ---- corpus-self-derived unigram LM quality score: per-word
    // log-prob quantized to integer micro-nats BEFORE summation, so the
    // per-doc sum is order-independent integer math both engines agree
    // on bit-for-bit.
    QueryDef(
      "p27_unigram_lm",
      s"""WITH toksx AS (
         |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
         |  FROM documents
         |), freq AS (
         |  SELECT w, count(*) AS cnt FROM toksx GROUP BY w
         |), tot AS (SELECT sum(cnt) AS tot FROM freq),
         |ws AS (
         |  SELECT w,
         |    CAST(floor(ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
         |      * 1000000) AS BIGINT) AS lp,
         |    CASE WHEN cnt < $LM_MIN_COUNT THEN 1 ELSE 0 END AS oov
         |  FROM freq CROSS JOIN tot
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(lp) AS BIGINT) AS lp_micro_sum,
         |  CAST(sum(lp) AS DOUBLE) / count(*) AS mean_lp_micro,
         |  CAST(sum(oov) AS BIGINT) AS n_oov,
         |  CAST(sum(oov) AS DOUBLE) / count(*) AS oov_frac
         |FROM toksx JOIN ws USING (w) GROUP BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.unigramQuality(t(s, dir, "documents"), LM_MIN_COUNT)
    },

    // ---- per-doc top-k TF-IDF keywords: integer micro-nat IDF makes
    // tf*idf a pure integer score with a (score desc, word) tie-break.
    QueryDef(
      "p28_tfidf_keywords",
      s"""WITH toksx AS (
         |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
         |  FROM documents
         |), tf AS (
         |  SELECT doc_id, word, count(*) AS tf FROM toksx GROUP BY 1, 2
         |), dfreq AS (
         |  SELECT word, count(*) AS df FROM tf GROUP BY word
         |), nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.word, CAST(tf.tf AS BIGINT) AS tf,
         |    CAST(floor(ln(CAST(n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE))
         |      * 1000000) AS BIGINT) AS idf_micro
         |  FROM tf JOIN dfreq d ON d.word = tf.word CROSS JOIN nd n
         |)
         |SELECT doc_id, word, tf, idf_micro, score, rank FROM (
         |  SELECT doc_id, word, tf, idf_micro,
         |    tf * idf_micro AS score,
         |    CAST(row_number() OVER (PARTITION BY doc_id
         |      ORDER BY tf * idf_micro DESC, word) AS BIGINT) AS rank
         |  FROM scored
         |) WHERE rank <= $TFIDF_K""".stripMargin) { (s, dir) =>
      TextAnalysis.tfidfKeywords(t(s, dir, "documents"), TFIDF_K)
    },

    // ---- HLL-style approximate distinct docs per source: register
    // sketch as relational algebra, integer harmonic denominator, one
    // deterministic float division at the end (constant interpolated
    // into BOTH engines as the same double literal).
    QueryDef(
      "p29_hll_distinct",
      s"""WITH h AS (
         |  SELECT source, ${Hashing.sqlH60("text")} AS h FROM documents
         |), b AS (
         |  SELECT source, h % ${Sketches.NumBuckets} AS bucket,
         |    h // ${Sketches.NumBuckets} AS rest FROM h
         |), reg AS (
         |  SELECT source, bucket,
         |    max(CASE WHEN rest = 0 THEN ${Sketches.MaxRho}
         |      ELSE bit_count(xor(rest, rest - 1) // 2) + 1 END) AS rho,
         |    count(*) AS bn
         |  FROM b GROUP BY 1, 2
         |)
         |, grp AS (
         |  SELECT source, CAST(sum(bn) AS BIGINT) AS n_rows,
         |    ${Sketches.NumBuckets} - count(*) AS v,
         |    CAST(floor(${Sketches.EstNumerator} / CAST(
         |      sum(1::BIGINT << (${Sketches.MaxRho} - rho)) +
         |      (${Sketches.NumBuckets} - count(*)) *
         |        (1::BIGINT << ${Sketches.MaxRho}) AS DOUBLE))
         |      AS BIGINT) AS raw
         |  FROM reg GROUP BY source
         |)
         |SELECT source, n_rows,
         |  CASE WHEN v > 0 AND raw < ${5L * Sketches.NumBuckets / 2}
         |    THEN CAST(floor(${Sketches.NumBuckets}.0 *
         |      ln(${Sketches.NumBuckets}.0 / CAST(v AS DOUBLE))) AS BIGINT)
         |    ELSE raw END AS est_distinct
         |FROM grp""".stripMargin) { (s, dir) =>
      Sketches.approxDistinct(t(s, dir, "documents"), "source", "text")
    },

    // ---- sketch ALGEBRA: union = bucket-wise register MAX (no data
    // re-scan), intersection by inclusion-exclusion — the mergeability
    // property that makes register sketches the distributed
    // cardinality tool.
    QueryDef(
      "p30_hll_algebra",
      s"""WITH h AS (
         |  SELECT source, ${Hashing.sqlH60("text")} AS h FROM documents
         |  WHERE source IN ('src0', 'src1')
         |), b AS (
         |  SELECT source, h % ${Sketches.NumBuckets} AS bucket,
         |    h // ${Sketches.NumBuckets} AS rest FROM h
         |), reg AS (
         |  SELECT source, bucket,
         |    max(CASE WHEN rest = 0 THEN ${Sketches.MaxRho}
         |      ELSE bit_count(xor(rest, rest - 1) // 2) + 1 END) AS rho
         |  FROM b GROUP BY 1, 2
         |), regu AS (SELECT bucket, max(rho) AS rho FROM reg GROUP BY bucket),
         |ea AS ${sqlHllEst("(SELECT rho FROM reg WHERE source = 'src0')", "est_a")},
         |eb AS ${sqlHllEst("(SELECT rho FROM reg WHERE source = 'src1')", "est_b")},
         |eu AS ${sqlHllEst("regu", "est_union")}
         |SELECT est_a, est_b, est_union,
         |  est_a + est_b - est_union AS est_inter
         |FROM ea CROSS JOIN eb CROSS JOIN eu""".stripMargin) { (s, dir) =>
      Sketches.approxDistinctPair(t(s, dir, "documents"),
        "source", "text", "src0", "src1")
    },

    // ---- deterministic bottom-k sample per language: content-keyed
    // (stable across re-ingestion), uniform over distinct texts,
    // mergeable across shards; planned as WindowGroupLimit (no global
    // sort).
    QueryDef(
      "p31_bottomk_sample",
      sqlBottomK) { (s, dir) =>
      Sketches.bottomKSample(
        t(s, dir, "documents").select("lang", "doc_id", "text"),
        "lang", "text", "doc_id", BOTTOMK)
        .select(col("lang"), col("doc_id"), col("h"), col("sample_rank"))
    },

    // ---- mergeable quantile sketch: nearest-rank quantiles of text
    // length per language from a deterministic bottom-k row sample —
    // integer basis-point ranks, exact for groups with <= k rows,
    // shard-mergeable like p31 (VERDICT round 7 #6).
    QueryDef(
      "p32_quantile_sketch",
      s"""WITH hv AS (
         |  SELECT lang, doc_id, CAST(length(text) AS BIGINT) AS v,
         |    ${Hashing.sqlH60("text")} AS h
         |  FROM documents
         |), samp AS (
         |  SELECT lang, doc_id, v, h FROM (
         |    SELECT lang, doc_id, v, h,
         |      row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS r
         |    FROM hv
         |  ) WHERE r <= $QS_K
         |), ranked AS (
         |  SELECT lang, v,
         |    CAST(row_number() OVER (PARTITION BY lang ORDER BY v, h, doc_id)
         |      AS BIGINT) AS vrank
         |  FROM samp
         |), mm AS (SELECT lang, count(*) AS m FROM samp GROUP BY lang),
         |probs(p_bp) AS (VALUES ${QS_PROBS.map(p => s"($p)").mkString(",")}),
         |want AS (
         |  SELECT mm.lang, CAST(p_bp AS BIGINT) AS p_bp,
         |    CAST(greatest(1, (p_bp * m + 9999) // 10000) AS BIGINT)
         |      AS want_rank
         |  FROM mm CROSS JOIN probs
         |)
         |SELECT w.lang AS lang, w.p_bp AS p_bp, r.v AS q_est
         |FROM want w JOIN ranked r
         |  ON r.lang = w.lang AND r.vrank = w.want_rank""".stripMargin) {
      (s, dir) =>
        Sketches.quantileSketch(
          t(s, dir, "documents")
            .select(col("lang"), col("doc_id"), col("text"),
              length(col("text")).cast("long").as("v")),
          "lang", "v", "text", "doc_id", QS_K, QS_PROBS)
    },

    // ---- PII scrub: typed redaction (email → IPv4 → phone, each count
    // taken on the previous stage's redacted text) over a
    // deterministically-dirtied copy of the corpus — the synthetic
    // word-salad contains no PII, so the gate plants doc_id-derived
    // spans IDENTICALLY in both engines and the regexes are genuinely
    // exercised (sum over sf0.01: 333 emails, 600 IPs, 125 phones).
    QueryDef(
      "p33_pii_scrub",
      s"""WITH dirty AS (
         |  SELECT doc_id, concat_ws(' ', text,
         |    CASE WHEN doc_id % 3 <> 0 THEN 'user' || CAST(doc_id AS VARCHAR)
         |      || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.net' END,
         |    '10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
         |      || CAST(doc_id % 250 AS VARCHAR),
         |    CASE WHEN doc_id % 5 = 0 THEN '192.168.'
         |      || CAST(doc_id % 100 AS VARCHAR) || '.1' END,
         |    CASE WHEN doc_id % 4 = 0 THEN '555-'
         |      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
         |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') END
         |  ) AS t FROM documents
         |), red1 AS (
         |  SELECT doc_id, t,
         |    regexp_replace(t, '${TextAnalysis.EmailPattern}', '<EMAIL>', 'g') AS r1
         |  FROM dirty
         |), red2 AS (
         |  SELECT doc_id, t, r1,
         |    regexp_replace(r1, '${TextAnalysis.Ipv4Pattern}', '<IP>', 'g') AS r2
         |  FROM red1
         |)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '${TextAnalysis.EmailPattern}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(r1, '${TextAnalysis.Ipv4Pattern}')) AS BIGINT) AS n_ipv4,
         |  CAST(len(regexp_extract_all(r2, '${TextAnalysis.PhonePattern}')) AS BIGINT) AS n_phones,
         |  CAST(length(regexp_replace(r2, '${TextAnalysis.PhonePattern}', '<PHONE>', 'g')) AS BIGINT) AS red_len,
         |  ${Hashing.sqlH60(s"regexp_replace(r2, '${TextAnalysis.PhonePattern}', '<PHONE>', 'g')")} AS red_hash
         |FROM red2""".stripMargin) { (s, dir) =>
      val id = col("doc_id")
      def n(c: Column) = c.cast("string")
      val dirty = t(s, dir, "documents").select(id, concat_ws(" ", col("text"),
        when(id % 3 =!= 0,
          concat(lit("user"), n(id), lit("@mail"), n(id % 7), lit(".net"))),
        concat(lit("10."), n(id % 256), lit(".0."), n(id % 250)),
        when(id % 5 === 0, concat(lit("192.168."), n(id % 100), lit(".1"))),
        when(id % 4 === 0, concat(lit("555-"), lpad(n(id % 1000), 3, "0"),
          lit("-"), lpad(n(id % 10000), 4, "0")))).as("text"))
      TextAnalysis.piiScrub(dirty)
    },

    // ---- semantic dedup (SemDeDup): coarse-cluster the embedding
    // corpus, drop vectors with a lower-id clustermate at cosine ≥ τ.
    // Oracle mode feeds the deterministic low-id pivot table; the
    // production swap-in is the k-means quantizer (recall-harness
    // territory, like p09/p18).
    QueryDef(
      "p34_semdedup",
      s"""WITH piv AS (
         |  SELECT vec_id AS cluster, embedding AS rep FROM embeddings
         |  WHERE vec_id < (SELECT greatest($SEM_MIN_PIVOTS,
         |    CAST(floor(sqrt(count(*))) AS BIGINT)) FROM embeddings)
         |), asg AS (
         |  SELECT vec_id, cluster, embedding FROM (
         |    SELECT e.vec_id, p.cluster, e.embedding,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${sqlMicroCos("e.embedding", "p.rep")} DESC, p.cluster) AS rn
         |    FROM embeddings e CROSS JOIN piv p
         |  ) WHERE rn = 1
         |), drp AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |  WHERE ${sqlMicroCos("a.embedding", "b.embedding")} >= $SEM_T
         |)
         |SELECT a.vec_id AS vec_id, a.cluster AS cluster,
         |  d.vec_id IS NULL AS kept
         |FROM asg a LEFT JOIN drp d ON a.vec_id = d.vec_id""".stripMargin) {
      (s, dir) =>
        val emb = t(s, dir, "embeddings")
        Ann.semDedup(emb,
          Ann.scaledLowIdPivots(emb, SEM_MIN_PIVOTS), SEM_T)
    },

    // ---- DSIR-style importance weighting: hashed-token bucket
    // histograms of a trusted target slice vs the raw rest, exact
    // integer micro-ratio weights, above-global-ratio selection.
    QueryDef(
      "p35_dsir_weights",
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    source IN (${DSIR_TARGET.map(v => s"'$v'").mkString(", ")}) AS tgt,
         |    unnest(string_split(lower(text), ' ')) AS w
         |  FROM documents
         |), bkt AS (
         |  SELECT doc_id, tgt, ${Hashing.sqlH60("w")} % $DSIR_BUCKETS AS b FROM toks
         |), cnt AS (
         |  SELECT b,
         |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS tgt_n,
         |    CAST(sum(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS BIGINT) AS raw_n
         |  FROM bkt GROUP BY b
         |), wts AS (
         |  SELECT b, CAST((1000000 * (tgt_n + 1)) // (raw_n + 1) AS BIGINT) AS w_micro
         |  FROM cnt
         |), cut AS (
         |  SELECT CAST((1000000 * (sum(tgt_n) + 1)) // (sum(raw_n) + 1) AS BIGINT)
         |    AS cut_micro FROM cnt
         |), sc AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(w_micro) AS BIGINT) AS score_micro
         |  FROM bkt JOIN wts USING (b) GROUP BY doc_id
         |)
         |SELECT doc_id, n_tokens, score_micro,
         |  CAST(score_micro // n_tokens AS BIGINT) AS per_tok_micro,
         |  (score_micro // n_tokens) >= cut_micro AS selected
         |FROM sc CROSS JOIN cut""".stripMargin) { (s, dir) =>
      Curation.importanceWeights(
        t(s, dir, "documents"),
        col("source").isInCollection(DSIR_TARGET), DSIR_BUCKETS)
    },

    // ---- Bloom decontamination: the fixed-size-bitmap scale path of
    // p19 (a benchmark shingle set too big to broadcast exactly still
    // fits in BLOOM_WORDS 63-bit words). Same doc/bench split as p19,
    // so the two are directly comparable: n_maybe >= p19's n_hits
    // (no false negatives), asserted in CurationSpec.
    QueryDef(
      "p36_bloom_contamination",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS tokens FROM documents
         |), sh AS (
         |  SELECT doc_id, ${Shingles.sqlWordShingles("tokens", SHINGLE_N)} AS shingles
         |  FROM toks
         |), hsh AS (
         |  SELECT doc_id, list_transform(shingles, s -> ${Hashing.sqlH60("s")}) AS hs
         |  FROM sh
         |), bh AS (
         |  SELECT DISTINCT unnest(hs) AS h FROM hsh WHERE doc_id % 20 = 0
         |), bpos AS (
         |  SELECT (h + i * (1 + h % ${BLOOM_M - 1})) % $BLOOM_M AS pos
         |  FROM bh CROSS JOIN (SELECT unnest(range(0, $BLOOM_PROBES)) AS i)
         |), bloom AS (
         |  SELECT pos // 63 AS w,
         |    bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS bits
         |  FROM bpos GROUP BY pos // 63
         |), dsh AS (
         |  SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_sh, unnest(hs) AS h
         |  FROM hsh WHERE doc_id % 20 <> 0
         |), dprobe AS (
         |  SELECT doc_id, n_sh, h,
         |    (h + i * (1 + h % ${BLOOM_M - 1})) % $BLOOM_M AS pos
         |  FROM dsh CROSS JOIN (SELECT unnest(range(0, $BLOOM_PROBES)) AS i)
         |), dhit AS (
         |  SELECT doc_id, n_sh, h, coalesce(
         |    (b.bits & (CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)))
         |      = (CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)), FALSE) AS hit
         |  FROM dprobe LEFT JOIN bloom b ON pos // 63 = b.w
         |), per_sh AS (
         |  SELECT doc_id, n_sh, h,
         |    sum(CASE WHEN hit THEN 1 ELSE 0 END) = $BLOOM_PROBES AS maybe
         |  FROM dhit GROUP BY doc_id, n_sh, h
         |)
         |SELECT doc_id, n_sh,
         |  CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
         |  CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(n_sh AS DOUBLE) AS maybe_frac
         |FROM per_sh GROUP BY doc_id, n_sh""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      Curation.bloomContamination(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        SHINGLE_N, BLOOM_WORDS, BLOOM_PROBES)
    },

    // ---- duplicated-n-gram profile: per-doc fraction of shingles that
    // recur in >= DUPNG_MIN distinct documents (the cross-document
    // exact-substring-dedup signal of Lee et al. 2022).
    QueryDef(
      "p37_dup_ngrams",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS tokens FROM documents
         |), sh AS (
         |  SELECT doc_id, ${Shingles.sqlWordShingles("tokens", SHINGLE_N)} AS shingles
         |  FROM toks
         |), ex AS (
         |  SELECT doc_id, unnest(list_transform(shingles, s -> ${Hashing.sqlH60("s")})) AS h
         |  FROM sh
         |), df AS (
         |  SELECT h, count(*) AS ndocs FROM ex GROUP BY h
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh,
         |  CAST(sum(CASE WHEN ndocs >= $DUPNG_MIN THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |  CAST(sum(CASE WHEN ndocs >= $DUPNG_MIN THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS dup_frac
         |FROM ex JOIN df USING (h) GROUP BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.ngramDupProfile(t(s, dir, "documents"), SHINGLE_N, DUPNG_MIN)
    },

    // ---- mixture equalization: deterministic hash-Bernoulli
    // down-sample of every source to the smallest source's size.
    QueryDef(
      "p38_mixture_sample",
      s"""WITH cnt AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_source
         |  FROM documents GROUP BY source
         |), mn AS (
         |  SELECT min(n_source) AS min_n FROM cnt
         |), rates AS (
         |  SELECT source, n_source,
         |    CAST((1000000 * min_n) // n_source AS BIGINT) AS rate_micro
         |  FROM cnt CROSS JOIN mn
         |)
         |SELECT d.doc_id, d.source, r.n_source, r.rate_micro,
         |  (${Hashing.sqlH60("'mix:' || CAST(d.doc_id AS VARCHAR)")} % 1000000)
         |    < r.rate_micro AS kept
         |FROM documents d JOIN rates r USING (source)""".stripMargin) { (s, dir) =>
      Curation.equalizeMixture(t(s, dir, "documents"))
    },

    // ---- Count-Min frequency sketch: depth×width counter relation over
    // the corpus token stream, probed for the exact top-CM_TOPK words —
    // n_est >= n_true always (counters only over-count on collision).
    QueryDef(
      "p39_countmin_words",
      sqlCountMinTopK) { (s, dir) =>
      val toks = t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      val sketch = Sketches.countMinSketch(toks, "w", CM_DEPTH, CM_WIDTH)
      val tru = toks.groupBy("w").agg(count(lit(1)).as("n_true"))
        .orderBy(col("n_true").desc, col("w")).limit(CM_TOPK)
      Sketches.countMinLookup(sketch, tru.select("w"), "w", CM_DEPTH, CM_WIDTH)
        .join(tru, Seq("w"))
        .select(col("w").as("word"), col("n_true"), col("est_n").as("n_est"))
    },

    // ---- BM25 top-k retrieval over fixed literal queries; integer
    // micro-nat IDF, term scores floored BEFORE the per-doc sum.
    QueryDef(
      "p40_bm25",
      s"""WITH q AS (
         |  SELECT * FROM (VALUES ${BM25_QUERIES.map { case (i, txt) =>
             s"(CAST($i AS BIGINT), '$txt')" }.mkString(", ")})
         |    AS t(query_id, qtext)
         |), qt AS (
         |  SELECT query_id,
         |    unnest(list_distinct(string_split(lower(qtext), ' '))) AS word
         |  FROM q
         |), toks AS (
         |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
         |  FROM documents
         |), tf AS (
         |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
         |  FROM toks GROUP BY doc_id, word
         |), dl AS (
         |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
         |), dfq AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS df
         |  FROM tf JOIN (SELECT DISTINCT word FROM qt) USING (word)
         |  GROUP BY word
         |), stats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS t_tokens
         |  FROM documents
         |), scored AS (
         |  SELECT qt.query_id, tf.doc_id,
         |    CAST(floor(
         |      floor(ln((2.0 * s.n_docs + 2.0) / (2.0 * dfq.df + 1.0)) * 1000000.0)
         |      * ((tf.tf * (CAST(2200 AS DOUBLE) / 1000.0)) /
         |         (tf.tf + (CAST(1200 AS DOUBLE) / 1000.0) *
         |           ((CAST(250 AS DOUBLE) / 1000.0)
         |             + (CAST(750 AS DOUBLE) / 1000.0) *
         |               (CAST(dl.dl AS DOUBLE) *
         |                 (CAST(s.n_docs AS DOUBLE) / CAST(s.t_tokens AS DOUBLE))))))
         |    ) AS BIGINT) AS term_score
         |  FROM tf JOIN qt USING (word) JOIN dfq USING (word)
         |    JOIN dl USING (doc_id) CROSS JOIN stats s
         |), agg AS (
         |  SELECT query_id, doc_id, CAST(sum(term_score) AS BIGINT) AS score_micro
         |  FROM scored GROUP BY query_id, doc_id
         |)
         |SELECT query_id, doc_id, score_micro,
         |  CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS BIGINT)
         |    AS rank
         |FROM agg
         |QUALIFY rank <= $BM25_K""".stripMargin) { (s, dir) =>
      import s.implicits._
      Retrieval.bm25TopK(t(s, dir, "documents"),
        BM25_QUERIES.toDF("query_id", "qtext"), BM25_K)
    },

    // ---- z-order layout statistics: interleave the bits of two key
    // dimensions into one Morton sort key (`functions/ZOrder`) and show
    // that every contiguous key range covers a bounded RECTANGLE in both
    // dimensions — per z-bucket (aligned 2^6 × 2^6 tile at shift 12),
    // the min/max span of each dim is < 64 of the 2^16 domain, which is
    // exactly why row-group footer stats prune scans on EITHER column
    // after `ZOrder.writeZOrdered`.
    // Bit math is closed-form integer mask/shift in both engines.
    QueryDef(
      "p41_zorder_stats",
      s"""WITH d AS (
         |  SELECT (l_partkey & 65535) AS a, (l_suppkey & 65535) AS b
         |  FROM lineitem
         |), z AS (
         |  SELECT a, b,
         |    (${graft.functions.ZOrder.sqlZValue16("a", "b")} >> 12) AS zbucket
         |  FROM d
         |)
         |SELECT CAST(zbucket AS BIGINT) AS zbucket,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(min(a) AS BIGINT) AS min_a, CAST(max(a) AS BIGINT) AS max_a,
         |  CAST(min(b) AS BIGINT) AS min_b, CAST(max(b) AS BIGINT) AS max_b
         |FROM z GROUP BY zbucket""".stripMargin) { (s, dir) =>
      import graft.functions.ZOrder
      val d = t(s, dir, "lineitem").select(
        col("l_partkey").bitwiseAND(lit(65535L)).as("a"),
        col("l_suppkey").bitwiseAND(lit(65535L)).as("b"))
      d.withColumn("zbucket", shiftright(ZOrder.zValue16(col("a"), col("b")), 12))
        .groupBy(col("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("a")).as("min_a"), max(col("a")).as("max_a"),
          min(col("b")).as("min_b"), max(col("b")).as("max_b"))
    },

    // ---- weighted sample without replacement (A-ES exponential race):
    // k docs per source, inclusion probability ∝ n_chars. The race key
    // is integer end to end — hash-micro uniform, floored micro-nat ln,
    // nano-resolution floor division — so both engines rank identically.
    QueryDef(
      "p42_weighted_sample",
      sqlWeightedSample) { (s, dir) =>
      Curation.weightedSample(t(s, dir, "documents"), WS_K)
    },

    // ---- sliding-window chunking: overlapping CHUNK_LEN-token windows
    // at CHUNK_STRIDE — the RAG/context-window pre-pass. Pure narrow
    // map + explode, zero shuffles; chunk count is closed-form integer
    // math so both engines enumerate identical windows.
    QueryDef(
      "p43_chunks",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS tokens FROM documents
         |), nt AS (
         |  SELECT doc_id, tokens, CAST(len(tokens) AS BIGINT) AS n_tok FROM toks
         |), ch AS (
         |  SELECT doc_id, tokens,
         |    CAST(unnest(range(0, 1 + greatest(0,
         |      (n_tok - $CHUNK_LEN + ${CHUNK_STRIDE - 1}) // $CHUNK_STRIDE)))
         |      AS BIGINT) AS chunk_id
         |  FROM nt
         |), sl AS (
         |  SELECT doc_id, chunk_id,
         |    CAST(chunk_id * $CHUNK_STRIDE AS BIGINT) AS start_tok,
         |    CAST(len(list_slice(tokens, chunk_id * $CHUNK_STRIDE + 1,
         |      chunk_id * $CHUNK_STRIDE + $CHUNK_LEN)) AS BIGINT) AS n_tok,
         |    array_to_string(list_slice(tokens, chunk_id * $CHUNK_STRIDE + 1,
         |      chunk_id * $CHUNK_STRIDE + $CHUNK_LEN), ' ') AS chunk_text
         |  FROM ch
         |)
         |SELECT doc_id, chunk_id, start_tok, n_tok, chunk_text,
         |  ${Hashing.sqlH60("chunk_text")} AS chunk_hash
         |FROM sl""".stripMargin) { (s, dir) =>
      TextAnalysis.chunk(t(s, dir, "documents"), CHUNK_LEN, CHUNK_STRIDE)
    },

    // ---- edit-distance similarity join (Ed-Join): fuzzy-match document
    // titles (first ED_TITLE_TOKS tokens) within Levenshtein ED_MAX,
    // with a PLANTED ground truth — every doc_id ≡ 0 (mod 3) also
    // contributes a copy with one hash-picked character deleted, so the
    // join provably finds each planted (original, perturbed) pair at
    // distance 1 alongside any natural near-matches. Candidate
    // generation (positional q-gram prefix + position + length filters)
    // is replayed identically by the oracle — the gate covers the whole
    // filter-verify pipeline, not just the DP.
    QueryDef(
      "p44_edit_join",
      s"""WITH $sqlEdPlantedCtes, pos0 AS (
         |  SELECT id, length(name) AS len,
         |    CAST(unnest(range(1, length(name) - ${ED_Q - 2})) AS INTEGER) AS i
         |  FROM rel WHERE length(name) >= $ED_Q
         |), post AS (
         |  SELECT p.id, p.len, p.i, substr(r.name, p.i, $ED_Q) AS g
         |  FROM pos0 p JOIN rel r USING (id)
         |), dfreq AS (
         |  SELECT g, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY g
         |), pre AS (
         |  SELECT id, len, i, g FROM (
         |    SELECT p.id, p.len, p.i, p.g,
         |      row_number() OVER (PARTITION BY p.id ORDER BY f.df, p.g, p.i) AS rk
         |    FROM post p JOIN dfreq f USING (g))
         |  WHERE rk <= ${ED_Q * ED_MAX + 1}
         |), cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM pre a JOIN pre b ON a.g = b.g AND a.id < b.id
         |    AND abs(a.i - b.i) <= $ED_MAX AND abs(a.len - b.len) <= $ED_MAX
         |)
         |SELECT c.id_a, c.id_b,
         |  CAST(levenshtein(ra.name, rb.name) AS BIGINT) AS dist
         |FROM cand c JOIN rel ra ON ra.id = c.id_a JOIN rel rb ON rb.id = c.id_b
         |WHERE levenshtein(ra.name, rb.name) <= $ED_MAX""".stripMargin) { (s, dir) =>
      Dedup.editDistanceJoin(edPlanted(s, dir), ED_MAX, ED_Q)
    },

    // ---- Ed-Join coverage counters surfaced (round 13 — VERDICT
    // round 12 #5): the SAME Observation attachment p44's join carries
    // (`n_no_grams` = strings too short to post any q-gram, silently
    // excluded; `n_below_exact` = strings where the prefix filter may
    // miss qualifying pairs), reported as a first-class one-row
    // relation over the SAME planted title corpus. The oracle
    // recomputes both counts directly, so this gates the Observation
    // plumbing's VALUES — a caller sizing q for short keys reads this
    // row, and the p44-at-scale artifacts carry it.
    QueryDef(
      "p50_edit_coverage",
      s"""WITH $sqlEdPlantedCtes
         |SELECT
         |  CAST(SUM(CASE WHEN length(name) < $ED_Q THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_no_grams,
         |  CAST(SUM(CASE WHEN length(name) <= ${ED_Q} * (${ED_MAX} + 1) - 1
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_below_exact
         |FROM rel""".stripMargin) { (s, dir) =>
      Dedup.editJoinCoverage(edPlanted(s, dir), ED_MAX, ED_Q)
    },

    // ---- near-dup-group-aware train/val/test split: the leakage-free
    // composition p15's splitAssign doc promises — split keyed on each
    // doc's dup-group CANONICAL member's content, so transitive
    // near-dup groups co-assign by construction (a near-copy of a
    // training doc can never land in test).
    QueryDef(
      "p45_group_split",
      s"""WITH RECURSIVE $sqlGroupCtes
         |SELECT g.doc_id, g.canonical_id,
         |  CASE WHEN ${Hashing.sqlH60("lower(r.text)")} % 100 < 80 THEN 'train'
         |       WHEN ${Hashing.sqlH60("lower(r.text)")} % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM grp g JOIN documents r ON r.doc_id = g.canonical_id""".stripMargin) {
      (s, dir) =>
        val docs = t(s, dir, "documents")
        val groups = Dedup.resolveDupGroups(docs,
          pairsCached(s, dir).filter(col("jaccard") >= DUP_T))
        TextAnalysis.groupSplitAssign(docs, groups)
    },

    // ---- CAPPED-postings Jaccard pairs — the actual 100 TB near-dup
    // route (VERDICT round 11 #4): shingles posted by more than CAP_DF
    // docs are dropped for CANDIDATE GENERATION (bounding every posting
    // list, hence the join fan-out, by a constant), while the Jaccard
    // itself is still computed over FULL shingle sets. Runs on the
    // 60-bit HASHED shingle keys (8-byte postings, long-array verify —
    // the same machinery as the p04 prefix path; the first string-array
    // cut measured 3x slower on array shipping alone). The oracle
    // replays the identical hashed df-cap selection deterministically,
    // so the gate covers the cap semantics end to end.
    QueryDef(
      "p46_capped_jaccard",
      s"""WITH $DOCS,
         |h60 AS (
         |  SELECT doc_id, list_transform(shingles, s -> ${Hashing.sqlH60("s")}) AS hs
         |  FROM sh
         |),
         |post AS (SELECT doc_id, unnest(hs) AS s FROM h60),
         |rare AS (SELECT s FROM post GROUP BY s HAVING count(*) <= $CAP_DF),
         |capped AS (SELECT p.doc_id, p.s FROM post p JOIN rare USING (s)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
         |)
         |SELECT id_a, id_b, j AS jaccard FROM (
         |  SELECT id_a, id_b,
         |    ${sqlJaccard("len(list_intersect(sa.hs, sb.hs))",
               "len(sa.hs)", "len(sb.hs)")} AS j
         |  FROM cand
         |  JOIN h60 sa ON sa.doc_id = id_a
         |  JOIN h60 sb ON sb.doc_id = id_b
         |) WHERE j >= $JACCARD_T""".stripMargin) { (s, dir) =>
      Dedup.jaccardPairsCapped(t(s, dir, "documents"), SHINGLE_N, JACCARD_T,
        maxPostings = CAP_DF)
    },

    // ---- REAL BMP decode (no stub): build an actual 24-bit BI_RGB BMP
    // per document (dims + pixel formula derived from the doc id), then
    // PARSE the bytes back — little-endian headers, bottom-up rows, BGR
    // order, 4-byte row padding — into geometry + two pixel checksums.
    // The oracle recomputes the formula directly; a hash match proves
    // the encode→decode round-trip is bit-exact, i.e. the codec
    // genuinely implements the format (the position×channel-weighted
    // checksum catches any order/padding/flip mistake).
    QueryDef(
      "p47_bmp_decode",
      s"""WITH d AS (
         |  SELECT doc_id, ${Hashing.sqlH60("CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents
         |), dims AS (
         |  SELECT doc_id, h, 2 + h % 8 AS w, 2 + (h // 8) % 8 AS hh FROM d
         |), px AS (
         |  SELECT doc_id, w, hh,
         |    ((h + 7 * x.x + 13 * y.y + 31 * c.c) % 256) AS v,
         |    ((y.y * w + x.x) * 3 + c.c + 1) AS wt
         |  FROM dims,
         |    UNNEST(range(0, w)) AS x(x),
         |    UNNEST(range(0, hh)) AS y(y),
         |    UNNEST(range(0, 3)) AS c(c)
         |)
         |SELECT doc_id AS asset_id,
         |  CAST(MIN(w) AS BIGINT) AS width, CAST(MIN(hh) AS BIGINT) AS height,
         |  CAST(54 + MIN(hh) * ((3 * MIN(w) + 3) // 4 * 4) AS BIGINT) AS n_bytes,
         |  CAST(SUM(v) AS BIGINT) AS px_sum,
         |  CAST(SUM(wt * v) AS BIGINT) AS px_wsum
         |FROM px GROUP BY doc_id""".stripMargin) { (s, dir) =>
      Multimodal.decodeBmpAssets(
        Multimodal.bmpAssetsFromDocuments(t(s, dir, "documents"))).toDF()
    },

    // ---- containment (asymmetric) similarity pairs — the quote/
    // excerpt detector Jaccard is blind to: C(A→B) = |A∩B|/|A| ≈ 1 for
    // a short doc embedded in a long one while Jaccard stays low. The
    // natural corpus has NO contained-but-not-Jaccard pairs (measured),
    // so the gate PLANTS them: every doc_id ≡ 0 (mod 4) with ≥ 12
    // tokens also contributes its first-8-token excerpt as a "quote"
    // doc — containment 1.0 by construction, Jaccard ≤ 6/n_sh. The
    // oracle replays planting + the hashed intersection counts, so the
    // asymmetric semantics are what the hash compare certifies.
    QueryDef(
      "p48_containment",
      s"""WITH $sqlContPlantedCtes,
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS c
         |  FROM post a JOIN post b ON a.s = b.s AND a.id < b.id
         |  GROUP BY 1, 2
         |)
         |$sqlContSelect""".stripMargin) { (s, dir) =>
      Dedup.containmentPairs(contPlanted(s, dir), SHINGLE_N, CONT_T)
    },

    // ---- capped containment (round 13 — VERDICT round 12 #3): the
    // SAME planted corpus and asymmetric semantics as p48, but
    // candidate generation runs on the p46 stop-shingle selection
    // (df ≤ cap) — the production route on a skewed corpus, where the
    // uncapped posting self-join is exactly the hazard the cap exists
    // for — and the intersection is then recomputed over FULL shingle
    // sets so neither direction deflates. The oracle replays capped
    // selection + full-set intersection; the subset-of-p48 and
    // short-side-survival properties are spec-pinned.
    QueryDef(
      "p49_containment_capped",
      s"""WITH $sqlContPlantedCtes,
         |rare AS (SELECT s FROM post GROUP BY s HAVING count(*) <= $CAP_DF),
         |capped AS (SELECT p.id, p.s FROM post p JOIN rare USING (s)),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM capped a JOIN capped b ON a.s = b.s AND a.id < b.id
         |),
         |inter AS (
         |  SELECT id_a, id_b, len(list_intersect(sa.hs, sb.hs)) AS c
         |  FROM cand
         |  JOIN h sa ON sa.id = id_a
         |  JOIN h sb ON sb.id = id_b
         |)
         |$sqlContSelect""".stripMargin) { (s, dir) =>
      Dedup.containmentPairs(contPlanted(s, dir), SHINGLE_N, CONT_T,
        maxPostings = Some(CAP_DF))
    },

    // ---- cross-document duplicate spans (exact-substring dedup, Lee
    // et al. 2022): positional L-gram postings -> grams in >= 2
    // distinct docs -> per-doc gaps-and-islands merge into maximal
    // spans. DuckDB replays the positional grams with zipped unnests
    // and the same window algebra; ends clamp to doc length.
    QueryDef(
      "p51_dup_spans",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS tokens FROM documents
         |), g AS (
         |  SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_words,
         |    CAST(unnest(range(1, greatest(len(tokens) - ${SPAN_L - 1}, 1) + 1))
         |      AS BIGINT) AS pos,
         |    unnest(list_transform(
         |      range(1, greatest(len(tokens) - ${SPAN_L - 1}, 1) + 1),
         |      i -> ${Hashing.sqlH60(
                 s"array_to_string(list_slice(tokens, i, i + ${SPAN_L - 1}), ' ')")}))
         |      AS h
         |  FROM toks
         |), dup AS (
         |  SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= $SPAN_MIN_DOCS
         |), dp AS (
         |  SELECT g.doc_id, g.n_words, g.pos FROM g JOIN dup USING (h)
         |), isl AS (
         |  SELECT doc_id, n_words, pos,
         |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
         |      <= $SPAN_L THEN 0 ELSE 1 END AS brk
         |  FROM dp
         |), isl2 AS (
         |  SELECT doc_id, n_words, pos,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM isl
         |), spans AS (
         |  SELECT doc_id, n_words, island, min(pos) AS s,
         |    least(max(pos) + ${SPAN_L - 1}, n_words) AS e
         |  FROM isl2 GROUP BY doc_id, n_words, island
         |), per_doc AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
         |    CAST(sum(e - s + 1) AS BIGINT) AS dup_words
         |  FROM spans GROUP BY doc_id
         |)
         |SELECT t.doc_id, t.n_words,
         |  coalesce(n_dup_spans, 0) AS n_dup_spans,
         |  coalesce(dup_words, 0) AS dup_words,
         |  CAST(coalesce(dup_words, 0) AS DOUBLE) / CAST(t.n_words AS DOUBLE)
         |    AS dup_frac
         |FROM (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_words FROM toks) t
         |LEFT JOIN per_doc USING (doc_id)""".stripMargin) { (s, dir) =>
      Dedup.dupSpans(t(s, dir, "documents"), SPAN_L, SPAN_MIN_DOCS)
    },

    // ---- temperature mixture at T=1/2: per-source share ∝ sqrt(n),
    // renormalized, capped at 1 — integer-exact via milli-precision
    // isqrt (floor(sqrt(n·10^6)) is bit-identical in any IEEE engine),
    // then the p38 hash-Bernoulli keep decision.
    QueryDef(
      "p52_temperature_mixture",
      s"""WITH cnt AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_source
         |  FROM documents GROUP BY source
         |), sm AS (
         |  SELECT source, n_source,
         |    CAST(floor(sqrt(CAST(n_source AS DOUBLE) * 1000000.0)) AS BIGINT)
         |      AS s_milli
         |  FROM cnt
         |), tot AS (
         |  SELECT CAST(sum(s_milli) AS BIGINT) AS sum_s,
         |    CAST(sum(n_source) AS BIGINT) AS n_total
         |  FROM sm
         |), rates AS (
         |  SELECT source, n_source,
         |    CAST(least(1000000,
         |      (1000000::HUGEINT * s_milli * n_total)
         |        // (1::HUGEINT * sum_s * n_source))
         |      AS BIGINT) AS rate_micro
         |  FROM sm CROSS JOIN tot
         |)
         |SELECT d.doc_id, d.source, r.n_source, r.rate_micro,
         |  (${Hashing.sqlH60("'tmix:' || CAST(d.doc_id AS VARCHAR)")} % 1000000)
         |    < r.rate_micro AS kept
         |FROM documents d JOIN rates r USING (source)""".stripMargin) { (s, dir) =>
      Curation.temperatureMixture(t(s, dir, "documents"))
    },

    // ---- duplicate-span CUT (p51's detect completed to Lee et al.
    // end-to-end): spans removed from every doc but the gram's min-id
    // keeper, text rebuilt relationally via position anti-join and
    // ordered re-assembly — replayed exactly in DuckDB.
    QueryDef(
      "p53_dup_span_cut",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS tokens FROM documents
         |), g AS (
         |  SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_words,
         |    CAST(unnest(range(1, greatest(len(tokens) - ${SPAN_L - 1}, 1) + 1))
         |      AS BIGINT) AS pos,
         |    unnest(list_transform(
         |      range(1, greatest(len(tokens) - ${SPAN_L - 1}, 1) + 1),
         |      i -> ${Hashing.sqlH60(
                 s"array_to_string(list_slice(tokens, i, i + ${SPAN_L - 1}), ' ')")}))
         |      AS h
         |  FROM toks
         |), keepers AS (
         |  SELECT h, CAST(min(doc_id) AS BIGINT) AS keeper
         |  FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= $SPAN_MIN_DOCS
         |), cut AS (
         |  SELECT g.doc_id, g.n_words, g.pos
         |  FROM g JOIN keepers USING (h) WHERE g.doc_id <> keepers.keeper
         |), isl AS (
         |  SELECT doc_id, n_words, pos,
         |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
         |      <= $SPAN_L THEN 0 ELSE 1 END AS brk
         |  FROM cut
         |), isl2 AS (
         |  SELECT doc_id, n_words, pos,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM isl
         |), spans AS (
         |  SELECT doc_id, n_words, island, min(pos) AS s,
         |    least(max(pos) + ${SPAN_L - 1}, n_words) AS e
         |  FROM isl2 GROUP BY doc_id, n_words, island
         |), covered AS (
         |  SELECT doc_id, CAST(unnest(range(s, e + 1)) AS BIGINT) AS i FROM spans
         |), tokpos AS (
         |  SELECT doc_id, CAST(unnest(range(1, len(tokens) + 1)) AS BIGINT) AS i,
         |    unnest(tokens) AS tok
         |  FROM toks
         |), kept AS (
         |  SELECT t.doc_id, t.i, t.tok
         |  FROM tokpos t LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.i = t.i
         |  WHERE c.i IS NULL
         |), reb AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |    array_to_string(list(tok ORDER BY i), ' ') AS text_cut
         |  FROM kept GROUP BY doc_id
         |)
         |SELECT t.doc_id, CAST(len(tokens) AS BIGINT) AS n_words,
         |  CAST(len(tokens) - coalesce(n_kept, 0) AS BIGINT) AS cut_words,
         |  coalesce(text_cut, '') AS text_cut
         |FROM toks t LEFT JOIN reb USING (doc_id)""".stripMargin) { (s, dir) =>
      Dedup.dupSpansCut(t(s, dir, "documents"), SPAN_L, SPAN_MIN_DOCS)
    },

    // ---- incremental (delta) dedup: batch docs gated against a standing
    // corpus — exact content-key semi-join + cross-side MinHash bucket
    // join + exact-Jaccard verify, best match per batch doc. Same sig/
    // bucket formulas as p05, restricted to batch×corpus pairs.
    QueryDef(
      "p54_incremental_dedup",
      sqlIncrementalDedup) { (s, dir) =>
      val docs = t(s, dir, "documents")
      Dedup.incrementalDedup(
        docs.filter(pmod(col("doc_id"), lit(INC_MOD)) =!= INC_REM),
        docs.filter(pmod(col("doc_id"), lit(INC_MOD)) === INC_REM),
        SHINGLE_N, MH_BANDS, MH_ROWS, MH_T)
    },

    // ---- deterministic global training shuffle: salted id-hash order,
    // hash-mod shard, rank within shard — the reproducible shard layout
    // a trainer streams.
    QueryDef(
      "p55_shuffle_shards",
      s"""WITH h AS (
         |  SELECT doc_id,
         |    ${Hashing.sqlH60("'shuf:' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents
         |)
         |SELECT doc_id, h % $SHUF_SHARDS AS shard,
         |  CAST(row_number() OVER (PARTITION BY h % $SHUF_SHARDS
         |    ORDER BY h, doc_id) AS BIGINT) AS shard_pos
         |FROM h""".stripMargin) { (s, dir) =>
      Curation.shuffleShards(t(s, dir, "documents"), SHUF_SHARDS.toInt)
    },

    // ---- CCNet-style per-source quality buckets: unigram-LM score
    // (integer micro-nats per token, true floor division) split into
    // head/middle/tail thirds by per-source histogram thresholds.
    QueryDef(
      "p56_ccnet_buckets",
      s"""WITH toksx AS (
         |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
         |  FROM documents
         |), freq AS (
         |  SELECT w, count(*) AS cnt FROM toksx GROUP BY w
         |), tot AS (SELECT sum(cnt) AS tot FROM freq),
         |ws AS (
         |  SELECT w,
         |    CAST(floor(ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
         |      * 1000000) AS BIGINT) AS lp
         |  FROM freq CROSS JOIN tot
         |), per AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(lp) AS BIGINT) AS lps
         |  FROM toksx JOIN ws USING (w) GROUP BY doc_id
         |), scored AS (
         |  SELECT p.doc_id, d.source,
         |    CAST((lps - (((lps % n_tokens) + n_tokens) % n_tokens))
         |      // n_tokens AS BIGINT) AS score_micro
         |  FROM per p JOIN documents d USING (doc_id)
         |), hist AS (
         |  SELECT source, score_micro, count(*) AS c
         |  FROM scored GROUP BY source, score_micro
         |), cum AS (
         |  SELECT source, score_micro,
         |    sum(c) OVER (PARTITION BY source ORDER BY score_micro DESC)
         |      AS cum,
         |    sum(c) OVER (PARTITION BY source) AS n
         |  FROM hist
         |), thr AS (
         |  SELECT source,
         |    max(CASE WHEN cum >= (n + 2) // 3 THEN score_micro END)
         |      AS t_head,
         |    max(CASE WHEN cum >= (2 * n + 2) // 3 THEN score_micro END)
         |      AS t_mid
         |  FROM cum GROUP BY source
         |)
         |SELECT s.doc_id, s.source, s.score_micro,
         |  CASE WHEN s.score_micro >= t.t_head THEN 'head'
         |       WHEN s.score_micro >= t.t_mid THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM scored s JOIN thr t USING (source)""".stripMargin) { (s, dir) =>
      Curation.ccnetBuckets(t(s, dir, "documents"), LM_MIN_COUNT)
    },

    // ---- per-source quality cap (FineWeb-style domain limit): keep the
    // TOPK_PER_SOURCE highest-LM-score docs per source; the rank filter
    // plans as WindowGroupLimit (PlanSpec-pinned) so a giant domain
    // ships k rows per partition, not its whole posting.
    QueryDef(
      "p58_source_topk",
      s"""WITH toksx AS (
         |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
         |  FROM documents
         |), freq AS (
         |  SELECT w, count(*) AS cnt FROM toksx GROUP BY w
         |), tot AS (SELECT sum(cnt) AS tot FROM freq),
         |ws AS (
         |  SELECT w,
         |    CAST(floor(ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
         |      * 1000000) AS BIGINT) AS lp
         |  FROM freq CROSS JOIN tot
         |), per AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(lp) AS BIGINT) AS lps
         |  FROM toksx JOIN ws USING (w) GROUP BY doc_id
         |), scored AS (
         |  SELECT p.doc_id, d.source,
         |    CAST((lps - (((lps % n_tokens) + n_tokens) % n_tokens))
         |      // n_tokens AS BIGINT) AS score_micro
         |  FROM per p JOIN documents d USING (doc_id)
         |)
         |SELECT doc_id, source, score_micro, rank FROM (
         |  SELECT doc_id, source, score_micro,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank
         |  FROM scored
         |) WHERE rank <= $TOPK_PER_SOURCE""".stripMargin) { (s, dir) =>
      Curation.sourceTopK(t(s, dir, "documents"), TOPK_PER_SOURCE,
        LM_MIN_COUNT)
    },

    // ---- contamination SPANS: where exactly the benchmark leaks into
    // each training doc — benchmark-gram semi-join + island merge, the
    // positional decontamination signal (p19 gives the fraction, p57
    // the cuttable regions). Same p19 split: benchmark = doc_id%20==0.
    QueryDef(
      "p57_contamination_spans",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS tokens FROM documents
         |), g AS (
         |  SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_words,
         |    CAST(unnest(range(1, greatest(len(tokens) - ${CONTAM_SPAN_L - 1}, 1) + 1))
         |      AS BIGINT) AS pos,
         |    unnest(list_transform(
         |      range(1, greatest(len(tokens) - ${CONTAM_SPAN_L - 1}, 1) + 1),
         |      i -> ${Hashing.sqlH60(
                 s"array_to_string(list_slice(tokens, i, i + ${CONTAM_SPAN_L - 1}), ' ')")}))
         |      AS h
         |  FROM toks
         |), bench AS (
         |  SELECT DISTINCT h FROM g WHERE doc_id % 20 = 0
         |), hits AS (
         |  SELECT g.doc_id, g.n_words, g.pos
         |  FROM g JOIN bench USING (h) WHERE g.doc_id % 20 <> 0
         |), isl AS (
         |  SELECT doc_id, n_words, pos,
         |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
         |      <= $CONTAM_SPAN_L THEN 0 ELSE 1 END AS brk
         |  FROM hits
         |), isl2 AS (
         |  SELECT doc_id, n_words, pos,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM isl
         |), spans AS (
         |  SELECT doc_id, n_words, island, min(pos) AS s,
         |    least(max(pos) + ${CONTAM_SPAN_L - 1}, n_words) AS e
         |  FROM isl2 GROUP BY doc_id, n_words, island
         |), per_doc AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contam_spans,
         |    CAST(sum(e - s + 1) AS BIGINT) AS contam_words
         |  FROM spans GROUP BY doc_id
         |)
         |SELECT t.doc_id, t.n_words,
         |  coalesce(n_contam_spans, 0) AS n_contam_spans,
         |  coalesce(contam_words, 0) AS contam_words,
         |  CAST(coalesce(contam_words, 0) AS DOUBLE) / CAST(t.n_words AS DOUBLE)
         |    AS contam_frac
         |FROM (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_words
         |      FROM toks WHERE doc_id % 20 <> 0) t
         |LEFT JOIN per_doc USING (doc_id)""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      Curation.contaminationSpans(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0), CONTAM_SPAN_L)
    },

    // ---- contamination span CUT (p57's detect completed to the
    // decontamination a Curate run executes): the leaked regions are
    // REMOVED from every corpus doc and the text rebuilt relationally —
    // p53's rebuild over p57's benchmark-gram flag set, replayed
    // end to end in DuckDB. Same p19 split: benchmark = doc_id%20==0.
    QueryDef(
      "p59_contam_span_cut",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS tokens FROM documents
         |), g AS (
         |  SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_words,
         |    CAST(unnest(range(1, greatest(len(tokens) - ${CONTAM_SPAN_L - 1}, 1) + 1))
         |      AS BIGINT) AS pos,
         |    unnest(list_transform(
         |      range(1, greatest(len(tokens) - ${CONTAM_SPAN_L - 1}, 1) + 1),
         |      i -> ${Hashing.sqlH60(
               s"array_to_string(list_slice(tokens, i, i + ${CONTAM_SPAN_L - 1}), ' ')")}))
         |      AS h
         |  FROM toks
         |), bench AS (
         |  SELECT DISTINCT h FROM g WHERE doc_id % 20 = 0
         |), hits AS (
         |  SELECT g.doc_id, g.n_words, g.pos
         |  FROM g JOIN bench USING (h) WHERE g.doc_id % 20 <> 0
         |), isl AS (
         |  SELECT doc_id, n_words, pos,
         |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
         |      <= $CONTAM_SPAN_L THEN 0 ELSE 1 END AS brk
         |  FROM hits
         |), isl2 AS (
         |  SELECT doc_id, n_words, pos,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM isl
         |), spans AS (
         |  SELECT doc_id, island, min(pos) AS s,
         |    least(max(pos) + ${CONTAM_SPAN_L - 1}, n_words) AS e
         |  FROM isl2 GROUP BY doc_id, n_words, island
         |), covered AS (
         |  SELECT doc_id, CAST(unnest(range(s, e + 1)) AS BIGINT) AS i FROM spans
         |), tokpos AS (
         |  SELECT doc_id, CAST(unnest(range(1, len(tokens) + 1)) AS BIGINT) AS i,
         |    unnest(tokens) AS tok
         |  FROM toks WHERE doc_id % 20 <> 0
         |), kept AS (
         |  SELECT t.doc_id, t.i, t.tok
         |  FROM tokpos t LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.i = t.i
         |  WHERE c.i IS NULL
         |), reb AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |    array_to_string(list(tok ORDER BY i), ' ') AS text_cut
         |  FROM kept GROUP BY doc_id
         |)
         |SELECT t.doc_id, CAST(len(tokens) AS BIGINT) AS n_words,
         |  CAST(len(tokens) - coalesce(n_kept, 0) AS BIGINT) AS cut_words,
         |  coalesce(text_cut, '') AS text_cut
         |FROM toks t LEFT JOIN reb USING (doc_id)
         |WHERE t.doc_id % 20 <> 0""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      Curation.contaminationSpansCut(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0), CONTAM_SPAN_L)
    },

    // ---- audio decode (round 14 — the multimodal family's audio
    // modality, same real-bytes rigor as p47's BMP): one mono PCM16 WAV
    // per doc with planted geometry + sample formula; Spark must
    // recover sample rate, count, and the loudness/order/noisiness
    // stats from genuine RIFF bytes while the oracle replays the
    // formula — a hash match certifies the 44-byte layout, LE16 sign
    // extension, and sample order end to end.
    QueryDef(
      "p60_wav_decode",
      s"""WITH $sqlWavSamplesCtes, z AS (
         |  SELECT doc_id, n, sr, i, v,
         |    CASE WHEN i > 0 AND (v < 0) <>
         |      (lag(v) OVER (PARTITION BY doc_id ORDER BY i) < 0)
         |      THEN 1 ELSE 0 END AS zc
         |  FROM s
         |)
         |SELECT doc_id AS asset_id,
         |  CAST(MIN(sr) AS BIGINT) AS sample_rate,
         |  CAST(MIN(n) AS BIGINT) AS n_samples,
         |  CAST(44 + 2 * MIN(n) AS BIGINT) AS n_bytes,
         |  CAST(SUM(v) AS BIGINT) AS s_sum,
         |  CAST(SUM(abs(v)) AS BIGINT) AS s_abs_sum,
         |  CAST(SUM((i + 1) * v) AS BIGINT) AS s_wsum,
         |  CAST(MAX(abs(v)) AS BIGINT) AS peak,
         |  CAST(SUM(zc) AS BIGINT) AS zero_crossings
         |FROM z GROUP BY doc_id""".stripMargin) { (s, dir) =>
      Multimodal.decodeWavAssets(
        Multimodal.wavAssetsFromDocuments(t(s, dir, "documents"))).toDF()
    },

    // ---- audio frame features (round 14): the clip windowed into
    // fixed 8-sample frames — per-frame integer energy (sum of squares)
    // and within-frame zero crossings, short tail frame included. The
    // frame matrix is what a speech/quality model consumes; the oracle
    // replays the windowing arithmetic over the same planted samples.
    QueryDef(
      "p61_wav_frames",
      s"""WITH $sqlWavSamplesCtes, f AS (
         |  SELECT doc_id, i // $WAV_FRAME_LEN AS frame_idx,
         |    i % $WAV_FRAME_LEN AS j, v
         |  FROM s
         |), zf AS (
         |  SELECT doc_id, frame_idx, j, v,
         |    CASE WHEN j > 0 AND (v < 0) <>
         |      (lag(v) OVER (PARTITION BY doc_id, frame_idx ORDER BY j) < 0)
         |      THEN 1 ELSE 0 END AS zc
         |  FROM f
         |)
         |SELECT doc_id AS asset_id, CAST(frame_idx AS BIGINT) AS frame_idx,
         |  CAST(count(*) AS BIGINT) AS n_in_frame,
         |  CAST(SUM(v * v) AS BIGINT) AS energy,
         |  CAST(SUM(zc) AS BIGINT) AS zero_crossings
         |FROM zf GROUP BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
      Multimodal.wavFrameFeatures(
        Multimodal.wavAssetsFromDocuments(t(s, dir, "documents")),
        WAV_FRAME_LEN).toDF()
    },

    // ---- video frame sampling (round 14 — the third modality): one
    // GVF1 container of 2..6 planted BMP frames per doc; every
    // stride-2 frame is demux-SEEKED to (other frames' pixels never
    // parsed) and really decoded — geometry + the position-weighted
    // checksum of exactly the sampled frames' pixels. The oracle
    // replays the per-frame formula in closed form, so container
    // directory walking, frame addressing, and the BMP decode of each
    // sampled frame are all certified by the hash.
    QueryDef(
      "p62_video_frame_sample",
      s"""WITH d AS (
         |  SELECT doc_id, ${Hashing.sqlH60("CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents
         |), dims AS (
         |  SELECT doc_id, h, 2 + h % 8 AS w, 2 + (h // 8) % 8 AS hh,
         |    2 + h % 5 AS nf
         |  FROM d
         |), fr AS (
         |  SELECT doc_id, h, w, hh, f.f AS f
         |  FROM dims, UNNEST(range(0, nf)) AS f(f)
         |  WHERE f.f % $VID_STRIDE = 0
         |), px AS (
         |  SELECT doc_id, f, w, hh,
         |    ((h + 131 * (f + 1) + 7 * x.x + 13 * y.y + 31 * c.c) % 256) AS v,
         |    ((y.y * w + x.x) * 3 + c.c + 1) AS wt
         |  FROM fr,
         |    UNNEST(range(0, w)) AS x(x),
         |    UNNEST(range(0, hh)) AS y(y),
         |    UNNEST(range(0, 3)) AS c(c)
         |)
         |SELECT doc_id AS asset_id, CAST(f AS BIGINT) AS frame_idx,
         |  CAST(MIN(w) AS BIGINT) AS width, CAST(MIN(hh) AS BIGINT) AS height,
         |  CAST(SUM(v) AS BIGINT) AS px_sum,
         |  CAST(SUM(wt * v) AS BIGINT) AS px_wsum
         |FROM px GROUP BY doc_id, f""".stripMargin) { (s, dir) =>
      Multimodal.sampleVideoFrames(
        Multimodal.vidAssetsFromDocuments(t(s, dir, "documents")),
        VID_STRIDE).toDF()
    },

    // ---- BPE tokenizer training (round 15): the full distributed
    // merge loop — word-frequency pass, then BPE_MERGES rounds of
    // (pair-count aggregate, deterministic argmax, greedy merge) — with
    // the ENTIRE merge table replayed by the oracle as an unrolled
    // materialized CTE chain, so ranks, pairs, AND weighted counts must
    // match round for round. The engine's training state is
    // vocabulary-sized after the first pass; so is the oracle's.
    QueryDef(
      "p63_bpe_vocab",
      sqlBpeChain(BPE_MERGES) +
        (1 to BPE_MERGES).map(k =>
            s"SELECT CAST($k AS BIGINT) AS rank, a AS lhs, b AS rhs, " +
              s"a||b AS merged, cnt AS pair_count FROM b$k")
          .mkString("\nSELECT rank, lhs, rhs, merged, pair_count FROM (\n",
            "\nUNION ALL\n", "\n)")) { (s, dir) =>
      Bpe.mergesDF(s, Bpe.train(t(s, dir, "documents"), BPE_MERGES))
    },

    // ---- corpus-trained char-3-gram Naive Bayes language classifier
    // (round 15): distant supervision from the stopword heuristic
    // bootstraps per-label Laplace-smoothed gram log-likelihoods in
    // integer micro-nats (the p27 fixed-point policy); every doc is
    // re-classified by full-character argmax. Model is vocab × labels —
    // broadcast-sized at any corpus scale. Oracle replays training AND
    // classification; ties (score desc, label asc). Round 16 (VERDICT
    // ask #2): the model is trained + persisted ONCE per session
    // (stageOnce — the s16 standing-artifact pattern) and every
    // execution classifies against the persisted model, so the bench
    // row prices CLASSIFICATION (the recurring per-corpus cost), not
    // re-training; output is identical by construction (the heuristic
    // labels and the trainer are deterministic).
    QueryDef(
      "p64_lang_nb",
      s"""WITH t AS (
         |  SELECT doc_id, lower(text) AS tx,
         |    string_split(lower(text), ' ') AS tokens
         |  FROM documents
         |), lab AS (
         |  SELECT doc_id,
         |    CASE WHEN CAST(len(list_filter(tokens, w ->
         |        list_contains($STOPLIST, w))) AS DOUBLE)
         |      / CAST(len(tokens) AS DOUBLE) >= 0.04
         |    THEN 'en' ELSE 'und' END AS label
         |  FROM t
         |), dg AS (
         |  SELECT doc_id, substr(tx, i, 3) AS gram,
         |    CAST(count(*) AS BIGINT) AS occ
         |  FROM t, UNNEST(range(1, length(tx) - 1)) AS u(i)
         |  GROUP BY 1, 2
         |), gl AS (
         |  SELECT g.gram, l.label, CAST(SUM(g.occ) AS BIGINT) AS cnt
         |  FROM dg g JOIN lab l USING (doc_id) GROUP BY 1, 2
         |), labs AS (SELECT DISTINCT label FROM lab),
         |tot AS (SELECT label, CAST(SUM(cnt) AS BIGINT) AS tot FROM gl
         |        GROUP BY label),
         |voc AS (SELECT CAST(count(DISTINCT gram) AS BIGINT) AS v FROM dg),
         |dense AS (
         |  SELECT vg.gram, ls.label,
         |    CAST(floor(ln(CAST(COALESCE(gl.cnt, 0) + 1 AS DOUBLE)
         |      / CAST(COALESCE(tt.tot, 0) + voc.v AS DOUBLE)) * 1000000)
         |      AS BIGINT) AS lp
         |  FROM (SELECT DISTINCT gram FROM dg) vg
         |  CROSS JOIN labs ls CROSS JOIN voc
         |  LEFT JOIN tot tt ON tt.label = ls.label
         |  LEFT JOIN gl ON gl.gram = vg.gram AND gl.label = ls.label
         |), ds AS (
         |  SELECT g.doc_id, d.label, CAST(SUM(g.occ * d.lp) AS BIGINT) AS gsum
         |  FROM dg g JOIN dense d USING (gram) GROUP BY 1, 2
         |), nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lab),
         |pri AS (
         |  SELECT label,
         |    CAST(floor(ln(CAST(count(*) AS DOUBLE) / CAST(n AS DOUBLE))
         |      * 1000000) AS BIGINT) AS lp0
         |  FROM lab CROSS JOIN nd GROUP BY label, n
         |)
         |SELECT doc_id, label, CAST(score_micro AS BIGINT) AS score_micro
         |FROM (
         |  SELECT t.doc_id, p.label,
         |    p.lp0 + COALESCE(ds.gsum, 0) AS score_micro,
         |    row_number() OVER (PARTITION BY t.doc_id
         |      ORDER BY p.lp0 + COALESCE(ds.gsum, 0) DESC, p.label) AS rk
         |  FROM t CROSS JOIN pri p
         |  LEFT JOIN ds ON ds.doc_id = t.doc_id AND ds.label = p.label
         |) WHERE rk = 1""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val modelDir = SourceMlQueries.scratch(dir, "p64_model")
      SourceMlQueries.stageOnce(modelDir) {
        val labels = docs.select(col("doc_id"),
          TextAnalysis.languageId(col("text")).as("label"))
        LangNb.saveModel(LangNb.train(docs, labels), 3, modelDir)
      }
      LangNb.classifyPersisted(docs, modelDir)
    },

    // ---- token-grain sequence packing: p20's concatenate-then-chunk
    // packing re-keyed in BPE subword tokens (context windows are
    // token-denominated in every real pretraining pipeline). The token
    // counts come from the trained merge table via the distinct-word
    // replay; the oracle re-trains the same table and re-derives the
    // same counts from the round-R state, then replays the packing
    // window — bins, doc counts, and token totals all hash-gated.
    QueryDef(
      "p65_bpe_pack",
      sqlBpeChain(BPE_MERGES) + sqlBpeWordToks(BPE_MERGES) +
        s""", occ AS (
           |  SELECT doc_id, word FROM (
           |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
           |    FROM documents
           |  ) WHERE word <> ''
           |), dtc AS (
           |  SELECT doc_id, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
           |  FROM occ JOIN wt USING (word) GROUP BY doc_id
           |), td AS (
           |  SELECT d.source AS shard, d.doc_id, c.n_tokens
           |  FROM documents d JOIN dtc c USING (doc_id)
           |), off AS (
           |  SELECT shard, doc_id, n_tokens,
           |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
           |      ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS start_offset
           |  FROM td
           |)
           |SELECT shard, CAST(start_offset // $BPE_PACK_BUDGET AS BIGINT) AS bin,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
           |FROM off GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      val merges = bpeMergesCached(s, dir)
      val base = docs.select(col("source").as("shard"), col("doc_id"))
        .join(Bpe.docTokenCounts(docs, merges), Seq("doc_id"))
        .select(col("shard"), col("doc_id"), col("n_tokens"))
      Curation.packSequencesFrom(base, BPE_PACK_BUDGET)
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
    },

    // ---- token-budget chunking: p43's fixed-WORD-window chunking
    // re-keyed in BPE tokens — each word goes to the chunk its start
    // token offset falls in (the packSequences straddle convention),
    // chunk text rebuilt in word order. Window partitions by doc_id
    // (bounded by the longest doc, never the corpus).
    QueryDef(
      "p66_bpe_chunks",
      sqlBpeChain(BPE_MERGES) + sqlBpeWordToks(BPE_MERGES) +
        s""", pos AS (
           |  SELECT doc_id, i - 1 AS pos, words[i] AS word
           |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS words
           |        FROM documents),
           |    UNNEST(range(1, len(words) + 1)) AS u(i)
           |  WHERE words[i] <> ''
           |), wtok AS (
           |  SELECT p.doc_id, p.pos, p.word, wt.n_tok
           |  FROM pos p JOIN wt USING (word)
           |), cum AS (
           |  SELECT doc_id, pos, word, n_tok,
           |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY doc_id ORDER BY pos
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS start_tok
           |  FROM wtok
           |)
           |SELECT doc_id, CAST(start_tok // $BPE_CHUNK_BUDGET AS BIGINT) AS chunk_id,
           |  CAST(count(*) AS BIGINT) AS n_words,
           |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           |  string_agg(word, ' ' ORDER BY pos) AS chunk_text
           |FROM cum GROUP BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      Bpe.chunkByTokenBudget(docs, bpeMergesCached(s, dir),
        BPE_CHUNK_BUDGET)
    },

    // ---- BPE token-id SEQUENCE export (round 15): the relation a
    // training exporter actually ships — one row per subword token with
    // a deterministic integer vocabulary (corpus chars sorted, then
    // </w>, then merges by rank; same-surface symbols share the min id).
    // The oracle re-trains the merge table, re-derives every word's
    // segmentation from the round-R state, and replays the id
    // assignment + per-doc position numbering.
    QueryDef(
      "p67_bpe_encode",
      sqlBpeChain(BPE_MERGES) + sqlBpeEncode(BPE_MERGES) +
        "\nSELECT doc_id, pos, token, token_id FROM enc") { (s, dir) =>
      val docs = t(s, dir, "documents")
      Bpe.encode(docs, bpeMergesCached(s, dir))
    },

    // ---- bigram LM quality with stupid backoff (round 15): p27's
    // unigram score graduated to the n-gram grain web-scale filters
    // actually use (Brants et al. 2007 — no held-out tuning). Bigrams
    // pruned below BIGRAM_MIN score through the backoff branch
    // (ln(0.4) quantized ONCE driver-side, interpolated into BOTH
    // engines as the same integer literal). Integer micro-nats before
    // summation — order-independent, bit-exact.
    QueryDef(
      "p68_bigram_lm",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
         |), bi AS (
         |  SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
         |  FROM toks, UNNEST(range(1, len(ts))) AS u(i)
         |), uni AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM (
         |    SELECT unnest(ts) AS w FROM toks
         |  ) GROUP BY w
         |), tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS t FROM uni),
         |big AS (
         |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bi
         |  GROUP BY 1, 2 HAVING count(*) >= $BIGRAM_MIN
         |), lp2 AS (
         |  SELECT b.w1, b.w2,
         |    CAST(floor(ln(CAST(b.c2 AS DOUBLE) / CAST(u.c1 AS DOUBLE))
         |      * 1000000) AS BIGINT) AS lp2
         |  FROM big b JOIN uni u ON u.w = b.w1
         |), lp1 AS (
         |  SELECT w AS w2,
         |    CAST(floor(ln(CAST(c1 AS DOUBLE) / CAST(t AS DOUBLE))
         |      * 1000000) AS BIGINT) AS lp1
         |  FROM uni CROSS JOIN tot
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(SUM(lp) AS BIGINT) AS lp2_micro_sum,
         |  CAST(SUM(lp) AS DOUBLE) / count(*) AS mean_lp2_micro,
         |  CAST(SUM(backoff) AS BIGINT) AS n_backoff,
         |  CAST(SUM(backoff) AS DOUBLE) / count(*) AS backoff_frac
         |FROM (
         |  SELECT bi.doc_id,
         |    COALESCE(lp2.lp2, lp1.lp1 + ${TextAnalysis.StupidBackoffMicro})
         |      AS lp,
         |    CASE WHEN lp2.lp2 IS NULL THEN 1 ELSE 0 END AS backoff
         |  FROM bi
         |  LEFT JOIN lp2 ON lp2.w1 = bi.w1 AND lp2.w2 = bi.w2
         |  JOIN lp1 ON lp1.w2 = bi.w2
         |) GROUP BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.bigramQuality(t(s, dir, "documents"), BIGRAM_MIN)
    },

    // ---- cross-document duplicate TOKEN spans (round 16, VERDICT ask
    // #6): p51's exact-substring detector at the grain Lee et al.
    // actually operate on — token sequences from the BPE encode
    // relation. The oracle replays training, the token-id encode, AND
    // the token-gram postings + island algebra end to end; the engine
    // side is the same mergeIslands machinery over per-doc token-id
    // arrays (bounded by the longest document, never the corpus).
    QueryDef(
      "p69_dup_token_spans",
      sqlBpeChain(BPE_MERGES) + sqlBpeEncode(BPE_MERGES) + sqlTokenGrams +
        s""", dupg AS (
           |  SELECT h FROM tg GROUP BY h
           |  HAVING count(DISTINCT doc_id) >= $SPAN_MIN_DOCS
           |), dp AS (
           |  SELECT tg.doc_id, tg.n_tokens, tg.pos FROM tg JOIN dupg USING (h)
           |), isl AS (
           |  SELECT doc_id, n_tokens, pos,
           |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
           |      <= $TOK_SPAN_L THEN 0 ELSE 1 END AS brk
           |  FROM dp
           |), isl2 AS (
           |  SELECT doc_id, n_tokens, pos,
           |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
           |  FROM isl
           |), spans AS (
           |  SELECT doc_id, n_tokens, island, min(pos) AS s,
           |    least(max(pos) + ${TOK_SPAN_L - 1}, n_tokens) AS e
           |  FROM isl2 GROUP BY doc_id, n_tokens, island
           |), per_doc AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
           |    CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
           |  FROM spans GROUP BY doc_id
           |)
           |SELECT a.doc_id, a.n_tokens,
           |  coalesce(n_dup_spans, 0) AS n_dup_spans,
           |  coalesce(dup_tokens, 0) AS dup_tokens,
           |  CAST(coalesce(dup_tokens, 0) AS DOUBLE) / CAST(a.n_tokens AS DOUBLE)
           |    AS dup_frac
           |FROM arr a LEFT JOIN per_doc USING (doc_id)""".stripMargin) { (s, dir) =>
      Dedup.dupTokenSpans(bpeEncodedCached(s, dir), TOK_SPAN_L,
        SPAN_MIN_DOCS)
    },

    // ---- token-grain duplicate-span CUT (round 17, VERDICT ask #1):
    // p69's detect completed to the Lee-et-al. end-to-end at the TOKEN
    // grain — duplicated token spans removed from every non-keeper doc
    // and the token SEQUENCE rebuilt with dense per-doc renumbering.
    // The oracle replays training, encode, the token-gram keeper
    // election, the island merge, the covered-position anti-join, AND
    // the renumber — the full cut, not a summary of it.
    QueryDef(
      "p70_dup_token_span_cut",
      sqlBpeChain(BPE_MERGES) + sqlBpeEncode(BPE_MERGES) + sqlTokenGrams +
        s""", keepers AS (
           |  SELECT h, CAST(min(doc_id) AS BIGINT) AS keeper
           |  FROM tg GROUP BY h
           |  HAVING count(DISTINCT doc_id) >= $SPAN_MIN_DOCS
           |), cuttable AS (
           |  SELECT tg.doc_id, tg.n_tokens, tg.pos
           |  FROM tg JOIN keepers USING (h) WHERE tg.doc_id <> keepers.keeper
           |), isl AS (
           |  SELECT doc_id, n_tokens, pos,
           |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
           |      <= $TOK_SPAN_L THEN 0 ELSE 1 END AS brk
           |  FROM cuttable
           |), isl2 AS (
           |  SELECT doc_id, n_tokens, pos,
           |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
           |  FROM isl
           |), spans AS (
           |  SELECT doc_id, island, min(pos) AS s,
           |    least(max(pos) + ${TOK_SPAN_L - 1}, n_tokens) AS e
           |  FROM isl2 GROUP BY doc_id, n_tokens, island
           |), covered AS (
           |  SELECT doc_id, CAST(unnest(range(s, e + 1)) AS BIGINT) AS i
           |  FROM spans
           |), kept AS (
           |  SELECT en.doc_id, en.pos + 1 AS i, en.token_id
           |  FROM enc en LEFT JOIN covered c
           |    ON c.doc_id = en.doc_id AND c.i = en.pos + 1
           |  WHERE c.i IS NULL
           |)
           |SELECT doc_id,
           |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1
           |    AS BIGINT) AS pos,
           |  token_id
           |FROM kept""".stripMargin) { (s, dir) =>
      Dedup.dupTokenSpansCut(bpeEncodedCached(s, dir), TOK_SPAN_L,
        SPAN_MIN_DOCS)
    }
  )

  /** The p42 A-ES weighted-sample oracle, shared VERBATIM by the
    * streaming twin (s13): a per-group bottom-k of the integer race
    * keys is order-free (same min-merge law as p31/s12), so streaming
    * == batch EXACTLY and one SQL gates both.
    */
  private[queries] def sqlWeightedSample: String =
    s"""WITH keyed AS (
       |  SELECT source AS "group", doc_id, CAST(n_chars AS BIGINT) AS weight,
       |    (${Hashing.sqlH60("'ws:' || CAST(doc_id AS VARCHAR)")} % 1000000) + 1
       |      AS u_micro
       |  FROM documents
       |), raced AS (
       |  SELECT "group", doc_id, weight,
       |    (CAST(floor(-ln(CAST(u_micro AS DOUBLE) / 1000000.0) * 1000000.0)
       |       AS BIGINT) * 1000000) // weight AS race_nano
       |  FROM keyed
       |)
       |SELECT "group", doc_id, weight,
       |  CAST(row_number() OVER (
       |    PARTITION BY "group" ORDER BY race_nano, doc_id) AS BIGINT)
       |    AS samp_rank
       |FROM raced QUALIFY samp_rank <= $WS_K""".stripMargin

  /** The p54 incremental-dedup oracle, shared VERBATIM by the
    * streaming twin (s15): the stream-static key/bucket joins are
    * stateless, so the drained candidate/exact sets equal the batch
    * operator's for any arrival order, and the post-drain verify is
    * the same [[graft.pipeline.Dedup.incrementalVerdicts]] stage —
    * streaming == batch EXACTLY and one SQL gates both.
    */
  private[queries] def sqlIncrementalDedup: String =
    s"""WITH $DOCS,
         |sigs AS (
         |  SELECT doc_id, shingles, n_sh,
         |    list_transform(range(0, ${MH_BANDS * MH_ROWS}), i ->
         |      CAST(list_min(list_transform(hs, x ->
         |        (((506952114 * (i + 1)) % ${Hashing.P}) * x + 10007*i + 17) % ${Hashing.P})) AS BIGINT)) AS sig
         |  FROM hsh
         |),
         |buckets AS (
         |  SELECT doc_id, CAST(j AS BIGINT) AS band,
         |    CAST(sig[CAST(2*j+1 AS INT)] AS VARCHAR) || ',' ||
         |    CAST(sig[CAST(2*j+2 AS INT)] AS VARCHAR) AS bucket
         |  FROM sigs, range(0, $MH_BANDS) t(j)
         |),
         |cand AS (
         |  SELECT DISTINCT b.doc_id AS id_b, c.doc_id AS id_c
         |  FROM buckets b JOIN buckets c
         |    ON b.band = c.band AND b.bucket = c.bucket
         |  WHERE b.doc_id % $INC_MOD = $INC_REM
         |    AND c.doc_id % $INC_MOD <> $INC_REM
         |),
         |ver AS (
         |  SELECT id_b, id_c,
         |    ${sqlJaccard("len(list_intersect(sb.shingles, sc.shingles))",
                "sb.n_sh", "sc.n_sh")} AS j
         |  FROM cand
         |  JOIN hsh sb ON sb.doc_id = id_b
         |  JOIN hsh sc ON sc.doc_id = id_c
         |),
         |best AS (
         |  SELECT id_b, id_c, j,
         |    row_number() OVER (PARTITION BY id_b ORDER BY j DESC, id_c) AS rn
         |  FROM ver WHERE j >= $MH_T
         |),
         |ck AS (
         |  SELECT DISTINCT ${Hashing.sqlH60("lower(text)")} AS k
         |  FROM documents WHERE doc_id % $INC_MOD <> $INC_REM
         |),
         |ex AS (
         |  SELECT DISTINCT d.doc_id
         |  FROM documents d JOIN ck ON ${Hashing.sqlH60("lower(d.text)")} = ck.k
         |  WHERE d.doc_id % $INC_MOD = $INC_REM
         |)
         |SELECT d.doc_id,
         |  (ex.doc_id IS NOT NULL) AS dup_exact,
         |  CAST(coalesce(b.id_c, -1) AS BIGINT) AS near_id,
         |  coalesce(b.j, 0.0) AS near_jaccard,
         |  (ex.doc_id IS NULL AND b.id_c IS NULL) AS keep
         |FROM documents d
         |LEFT JOIN ex ON ex.doc_id = d.doc_id
         |LEFT JOIN (SELECT id_b, id_c, j FROM best WHERE rn = 1) b
         |  ON b.id_b = d.doc_id
         |WHERE d.doc_id % $INC_MOD = $INC_REM""".stripMargin

  /** The p05 MinHash-LSH oracle, shared VERBATIM by the streaming twin
    * (s14): the emitted candidate-pair SET of the streaming bucket
    * state equals the batch band-bucket self-join's for any arrival
    * order (each unordered pair emitted exactly once, when the later
    * doc reaches the bucket), and the verify stage is the same exact
    * Jaccard — so streaming == batch EXACTLY and one SQL gates both.
    */
  private[queries] def sqlMinhashPairs: String =
    s"""WITH $DOCS,
       |sigs AS (
       |  SELECT doc_id, shingles, n_sh,
       |    list_transform(range(0, ${MH_BANDS * MH_ROWS}), i ->
       |      CAST(list_min(list_transform(hs, x ->
       |        (((506952114 * (i + 1)) % ${Hashing.P}) * x + 10007*i + 17) % ${Hashing.P})) AS BIGINT)) AS sig
       |  FROM hsh
       |),
       |buckets AS (
       |  SELECT doc_id, shingles, n_sh, CAST(j AS BIGINT) AS band,
       |    CAST(sig[CAST(2*j+1 AS INT)] AS VARCHAR) || ',' ||
       |    CAST(sig[CAST(2*j+2 AS INT)] AS VARCHAR) AS bucket
       |  FROM sigs, range(0, $MH_BANDS) t(j)
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM buckets a JOIN buckets b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       |)
       |SELECT id_a, id_b, j AS jaccard FROM (
       |  SELECT id_a, id_b,
       |    ${sqlJaccard("len(list_intersect(sa.shingles, sb.shingles))", "sa.n_sh", "sb.n_sh")} AS j
       |  FROM cand
       |  JOIN hsh sa ON sa.doc_id = id_a
       |  JOIN hsh sb ON sb.doc_id = id_b
       |) WHERE j >= $MH_T""".stripMargin

  /** The p31 bottom-k oracle, shared verbatim by the streaming twin
    * (s12) — bottom-k is an order-free min-merge, so streaming == batch
    * EXACTLY and the same SQL gates both.
    */
  private[queries] def sqlBottomK: String =
    s"""SELECT lang, doc_id, h, sample_rank FROM (
       |  SELECT lang, doc_id, h,
       |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
       |      AS BIGINT) AS sample_rank
       |  FROM (SELECT lang, doc_id, ${Hashing.sqlH60("text")} AS h
       |        FROM documents)
       |) WHERE sample_rank <= $BOTTOMK""".stripMargin

  /** DuckDB oracle for the Count-Min top-k word probe — shared verbatim
    * by p39 (batch sketch) and s10 (streaming twin): the two engines'
    * results are defined to be identical, so one oracle serves both.
    */
  private[queries] def sqlCountMinTopK: String =
    s"""WITH toks AS (
       |  SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
       |), hh AS (
       |  SELECT w, ${Hashing.sqlH60("w")} AS h FROM toks
       |), cm AS (
       |  SELECT cm_row, (h + cm_row * (1 + h % ${CM_WIDTH - 1})) % $CM_WIDTH AS pos,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM hh CROSS JOIN (SELECT unnest(range(0, $CM_DEPTH)) AS cm_row)
       |  GROUP BY 1, 2
       |), tru AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS n_true FROM toks GROUP BY w
       |  ORDER BY n_true DESC, w LIMIT $CM_TOPK
       |), probe AS (
       |  SELECT t.w, t.n_true, r.cm_row,
       |    (${Hashing.sqlH60("t.w")}
       |      + r.cm_row * (1 + ${Hashing.sqlH60("t.w")} % ${CM_WIDTH - 1}))
       |      % $CM_WIDTH AS pos
       |  FROM tru t CROSS JOIN (SELECT unnest(range(0, $CM_DEPTH)) AS cm_row) r
       |)
       |SELECT p.w AS word, p.n_true,
       |  CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS n_est
       |FROM probe p LEFT JOIN cm c ON p.cm_row = c.cm_row AND p.pos = c.pos
       |GROUP BY p.w, p.n_true""".stripMargin

  /** DuckDB `chr(31)` — the [[graft.pipeline.Bpe.Sep]] symbol separator
    * as a SQL expression (kept out of the SQL text as a raw control
    * character).
    */
  private def sqlUs = "chr(31)"

  /** The unrolled `rounds`-round BPE training replay: CTEs `w`
    * (word frequencies), `s0` (initial char states), then per round k
    * `b{k}` (the argmax pair, ties (cnt desc, a, b)) and `s{k}` (states
    * after replaying merge k). Every CTE is MATERIALIZED: `s{k}`
    * references `b{k}` in three scalar subqueries, and DuckDB's default
    * inlining would re-expand the whole chain exponentially (measured: a
    * 10-round inline chain never finishes; materialized it is
    * milliseconds). `replace`'s left-to-right non-overlapping scan IS
    * BPE's greedy merge order — see [[graft.pipeline.Bpe]].
    */
  private def sqlBpeChain(rounds: Int): String = {
    val us = sqlUs
    val sb = new StringBuilder
    sb.append(
      s"""WITH w AS MATERIALIZED (
         |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
         |    SELECT unnest(string_split(lower(text), ' ')) AS word
         |    FROM documents
         |  ) WHERE word <> '' GROUP BY word
         |), s0 AS MATERIALIZED (
         |  SELECT word, freq,
         |    $us || array_to_string(string_split(word, ''), $us||$us) || $us
         |      || $us||'</w>'||$us AS state
         |  FROM w
         |)""".stripMargin)
    for (k <- 1 to rounds) {
      val p = k - 1
      sb.append(
        s""", b$k AS MATERIALIZED (
           |  SELECT a, b, cnt FROM (
           |    SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
           |      SELECT syms[i] AS a, syms[i+1] AS b, freq
           |      FROM (SELECT freq, string_split(trim(state, $us), $us||$us)
           |              AS syms FROM s$p),
           |        UNNEST(range(1, len(syms))) AS u(i)
           |    ) GROUP BY a, b
           |  ) ORDER BY cnt DESC, a, b LIMIT 1
           |), s$k AS MATERIALIZED (
           |  -- Exhaustion guard (round-15 ADVICE): if the engine's train()
           |  -- stopped early, b$k is empty and replace(state, NULL, NULL)
           |  -- would NULL every state — carry the last valid state instead,
           |  -- exactly like the engine's early-stopped loop.
           |  SELECT word, freq, CASE WHEN EXISTS (SELECT 1 FROM b$k)
           |    THEN replace(state,
           |      $us || (SELECT a FROM b$k) || $us||$us || (SELECT b FROM b$k) || $us,
           |      $us || (SELECT a FROM b$k) || (SELECT b FROM b$k) || $us)
           |    ELSE state END AS state
           |  FROM s$p
           |)""".stripMargin)
    }
    sb.toString
  }

  /** The BPE token-id SEQUENCE replay (appended after [[sqlBpeChain]]):
    * re-derives every word's segmentation from the round-`rounds`
    * state, assigns the deterministic integer vocabulary (corpus chars
    * sorted, then `</w>`, then merges by rank; same-surface symbols
    * share the min id), and numbers positions per doc — ends with the
    * `enc (doc_id, pos, token, token_id)` CTE p67 selects verbatim and
    * p69 builds token grams from.
    */
  private def sqlBpeEncode(rounds: Int): String =
    s""", segs AS MATERIALIZED (
       |  SELECT word, string_split(trim(state, $sqlUs), $sqlUs||$sqlUs)
       |    AS syms
       |  FROM s$rounds
       |), chars AS MATERIALIZED (
       |  SELECT DISTINCT unnest(string_split(word, '')) AS token FROM w
       |), cid AS (
       |  SELECT token,
       |    CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT)
       |      AS token_id
       |  FROM chars
       |), nch AS (SELECT CAST(count(*) AS BIGINT) AS c FROM chars),
       |vocab0 AS (
       |  SELECT token, token_id FROM cid
       |  UNION ALL SELECT '</w>', (SELECT c FROM nch)
       |${(1 to rounds).map(k =>
           s"  UNION ALL SELECT a||b, (SELECT c FROM nch) + $k FROM b$k")
          .mkString("\n")}
       |), vocab AS (
       |  SELECT token, MIN(token_id) AS token_id FROM vocab0
       |  GROUP BY token
       |), occ AS (
       |  SELECT doc_id, i - 1 AS wpos, words[i] AS word
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS words
       |        FROM documents),
       |    UNNEST(range(1, len(words) + 1)) AS u(i)
       |  WHERE words[i] <> ''
       |), tk AS (
       |  SELECT o.doc_id, o.wpos, j - 1 AS sidx, s.syms[j] AS token
       |  FROM occ o JOIN segs s USING (word),
       |    UNNEST(range(1, len(s.syms) + 1)) AS v(j)
       |), enc AS MATERIALIZED (
       |  SELECT t.doc_id,
       |    CAST(row_number() OVER (PARTITION BY t.doc_id
       |      ORDER BY t.wpos, t.sidx) - 1 AS BIGINT) AS pos,
       |    t.token, v.token_id
       |  FROM tk t JOIN vocab v USING (token)
       |)""".stripMargin

  /** Token [[TOK_SPAN_L]]-gram postings over the replayed `enc`
    * relation (appended after [[sqlBpeEncode]]): yields
    * `arr (doc_id, n_tokens, ids)` and `tg (doc_id, n_tokens, pos, h)`
    * — the posting CTEs shared by p69 (span detect) and p70 (span cut).
    */
  private def sqlTokenGrams: String =
    s""", arr AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    list(CAST(token_id AS VARCHAR) ORDER BY pos) AS ids
       |  FROM enc GROUP BY doc_id
       |), tg AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(unnest(range(1, greatest(len(ids) - ${TOK_SPAN_L - 1}, 1) + 1))
       |      AS BIGINT) AS pos,
       |    unnest(list_transform(
       |      range(1, greatest(len(ids) - ${TOK_SPAN_L - 1}, 1) + 1),
       |      i -> ${Hashing.sqlH60(
           s"array_to_string(list_slice(ids, i, i + ${TOK_SPAN_L - 1}), ' ')")}))
       |      AS h
       |  FROM arr
       |)""".stripMargin

  /** Per-distinct-word subword token counts from the round-`rounds`
    * BPE state (appended after [[sqlBpeChain]]): each symbol
    * contributes two separators.
    */
  private def sqlBpeWordToks(rounds: Int): String =
    s""", wt AS MATERIALIZED (
       |  SELECT word,
       |    (length(state) - length(replace(state, $sqlUs, ''))) // 2 AS n_tok
       |  FROM s$rounds
       |)""".stripMargin

  /** DuckDB fragment: HLL estimate (incl. linear-counting switch) over
    * a `(… rho …)` register relation — mirrors
    * [[Sketches.estimateOver]]'s math value for value.
    */
  private def sqlHllEst(regRel: String, alias: String): String = {
    val m = Sketches.NumBuckets
    s"""(SELECT CASE WHEN v > 0 AND raw < ${5L * m / 2}
       |    THEN CAST(floor($m.0 * ln($m.0 / CAST(v AS DOUBLE))) AS BIGINT)
       |    ELSE raw END AS $alias
       |  FROM (SELECT $m - count(*) AS v,
       |    CAST(floor(${Sketches.EstNumerator} / CAST(
       |      COALESCE(sum(1::BIGINT << (${Sketches.MaxRho} - rho)), 0) +
       |      ($m - count(*)) * (1::BIGINT << ${Sketches.MaxRho}) AS DOUBLE))
       |      AS BIGINT) AS raw
       |  FROM $regRel))""".stripMargin
  }
}
