package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over a `documents`
  * corpus: token counting, quality scoring, language-ID heuristic, and
  * content fingerprinting. All pure built-in/higher-order expressions —
  * no UDFs, so the whole stage stays in whole-stage codegen and is a
  * narrow map over the corpus (embarrassingly parallel at 100 TB; the only
  * shuffle anywhere downstream is whatever aggregation the caller adds).
  *
  * Every function here is deliberately DuckDB-expressible so the driver's
  * oracle can hash-match results (see
  * [[graft.queries.PipelineQueries]]).
  */
object TextAnalysis {

  /** Small English function-word set for the language-ID / stopword-ratio
    * heuristics. Deterministic and tiny by design: real language ID would
    * ship per-language n-gram tables; the heuristic's *shape* (token-set
    * scoring, ratio thresholds) is what matters at the engine level.
    */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "from", "or", "be", "are")

  /** Whitespace tokens of lowered text. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword token count: alphanumeric runs plus individual
    * non-alphanumeric, non-space symbols (the classic pre-tokenizer
    * regex, counted rather than materialized).
    */
  val SubwordPattern = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"
  def subwordCount(text: Column): Column =
    regexp_count(text, lit(SubwordPattern)).cast("long")

  /** Number of tokens that are English stopwords. */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), w => w.isInCollection(EnglishStopwords))).cast("long")

  /** Stopword ratio in [0,1]; 0 for empty docs. */
  def stopwordRatio(text: Column): Column =
    when(tokenCount(text) > 0,
      stopwordCount(text).cast("double") / tokenCount(text).cast("double"))
      .otherwise(lit(0.0))

  /** Mean token length (chars), 0 for empty docs. */
  def meanTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    when(n > 0,
      aggregate(tokens(text), lit(0L), (acc, w) => acc + length(w)).cast("double")
        / n.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Quality gate: length in range, plausible mean word length, some
    * English function words — the standard cheap pre-filter shape for a
    * web-scale corpus (each clause is one scan-local comparison).
    */
  def qualityOk(
      text: Column,
      minTokens: Long = 5L,
      maxTokens: Long = 100000L,
      maxMeanTokenLen: Double = 15.0,
      minStopwordRatio: Double = 0.01): Column =
    tokenCount(text).between(minTokens, maxTokens) &&
      meanTokenLen(text) <= maxMeanTokenLen &&
      stopwordRatio(text) >= minStopwordRatio

  /** Language-ID heuristic: English if the function-word ratio clears the
    * threshold, else undetermined.
    */
  def languageId(text: Column, enThreshold: Double = 0.04): Column =
    when(stopwordRatio(text) >= enThreshold, lit("en")).otherwise(lit("und"))

  /** Whole-document fingerprint: 60-bit hash of the lowered text. */
  def docFingerprint(text: Column): Column = Hashing.h60(lower(text))

  /** Content fingerprint robust to local edits: minimum 60-bit hash over
    * the word `n`-shingles (a 1-perm MinHash). Equal fingerprints ⇒ the
    * docs share their minimizing shingle.
    */
  def shingleFingerprint(text: Column, n: Int = 3,
      mode: Hashing.HashMode = Hashing.HashMode.Oracle): Column =
    array_min(Shingles.hashedWordShingles(text, n, mode))

  /** Fraction of REPEATED word `n`-grams in a document (Gopher-style
    * repetition quality signal): 1 − |distinct n-grams| / |n-grams|.
    * High values flag boilerplate/spam (repeated headers, keyword
    * stuffing) that near-dup detection across documents cannot see.
    * Distinct count comes from the native hashed-shingle pass; total is
    * arithmetic on the token count — no second shingling.
    */
  def repetitionRatio(text: Column, n: Int = 3,
      mode: Hashing.HashMode = Hashing.HashMode.Oracle): Column = {
    val total = greatest(size(tokens(text)) - (n - 1), lit(1)).cast("long")
    val distinctGrams = size(Shingles.hashedWordShingles(text, n, mode)).cast("long")
    lit(1.0) - distinctGrams.cast("double") / total.cast("double")
  }

  /** PII patterns for the scrubbing pass. Deliberately restricted to
    * regex features with identical semantics in Java (Spark codegen) and
    * RE2 (the DuckDB oracle): ASCII character classes, bounded repeats,
    * `\b` word boundaries — no backrefs, no lookaround.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern =
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** PII scrub: redact emails, IPv4 addresses, and phone numbers with
    * typed placeholder tokens, counting each category. Categories are
    * applied in a fixed order (email → IP → phone), with each count taken
    * on the PREVIOUS stage's redacted text so one span is never counted
    * twice (an email's host can contain an IPv4-shaped substring, an IP
    * contains phone-shaped digit runs).
    *
    * Pure `regexp_replace`/`regexp_count` built-ins — a narrow,
    * whole-stage-codegen map over the corpus, embarrassingly parallel at
    * 100 TB like the rest of this stage.
    *
    * Returns `(redacted, n_emails, n_ipv4, n_phones)` columns.
    */
  private def piiStages(text: Column): (Column, Column, Column) = {
    val r1 = regexp_replace(text, lit(EmailPattern), lit("<EMAIL>"))
    val r2 = regexp_replace(r1, lit(Ipv4Pattern), lit("<IP>"))
    (r1, r2, regexp_replace(r2, lit(PhonePattern), lit("<PHONE>")))
  }

  /** Fully redacted copy of a text column. */
  def piiRedact(text: Column): Column = piiStages(text)._3

  def piiScrub(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val text = col(textCol)
    val (r1, r2, r3) = piiStages(text)
    docs.select(
      col(idCol),
      regexp_count(text, lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(r1, lit(Ipv4Pattern)).cast("long").as("n_ipv4"),
      regexp_count(r2, lit(PhonePattern)).cast("long").as("n_phones"),
      length(r3).cast("long").as("red_len"),
      Hashing.h60(r3).as("red_hash"))
  }

  /** Deterministic content-hash train/val/test assignment: bucket =
    * hash(lower(text)) mod 100, `train` below `trainPct`, `val` in the
    * next `valPct`, `test` above. Hash-of-content (not of id) keeps the
    * assignment stable across re-ingestion and keeps EXACT duplicates in
    * the same split (no train/test leakage from copies); near-dups need
    * group-level assignment via [[Dedup.resolveDupGroups]] first.
    */
  def splitAssign(text: Column, trainPct: Int = 80, valPct: Int = 10,
      mode: Hashing.HashMode = Hashing.HashMode.Oracle): Column = {
    require(trainPct + valPct <= 100)
    val bucket = mode(lower(text)) % 100
    when(bucket < trainPct, lit("train"))
      .when(bucket < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Near-dup-group-aware train/val/test split — the leakage-free
    * composition [[splitAssign]]'s doc promises: exact duplicates
    * already co-assign (content-hash bucketing), but NEAR-duplicates
    * hash differently and can leak a near-copy of a training doc into
    * test. Here the split is keyed on each doc's dup-GROUP canonical
    * member's content ([[Dedup.resolveDupGroups]] output), so every
    * member of a transitive near-dup group lands in the same split by
    * construction.
    *
    * @param groups `(doc_id, canonical_id)` from [[Dedup.resolveDupGroups]]
    * @return `(doc_id, canonical_id, split)` for every input doc
    *
    * Scale: one equi hash join of the group table with the canonical
    * members' text on an 8-byte key (canonical docs are ≤ corpus size;
    * group resolution itself is the DF-native CC already measured in
    * p14); the bucket decision is the same narrow codegen map as
    * [[splitAssign]].
    */
  def groupSplitAssign(docs: DataFrame, groups: DataFrame,
      trainPct: Int = 80, valPct: Int = 10,
      mode: Hashing.HashMode = Hashing.HashMode.Oracle): DataFrame = {
    val repText = docs.select(col("doc_id").as("canonical_id"), col("text"))
    groups.select(col("doc_id"), col("canonical_id"))
      .join(repText, Seq("canonical_id"))
      .select(col("doc_id"), col("canonical_id"),
        splitAssign(col("text"), trainPct, valPct, mode).as("split"))
  }

  /** Sliding-window document chunking — the RAG / context-window
    * pre-processing pass: split every document into overlapping
    * `chunkLen`-token windows advancing by `stride` tokens. The last
    * window may be shorter; a doc shorter than `chunkLen` yields
    * exactly one chunk. Chunk count is the closed integer form
    * `1 + max(0, ceil((n_tok - chunkLen) / stride))` computed with
    * integer floor division (`(n - L + S - 1) div S`) so both engines
    * agree without float ceil.
    *
    * Output: one row per chunk — `(doc_id, chunk_id, start_tok, n_tok,
    * chunk_text, chunk_hash)`; `chunk_id` is 0-based within the doc,
    * `start_tok` the 0-based token offset, `chunk_hash` the 60-bit
    * content hash (the key exact-dedup / decontamination runs on at
    * the chunk grain).
    *
    * Scale: tokenize → `sequence` → `explode` → `slice` is a purely
    * NARROW codegen'd map — zero shuffles, no UDF, no driver state;
    * output size is `~n_tok/stride` rows per doc regardless of corpus
    * size. The natural pre-pass before [[Curation.packSequences]] and
    * chunk-grain [[Dedup]].
    */
  def chunk(docs: DataFrame, chunkLen: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text",
      mode: Hashing.HashMode = Hashing.HashMode.Oracle): DataFrame = {
    require(chunkLen >= 1, s"chunkLen must be >= 1, got $chunkLen")
    require(stride >= 1 && stride <= chunkLen,
      s"stride must be in [1, chunkLen]; got stride=$stride len=$chunkLen")
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("n_chunks",
        lit(1L) + greatest(lit(0L),
          expr(s"(n_tok - $chunkLen + ${stride - 1}) div $stride")))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_id"))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("chunk_toks",
        slice(col("toks"), (col("start_tok") + 1L).cast("int"), lit(chunkLen)))
      .withColumn("chunk_text", array_join(col("chunk_toks"), " "))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size(col("chunk_toks")).cast("long").as("n_tok"),
        col("chunk_text"), mode(col("chunk_text")).as("chunk_hash"))
  }

  /** Per-document top-`k` keywords by TF-IDF — the standard
    * keyword-extraction / feature-selection pass. IDF is quantized to
    * integer micro-nats (`floor(1e6 * ln(N/df))`) so the score
    * `tf * idf_micro` is pure integer math with a deterministic
    * `(score desc, word)` tie-break — bit-identical cross-engine, same
    * fixed-point policy as [[unigramQuality]].
    *
    * Output: `(doc_id, word, tf, idf_micro, score, rank)`, `rank ≤ k`.
    *
    * Scale: term frequency is one `groupBy(doc_id, word)` over the
    * exploded token stream (map-side combinable); document frequency is
    * a vocab-sized aggregate of THAT result (no second corpus pass);
    * the top-k window partitions by `doc_id` — per-doc sorts of
    * vocab-bounded groups, never a global sort.
    */
  def tfidfKeywords(docs: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = docs.select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("word"))
      .groupBy(col("id"), col("word")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf.join(df, Seq("word"))
      .crossJoin(broadcast(nDocs))
      .select(col("id"), col("word"), col("tf"),
        floor(log(col("n_docs").cast("double") / col("df").cast("double"))
          * 1e6).cast("long").as("idf_micro"))
      .withColumn("score", col("tf") * col("idf_micro"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("word"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id").as(idCol), col("word"), col("tf"),
        col("idf_micro"), col("score"), col("rank"))
  }

  /** Corpus-self-derived unigram language-model quality score — the
    * KenLM-style perplexity gate of a pre-training pipeline, with the LM
    * estimated from the corpus itself (one `groupBy(word)` pass) instead
    * of an external model file. Per document: token count, the summed
    * unigram log-probability in fixed-point micro-nats (each word's
    * `floor(1e6 * ln(cnt/total))` is quantized BEFORE summation, so the
    * sum is integer math — order-independent across partitions and
    * bit-identical in the DuckDB oracle), its per-token mean, and the
    * out-of-vocabulary fraction (corpus count < `minCount`; on this
    * uniform synthetic vocabulary that is always 0, but the column pins
    * the rare-word path).
    *
    * Output: `(doc_id, n_tokens, lp_micro_sum, mean_lp_micro, n_oov,
    * oov_frac)` — low (more negative) mean log-prob = surprising/noisy
    * text, the standard quality-filter signal.
    *
    * Scale: tokens explode in a narrow map; the LM is vocab-sized
    * (sub-linear in corpus size by Heaps' law, web-scale vocab ~1e8 rows
    * ≪ corpus) and joins the token stream on the word key — AQE
    * broadcasts it while it fits, plain shuffle join beyond; the per-doc
    * aggregate is map-side combinable on integer columns. No global
    * sort/window anywhere (OOV is a frequency threshold, not a top-k
    * rank, precisely so the vocab never funnels through one task).
    */
  def unigramQuality(docs: DataFrame, minCount: Long = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("w"))
    val freq = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("tot"))
    val wordScore = freq.crossJoin(broadcast(total)).select(
      col("w"),
      floor(log(col("cnt").cast("double") / col("tot").cast("double")) * 1e6)
        .cast("long").as("lp"),
      (col("cnt") < minCount).cast("int").as("oov"))
    // Every token has corpus count >= 1 by construction (the LM is
    // self-derived), so the inner join never drops a row.
    toks.join(wordScore, Seq("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lp")).as("lp_micro_sum"),
        sum(col("oov")).cast("long").as("n_oov"))
      .select(col("id").as(idCol), col("n_tokens"), col("lp_micro_sum"),
        (col("lp_micro_sum").cast("double") / col("n_tokens").cast("double"))
          .as("mean_lp_micro"),
        col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_frac"))
  }

  /** Stupid-backoff micro-nat score of the backoff branch: `ln(0.4)`
    * quantized ONCE driver-side and interpolated into both engines as
    * the same integer literal — never recomputed per-engine (the
    * [[unigramQuality]] fixed-point policy applied to the one constant
    * the formula carries).
    */
  val StupidBackoffMicro: Long = math.floor(math.log(0.4) * 1e6).toLong

  /** Corpus-self-derived BIGRAM language-model quality score with
    * stupid backoff (Brants et al. 2007 — the web-scale LM smoothing
    * that needs no held-out tuning): a doc's score is the sum over its
    * adjacent token pairs of `ln(c(w1 w2) / c(w1))` when the bigram was
    * seen, else `ln(0.4) + ln(c(w2) / T)` (backoff to the unigram).
    * All log-probs are integer micro-nats BEFORE summation, so per-doc
    * sums are order-independent and cross-engine bit-exact; the
    * backoff constant is [[StupidBackoffMicro]].
    *
    * Output: `(doc_id, n_bigrams, lp2_micro_sum, mean_lp2_micro,
    * n_backoff, backoff_frac)` — one row per doc with ≥ 1 bigram
    * (single-token docs have no bigram signal by definition).
    *
    * `minCount` prunes the bigram table (web-scale LMs drop singleton
    * n-grams): bigrams seen fewer than `minCount` times score through
    * the backoff branch — which is also what makes backoff REACHABLE
    * when the corpus scores itself (self-derived counts are ≥ 1 by
    * construction).
    *
    * Scale: bigram extraction is a narrow zip of each token array with
    * its own tail (no self-join on position); the bigram table is one
    * map-side-combinable aggregate, vocabulary²-bounded but in practice
    * Heaps-law-sized; scoring joins doc bigram occurrences against it
    * by key. Nothing is ever corpus × corpus.
    */
  def bigramQuality(docs: DataFrame, minCount: Long = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("ts"))
    val n1 = size(col("ts")) - 1
    val bi = toks.filter(size(col("ts")) >= 2)
      .select(col("id"),
        explode(zip_with(
          slice(col("ts"), lit(1), n1),
          slice(col("ts"), lit(2), n1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val uni = docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val total = uni.agg(sum(col("c1")).as("tot"))
    val big = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)
    // Dense per-seen-bigram scores; the backoff branch needs only the
    // unigram table. Both are key-joined to the doc's bigram stream.
    val lp2 = big
      .join(uni.select(col("w").as("w1"), col("c1")), Seq("w1"))
      .select(col("w1"), col("w2"),
        floor(log(col("c2").cast("double") / col("c1").cast("double")) * 1e6)
          .cast("long").as("lp2"))
    val lp1 = uni.crossJoin(broadcast(total))
      .select(col("w").as("w2"),
        floor(log(col("c1").cast("double") / col("tot").cast("double")) * 1e6)
          .cast("long").as("lp1"))
    bi.join(lp2, Seq("w1", "w2"), "left")
      .join(lp1, Seq("w2"))
      .select(col("id"),
        coalesce(col("lp2"), col("lp1") + lit(StupidBackoffMicro)).as("lp"),
        col("lp2").isNull.cast("int").as("backoff"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("lp2_micro_sum"),
        sum(col("backoff")).cast("long").as("n_backoff"))
      .select(col("id").as(idCol), col("n_bigrams"), col("lp2_micro_sum"),
        (col("lp2_micro_sum").cast("double") / col("n_bigrams").cast("double"))
          .as("mean_lp2_micro"),
        col("n_backoff"),
        (col("n_backoff").cast("double") / col("n_bigrams").cast("double"))
          .as("backoff_frac"))
  }
}

/** Word n-gram shingling shared by fingerprinting and the dedup family. */
object Shingles {

  /** Distinct space-joined word `n`-grams of a token array; whole doc as
    * one shingle when shorter than `n`.
    */
  def wordShingles(tokens: Column, n: Int): Column = {
    require(n >= 1)
    val grams = transform(
      sequence(lit(1), greatest(size(tokens) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(tokens, i, lit(n))))
    array_distinct(grams)
  }

  /** Distinct word `n`-shingles of `text`, hashed to 60 bits in the given
    * mode. Oracle/Fast run the whole lower→split→n-gram→distinct→hash
    * chain as ONE codegen'd native expression
    * ([[graft.functions.HashedShingles]] — differential-tested equal to
    * the composite); Custom keeps the higher-order composite with the
    * caller's hash.
    */
  def hashedWordShingles(text: Column, n: Int, mode: Hashing.HashMode): Column =
    mode match {
      case Hashing.HashMode.Oracle =>
        graft.functions.HashedShingles(text, n, fast = false)
      case Hashing.HashMode.Fast =>
        graft.functions.HashedShingles(text, n, fast = true)
      case c: Hashing.HashMode.Custom =>
        transform(wordShingles(TextAnalysis.tokens(text), n), s => c.f(s))
    }

  /** DuckDB fragment computing the same shingle list from a token-list
    * expression (1-based list slicing mirrors Spark's `slice`).
    */
  def sqlWordShingles(tokensExpr: String, n: Int): String =
    s"""list_distinct(list_transform(
       |  range(1, greatest(len($tokensExpr) - ${n - 1}, 1) + 1),
       |  i -> array_to_string(list_slice($tokensExpr, i, i + ${n - 1}), ' ')))""".stripMargin
}
