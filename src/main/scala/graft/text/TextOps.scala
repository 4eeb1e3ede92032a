package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis and deduplication operators over the `documents` table —
  * the training-data-pipeline surface beyond the reference's own scope
  * (BASELINE.json north star; SURVEY §7.5): per-document statistics and
  * quality scoring, n-gram-heuristic language ID, content fingerprinting,
  * exact dedup, exact n-gram Jaccard near-dup pairs, MinHash+LSH
  * candidate generation, and SimHash near-dup pairs.
  *
  * Every operator here is expressed with codegen'd built-in/higher-order
  * functions (`transform`/`aggregate`/`filter` — no UDFs), and all hashes
  * are md5-derived so the DuckDB oracle can reproduce them bit-for-bit:
  * h(s) = first 14 (or 8) hex chars of md5 → integer. That makes even
  * MinHash signatures and LSH band buckets exactly verifiable — not just
  * "rows > 0".
  *
  * Scale posture (100 TB of documents):
  *  - per-doc ops (stats, lang-id, fingerprint, signatures) are narrow
  *    projections — no shuffle, linear scan, whole-stage codegen;
  *  - exact dedup is one hash-groupBy (map-side partial);
  *  - Jaccard pairs shuffle (shingle, doc) pairs — shingle blocking keeps
  *    the join sparse (measured max 7 docs/shingle here); skew-prone hot
  *    shingles are dropped by the [[HotShingleDfCap]] frequency cap, so
  *    the worst join key costs cap² however pathological the corpus;
  *  - MinHash-LSH is the scale path: candidates come from equality joins
  *    on 4 band hashes instead of all-pairs comparison.
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  /** Whitespace tokens of trimmed text (shared definition, mirrored as
    * regexp_split_to_array in the oracle). */
  val toksE = "split(trim(text), '\\\\s+')"

  /** The 8-word function-word list — ONE definition shared by the
    * quality gate's stopword ratio, language markers, and the
    * content-similarity feature filter below. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  val stopwordInE: String = Stopwords.map(w => s"'$w'").mkString(", ")

  /** Content-bearing tokens: [[toksE]] minus stopwords — the feature
    * set for SimHash. Classic SimHash weights features by importance
    * (Charikar's scheme as deployed by Manku et al. uses idf weights);
    * dropping the tiny fixed function-word list is the rank-1
    * approximation of that weighting, and it matters at scale: on a
    * Zipfian corpus (~1/3 of token mass on stopwords) unweighted
    * per-occurrence votes correlate every document's signature, piling
    * the population into a handful of band buckets — measured on the
    * 100x generated corpus as the bucket cap truncating candidate
    * generation to near-zero output (262 pairs vs 47k on a uniform
    * vocabulary). Filtering restores feature entropy without touching
    * the banding or the cap contract. */
  val contentToksE = s"filter($toksE, t -> t NOT IN ($stopwordInE))"
  /** Distinct word-trigram shingles over the tokens. */
  val shinglesE =
    s"""array_distinct(CASE WHEN size($toksE) >= 3 THEN
          transform(sequence(1, size($toksE) - 2),
            i -> concat(element_at($toksE, i), ' ',
                        element_at($toksE, i + 1), ' ',
                        element_at($toksE, i + 2)))
        ELSE array() END)"""

  /** Compiled twin of [[shinglesE]] ([[graft.functions.WordShingles]]
    * over the token split) — same shingle set and first-occurrence
    * order; WordShinglesSpec asserts bit-equality. */
  def shinglesNative: org.apache.spark.sql.Column =
    graft.functions.WordShingles.of(expr(toksE))

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  /** The ceil(chars/4) BPE-token estimate — ONE rule for textStats,
    * corpusTokenAccounting, and packSequences plus their oracles
    * (the [[graft.Pricing]] pattern: shared business rules must not
    * drift between the layers that apply them). */
  def estBpeTokens: org.apache.spark.sql.Column =
    ceil(length(col("text")).cast("double") / lit(4.0)).cast("long")
  /** DuckDB twin of [[estBpeTokens]]. */
  val estBpeTokensSqlE: String =
    "CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT)"

  // ---------------------------------------------------------------- stats

  /** Per-document statistics + quality score: token/char counts, average
    * token length, punctuation ratio, stopword ratio, a ceil(len/4)
    * BPE-ish token estimate, and a weighted quality score.
    *
    * The three token-derived measures come from ONE compiled pass over
    * the text ([[graft.functions.TextStatsSig]]) instead of three HOF
    * trees that each re-split and re-walk the token array; the HOF twin
    * stays below as [[textStatsHof]] and TextStatsSpec asserts
    * bit-equality between the two on every document. The struct is
    * projected in its own select step so CollapseProject's
    * non-cheap-expression guard keeps it evaluated once per row. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    withTextStats(docs(spark, dir).select("doc_id", "text")).drop("text")

  /** Appends the [[textStats]] columns to ANY frame bearing a `text`
    * column, keeping the frame's existing columns. This is the reusable
    * form: a composition (e.g. [[Curation.curatedDocs]]) can apply its
    * narrow filters and joins FIRST and compute stats only for the
    * survivors, instead of joining against a recomputation of the stats
    * over the whole corpus — at 100 TB that's the difference between
    * scanning `documents` once and scanning it twice plus an extra
    * shuffle join. One definition of every measure, so the gate formula
    * cannot drift between the standalone query and the compositions. */
  def withTextStats(df: DataFrame): DataFrame =
    df
      .withColumn("_ts", graft.functions.TextStatsSig.of(col("text")))
      .select(df.columns.toIndexedSeq.map(col) ++ Seq(
        col("_ts.n_tokens").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_actual"),
        (col("_ts.sum_token_len").cast("double")
          / col("_ts.n_tokens").cast("double")).as("avg_token_len"),
        (length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("double")
          / length(col("text")).cast("double")).as("punct_ratio"),
        (col("_ts.stopword_count").cast("double")
          / col("_ts.n_tokens").cast("double")).as("stopword_ratio"),
        estBpeTokens.as("est_bpe_tokens"),
        // BPE-ish regex tokenization: letter runs, digit runs, single punct
        expr("size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0))")
          .cast("long").as("n_tokens_regex")): _*)
      .withColumn("quality_score",
        lit(100.0) * (lit(0.4) * least(lit(1.0), col("n_tokens").cast("double") / lit(100.0))
          + lit(0.3) * (lit(1.0) - col("punct_ratio"))
          + lit(0.3) * least(lit(1.0), col("stopword_ratio") * lit(4.0))))

  /** The original HOF formulation of [[textStats]] — retained solely as
    * the bit-equality reference for the native single-pass expression
    * (TextStatsSpec compares the two frame-for-frame). */
  private[graft] def textStatsHof(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      expr(s"size($toksE)").cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars_actual"),
      (expr(s"aggregate(transform($toksE, t -> length(t)), 0, (a, x) -> a + x)")
        .cast("double") / expr(s"size($toksE)").cast("double"))
        .as("avg_token_len"),
      (length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).cast("double")
        / length(col("text")).cast("double")).as("punct_ratio"),
      (expr(s"size(filter($toksE, t -> t IN ('the','a','of','and','to','in','is','it')))")
        .cast("double") / expr(s"size($toksE)").cast("double"))
        .as("stopword_ratio"),
      estBpeTokens.as("est_bpe_tokens"),
      // BPE-ish regex tokenization: letter runs, digit runs, single punct
      expr("size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0))")
        .cast("long").as("n_tokens_regex"))
      .withColumn("quality_score",
        lit(100.0) * (lit(0.4) * least(lit(1.0), col("n_tokens").cast("double") / lit(100.0))
          + lit(0.3) * (lit(1.0) - col("punct_ratio"))
          + lit(0.3) * least(lit(1.0), col("stopword_ratio") * lit(4.0))))

  // plain triple-quote with a placeholder (not an s-string: the regex
  // backslashes would be re-escaped); __EST_BPE__ -> the shared rule
  private val textStatsSqlRaw: String = """
WITH t AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_actual,
       CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS avg_token_len,
       CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE)
         / CAST(length(text) AS DOUBLE) AS punct_ratio,
       CAST(len(list_filter(w, t -> t IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE)
         / CAST(len(w) AS DOUBLE) AS stopword_ratio,
       __EST_BPE__ AS est_bpe_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens_regex,
       100.0 * (0.4 * least(1.0, CAST(len(w) AS DOUBLE) / 100.0)
              + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE))
              + 0.3 * least(1.0, CAST(len(list_filter(w, t -> t IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE)
                                 / CAST(len(w) AS DOUBLE) * 4.0)) AS quality_score
FROM t"""

  val textStatsSql: String =
    textStatsSqlRaw.replace("__EST_BPE__", estBpeTokensSqlE)

  // -------------------------------------------------------------- lang id

  /** N-gram-heuristic language ID: count function-word markers per
    * language, pick the argmax with a deterministic tie-break chain, and
    * report agreement with the labeled `lang` column. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    def markers(ws: String): String =
      s"size(filter($toksE, t -> t IN ($ws)))"
    val en = expr(markers("'the','a','is','of','and'")).cast("long")
    val es = expr(markers("'el','la','de','que','los'")).cast("long")
    val fr = expr(markers("'le','les','des','et','une'")).cast("long")
    val de = expr(markers("'der','die','das','und','ist'")).cast("long")
    docs(spark, dir).select(
      col("doc_id"), col("lang").as("labeled_lang"),
      en.as("en_markers"), es.as("es_markers"),
      fr.as("fr_markers"), de.as("de_markers"))
      .withColumn("predicted_lang",
        when(col("en_markers") >= col("es_markers")
          && col("en_markers") >= col("fr_markers")
          && col("en_markers") >= col("de_markers"), "en")
          .when(col("es_markers") >= col("fr_markers")
            && col("es_markers") >= col("de_markers"), "es")
          .when(col("fr_markers") >= col("de_markers"), "fr")
          .otherwise("de"))
      .withColumn("agrees", col("predicted_lang") === col("labeled_lang"))
  }

  /** Language confusion matrix — the rollup a corpus team reads before
    * trusting either label source: declared `lang` (crawler metadata)
    * vs [[langId]]'s detected language, with counts and row-normalized
    * shares P(predicted | labeled). The off-diagonal mass is exactly
    * the mislabeled-document volume a mixture-budget calculation would
    * silently mis-allocate. One aggregation over the lang-id frame
    * (everything after is proportional to |langs|², with row totals
    * broadcast back — the [[graft.analytics.Funnels.typeTransitions]]
    * shape). */
  def langConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cnt = langId(spark, dir)
      .groupBy("labeled_lang", "predicted_lang")
      .agg(count(lit(1)).as("n_docs"))
    val rowTot = cnt.groupBy("labeled_lang").agg(sum("n_docs").as("row_total"))
    cnt.join(broadcast(rowTot), "labeled_lang")
      .select(col("labeled_lang"), col("predicted_lang"), col("n_docs"),
        (col("n_docs").cast("double") / col("row_total").cast("double"))
          .as("row_share"))
      .orderBy("labeled_lang", "predicted_lang")
  }

  lazy val langConfusionSql: String = s"""
WITH lid AS ($langIdSql),
cnt AS (
  SELECT labeled_lang, predicted_lang, COUNT(*) AS n_docs
  FROM lid GROUP BY labeled_lang, predicted_lang),
tot AS (SELECT labeled_lang, SUM(n_docs) AS row_total FROM cnt GROUP BY labeled_lang)
SELECT c.labeled_lang, c.predicted_lang, c.n_docs,
       CAST(c.n_docs AS DOUBLE) / CAST(t.row_total AS DOUBLE) AS row_share
FROM cnt c JOIN tot t USING (labeled_lang)
ORDER BY labeled_lang, predicted_lang"""

  val langIdSql: String = """
WITH t AS (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
m AS (SELECT doc_id, lang AS labeled_lang,
             CAST(len(list_filter(w, t -> t IN ('the','a','is','of','and'))) AS BIGINT) AS en_markers,
             CAST(len(list_filter(w, t -> t IN ('el','la','de','que','los'))) AS BIGINT) AS es_markers,
             CAST(len(list_filter(w, t -> t IN ('le','les','des','et','une'))) AS BIGINT) AS fr_markers,
             CAST(len(list_filter(w, t -> t IN ('der','die','das','und','ist'))) AS BIGINT) AS de_markers
      FROM t)
SELECT *,
       CASE WHEN en_markers >= es_markers AND en_markers >= fr_markers AND en_markers >= de_markers THEN 'en'
            WHEN es_markers >= fr_markers AND es_markers >= de_markers THEN 'es'
            WHEN fr_markers >= de_markers THEN 'fr'
            ELSE 'de' END AS predicted_lang,
       CASE WHEN en_markers >= es_markers AND en_markers >= fr_markers AND en_markers >= de_markers THEN 'en'
            WHEN es_markers >= fr_markers AND es_markers >= de_markers THEN 'es'
            WHEN fr_markers >= de_markers THEN 'fr'
            ELSE 'de' END = labeled_lang AS agrees
FROM m"""

  // --------------------------------------------------------- fingerprints

  /** Content fingerprints: full md5 plus a 56-bit integer fingerprint
    * (first 14 hex chars — stays positive in a signed 64-bit int in both
    * engines). */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      md5(col("text")).as("content_md5"),
      expr("cast(conv(substr(md5(text), 1, 14), 16, 10) as bigint)")
        .as("fingerprint56"))

  val docFingerprintSql: String = """
SELECT doc_id, md5(text) AS content_md5,
       CAST(('0x' || substr(md5(text), 1, 14))::UBIGINT AS BIGINT) AS fingerprint56
FROM documents"""

  /** Winnowing fingerprints (rolling-hash k-grams → window minima —
    * [[graft.functions.WinnowFp]] has the full scheme): one row per
    * distinct (doc_id, fingerprint). Where [[docFingerprint]] identifies
    * exact clones, shared winnow fingerprints localize COPIED PASSAGES —
    * any shared substring of >= k+w-1 chars is guaranteed a shared
    * fingerprint — so an equality self-join on `fp` is the candidate
    * generator for passage-level overlap at corpus scale (same banded
    * equi-join shape as the LSH families; no all-pairs work). */
  import graft.functions.WinnowFp
  def docFingerprintWinnow(spark: SparkSession, dir: String): DataFrame =
    winnowFpsOver(docs(spark, dir))

  /** (doc_id, fp) exploded winnow fingerprints of any docs frame. */
  private[graft] def winnowFpsOver(d: DataFrame): DataFrame =
    // repartition: the single-file documents input would otherwise run
    // every rolling-hash pass in one task (same guard as dedupMinhashLsh)
    d.repartition(d.sparkSession.sparkContext.defaultParallelism)
      .select(
        col("doc_id"),
        explode(graft.functions.WinnowFp.of(col("text"))).as("fp"))

  /** Plain-Scala reference twin of [[graft.functions.WinnowFp]] (spec
    * use only) — deliberately a DIFFERENT algorithm: direct O(k) re-hash
    * at every position and a naive min over every window, vs the
    * native's rolling hash + monotonic deque. No Spark-HOF twin here, on
    * purpose: `substr(text, i, 1)` scans the UTF8String from the start
    * (O(i) per call — no random character access in UTF-8), so any HOF
    * formulation of per-position k-grams is O(n²k) per document and a
    * corpus-wide comparison takes minutes; the DuckDB oracle (same
    * formula over `unicode(substr(...))`) remains the cross-engine
    * verification of the registered query. */
  private[graft] def winnowReference(text: String, k: Int, w: Int): Seq[Long] = {
    val cps = text.codePoints().toArray
    val m = cps.length - k + 1
    if (m <= 0) return Seq.empty
    val hs = Array.tabulate(m) { i =>
      var h = 0L
      var j = 0
      while (j < k) { h = (h * WinnowFp.B + cps(i + j)) % WinnowFp.M; j += 1 }
      h
    }
    if (m <= w) Seq(hs.min)
    else (0 to m - w).map(t => hs.slice(t, t + w).min).distinct.sorted
  }

  /** Shared winnow CTEs (hashes → per-window minima), reused by the
    * fingerprint dump, the overlap-pairs and the passage-decontamination
    * oracles (`source` rides along for the latter). */
  private val winnowCtes: String = s"""hashes AS (
  SELECT doc_id, source,
         list_transform(generate_series(1, length(text) - ${WinnowFp.DefaultK - 1}), i ->
           list_reduce(list_transform(generate_series(0, ${WinnowFp.DefaultK - 1}),
                         j -> CAST(unicode(substr(text, i + j, 1)) AS BIGINT)),
                       (a, c) -> (a * ${WinnowFp.B} + c) % ${WinnowFp.M})) AS hs
  FROM documents
  WHERE length(text) >= ${WinnowFp.DefaultK}),
wins AS (
  SELECT doc_id, source,
         CASE WHEN len(hs) <= ${WinnowFp.DefaultW} THEN [list_min(hs)]
              ELSE list_transform(generate_series(1, len(hs) - ${WinnowFp.DefaultW - 1}),
                     t -> list_min(hs[t:t+${WinnowFp.DefaultW - 1}])) END AS fps
  FROM hashes)"""

  val docFingerprintWinnowSql: String = s"""
WITH $winnowCtes
SELECT DISTINCT doc_id, unnest(fps) AS fp FROM wins"""

  /** Document-frequency cap for the winnow-overlap join: a fingerprint
    * present in more than this many documents is corpus boilerplate and
    * is dropped before pairing, bounding the worst join key at cap²
    * however pathological the corpus — the [[HotShingleDfCap]] posture
    * applied to fingerprints. */
  val WinnowDfCap = 50
  /** Minimum shared (surviving) fingerprints for a pair to be reported:
    * each shared fingerprint certifies a shared >= k+w-1-char passage,
    * so this is "at least 10 distinct shared passages". */
  val WinnowSharedMin = 10

  /** Passage-overlap candidate pairs from winnowing fingerprints: the
    * document-level composition of [[docFingerprintWinnow]]. Every pair
    * of documents sharing >= [[WinnowSharedMin]] surviving fingerprints,
    * with the shared count. Scale shape: banded equality self-join on
    * `fp` (b·N join rows, no all-pairs), hot keys removed by the
    * broadcast df-cap anti-join, then one hash aggregation on the pair —
    * the same blocking discipline as the Jaccard/LSH families. */
  def winnowOverlapPairs(spark: SparkSession, dir: String): DataFrame =
    winnowOverlapPairsOver(docs(spark, dir))

  /** Parameterized core over any docs frame — the planted-passage
    * recall spec drives the REGISTERED detector through this. */
  private[graft] def winnowOverlapPairsOver(d: DataFrame): DataFrame = {
    val fps = winnowFpsOver(d)
    val hot = fps.groupBy("fp")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > WinnowDfCap)
      .select("fp")
    val kept = fps.join(broadcast(hot), Seq("fp"), "left_anti")
    kept.as("a")
      .join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= WinnowSharedMin)
  }

  val winnowOverlapPairsSql: String = s"""
WITH $winnowCtes,
fpr AS (SELECT DISTINCT doc_id, unnest(fps) AS fp FROM wins),
hot AS (SELECT fp FROM fpr GROUP BY fp HAVING COUNT(*) > $WinnowDfCap),
kept AS (SELECT * FROM fpr ANTI JOIN hot USING (fp))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_fps
FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= $WinnowSharedMin"""

  /** Passage-level contamination threshold: distinct shared (non-hot)
    * fingerprints at which a train document is flagged against the
    * benchmark slice. High here because this synthetic corpus is
    * pathologically self-similar (tiny vocabulary — the median train doc
    * shares ~60 fingerprints with the benchmark); a real corpus flags at
    * a handful, since each fingerprint certifies a distinct shared
    * >= 11-char passage. The knob sits where the semantics are. */
  val WinnowContaminationMinShared = 100

  /** (doc_id, source, fp) with corpus-wide hot fingerprints removed —
    * shared by [[winnowDecontamination]] and its streaming twin. */
  private[graft] def cappedSourceWinnowFps(spark: SparkSession, dir: String): DataFrame = {
    val fps = docs(spark, dir).repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("source"),
        explode(WinnowFp.of(col("text"))).as("fp"))
    val hot = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") > WinnowDfCap).select("fp")
    fps.join(broadcast(hot), Seq("fp"), "left_anti")
  }

  /** The benchmark slice's capped fingerprint vocabulary as driver-side
    * values (eval suites are small by definition) — ships to executors
    * as one array literal for the stateless streaming twin. Hot
    * fingerprints are already absent, so a stream-side
    * `array_intersect` count equals the batch join count exactly. */
  def benchmarkWinnowVocab(spark: SparkSession, dir: String): Seq[Long] =
    cappedSourceWinnowFps(spark, dir)
      .filter(col("source") === BenchmarkSource)
      .select("fp").distinct()
      .collect().map(_.getLong(0)).toSeq.sorted

  /** Passage-level train/benchmark decontamination — [[decontamination]]
    * catches verbatim word-trigram overlap; this catches COPIED PASSAGES
    * via winnowing fingerprints (any shared >= k+w-1-char run is
    * guaranteed a shared fingerprint, SIGMOD'03 theorem 1), robust to
    * tokenization differences. Train docs sharing >=
    * [[WinnowContaminationMinShared]] surviving fingerprints with the
    * benchmark slice are flagged. Scale: vocab is benchmark-sized
    * (broadcast), the join is fp-equality, the df-cap bounds hot keys. */
  def winnowDecontamination(spark: SparkSession, dir: String): DataFrame = {
    val capped = cappedSourceWinnowFps(spark, dir)
    val vocab = capped.filter(col("source") === BenchmarkSource)
      .select("fp").distinct()
    capped.filter(col("source") =!= BenchmarkSource)
      .join(broadcast(vocab), "fp")
      .groupBy("doc_id").agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= WinnowContaminationMinShared)
  }

  // lazy: interpolates BenchmarkSource, declared further down the object
  // body — an eager val would capture null at initialization order
  lazy val winnowDecontaminationSql: String = s"""
WITH $winnowCtes,
fpr AS (SELECT DISTINCT doc_id, source, unnest(fps) AS fp FROM wins),
hot AS (SELECT fp FROM fpr GROUP BY fp HAVING COUNT(*) > $WinnowDfCap),
kept AS (SELECT * FROM fpr ANTI JOIN hot USING (fp)),
vocab AS (SELECT DISTINCT fp FROM kept WHERE source = '$BenchmarkSource')
SELECT k.doc_id, COUNT(*) AS shared_fps
FROM kept k JOIN vocab v ON k.fp = v.fp
WHERE k.source <> '$BenchmarkSource'
GROUP BY k.doc_id
HAVING COUNT(*) >= $WinnowContaminationMinShared"""

  // -------------------------------------------------------------- dedup

  /** Exact deduplication: hash-groupBy on content, keep the minimum
    * doc_id per cluster. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5(col("text")).as("content_md5"))
      .agg(count(lit(1)).as("dup_count"), min("doc_id").as("keeper_doc_id"))

  val dedupExactSql: String = """
SELECT md5(text) AS content_md5, COUNT(*) AS dup_count, MIN(doc_id) AS keeper_doc_id
FROM documents GROUP BY md5(text)"""

  /** Canonicalization rule for near-exact dedup: Unicode NFC first
    * (composed and decomposed accents must agree BEFORE any byte-level
    * rule — [[graft.functions.NfcNormalize]] on the Spark side, DuckDB's
    * built-in of the same name on the oracle side), then lowercase,
    * strip non-alphanumerics (keeping whitespace), collapse whitespace
    * runs, trim. ONE template instantiated for both engines — they
    * differ only in string-literal escaping (Spark unescapes `\\s`
    * once, DuckDB takes `\s` literally) and the global-replace flag. */
  private def canonicalTpl(ws: String, g: String): String =
    s"trim(regexp_replace(regexp_replace(lower(nfc_normalize(text)), '[^a-z0-9$ws]', ''$g), '$ws+', ' '$g))"

  /** Near-exact deduplication over CANONICALIZED content: the standard
    * first rung above byte-identity in a dedup ladder (exact →
    * canonical → MinHash/SimHash). Case flips, punctuation, and
    * whitespace reflow — the most common trivial edits in a scraped
    * corpus — hash to the same cluster here while remaining invisible
    * to [[dedupExact]]. Same distributed shape: hash-groupBy on the
    * canonical digest, partial-aggregated, no join. */
  /** The Spark-side canonical digest (exposed for the spec, which
    * drives it over synthesized case/punctuation/whitespace variants). */
  private[graft] val canonicalMd5E: String = s"md5(${canonicalTpl("\\\\s", "")})"

  def dedupCanonical(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(expr(canonicalMd5E).as("canonical_md5"))
      .agg(count(lit(1)).as("dup_count"), min("doc_id").as("keeper_doc_id"))

  val dedupCanonicalSql: String = s"""
SELECT md5(${canonicalTpl("\\s", ", 'g'")}) AS canonical_md5,
       COUNT(*) AS dup_count, MIN(doc_id) AS keeper_doc_id
FROM documents GROUP BY 1"""

  /** Document-frequency cap for the Jaccard/cluster blocking join: a
    * shingle present in more than this many documents is boilerplate
    * (license headers, navigation chrome) and is dropped from the
    * shingle REPRESENTATION — both sizes and intersections — so the
    * Jaccard stays an exact set similarity over the capped sets. The
    * join cost per shingle is df², so the cap bounds the worst key at
    * cap² regardless of corpus size; the hot list itself is tiny by
    * construction and anti-joins as a broadcast. Measured max df here is
    * 7 (sf0.01) / 25 (sf0.1), so the default never binds on the test
    * corpora — JaccardCapSpec exercises a corpus where it does. */
  val HotShingleDfCap = 100

  /** Shared candidate-pair core of the Jaccard and containment ops:
    * per-pair intersection counts and capped per-doc set sizes over a
    * (doc_id, s) DISTINCT-shingle relation. Pass 1 computes df per
    * shingle and drops the > `dfCap` hot set (broadcast anti-join) —
    * this stays a count-only pass so no boilerplate shingle ever
    * collects a corpus-sized doc list. Pass 2 groups the capped stream
    * into per-shingle sorted doc arrays (≤ dfCap elements) and
    * materializes pairs INSIDE each array via the combination HOF —
    * the Basket discipline. Versus the previous shingle-equality
    * self-join this removes two full scan+shingle explodes (the plan
    * read documents 4×: hot, both join sides, sizes; now 2×) and the
    * join itself: one (s)-keyed exchange carries doc ids only, pairs
    * never shuffle as join probes, and the per-doc sizes re-derive
    * from the same grouped cells (ReusedExchange), not a third scan.
    * Pair stream and results are identical: sorted-array combinations
    * enumerate exactly the a.s = b.s ∧ doc_a < doc_b matches. */
  private def cappedPairCore(sh: DataFrame, dfCap: Int): (DataFrame, DataFrame) = {
    val hot = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select("s")
    val capped = sh.join(broadcast(hot), Seq("s"), "left_anti")
    val cells = capped.groupBy("s")
      .agg(array_sort(collect_list(col("doc_id"))).as("ds"))
    val inter = cells
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
          |  transform(slice(ds, i + 2, size(ds)), y -> struct(x AS a, y AS b))))"""
          .stripMargin)).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
    val sizes = cells.select(explode(col("ds")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    (inter, sizes)
  }

  /** Jaccard >= `threshold` near-dup pairs over a (doc_id, s) shingle
    * relation, with the df > `dfCap` hot shingles removed from the
    * representation before pairing ([[cappedPairCore]]). */
  def jaccardPairsOverShingles(sh: DataFrame, dfCap: Int = HotShingleDfCap,
                               threshold: Double = 0.7): DataFrame = {
    val (inter0, sizes) = cappedPairCore(sh, dfCap)
    val inter = inter0.withColumnRenamed("i", "inter")
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double")
          / (col("na") + col("nb") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact word-trigram Jaccard near-duplicate pairs (J >= 0.7): explode
    * distinct shingles, drop hot shingles ([[HotShingleDfCap]]), pair
    * docs inside each shingle cell ([[cappedPairCore]]), count
    * intersections, compute |A∩B| / (|A|+|B|-|A∩B|). */
  def dedupJaccardPairs(spark: SparkSession, dir: String): DataFrame =
    jaccardPairsOverShingles(
      docs(spark, dir).select(col("doc_id"), explode(shinglesNative).as("s")))

  /** Shared oracle CTEs: tokenize → distinct shingles → df-capped
    * shingles (mirrors [[jaccardPairsOverShingles]]; reused by the
    * dedup_clusters oracle). */
  private[text] def shingleCtes(cap: Int): String = s"""
tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
sh0 AS (SELECT DISTINCT doc_id,
              unnest(CASE WHEN len(w) >= 3 THEN
                       list_transform(generate_series(1, len(w) - 2),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                     ELSE [] END) AS s
       FROM tok),
hot AS (SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) > $cap),
sh AS (SELECT doc_id, s FROM sh0 ANTI JOIN hot USING (s)),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)"""

  val dedupJaccardPairsSql: String = s"""
WITH ${shingleCtes(HotShingleDfCap)}
SELECT doc_a, doc_b,
       CAST(i AS DOUBLE) / CAST(x.n + y.n - i AS DOUBLE) AS jaccard
FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
WHERE CAST(i AS DOUBLE) / CAST(x.n + y.n - i AS DOUBLE) >= 0.7"""

  /** Containment operating point: the smaller document's shingle set is
    * ≥ 90% inside the other's. */
  val ContainmentThreshold = 0.9

  /** Broder CONTAINMENT near-dup pairs — |A∩B| / min(|A|, |B|) ≥
    * `threshold` — over the same df-capped distinct-shingle relation as
    * [[jaccardPairsOverShingles]]. Containment is the asymmetric
    * companion to resemblance (Jaccard): a 50-shingle document quoted
    * verbatim inside a 1000-shingle page has J ≈ 0.05 — structurally
    * invisible to any resemblance threshold — but containment 1.0.
    * Scraped corpora are full of exactly this shape (article + chrome,
    * quote inclusion, boilerplate wrapping), and a dedup ladder that
    * only tests resemblance ships the duplicate. Same distributed
    * shape and cost as the Jaccard op: candidates paired inside the
    * df-capped shingle cells ([[cappedPairCore]] — never all-pairs;
    * the cap bounds the worst cell at cap² pairs), sizes from the same
    * grouped cells, one exact integer divide per surviving pair
    * (IEEE-identical across engines, no summation to snap). */
  def containmentPairsOverShingles(sh: DataFrame,
                                   dfCap: Int = HotShingleDfCap,
                                   threshold: Double = ContainmentThreshold): DataFrame = {
    val (inter0, sizes) = cappedPairCore(sh, dfCap)
    val inter = inter0.withColumnRenamed("i", "n_common")
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "n_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("n_a"), col("n_b"),
        (col("n_common").cast("double")
          / least(col("n_a"), col("n_b")).cast("double")).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Word-trigram containment pairs over the corpus (registered op). */
  def dedupContainmentPairs(spark: SparkSession, dir: String): DataFrame =
    containmentPairsOverShingles(
      docs(spark, dir).select(col("doc_id"), explode(shinglesNative).as("s")))

  val dedupContainmentPairsSql: String = s"""
WITH ${shingleCtes(HotShingleDfCap)}
SELECT doc_a, doc_b, CAST(i AS BIGINT) AS n_common,
       CAST(x.n AS BIGINT) AS n_a, CAST(y.n AS BIGINT) AS n_b,
       CAST(i AS DOUBLE) / CAST(least(x.n, y.n) AS DOUBLE) AS containment
FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
WHERE CAST(i AS DOUBLE) / CAST(least(x.n, y.n) AS DOUBLE) >= $ContainmentThreshold"""

  // ------------------------------------------- decontamination/repetition

  /** Benchmark source held out by [[decontamination]]. */
  val BenchmarkSource = "src0"
  /** Distinct shared shingles at which a train doc counts as
    * contaminated. */
  val ContaminationMinShared = 3

  /** Train/benchmark decontamination — the overlap check every training
    * pipeline runs before shipping a corpus: a train document sharing
    * ≥ [[ContaminationMinShared]] distinct (df-capped) shingles with any
    * benchmark document is flagged, with how many shingles and how many
    * benchmark docs it hits. The benchmark here is the `source =
    * BenchmarkSource` slice of `documents`; in production it is the eval
    * suites. Scale: the benchmark shingle set is tiny relative to the
    * corpus (broadcastable), the join is shingle-equality (never
    * all-pairs), and [[HotShingleDfCap]] keeps boilerplate shingles from
    * counting as contamination or exploding the join. */
  /** (doc_id, source, s) with the df > [[HotShingleDfCap]] shingles
    * removed — shared by [[decontamination]] and its streaming twin. */
  private[graft] def cappedSourceShingles(spark: SparkSession, dir: String): DataFrame = {
    val sh = docs(spark, dir)
      .select(col("doc_id"), col("source"), explode(shinglesNative).as("s"))
    val hot = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > HotShingleDfCap).select("s")
    sh.join(broadcast(hot), Seq("s"), "left_anti")
  }

  /** The capped benchmark shingle vocabulary as driver-side values —
    * bounded by the benchmark corpus (eval suites are small by
    * definition), it ships to executors as one array literal for the
    * stateless streaming decontamination filter. */
  def benchmarkShingleVocab(spark: SparkSession, dir: String): Seq[String] =
    cappedSourceShingles(spark, dir)
      .filter(col("source") === BenchmarkSource)
      .select("s").distinct()
      .collect().map(_.getString(0)).toSeq.sorted

  def decontamination(spark: SparkSession, dir: String): DataFrame = {
    val capped = cappedSourceShingles(spark, dir)
    val bench = capped.filter(col("source") === BenchmarkSource)
      .select(col("s"), col("doc_id").as("bench_doc"))
    capped.filter(col("source") =!= BenchmarkSource)
      .select("doc_id", "s")
      .join(bench, "s")
      .groupBy("doc_id")
      .agg(
        countDistinct(col("s")).as("shared_shingles"),
        countDistinct(col("bench_doc")).as("matched_bench_docs"))
      .filter(col("shared_shingles") >= ContaminationMinShared)
  }

  val decontaminationSql: String = s"""
WITH tok AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
sh0 AS (SELECT DISTINCT doc_id, source,
              unnest(CASE WHEN len(w) >= 3 THEN
                       list_transform(generate_series(1, len(w) - 2),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                     ELSE [] END) AS s
       FROM tok),
hot AS (SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) > $HotShingleDfCap),
sh AS (SELECT doc_id, source, s FROM sh0 ANTI JOIN hot USING (s)),
bench AS (SELECT s, doc_id AS bench_doc FROM sh WHERE source = '$BenchmarkSource'),
tr AS (SELECT doc_id, s FROM sh WHERE source <> '$BenchmarkSource')
SELECT tr.doc_id,
       COUNT(DISTINCT tr.s) AS shared_shingles,
       COUNT(DISTINCT bench.bench_doc) AS matched_bench_docs
FROM tr JOIN bench ON tr.s = bench.s
GROUP BY tr.doc_id
HAVING COUNT(DISTINCT tr.s) >= $ContaminationMinShared"""

  /** Bloom-filter decontamination — the same flag set as
    * [[decontamination]], produced through the membership structure a
    * 100 TB pipeline actually ships to its map tasks. The exact check
    * equi-joins every train shingle against the benchmark vocabulary;
    * that is fine while the vocabulary broadcasts as rows, but the
    * standing production artifact for "is this shingle in the eval
    * suites?" is a Bloom filter: ~8 bits per member instead of the
    * string bytes, probed map-side with zero shuffle on the train side.
    * Build: one `BloomFilterAggregate` pass over the distinct capped
    * benchmark shingles (a tree-reduced one-row aggregate; the only
    * driver materialization is the filter's own bytes). Probe:
    * `BloomFilterMightContain(literal bloom, xxhash64(s))` — codegen'd,
    * partition-local.
    *
    * Oracle discipline: Bloom hit-counts are hash-layout-specific
    * (DuckDB cannot replay them), but the structure's defining guarantee
    * — NO FALSE NEGATIVES, so every exactly-contaminated doc's
    * `bloom_hits >= shared_shingles >= ContaminationMinShared` — is
    * provable for any layout. The registered frame is the exact
    * contaminated set (deterministic) with that contract evaluated
    * in-plan; the oracle expects literal TRUE. False-POSITIVE behavior
    * (the rate the sketch trades for its size) is spec-bounded instead
    * (BloomDecontaminationSpec). */
  def bloomDecontamination(spark: SparkSession, dir: String): DataFrame = {
    val b = org.apache.spark.sql.GraftColumnBridge
    val capped = cappedSourceShingles(spark, dir)
    val benchVocab = capped.filter(col("source") === BenchmarkSource)
      .select("s").distinct()
    // conf-default sizing (1M expected members ≈ 1 MB) — eval-suite
    // vocabularies are far smaller, so the realized fp rate is ~0 and
    // the build stays ONE corpus pass (a sizing count() would be a
    // second); a 100 TB deployment sizes explicitly via the 2-arg
    // BloomFilterAggregate constructor instead
    val bloomBytes = benchVocab
      .agg(b.toColumn(
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          b.toExpression(xxhash64(col("s")))).toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val mightContain = b.toColumn(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        b.toExpression(lit(bloomBytes)), b.toExpression(xxhash64(col("s")))))

    // ONE aggregation over the train shingles carries both counters:
    // the bloom probe is a map-side flag, the exact membership a left
    // join against the (broadcast, distinct) benchmark vocabulary —
    // per-doc shingles are already distinct, so count(in_bench) is the
    // distinct shared count
    val train = capped.filter(col("source") =!= BenchmarkSource).select("doc_id", "s")
    val bench = benchVocab.withColumn("in_bench", lit(true))
    train
      .withColumn("bloom_hit", mightContain)
      .join(broadcast(bench), Seq("s"), "left")
      .groupBy("doc_id")
      .agg(
        count(when(col("in_bench"), 1)).as("shared_shingles"),
        sum(when(col("bloom_hit"), lit(1L)).otherwise(lit(0L))).as("bloom_hits"))
      .filter(col("shared_shingles") >= ContaminationMinShared)
      .select(col("doc_id"), col("shared_shingles"),
        (col("bloom_hits") >= col("shared_shingles") &&
          col("bloom_hits") >= lit(ContaminationMinShared.toLong))
          .as("bloom_no_false_negative"))
  }

  val bloomDecontaminationSql: String = s"""
WITH tok AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
sh0 AS (SELECT DISTINCT doc_id, source,
              unnest(CASE WHEN len(w) >= 3 THEN
                       list_transform(generate_series(1, len(w) - 2),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                     ELSE [] END) AS s
       FROM tok),
hot AS (SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) > $HotShingleDfCap),
sh AS (SELECT doc_id, source, s FROM sh0 ANTI JOIN hot USING (s)),
bench AS (SELECT DISTINCT s FROM sh WHERE source = '$BenchmarkSource'),
tr AS (SELECT doc_id, s FROM sh WHERE source <> '$BenchmarkSource')
SELECT tr.doc_id,
       COUNT(DISTINCT tr.s) AS shared_shingles,
       TRUE AS bloom_no_false_negative
FROM tr JOIN bench ON tr.s = bench.s
GROUP BY tr.doc_id
HAVING COUNT(DISTINCT tr.s) >= $ContaminationMinShared"""

  /** Intra-document repetition (the Gopher-style quality signal the
    * per-doc stats lack): 1 - distinct/total trigram ratio. NULL when
    * the document is too short to have a trigram — division semantics
    * differ across engines, so the guard is explicit. Narrow
    * projection, no shuffle. */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    val total = greatest(lit(0L), (expr(s"size($toksE)") - 2).cast("long"))
    docs(spark, dir).select(
      col("doc_id"),
      total.as("n_shingles_total"),
      size(shinglesNative).cast("long").as("n_shingles_distinct"))
      .withColumn("repetition_ratio",
        when(col("n_shingles_total") > 0,
          lit(1.0) - col("n_shingles_distinct").cast("double")
            / col("n_shingles_total").cast("double")))
  }

  val textRepetitionSql: String = """
WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
c AS (SELECT doc_id,
             CAST(greatest(0, len(w) - 2) AS BIGINT) AS n_shingles_total,
             CAST(CASE WHEN len(w) >= 3 THEN
                    len(list_distinct(list_transform(generate_series(1, len(w) - 2),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])))
                  ELSE 0 END AS BIGINT) AS n_shingles_distinct
      FROM t)
SELECT doc_id, n_shingles_total, n_shingles_distinct,
       CASE WHEN n_shingles_total > 0 THEN
         1.0 - CAST(n_shingles_distinct AS DOUBLE) / CAST(n_shingles_total AS DOUBLE)
       END AS repetition_ratio
FROM c"""

  // ------------------------------------------------------- MinHash + LSH

  /** 16-permutation MinHash signature (md5-derived hash per seed) as an
    * in-row higher-order expression. */
  val minhashE: String =
    s"""transform(sequence(1, 16), i ->
          array_min(transform($shinglesE,
            s -> cast(conv(substr(md5(concat(cast(i as string), ':', s)), 1, 14), 16, 10) as bigint))))"""

  /** Size cap for a MinHash (band, band_hash) bucket — the
    * [[SimhashBucketCap]] posture applied to the wide-hash bands. A
    * MinHash band hash carries 4×56 bits, so unlike the 6-7-bit simhash
    * blocks a hot bucket here means MANY DOCUMENTS WITH THE SAME BAND
    * SIGNATURE (near-identical shingle sets), not unlucky collisions —
    * but the join cost is bucket² either way, and a low-entropy corpus
    * (tiny shared vocabulary, boilerplate-heavy) piles thousands of docs
    * into one band bucket and goes quadratic (measured 10.3× runtime for
    * 3× docs on the 30× scale replica before this cap). Recall
    * semantics: a qualifying pair is lost only when EVERY band it agrees
    * on is hot; such piles are [[dedupExact]] / [[dedupClusters]]
    * territory (the members are near-clones of each other by
    * construction — wide-hash band equality certifies it), not pairwise
    * enumeration territory. Mirrored in the oracle via a placeholder. */
  val MinhashBandCap = 200

  /** MinHash + LSH near-duplicate candidates: 16 minhashes → 4 bands of 4
    * hashed to buckets; pairs sharing a (non-hot, see [[MinhashBandCap]])
    * band bucket are candidates; estimated Jaccard = fraction of
    * matching signature positions. Fully oracle-verified (hashes are
    * md5-derived in both engines). */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    // repartition: the single-file input would otherwise compute every
    // signature on one core
    minhashPairsOverDocs(
      docs(spark, dir).repartition(spark.sparkContext.defaultParallelism),
      MinhashBandCap)

  /** (doc_id, mhs, band, band_hash) rows — one per LSH band per doc with
    * ≥ 3 tokens: the shared signature→band projection behind both the
    * full pairwise candidate join ([[minhashPairsOverDocs]]) and the
    * incremental corpus-index membership probe
    * ([[Incremental.dedupIncremental]]). */
  private[text] def minhashBands(d: DataFrame): DataFrame = {
    val sigs = d
      .filter(expr(s"size($toksE)") >= 3)
      .select(col("doc_id"), shinglesNative.as("sh"))
      .select(col("doc_id"),
        graft.functions.MinHashSig.signatureOf("sh").as("mhs"))
    sigs.select(
      col("doc_id"), col("mhs"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> md5(concat_ws(',', transform(slice(mhs, b * 4 + 1, 4), x -> cast(x as string)))))"))
        .as(Seq("band", "band_hash")))
  }

  /** Parameterized core over any (doc_id, text) frame — the spec drives
    * it with an adversarial single-signature corpus and a tiny cap
    * (MinhashCapSpec), mirroring [[simhashPairsOverDocs]]. Carrying mhs
    * through the band join (instead of joining sigs back per side)
    * evaluates the md5 signature subtree once per side instead of three
    * times; graft.functions.MinHashSig is the compiled twin of the
    * higher-order-function formulation in [[minhashE]] (kept above as
    * the executable spec) — same md5-derived values, ~4x faster. */
  private[graft] def minhashPairsOverDocs(d: DataFrame, bucketCap: Int): DataFrame = {
    val bands = minhashBands(d)
    val hot = bands.groupBy("band", "band_hash")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > bucketCap)
      .select("band", "band_hash")
    val kept = bands.join(broadcast(hot), Seq("band", "band_hash"), "left_anti")
    kept.as("a")
      .join(kept.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash")
          && col("a.doc_id") < col("b.doc_id"))
      // score BEFORE deduplicating the multi-band candidates: a pair's
      // est_jaccard is the same from whichever band certified it, so
      // max() over the pair group is the one shared value — and unlike
      // the previous dropDuplicates (a first() over the carried mhs
      // ARRAYS, not hash-aggregatable → two SortAggregate passes with
      // 2×16-long rows through the exchange), a (long, long, double)
      // HashAggregate combines map-side and shuffles 8-byte scores
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (expr("size(filter(zip_with(a.mhs, b.mhs, (x, y) -> x = y), v -> v))").cast("double")
          / lit(16.0)).as("est_jaccard"))
      .groupBy("doc_a", "doc_b")
      .agg(max(col("est_jaccard")).as("est_jaccard"))
  }

  /** Shared DuckDB CTE block reproducing [[minhashBands]]'s
    * tokens → shingles → 16-hash signature → 4 band hashes, used by both
    * the pairwise oracle below and [[Incremental.dedupIncrementalSql]]. */
  private[text] val minhashBandCtes: String = """
WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
shl AS (SELECT doc_id,
               list_distinct(list_transform(generate_series(1, len(w) - 2),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM tok WHERE len(w) >= 3),
mh AS (SELECT doc_id,
              list_transform(generate_series(1, 16), i ->
                list_min(list_transform(sh,
                  s -> CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || s), 1, 14))::UBIGINT AS BIGINT)))) AS mhs
       FROM shl),
bands AS (SELECT doc_id, b.b AS band,
                 md5(array_to_string(list_transform(mhs[b.b*4+1:b.b*4+4], x -> CAST(x AS VARCHAR)), ',')) AS band_hash
          FROM mh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) b)"""

  private val dedupMinhashLshSqlRaw: String = minhashBandCtes + """,
hot AS (SELECT band, band_hash FROM bands GROUP BY 1, 2 HAVING COUNT(*) > __MINHASH_CAP__),
kept AS (SELECT * FROM bands ANTI JOIN hot USING (band, band_hash)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM kept a JOIN kept b
           ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       CAST(len(list_filter(list_transform(generate_series(1, 16), i -> x.mhs[i] = y.mhs[i]), v -> v)) AS DOUBLE) / 16.0 AS est_jaccard
FROM cand JOIN mh x ON doc_a = x.doc_id JOIN mh y ON doc_b = y.doc_id"""

  val dedupMinhashLshSql: String =
    dedupMinhashLshSqlRaw.replace("__MINHASH_CAP__", MinhashBandCap.toString)

  /** Pairs at or above this estimated Jaccard count as near-dups in the
    * cross-source matrix (8 of 16 minhashes agreeing). */
  val SourceMatrixJaccard = 0.5

  /** Cross-source near-duplication matrix — the provenance rollup a
    * multi-feed corpus needs before mixture weighting: for every
    * (source, source) pair, how many near-dup document pairs
    * ([[dedupMinhashLsh]] candidates at est_jaccard ≥
    * [[SourceMatrixJaccard]]) cross them. Off-diagonal cells mean two
    * feeds crawl the same upstream (dedup BEFORE weighing them
    * separately); diagonal cells are intra-feed duplication — the
    * per-pair refinement of `source_accounting`'s per-feed dup rate.
    *
    * Exactness: est_jaccard is k/16 (dyadic — exact in a double), so
    * `matched_hashes` = Σk emitted as BIGINT is reproducible. Scale:
    * the pair set is already LSH-banded and df-capped; the two source
    * lookups are doc_id equi-joins (co-partitionable, no broadcast of
    * corpus-sized sides needed); the rollup output is bounded by
    * sources². */
  def dedupSourceMatrix(spark: SparkSession, dir: String): DataFrame = {
    val src = docs(spark, dir).select(col("doc_id"), col("source"))
    dedupMinhashLsh(spark, dir)
      .filter(col("est_jaccard") >= SourceMatrixJaccard)
      .join(src.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(src.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(
        least(col("sa.source"), col("sb.source")).as("source_a"),
        greatest(col("sa.source"), col("sb.source")).as("source_b"),
        (col("est_jaccard") * 16.0).cast("long").as("k"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("k")).cast(LongType).as("matched_hashes"))
      .orderBy("source_a", "source_b")
  }

  val dedupSourceMatrixSql: String = s"""
WITH pairs AS ($dedupMinhashLshSql),
src AS (SELECT doc_id, source FROM documents)
SELECT least(x.source, y.source) AS source_a,
       greatest(x.source, y.source) AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CAST(est_jaccard * 16.0 AS BIGINT)) AS BIGINT) AS matched_hashes
FROM pairs JOIN src x ON pairs.doc_a = x.doc_id
           JOIN src y ON pairs.doc_b = y.doc_id
WHERE est_jaccard >= $SourceMatrixJaccard
GROUP BY 1, 2 ORDER BY 1, 2"""

  // ------------------------------------------------------------- SimHash

  /** 60-bit SimHash per document (md5-derived hashes of the
    * CONTENT-bearing tokens, [[contentToksE]] — see there for why the
    * function-word features are excluded; +1/-1 bit votes over all
    * remaining occurrences) plus near-duplicate pairs at Hamming
    * distance <= 4 — found EXACTLY via pigeonhole banding: split the
    * hash into 5 exact 12-bit blocks; any pair differing in <= 4 bits
    * must agree on at least one block, so candidates come from
    * block-equality joins (the 100 TB path — no all-pairs comparison),
    * then the exact Hamming filter keeps no false positives. Width and
    * block size are a SCALE decision (see [[graft.functions
    * .SimHashSig]]): the earlier 32-bit hash gave 6-7-bit blocks whose
    * 64-128 bucket values saturate the [[SimhashBucketCap]] wholesale
    * once the corpus passes a few tens of thousands of docs (measured:
    * 0 candidates at 500k docs); 12-bit blocks hold expected occupancy
    * ~122 at 500k. */
  /** HOF reference form of the 60-bit SimHash (what the oracle mirrors);
    * [[graft.functions.SimHashSig]] is the compiled twin used below —
    * SimHashSigSpec asserts bit-equality. The HOF tree re-evaluates the
    * per-token md5 array once per bit position, so it is ~60× the work. */
  private[graft] val simhashHofE: String = {
    val harrE =
      s"transform($contentToksE, t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint))"
    s"""aggregate(sequence(0, 59), cast(0 as bigint), (acc, j) ->
          acc + if(aggregate($harrE, 0, (a, h) ->
                     a + if(((shiftright(h, j) & 1)) = 1, 1, -1)) > 0,
                   shiftleft(cast(1 as bigint), j), cast(0 as bigint)))"""
  }

  /** Size cap for a simhash (block, block_bits) bucket: hotter buckets
    * are dropped from candidate generation, bounding the worst join key
    * at cap² — discovered the hard way: a 10× low-entropy corpus grew
    * this join 12.6× (each block holds 6-7 bits, so a tiny-vocabulary
    * corpus piles thousands of docs into shared buckets and candidates
    * grow quadratically). Recall semantics: a qualifying pair is lost
    * only when EVERY block it agrees on is hot — on a corpus where
    * that's common, block-level candidates are degenerate anyway and
    * the exact [[dedupJaccardPairs]] or [[winnowOverlapPairs]] families
    * (feature-capped, not bucket-capped) are the right tool. The driver
    * corpus at sf0.01 has a max bucket of 123, so the oracle gate's
    * result set is unchanged by the cap. */
  val SimhashBucketCap = 200

  def dedupSimhashPairs(spark: SparkSession, dir: String): DataFrame =
    simhashPairsOverDocs(
      docs(spark, dir).repartition(spark.sparkContext.defaultParallelism),
      SimhashBucketCap)

  /** Parameterized core over any (doc_id, text) frame — the spec drives
    * it with an adversarial single-simhash corpus and a tiny cap
    * (SimhashCapSpec), mirroring [[jaccardPairsOverShingles]]. */
  private[graft] def simhashPairsOverDocs(d: DataFrame, bucketCap: Int): DataFrame = {
    val sh = d.select(col("doc_id"),
      graft.functions.SimHashSig.of(expr(contentToksE)).as("simhash60"))
    // blocks: five exact 12-bit slices [0-11], [12-23], ..., [48-59]
    val blocks = sh.select(col("doc_id"), col("simhash60"),
      posexplode(expr(
        """array(simhash60 & 4095,
                 shiftright(simhash60, 12) & 4095,
                 shiftright(simhash60, 24) & 4095,
                 shiftright(simhash60, 36) & 4095,
                 shiftright(simhash60, 48) & 4095)"""))
        .as(Seq("block", "block_bits")))
    val hot = blocks.groupBy("block", "block_bits")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > bucketCap)
      .select("block", "block_bits")
    val kept = blocks.join(broadcast(hot), Seq("block", "block_bits"), "left_anti")
    kept.as("a")
      .join(kept.as("b"),
        col("a.block") === col("b.block") && col("a.block_bits") === col("b.block_bits")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash60 ^ b.simhash60)").cast("long").as("hamming"))
      .filter(col("hamming") <= 4)
      .dropDuplicates("doc_a", "doc_b")
  }

  private val dedupSimhashPairsSqlRaw: String = """
WITH tok AS (SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\s+'),
                         t -> t NOT IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')) AS w
             FROM documents),
hs AS (SELECT doc_id,
              list_transform(w, t -> CAST(('0x' || substr(md5(t), 1, 15))::UBIGINT AS BIGINT)) AS harr
       FROM tok),
sh AS (SELECT doc_id,
              CAST(list_sum(list_transform(generate_series(0, 59), j ->
                CASE WHEN list_sum(list_transform(harr, h ->
                            CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                     THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash60
       FROM hs),
blocks AS (
  SELECT doc_id, simhash60, b.block,
         CASE b.block WHEN 0 THEN simhash60 & 4095
                      WHEN 1 THEN (simhash60 >> 12) & 4095
                      WHEN 2 THEN (simhash60 >> 24) & 4095
                      WHEN 3 THEN (simhash60 >> 36) & 4095
                      ELSE (simhash60 >> 48) & 4095 END AS block_bits
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS block) b),
hot AS (SELECT block, block_bits FROM blocks GROUP BY 1, 2 HAVING COUNT(*) > __SIMHASH_CAP__),
kept AS (SELECT * FROM blocks ANTI JOIN hot USING (block, block_bits))
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash60, b.simhash60)) AS BIGINT) AS hamming
FROM kept a JOIN kept b
  ON a.block = b.block AND a.block_bits = b.block_bits AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash60, b.simhash60)) <= 4"""

  val dedupSimhashPairsSql: String =
    dedupSimhashPairsSqlRaw.replace("__SIMHASH_CAP__", SimhashBucketCap.toString)

  // -------------------------------------------- BPE merge-pair mining

  /** How many top merge candidates the registered query emits. */
  val BpeTopMerges = 20

  /** The first scoring pass of BPE tokenizer training (Sennrich et al.,
    * 2016): count adjacent-symbol pairs across the corpus, weighted by
    * word frequency, and emit the top merge candidates — at initial
    * state the symbols are characters, so this is exactly the pair
    * table the trainer's first merge is argmax of.
    *
    * Scale posture — the reason this is Spark-shaped: the corpus
    * compresses to its VOCABULARY first (one word-keyed aggregation
    * with map-side partial combine; output is vocab-bounded, not
    * corpus-bounded), and every later stage runs over distinct words ×
    * their lengths. The pair key space after lowercasing letter-run
    * tokens is ≤ 26² = 676, so the second aggregation and the global
    * top-k window are constant-sized no matter the corpus. An
    * industrial BPE trainer at 100 TB does precisely this: one
    * corpus-sized pass to the word-frequency table, then merge
    * iterations over the vocabulary alone — the registered query IS
    * that first iteration's scoring step.
    *
    * Words are the lowercased letter-run tokens (the `[A-Za-z]+` slice
    * of the shared BPE-ish regex); pairs count per adjacent POSITION
    * ("aaa" contributes "aa" twice), the standard BPE statistic.
    * `n_words` = distinct vocabulary entries containing the pair.
    * Ties break on the pair string, so the top-k is deterministic. */
  def bpeMergePairs(spark: SparkSession, dir: String): DataFrame = {
    val vocab = docs(spark, dir)
      .select(explode(expr("regexp_extract_all(text, '[A-Za-z]+', 0)")).as("w"))
      .select(lower(col("w")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    vocab
      .filter(length(col("word")) >= 2)
      .select(col("word"), col("cnt"),
        explode(expr(
          "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
          .as("pair"))
      .groupBy("pair")
      .agg(sum(col("cnt")).cast(LongType).as("merge_count"),
        countDistinct(col("word")).as("n_words"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("merge_count").desc, col("pair").asc)).cast(LongType))
      .filter(col("rank") <= BpeTopMerges)
      .select(col("rank"), col("pair"), col("merge_count"), col("n_words"))
      .orderBy("rank")
  }

  val bpeMergePairsSql: String = s"""
WITH w AS (
  SELECT lower(unnest(regexp_extract_all(text, '[A-Za-z]+'))) AS word
  FROM documents),
v AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word),
p AS (
  SELECT unnest(list_transform(generate_series(1, length(word) - 1),
                i -> substr(word, i, 2))) AS pair, cnt, word
  FROM v WHERE length(word) >= 2),
a AS (
  SELECT pair, CAST(SUM(cnt) AS BIGINT) AS merge_count,
         CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words
  FROM p GROUP BY pair)
SELECT rank, pair, merge_count, n_words FROM (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY merge_count DESC, pair ASC) AS BIGINT) AS rank,
         pair, merge_count, n_words
  FROM a)
WHERE rank <= $BpeTopMerges
ORDER BY rank"""

  // -------------------------------------------- BPE iterative training

  /** How many merge ITERATIONS the trained tokenizer runs. Industrial
    * trainers run 30k+; 64 is the largest budget the unrolled DuckDB
    * training replay (one CTE trio per iteration) verifies in
    * reasonable oracle time, and already demonstrates every regime a
    * big budget exercises: chained multi-symbol merges, vocabulary
    * words collapsing to single tokens, and (on small corpora)
    * early exhaustion — both engines stop emitting rows when no
    * adjacent pair remains. */
  val BpeTrainIters = 64

  /** Vocabulary-size ceiling for DRIVER-SIDE training: above it the
    * trainer falls back to the distributed per-iteration loop. The
    * vocab is DISTINCT lowercase letter-runs — bounded by the language
    * (a few million types covers web-scale English), not by corpus
    * rows, which is why every industrial BPE trainer runs exactly this
    * shape: one distributed word-count pass, then local merge
    * iterations with incremental pair maintenance. A production
    * deployment also sets a min-frequency floor on the vocab; this
    * registry keeps the floor at 1 so the oracle replay stays the
    * plain textbook loop. */
  val BpeMaxLocalVocab = 5000000

  /** Top-k rows the trained-tokenizer histogram emits. */
  val BpeTopTokens = 30

  /** Initial segmentation: the word as space-joined characters. */
  private val bpeCharSegE =
    "array_join(transform(sequence(1, length(word)), i -> substring(word, i, 1)), ' ')"

  /** One BPE merge rule (a, b) applied to a space-joined symbol string
    * as a single left fold — the standard greedy left-to-right apply.
    * The accumulator is the already-merged prefix (space-joined); a
    * merge fires when the prefix's LAST symbol is exactly `a` (checked
    * via the `' ' || a` suffix so `xa` never false-matches `a`) and the
    * incoming symbol is `b`. A left fold is equivalent to the textbook
    * "merge the leftmost occurrence, repeat" loop for any single rule:
    * the merged symbol `ab` can never re-form the pair's left element
    * with the NEXT token (its name differs from `a`), so one pass
    * suffices — BpeTrainSpec pins this against a from-scratch
    * repeat-leftmost implementation on adversarial runs (`aaaaaa`,
    * `ababab`). Symbols are lowercase letter-runs, so inlining them in
    * single quotes is safe. */
  private def bpeFoldE(segE: String, a: String, b: String): String = {
    val la = a.length
    s"""aggregate(split($segE, ' '), '', (acc, x) ->
       |  CASE WHEN acc = '' THEN x
       |       WHEN (acc = '$a' OR right(acc, ${la + 1}) = ' $a') AND x = '$b'
       |         THEN concat(substring(acc, 1, length(acc) - $la), '${a + b}')
       |       ELSE concat(acc, ' ', x) END)""".stripMargin
  }

  /** The word-frequency vocabulary as a PERSISTED asset ([[graft.sim
    * .IndexStore]] protocol, the BM25-postings split applied to the
    * tokenizer family). The vocabulary is the tokenizer's only
    * corpus-sized input, and it is a pure function of the collection
    * vintage — yet through round 14 every apply-side op (histogram,
    * per-source accounting) re-ran the corpus-wide explode+groupBy per
    * CALL: at the dim-scaled 300× rung `bpe_token_histogram` measured
    * 111 s and `bpe_source_token_accounting` 65 s, ~5× a plain corpus
    * scan, all of it vocabulary rebuild. Stored at (source, word)
    * grain — vocab × sources rows, corpus-decoupled — so the corpus is
    * touched once per VINTAGE (not once per call, nor even once per
    * app): training re-aggregates the stored table to word grain,
    * accounting consumes it directly, and the per-source doc-count /
    * estimate rollup rides along as a second tiny table. */
  private val BpeVocabStoreVersion =
    "bpe-vocab-v1;word=lower-ascii-letter-runs;grain=source-word;stats=ndocs+est-ceil-chars-4"

  private[text] def bpeVocabStore(
      spark: SparkSession, dir: String): Map[String, DataFrame] =
    graft.sim.IndexStore.loadOrBuild(spark, dir, "bpe_vocab",
      BpeVocabStoreVersion,
      graft.sim.IndexStore.documentsFingerprint(spark, dir),
      Seq("source_vocab", "source_stats")) {
      val d = docs(spark, dir)
      Map(
        "source_vocab" -> d.select(col("source"),
            explode(expr("regexp_extract_all(text, '[A-Za-z]+', 0)")).as("w"))
          .select(col("source"), lower(col("w")).as("word"))
          .groupBy("source", "word").agg(count(lit(1)).as("cnt"))
          .sort("source", "word"),
        "source_stats" -> d.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(estBpeTokens).cast(LongType).as("est_tokens"))
          .sort("source"))
    }

  private def bpeVocab(spark: SparkSession, dir: String): DataFrame =
    bpeVocabStore(spark, dir)("source_vocab")
      .groupBy("word").agg(sum(col("cnt")).cast(LongType).as("cnt"))

  private def bpeVocabOver(d: DataFrame): DataFrame =
    d.select(explode(expr("regexp_extract_all(text, '[A-Za-z]+', 0)")).as("w"))
      .select(lower(col("w")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Run [[BpeTrainIters]] iterations of real BPE TRAINING (Sennrich et
    * al., 2016) and return the learned merge table as driver constants:
    * each iteration recounts adjacent-symbol pairs over the CURRENT
    * vocabulary segmentation (so later merges build on earlier merges'
    * output symbols — unlike [[bpeMergePairs]], which is the first
    * iteration's scoring table alone), picks the deterministic argmax
    * (count desc, then pair lexicographically), and re-segments.
    *
    * Scale posture: the corpus is touched ONCE (the word-frequency
    * aggregation, map-side partial combine, vocab-bounded output —
    * persisted across the loop and released before returning, the
    * [[graft.sim.Pq]] trainedCodebook discipline); every iteration is
    * an argmax over exploded adjacent pairs of the CACHED vocab — work
    * bounded by Σ|word| over DISTINCT words, independent of corpus row
    * count — and collects exactly one row. This is precisely how an
    * industrial BPE trainer runs at 100 TB: one pass to the
    * word-frequency table, merge iterations over the vocabulary alone. */
  /** Learned merge table per (app, corpus vintage, budget) — training
    * runs ONCE per corpus however many apply-side ops (histogram,
    * accounting, exact packing) ask for it in a session. Keyed on the
    * documents table's file-metadata fingerprint (the IndexStore
    * staleness convention), so a regenerated corpus retrains and a
    * stable one never does; other apps' entries evict on first touch
    * (the Warehouse.materialized discipline). */
  private val mergeCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, String, Int), Seq[(Long, String, String, Long)]]

  private[text] def bpeTrainedMerges(
      spark: SparkSession, dir: String): Seq[(Long, String, String, Long)] = {
    val appId = spark.sparkContext.applicationId
    mergeCache.keys.filter(_._1 != appId).foreach(mergeCache.remove)
    val fp = graft.sim.IndexStore.documentsFingerprint(spark, dir)
    mergeCache.getOrElseUpdate((appId, dir, fp, BpeTrainIters),
      bpeTrainedMergesOver(bpeVocab(spark, dir)))
  }

  /** Parameterized trainer over any (word, cnt) vocabulary frame — the
    * drift diagnostic trains it on corpus halves.
    *
    * This is the INDUSTRIAL trainer shape (Sennrich et al. 2016 as
    * productionized by every tokenizer library): ONE distributed pass
    * builds the word-frequency vocabulary, the vocabulary itself —
    * bounded by the language's type count, not corpus rows — trains
    * locally with INCREMENTAL pair maintenance: each iteration touches
    * only the words that contain the winning pair, retracting their
    * old adjacent-pair counts and adding the re-segmented ones, so an
    * iteration costs the winning pair's occurrence mass instead of a
    * full vocabulary re-count (the round-13 loop re-applied a k-deep
    * fold chain to EVERY word EVERY iteration — O(K²·vocab), plus a
    * Spark argmax job per merge; at a 64-merge budget the driver
    * round-trips alone dominated). A vocabulary past
    * [[BpeMaxLocalVocab]] falls back to the distributed loop
    * ([[bpeTrainedMergesDistributed]]). Semantics are bit-identical
    * across both paths and the DuckDB replay: counts are exact longs,
    * the argmax order is (count desc, a asc, b asc) over ASCII
    * letter-run symbols (binary == lexicographic), and the greedy
    * left-to-right apply is BpeTrainSpec-pinned against the fold. */
  private[text] def bpeTrainedMergesOver(
      vocabDf: DataFrame): Seq[(Long, String, String, Long)] = {
    val head = vocabDf.limit(BpeMaxLocalVocab + 1).collect()
    if (head.length > BpeMaxLocalVocab) bpeTrainedMergesDistributed(vocabDf)
    else {
      val wIdx = head.headOption.map(_.fieldIndex("word")).getOrElse(0)
      val cIdx = head.headOption.map(_.fieldIndex("cnt")).getOrElse(1)
      bpeTrainLocal(head.map(r => (r.getString(wIdx), r.getLong(cIdx))))
    }
  }

  /** The greedy left-to-right single-rule apply, loop form — exactly
    * [[bpeFoldE]]'s fold: merge when the output's LAST symbol is `a`
    * and the incoming symbol is `b` (the merged token's name differs
    * from `a`, so one pass suffices; BpeTrainSpec pins fold == loop ==
    * textbook repeat-leftmost). */
  private def bpeApplyRule(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (out.nonEmpty && out.last == a && syms(i) == b)
        out(out.length - 1) = a + b
      else out += syms(i)
      i += 1
    }
    out.toArray
  }

  /** Local incremental trainer core (see [[bpeTrainedMergesOver]]). */
  private[text] def bpeTrainLocal(
      vocab: Array[(String, Long)]): Seq[(Long, String, String, Long)] = {
    import scala.collection.mutable
    val syms = vocab.map { case (w, _) => w.toCharArray.map(_.toString) }
    val cnts = vocab.map(_._2)
    val pc = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.BitSet]
    // register/retract one word's adjacent pairs (with multiplicity —
    // the trainer counts occurrences, not containing words); occ keeps
    // the candidate index only (stale entries filtered at use)
    def bump(i: Int, sign: Long): Unit = {
      val s = syms(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = pc.getOrElse(p, 0L) + sign * cnts(i)
        if (c == 0L) pc.remove(p) else pc.update(p, c)
        if (sign > 0L) occ.getOrElseUpdate(p, mutable.BitSet.empty) += i
        j += 1
      }
    }
    syms.indices.foreach(bump(_, 1L))
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var k = 1
    while (k <= BpeTrainIters && pc.nonEmpty) {
      // deterministic argmax: count desc, then (a, b) lexicographic —
      // identical to the Spark orderBy and the DuckDB ORDER BY on
      // ASCII letter-run symbols
      var bp: (String, String) = null
      var bc = Long.MinValue
      pc.foreach { case (p, c) =>
        if (c > bc || (c == bc &&
          (p._1 < bp._1 || (p._1 == bp._1 && p._2 < bp._2)))) { bp = p; bc = c }
      }
      merges += ((k.toLong, bp._1, bp._2, bc))
      val cand = occ.remove(bp).getOrElse(mutable.BitSet.empty)
      cand.foreach { i =>
        val s = syms(i)
        var has = false
        var j = 0
        while (!has && j < s.length - 1) {
          has = s(j) == bp._1 && s(j + 1) == bp._2; j += 1
        }
        if (has) { // stale occ entries (word re-segmented since) skip here
          bump(i, -1L)
          syms(i) = bpeApplyRule(s, bp._1, bp._2)
          bump(i, 1L)
        }
      }
      k += 1
    }
    merges.result()
  }

  /** Distributed per-iteration fallback for vocabularies past the local
    * ceiling: the round-13 loop — each iteration one argmax over the
    * exploded adjacent pairs of the CACHED vocab under the rules
    * learned so far (k-deep fold chain), one bounded collect. Correct
    * at any vocabulary size; pays an extra vocab pass per iteration,
    * which is why the local path is the default. */
  private[text] def bpeTrainedMergesDistributed(
      vocabDf: DataFrame): Seq[(Long, String, String, Long)] = {
    val vocab = vocabDf.persist()
    try {
      val merges = Seq.newBuilder[(Long, String, String, Long)]
      var segE = bpeCharSegE
      var k = 1
      var exhausted = false
      while (k <= BpeTrainIters && !exhausted) {
        val best = vocab
          .select(col("cnt"), split(expr(segE), " ").as("l"))
          .filter(size(col("l")) >= 2)
          .select(col("cnt"), explode(expr(
            "transform(sequence(1, size(l) - 1), " +
              "i -> struct(element_at(l, i) AS a, element_at(l, i + 1) AS b))")).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("cnt")).cast(LongType).as("c"))
          .orderBy(col("c").desc, col("a").asc, col("b").asc)
          .limit(1)
          .collect()
        if (best.isEmpty) exhausted = true
        else {
          val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
          merges += ((k.toLong, a, b, c))
          segE = bpeFoldE(segE, a, b)
          k += 1
        }
      }
      merges.result()
    } finally { vocab.unpersist(); () }
  }

  /** The learned merge table — rank, the two merged symbols, and the
    * pair count that won the iteration. Registered so the oracle
    * replays the ENTIRE training loop (all [[BpeTrainIters]] argmax +
    * re-segment rounds) in DuckDB and must agree bit-for-bit. */
  def bpeTrainMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bpeTrainedMerges(spark, dir)
      .toDF("rank", "merge_a", "merge_b", "merge_count")
      .orderBy("rank")
  }

  /** Corpus subword-token histogram under the trained tokenizer: apply
    * the [[bpeTrainedMerges]] rules (as chained literal folds — the
    * merges are driver constants, the broadcast-free analogue of a
    * broadcast join against an 8-row table) to the vocabulary, explode
    * the resulting symbols, and weight by word frequency. The second
    * corpus-sized fact — how many tokens the trained tokenizer yields
    * per subword — again computed over DISTINCT words only. */
  def bpeTokenHistogram(spark: SparkSession, dir: String): DataFrame = {
    val segE = bpeTrainedSegE(spark, dir)
    bpeVocab(spark, dir)
      .select(col("word"), col("cnt"), explode(split(expr(segE), " ")).as("token"))
      .groupBy("token")
      .agg(sum(col("cnt")).cast(LongType).as("token_count"),
        countDistinct(col("word")).as("n_words"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("token_count").desc, col("token").asc)).cast(LongType))
      .filter(col("rank") <= BpeTopTokens)
      .select(col("rank"), col("token"), col("token_count"), col("n_words"))
      .orderBy("rank")
  }

  /** The unrolled training replay shared by both BPE-training oracles:
    * CTEs seg0..segN carry the evolving vocabulary segmentation, each
    * m<k> is that iteration's argmax, and the fold inside seg<k> is the
    * same greedy left-to-right apply as [[bpeFoldE]] (string
    * accumulator via list_reduce with a prepended '' sentinel, since
    * DuckDB's reduce has no explicit zero). */
  /** The CTE list (no WITH keyword) for one training replay, with a
    * TRAINING-collection restriction and a CTE-name prefix so two
    * chains can coexist in one statement (the
    * [[graft.sim.Ivf.ivfCommonCtesOver]] pattern). */
  private[text] def bpeTrainCteList(trainWhere: String, pfx: String): String = {
    // every chain CTE is AS MATERIALIZED: each seg<k> is referenced
    // twice (the pair scoring AND the next re-segmentation), and at a
    // 64-iteration budget DuckDB's default inlining re-expands the
    // chain until the duplicated base scans exhaust the process's file
    // handles ("Too many open files" at iters=64; fine at 8).
    // Materializing pins the replay to one evaluation per iteration —
    // linear, like the trainer it verifies.
    val head = s"""${pfx}w AS MATERIALIZED (
  SELECT lower(unnest(regexp_extract_all(text, '[A-Za-z]+'))) AS word FROM documents$trainWhere),
${pfx}v AS MATERIALIZED (SELECT word, COUNT(*) AS cnt FROM ${pfx}w GROUP BY word),
${pfx}seg0 AS MATERIALIZED (SELECT word, cnt,
  array_to_string(list_transform(generate_series(1, length(word)), i -> substr(word, i, 1)), ' ') AS seg
  FROM ${pfx}v)"""
    val iters = (1 to BpeTrainIters).map { k =>
      val p = k - 1
      s"""
${pfx}p$k AS MATERIALIZED (SELECT cnt, string_split(seg, ' ') AS l,
        unnest(generate_series(1, len(string_split(seg, ' ')) - 1)) AS i
        FROM ${pfx}seg$p),
${pfx}m$k AS MATERIALIZED (SELECT a, b, c FROM (
    SELECT l[i] AS a, l[i+1] AS b, CAST(SUM(cnt) AS BIGINT) AS c
    FROM ${pfx}p$k GROUP BY 1, 2 ORDER BY c DESC, a ASC, b ASC LIMIT 1)),
${pfx}seg$k AS MATERIALIZED (SELECT word, cnt,
  list_reduce(list_prepend('', string_split(seg, ' ')), (acc, x) ->
    CASE WHEN acc = '' THEN x
         WHEN (acc = m.a OR right(acc, length(m.a) + 1) = ' ' || m.a) AND x = m.b
           THEN substr(acc, 1, length(acc) - length(m.a)) || m.a || m.b
         ELSE acc || ' ' || x END) AS seg
  FROM ${pfx}seg$p LEFT JOIN ${pfx}m$k m ON TRUE)"""
    }
    (head +: iters).mkString(",")
  }

  private[text] def bpeTrainCtes: String = "WITH " + bpeTrainCteList("", "")

  val bpeTrainMergesSql: String = {
    val union = (1 to BpeTrainIters).map { k =>
      s"SELECT CAST($k AS BIGINT) AS rank, a AS merge_a, b AS merge_b, c AS merge_count FROM m$k"
    }.mkString(" UNION ALL ")
    s"$bpeTrainCtes\nSELECT * FROM ($union) ORDER BY rank"
  }

  /** Tokenizer-training STABILITY diagnostic — train the same 8-merge
    * BPE independently on the two doc_id-parity halves of the corpus
    * and line the learned rules up by rank: a tokenizer whose early
    * merges flip between halves is being trained on too little (or too
    * skewed) data to freeze, the question every subsampled tokenizer
    * run has to answer before committing a vocab. Same split
    * convention as [[graft.sim.EmbeddingDrift]] / `ivf_delta_assign`
    * (parity = yesterday's batch vs today's). `agree` is
    * COALESCE(..., FALSE) so an early-exhausted half compares as
    * drift, not NULL. Cost: two vocab-bounded training loops — the
    * corpus is still touched once per half. */
  def bpeMergeDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = docs(spark, dir)
    val even = bpeTrainedMergesOver(bpeVocabOver(d.filter(col("doc_id") % 2 === 0)))
      .map { case (r, a, b, _) => r -> (a, b) }.toMap
    val odd = bpeTrainedMergesOver(bpeVocabOver(d.filter(col("doc_id") % 2 === 1)))
      .map { case (r, a, b, _) => r -> (a, b) }.toMap
    val ranks = (even.keySet ++ odd.keySet).toSeq.sorted
    ranks.map { r =>
      val e = even.get(r); val o = odd.get(r)
      (r, e.map(_._1).orNull, e.map(_._2).orNull,
        o.map(_._1).orNull, o.map(_._2).orNull,
        e.nonEmpty && e == o)
    }.toDF("rank", "merge_a_even", "merge_b_even",
      "merge_a_odd", "merge_b_odd", "agree")
      .orderBy("rank")
  }

  val bpeMergeDriftSql: String = {
    def union(pfx: String) = (1 to BpeTrainIters).map { k =>
      s"SELECT CAST($k AS BIGINT) AS rank, a, b FROM ${pfx}m$k"
    }.mkString(" UNION ALL ")
    s"""
WITH ${bpeTrainCteList(" WHERE doc_id % 2 = 0", "e")},
${bpeTrainCteList(" WHERE doc_id % 2 = 1", "o")},
em AS (${union("e")}),
om AS (${union("o")})
SELECT rank,
       em.a AS merge_a_even, em.b AS merge_b_even,
       om.a AS merge_a_odd,  om.b AS merge_b_odd,
       COALESCE(em.a = om.a AND em.b = om.b, FALSE) AS agree
FROM em FULL JOIN om USING (rank)
ORDER BY rank"""
  }

  val bpeTokenHistogramSql: String = s"""$bpeTrainCtes,
tok AS (SELECT word, cnt, unnest(string_split(seg, ' ')) AS token FROM seg$BpeTrainIters)
SELECT rank, token, token_count, n_words FROM (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY token_count DESC, token ASC) AS BIGINT) AS rank,
         token, token_count, n_words
  FROM (SELECT token, CAST(SUM(cnt) AS BIGINT) AS token_count,
               CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words
        FROM tok GROUP BY token))
WHERE rank <= $BpeTopTokens ORDER BY rank"""

  /** The trained tokenizer as ONE segmentation expression: an outer
    * fold over the learned RULES array (driver constants after
    * [[bpeTrainedMerges]]'s bounded collect), whose step is the same
    * greedy per-rule fold as [[bpeFoldE]] with the rule symbols read
    * from the outer lambda variable. Sequential rule application in
    * rank order — semantically the chained-literal-fold form, but the
    * expression TREE stays constant-size however big the merge budget:
    * at 64 rules the chained form was a 64-deep nested-aggregate tree
    * whose Catalyst analysis alone cost multiple seconds per query
    * construction (bpe_token_histogram 1.2 s → 8.2 s when the budget
    * rose from 8; this form restores it). Evaluated per DISTINCT word. */
  private[text] def bpeTrainedSegE(spark: SparkSession, dir: String): String =
    bpeSegEFor(bpeTrainedMerges(spark, dir))

  /** The rules-array segmentation expression for a fixed merge table
    * (symbols are lowercase letter-runs — single-quote-inline safe). */
  private[text] def bpeSegEFor(merges: Seq[(Long, String, String, Long)]): String =
    if (merges.isEmpty) bpeCharSegE
    else {
      val rules = merges
        .map { case (_, a, b, _) => s"named_struct('a', '$a', 'b', '$b')" }
        .mkString("array(", ", ", ")")
      s"""aggregate($rules, $bpeCharSegE, (seg, m) ->
         |  aggregate(split(seg, ' '), '', (acc, x) ->
         |    CASE WHEN acc = '' THEN x
         |         WHEN (acc = m.a OR right(acc, length(m.a) + 1) = concat(' ', m.a)) AND x = m.b
         |           THEN concat(substring(acc, 1, length(acc) - length(m.a)), concat(m.a, m.b))
         |         ELSE concat(acc, ' ', x) END))""".stripMargin
    }

  /** Shared oracle tail for apply-side ops: per-word token counts of
    * the trained tokenizer (vocab grain, from the final seg CTE). */
  private[text] val bpeVocabTokSqlCte: String =
    s"vt AS (SELECT word, len(string_split(seg, ' ')) AS n_tok FROM seg$BpeTrainIters)"

  /** Exact per-source token accounting under the TRAINED tokenizer —
    * the mixture-weighting fact an LLM-data pipeline actually needs
    * (how many tokens each feed contributes), next to the ceil(chars/4)
    * ESTIMATE ([[estBpeTokens]]) the rest of the pipeline budgets with,
    * so the estimator's per-source bias is observable in one frame.
    *
    * Shape: the stored (source, word) vocabulary ([[bpeVocabStore]] —
    * vocab × sources rows, not corpus rows), the trained rules applied
    * per distinct (source, word) as chained literal folds, one
    * source-grain re-aggregation, and a source-grain join against the
    * stored per-doc estimate rollup. All emitted measures are exact
    * integers — nothing float-shaped to drift vs the oracle. */
  def bpeSourceTokenAccounting(spark: SparkSession, dir: String): DataFrame = {
    val segE = bpeTrainedSegE(spark, dir)
    // SERVE path: both corpus-sized facts — the (source, word)
    // vocabulary and the per-source doc/estimate rollup — come from the
    // stored vintage ([[bpeVocabStore]]); per-call cost is vocab×sources
    // bounded, corpus-decoupled.
    val store = bpeVocabStore(spark, dir)
    val perWord = store("source_vocab")
      .withColumn("n_tok", size(split(expr(segE), " ")).cast(LongType))
      .groupBy("source")
      .agg(sum(col("cnt") * col("n_tok")).cast(LongType).as("exact_tokens"),
        sum(col("cnt")).cast(LongType).as("n_words"),
        countDistinct(col("word")).as("n_distinct_words"))
    perWord.join(store("source_stats"), "source")
      .select(col("source"), col("n_docs"), col("n_words"),
        col("n_distinct_words"), col("exact_tokens"), col("est_tokens"))
      .orderBy("source")
  }

  val bpeSourceTokenAccountingSql: String = s"""$bpeTrainCtes,
sw AS (SELECT source, lower(unnest(regexp_extract_all(text, '[A-Za-z]+'))) AS word
       FROM documents),
swc AS (SELECT source, word, COUNT(*) AS cnt FROM sw GROUP BY 1, 2),
$bpeVocabTokSqlCte,
per AS (SELECT source,
          CAST(SUM(cnt * n_tok) AS BIGINT) AS exact_tokens,
          CAST(SUM(cnt) AS BIGINT) AS n_words,
          CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct_words
        FROM swc JOIN vt USING (word) GROUP BY source),
est AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM($estBpeTokensSqlE) AS BIGINT) AS est_tokens
        FROM documents GROUP BY source)
SELECT source, n_docs, n_words, n_distinct_words, exact_tokens, est_tokens
FROM per JOIN est USING (source) ORDER BY source"""

  val inventory: Map[String, Q] = Map(
    "text_stats"           -> (textStats _),
    "text_lang_id"         -> (langId _),
    "lang_confusion"       -> (langConfusion _),
    "doc_fingerprint"      -> (docFingerprint _),
    "dedup_exact"          -> (dedupExact _),
    "dedup_canonical"      -> (dedupCanonical _),
    "dedup_jaccard_pairs"  -> (dedupJaccardPairs _),
    "dedup_containment_pairs" -> (dedupContainmentPairs _),
    "dedup_minhash_lsh"    -> (dedupMinhashLsh _),
    "dedup_source_matrix"  -> (dedupSourceMatrix _),
    "dedup_simhash_pairs"  -> (dedupSimhashPairs _),
    "text_decontamination" -> (decontamination _),
    "bloom_decontamination" -> (bloomDecontamination _),
    "text_repetition"      -> (textRepetition _),
    "doc_fingerprint_winnow" -> (docFingerprintWinnow _),
    "winnow_overlap_pairs" -> (winnowOverlapPairs _),
    "winnow_decontamination" -> (winnowDecontamination _),
    "bpe_merge_pairs"      -> (bpeMergePairs _),
    "bpe_train_merges"     -> (bpeTrainMerges _),
    "bpe_token_histogram"  -> (bpeTokenHistogram _),
    "bpe_source_token_accounting" -> (bpeSourceTokenAccounting _),
    "bpe_merge_drift"      -> (bpeMergeDrift _))

  val oracle: Map[String, String] = Map(
    "text_stats"           -> textStatsSql,
    "text_lang_id"         -> langIdSql,
    "lang_confusion"       -> langConfusionSql,
    "doc_fingerprint"      -> docFingerprintSql,
    "dedup_exact"          -> dedupExactSql,
    "dedup_canonical"      -> dedupCanonicalSql,
    "dedup_jaccard_pairs"  -> dedupJaccardPairsSql,
    "dedup_containment_pairs" -> dedupContainmentPairsSql,
    "dedup_minhash_lsh"    -> dedupMinhashLshSql,
    "dedup_source_matrix"  -> dedupSourceMatrixSql,
    "dedup_simhash_pairs"  -> dedupSimhashPairsSql,
    "text_decontamination" -> decontaminationSql,
    "bloom_decontamination" -> bloomDecontaminationSql,
    "text_repetition"      -> textRepetitionSql,
    "doc_fingerprint_winnow" -> docFingerprintWinnowSql,
    "winnow_overlap_pairs" -> winnowOverlapPairsSql,
    "winnow_decontamination" -> winnowDecontaminationSql,
    "bpe_merge_pairs"      -> bpeMergePairsSql,
    "bpe_train_merges"     -> bpeTrainMergesSql,
    "bpe_token_histogram"  -> bpeTokenHistogramSql,
    "bpe_source_token_accounting" -> bpeSourceTokenAccountingSql,
    "bpe_merge_drift"      -> bpeMergeDriftSql)
}
