package graft.datagen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic distributed synthetic data generator — the Spark-native
  * re-expression of the reference's Faker-based generator (reference:
  * scripts/data_generation/generate_data.py:45-175: customers, products,
  * transactions with FK-consistent keys, items with computed line totals
  * rolled back up to transaction totals).
  *
  * Faker's RNG is replaced by md5-derived uniform values (deterministic,
  * seedable, and partition-independent — each row's randomness depends
  * only on (seed, table, row id), never on iteration order), so the same
  * call always generates the identical dataset on any cluster layout.
  * `spark.range` is the backbone: distributed, no driver materialization
  * (the reference builds Python lists in memory, generate_data.py:49-66).
  */
object DataGen {

  /** Uniform double in [0,1) from (seed, tag, id) — 48 bits of md5. */
  private def u(seed: Long, tag: String, idCol: String): org.apache.spark.sql.Column =
    expr(s"cast(conv(substr(md5(concat('$seed', ':', '$tag', ':', cast($idCol as string))), 1, 12), 16, 10) as double) / 281474976710656.0")

  private def pick(seed: Long, tag: String, idCol: String, values: Seq[String]) = {
    val arr = values.map(v => s"'$v'").mkString("array(", ", ", ")")
    expr(s"element_at($arr, 1 + cast(cast(conv(substr(md5(concat('$seed', ':', '$tag', ':', cast($idCol as string))), 1, 12), 16, 10) as double) / 281474976710656.0 * ${values.size} as int))")
  }

  def customers(spark: SparkSession, n: Long, seed: Long = 42): DataFrame =
    spark.range(n).select(
      col("id").as("customer_id"),
      concat(lit("Customer#"), lpad(col("id").cast("string"), 9, "0")).as("name"),
      concat(lit("customer"), col("id").cast("string"), lit("@example.com")).as("email"),
      pick(seed, "seg", "id", Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")).as("segment"),
      date_add(to_date(lit("1995-01-01")), (u(seed, "reg", "id") * 2000).cast("int")).as("registration_date"))

  def products(spark: SparkSession, n: Long, seed: Long = 42): DataFrame = {
    val price = round((u(seed, "price", "id") * 2400 + 100).cast("decimal(18,6)"), 2)
    spark.range(n).select(
      col("id").as("product_id"),
      concat(lit("Product "), col("id").cast("string")).as("product_name"),
      pick(seed, "cat", "id", Seq("Electronics", "Clothing", "Home", "Sports", "Books")).as("category"),
      price.as("price"),
      // cost = price * U(0.5, 0.8) (generate_data.py:92)
      round((price * (u(seed, "cost", "id") * lit(0.3) + lit(0.5)).cast("decimal(18,6)")), 2).as("cost"),
      (u(seed, "stock", "id") * 500).cast("int").as("stock_quantity"))
  }

  def transactions(spark: SparkSession, n: Long, nCustomers: Long, seed: Long = 42): DataFrame =
    spark.range(n).select(
      col("id").as("transaction_id"),
      (u(seed, "cust", "id") * nCustomers).cast("long").as("customer_id"),
      date_add(to_date(lit("2024-01-01")), (u(seed, "date", "id") * 365).cast("int")).as("transaction_date"),
      pick(seed, "pay", "id", Seq("Credit Card", "Debit Card", "PayPal", "Cash on Delivery", "UPI")).as("payment_method"))

  /** Items: 1-4 per transaction, FK-consistent; line_total =
    * qty * unit_price * (1 - discount/100) rounded to 2 (generate_data.py:
    * 139-152). */
  def transactionItems(spark: SparkSession, nTransactions: Long, nProducts: Long,
                       seed: Long = 42): DataFrame = {
    val base = spark.range(nTransactions)
      .select(col("id").as("transaction_id"),
        (u(seed, "nitems", "id") * 4 + 1).cast("int").as("n_items"))
      .select(col("transaction_id"), explode(expr("sequence(1, n_items)")).as("item_seq"))
    val itemId = concat(col("transaction_id"), lit("_"), col("item_seq"))
    val qty = (u(seed, "qty", "itm") * 5 + 1).cast("int")
    val unitPrice = round((u(seed, "uprice", "itm") * 2400 + 100).cast("decimal(18,6)"), 2)
    val disc = (u(seed, "disc", "itm") * 20).cast("decimal(18,6)")
    base.withColumn("itm", itemId)
      .select(
        col("transaction_id"), col("item_seq"),
        (u(seed, "prod", "itm") * nProducts).cast("long").as("product_id"),
        qty.as("quantity"),
        unitPrice.as("unit_price"),
        round(disc, 2).as("discount_percentage"),
        round((qty * unitPrice * (lit(1).cast("decimal(18,6)") - disc / 100)).cast("decimal(28,6)"), 2)
          .as("line_total"))
  }

  /** Transaction totals = sum of item line totals (generate_data.py:
    * 157-174's dict-lookup rollup, as a join — SURVEY §2.3 J5). */
  def withTotals(transactions: DataFrame, items: DataFrame): DataFrame =
    transactions.join(
      items.groupBy("transaction_id").agg(sum("line_total").as("total_amount")),
      Seq("transaction_id"), "left")

  /** Synthetic `documents` corpus with the driver testdata's shape
    * (doc_id, text, lang, source, n_chars; ~440-word vocabulary,
    * 15-60 tokens/doc, 20 sources, 5 langs) — the text-domain member of
    * the generator family, for scaling the LLM-pipeline operators
    * beyond the provided SFs. Same discipline as the retail generators:
    * every token is md5-derived from (seed, doc, position), so the
    * corpus is deterministic and partition-independent.
    *
    * NEAR-DUPLICATE REALISM: 10% of docs form clone piles of 5 (ids
    * [b, b+5) for every b ≡ 0 mod 50) — each member reuses its BASE
    * doc's token stream with one GUARANTEED token substitution plus 2%
    * per-position edits, the text twin of ScaleGen's jittered embedding
    * replicas. A further 6% form PASSAGE piles of 3 (ids [b+20, b+23)):
    * members keep their own independent token streams but share an
    * appended 16-token passage of md5-derived gibberish words UNIQUE to
    * the pile — the copied-paragraph shape the winnowing family exists
    * to find. The shared run is 143 chars ≥ 13·(k+w−1), so winnowing's
    * guarantee hands every member pair ≥ 13 distinct shared
    * fingerprints (> WinnowSharedMin = 10), and because the passage
    * vocabulary is keyed on the PILE id its fingerprints have df = 3 at
    * EVERY corpus size — they can never age past the df-cap the way
    * common-vocabulary fingerprints do (through round 13 the scaled
    * winnow rungs emitted 0 rows at 300× for exactly that reason:
    * every fingerprint two docs shared was corpus boilerplate).
    * A further 6% form MEDIA piles of 3 (ids [b+10, b+13)):
    * members perturb the base by 1-2 single-character substitutions —
    * length-preserving, so each member's 60-bit dHash sits within
    * Hamming ≤ 4 of its base and the multimodal phash near-dup family
    * has PLANTED image-like near-dups at every generated scale rung
    * (through round 11 its scale output came only from incidental
    * payload collisions). A real corpus is neither dup-free (fresh random text —
    * scaled text-dedup rungs measured cost against ~zero output) nor
    * fully degenerate (exact replication — every doc gains N-1 clones);
    * piles at ~1-3 token edits sit where the dedup family actually
    * operates: shingle-Jaccard mostly ≥0.7, MinHash/SimHash bands
    * collide, winnow fingerprints share passages, and `dedup_exact`
    * stays non-degenerate because the guaranteed edit keeps texts
    * distinct (up to the ~3% chance the substituted token matches).
    *
    * TOKEN-MASS REALISM: stopwords are drawn with a per-doc propensity
    * in [0.10, 0.55) (see the body comment) so the corpus-curation
    * quality gate STRADDLES on generated corpora — short/low-stopword
    * docs fail, long/stopword-normal docs pass — instead of uniformly
    * rejecting (uniform vocabulary draws → stopword term ≈ 0 → every
    * doc under the 60 bar → scaled curation rungs curated nothing).
    */
  def documents(spark: SparkSession, n: Long, seed: Long = 42): DataFrame = {
    // ~440-word vocabulary: the 29 base tech words plus 410 syllable-
    // composed words in a fixed multiplicative-permutation order (421 is
    // coprime to 1792 = 28·8·8, so i·421 mod 1792 enumerates the cross
    // product without clustering same-onset words together). A 29-word
    // vocabulary made every winnow char-8-gram fingerprint df-hot, so
    // the GENERATED corpora exercised the winnow family only through its
    // df-cap (0 output rows at every scale rung); with a realistic
    // type/token ratio the fingerprints diversify and the scaled winnow
    // and shingle rungs measure output-bearing behavior. Deterministic:
    // a pure function of the index, no RNG.
    val baseVocab = Seq("data", "query", "spark", "table", "row", "column",
      "key", "value", "join", "filter", "agg", "group", "sort", "scan",
      "merge", "batch", "stream", "window", "part", "line", "order",
      "hash", "fast", "slow", "big", "small", "vector", "a", "the")
    val onsets = Seq("b", "br", "ch", "d", "dr", "f", "fl", "g", "gr", "h",
      "j", "k", "kl", "l", "m", "n", "p", "pr", "qu", "r", "s", "st", "t",
      "tr", "v", "w", "y", "z")
    val nuclei = Seq("a", "e", "i", "o", "u", "ai", "ea", "ou")
    val codas = Seq("on", "er", "is", "at", "or", "en", "il", "um")
    val composed = (0 until 410).map { i =>
      val j = (i * 421) % 1792
      onsets(j % 28) + nuclei((j / 28) % 8) + codas((j / 224) % 8)
    }
    val vocab = baseVocab ++ composed
    val vArr = vocab.map(w => s"'$w'").mkString("array(", ", ", ")")
    // pile base: members of a TEXT pile (id % 50 < 5) or a MEDIA pile
    // (id % 50 in [10, 13)) draw their token stream from the pile-base
    // id, everyone else from themselves (base = own id)
    val baseE = "(CASE WHEN id % 50 < 5 THEN id - (id % 50) " +
      "WHEN id % 50 >= 10 AND id % 50 < 13 THEN id - (id % 50) + 10 " +
      "ELSE id END)"
    // uniform in [0,1) from (seed, key expr, position) — 48 bits of md5
    def up(tag: String, idE: String, pos: String) =
      s"cast(conv(substr(md5(concat('$seed', ':$tag:', cast($idE as string), ':', cast($pos as string))), 1, 12), 16, 10) as double) / 281474976710656.0"
    // ZIPFIAN-ISH TOKEN MASS: real text is not uniform over its
    // vocabulary — function words carry a large share of the tokens.
    // Each document draws stopwords (the quality gate's 8-word list,
    // TextOps.withTextStats) with a per-doc propensity in [0.10, 0.55)
    // keyed on the PILE BASE (members share it, preserving clone
    // structure), other positions draw uniformly from the diverse
    // vocabulary. Without this, uniform draws put ~0.5% token mass on
    // stopwords, every generated doc scores below the quality-gate's 60
    // bar, and the scaled curation rungs curate ZERO documents — the
    // gate's pass fraction must straddle, not pin, on synthetic corpora.
    val stopArr = "array('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it')"
    val spE = s"(0.10 + 0.45 * ${up("sprop", baseE, "'0'")})"
    val baseTokE =
      s"""if(${up("stopd", baseE, "p")} < $spE,
           element_at($stopArr, 1 + cast(${up("stok", baseE, "p")} * 8 as int)),
           element_at($vArr, 1 + cast(${up("tok", baseE, "p")} * ${vocab.size} as int)))"""
    val tokE =
      s"""if(id % 50 < 5 AND id % 50 > 0
             AND (p = 1 + cast(id % 15 as int) OR ${up("edit", "id", "p")} < 0.02),
           element_at($vArr, 1 + cast(${up("etok", "id", "p")} * ${vocab.size} as int)),
           $baseTokE)"""
    // MEDIA-PILE PERTURBATION (the dHash analogue of ScaleGen's ±1%
    // embedding jitter): members 11/12 of each media pile apply 1 resp.
    // 2 single-CHARACTER substitutions to the base text at
    // deterministic positions in [1, 29] (every generated doc is ≥ 29
    // chars: 15 tokens + 14 spaces minimum). Length is preserved, so
    // the 61-byte dHash sampling grid is unchanged and each edit flips
    // ≤ 2 of the 60 gradient bits — members sit within Hamming ≤
    // 2·edits of their base, inside the phash pair detector's ≤ 4
    // banding guarantee. A substitution landing on a SPACE is a no-op
    // (the member degrades to an exact dup — itself realistic, found
    // at Hamming 0) so token boundaries never shift; a 'q' flips to
    // 'z' so a real edit never equals the original char.
    // PASSAGE-PILE APPEND: members of a passage pile (doc_id % 50 in
    // [20, 23)) append the same 16-token passage, keyed on the PILE id
    // so it is unique to the pile: each token is the first 8 hex chars
    // of an md5 over (seed, pile, position) with digits transliterated
    // to letters — 16 random letter-words no other document can emit,
    // so the pair's shared winnow fingerprints survive the df-cap at
    // any corpus size while everything ELSE the pair shares (common
    // vocabulary) ages out of the join exactly as it should.
    val pasBaseE = "(doc_id - (doc_id % 50) + 20)"
    val passageE =
      s"""array_join(transform(sequence(1, 16), p ->
            translate(substr(md5(concat('$seed', ':pas:',
                               cast($pasBaseE as string), ':', cast(p as string))), 1, 8),
                      '0123456789', 'ghijklmnop')), ' ')"""
    def mpos(tag: String) = s"(1 + cast(${up(tag, "doc_id", "'0'")} * 29 as int))"
    def msub(member: Long, posE: String) = s"""
      CASE WHEN doc_id % 50 = $member AND substr(text, $posE, 1) <> ' '
           THEN concat(substr(text, 1, $posE - 1),
                       if(substr(text, $posE, 1) = 'q', 'z', 'q'),
                       substr(text, $posE + 1))
           ELSE text END"""
    spark.range(n)
      .select(
        col("id").as("doc_id"),
        expr(s"""array_join(transform(sequence(1, 15 + cast(${up("len", baseE, "0")} * 46 as int)),
                   p -> $tokE), ' ')""")
          .as("text"),
        pick(seed, "lang", "id", Seq("en", "en", "zh", "fr", "es", "de")).as("lang"),
        concat(lit("src"), (u(seed, "src", "id") * 20).cast("int").cast("string")).as("source"))
      // member 11: one edit; member 12: two edits (chained CASEs — the
      // conditions gate evaluation, so non-members never pay them)
      .withColumn("text", expr(msub(11L, mpos("mp1"))))
      .withColumn("text", expr(msub(12L, mpos("mp1"))))
      .withColumn("text", expr(msub(12L, mpos("mp2"))))
      .withColumn("text", expr(
        s"""CASE WHEN doc_id % 50 >= 20 AND doc_id % 50 < 23
                 THEN concat(text, ' ', $passageE) ELSE text END"""))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }
}
