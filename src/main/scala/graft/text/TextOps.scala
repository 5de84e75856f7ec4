package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language ID, quality scoring,
  * token counting, fingerprinting. Everything is a closed-form column
  * expression (no UDFs) built from length/replace arithmetic, which is both
  * codegen-friendly in Spark and bit-reproducible in the DuckDB oracle
  * (`replace`/`length` have identical semantics in both engines).
  */
object TextOps {

  /** Number of occurrences of literal `pat` in `c`, via length arithmetic. */
  def occurrences(c: Column, pat: String): Column =
    ((length(c) - length(call_function("replace", c, lit(pat), lit("")))) /
      pat.length).cast("long")

  /** Normalized, space-padded text for word-boundary matching. */
  def padded(c: Column): Column =
    concat(lit(" "), trim(regexp_replace(lower(c), "[^a-z0-9]+", " ")),
      lit(" "))

  /** Per-language marker words (space-padded matching). Tiny n-gram-style
    * heuristic in the spirit of fastText/langid, kept deterministic. */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " a "),
    "de" -> Seq(" der ", " und ", " die ", " das "),
    "es" -> Seq(" el ", " los ", " las ", " una "),
    "fr" -> Seq(" le ", " les ", " et ", " une "),
    "zh" -> Seq(" de ", " shi ", " le ", " zai ")
  )

  def langScore(c: Column, lang: String): Column =
    profiles.toMap.apply(lang).map(p => occurrences(padded(c), p))
      .reduce(_ + _)

  /** Predicted language: argmax of profile scores, first-listed wins ties. */
  def langId(c: Column): Column = {
    val scores = profiles.map { case (l, _) => l -> langScore(c, l) }
    scores.foldRight(lit(profiles.head._1)) { case ((l, s), acc) =>
      when(scores.map(_._2).reduce((a, b) => greatest(a, b)) === s, lit(l))
        .otherwise(acc)
    }
  }

  /** Whitespace token count via space arithmetic (identical both engines). */
  def wordCount(c: Column): Column = {
    val t = trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))
    (length(t) - length(call_function("replace", t, lit(" "), lit("")))) +
      lit(1).cast("long")
  }

  /** BPE-ish token estimate: ~4 chars per token. */
  def bpeEstimate(c: Column): Column = ceil(length(c) / lit(4.0)).cast("long")

  /** Greedy BPE tokenizer APPLY (Sennrich et al. 2016's inference side,
    * the step after [[bpeMergeCandidates]]'s training count): each word
    * starts as characters and repeatedly merges the LOWEST-RANK pair
    * present until none applies — rank = position in `merges` (the model,
    * fit once and applied many: the s09 lifecycle on the tokenizer axis).
    *
    * Merge-step semantics, stated once and shared verbatim with the
    * oracle: the tokenization is a '|'-separator string ("|a|b|…|"); one
    * step replaces ALL left-to-right non-overlapping occurrences of the
    * best-ranked present pair's "|a|b|" with "|ab|" (java String.replace
    * == SQL replace), then re-scans — abutting occurrences missed by a
    * single pass are caught by the next iteration of the same rule, so
    * Spark and the DuckDB recursive-CTE oracle agree state-for-state.
    *
    * Scale shape: the corpus collapses FIRST to the distinct-word vocab
    * (corpus-size-independent — t15's own argument); the bounded merge
    * fold runs as a typed map over THAT frame only (a sequential fold
    * with no closed column form — the p10 justification), and per-doc
    * totals come from one narrow join of the (doc, word) counts against
    * the encoded vocab plus a map-side-combined sum. Emits doc_id,
    * n_words, n_bpe_tokens. */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[String]): DataFrame = {
    require(merges.forall(_.length == 2),
      s"merges must be 2-char pairs: ${merges.filter(_.length != 2)}")
    import docs.sparkSession.implicits._
    val mergeArr = merges.toArray
    val tc = docs
      .select(col(idCol), explode(split(
        trim(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " ")),
        " ")).as("w"))
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("cnt"))
    val vocabEnc = tc.select("w").distinct().as[String].map { w =>
      var state = w.flatMap(c => s"|$c").mkString + "|"
      var changed = true
      while (changed) {
        changed = false
        var k = 0
        while (k < mergeArr.length && !changed) {
          val m = mergeArr(k)
          val pat = "|" + m.charAt(0) + "|" + m.charAt(1) + "|"
          if (state.contains(pat)) {
            state = state.replace(pat, "|" + m + "|")
            changed = true
          }
          k += 1
        }
      }
      (w, state.count(_ == '|').toLong - 1L)
    }.toDF("w", "n_bpe")
    tc.join(vocabEnc, Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("n_bpe")).as("n_bpe_tokens"))
  }

  /** Readability scoring (Flesch 1948 reading ease + Flesch-Kincaid 1975
    * grade level): the classic document-complexity signal a quality
    * pipeline reads next to t02's surface ratios. Counting rules, stated
    * once and shared verbatim with the oracle:
    *   - sentences = runs of [.!?] in the RAW text, min 1 (punctuation
    *     survives only there; the gate corpus is punctuation-free, so its
    *     docs read as one sentence — the formula degrades gracefully);
    *   - words = whitespace tokens of the normalized text;
    *   - syllables = vowel-group runs ([aeiouy]+) across the normalized
    *     text plus 1 for each vowel-less word (every word counts >= 1).
    * All counts are integers; the two scores are a fixed chain of double
    * ops over them, so both engines agree bit-for-bit. Single scan, zero
    * shuffles — pure codegen'd column arithmetic at corpus scale. */
  def readability(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val raw = col(textCol)
    val norm = trim(regexp_replace(lower(raw), "[^a-z0-9]+", " "))
    val toks = split(norm, " ")
    val nSent = greatest(lit(1L),
      size(regexp_extract_all(raw, lit("[.!?]+"), lit(0))).cast("long"))
    val vowelRuns =
      size(regexp_extract_all(norm, lit("[aeiouy]+"), lit(0))).cast("long")
    // a vowel-less word ("rhythm"-less here: digits, "qt"...) counts 1
    val noVowel = size(filter(toks, t => !t.rlike("[aeiouy]"))).cast("long")
    val nWords = wordCount(raw)
    val nSyll = vowelRuns + noVowel
    val wps = nWords.cast("double") / nSent.cast("double")
    val spw = nSyll.cast("double") / nWords.cast("double")
    docs.select(col(idCol),
        nWords.as("n_words"), nSent.as("n_sentences"),
        nSyll.as("n_syllables"),
        when(nWords > 0, round(
          lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 6))
          .as("flesch_ease"),
        when(nWords > 0, round(
          lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 6))
          .as("fk_grade"))
  }

  /** Token-repetition metrics per document — the Gopher/MassiveText-style
    * repetition filters of a training-data pipeline (Rae et al. 2021 §A1.1:
    * fraction-of-duplicate-content rules), token-based because this corpus
    * has no line structure. Per doc:
    *   n_tokens        whitespace tokens of the normalized text
    *   distinct_frac   distinct tokens / tokens (type-token ratio)
    *   top_tok_frac    occurrences of the most frequent token / tokens
    *   top_bigram_frac occurrences of the most frequent bigram / (tokens-1),
    *                   0.0 for single-token docs
    *
    * Shape: tokens and bigrams each explode from ONE materialized token
    * array (positions explode — the expensive normalization regex runs
    * once per doc, see [[graft.dedup.Dedup]]'s pipeline note), then two
    * count aggregates with map-side combine keyed on (doc, gram) and one
    * per-doc fold; the doc id is the only join key. Repeated docs at 100 TB
    * stay one shuffle per stage — nothing is corpus-global. */
  def repetitionMetrics(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      graft.dedup.Dedup.tokens(col(textCol)).as("toks"))
    def gramCounts(n: Int) = base
      .select(col("id"), col("toks"),
        explode(sequence(lit(1),
          greatest(size(col("toks")) - (n - 1), lit(1)))).as("pos"))
      .select(col("id"),
        concat_ws(" ", slice(col("toks"), col("pos"), lit(n))).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("n"))
    val toks = gramCounts(1).groupBy("id").agg(
      sum(col("n")).as("n_tokens"),
      count(lit(1)).as("n_distinct"),
      max(col("n")).as("top_tok"))
    // single-token docs degrade to one whole-doc "bigram" in gramCounts(2)
    // (the slice clamps); mask them to 0 below rather than special-casing
    // the explode.
    val bigrams = gramCounts(2).groupBy("id")
      .agg(max(col("n")).as("top_bigram"))
    toks.join(bigrams, Seq("id"))
      .select(col("id").as(idCol),
        col("n_tokens"),
        (col("n_distinct").cast("double") / col("n_tokens"))
          .as("distinct_frac"),
        (col("top_tok").cast("double") / col("n_tokens")).as("top_tok_frac"),
        when(col("n_tokens") < 2, lit(0.0))
          .otherwise(col("top_bigram").cast("double") /
            (col("n_tokens") - 1))
          .as("top_bigram_frac"))
  }

  /** Per-document token-distribution Shannon entropy — the
    * gibberish/boilerplate axis the length (t02) and repetition (t06)
    * filters don't capture: natural prose sits in a band of bits/token,
    * template boilerplate falls far below it, and noise saturates toward
    * log2(n_types). Per doc:
    *   n_tokens     whitespace tokens of the normalized text
    *   n_types      distinct tokens
    *   entropy      -Σ p·log2(p) over the token frequency distribution,
    *                computed algebraically as log2(n) - Σ tf·log2(tf)/n
    *                so only integer tf aggregates feed the formula
    *   entropy_norm entropy / log2(n_types) in [0,1] ("efficiency");
    *                0.0 for single-type docs (entropy is 0 there)
    *
    * Shape: the t10 tf shape — explode → count keyed by (doc, token)
    * with map-side combine, then one per-doc aggregate; no windows, no
    * corpus-global state, repeated docs at 100 TB stay one shuffle per
    * stage. Values round to 6 places so the DuckDB oracle (same formula,
    * same rounding) hash-matches despite last-ulp libm drift. */
  def tokenEntropy(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol).as(idCol),
        explode(graft.dedup.Dedup.tokens(col(textCol))).as("token"))
      .groupBy(idCol, "token")
      .agg(count(lit(1)).as("tf"))
    val n = col("n_tokens").cast("double")
    val ent = log2(n) - col("__stl") / n
    tf.groupBy(idCol)
      .agg(sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("tf").cast("double") * log2(col("tf").cast("double")))
          .as("__stl"))
      .select(col(idCol), col("n_tokens"), col("n_types"),
        round(ent, 6).as("entropy"),
        round(when(col("n_types") > 1,
            ent / log2(col("n_types").cast("double")))
          .otherwise(lit(0.0)), 6).as("entropy_norm"))
  }

  /** PII patterns shared with the oracle SQL — RE2/Java-regex common
    * subset only (no lookaround, no backrefs), so both engines match the
    * same spans. */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII detection + redaction — the scrubbing stage of a training-data
    * pipeline: count email/IPv4 matches per document and replace them
    * with `<EMAIL>`/`<IP>` placeholders (emails first — pinned order, so
    * both engines transform identically). Pure regexp column arithmetic:
    * codegen'd scan work, zero shuffles. The gate emits md5 of the
    * redacted text, so a single leaked or over-redacted byte breaks the
    * hash. */
  def piiRedact(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol),
      regexp_count(col(textCol), lit(EmailPattern)).cast("long")
        .as("n_emails"),
      regexp_count(col(textCol), lit(Ipv4Pattern)).cast("long")
        .as("n_ips"),
      md5(regexp_replace(
        regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>")).as("clean_md5"))

  /** Bigram language-model scoring — the perplexity-filtering stage of a
    * training-data pipeline (CCNet, Wenzek et al. 2020 §3.3; Gopher's
    * quality filters): fit add-α-smoothed bigram statistics on a TRAIN
    * split, then score every document by the average negative
    * log-likelihood of its token bigrams,
    *   nll(d) = −(1/n) Σ ln((c(w1,w2) + α) / (c(w1·) + α·V)),
    * where c(w1·) is w1's bigram-context count and V the train vocabulary
    * size. High avg_nll = far from the train distribution (the filter
    * axis). Documents with fewer than 2 tokens score no bigrams and are
    * omitted, on both engines.
    *
    * Scale shape: the model IS two map-side-combined count aggregates
    * (bigram, context) plus a 1-row vocabulary scalar; scoring is an
    * inverted-index LEFT equi-join keyed on the gram — never a per-doc
    * loop or a broadcast model object. Stopword-headed grams skew the
    * context join key; AQE's skew handling covers it the same way it
    * covers d09's gram join. Everything is closed-form column arithmetic
    * (ln of a count ratio), so the DuckDB oracle recomputes it exactly
    * (rounded to 6 dp; double sum-order differences sit far below). */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
              trainFilter: Column, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    import graft.dedup.Dedup
    def base(df: DataFrame): DataFrame =
      df.select(col(idCol).as("id"), Dedup.tokens(col(textCol)).as("toks"))
    def bigrams(df: DataFrame): DataFrame = df
      .filter(size(col("toks")) >= 2)
      .select(col("id"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - 1)).as("pos"))
      .select(col("id"),
        element_at(col("toks"), col("pos")).as("w1"),
        element_at(col("toks"), col("pos") + 1).as("w2"))
    val trainBase = base(docs.filter(trainFilter))
    val trbi = bigrams(trainBase)
    val c2 = trbi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = trbi.groupBy("w1").agg(count(lit(1)).as("c1"))
    // 1-row vocabulary scalar — the t05 bounded scalar-combine pattern
    val vocab = trainBase.select(explode(col("toks")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    bigrams(base(docs))
      .join(c2, Seq("w1", "w2"), "left_outer")
      .join(c1, Seq("w1"), "left_outer")
      .crossJoin(vocab)
      .select(col("id"),
        (-log((coalesce(col("c2"), lit(0L)) + alpha) /
          (coalesce(col("c1"), lit(0L)) + col("v") * alpha))).as("nll"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nll")) / count(lit(1)), 6).as("avg_nll"))
      .select(col("id").as(idCol), col("n_bigrams"), col("avg_nll"))
  }

  /** DSIR-style importance weights for target-distribution data selection
    * (Xie et al. 2023, "Data Selection for Language Models via Importance
    * Resampling"): every bigram hashes into one of `buckets` fixed slots
    * (the first-15-hex-chars md5 integer — the Pack.integerDraw
    * convention, identical in Spark and DuckDB — mod B), the target and
    * raw corpora each induce an add-alpha-smoothed distribution over the
    * B slots, and a raw doc's weight is Σ log(p_target(b)/p_raw(b)) over
    * its bigrams. Docs scoring high look like the target domain; sampling
    * raw ∝ exp(weight) is the DSIR selection step.
    *
    * Scale shape: this is why DSIR (and not a vocab LM like [[lmScore]])
    * is the 100 TB selection tool — the fitted model is O(B) rows
    * regardless of corpus size, so the fit is one map-side-combined
    * aggregate to B keys and the apply is a BROADCAST join of the B-row
    * weight table against the bigram stream (no vocab-sized shuffle on
    * either pass; two corpus scans total, the fit-then-apply lifecycle).
    * Zero-feature docs (< 2 tokens) keep weight 0 via the final left
    * join, so the output covers the whole raw pool. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  targetFilter: Column, buckets: Int = 1024,
                  alpha: Double = 0.5): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    require(alpha > 0, s"alpha must be positive: $alpha")
    import graft.dedup.Dedup
    val bg = docs
      .select(col(idCol).as("id"), targetFilter.as("is_t"),
        Dedup.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("id"), col("is_t"),
        explode(sequence(lit(1), size(col("toks")) - 1)).as("pos"),
        col("toks"))
      .select(col("id"), col("is_t"),
        pmod(conv(substring(md5(concat(
            element_at(col("toks"), col("pos")), lit(" "),
            element_at(col("toks"), col("pos") + 1))), 1, 15), 16, 10)
          .cast("long"), lit(buckets.toLong)).as("b"))
    // both distributions in ONE pass: B keys, map-side combined
    val cnt = bg.groupBy("b").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("is_t"), 0L).otherwise(1L)).as("cr"))
    val tot = cnt.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val wtab = cnt.crossJoin(broadcast(tot))
      .select(col("b"),
        log(((col("ct") + alpha) / (col("nt") + alpha * buckets)) /
            ((col("cr") + alpha) / (col("nr") + alpha * buckets))).as("w"))
    val scored = bg.filter(!col("is_t"))
      .join(broadcast(wtab), Seq("b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_feats"), round(sum(col("w")), 6).as("logw"))
    docs.filter(!targetFilter).select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left_outer")
      .select(col("id").as(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("logw"), lit(0d)).as("logw"))
  }

  /** Pairwise Jensen–Shannon divergence between per-source bigram
    * distributions (Lin 1991 — the symmetric, bounded corpus-divergence
    * profile a mixture designer reads before re-weighting sources:
    * which sources say the same things, which are genuinely distinct):
    * bigrams hash into `buckets` fixed slots (the [[dsirWeights]] md5
    * convention — the model is O(B·|sources|) regardless of corpus
    * size), each source induces an add-`alpha`-smoothed distribution
    * over ALL B slots (empty slots keep their smoothing mass — they
    * are where divergence hides), and each source pair (a < b) reports
    *
    *   JS = Σ_slot ½·(p·ln(2p/(p+q)) + q·ln(2q/(p+q)))
    *
    * folded in ascending slot order (ONE deterministic accumulation —
    * the chi2/KS discipline), emitted in nats and bits at 6 dp (`ln`
    * is the one transcendental; both engines' libm agree at 6 dp, the
    * t14 precedent).
    *
    * Scale shape: ONE corpus scan to the (source, slot) counts frame
    * (map-side combined); densification, totals, the |pairs|·B pair
    * frame and the folds are all model-sized — never corpus-sized.
    * The pair join is the k05 declared bounded class. */
  def jsDivergence(docs: DataFrame, textCol: String, srcCol: String,
                   buckets: Int = 1024,
                   alpha: Double = 0.5): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    require(alpha > 0, s"alpha must be positive: $alpha")
    import graft.dedup.Dedup
    val bg = docs
      .select(col(srcCol).as("src"), Dedup.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("src"),
        explode(sequence(lit(1), size(col("toks")) - 1)).as("pos"),
        col("toks"))
      .select(col("src"),
        pmod(conv(substring(md5(concat(
            element_at(col("toks"), col("pos")), lit(" "),
            element_at(col("toks"), col("pos") + 1))), 1, 15), 16, 10)
          .cast("long"), lit(buckets.toLong)).as("b"))
    val cnt = bg.groupBy("src", "b").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("src").agg(sum("c").as("n"))
    // densify: every (source, slot) — empty slots keep smoothing mass
    val dense = tot
      .select(col("src"), col("n"),
        explode(sequence(lit(0L), lit(buckets - 1L))).as("b"))
      .join(cnt, Seq("src", "b"), "left")
      .select(col("src"), col("b"), col("n"),
        ((coalesce(col("c"), lit(0L)) + lit(alpha)) /
          (col("n") + lit(alpha * buckets))).as("p"))
      .localCheckpoint()
    val x = dense.select(col("src").as("src_a"), col("b"),
      col("n").as("n_a"), col("p").as("pa"))
    val y = dense.select(col("src").as("src_b"), col("b"),
      col("n").as("n_b"), col("p").as("pb"))
    val term = lit(0.5) *
      (col("pa") * log(lit(2.0) * col("pa") / (col("pa") + col("pb"))) +
       col("pb") * log(lit(2.0) * col("pb") / (col("pa") + col("pb"))))
    x.join(y, Seq("b")).where(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("b"), term.as("t"))
      .groupBy("src_a", "src_b")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        aggregate(array_sort(collect_list(struct(col("b"), col("t")))),
          lit(0.0), (a, e) => a + e("t")).as("js"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        round(col("js"), 6).as("js_nats"),
        round(col("js") / lit(math.log(2.0)), 6).as("js_bits"))
  }

  /** Quality score in [0,1]-ish: rewards mid-length docs, word lengths near
    * natural language, and stopword presence. Single-expression double
    * arithmetic (one division per term, fixed order). */
  def qualityScore(c: Column): Column = {
    val chars = length(c).cast("double")
    val words = wordCount(c).cast("double")
    val avgWordLen = chars / words
    val stopRatio = langScore(c, "en").cast("double") / words
    val lengthTerm =
      when(chars >= 200 && chars <= 2000, lit(1.0))
        .when(chars < 200, chars / 200.0)
        .otherwise(lit(2000.0) / chars)
    val wordLenTerm =
      when(avgWordLen >= 3.0 && avgWordLen <= 10.0, lit(1.0)).otherwise(lit(0.5))
    lengthTerm * 0.5 + wordLenTerm * 0.3 + least(stopRatio * 2.0, lit(1.0)) * 0.2
  }

  /** Zipf-law fit over the token frequency distribution — the corpus
    * HEALTH statistic (natural text sits near slope −1; templated or
    * synthetic corpora drift toward flat, boilerplate-heavy ones toward
    * steep): OLS slope/intercept of ln(freq) on ln(rank) over the
    * top-`topN` tokens.
    *
    * Determinism: the corpus collapses to the bounded top-N frame
    * first (t09's TakeOrderedAndProject shape; the rank window runs
    * over those N rows only — dumpBatched's counts-frame discipline),
    * each ln is quantized to 6 dp and summed as EXACT decimals, and
    * the regression closed form is a stated chain of double ops over
    * those exact sums — so the full DuckDB oracle reproduces slope and
    * intercept bit-for-bit (t10/t11's ln-at-6dp precedent). */
  def zipfFit(docs: DataFrame, textCol: Column,
              topN: Int = 100): DataFrame = {
    require(topN >= 3, s"need >= 3 ranked tokens for a fit: $topN")
    val freqs = docs
      .select(explode(split(
        trim(regexp_replace(lower(textCol), "[^a-z0-9]+", " ")),
        " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), col("token")).limit(topN)
    val ranked = freqs.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(desc("freq"), col("token"))))
    val q = ranked.select(
      round(log(col("rank").cast("double")), 6)
        .cast("decimal(18,6)").as("x"),
      round(log(col("freq").cast("double")), 6)
        .cast("decimal(18,6)").as("y"))
    val sums = q.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x") * col("y")).cast("double").as("sxy"),
      sum(col("x") * col("x")).cast("double").as("sxx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    sums.select(col("n").cast("bigint").as("n_ranked"),
        round(slope, 6).as("slope"),
        round((col("sy") - slope * col("sx")) / col("n"), 6)
          .as("intercept"))
  }

  /** Top-k collocations by pointwise mutual information over adjacent
    * token pairs (Church & Hanks 1990 — the classic "which word pairs
    * belong together" corpus statistic; modern pipelines run it for
    * tokenizer-merge seeding and boilerplate phrase discovery):
    * pmi_ratio = p(ab) / (p(a)·p(b)) with p(ab) = n_ab/N₂ over ordered
    * adjacent pairs and p(w) = n_w/N₁ over unigrams, reported as the
    * RAW probability ratio (monotone with PMI = its log) so the whole
    * pipeline is counts + IEEE-correctly-rounded double division —
    * bit-identical in the DuckDB oracle with no transcendental-ulp
    * risk. `minCount` floors n_ab (PMI's classic low-frequency
    * pathology: a pair seen once between two hapaxes maxes the ratio).
    *
    * Scale shape: ONE split projection (the k05 lesson: materialized
    * column, so no per-element re-tokenize), two map-side-combined
    * counts (unigrams, adjacent pairs — the pair frame built by
    * codegen'd arrays_zip/slice, never a HOF lambda), two vocab-keyed
    * equi-joins to attach n_a/n_b, two 1-row totals zips (the p08
    * declared scalar class), and a bounded global top-k
    * (TakeOrderedAndProject). Nothing corpus-sized past the counts. */
  def pmiCollocations(docs: DataFrame, textCol: Column,
      minCount: Int, k: Int): DataFrame = {
    require(minCount >= 1 && k >= 1, s"bad knobs: $minCount, $k")
    val ws = col("ws")
    val arrs = docs.select(split(
      trim(regexp_replace(lower(textCol), "[^a-z0-9]+", " ")), " ")
      .as("ws"))
    val uni = arrs.select(explode(ws).as("w"))
    val uc = uni.groupBy("w").agg(count(lit(1)).as("n"))
    val n1 = uni.agg(count(lit(1)).as("n1"))
    val pairs = arrs.select(explode(arrays_zip(
      slice(ws, lit(1), size(ws) - 1),
      slice(ws, lit(2), size(ws) - 1))).as("z"))
      .select(col("z.0").as("tok_a"), col("z.1").as("tok_b"))
    val bc = pairs.groupBy("tok_a", "tok_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val n2 = pairs.agg(count(lit(1)).as("n2"))
    // association order mirrored literally in the SQL oracle: every op
    // is correctly-rounded IEEE, so the doubles match bit-for-bit
    val ratio = (col("n_ab").cast("double") / col("n2").cast("double")) /
      ((col("n_a").cast("double") / col("n1").cast("double")) *
        (col("n_b").cast("double") / col("n1").cast("double")))
    bc.join(uc.withColumnRenamed("w", "tok_a")
          .withColumnRenamed("n", "n_a"), "tok_a")
      .join(uc.withColumnRenamed("w", "tok_b")
          .withColumnRenamed("n", "n_b"), "tok_b")
      .crossJoin(n1).crossJoin(n2)
      .select(col("tok_a"), col("tok_b"), col("n_ab"), col("n_a"),
        col("n_b"), round(ratio, 6).as("pmi_ratio"))
      .orderBy(desc("pmi_ratio"), col("tok_a"), col("tok_b"))
      .limit(k)
  }

  /** Per-source dataset card — the datasheet every corpus release ships
    * (volume, token mass, quality, language mix, duplication): one
    * grouped report a curation run reads before and after every
    * transform. All columns derive from exact integers or 6-dp-quantized
    * decimal sums (SURVEY §4), so the full DuckDB oracle reproduces the
    * card bit-for-bit.
    *
    * Scale shape: one fingerprint df aggregate (md5 keys, map-side
    * combined) joined back narrow, then ONE grouped aggregate to
    * |sources| rows — nothing corpus-sized past the scan. */
  def dataCard(docs: DataFrame, idCol: String, textCol: String,
               sourceCol: String, langCol: String): DataFrame = {
    val fp = graft.dedup.Dedup.fingerprint(col(textCol))
    // per-doc derived columns materialize IN THE SCAN: only narrow
    // (id, source, lang, fp, counts) rows ever reach the fp-df join —
    // full document text never crosses an exchange
    val withFp = docs.select(col(idCol),
      col(sourceCol).as("source"), col(langCol).as("lang"),
      fp.as("fp"), wordCount(col(textCol)).as("n_toks"),
      round(qualityScore(col(textCol)), 6).cast("decimal(18,6)").as("q6"))
    val df = withFp.groupBy("fp").agg(count(lit(1)).as("fp_df"))
    withFp.join(df, Seq("fp"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_tokens"),
        sum(col("q6")).cast("double").as("sum_quality"),
        count(when(col("lang") === "en", 1)).as("n_en"),
        countDistinct(col("fp")).as("n_unique_fp"),
        count(when(col("fp_df") >= 2, 1)).as("n_dup_docs"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        round(col("sum_quality") / col("n_docs").cast("double"), 6)
          .as("mean_quality"),
        round(col("n_en").cast("double") / col("n_docs").cast("double"), 6)
          .as("share_en"),
        col("n_unique_fp"),
        round(col("n_dup_docs").cast("double") /
          col("n_docs").cast("double"), 6).as("dup_rate"))
  }

  /** First-round BPE merge candidates — the inner step of tokenizer
    * TRAINING (Sennrich et al. 2016), which a 100 TB pipeline runs on
    * its own corpus before any token count in it means anything: count
    * every adjacent character pair inside every word (frequency-
    * weighted, overlapping occurrences counted — "aaa" contributes
    * ("aa", 2)), and surface the top-k merge candidates. Iterating this
    * (merge the winner, recount) IS the BPE trainer; the per-round
    * counting is the part with corpus-scale cost and the part that
    * distributes.
    *
    * Scale shape: the corpus collapses FIRST to the word-frequency
    * table (one map-side-combined aggregate — vocabulary-sized, the
    * classic BPE-trainer preprocessing), pairs explode off the VOCAB
    * (corpus-size-independent), and the final ranking is a bounded
    * TakeOrderedAndProject over pair counts (alphabet²-bounded keys).
    * No shuffle ever carries corpus-proportional rows beyond the first
    * word count. */
  def bpeMergeCandidates(docs: DataFrame, textCol: String,
                         k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val words = docs
      .select(explode(graft.dedup.Dedup.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    words
      .select(col("f"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"),
        col("w"))
      .select(col("w").substr(col("i"), lit(2)).as("pair"), col("f"))
      .groupBy(col("pair")).agg(sum(col("f")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(k)
  }
}
