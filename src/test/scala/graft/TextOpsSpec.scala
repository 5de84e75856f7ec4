package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextOps

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c).head.get(0).asInstanceOf[T]

  test("wordCount normalizes punctuation and case") {
    assert(one[Long](TextOps.wordCount(col("t")), "Hello, World!") == 2L)
    assert(one[Long](TextOps.wordCount(col("t")), "one two  three") == 3L)
  }

  test("repetitionMetrics: hand-computed fractions, 1-token doc degrades") {
    val docs = Seq(
      (1L, "a a a b"),          // 4 toks, 2 distinct; bigrams: aa aa ab
      (2L, "Hello!"),           // 1 tok
      (3L, "x y x y x")         // 5 toks, 2 distinct; bigrams: xy yx xy yx
    ).toDF("doc_id", "text")
    val m = TextOps.repetitionMetrics(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(m(1L) == ((4L, 0.5, 3.0 / 4, 2.0 / 3)))
    assert(m(2L) == ((1L, 1.0, 1.0, 0.0)))
    assert(m(3L) == ((5L, 0.4, 3.0 / 5, 2.0 / 4)))
  }

  test("tokenEntropy: hand-computed bits, degenerate docs, norm bounds") {
    val docs = Seq(
      (1L, "a a b b"),    // uniform over 2 types: H = 1 bit, norm = 1
      (2L, "a a a b"),    // H = 2 - 3*log2(3)/4 ≈ 0.811278
      (3L, "Hello!"),     // 1 token, 1 type: H = 0, norm = 0 (guarded)
      (4L, "a b c d")     // uniform over 4: H = 2, norm = 1
    ).toDF("doc_id", "text")
    val m = TextOps.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(m(1L) == ((4L, 2L, 1.0, 1.0)))
    val h2 = BigDecimal(2.0 - 3.0 * (math.log(3.0) / math.log(2.0)) / 4.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m(2L) == ((4L, 2L, h2, h2)))
    assert(m(3L) == ((1L, 1L, 0.0, 0.0)))
    assert(m(4L) == ((4L, 4L, 2.0, 1.0)))
    // entropy_norm is a [0,1] efficiency on the real corpus
    val corpus = TextOps.tokenEntropy(
      graft.sources.Tables(spark, TestSpark.sf, "documents"),
      "doc_id", "text")
    assert(corpus.filter(col("entropy_norm") < 0 ||
      col("entropy_norm") > 1).count() == 0)
  }

  test("bpeEstimate is ceil(len/4)") {
    assert(one[Long](TextOps.bpeEstimate(col("t")), "abcdefgh") == 2L)
    assert(one[Long](TextOps.bpeEstimate(col("t")), "abcdefghi") == 3L)
  }

  test("occurrences counts non-overlapping literal hits") {
    assert(one[Long](TextOps.occurrences(col("t"), "ab"), "ab xx ab yy ab") == 3L)
  }

  test("langId picks the profile with most stopword hits") {
    assert(one[String](TextOps.langId(col("t")),
      "the cat and the dog of a house") == "en")
    assert(one[String](TextOps.langId(col("t")),
      "der hund und die katze und das auto") == "de")
    assert(one[String](TextOps.langId(col("t")),
      "le chien et les chats et une maison") == "fr")
  }

  test("qualityScore is bounded and rewards mid-length text") {
    val good = ("solid sentence with reasonable words " * 10).trim
    val junk = "x"
    val qGood = one[Double](TextOps.qualityScore(col("t")), good)
    val qJunk = one[Double](TextOps.qualityScore(col("t")), junk)
    assert(qGood >= 0.0 && qGood <= 1.0)
    assert(qJunk >= 0.0 && qJunk <= 1.0)
    assert(qGood > qJunk)
  }

  test("quality quota (bounded top-k) equals the windowed rule at sf0.001") {
    import org.apache.spark.sql.expressions.Window
    val d = graft.sources.Tables(spark, TestSpark.sf, "documents")
      .select(col("source"), col("doc_id"),
        TextOps.qualityScore(col("text")).as("quality"))
    val got = d.groupBy("source")
      .agg(graft.functions.TopK.topKByScore(
        col("quality"), col("doc_id"), 20).as("kept"))
      .select(col("source"), posexplode(col("kept")).as(Seq("pos", "kv")))
      .select(col("source"), col("kv.id").as("doc_id"),
        (col("pos") + 1).cast("int").as("rank"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val win = d.withColumn("rank",
        row_number().over(Window.partitionBy("source")
          .orderBy(col("quality").desc, col("doc_id").asc)).cast("int"))
      .filter(col("rank") <= 20)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == win)
    // quota binds for at least one source OR every doc survives — either
    // way the rank contract held above; sanity: nothing exceeds the quota
    assert(got.groupBy(_._1).values.forall(_.size <= 20))
  }

  test("piiRedact counts and redacts emails/IPs, leaves clean text alone") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail me at bob.smith+x@corp.example.com or 10.0.0.1 today"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.co c.d@e.org and ip 192.168.1.255 end")
    ).toDF("doc_id", "text")
    val got = TextOps.piiRedact(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) ==
      ((1L, 1L, m("mail me at <EMAIL> or <IP> today"))))
    assert(got(2L) == ((0L, 0L, m("no pii here at all"))))
    assert(got(3L) ==
      ((2L, 1L, m("two mails <EMAIL> <EMAIL> and ip <IP> end"))))
  }

  test("lmScore matches a hand-computed add-alpha bigram model") {
    import spark.implicits._
    // train (ids 1, 2): bigrams "a b" x2, "b a" x1, "b c" x1;
    // context counts: a->2, b->2; vocab {a, b, c} => V = 3
    // eval doc 10 "a b c": nll(a b) = -ln(2.5/3.5), nll(b c) = -ln(1.5/3.5)
    // eval doc 20 "c c":   nll(c c) = -ln(0.5/1.5)   (unseen context)
    // eval doc 30 "x":     no bigrams -> omitted
    val docs = Seq(
      (1L, "a b a"), (2L, "a b? C!"), // normText folds case/punct
      (10L, "a b c"), (20L, "c c"), (30L, "x")
    ).toDF("doc_id", "text")
    val got = TextOps.lmScore(docs, "doc_id", "text",
        trainFilter = col("doc_id") < 10, alpha = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // trained docs are themselves scored (they pass the eval side too)
    assert(got.keySet == Set(1L, 2L, 10L, 20L))
    assert(got(10L)._1 == 2L)
    assert(got(10L)._2 ==
      r6((-math.log(2.5 / 3.5) - math.log(1.5 / 3.5)) / 2))
    assert(got(20L) == ((1L, r6(-math.log(0.5 / 1.5)))))
    // in-distribution text scores strictly better than unseen-gram text
    assert(got(1L)._2 < got(20L)._2)
  }

  test("dsirWeights: target-like raw docs outscore off-target ones; " +
      "hand-check of the hashed log-ratio model") {
    import spark.implicits._
    // target (t*): pure "alpha beta" bigram mass; raw pool: doc 10 repeats
    // the target bigram, doc 20 is disjoint, doc 30 has < 2 tokens
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta", "tgt"),
      (2L, "alpha beta alpha beta", "tgt"),
      (10L, "alpha beta alpha beta", "raw"),
      (20L, "gamma delta gamma delta", "raw"),
      (30L, "solo", "raw")
    ).toDF("doc_id", "text", "source")
    val B = 64
    val got = TextOps.dsirWeights(docs, "doc_id", "text",
        col("source") === "tgt", buckets = B)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // only the raw pool is scored; the zero-feature doc is present with 0
    assert(got.keySet == Set(10L, 20L, 30L))
    assert(got(30L) == ((0L, 0.0)))
    // target-like content must outscore off-target content
    assert(got(10L)._2 > 0, s"target-like weight not positive: ${got(10L)}")
    assert(got(20L)._2 < 0, s"off-target weight not negative: ${got(20L)}")
    assert(got(10L)._2 > got(20L)._2)
    // hand-check doc 20 against the closed form: its bigrams hash to
    // buckets with ct=0, and every count is reproducible driver-side
    def bucket(bg: String): Long = {
      val m = java.security.MessageDigest.getInstance("MD5")
        .digest(bg.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(m.take(15), 16) % B
    }
    def bigrams(text: String) =
      text.split(" ").sliding(2).map(_.mkString(" ")).toSeq
    // per-doc bigram bucket counts (never across doc boundaries)
    val tgtBuckets = Seq("alpha beta alpha beta alpha beta",
        "alpha beta alpha beta")
      .flatMap(bigrams).map(bucket)
    val rawBuckets = Seq("alpha beta alpha beta", "gamma delta gamma delta")
      .flatMap(bigrams).map(bucket)
    val nt = tgtBuckets.size.toDouble
    val nr = rawBuckets.size.toDouble
    def w(b: Long): Double = {
      val ct = tgtBuckets.count(_ == b)
      val cr = rawBuckets.count(_ == b)
      math.log(((ct + 0.5) / (nt + 0.5 * B)) / ((cr + 0.5) / (nr + 0.5 * B)))
    }
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val expected20 = r6(bigrams("gamma delta gamma delta").map(b => w(bucket(b))).sum)
    assert(got(20L) == ((3L, expected20)))
    val expected10 = r6(bigrams("alpha beta alpha beta").map(b => w(bucket(b))).sum)
    assert(got(10L) == ((3L, expected10)))
  }

  test("bpeMergeCandidates: overlapping pairs weighted by word freq, " +
      "single-char words excluded, ties break on pair ASC") {
    import spark.implicits._
    // "aaa" x2 docs -> ("aa", 2 per occurrence x 2 words) = 4
    // "abab" -> ab:2, ba:1; "ab" once more -> ab:3 total
    // "z" single char contributes nothing
    val docs = Seq("aaa ab z", "aaa abab").toDF("text")
    val out = TextOps.bpeMergeCandidates(docs, "text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("aa", 4L), ("ab", 3L), ("ba", 1L)),
      out.toSeq.toString)
    // tie order: "xy" and "yx" both 1 -> alphabetical
    val tied = TextOps.bpeMergeCandidates(
        Seq("xy yx").toDF("text"), "text", k = 2)
      .collect().map(_.getString(0))
    assert(tied.toSeq == Seq("xy", "yx"))
  }

  test("zipfFit: slope/intercept match a driver-side replica of the " +
      "quantized closed form; a perfect power law fits exactly") {
    import spark.implicits._
    // synthetic frequencies freq = 1000 / rank: "t1" x1000, "t2" x500...
    // on a perfect Zipf curve the quantized fit lands within rounding
    // noise of slope -1
    val words = (1 to 8).flatMap(r => Seq.fill(1000 / r)(s"t$r"))
    val docs = Seq(words.mkString(" ")).toDF("text")
    val got = TextOps.zipfFit(docs, col("text"), topN = 8).collect().head
    assert(got.getAs[Long]("n_ranked") == 8L)
    // driver replica of the same quantized arithmetic
    val freqs = (1 to 8).map(r => (r, 1000 / r))
    def q6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val xs = freqs.map { case (r, _) => q6(math.log(r.toDouble)) }
    val ys = freqs.map { case (_, f) => q6(math.log(f.toDouble)) }
    val n = 8.0
    val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble
    val sxx = xs.map(a => a * a).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(got.getAs[Double]("slope") ==
      q6(slope).toDouble, s"slope ${got.getAs[Double]("slope")}")
    assert(math.abs(got.getAs[Double]("slope") + 1.0) < 0.02,
      "perfect power law should fit near -1")
    assert(got.getAs[Double]("intercept") ==
      q6((sy - slope * sx) / n).toDouble)
  }

  test("dataCard: volume, dup-rate, language-share and fingerprint " +
      "counts match a hand replica") {
    import spark.implicits._
    // srcA: 3 docs, one exact-dup pair (cross-source dup with srcB's
    // doc counts too - df is corpus-wide), 2 en / 1 de
    val docs = Seq(
      (1L, "the cat sat", "srcA", "en"),
      (2L, "the cat sat", "srcA", "en"),
      (3L, "der hund", "srcA", "de"),
      (4L, "the cat sat", "srcB", "en"),
      (5L, "unique words here", "srcB", "de")
    ).toDF("doc_id", "text", "source", "lang")
    val got = TextOps.dataCard(docs, "doc_id", "text", "source", "lang")
      .orderBy("source").collect()
    val a = got(0)
    assert(a.getAs[String]("source") == "srcA")
    assert(a.getAs[Long]("n_docs") == 3L)
    assert(a.getAs[Long]("total_tokens") == 3L + 3L + 2L)
    assert(a.getAs[Double]("share_en") == BigDecimal(2.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(a.getAs[Long]("n_unique_fp") == 2L)
    // docs 1,2 dup within source AND with srcB's doc 4 - all three count
    assert(a.getAs[Double]("dup_rate") == BigDecimal(2.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val b = got(1)
    assert(b.getAs[Long]("n_docs") == 2L)
    assert(b.getAs[Double]("dup_rate") == 0.5)
    assert(b.getAs[Long]("n_unique_fp") == 2L)
  }

  test("bpeEncode: merge-rank priority, abutting-pair re-scan, and " +
      "per-doc totals match the stated rule") {
    import spark.implicits._
    // "abab aaa x": ab -> |ab|ab| (2), aa -> |aa|a| (2, single-pass
    // replace misses the abutting second pair, the re-scan catches
    // nothing more), x -> 1
    val d1 = Seq((1L, "abab aaa x")).toDF("doc_id", "text")
    val g1 = TextOps.bpeEncode(d1, "doc_id", "text", Seq("ab", "aa"))
      .collect().head
    assert(g1.getAs[Long]("n_words") == 3L)
    assert(g1.getAs[Long]("n_bpe_tokens") == 5L)
    // rank priority changes the tokenization: "aabb" under [ab, bb, aa]
    // -> a|ab|b (3); under [aa, bb, ab] -> aa|bb (2)
    val d2 = Seq((1L, "aabb")).toDF("doc_id", "text")
    def enc(merges: Seq[String]): Long =
      TextOps.bpeEncode(d2, "doc_id", "text", merges)
        .collect().head.getAs[Long]("n_bpe_tokens")
    assert(enc(Seq("ab", "bb", "aa")) == 3L)
    assert(enc(Seq("aa", "bb", "ab")) == 2L)
    // abutting quad: aaaa -> pass |aa|a|a| wait: single pass merges
    // (0,1) then resumes after the consumed separator, so pass 1 gives
    // |aa|a|a|, pass 2 |aa|aa| -> 2 tokens
    val d3 = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val g3 = TextOps.bpeEncode(d3, "doc_id", "text", Seq("aa"))
      .collect().head
    assert(g3.getAs[Long]("n_bpe_tokens") == 4L) // 2 + 2
    // merge validation is loud
    intercept[IllegalArgumentException](
      TextOps.bpeEncode(d3, "doc_id", "text", Seq("abc")))
  }

  test("readability: counts and both scores match the stated rules") {
    import spark.implicits._
    // "Hello world. It works!" -> 2 sentences; norm "hello world it
    // works" -> 4 words; vowel runs: e,o / o / i / o -> wait: hello
    // has e + o (2), world o (1), it i (1), works o (1) = 5 syllables,
    // no vowel-less words.
    val docs = Seq((1L, "Hello world. It works!"),
      (2L, "xyz qqq"), // zero-vowel words: y counts as vowel -> xyz has
                       // one run; qqq none -> syllables = 1 + 1
      (3L, "a")).toDF("doc_id", "text")
    val got = TextOps.readability(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val r1 = got(0)
    assert(r1.getAs[Long]("n_words") == 4L)
    assert(r1.getAs[Long]("n_sentences") == 2L)
    assert(r1.getAs[Long]("n_syllables") == 5L)
    val wps = 4.0 / 2.0; val spw = 5.0 / 4.0
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1.getAs[Double]("flesch_ease") ==
      r6(206.835 - 1.015 * wps - 84.6 * spw))
    assert(r1.getAs[Double]("fk_grade") ==
      r6(0.39 * wps + 11.8 * spw - 15.59))
    val r2 = got(1)
    assert(r2.getAs[Long]("n_words") == 2L)
    assert(r2.getAs[Long]("n_sentences") == 1L) // min 1 without [.!?]
    assert(r2.getAs[Long]("n_syllables") == 2L) // xyz run 'y' + qqq floor
    val r3 = got(2)
    assert(r3.getAs[Long]("n_words") == 1L)
    assert(r3.getAs[Long]("n_syllables") == 1L)
  }

  test("pmiCollocations: hand-computed ratio, minCount floor, " +
      "punctuation folding, single-token docs contribute no pairs") {
    // corpus: "new york" twice (always adjacent), "big apple" once
    // (below minCount=2), fillers; "solo" has no pairs
    val docs = Seq(
      (1L, "new york is big"), (2L, "New York!"),
      (3L, "big apple"), (4L, "solo")).toDF("doc_id", "text")
    val got = TextOps.pmiCollocations(docs, col("text"),
      minCount = 2, k = 10).collect()
    // unigrams: new 2, york 2, is 1, big 2, apple 1, solo 1 -> N1 = 9
    // pairs: (new,york)x2 (york,is) (is,big) (big,apple) -> N2 = 5
    assert(got.length == 1, got.mkString(";"))
    val r = got(0)
    assert((r.getString(0), r.getString(1)) == (("new", "york")))
    assert(r.getAs[Long]("n_ab") == 2L && r.getAs[Long]("n_a") == 2L &&
      r.getAs[Long]("n_b") == 2L)
    val want = BigDecimal((2.0 / 5.0) / ((2.0 / 9.0) * (2.0 / 9.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("pmi_ratio") == want)
  }

  test("pmiCollocations ranking is deterministic: ratio desc, then " +
      "pair ascending; k truncates") {
    // two pairs with identical counts -> identical ratio, tie-broken
    // by (tok_a, tok_b)
    val docs = Seq((1L, "aa bb"), (2L, "aa bb"), (3L, "cc dd"),
      (4L, "cc dd")).toDF("doc_id", "text")
    val all = TextOps.pmiCollocations(docs, col("text"), 2, 10).collect()
    assert(all.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("aa", "bb"), ("cc", "dd")))
    val one = TextOps.pmiCollocations(docs, col("text"), 2, 1).collect()
    assert(one.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("aa", "bb")))
  }

  test("jsDivergence: identical sources read exactly 0, disjoint " +
      "sources read high, everything sits in [0, 1] bits with a < b " +
      "pairs only") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "a"),
      (2L, "alpha beta gamma delta", "b"),   // b == a verbatim
      (3L, "omega psi chi phi", "c"))        // c disjoint from both
      .toDF("doc_id", "text", "source")
    val r = TextOps.jsDivergence(docs, "text", "source", buckets = 64)
      .orderBy("src_a", "src_b").collect()
    assert(r.map(x => (x.getString(0), x.getString(1))).toSeq ==
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    val byPair = r.map(x => (x.getString(0), x.getString(1)) -> x).toMap
    // identical distributions: every slot term is p·ln(1) = 0 exactly
    assert(byPair(("a", "b")).getAs[Double]("js_nats") == 0.0)
    for (x <- r) {
      val bits = x.getAs[Double]("js_bits")
      assert(bits >= 0.0 && bits <= 1.0, s"JS out of [0,1] bits: $bits")
    }
    assert(byPair(("a", "c")).getAs[Double]("js_bits") >
      byPair(("a", "b")).getAs[Double]("js_bits"))
  }

  test("jsDivergence plan: one corpus scan to a partial-aggregated " +
      "counts frame; pair work is model-sized, never a window") {
    val p = SparkEntry.queries("t25_js_divergence")(spark, TestSpark.sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial"), "slot counts must map-side combine")
  }
}
