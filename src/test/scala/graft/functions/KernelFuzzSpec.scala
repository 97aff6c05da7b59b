package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized DIFFERENTIAL tests: each fused kernel replayed against its
  * composed-Spark / UDF / JDK parity reference on generated adversarial
  * inputs — the whitespace, Unicode, and floating-point edges the
  * parquet fixtures (pure ASCII, finite embeddings) never exercise.
  *
  * Generation is scalacheck with a FIXED seed: the corpus is identical
  * on every run (a flaking differential test is useless as a regression
  * pin), and each property materializes ONE DataFrame and compares
  * columns in a single job instead of a job per sample.
  *
  * Why this spec exists: example-based parity tests missed two real
  * divergences that adversarial inputs catch immediately — the int8
  * kernel's NaN-maxabs propagation (found round 13) and the kernels'
  * Java `String.trim` vs Spark `trim` tokenization split (found writing
  * THIS spec in round 14: Java trims every char ≤ U+0020 and drops
  * trailing empty split fields, so "\tx" tokenized ["x"] and "x\t"
  * ["x"] where the composed `split(trim(text), "\\s+")` column and the
  * DuckDB oracles both see ["", "x"] / ["x", ""]).
  */
class KernelFuzzSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private val P = Gen.Parameters.default
  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Gen.listOfN(n, g).pureApply(P, Seed(seed))

  /** Non-printable-safe render of a failing sample for assert messages. */
  private def esc(s: String): String =
    s.map(c => if (c >= 0x21 && c <= 0x7e) c.toString else f"\\u${c.toInt}%04x").mkString

  private def eqv(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Double, y: Double) => x == y || (x.isNaN && y.isNaN)
    case (x: Float, y: Float) => x == y || (x.isNaN && y.isNaN)
    case (x: Seq[_], y: Seq[_]) =>
      x.size == y.size && x.lazyZip(y).forall((p, q) => eqv(p, q))
    case (x: org.apache.spark.sql.Row, y: org.apache.spark.sql.Row) =>
      eqv(x.toSeq, y.toSeq)
    case _ => a == b
  }

  // ---- adversarial text ---------------------------------------------

  private val langStops: Seq[String] =
    Kernels.LangProfiles.flatMap(_._2).distinct.sorted
  private val word: Gen[String] = Gen.frequency(
    5 -> Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString)),
    3 -> Gen.oneOf(langStops),
    2 -> Gen.oneOf(Seq(
      "café", "café", "Ångström", "ﬁle",
      "x y", "漢字", "👍", "​",
      "ab", "a.b-c@d-e.co.uk", "555-123-4567", "10.0.0.1",
      "999.999.999.999", "123-456-7890@mail.com")))
  private val sep: Gen[String] = Gen.frequency(
    8 -> Gen.const(" "),
    2 -> Gen.oneOf("\t", "\n", "\r", "\f", "", "  ", " \t ", "\n\n"))
  // leading/trailing edges are the Java-trim-vs-Spark-trim battleground:
  // controls ≤ U+0020 (Java trims, Spark keeps) and Unicode spaces
  // (DuckDB trims, both JVMs keep)
  private val edge: Gen[String] = Gen.oneOf("", "", "", " ", "  ", "\t",
    "\n", " \t", "", " ", "\f ", "\r\n", "\u000B", "\u000B ")
  private val text: Gen[String] = for {
    n <- Gen.frequency(1 -> Gen.const(0), 2 -> Gen.const(1), 7 -> Gen.chooseNum(2, 12))
    ws <- Gen.listOfN(n, word)
    ss <- Gen.listOfN(math.max(n - 1, 0), sep)
    lead <- edge
    trail <- edge
  } yield lead + (if (ws.isEmpty) ""
    else ws.head + ss.lazyZip(ws.tail).map((s, w) => s + w).mkString) + trail

  private lazy val fuzzTexts: Seq[String] = sample(text, 400, 14L) ++ Seq(
    "", " ", "\t", "\n", "   \t  ", "a\t", "\ta", " a ", "", " ",
    "the la de un il o que en", "a  b\tc \t d",
    // vertical tab: Java \s matches it; r16 moved the ORACLES to the
    // explicit class [\t\n\x0B\f\r ]+ so VT is off the exclusion list
    "\u000B", "a\u000Bb", "a\u000B", "\u000Ba", "a \u000B b")

  test("fuzz: word_ngrams(2,3) == composed HOF form on adversarial text") {
    val df = fuzzTexts.toDF("text")
    val toksC = TextFunctions.tokens(col("text"))
    def composed(n: Int) = array_distinct(transform(
      sequence(lit(1), greatest(size(toksC) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toksC, i, lit(n)))))
    val rows = df.select(col("text"),
      KernelExpressions.word_ngrams(col("text"), 2).as("k2"), composed(2).as("c2"),
      KernelExpressions.word_ngrams(col("text"), 3).as("k3"), composed(3).as("c3"),
      array_distinct(KernelExpressions.word_ngrams_all(col("text"), 2)).as("ka2"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"n=2 on '${esc(r.getString(0))}': kernel ${r.getSeq[String](1).map(esc)} vs composed ${r.getSeq[String](2).map(esc)}")
      assert(r.getSeq[String](3) == r.getSeq[String](4),
        s"n=3 on '${esc(r.getString(0))}': kernel ${r.getSeq[String](3).map(esc)} vs composed ${r.getSeq[String](4).map(esc)}")
      assert(r.getSeq[String](5) == r.getSeq[String](1),
        s"distinct(all) != distinct grams on '${esc(r.getString(0))}'")
    }
  }

  test("fuzz: term_counts == composed size(filter(split)) form on adversarial text") {
    val terms = Seq("the", "de", "a", "café", "10.0.0.1")
    val df = fuzzTexts.toDF("text")
    val toksC = TextFunctions.tokens(col("text"))
    val rows = df.select(
      col("text") +:
        KernelExpressions.term_counts(col("text"), terms).as("tc") +:
        (size(toksC).cast("long") +:
          terms.map(t => size(filter(toksC, tok => tok === lit(t))).cast("long"))): _*)
      .collect()
    rows.foreach { r =>
      val kernel = r.getSeq[Long](1)
      val composed = (2 until 2 + terms.size + 1).map(r.getLong)
      assert(kernel == composed,
        s"on '${esc(r.getString(0))}': kernel $kernel vs composed $composed")
    }
  }

  test("fuzz: text_quality == composed TermCounts+arithmetic form, bit-for-bit") {
    // the composed column set is EXACTLY what TextQualityScorer emitted
    // before fusion (one TermCounts + per-column double arithmetic); the
    // fused kernel must reproduce every field bit-for-bit, because the
    // curation oracles were hashed against the composed semantics
    val stops = Seq("the", "a", "of", "and", "in", "to", "is")
    val df = fuzzTexts.toDF("text")
    val tc = KernelExpressions.term_counts(col("text"), stops)
    val nTok = element_at(col("__tc"), 1).cast("double")
    val stopHits = stops.indices
      .map(i => element_at(col("__tc"), i + 2)).reduceLeft(_ + _).cast("double")
    val stopRatio = when(nTok > 0, stopHits / nTok).otherwise(0.0)
    val rows = df.withColumn("__tc", tc).select(col("text"),
      KernelExpressions.text_quality(col("text"), stops).as("k"),
      element_at(col("__tc"), 1).as("c_n"),
      stopRatio.as("c_sr"),
      when(nTok > 0, length(col("text")).cast("double") / nTok).otherwise(0.0).as("c_cpt"),
      (least(nTok / lit(64.0), lit(1.0)) * (lit(1.0) - stopRatio)).as("c_q"))
      .collect()
    rows.foreach { r =>
      val k = r.getStruct(1)
      val composed = Seq[Any](r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(eqv(k.toSeq, composed),
        s"on '${esc(r.getString(0))}': kernel ${k.toSeq} vs composed $composed")
    }
  }

  test("text_quality on NULL text: kernel null-propagates — the documented " +
      "divergence from the composed form (which scored null text 1.0)") {
    val stops = Seq("the", "a", "of", "and", "in", "to", "is")
    val df = Seq[(java.lang.Long, String)]((0L, null), (1L, "the fox"))
      .toDF("id", "text")
    val tc = KernelExpressions.term_counts(col("text"), stops)
    val nTok = element_at(col("__tc"), 1).cast("double")
    val stopHits = stops.indices
      .map(i => element_at(col("__tc"), i + 2)).reduceLeft(_ + _).cast("double")
    val stopRatio = when(nTok > 0, stopHits / nTok).otherwise(0.0)
    val r = df.withColumn("__tc", tc)
      .select(col("id"),
        KernelExpressions.text_quality(col("text"), stops).as("k"),
        stopRatio.as("c_sr"),
        when(nTok > 0, length(col("text")).cast("double") / nTok)
          .otherwise(0.0).as("c_cpt"),
        (least(nTok / lit(64.0), lit(1.0)) * (lit(1.0) - stopRatio)).as("c_q"))
      .orderBy(col("id")).collect()
    // null text: kernel struct is NULL; the composed chain said (0, 0, 1.0)
    // — least() skips null operands, so a nonexistent document scored
    // PERFECT quality. The kernel's null is the intended contract.
    assert(r(0).isNullAt(1), "kernel must null-propagate on null text")
    assert(r(0).getDouble(2) == 0.0 && r(0).getDouble(3) == 0.0 &&
      r(0).getDouble(4) == 1.0,
      s"composed-form null behavior drifted: ${r(0)}")
    // non-null text: parity as everywhere else
    val k = r(1).getStruct(1)
    assert(k.getDouble(1) == r(1).getDouble(2) &&
      k.getDouble(2) == r(1).getDouble(3) && k.getDouble(3) == r(1).getDouble(4),
      s"non-null parity broke: ${k.toSeq} vs ${r(1)}")
  }

  test("fuzz: lang_id == Seq[String]-UDF reference on adversarial text") {
    val df = fuzzTexts.toDF("text")
    val rows = df.select(col("text"),
      KernelExpressions.lang_id(col("text")).as("k"),
      TextFunctions.langIdUdfReference(TextFunctions.tokens(col("text"))).as("u"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"on '${esc(r.getString(0))}': kernel ${r.getString(1)} vs udf ${r.getString(2)}")
    }
  }

  test("fuzz: token_entropy_stats == explode+groupBy form on adversarial text") {
    val d = fuzzTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val byKernel = d
      .select(col("doc_id"), KernelExpressions.token_entropy_stats(col("text")).as("st"))
      .select(col("doc_id"), col("st.n_tokens"), col("st.n_distinct"),
        round(col("st.slc"), 6).as("slc"))
      .orderBy(col("doc_id")).collect()
    val byGroup = d
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        round(sum(col("c").cast("double") * log2(col("c").cast("double"))), 6).as("slc"))
      .orderBy(col("doc_id")).collect()
    assert(byKernel.length == byGroup.length)
    byKernel.lazyZip(byGroup).foreach { (k, g) =>
      assert(k.toSeq == g.toSeq,
        s"doc ${k.getLong(0)} '${esc(fuzzTexts(k.getLong(0).toInt))}': kernel ${k.toSeq} vs grouped ${g.toSeq}")
    }
  }

  test("fuzz: pii_stats == composed regexp chain on adversarial text") {
    import graft.operators.Curation
    val df = fuzzTexts.toDF("text")
    val rows = df.select(col("text"),
      KernelExpressions.pii_stats(col("text")).as("st"),
      size(regexp_extract_all(col("text"), lit(Curation.EmailRe), lit(0))).as("e"),
      size(regexp_extract_all(col("text"), lit(Curation.PhoneRe), lit(0))).as("p"),
      size(regexp_extract_all(col("text"), lit(Curation.Ipv4Re), lit(0))).as("i"),
      Curation.redactPii(col("text")).as("red"))
      .select(col("text"), col("st.n_emails"), col("st.n_phones"), col("st.n_ips"),
        col("st.redacted"), col("e"), col("p"), col("i"), col("red"))
      .collect()
    rows.foreach { r =>
      assert((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)) ==
        ((r.getInt(5), r.getInt(6), r.getInt(7), r.getString(8))),
        s"on '${esc(r.getString(0))}'")
    }
  }

  test("fuzz: nfc_normalize == java.text.Normalizer on adversarial text") {
    val rows = fuzzTexts.toDF("text")
      .select(col("text"), KernelExpressions.nfc_normalize(col("text")).as("n"))
      .collect()
    rows.foreach { r =>
      val expect = java.text.Normalizer.normalize(
        r.getString(0), java.text.Normalizer.Form.NFC)
      assert(r.getString(1) == expect,
        s"on '${esc(r.getString(0))}': kernel '${esc(r.getString(1))}' vs JDK '${esc(expect)}'")
    }
  }

  test("fuzz: hashed-gram jaccard == string-gram jaccard on adversarial pairs") {
    import graft.operators.Dedup
    // neighbor pairs, plus each text against a shuffled partner — mix of
    // near-identical (shared generator) and unrelated pairs
    val pairs = fuzzTexts.lazyZip(fuzzTexts.drop(1) :+ fuzzTexts.head).toSeq
    val df = pairs.toDF("a", "b")
    val rows = df.select(col("a"), col("b"),
      Dedup.jaccard(Dedup.wordNgrams(col("a"), 3), Dedup.wordNgrams(col("b"), 3)).as("js"),
      KernelExpressions.jaccard_sorted(
        KernelExpressions.sorted_gram_hashes(col("a"), 3),
        KernelExpressions.sorted_gram_hashes(col("b"), 3)).as("jh"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-12,
        s"on '${esc(r.getString(0))}' vs '${esc(r.getString(1))}': string ${r.getDouble(2)} hash ${r.getDouble(3)}")
    }
  }

  test("fuzz: minhash/simhash invariants on adversarial text") {
    val df = fuzzTexts.toDF("text")
    val rows = df.select(col("text"),
      KernelExpressions.minhash_sig(col("text")).as("mh"),
      KernelExpressions.sig_agree(
        KernelExpressions.minhash_sig(col("text")),
        KernelExpressions.minhash_sig(col("text"))).as("self"),
      KernelExpressions.simhash64(col("text")).as("sh"))
      .collect()
    val again = df.select(KernelExpressions.simhash64(col("text"))).collect()
    rows.lazyZip(again).foreach { (r, r2) =>
      assert(r.getSeq[Long](1).length == Kernels.MinHashK)
      assert(r.getDouble(2) == 1.0, s"self-agreement on '${esc(r.getString(0))}'")
      assert(r.getLong(3) == r2.getLong(0), "simhash must be deterministic")
    }
    // Spark-trim alignment: all-space text is tokenless (simhash 0,
    // constant minhash); tab-only text is NOT (trim keeps the tab)
    val pinned = Seq("      ", "\t").toDF("text")
      .select(KernelExpressions.simhash64(col("text"))).collect().map(_.getLong(0))
    assert(pinned(0) == 0L && pinned(1) != 0L)
  }

  test("fuzz: cdc_chunks covers every token exactly once, deterministic") {
    val df = fuzzTexts.toDF("text")
    val chunks = KernelExpressions.cdc_chunks(col("text"), 16)
    val rows = df.select(col("text"),
      aggregate(chunks, lit(0L), (acc, c) => acc + c.getField("clen")).as("covered"),
      size(filter(chunks, c => c.getField("clen") <= 0)).as("bad"),
      // tokenless text (empty after space-trim) has zero chunks; any
      // other text's chunks must cover size(tokens) exactly
      when(length(trim(col("text"))) > 0,
        size(TextFunctions.tokens(col("text"))).cast("long")).otherwise(lit(0L)).as("want"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(3),
        s"on '${esc(r.getString(0))}': chunks cover ${r.getLong(1)} of ${r.getLong(3)} tokens")
      assert(r.getInt(2) == 0, s"non-positive chunk length on '${esc(r.getString(0))}'")
    }
  }

  // ---- adversarial vectors --------------------------------------------

  private val special = Seq(Double.NaN, Double.PositiveInfinity,
    Double.NegativeInfinity, 0.0, -0.0, 1e-300, -1e-300, 1e300, -1e300,
    Double.MinPositiveValue)
  private val elem: Gen[Double] = Gen.frequency(
    6 -> Gen.chooseNum(-1e3, 1e3),
    2 -> Gen.oneOf(special),
    1 -> Gen.chooseNum(-1e6, 1e6).map(_ / 1e15))
  private def vecOf(n: Int): Gen[Array[Double]] =
    Gen.listOfN(n, elem).map(_.toArray)
  private val vec: Gen[Array[Double]] =
    Gen.frequency(1 -> Gen.const(0), 9 -> Gen.chooseNum(1, 24)).flatMap(vecOf)

  test("fuzz: int8_quantize kernel == composed HOF form on special-value vectors") {
    import graft.operators.Similarity
    val vs = sample(vec, 300, 15L)
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    val k = Similarity.int8Quantize(df, "vec_id", "embedding").orderBy("vec_id").collect()
    val c = Similarity.int8QuantizeComposed(df, "vec_id", "embedding").orderBy("vec_id").collect()
    assert(k.length == c.length)
    k.lazyZip(c).foreach { (a, b) =>
      assert(eqv(a.toSeq, b.toSeq),
        s"vec ${a.get(0)} [${vs(a.getLong(0).toInt).mkString(",")}]: kernel ${a.toSeq} vs composed ${b.toSeq}")
    }
  }

  test("fuzz: cosine_sim kernel == composed dot/sqrt form on special-value pairs") {
    val pair: Gen[(Array[Double], Array[Double])] =
      Gen.frequency(1 -> Gen.const(0), 9 -> Gen.chooseNum(1, 24))
        .flatMap(n => vecOf(n).flatMap(a => vecOf(n).map(b => (a, b))))
    val ps = sample(pair, 300, 16L)
    val df = ps.toDF("a", "b")
    import graft.functions.VectorFunctions._
    // The kernel's contract is IEEE division (0/0 → NaN, x/0 → ±Inf,
    // never an error); a bare Divide can't express that in EITHER ANSI
    // mode (ANSI throws DIVIDE_BY_ZERO, non-ANSI returns NULL), so the
    // composed reference spells the zero-denominator edge as dot · +Inf
    // — bit-equal to dot/0.0 for every sign and NaN — and nullif's the
    // live divisor so it runs under the session's pinned ANSI mode.
    val dot = array_dot(col("a"), col("b"))
    val denom =
      sqrt(array_dot(col("a"), col("a"))) * sqrt(array_dot(col("b"), col("b")))
    val composed = when(denom === lit(0.0), dot * lit(Double.PositiveInfinity))
      .otherwise(dot / nullif(denom, lit(0.0)))
    val rows = df.select(
      KernelExpressions.cosine_sim(col("a"), col("b")).as("k"), composed.as("c"))
      .collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      val (kv, cv) = (r.getDouble(0), r.getDouble(1))
      assert(kv == cv || (kv.isNaN && cv.isNaN),
        s"pair $i [${ps(i)._1.mkString(",")}] vs [${ps(i)._2.mkString(",")}]: kernel $kv composed $cv")
    }
  }

  test("fuzz: unit_vector kernel == composed x/sqrt(dot) form on special-value vectors") {
    import graft.functions.VectorFunctions._
    val vs = sample(vec, 300, 17L)
    val df = vs.toDF("v")
    val norm = sqrt(array_dot(col("v"), col("v")))
    // Same IEEE-division-in-ANSI-safe-Spark spelling as the cosine test:
    // x · +Inf ≡ x/0.0 on the zero-norm edge (0·Inf → NaN like 0/0;
    // a subnormal x whose square underflowed to 0 → ±Inf like x/0).
    val rows = df.select(
      KernelExpressions.unit_vector(col("v")).as("k"),
      transform(col("v"), x =>
        when(norm === lit(0.0), x * lit(Double.PositiveInfinity))
          .otherwise(x / nullif(norm, lit(0.0)))).as("c"))
      .collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(eqv(r.getSeq[Double](0), r.getSeq[Double](1)),
        s"vec $i [${vs(i).mkString(",")}]: kernel ${r.getSeq[Double](0)} vs composed ${r.getSeq[Double](1)}")
    }
  }

  test("fuzz: hyperplane_bucket stays in range and matches driver math on specials") {
    val planes = {
      val rng = new java.util.Random(7)
      Array.fill(6)(Array.fill(16)(rng.nextGaussian()))
    }
    val vs = sample(vecOf(16), 200, 18L)
    val rows = vs.toDF("v")
      .select(col("v"), KernelExpressions.hyperplane_bucket(col("v"), planes).as("b"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](0)
      var expect = 0
      planes.zipWithIndex.foreach { case (p, b) =>
        var dot = 0.0
        var i = 0
        while (i < p.length && i < v.length) { dot += p(i) * v(i); i += 1 }
        if (dot > 0) expect |= (1 << b)
      }
      assert(r.getInt(1) == expect && r.getInt(1) >= 0 && r.getInt(1) < 64,
        s"vec [${v.mkString(",")}]: got ${r.getInt(1)} want $expect")
    }
  }
}
