package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Native-kernel expressions vs the composed Spark formulations they
  * replaced: same math, ~100× less per-row cost. Equivalence is asserted
  * on real table data so codegen paths execute (not just nullSafeEval).
  */
class KernelsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
  private def embeddings = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)

  test("word_ngrams kernel == composed HOF form, incl. short/empty texts") {
    val texts = docs.select(col("text")).as[String].collect().toSeq ++
      Seq("", "   ", "one", "one two", "a b a b a b", "x x x")
    val df = texts.toDF("text")
    val composedToks = graft.functions.TextFunctions.tokens(col("text"))
    val composed = array_distinct(transform(
      sequence(lit(1), greatest(size(composedToks) - 2, lit(1))),
      i => concat_ws(" ", slice(composedToks, i, lit(3)))))
    val rows = df.select(
      KernelExpressions.word_ngrams(col("text"), 3).as("k"),
      composed.as("c")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"kernel ${r.getSeq[String](0)} vs composed ${r.getSeq[String](1)}")
    }
  }

  test("word_ngrams_all keeps repeats and order; distinct of it == word_ngrams") {
    val texts = Seq("a b a b", "x", "", "  ", "p q r")
    val df = texts.toDF("text")
    val all = df.select(KernelExpressions.word_ngrams_all(col("text"), 2).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(all(0) === Seq("a b", "b a", "a b")) // repeat preserved
    assert(all(1) === Seq("x") && all(2) === Seq("") && all(3) === Seq(""))
    assert(all(4) === Seq("p q", "q r"))
    val viaDistinct = df.select(array_distinct(
      KernelExpressions.word_ngrams_all(col("text"), 2)).as("g")).collect().map(_.getSeq[String](0))
    val distinctKernel = df.select(KernelExpressions.word_ngrams(col("text"), 2).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(viaDistinct.toSeq === distinctKernel.toSeq)
  }

  test("term_counts kernel == composed size(filter(split)) form, incl. edge texts") {
    val texts = docs.select(col("text")).as[String].collect().toSeq ++
      Seq("", "   ", "spark", "spark spark  join", "nomatch at all", "spark\t\njoin")
    val terms = Seq("spark", "join", "dup")
    val df = texts.toDF("text")
    val composedToks = split(trim(col("text")), "\\s+")
    val composed = df.select(
      size(composedToks).cast("long") +:
        terms.map(t => size(filter(composedToks, tok => tok === lit(t))).cast("long")): _*)
      .collect().map(_.toSeq)
    val kernel = df.select(KernelExpressions.term_counts(col("text"), terms).as("tc"))
      .select((1 to terms.size + 1).map(i => element_at(col("tc"), i)): _*)
      .collect().map(_.toSeq)
    composed.zip(kernel).zipWithIndex.foreach { case ((c, k), i) =>
      assert(c === k, s"text ${texts(i).take(40)}")
    }
  }

  test("token_entropy_stats kernel == explode+groupBy form on real documents " +
      "(entropy at 4 dp; counts exact)") {
    val d = docs.select(col("doc_id"), col("text"))
      .unionByName(Seq((9001L, ""), (9002L, "   "), (9003L, "a a a a"),
        (9004L, "all distinct tokens here now")).toDF("doc_id", "text"))
    val byKernel = d
      .select(col("doc_id"),
        KernelExpressions.token_entropy_stats(col("text")).as("st"))
      .select(col("doc_id"), col("st.n_tokens"), col("st.n_distinct"),
        round(log2(col("st.n_tokens").cast("double"))
          - col("st.slc") / col("st.n_tokens").cast("double"), 4).as("entropy"))
      .orderBy(col("doc_id")).collect()
    val byGroup = d
      .select(col("doc_id"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum(col("c").cast("double") * log2(col("c").cast("double"))).as("slc"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(log2(col("n_tokens").cast("double"))
          - col("slc") / col("n_tokens").cast("double"), 4).as("entropy"))
      .orderBy(col("doc_id")).collect()
    assert(byKernel.length == byGroup.length && byKernel.nonEmpty)
    byKernel.zip(byGroup).foreach { case (k, g) =>
      assert(k.toSeq == g.toSeq, s"doc ${k.get(0)}")
    }
  }

  test("lang_id kernel == Seq[String]-UDF reference on real documents + " +
      "tie/empty/und edges") {
    val texts = docs.select(col("text")).as[String].collect().toSeq ++ Seq(
      "", "   ", "xqz yzzy nohits",
      // shared Romance stopwords: "la de que en un" hits es AND fr AND it
      // profiles — argmax tie must go to the alphabetically-first code
      "la de que en un", "de la", "the der el le il o",
      "der die das the and of el la de")
    val df = texts.toDF("t")
    val kernel = df.select(KernelExpressions.lang_id(col("t"))).as[String].collect()
    val udfRef = df.select(graft.functions.TextFunctions.langIdUdfReference(
      graft.functions.TextFunctions.tokens(col("t")))).as[String].collect()
    assert(kernel.toSeq == udfRef.toSeq)
    assert(kernel.contains("und"))
  }

  test("pii_stats kernel == composed regexp_extract_all counts + " +
      "regexp_replace chain, incl. overlap/edge strings") {
    import graft.operators.Curation
    val texts = docs.select(col("text")).as[String].collect().toSeq ++ Seq(
      "", "   ", "no pii here at all",
      "mail me at a.b-c%d@e-f.co.uk now",
      "call 555-123-4567 or 555-765-4321",
      "host 10.0.0.1 and 255.255.255.255 and 999.999.999.999",
      // overlap shapes: phone digits inside an email local part (email
      // must consume them whole), ip-like tail after an email
      "123-456-7890@mail.com then 1.2.3.4",
      "123-456-7890.a@b.co stays one email",
      "x 555-867-0001 y user7@example.com z 10.0.7.1",
      "double user1@a.com user2@b.org 111-222-3333 4.3.2.1 5.6.7.8")
    val df = texts.toDF("t")
    val kernel = df.select(KernelExpressions.pii_stats(col("t")).as("st"))
      .select(col("st.n_emails"), col("st.n_phones"), col("st.n_ips"),
        col("st.redacted")).collect()
    val composed = df.select(
        size(regexp_extract_all(col("t"), lit(Curation.EmailRe), lit(0))),
        size(regexp_extract_all(col("t"), lit(Curation.PhoneRe), lit(0))),
        size(regexp_extract_all(col("t"), lit(Curation.Ipv4Re), lit(0))),
        Curation.redactPii(col("t"))).collect()
    assert(kernel.length == composed.length)
    kernel.zip(composed).zipWithIndex.foreach { case ((k, c), i) =>
      assert(k.toSeq == c.toSeq, s"row $i (${texts(i).take(60)})")
    }
  }

  test("sorted_gram_hashes jaccard == string-gram jaccard on real documents") {
    val d = docs.select(col("doc_id"),
      Dedup.wordNgrams(col("text"), 3).as("grams"),
      Dedup.sortedGramHashes(col("text"), 3).as("hs"))
    val a = d.alias("a")
    val b = d.alias("b")
    val rows = a.join(b, col("a.doc_id") < col("b.doc_id"))
      .select(
        Dedup.jaccard(col("a.grams"), col("b.grams")).as("j_str"),
        KernelExpressions.jaccard_sorted(col("a.hs"), col("b.hs")).as("j_hash"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
        s"string ${r.getDouble(0)} vs hashed ${r.getDouble(1)}")
    }
  }

  test("cosine_sim matches the composed dot/sqrt formulation on float arrays") {
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val composed = {
      import graft.functions.VectorFunctions._
      val ad = toDoubleArray(col("a.embedding"))
      val bd = toDoubleArray(col("b.embedding"))
      array_dot(ad, bd) / (sqrt(array_dot(ad, ad)) * sqrt(array_dot(bd, bd)))
    }
    val rows = e.alias("a").join(e.alias("b"), col("a.vec_id") === col("b.vec_id") - 1)
      .select(composed.as("c_ref"),
        KernelExpressions.cosine_sim(col("a.embedding"), col("b.embedding")).as("c_kernel"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), s"${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("unit_vector: norm 1, direction preserved, float and double inputs") {
    val rows = embeddings
      .select(col("embedding"), KernelExpressions.unit_vector(col("embedding")).as("u"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val u = r.getSeq[Double](1)
      val norm = math.sqrt(u.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9)
      // direction: u proportional to v
      val scale = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.zip(u).foreach { case (x, y) => assert(math.abs(x / scale - y) < 1e-6) }
    }
    // double input accepted too
    val d = Seq(Tuple1(Array(3.0, 4.0))).toDF("v")
      .select(KernelExpressions.unit_vector(col("v"))).collect()(0).getSeq[Double](0)
    assert(math.abs(d(0) - 0.6) < 1e-12 && math.abs(d(1) - 0.8) < 1e-12)
  }

  test("minhash signatures: identical text -> identical sig; est_jaccard via sig_agree") {
    val df = Seq(
      (0L, "a b c d e f g h i j"),
      (1L, "a b c d e f g h i j"),
      (2L, "totally different words here with no overlap at all now")
    ).toDF("id", "text")
      .select(col("id"), KernelExpressions.minhash_sig(col("text")).as("mh"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L).length == Kernels.MinHashK)
    val agree = df.alias("x").join(df.alias("y"), col("x.id") < col("y.id"))
      .select(col("x.id"), col("y.id"),
        KernelExpressions.sig_agree(col("x.mh"), col("y.mh")).as("a"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(agree((0L, 1L)) == 1.0)
    assert(agree((0L, 2L)) < 0.2, s"disjoint docs should rarely agree: ${agree((0L, 2L))}")
  }

  test("minhash signature on empty/whitespace text: constant sig, no crash") {
    // Spark's trim strips U+0020 ONLY, so "   \t  " is NOT tokenless —
    // it trims to "\t", which splits to two empty fields, exactly like
    // the composed split(trim(text), "\\s+") column and the DuckDB
    // oracle's regexp_split_to_array(trim(text), '\s+'). Only all-space
    // (or truly empty) text gets the constant all-MaxValue signature.
    val df = Seq((0L, ""), (1L, "      "), (2L, "one"), (3L, "a b"),
      (4L, "   \t  "), (5L, "\t"))
      .toDF("id", "text")
      .select(col("id"), KernelExpressions.minhash_sig(col("text")).as("mh"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(1L), "all empty docs share the constant signature")
    assert(sigs(0L).forall(_ == Long.MaxValue))
    assert(sigs(2L).exists(_ != Long.MaxValue), "non-empty text gets a real signature")
    assert(sigs(3L) != sigs(2L))
    assert(sigs(4L) == sigs(5L), "space-trim leaves the tab: same tokens as bare \\t")
    assert(sigs(4L) != sigs(0L), "tab-only text is NOT tokenless under Spark trim")
  }

  test("unit_vector and cosine_sim accept integer-typed embeddings (widened to double)") {
    val df = Seq((Array(3, 4), Array(4L, 3L))).toDF("vi", "vl")
    val r = df.select(
      KernelExpressions.unit_vector(col("vi")).as("u"),
      KernelExpressions.cosine_sim(col("vi"), col("vl")).as("c")).collect()(0)
    val u = r.getSeq[Double](0)
    assert(math.abs(u(0) - 0.6) < 1e-12 && math.abs(u(1) - 0.8) < 1e-12)
    assert(math.abs(r.getDouble(1) - 24.0 / 25.0) < 1e-12)
  }

  test("hyperplane_bucket matches a reference driver-side computation on real embeddings") {
    val planes = {
      val rng = new java.util.Random(7)
      Array.fill(6)(Array.fill(16)(rng.nextGaussian()))
    }
    val rows = embeddings
      .select(col("vec_id"), col("embedding"),
        KernelExpressions.hyperplane_bucket(col("embedding"), planes).as("bucket"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      var expect = 0
      planes.zipWithIndex.foreach { case (p, b) =>
        var dot = 0.0
        var i = 0
        while (i < p.length && i < v.length) { dot += p(i) * v(i); i += 1 }
        if (dot > 0) expect |= (1 << b)
      }
      assert(r.getInt(2) == expect, s"vec ${r.getLong(0)}: got ${r.getInt(2)} want $expect")
    }
  }

  test("simhash kernel: equal text equal hash, near text hamming-close (real docs)") {
    val t = docs.select(col("doc_id"), KernelExpressions.simhash64(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t.values.toSet.size > 1, "simhash should not be constant")
    val again = docs.select(KernelExpressions.simhash64(col("text"))).collect().map(_.getLong(0))
    assert(again.toSeq == docs.select(col("doc_id")).collect().map(r => t(r.getLong(0))).toSeq)
  }

  test("nfc_normalize kernel: composes decomposed sequences, idempotent, NFC not NFKC") {
    import spark.implicits._
    // explicit escapes, NOT raw characters: an NFC-normalizing editor
    // would silently precompose a pasted decomposed literal
    val decomposedCafe = "cafe\u0301"            // e + combining acute
    val composedCafe = "caf\u00e9"
    val decomposedA = "A\u030angstro\u0308m"    // ring + diaeresis decomposed
    val composedA = "\u00c5ngstr\u00f6m"
    val ligature = "\uFB01le"                    // fi ligature, NFC-invariant
    val rows = Seq(decomposedCafe, composedCafe, decomposedA, ligature, "plain ascii")
      .toDF("s")
      .select(col("s"), KernelExpressions.nfc_normalize(col("s")).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val norm = rows.toMap
    assert(norm(decomposedCafe) == composedCafe)
    assert(norm(composedCafe) == composedCafe)
    assert(norm(decomposedA) == composedA)
    assert(norm(ligature) == ligature, "NFC must preserve compatibility ligatures")
    assert(norm("plain ascii") == "plain ascii")
    // idempotence: the normalized column is an NFC fixpoint
    rows.foreach { case (_, n) =>
      assert(java.text.Normalizer.isNormalized(n, java.text.Normalizer.Form.NFC))
    }
  }
}
