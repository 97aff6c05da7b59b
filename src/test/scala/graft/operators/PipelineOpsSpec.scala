package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions

/** Specs for the training-data-pipeline operators on CONSTRUCTED inputs
  * (known duplicates, known languages) — the driver tables only contain
  * organic near-dups, so these pin down semantics deterministically.
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup of 0
    (3L, "completely different words about spark histograms and gradient boosting trees"),
    (4L, "el rapido zorro marron salta sobre el perro perezoso cerca del rio hoy")
  ).toDF("doc_id", "text")

  test("textClasses/classReps: total mapping, min-id reps, multiplicity; " +
      "null text forms its own class") {
    // the collapse-first primitive behind the corpus-stat queries: the
    // mapping must be TOTAL (one row per input doc), rep = min id of the
    // identical-text class, m = class size, and null text must survive
    // the digest join as its own class (a plain equi-join on md5(null)
    // would silently DROP those docs from every collapsed query).
    val withNull = docs.unionByName(Seq[(Option[Long], Option[String])](
      (Option.empty[Long], Option.empty[String]),
      (Some(9L), Option.empty[String]))
      .toDF("doc_id", "text").select(col("doc_id"), col("text")))
    // this test pins the COLLAPSED tier's semantics; the shared session
    // may carry an all-distinct duplication ratio from another suite's
    // Tables.documents call, which would flip auto mode to identity
    spark.conf.set(Dedup.CollapseModeConf, "always")
    try {
      val mapping = Dedup.textClasses(withNull, "doc_id", "text").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          (r.getLong(1), r.getLong(2)))).toMap
      assert(mapping.size == 7, "mapping must be total over the input")
      assert(mapping(0L) == (0L, 2L) && mapping(1L) == (0L, 2L),
        "exact dups share the min-id rep with m = 2")
      assert(mapping(2L) == (2L, 1L) && mapping(3L) == (3L, 1L) &&
        mapping(4L) == (4L, 1L), "unique texts are their own class")
      assert(mapping(9L) == (9L, 2L) && mapping(-1L)._2 == 2L,
        "null texts form one class (null-min rep skips the null id)")
      val reps = Dedup.classReps(withNull, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reps == Map(0L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 2L),
        "one row per class keyed by its representative doc")
    } finally spark.conf.unset(Dedup.CollapseModeConf)
  }

  test("exact dedup groups identical texts") {
    val groups = docs.groupBy(md5(col("text")).as("fp"))
      .agg(min("doc_id").as("keep"), count(lit(1)).as("copies"))
      .where(col("copies") > 1).collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[Long]("keep") == 0L)
    assert(groups(0).getAs[Long]("copies") == 2L)
  }

  test("minhash LSH finds exact and near duplicates, skips unrelated docs") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L)), s"exact dup pair missing: $keys")
    assert(pairs.find(p => (p._1, p._2) == (0L, 1L)).get._3 == 1.0)
    assert(keys.contains((0L, 2L)) || keys.contains((1L, 2L)), s"near dup pair missing: $keys")
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L), s"unrelated doc paired: $keys")
  }

  test("prefix-filtered jaccard join == brute force on real documents (completeness)") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (t <- Seq(0.5, 0.8)) {
      val got = Dedup.prefixFilteredJaccardJoin(real, "doc_id", "text", 3, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      val d = real.select(col("doc_id"),
        Dedup.sortedGramHashes(col("text"), 3).as("g"))
      val brute = d.alias("a").join(d.alias("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"),
          round(graft.functions.KernelExpressions.jaccard_sorted(
            col("a.g"), col("b.g")), 4).as("j"))
        .where(col("j") >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      assert(got === brute, s"t=$t: prefix join must equal brute force")
      assert(brute.nonEmpty, s"t=$t fixture has no qualifying pairs — test is vacuous")
    }
  }

  test("prefix-filtered jaccard join on synthetic dups: exact pair scores 1.0") {
    val got = Dedup.prefixFilteredJaccardJoin(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got((0L, 1L)) === 1.0)
    assert(got.contains((0L, 2L)) && got.contains((1L, 2L)))
    assert(!got.keys.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("containment join == brute force on real documents (directed, completeness)") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (t <- Seq(0.6, 0.8)) {
      val got = Dedup.containmentJoin(real, "doc_id", "text", 3, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      val d = real.select(col("doc_id"),
        Dedup.sortedGramHashes(col("text"), 3).as("g"))
      val brute = d.alias("a").join(d.alias("b"), col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"),
          round(size(array_intersect(col("a.g"), col("b.g"))).cast("double") /
            size(col("a.g")), 4).as("c"))
        .where(col("c") >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      assert(got === brute, s"t=$t: containment join must equal brute force")
      assert(brute.nonEmpty, s"t=$t fixture has no qualifying pairs — test is vacuous")
    }
  }

  test("containment is directional: a quoted doc is contained, not containing") {
    val c = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog while the sun " +
        "sets over distant hills beyond the river"),
      (2L, "completely different words about glass and steel and rain")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentJoin(c, "doc_id", "text", 3, 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.keySet == Set((0L, 1L)), s"got $got")
    assert(got((0L, 1L)) == 1.0)
  }

  test("identical docs contain each other in both directions at 1.0") {
    val got = Dedup.containmentJoin(docs, "doc_id", "text", 3, 0.95)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.contains((0L, 1L)) && got.contains((1L, 0L)))
    assert(got((0L, 1L)) == 1.0 && got((1L, 0L)) == 1.0)
  }

  test("bigram LM corpus score: hand-computed transition sums") {
    // corpus: d0 "a b a b" → grams (a b, b a, a b); d1 "a b c" → (a b, b c);
    // d2 "x" → degenerate single-token gram (x).
    // c2: (a b)=3, (b a)=1, (b c)=1, (x)=1; c1 by left token: a=3, b=2, x=1.
    val lm = Seq((0L, "a b a b"), (1L, "a b c"), (2L, "x")).toDF("doc_id", "text")
    val got = NgramLm.bigramCorpusScore(lm, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(got(0L) === ((3L, 7L, 8L, 1L, 0.875, 0.333333)))  // (3+1+3)/(3+2+3)
    assert(got(1L) === ((2L, 4L, 5L, 1L, 0.8, 0.5)))         // (3+1)/(3+2)
    assert(got(2L) === ((1L, 1L, 1L, 1L, 1.0, 1.0)))
  }

  test("int8 quantization: hand-computed codes, zero-vector totality, recon quality") {
    val vecs = Seq(
      (0L, Array(1.0f, -0.5f, 0.25f)),
      (1L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.int8Quantize(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Int](2), r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Double]))).toMap
    // scale = 127: 1.0→127, -63.5→-64 (half away from zero), 31.75→32
    assert(got(0L)._1 === Seq(127, -64, 32))
    assert(got(0L)._2 === 95L && got(0L)._3 === 223L)
    assert(got(0L)._4.get > 0.999)   // 3-dim recon stays tight
    assert(got(1L)._1 === Seq(0, 0, 0) && got(1L)._4.isEmpty)

    // real embeddings: codes bounded, recon cosine high for every vector
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = Similarity.int8Quantize(real, "vec_id", "embedding").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val codes = r.getSeq[Int](2)
      assert(codes.forall(c => c >= -127 && c <= 127))
      assert(r.getAs[Double]("recon_cos") > 0.995, s"poor recon for ${r.getLong(0)}")
    }
  }

  test("int8 quantize kernel == composed transform/aggregate HOF form, " +
      "bit-for-bit per field (real embeddings + edges)") {
    val edges = Seq(
      (1000L, Array(0.0f, 0.0f)),          // all-zero → zero codes, null cos
      (1001L, Array(-3.5f)),               // single negative element
      (1002L, Array(1e-8f, -1e-8f, 1e-8f)), // tiny maxabs → big scale
      (1003L, Array(1.0f, Float.NaN, 0.5f)) // NaN → NaN maxabs, zero codes, NaN cos
    ).toDF("vec_id", "embedding")
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).unionByName(edges)
    val byKernel = Similarity.int8Quantize(real, "vec_id", "embedding")
      .orderBy(col("vec_id")).collect()
    // The composed reference is ANSI-SAFE BY CONSTRUCTION since round 15
    // (nullif'd divisors, nanvl+clamp before the int cast — see
    // int8QuantizeComposed's scaladoc), so this collect runs under the
    // session's pinned ANSI mode like every production query; the old
    // ANSI-off try/finally wrapper is gone on purpose, because running
    // the reference under ANSI is itself part of the pin.
    val byComposed =
      Similarity.int8QuantizeComposed(real, "vec_id", "embedding")
        .orderBy(col("vec_id")).collect()
    assert(byKernel.length == byComposed.length && byKernel.nonEmpty)
    // NaN-aware field compare: boxed-Double == is false for NaN==NaN,
    // but the NaN edge row must pin maxabs=NaN on BOTH sides
    def canon(r: org.apache.spark.sql.Row): Seq[Any] = r.toSeq.map {
      case d: java.lang.Double if d.isNaN => "NaN"
      case x => x
    }
    byKernel.zip(byComposed).foreach { case (k, c) =>
      assert(canon(k) == canon(c), s"vec ${k.get(0)}")
    }
    // and the NaN row's shape is the documented one, not accidental:
    // NaN maxabs, zero codes, NaN recon_cos (Spark's maxabs>0 is TRUE
    // for NaN, so the composed form takes the scaled branch)
    val nanRow = byKernel.find(_.getLong(0) == 1003L).get
    assert(nanRow.getDouble(1).isNaN && nanRow.getSeq[Int](2) == Seq(0, 0, 0)
      && nanRow.getDouble(5).isNaN, nanRow.toString)
  }

  test("vocab OOV rate: hand-computed boundary with deterministic tie-break") {
    // counts: a=4, b=3, c=2, d=1, e=1 → V=3 vocab {a,b,c}; d,e are OOV
    val corpus = Seq((0L, "a a b c d"), (1L, "a b c e"), (2L, "a b")).toDF("doc_id", "text")
    val got = Curation.vocabOovRate(corpus, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(0L) === ((5L, 1L, 0.2)))
    assert(got(1L) === ((4L, 1L, 0.25)))
    assert(got(2L) === ((2L, 0L, 0.0)))

    // tie-break at the boundary: with V=4, ties d/e at count 1 resolve by
    // token order → d enters, e stays OOV
    val got4 = Curation.vocabOovRate(corpus, "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got4(0L) === 0L && got4(1L) === 1L)
  }

  test("canonical selection is consistent with cluster stats on real documents") {
    val dir = "/root/testdata/sf0.001"
    val clusters = graft.SparkEntry.queries("q_dedup_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val canon = graft.SparkEntry.queries("q_dedup_canonical")(spark, dir).collect()
    assert(canon.nonEmpty, "no clusters at sf0.001 — consistency test is vacuous")
    canon.foreach { r =>
      val (rep, n, keep, dropped) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))
      val (cn, csum) = clusters(rep)
      assert(n === cn, s"member count diverges for cluster $rep")
      assert(keep + dropped === csum, s"keep+dropped != members_sum for $rep")
      assert(keep >= rep, s"keep_doc below the min-label rep for $rep")
    }
    assert(canon.map(_.getLong(0)).toSet === clusters.keySet,
      "canonical and cluster-stats disagree on the cluster set")
  }

  test("incremental dedup: exact, near, and clean verdicts against a corpus") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (11L, "totally unrelated text about gradient boosted tree training"),
      (12L, "the quick brown fox jumps over the lazy dog near the river bank")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 10 (min of 10,12)
      (1L, "the quick brown fox jumps over the lazy dog near the river pier"), // near dup only
      (2L, "completely novel content that matches nothing in the corpus here")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(corpus, batch, "doc_id", "text", 3, 0.5)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getBoolean(3))).toMap
    assert(got(0L) === ((Some(10L), Some(10L), true)))
    assert(got(1L)._1.isEmpty && got(1L)._2 === Some(10L) && got(1L)._3)
    assert(got(2L) === ((None, None, false)))
  }

  test("incremental dedup: batch-internal duplicates NEVER set a verdict — " +
      "partners come from the corpus only (r17 asymmetric-screen edges)") {
    val corpus = Seq(
      (10L, "completely separate corpus material about spark join planning")
    ).toDF("doc_id", "text")
    val batch = Seq(
      // 0/1: exact duplicates of each other, no corpus relative
      (0L, "two arriving documents that duplicate one another exactly today"),
      (1L, "two arriving documents that duplicate one another exactly today"),
      // 2/3: near duplicates of each other, no corpus relative
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (3L, "the quick brown fox jumps over the lazy dog near the river pier"),
      // 4: near dup OF THE CORPUS doc (one token swap)
      (4L, "completely separate corpus material about spark query planning")
    ).toDF("doc_id", "text")
    for (mode <- Seq("always", "never")) {
      spark.conf.set(Dedup.CollapseModeConf, mode)
      val got =
        try Dedup.incrementalDedup(corpus, batch, "doc_id", "text", 3, 0.5)
          .collect().map(r => r.getLong(0) ->
            (Option(r.get(1)), Option(r.get(2)), r.getBoolean(3))).toMap
        finally spark.conf.unset(Dedup.CollapseModeConf)
      // batch-batch relations (exact or near) are NOT dup verdicts
      for (id <- Seq(0L, 1L, 2L, 3L))
        assert(got(id) === ((None, None, false)),
          s"mode=$mode: batch-internal relation leaked a verdict for doc $id")
      // a genuine corpus near-dup still resolves to the corpus partner
      assert(got(4L) === ((None, Some(10L), true)), s"mode=$mode: ${got(4L)}")
    }
  }

  test("simhash: identical docs get identical fingerprints; near dups are close") {
    val t = Dedup.simhashTable(docs, "doc_id", "text")
      .select("doc_id", "simhash").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t(0L) == t(1L))
    assert(java.lang.Long.bitCount(t(0L) ^ t(2L)) <= 16, "near dup should be hamming-close")
    assert(java.lang.Long.bitCount(t(0L) ^ t(3L)) > 16, "unrelated doc should be far")
    val pairs = Dedup.simhashNearPairs(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("simhash near-pairs are COMPLETE for the requested radius: every pair " +
      "with hamming <= 10 is found, including planted pairs past the old 4-segment bound") {
    import org.apache.spark.unsafe.types.UTF8String
    // base text + k-token substitutions → a spread of hamming distances
    val baseToks = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango uniform " +
      "victor whiskey xray yankee zulu one two three four five six seven eight").split(" ")
    val texts = (0 until 40).map { v =>
      val t = baseToks.clone()
      val rng = new scala.util.Random(v)
      val flips = v % 8
      (0 until flips).foreach { _ =>
        val i = rng.nextInt(t.length)
        t(i) = s"sub${rng.nextInt(1000)}"
      }
      t.mkString(" ")
    } :+ "entirely unrelated content about gradient boosted histogram training kernels"
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val hashes = texts.map(t => graft.functions.Kernels.simhash64(UTF8String.fromString(t)))
    val truth = (for {
      i <- texts.indices; j <- texts.indices if i < j
      ham = java.lang.Long.bitCount(hashes(i) ^ hashes(j)) if ham <= 10
    } yield (i.toLong, j.toLong, ham)).toSeq
    // non-vacuous: some ground-truth pairs must lie PAST the old hamming<=3
    // completeness bound of the fixed 4-segment scheme
    assert(truth.exists(_._3 > 3), s"fixture too tight: ${truth.map(_._3).sorted}")
    val got = Dedup.simhashNearPairs(df, "doc_id", "text", 10)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth.map(t => (t._1, t._2)).toSet,
      s"missing=${truth.map(t => (t._1, t._2)).toSet -- got} extra=${got -- truth.map(t => (t._1, t._2)).toSet}")
  }

  test("LSH hot-bucket cap drops quadratic buckets, keeps organic pairs") {
    // 6 identical docs (a hot bucket at cap 3) + one organic near-dup pair
    val hotDocs = (10L until 16L).map(i =>
      (i, "spam spam spam identical boilerplate page repeated everywhere onto the web"))
    val df = (docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ++ hotDocs)
      .toDF("doc_id", "text")
    val sigs = df.select(col("doc_id"), Dedup.minhashSignature(col("text")).as("mh"))
    val capped = Dedup.lshCandidatePairs(sigs, "doc_id", 0.3, maxBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists(p => p._1 >= 10L && p._2 >= 10L),
      s"hot-bucket pairs must be dropped: $capped")
    assert(capped.contains((0L, 1L)), s"organic dup pair must survive: $capped")
  }

  test("word-trigram jaccard: 1.0 for exact dup, high for near dup, 0 for unrelated") {
    val d = docs.select(col("doc_id"), Dedup.wordNgrams(col("text"), 3).as("grams"))
    val a = d.alias("a"); val b = d.alias("b")
    val rows = a.join(b, col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"),
        Dedup.jaccard(col("a.grams"), col("b.grams")).as("j"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows((0L, 1L)) == 1.0)
    assert(rows((0L, 2L)) > 0.7)
    assert(rows((0L, 3L)) == 0.0)
  }

  test("langId identifies constructed English vs Spanish") {
    val out = docs.select(col("doc_id"),
      graft.functions.KernelExpressions.lang_id(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "en")
    assert(out(4L) == "es")
  }

  test("fnv64 expression matches a reference JVM implementation and survives codegen") {
    def fnvRef(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    val rows = docs.select(col("text"), TextFunctions.fnv64(col("text")).as("fp")).collect()
    rows.foreach { r => assert(r.getLong(1) == fnvRef(r.getString(0))) }
  }

  test("brute-force topK returns k neighbors ranked by cosine") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.9f, 0.1f)),
      (4L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.where(col("vec_id") === 0), "vec_id", "embedding", 2)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(top.toSeq == Seq((1, 1L), (2, 2L)))
  }

  test("embedding LSH near-dup pairs recover most brute-force pairs (real embeddings)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb.select(col("vec_id"), col("embedding"))
    def brutePairs(thr: Double) = e.alias("a").crossJoin(e.alias("b"))
      .where(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a"), col("b.vec_id").as("b"),
        Dedup.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .where(col("cos") >= thr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // thresholds offset by an epsilon: the unit-vector dot and the direct
    // cosine formula differ in final ulps at the exact boundary
    assert(approx.subsetOf(brutePairs(0.7999)),
      "LSH pairs must all be true near-dups (exact cosine filter)")
    val strict = brutePairs(0.8001)
    if (strict.nonEmpty) {
      val recall = (approx & strict).size.toDouble / strict.size
      assert(recall > 0.7, s"recall $recall over ${strict.size} true pairs")
    }
  }

  test("normalized dedup groups case/punctuation variants of the same content") {
    val df = Seq(
      (0L, "Hello, World! This is GREAT."),
      (1L, "hello world  this is great"),
      (2L, "HELLO WORLD: this is great!!!"),
      (3L, "a different document entirely"),
      (4L, "A different DOCUMENT -- entirely")
    ).toDF("doc_id", "text")
    val groups = Curation.normalizedDupGroups(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups == Map(0L -> 3L, 3L -> 2L), s"got $groups")
    // normalization semantics: canonical form is stable
    val norm = df.select(Curation.normalizeText(col("text"))).collect().map(_.getString(0))
    assert(norm(0) == "hello world this is great")
    assert(norm(0) == norm(1) && norm(1) == norm(2))
  }

  test("centroid outliers: a planted far vector ranks first in its label") {
    val rng = new scala.util.Random(5)
    def v(base: Array[Double]) = base.map(x => (x + rng.nextGaussian() * 0.05).toFloat)
    val cluster0 = (0L until 20L).map(i => (i, v(Array(1.0, 0.0, 0.0, 0.0)), 0))
    val cluster1 = (20L until 40L).map(i => (i, v(Array(0.0, 1.0, 0.0, 0.0)), 1))
    val outlier = Seq((99L, Array(-1.0f, 0.0f, 0.0f, 0.0f), 0)) // anti-aligned in label 0
    val df = (cluster0 ++ cluster1 ++ outlier).toDF("vec_id", "embedding", "label")
    val worst = Curation.centroidOutliers(df, "vec_id", "label", "embedding", 1)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(worst(0) == 99L, s"planted outlier must rank first in label 0: $worst")
  }

  test("stratified modulo sample keeps exactly the configured id residues per stratum") {
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val kept = Curation.stratifiedModuloSample(df, "doc_id", "lang", Map("en" -> 0.5), 0.2)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    kept.foreach { case (id, lang) =>
      val cap = if (lang == "en") 50 else 20
      assert(id % 100 < cap, s"row $id/$lang breaks its stratum cap")
    }
    val en = kept.count(_._2 == "en")
    val de = kept.count(_._2 == "de")
    assert(en == 250, s"en stratum: got $en of 500") // even ids with id%100 in [0,50)
    assert(de == 100, s"de stratum: got $de of 500")
    // deterministic: same rows on re-run
    val again = Curation.stratifiedModuloSample(df, "doc_id", "lang", Map("en" -> 0.5), 0.2)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("topTerms ranks by count desc then token, excludes stopwords and short tokens") {
    val df = Seq(
      ("s1", "alpha alpha alpha beta beta gamma the the the the of of tiny"),
      ("s2", "delta delta echo")
    ).toDF("source", "text")
    val got = Curation.topTerms(df, "source", "text", 2, 4, Seq("the", "of"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(got.toSet == Set(
      ("s1", 1, "alpha", 3L), ("s1", 2, "beta", 2L),
      ("s2", 1, "delta", 2L), ("s2", 2, "echo", 1L)), s"got ${got.toSeq}")
  }

  test("tfidfTerms downweights tokens shared across groups") {
    val df = Seq(
      // "common" appears in both sources; each has a distinctive token
      ("s1", "common common common unique1 unique1"),
      ("s2", "common common common unique2")
    ).toDF("source", "text")
    val got = Curation.tfidfTerms(df, "source", "text", 2, 4, Nil)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // scores: unique1 tf=2 df=1 N=2 -> 4.0; common tf=3 df=2 -> 3.0
    assert(got.toSet == Set(
      ("s1", 1, "unique1", 2L, 1L, 4.0), ("s1", 2, "common", 3L, 2L, 3.0),
      ("s2", 1, "common", 3L, 2L, 3.0), ("s2", 2, "unique2", 1L, 1L, 2.0)),
      s"got ${got.toSeq}")
  }

  test("packSequences assigns each doc to the chunk holding its first token, per group") {
    val df = Seq(
      // group g1: tokens 3,4,2 with budget 5 -> starts at 0,3,7 -> seqs 0,0,1
      ("g1", 1L, 3), ("g1", 2L, 4), ("g1", 3L, 2),
      // group g2 packs independently
      ("g2", 1L, 6), ("g2", 2L, 1)
    ).toDF("src", "id", "toks")
    val got = Curation.packSequences(df, Seq("src"), "id", "toks", 5)
      .orderBy($"src", $"id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("g1", 1L, 0L), ("g1", 2L, 0L), ("g1", 3L, 1L),
      ("g2", 1L, 0L), ("g2", 2L, 1L)))
  }

  test("domainCap keeps at most k docs per group, deterministically") {
    val df = (1L to 100L).map(i => (s"s${i % 3}", i, s"text body $i")).toDF("src", "id", "text")
    val kept = Curation.domainCap(df, "src", "text", "id", 10)
    val counts = kept.groupBy($"src").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(counts.values.forall(_ == 10L), counts.toString)
    // reproducible: identical selection on re-run and after repartition
    val again = Curation.domainCap(df.repartition(7), "src", "text", "id", 10)
    assert(kept.select($"id").collect().map(_.getLong(0)).sorted
      .sameElements(again.select($"id").collect().map(_.getLong(0)).sorted))
    // the two-phase (sharded) selection equals the direct global top-k
    import org.apache.spark.sql.expressions.Window
    val direct = df.withColumn("rn",
        row_number().over(Window.partitionBy($"src").orderBy(md5($"text"), $"id")))
      .where($"rn" <= 10).select($"id").collect().map(_.getLong(0)).sorted
    assert(kept.select($"id").collect().map(_.getLong(0)).sorted.sameElements(direct))
  }

  test("softDedupWeights weights each copy 1/cluster-size") {
    val df = Seq("dup", "dup", "dup", "unique-a", "unique-b").toDF("text")
    val got = Curation.softDedupWeights(df, "text")
      .select($"text", $"n_copies", $"weight").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.count(_._1 == "dup") === 3)
    got.foreach {
      case ("dup", n, w) => assert(n === 3L && math.abs(w - 1.0 / 3) < 1e-15)
      case (_, n, w)     => assert(n === 1L && w === 1.0)
    }
    // total effective mass = number of distinct texts
    assert(math.abs(got.map(_._3).sum - 3.0) < 1e-12)
  }

  test("randomProjection computes the exact plane dot products, per row") {
    val planes = Similarity.gaussianPlanes(dim = 4, rows = 2, seed = 7L)
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 2.0f, -1.0f)),
      (2L, Seq(0.5f, 0.5f, 0.5f, 0.5f)))
    val got = Similarity.randomProjection(vecs.toDF("id", "v"), "v", planes, "proj")
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](2)))
    vecs.zip(got).foreach { case ((id, v), (gid, proj)) =>
      assert(id === gid)
      planes.zipWithIndex.foreach { case (p, i) =>
        val want = v.map(_.toDouble).zip(p).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
        assert(proj(i) === want, s"id=$id dim=$i")
      }
    }
  }

  test("randomProjection approximately preserves relative distances (JL property)") {
    val dim = 64
    val planes = Similarity.gaussianPlanes(dim, rows = 16, seed = 7L)
      .map(_.map(_ / math.sqrt(16))) // scale so E[|proj|^2] = |v|^2
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(col("vec_id") < 40)
    val proj = Similarity.randomProjection(emb, "embedding", planes, "proj")
      .select($"vec_id", $"proj").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    val raw = emb.select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- raw.keys.toSeq.sorted.take(10); j <- raw.keys.toSeq.sorted.take(10) if i < j
    } yield d2(proj(i), proj(j)) / d2(raw(i), raw(j))
    // JL with 16 dims is coarse; just pin the right order of magnitude
    assert(ratios.forall(r => r > 0.2 && r < 3.0),
      s"distance ratios out of band: min=${ratios.min} max=${ratios.max}")
  }

  test("exactEmbeddingTopPairs: row-gate refuses O(N²) input, names the LSH tier") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // under the cap: works, agrees with itself on shape
    val top = Dedup.exactEmbeddingTopPairs(emb, "vec_id", "embedding", 5)
    assert(top.count() == 5)
    // over the cap (forced tiny): refuses LOUDLY, pointing at the scale path
    val e = intercept[IllegalArgumentException] {
      Dedup.exactEmbeddingTopPairs(emb, "vec_id", "embedding", 5, maxRows = 3L)
    }
    assert(e.getMessage.contains("q_dedup_embedding_lsh"))
    assert(e.getMessage.contains("O(N²)"))
    // conf override wins over the argument
    spark.conf.set("spark.graft.dedup.exactPairsMaxRows", "1000000")
    try {
      assert(Dedup.exactEmbeddingTopPairs(emb, "vec_id", "embedding", 3, maxRows = 3L)
        .count() == 3)
    } finally spark.conf.unset("spark.graft.dedup.exactPairsMaxRows")
  }

  test("LSH and IVF ANN achieve reasonable recall@5 vs brute force on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 10)
    def neighborSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, vs) => q -> vs.map(_._2).toSet }
    val exact = neighborSet(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
    val lsh = neighborSet(Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5))
    val ivf = neighborSet(Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5))
    // pinned tier on a DIFFERENT sf than the quantizer was fit on — the
    // frozen centroids must still carve useful cells on unseen data
    val ivfPinned = neighborSet(Similarity.ivfTopKPinned(emb, queries,
      "vec_id", "embedding", 5, graft.queries.IvfOracle.pinnedCentroids))
    def recall(approx: Map[Long, Set[Long]]): Double =
      exact.keys.toSeq.map(q => (approx.getOrElse(q, Set.empty) & exact(q)).size.toDouble / 5)
        .sum / exact.size
    val rl = recall(lsh)
    val ri = recall(ivf)
    val rp = recall(ivfPinned)
    assert(rl > 0.6, s"LSH recall too low: $rl")
    assert(ri > 0.3, s"IVF recall too low: $ri")
    assert(rp > 0.3, s"pinned-IVF recall too low: $rp")
  }

  test("contentHashSplit: exact duplicates always share a split; fraction tracks k/16") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    // duplicate every doc under a new id: every text now has >= 2 copies
    val dup = real.unionAll(real.withColumn("doc_id", $"doc_id" + 1000000L))
    val split = dup.select($"text", Curation.contentHashSplit($"text", 2).as("split"))
    val mixedTexts = split.groupBy($"text")
      .agg(countDistinct($"split").as("nsplits"))
      .where($"nsplits" > 1).count()
    assert(mixedTexts == 0, s"$mixedTexts texts leak across the split")
    val frac = split.where($"split" === "val").count().toDouble / split.count()
    assert(frac > 0.05 && frac < 0.20, s"val fraction $frac far from 2/16")
    // determinism across partitionings
    val a = split.orderBy($"text").collect().toSeq
    val b = dup.repartition(7)
      .select($"text", Curation.contentHashSplit($"text", 2).as("split"))
      .orderBy($"text").collect().toSeq
    assert(a == b)
  }

  test("prioritySample: top-k by w/u priority, deterministic and replayable") {
    val rows = (0L until 50L).map(i => (i, i % 7 + 1)).toDF("id", "w")
    val got = Curation.prioritySample(rows, "id", col("w"), 10).collect()
    // replay the exact arithmetic
    val expected = (0L until 50L).map { i =>
      val w = i % 7 + 1
      val u = (i * 2654435761L + 12345L) % 1000003L + 1L
      (i, w, w.toDouble * 1000004.0 / u.toDouble)
    }.sortBy { case (id, _, pr) => (-pr, id) }.take(10)
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      === expected.map { case (id, w, pr) => (id, w.toLong, pr) })
    // without replacement: ids are distinct
    assert(got.map(_.getLong(0)).distinct.length === 10)
  }

  test("exactAuc: hand case with a score tie gets midrank half credit") {
    // pairs: pos@2>neg@1 (+1), pos@2=neg@2 (+0.5), pos@3>neg@1 (+1),
    // pos@3>neg@2 (+1) → U=3.5, P=N=2 → AUC 0.875
    val rows = Seq((1, false), (2, true), (2, false), (3, true)).toDF("s", "y")
    val r = Curation.exactAuc(rows, col("s"), col("y")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) === ((2L, 2L, 0.875)))
  }

  test("exactAuc: an empty class yields NULL auc, never a crash or a 0/0 lie") {
    val onlyPos = Seq((1, true), (2, true)).toDF("s", "y")
    val r = Curation.exactAuc(onlyPos, col("s"), col("y")).collect().head
    assert(r.getLong(0) === 2L && r.getLong(1) === 0L && r.isNullAt(2))
  }

  test("prioritySample: empty input returns an empty, correctly-shaped frame") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "w")
    val out = Curation.prioritySample(empty, "id", col("w"), 5)
    assert(out.columns.toSeq === Seq("id", "wt", "pr") && out.count() === 0L)
  }

  test("contentDefinedChunks: NULL and whitespace-only docs produce no chunks") {
    val d = Seq((1L, null.asInstanceOf[String]), (2L, "   "), (3L, "a b"))
      .toDF("doc_id", "text")
    val out = Curation.contentDefinedChunks(d, "doc_id", "text", 8).collect()
    assert(out.map(_.getLong(0)).distinct.toSeq === Seq(3L))
  }

  test("exactAuc: perfect and inverted separations hit 1.0 and 0.0") {
    val perfect = Seq((1, false), (2, false), (3, true), (4, true)).toDF("s", "y")
    assert(Curation.exactAuc(perfect, col("s"), col("y"))
      .collect().head.getDouble(2) === 1.0)
    val inverted = Seq((1, true), (2, true), (3, false), (4, false)).toDF("s", "y")
    assert(Curation.exactAuc(inverted, col("s"), col("y"))
      .collect().head.getDouble(2) === 0.0)
  }

  test("prioritySample: a zero-weight row can never out-rank a positive one") {
    val rows = Seq((1L, 0L), (2L, 5L), (3L, 0L)).toDF("id", "w")
    val got = Curation.prioritySample(rows, "id", col("w"), 1).collect()
    assert(got.head.getLong(0) === 2L)
  }

  test("span corruption: sentinel substitution reconstructs the original text") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "one two"),
      (3L, (1 to 400).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curation.spanCorrupt(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.collect().foreach { d =>
      val id = d.getLong(0)
      val orig = d.getString(1).trim.split("\\s+").toSeq
      val r = out(id)
      assert(r.getAs[Int]("n_tokens") == orig.length)
      // substitute each <extra> sentinel in the input with the
      // corresponding target span — must reconstruct the original
      val spans = Iterator(r.getAs[String]("target_text"))
        .filter(_.nonEmpty).flatMap(_.split(" <extra> ")).toBuffer
      val rebuilt = r.getAs[String]("input_text").split("\\s+").toSeq.flatMap {
        case "<extra>" => spans.remove(0).split(" ").toSeq
        case t => Seq(t)
      }
      assert(rebuilt == orig, s"doc $id reconstruction")
      assert(spans.isEmpty, s"doc $id: unconsumed target spans")
      // span/token accounting consistent
      assert(r.getAs[Long]("n_masked") ==
        orig.length - r.getAs[String]("input_text").split("\\s+")
          .count(_ != "<extra>"))
    }
    // the long doc's masked fraction lands near the 15% target
    val frac = out(3L).getAs[Long]("n_masked").toDouble / 400
    assert(frac > 0.08 && frac < 0.25, s"masked fraction $frac")
    // determinism across partitionings
    val again = Curation.spanCorrupt(docs.repartition(5), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.toString).toMap
    assert(out.keys.forall(k => again(k) == out(k).toString))
  }
}
