package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Dedup operators as registered queries over documents/embeddings. */
object DedupQueriesImpl {

  /** Exact dedup: group on a 128-bit text digest (shuffle moves 16-byte
    * keys, not documents). Oracle-checked. */
  val exact = Q(
    "q_dedup_exact",
    (s, dir) => {
      Tables.documents(s, dir)
        .groupBy(md5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("copies"))
        .orderBy(col("fp"))
    },
    Some("""SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS copies
      FROM documents GROUP BY md5(text) ORDER BY fp"""))

  /** MinHash(64) + LSH(16×4) near-dup candidate pairs with estimated
    * jaccard — band-bucket join, no all-pairs product. Rows-only (not
    * SQL-expressible). */
  val minhash = Q(
    "q_dedup_minhash",
    (s, dir) => {
      Dedup.minhashNearDups(Tables.documents(s, dir), "doc_id", "text", 0.35)
        .select(col("a"), col("b"), round(col("est_jaccard"), 4).as("est_jaccard"))
        .orderBy(col("a"), col("b"))
    },
    None)

  /** SimHash fingerprints + 16-bit segments (the LSH key for hamming
    * candidates). Deterministic but not SQL-expressible → rows-only. */
  val simhash = Q(
    "q_dedup_simhash",
    (s, dir) => {
      Dedup.simhashTable(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"))
    },
    None)

  /** SimHash near pairs (hamming ≤ 16) via segment-equality candidates. */
  val simhashPairs = Q(
    "q_dedup_simhash_pairs",
    (s, dir) => {
      Dedup.simhashNearPairs(Tables.documents(s, dir), "doc_id", "text", 16)
        .orderBy(col("a"), col("b"))
    },
    None)

  /** Exact word-trigram Jaccard over a bounded id range — the exact
    * verifier the LSH candidates feed at scale. Oracle-checked. */
  val ngramJaccard = Q(
    "q_dedup_ngram_jaccard",
    (s, dir) => {
      val d = Tables.documents(s, dir).where(col("doc_id") < 200)
        .select(col("doc_id"), Dedup.sortedGramHashes(col("text"), 3).as("grams"))
      val a = d.alias("a")
      val b = d.alias("b")
      a.join(b, col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"),
          round(graft.functions.KernelExpressions.jaccard_sorted(
            col("a.grams"), col("b.grams")), 4).as("jaccard"))
        .where(col("jaccard") >= 0.8)
        .orderBy(col("a"), col("b"))
    },
    Some("""WITH d AS (
        SELECT doc_id, list_distinct([list_aggregate(toks[i:i+2], 'string_agg', ' ')
          for i in range(1, greatest(len(toks) - 1, 2))]) AS grams
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
              FROM documents WHERE doc_id < 200))
      SELECT a.doc_id AS a, b.doc_id AS b,
        round(len(list_intersect(a.grams, b.grams)) * 1.0 /
          len(list_distinct(list_concat(a.grams, b.grams))), 4) AS jaccard
      FROM d a JOIN d b ON a.doc_id < b.doc_id
      WHERE round(len(list_intersect(a.grams, b.grams)) * 1.0 /
          len(list_distinct(list_concat(a.grams, b.grams))), 4) >= 0.8
      ORDER BY a, b"""))

  /** Embedding-cosine near-dup: top-20 most similar pairs (broadcast
    * cross product — the small side fits in memory at every sf; at true
    * scale this switches to the LSH/IVF candidate paths). Oracle-checked. */
  val embedding = Q(
    "q_dedup_embedding",
    (s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val a = e.alias("a")
      val b = e.alias("b")
      a.crossJoin(broadcast(b))
        .where(col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("a"), col("b.vec_id").as("b"),
          round(Dedup.cosine(col("a.embedding"), col("b.embedding")), 6).as("cos"))
        .orderBy(col("cos").desc, col("a"), col("b"))
        .limit(20)
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      SELECT a.vec_id AS a, b.vec_id AS b,
        round(list_cosine_similarity(a.v, b.v), 6) AS cos
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      ORDER BY cos DESC, a, b LIMIT 20"""))

  /** Embedding near-dup pairs via hyperplane-LSH bucket self-join — the
    * 100 TB path (no all-pairs product). Bucketing is seeded-random →
    * rows-only; PipelineOpsSpec pins recall against brute force. */
  val embeddingLsh = Q(
    "q_dedup_embedding_lsh",
    (s, dir) => {
      graft.operators.Similarity.embeddingNearDupPairs(
          Tables.embeddings(s, dir), "vec_id", "embedding", 0.8)
        .select(col("a"), col("b"), round(col("cos"), 4).as("cos"))
        .orderBy(col("a"), col("b"))
    },
    None)

  /** The full near-dup pipeline: MinHash/LSH candidates → EXACT n-gram
    * Jaccard verification of only those pairs (never all-pairs). This is
    * the composition that runs at 100 TB: candidate generation shuffles
    * band keys, verification joins the (small) candidate set back to the
    * documents and scores each pair once with the sorted-merge kernel. */
  val minhashVerified = Q(
    "q_dedup_minhash_verified",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val grams = docs.select(col("doc_id"),
        Dedup.sortedGramHashes(col("text"), 3).as("grams"))
      val candidates = Dedup.minhashNearDups(docs, "doc_id", "text", 0.35)
      candidates
        .join(grams.select(col("doc_id").as("a"), col("grams").as("ga")), "a")
        .join(grams.select(col("doc_id").as("b"), col("grams").as("gb")), "b")
        .select(col("a"), col("b"),
          round(graft.functions.KernelExpressions.jaccard_sorted(
            col("ga"), col("gb")), 4).as("jaccard"))
        .where(col("jaccard") >= 0.5)
        .orderBy(col("a"), col("b"))
    },
    None)

  def all: Seq[Q] = Seq(exact, minhash, minhashVerified, simhash, simhashPairs,
    ngramJaccard, embedding, embeddingLsh)
}
