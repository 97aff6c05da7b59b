package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Curation

/** Corpus-curation queries (normalization dedup, embedding outliers,
  * stratified mixing, term profiling) — all four oracle-checked: each is
  * ANSI-SQL-expressible, so the DuckDB gate hashes real values, not just
  * row counts.
  */
object CurationQueriesImpl {

  /** Exact dedup AFTER text normalization: case/punctuation variants of
    * the same content collapse into one group. Shuffles md5 digests of
    * the canonical form. */
  val normalizedDedup = Q(
    "q_dedup_normalized",
    (s, dir) => {
      Curation.normalizedDupGroups(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("keep"))
    },
    Some("""WITH n AS (SELECT doc_id,
        md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS nfp
        FROM documents)
      SELECT min(doc_id) AS keep, count(*) AS copies
      FROM n GROUP BY nfp HAVING count(*) > 1 ORDER BY keep"""))

  /** Embedding outlier screen: bottom-5 cosine-to-label-centroid per
    * label (the rows most likely mislabeled). Centroid = per-label
    * element-wise mean; both sides rank on the 6-dp-rounded cosine. */
  val embedOutliers = Q(
    "q_embed_outliers",
    (s, dir) => {
      Curation.centroidOutliers(Tables.embeddings(s, dir), "vec_id", "label", "embedding", 5)
        .orderBy(col("label"), col("rank"))
    },
    Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      u AS (SELECT vec_id, label, generate_subscripts(v, 1) AS pos, unnest(v) AS val FROM e),
      m AS (SELECT label, pos, avg(val) AS m FROM u GROUP BY label, pos),
      c AS (SELECT label, array_agg(m ORDER BY pos) AS centroid FROM m GROUP BY label),
      s AS (SELECT e.vec_id, e.label,
              round(list_cosine_similarity(e.v, c.centroid), 6) AS cos
            FROM e JOIN c USING (label)),
      r AS (SELECT *, row_number() OVER (PARTITION BY label ORDER BY cos ASC, vec_id) AS rank
            FROM s)
      SELECT label, rank, vec_id, cos FROM r WHERE rank <= 5 ORDER BY label, rank"""))

  /** Deterministic stratified corpus mix: keep 50% of English, 20% of
    * everything else, by id-modulo (reproducible across engines — no
    * rand()), then composition stats. */
  val corpusMix = Q(
    "q_corpus_mix",
    (s, dir) => {
      Curation.stratifiedModuloSample(Tables.documents(s, dir), "doc_id", "lang",
          Map("en" -> 0.5), 0.2)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("source"))
    },
    Some("""SELECT lang, source, count(*) AS n FROM documents
      WHERE doc_id % 100 < CASE WHEN lang = 'en' THEN 50 ELSE 20 END
      GROUP BY lang, source ORDER BY lang, source"""))

  private val stop = Seq("the", "a", "of", "and", "in", "to", "is", "that", "with")
  private val stopSql = stop.map(s => s"'$s'").mkString(", ")

  /** Per-source top-5 terms (len >= 4, stopwords excluded) — the classic
    * explode → partial-agg → per-group top-k profile. */
  val topTerms = Q(
    "q_text_top_terms",
    (s, dir) => {
      Curation.topTerms(Tables.documents(s, dir), "source", "text", 5, 4, stop)
        .orderBy(col("source"), col("rank"))
    },
    Some(s"""WITH t AS (SELECT source,
        unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok FROM documents),
      f AS (SELECT source, tok, count(*) AS n FROM t
            WHERE length(tok) >= 4 AND tok NOT IN ($stopSql)
            GROUP BY source, tok),
      r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY n DESC, tok) AS rank
            FROM f)
      SELECT source, rank, tok, n FROM r WHERE rank <= 5 ORDER BY source, rank"""))

  def all: Seq[Q] = Seq(normalizedDedup, embedOutliers, corpusMix, topTerms)
}
