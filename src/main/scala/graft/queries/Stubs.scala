package graft.queries

/** Placeholder registries filled in as each area lands. */
object MlQueries { def all: Seq[Q] = MlQueriesImpl.all }
object TextQueries { def all: Seq[Q] = TextQueriesImpl.all }
object DedupQueries { def all: Seq[Q] = DedupQueriesImpl.all }
object SimilarityQueries { def all: Seq[Q] = SimilarityQueriesImpl.all }
