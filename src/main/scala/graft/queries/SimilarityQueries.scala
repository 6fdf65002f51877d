package graft.queries

/** Embedding similarity-search queries (phase 3). */
object SimilarityQueries {
  val defs: Seq[QueryDef] = Seq()
}
