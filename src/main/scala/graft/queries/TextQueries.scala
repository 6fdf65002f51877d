package graft.queries

/** Text-analysis + dedup queries over the documents table (phase 3). */
object TextQueries {
  val defs: Seq[QueryDef] = Seq()
}
