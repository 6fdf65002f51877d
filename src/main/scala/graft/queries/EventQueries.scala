package graft.queries

/** Event-stream analytics queries (phase 4). */
object EventQueries {
  val defs: Seq[QueryDef] = Seq()
}
