package graft.queries

import graft.QueryDef

/** Every query catalog, in SURVEY.md §2 coverage order. */
object All {
  def queries: Seq[QueryDef] =
    Relational.queries ++ GraphQueries.queries ++ PipelineQueries.queries ++
      SourceMlQueries.queries
}
