package graft.queries

/** All harness queries. Each slice of the engine contributes a map;
  * name collisions are a bug (guarded in RegistrySpec). */
object Registry {
  def all: Map[String, QueryDef] =
    IngestQueries.defs ++
      RelationalQueries.defs ++
      TpchDeepQueries.defs ++
      TextQueries.defs ++
      DedupQueries.defs ++
      SimilarityQueries.defs ++
      MiscQueries.defs

  def benchQueries: Map[String, QueryDef] = all.filter(_._2.bench)
}
