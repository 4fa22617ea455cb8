package graft

/** The engine's full query surface, one place. SparkEntry delegates here. */
object Registry {
  def all: Seq[Q] =
    queries.Core.all ++
      queries.Relational.all ++
      queries.Events.all ++
      queries.TextQ.all ++
      queries.DedupQ.all ++
      queries.SimilarityQ.all ++
      queries.MultimodalQ.all ++
      queries.AudioQ.all ++
      queries.VideoQ.all ++
      queries.PipelineQ.all ++
      queries.CurationQ.all ++
      queries.VersionedQ.all ++
      queries.UrlQ.all

  def byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  def runners: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
