package graft.queries

import graft.queries.Relational.Q

/** SparkEntry wiring for the training-data pipeline operators
  * (SURVEY.md §2: dedup, similarity, text analysis, multimodal).
  * Entries without a DuckDB-expressible oracle are rows-only checks;
  * each is still fully deterministic (fixed seeds, total ordering).
  *
  * Round 13: split by query family — the entries live in
  * [[PipelineDedup]] (d*), [[PipelineSimilarity]] (s*),
  * [[PipelineText]] (t*) and [[PipelineCuration]] (c, p, m, st),
  * with shared fixtures and generated oracle-SQL fragments in
  * [[PipelineShared]]. This object remains the single public entry
  * point (`Pipeline.all`), unchanged.
  */
object Pipeline {
  val all: Seq[Q] =
    PipelineDedup.all ++ PipelineSimilarity.all ++ PipelineText.all ++
      PipelineCuration.all
}
