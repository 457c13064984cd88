package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented operator from SURVEY.md §2 (plus
  * the training-data-pipeline operators); `oracleSql` holds the DuckDB
  * equivalent for every SQL-expressible one. Column names are aligned
  * between the two on purpose — the driver sorts columns by name and hashes
  * values.
  */
object SparkEntry {

  /** All registered query definitions, grouped by module. */
  def allDefs: Seq[QueryDef] =
    graft.queries.Relational.defs ++
      graft.queries.EntityAnalytics.defs ++
      graft.queries.TextAnalytics.defs ++
      graft.queries.DedupQueries.defs ++
      graft.queries.SimilarityQueries.defs ++
      graft.queries.CdpBatch.defs ++
      graft.queries.MultimodalQueries.defs ++
      graft.queries.Serving.defs ++
      graft.queries.EventAnalytics.defs ++
      graft.queries.CdpReplay.defs ++
      graft.queries.AsofQueries.defs ++
      graft.queries.IvfQueries.defs ++
      graft.queries.PqQueries.defs ++
      graft.queries.PackingQueries.defs ++
      graft.queries.BpeQueries.defs ++
      graft.queries.CurationQueries.defs ++
      graft.queries.PiiQueries.defs ++
      graft.queries.ObservabilityQueries.defs ++
      graft.queries.LmQueries.defs ++
      graft.queries.BlockDedupQueries.defs ++
      graft.queries.HybridQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * Runs the full schema smoke gate first (Smoke.check: load + count +
    * min/max over every table through the typed loaders) so a regenerated-
    * testdata schema drift fails here, loudly and named, at round start —
    * not as silently missing queries in the correctness artifact (which is
    * exactly how round 7 lost its 32 events-table rows).
    */
  def entry(spark: SparkSession): DataFrame = {
    Smoke.check(spark, "/root/testdata/sf0.001")
    allDefs.head.query(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    // toMap over 20 concatenated module lists keeps only the LAST entry
    // per name: a duplicate across modules would silently drop one
    // implementation from both the bench and the correctness dump — the
    // operator vanishes from the round artifacts with no error anywhere
    val dups = allDefs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names across modules: ${dups.mkString(", ")}")
    allDefs.map(d => d.name -> d.query).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap

  /** Stage-decomposed oracle overrides for the materialized-tier gate
    * (tools/check.py --staged) — SQL that may reference `dump_<query>`
    * views over other queries' verified dumps. See QueryDef.staged.
    */
  def oracleSqlStaged: Map[String, String] =
    allDefs.flatMap(d => d.staged.map(d.name -> _)).toMap
}
