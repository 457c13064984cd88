package graft.queries

import org.apache.spark.sql.DataFrame

/** Managed lifetime for aggregate-small query results built over pinned
  * intermediates: eagerly materialize the result as a localCheckpoint leaf
  * (a handful of rows), then unpersist the intermediates before returning.
  * The caller gets a leaf-rooted DataFrame and NO storage obligation — the
  * prior contract ("caller must clearCache() after consuming") leaked
  * pinned caches into any long-lived session composing two such queries.
  * Only valid when the result is small (a per-group aggregate or top-K):
  * the checkpoint leaf costs one tiny GC-managed block. A corpus-sized
  * result takes a scoped handle instead (FunnelStages.close()).
  */
private[queries] object SmallResult {
  def apply(result: DataFrame, pinned: DataFrame*): DataFrame = {
    val out = result.localCheckpoint() // eager: computes while pins are hot
    pinned.foreach(_.unpersist())
    out
  }
}
