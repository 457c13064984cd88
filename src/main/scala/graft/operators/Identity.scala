package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Identity resolution (SURVEY §2.4 J2): connected components over an
  * identifier-edge graph with the reference's determinism contract — the
  * canonical id of a component is its lexicographically smallest node
  * (reference `cdp/identity/IdentityGraph.kt:70-78`).
  *
  * Implementation: iterative min-label propagation, all DataFrame ops.
  * Each round is one join + one groupBy (shuffle on node); convergence in
  * O(component diameter) rounds. Lineage is truncated per round with
  * localCheckpoint so the plan stays bounded at any scale; the driver only
  * ever sees a 1-row count for the convergence test, never the data. (At
  * extreme diameters the large-star/small-star variant halves rounds; CDP
  * identity graphs are shallow, so plain propagation is the right cost.)
  */
object Identity {

  /** edges: DataFrame with string columns (src, dst). Returns
    * (node, component).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)

    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint(true)

    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborComp = sym
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .select(col("src").as("node"), col("comp"))
      val next = neighborComp.unionAll(labels)
        .groupBy("node").agg(min("comp").as("comp"))
        .localCheckpoint(true)
      val changed = next.as("n")
        .join(labels.as("o"), "node")
        .filter(col("n.comp") =!= col("o.comp"))
        .limit(1).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — component " +
        "diameter exceeds the bound; raise maxIter")
    labels.withColumnRenamed("comp", "component")
  }
}
