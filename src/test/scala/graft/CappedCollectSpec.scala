package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ArrayExpressions

/** CappedCollectLong semantics: exact below the cap (including across many
  * partial-aggregation buffers), detectably truncated above it — the two
  * properties the containment stage's lossless-cap argument rests on.
  */
class CappedCollectSpec extends SparkSpec {
  import spark.implicits._

  test("groups at or below the cap collect the complete list across partitions") {
    // 40 groups of sizes 1..40, scattered over 16 partitions so merge()
    // combines many disjoint partial buffers per group; cap = 40 means no
    // group may lose an element
    val rows = for (g <- 1 to 40; i <- 1 to g) yield (g.toLong, (g * 1000 + i).toLong)
    val df = rows.toDF("g", "v").repartition(16)
    val got = df.groupBy($"g")
      .agg(count(lit(1)).as("c"), ArrayExpressions.cappedCollectLong($"v", 40).as("vs"))
      .as[(Long, Long, Seq[Long])].collect()
    assert(got.length == 40)
    got.foreach { case (g, c, vs) =>
      assert(c == g)
      assert(vs.sorted == (1 to g.toInt).map(i => g * 1000 + i))
    }
  }

  test("a group past the cap truncates to cap+1 — never mistakable for complete") {
    val df = (1 to 100).map(i => (1L, i.toLong)).toDF("g", "v").repartition(8)
    val got = df.groupBy($"g")
      .agg(count(lit(1)).as("c"), ArrayExpressions.cappedCollectLong($"v", 10).as("vs"))
      .as[(Long, Long, Seq[Long])].head()
    assert(got._2 == 100, "the companion count stays exact")
    assert(got._3.length == 11, "the list carries the overflow evidence (cap+1)")
    assert(got._3.distinct.length == 11, "truncation keeps a subset, no repeats")
  }

  test("the containment hot filter only ever reads complete lists") {
    // the production contract: filter on the exact count first, then the
    // surviving lists are exact — mirror of containmentCoolIndex's shape
    val rows = (1 to 5).map(i => (7L, i.toLong)) ++ (1 to 50).map(i => (9L, i.toLong))
    val df = rows.toDF("h", "id").repartition(8)
    val cool = df.groupBy($"h")
      .agg(count(lit(1)).as("dfh"), ArrayExpressions.cappedCollectLong($"id", 8).as("ids"))
      .filter($"dfh" <= 8)
      .as[(Long, Long, Seq[Long])].collect()
    assert(cool.map(_._1).toSeq == Seq(7L))
    assert(cool.head._3.sorted == (1L to 5L))
  }
}
