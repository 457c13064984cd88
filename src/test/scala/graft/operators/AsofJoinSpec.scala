package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  private def quotes = Seq(
    ("k1", ts("2024-01-01T00:00:00Z"), 100.0),
    ("k1", ts("2024-01-01T00:01:00Z"), 101.0),
    ("k2", ts("2024-01-01T00:00:30Z"), 200.0))

  private def trades = Seq(
    ("k1", ts("2024-01-01T00:00:30Z"), "t1"), // matches 00:00:00 quote
    ("k1", ts("2024-01-01T00:01:00Z"), "t2"), // equal ts: inclusive match
    ("k1", ts("2023-12-31T00:00:00Z"), "t0"), // before any quote: null
    ("k2", ts("2024-01-01T00:05:00Z"), "t3"))

  test("backward as-of picks the latest right row at or before each left ts") {
    import spark.implicits._
    val out = AsofJoin.backward(
      trades.toDF("k", "ts", "trade"),
      quotes.toDF("k", "qts", "px"),
      keyCols = Seq("k"), leftTs = "ts", rightTs = "qts",
      rightPayload = Map("px" -> "px"))
      .select(col("trade"), col("px"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("t1") == Some(100.0))
    assert(out("t2") == Some(101.0)) // inclusive at equal ts
    assert(out("t0") == None)
    assert(out("t3") == Some(200.0)) // keys independent
  }

  test("tolerance nulls out matches older than the window") {
    import spark.implicits._
    val out = AsofJoin.backward(
      trades.toDF("k", "ts", "trade"),
      quotes.toDF("k", "qts", "px"),
      keyCols = Seq("k"), leftTs = "ts", rightTs = "qts",
      rightPayload = Map("px" -> "px"),
      toleranceSec = 60)
      .select(col("trade"), col("px"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("t1") == Some(100.0)) // 30s old: within tolerance
    assert(out("t3") == None)        // 4.5 min old: stale
  }
}
