package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter: never a false negative, position sets are
  * partition-order independent and union-merge, duplicate probes read
  * correctly, and the probe plan broadcasts the bounded position set.
  */
class BloomSpec extends SparkSpec {

  test("no false negatives, FP rate within the design bound") {
    import spark.implicits._
    val members = (0 until 2000).map(i => i * 3L) // every third key
    val bits = Bloom.bits(members.toDF("v"), col("v"))
    val probes = (0 until 6000).map(k => (k.toString, k.toLong)).toDF("v", "k")
    val got = Bloom.mightContain(bits, probes)
      .select(col("k"), col("maybe")).as[(Long, Boolean)].collect().toMap
    members.foreach { m =>
      assert(got(m), s"false negative for member $m — must be impossible")
    }
    val nonMembers = (0 until 6000).filterNot(_ % 3 == 0)
    val fp = nonMembers.count(k => got(k.toLong))
    // n=2000, M=65536, K=3 -> theoretical FP ~ 0.06%; assert a loose 10x
    assert(fp.toDouble / nonMembers.size < 0.006,
      s"$fp false positives in ${nonMembers.size} non-member probes")
  }

  test("position set is repartition-independent and union-merges") {
    import spark.implicits._
    val d1 = spark.range(0, 1000).select(col("id").as("v"))
    val d2 = spark.range(800, 1800).select(col("id").as("v"))
    val a = Bloom.bits(d1, col("v")).orderBy("pos").as[Long].collect().toSeq
    val b = Bloom.bits(d1.repartition(13, col("v")), col("v"))
      .orderBy("pos").as[Long].collect().toSeq
    assert(a == b)
    val merged = Bloom.bits(d1, col("v")).unionAll(Bloom.bits(d2, col("v")))
      .distinct().orderBy("pos").as[Long].collect().toSeq
    val direct = Bloom.bits(d1.unionAll(d2), col("v"))
      .orderBy("pos").as[Long].collect().toSeq
    assert(merged == direct,
      "bloom(A) union bloom(B) must equal bloom(A union B)")
  }

  test("duplicate probe rows still read all-bits-set correctly") {
    import spark.implicits._
    val bits = Bloom.bits(Seq(7L, 8L).toDF("v"), col("v"))
    val probes = Seq(("7", 1L), ("7", 2L), ("9", 3L), ("9", 4L))
      .toDF("v", "tag")
    val got = Bloom.mightContain(bits, probes)
      .select(col("tag"), col("maybe")).as[(Long, Boolean)].collect().toMap
    assert(got(1L) && got(2L), "duplicated member probe must stay maybe=true")
    assert(!got(3L) && !got(4L))
  }

  test("probes may carry columns named like the filter internals") {
    import spark.implicits._
    val bits = Bloom.bits(Seq(7L).toDF("v"), col("v"))
    // pos / j / hit are the filter's working names — carried copies must
    // neither collide nor be clobbered
    val probes = Seq(("7", 1L, 2L, 3L)).toDF("v", "pos", "j", "hit")
    val row = Bloom.mightContain(bits, probes)
      .select(col("pos"), col("j"), col("hit"), col("maybe"))
      .as[(Long, Long, Long, Boolean)].collect().head
    assert(row == ((1L, 2L, 3L, true)))
  }

  test("probe plan broadcasts the position set") {
    import spark.implicits._
    val bits = Bloom.bits(spark.range(100).select(col("id").as("v")), col("v"))
    val probes = spark.range(50).select(col("id").cast("string").as("v"), col("id"))
    val plan = Bloom.mightContain(bits, probes)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the bounded position set must broadcast to the probes:\n$plan")
  }
}
