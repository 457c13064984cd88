package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming identity resolution: components grow across batches; a late
  * ALIAS merges two components (future routing only — the reference's
  * no-state-migration contract); canonical id stays lexicographically
  * smallest.
  */
class IdentityStreamSpec extends SparkSpec {

  test("late ALIAS merges components; canonical stays lexicographic min") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("idstream").toString
    val input = MemoryStream[(String, String)]
    val (writer, mapping) = IdentityStream.resolver(
      spark, input.toDF().toDF("src", "dst"), s"$dir/edges")
    val query = writer.start()
    try {
      // batch 1: two separate components {user:a, anon:x} {user:b, email:c}
      input.addData(("user:a", "anon:x"), ("user:b", "email:c"))
      query.processAllAvailable()
      assert(mapping.canonical("user:a") == "anon:x") // "anon:x" < "user:a"
      assert(mapping.canonical("user:b") == "email:c")
      assert(mapping.canonical("unknown:z") == "unknown:z") // unmapped: identity
      // batch 2: late ALIAS joins the two components
      input.addData(("anon:x", "email:c"))
      query.processAllAvailable()
      val all = Seq("user:a", "anon:x", "user:b", "email:c").map(mapping.canonical)
      assert(all.toSet == Set("anon:x")) // "anon:x" < "email:c" < "user:a"
    } finally query.stop()
  }
}
