package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the dedup / fingerprint / quality operators.
  *
  * Every function here has an exact DuckDB twin (the `*Sql` variants) so the
  * correctness oracle can replay the identical computation: hashing is
  * md5-prefix based (the native Md5Prefix64 expression equals
  * `conv(substring(md5(c),1,15),16,10)` bit-for-bit, and both engines
  * produce identical md5),
  * tokenization is the same `\s+` regex split, and all arithmetic stays in
  * 64-bit integer space (no engine-specific hash functions, no floats).
  *
  * Scale notes: all of these are codegen'd built-in expressions (no UDFs),
  * so they fuse into whole-stage codegen and run columnar at 100 TB; the
  * only shuffles are the explicit groupBys in the operators that use them.
  */
object TextOps {

  /** 60-bit deterministic hash: first 15 hex chars of md5, parsed base-16.
    * 15 hex digits < 2^60, so the value is a non-negative Long in both
    * engines (Spark `conv` and DuckDB hex-literal cast).
    */
  def hash64(c: Column): Column =
    org.apache.spark.sql.graft.ArrayExpressions.md5Prefix64(c)

  def hash64Sql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  /** Whitespace tokenization (identical regex semantics in Java and RE2). */
  def words(text: Column): Column = split(trim(text), "\\s+")

  def wordsSql(expr: String): String = s"string_split_regex(trim($expr), '\\s+')"

  /** JVM-side twin of `words` for the native expressions. Two traps that
    * `String.trim` would get wrong: SQL `trim` strips ONLY spaces (U+0020),
    * not tabs/newlines, and `split` with limit -1 keeps edge empty tokens
    * (a doc ending in '\n' tokenizes to [..., ""] in both engines). Must
    * stay in lock-step with `words`/`wordsSql` or engine/oracle hash
    * parity silently breaks on whitespace-edged text.
    */
  def wordsJvm(s: String): Array[String] = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e).split("\\s+", -1)
  }

  /** BPE-ish token pattern: letter runs, digit runs, single punctuation.
    * Works identically under Java regex (Spark) and RE2 (DuckDB).
    */
  val TokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Row-salted bucketed hash shared by the CMS and Bloom sketches:
    * hash64(value || '#' || salt) % size. ONE layout for both operators
    * and both engines — change it here or hash parity silently forks.
    */
  def saltedBucket(value: Column, salt: Column, size: Int): Column =
    hash64(concat(value, lit("#"), salt.cast("string"))) % size

  def saltedBucketSql(valueExpr: String, saltExpr: String, size: Int): String =
    s"${hash64Sql(s"($valueExpr) || '#' || CAST($saltExpr AS VARCHAR)")} % $size"

  /** First internal name from `base`, `base1`, ... not already taken. */
  def freshName(base: String, taken: Set[String]): String =
    Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
      .filterNot(taken).next()
}
