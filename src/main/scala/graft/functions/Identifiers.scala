package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F1/P7 identifier normalization (`cdp/identity/IdentityGraph.kt:113-148`):
  * trim; keep known `user:`/`email:`/`anon:` prefixes (lowercasing email
  * values); otherwise infer — contains `@` → email (lowercased), contains
  * "anon" case-insensitively → anon, else user.
  *
  * Pure Column expressions — codegen'd, no UDF.
  */
object Identifiers {

  def normalize(id: Column): Column = {
    val t = trim(id)
    when(t.startsWith("user:"), t)
      .when(t.startsWith("email:"), concat(lit("email:"), lower(substring_index(t, "email:", -1))))
      .when(t.startsWith("anon:"), t)
      .when(t.contains("@"), concat(lit("email:"), lower(t)))
      .when(lower(t).contains("anon"), concat(lit("anon:"), t))
      .otherwise(concat(lit("user:"), t))
  }

  /** P7: event → compact array of normalized identifiers. */
  def extract(userId: Column, email: Column, anonymousId: Column): Column =
    array_compact(array(
      when(userId.isNotNull, concat(lit("user:"), trim(userId))),
      when(email.isNotNull, concat(lit("email:"), lower(trim(email)))),
      when(anonymousId.isNotNull, concat(lit("anon:"), trim(anonymousId)))))

  /** F6: strip the class prefix for display (`CdpController.kt:151-156`). */
  def stripPrefix(id: Column): Column =
    regexp_replace(id, "^(user:|email:|anon:)", "")
}
