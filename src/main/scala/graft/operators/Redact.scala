package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pattern-based scrubbing — the PII/sensitive-token redaction pass a
  * training-data pipeline runs before retention (emails, phone numbers,
  * credential-looking digit runs, …). Patterns are data: an ordered list
  * of `(regex, replacement)` rules applied in sequence, so later rules
  * see earlier rules' output (an email rule firing first keeps its
  * digits out of a digit-run rule's scope).
  *
  * Purely narrow — per-row `regexp_replace` chains, no shuffle, no UDF:
  * both the rewrite and the per-rule match counting are Catalyst
  * expressions inside whole-stage codegen, so the pass rides along any
  * scan at 100 TB. Match counts are taken on each rule's INPUT text
  * (the text after all earlier rules), so `n_redactions` is exactly the
  * number of replacements performed, not a double count of overlapping
  * rules.
  *
  * Regex dialect: keep rules to the RE2-compatible subset (no
  * backreferences or lookaround) so the same rule set runs verbatim on
  * engines with RE2 regexes; replacements must not contain `$` (a
  * capture-group reference in Java's replacement syntax).
  */
object Redact {

  /** The standard scrub rules: emails first (so their digits are
    * already masked), then standalone digit runs (phone numbers, SSNs,
    * credential fragments). Order matters — see class doc.
    */
  val DefaultRules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "[0-9]+" -> "<NUM>")

  /** Apply `rules` in order to `textCol`; emits the input columns plus
    * `scrubbed` (the rewritten text) and `n_redactions` (total
    * replacements across rules, counted on each rule's input text).
    */
  def scrub(df: DataFrame, textCol: String,
            rules: Seq[(String, String)] = DefaultRules): DataFrame = {
    require(rules.nonEmpty, "need at least one scrub rule")
    require(rules.forall(!_._2.contains("$")),
      "replacement must not contain '$' (Java capture-group syntax)")
    val (scrubbed, nRedactions) =
      rules.foldLeft((col(textCol), lit(0L).cast("long"))) {
        case ((text, n), (pattern, replacement)) =>
          (regexp_replace(text, pattern, replacement),
            n + size(regexp_extract_all(text, lit(pattern), lit(0))))
      }
    df.withColumn("scrubbed", scrubbed)
      .withColumn("n_redactions", nRedactions)
  }
}
