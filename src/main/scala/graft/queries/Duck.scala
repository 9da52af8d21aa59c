package graft.queries

/** DuckDB SQL fragments for the oracle gate (CORRECTNESS_r{N}).
  *
  * Every fragment mirrors the exact arithmetic of its Spark twin — same casts,
  * same operation order, same rounding — so value-hash comparison is stable.
  */
private[queries] object Duck {

  /** The reference clean_text chain (utils/formatting.py:7-36) in DuckDB RE2,
    * mirroring graft.functions.TextFns.cleanText rule-for-rule.
    * `chr(10)` stands in for the newline replacements (RE2 replacement strings
    * don't interpret escapes beyond backrefs). */
  private val rules: Seq[(String, String)] = Seq(
    ("""'>\s+'""", "'>'"),
    ("""'\s+'""", "' '"),
    ("""'\s*<br\s*/?>\s*'""", "chr(10)"),
    ("""'</(div)\s*>\s*'""", "chr(10)"),
    ("""'</(p|h\d)\s*>\s*'""", "chr(10)||chr(10)"),
    ("""'<head>.*<\s*(/head|body)[^>]*>'""", "''"),
    ("""'<a\s+href="([^"]+)"[^>]*>.*</a>'""", """'\1'"""),
    ("""'[ \t]*<[^<]*?/?>'""", "''"),
    ("""'^\s+'""", "''"))

  private val punctRule = ("""'[.,\/#!$%\^&\*;:{}=\-_`~()]'""", "''")

  /** clean_text(expr) as a DuckDB expression string. */
  def clean(expr: String, punct: Boolean): String = {
    val rs = rules ++ (if (punct) Seq(punctRule) else Nil)
    val chained = rs.foldLeft(expr) { case (acc, (p, r)) =>
      s"regexp_replace($acc, $p, $r, 'g')"
    }
    "lower(regexp_replace(" + chained + ", '" + """\s+$""" + "', '', 'g'))"
  }
}
