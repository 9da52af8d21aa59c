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

  // ---- Vector fragments (mirror graft.functions.VecFns / Similarity) --------
  // All folds use list_reduce, whose left-to-right order matches the kernels'
  // sequential ascending-dim accumulation (acc starts at element 1; 0.0 + x1
  // is bit-equal to x1), so doubles agree to the last bit.

  /** Sequential dot product of two array expressions, in double. */
  def dot(a: String, b: String): String =
    s"list_reduce([CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE) " +
      s"FOR i IN range(1, len($a)+1)], (x,y) -> x+y)"

  /** VecCosine twin: denom = sqrt(na)*sqrt(nb), 0.0 on zero denom. */
  def cosine(a: String, b: String): String =
    s"CASE WHEN sqrt(${dot(a, a)})*sqrt(${dot(b, b)}) = 0 THEN 0.0 " +
      s"ELSE ${dot(a, b)}/(sqrt(${dot(a, a)})*sqrt(${dot(b, b)})) END"

  /** VecL2Sq twin: sequential Σ (a_i - b_i)^2 in double. */
  def l2Sq(a: String, b: String): String =
    s"list_reduce([(CAST($a[i] AS DOUBLE)-CAST($b[i] AS DOUBLE))" +
      s"*(CAST($a[i] AS DOUBLE)-CAST($b[i] AS DOUBLE)) " +
      s"FOR i IN range(1, len($a)+1)], (x,y) -> x+y)"

  /** Similarity.planeComponent twin; `j` is a 0-based dim index expression. */
  private def planeComponent(k: Int, j: String): String =
    s"(((($k*2654435761 + ($j)*40503 + 12345) % 100000) + 100000) % 100000)" +
      "/100000.0 - 0.5"

  /** Similarity.signBits twin: `planes`-bit sign-LSH bucket of a vector expr. */
  def signBucket(v: String, planes: Int): String = {
    val bits = (0 until planes).map { k =>
      val dk = s"list_reduce([CAST($v[i] AS DOUBLE)*(${planeComponent(k, "i-1")}) " +
        s"FOR i IN range(1, len($v)+1)], (x,y) -> x+y)"
      s"CASE WHEN $dk >= 0 THEN ${1L << k} ELSE 0 END"
    }
    bits.mkString("(", " + ", ")")
  }

  /** VecFns.addPseudoNoise twin over `vec` keyed by `rowId` (both column
    * names), as a DOUBLE[] list expression. */
  def pseudoNoise(vec: String, rowId: String, sigma: String): String =
    s"[CAST($vec[i] AS DOUBLE) + $sigma*((((($rowId*2654435761 + (i-1)*40503) " +
      s"% 100000) + 100000) % 100000) / 100000.0 - 0.5) " +
      s"FOR i IN range(1, len($vec)+1)]"
}
