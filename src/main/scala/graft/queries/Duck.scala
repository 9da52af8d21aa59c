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

  // ---- splitmix64 in SQL (mirror graft.embed.HashingProvider) ---------------
  // Values live as non-negative HUGEINT (mod 2^64): xor/•//2^n are exact 64-bit
  // ops there, and wrapping +/× go through explicit % 2^64 with a 32-bit split
  // multiply (the 128-bit product of two 64-bit values would overflow HUGEINT).

  private val M64 = "18446744073709551616" // 2^64
  private val M32 = "4294967296" // 2^32

  /** Wrapping unsigned 64-bit multiply of expression `a` by constant `c`. */
  private def wmulU(a: String, c: BigInt): String = {
    val clo = c & 0xFFFFFFFFL
    val chi = c >> 32
    s"(((($a) % $M32) * $clo + (((($a) % $M32) * $chi + (($a) // $M32) * $clo) % $M32) * $M32) % $M64)"
  }

  /** Wrap `inner` (a SELECT yielding HUGEINT `x0` + passthrough columns) in
    * staged projections computing splitmix64(x0) as column `sm` — staging keeps
    * each repeated subterm a column reference instead of an exponentially
    * duplicated expression. Constants are the unsigned spellings of the Java
    * literals in HashingProvider.splitmix64. */
  def splitmix64(inner: String): String = {
    val stages = Seq(
      "x1" -> s"(x0 + 11400714819323198485) % $M64",
      "t1" -> "xor(x1, x1 // 1073741824)", // >>> 30
      "x2" -> wmulU("t1", BigInt("BF58476D1CE4E5B9", 16)),
      "t2" -> "xor(x2, x2 // 134217728)", // >>> 27
      "x3" -> wmulU("t2", BigInt("94D049BB133111EB", 16)),
      "sm" -> "xor(x3, x3 // 2147483648)") // >>> 31
    stages.foldLeft(inner) { case (q, (name, expr)) =>
      s"SELECT *, $expr AS $name FROM ($q)"
    }
  }

  /** Unsigned (mod 2^64) HUGEINT expression → signed 64-bit BIGINT. */
  def toSigned(v: String): String =
    s"(CASE WHEN $v >= 9223372036854775808 THEN CAST($v - $M64 AS BIGINT) " +
      s"ELSE CAST($v AS BIGINT) END)"

  /** Java `Long.MaxValue.toDouble` (rounds to 2^63). */
  val MaxLongD = "CAST(9223372036854775807 AS DOUBLE)"

  /** Sequential left-fold sum of a DOUBLE list expression (prepends the 0.0
    * seed so the accumulation order matches `aggregate(a, 0.0, _+_)`). */
  def foldSum(list: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $list), (a, b) -> a + b)"

  /** Recursive-CTE replay of the faithful reset DDM (graft.operators.Drift
    * .ddmSequential / Ddm.addElement): one recursion step per feed row carries
    * the full detector state (count, p, s, the tracked minima, and the
    * reset-on-next-element flag) and mirrors the state machine's floating-point
    * operation order exactly, so the unrounded doubles are bit-identical to the
    * Spark scan (rounding is deliberately NOT applied: round() itself diverges
    * across engines on half boundaries, the raw bits never do).
    *
    * @param feedSql SELECT producing (ord, err) — one row per detector step,
    *                scanned in ascending `ord` order.
    * @param outOrd  output name for the step column.
    * @return SQL yielding (outOrd, error, p, s, signal ∈ {'N','W','D'}).
    */
  def ddmRecursive(feedSql: String, outOrd: String): String =
    s"""WITH RECURSIVE seq AS (
       |  SELECT ord, err, row_number() OVER (ORDER BY ord) AS i FROM ($feedSql) feed
       |),
       |ddm AS (
       |  SELECT CAST(0 AS BIGINT) AS i, CAST(NULL AS BIGINT) AS ord,
       |         CAST(NULL AS DOUBLE) AS err,
       |         1 AS cnt, CAST(1.0 AS DOUBLE) AS p, CAST(0.0 AS DOUBLE) AS s,
       |         CAST('infinity' AS DOUBLE) AS pmin, CAST('infinity' AS DOUBLE) AS smin,
       |         CAST('infinity' AS DOUBLE) AS psmin, FALSE AS cc,
       |         CAST('N' AS VARCHAR) AS signal
       |  UNION ALL
       |  SELECT i, ord, err, cnt0 + 1, np, ns,
       |         CASE WHEN upd THEN np ELSE pmin0 END,
       |         CASE WHEN upd THEN ns ELSE smin0 END,
       |         CASE WHEN upd THEN np + ns ELSE psmin0 END,
       |         sig = 'D', sig
       |  FROM (
       |    SELECT *, CASE WHEN cnt0 + 1 < ${graft.operators.Drift.MinNumInstances} THEN 'N'
       |        WHEN np + ns > (CASE WHEN upd THEN np ELSE pmin0 END)
       |             + 3.0 * (CASE WHEN upd THEN ns ELSE smin0 END) THEN 'D'
       |        WHEN np + ns > (CASE WHEN upd THEN np ELSE pmin0 END)
       |             + 2.0 * (CASE WHEN upd THEN ns ELSE smin0 END) THEN 'W'
       |        ELSE 'N' END AS sig
       |    FROM (
       |      SELECT *, (cnt0 + 1 >= ${graft.operators.Drift.MinNumInstances}
       |                 AND np + ns <= psmin0) AS upd
       |      FROM (
       |        SELECT *, sqrt(np * (1.0 - np) / cnt0) AS ns
       |        FROM (
       |          SELECT *, p0 + (err - p0) / cnt0 AS np
       |          FROM (
       |            SELECT q.i, q.ord, q.err,
       |                   CASE WHEN d.cc THEN 1 ELSE d.cnt END AS cnt0,
       |                   CASE WHEN d.cc THEN CAST(1.0 AS DOUBLE) ELSE d.p END AS p0,
       |                   CASE WHEN d.cc THEN CAST('infinity' AS DOUBLE) ELSE d.pmin END AS pmin0,
       |                   CASE WHEN d.cc THEN CAST('infinity' AS DOUBLE) ELSE d.smin END AS smin0,
       |                   CASE WHEN d.cc THEN CAST('infinity' AS DOUBLE) ELSE d.psmin END AS psmin0
       |            FROM ddm d JOIN seq q ON q.i = d.i + 1
       |          ) s1
       |        ) s2
       |      ) s3
       |    ) s4
       |  ) s5
       |)
       |SELECT ord AS $outOrd, err AS error, p, s, signal
       |FROM ddm WHERE i > 0 ORDER BY 1""".stripMargin
}
