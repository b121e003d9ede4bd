package graft.ext

/** Cross-engine SQL dialect layer for the training-data-pipeline operators.
  *
  * The hash-heavy ops (MinHash, SimHash, LSH bucketing, n-gram fingerprints)
  * must produce IDENTICAL results in Spark and in the driver's DuckDB oracle.
  * Both engines support higher-order array functions with `x -> expr` lambda
  * syntax and standard md5, so each operator is written once against this
  * small primitive set and rendered per engine. The only deliberate
  * difference between renderings is primitive spelling (e.g. Spark
  * `transform`/`sequence` vs DuckDB `list_transform`/`range`).
  *
  * Determinism notes:
  *   - the portable 60-bit hash is `md5` hex prefix parsed as a bigint —
  *     bit-identical across engines, unlike engine-native `hash()`;
  *   - folds over arrays are sequential in both engines, and all float work
  *     is done in doubles then rounded before comparison.
  */
trait Sql {
  /** whitespace tokenization */
  def splitWs(x: String): String
  /** 60-bit deterministic hash of a string expression (md5 hex prefix). */
  def md5Long(x: String): String
  def arrDistinct(x: String): String
  def arrLen(x: String): String
  def arrMin(x: String): String
  def arrSum(x: String): String
  def arrJoin(x: String, sep: String): String
  def arrSlice(x: String, from1: Int, len: Int): String
  def arrSort(x: String): String
  /** distinct-set intersection size */
  def interLen(a: String, b: String): String
  def transform(x: String, v: String, body: String): String
  /** inclusive integer range [lo, hi] as an array expression */
  def rangeIncl(lo: String, hi: String): String
  /** inclusive stepped integer range [lo, lo+step, ...] <= hi */
  def rangeStep(lo: String, hi: String, step: Int): String
  /** slice of up to `len` elements of `x` starting at 1-based expression
    * `from` (clamped at the array end in both engines) */
  def arrSliceAt(x: String, from: String, len: Int): String
  /** element access, 1-based */
  def at(x: String, i: String): String
  def intDiv(a: String, b: String): String
  def xor(a: String, b: String): String
  def bitCount(x: String): String
  /** count of elements of array `x` contained in the string literal set */
  def countIn(x: String, set: Seq[String]): String
  def filterLambda(x: String, v: String, pred: String): String
  def toStr(x: String): String
  /** double-typed sequential fold-sum of an array expression */
  def arrSumD(x: String): String
  /** element-wise double dot product of two numeric arrays */
  def dotD(a: String, b: String): String
  /** cosine similarity given precomputed self-dot norms na/nb; engines may
    * ignore the norms and fuse the whole computation (bit-equal either way:
    * sequential double accumulation in both renderings) */
  def cosineSim(a: String, b: String, na: String, nb: String): String =
    s"${dotD(a, b)} / (sqrt($na) * sqrt($nb))"
  /** literal array from rendered element expressions */
  def arrayLit(items: Seq[String]): String
  /** SELECT <extra>, <explode of col> AS <alias> FROM <table> */
  def explodeSelect(extra: String, arrCol: String, alias: String, table: String): String
  /** full-match regexp extraction to an array */
  def regexpAll(x: String, pattern: String): String
  /** byte length of the UTF-8 encoding of a string expression */
  def utf8Len(x: String): String
  /** SELECT <extra>, 1-based pos AS pos, element AS val FROM <table> */
  def posExplodeSelect(extra: String, arrCol: String, table: String): String

  /** 3-gram word shingles of a token array (empty when < 3 tokens). */
  def shingle3(toks: String): String =
    s"CASE WHEN ${arrLen(toks)} >= 3 THEN ${transform(
        rangeIncl("1", s"${arrLen(toks)} - 2"),
        "i",
        s"concat_ws(' ', ${at(toks, "i")}, ${at(toks, "i + 1")}, ${at(toks, "i + 2")})"
      )} ELSE ${emptyStrArray} END"
  def emptyStrArray: String
  /** 2^b as BIGINT for 0 <= b <= 62 (exact in double). */
  def pow2(b: String): String = s"CAST(pow(2, $b) AS BIGINT)"
}

object SparkSql extends Sql {
  def splitWs(x: String) = s"split($x, ' ')"
  def md5Long(x: String) = s"CAST(conv(substring(md5($x), 1, 15), 16, 10) AS BIGINT)"
  def arrDistinct(x: String) = s"array_distinct($x)"
  def arrLen(x: String) = s"size($x)"
  def arrMin(x: String) = s"array_min($x)"
  def arrSum(x: String) = s"aggregate($x, 0L, (acc, v) -> acc + v)"
  def arrJoin(x: String, sep: String) = s"array_join($x, '$sep')"
  def arrSlice(x: String, from1: Int, len: Int) = s"slice($x, $from1, $len)"
  def arrSort(x: String) = s"array_sort($x)"
  def interLen(a: String, b: String) = s"size(array_intersect($a, $b))"
  def transform(x: String, v: String, body: String) = s"transform($x, $v -> $body)"
  def rangeIncl(lo: String, hi: String) = s"sequence(CAST($lo AS INT), CAST($hi AS INT))"
  def rangeStep(lo: String, hi: String, step: Int) =
    s"sequence(CAST($lo AS INT), CAST($hi AS INT), $step)"
  def arrSliceAt(x: String, from: String, len: Int) =
    s"slice($x, CAST($from AS INT), $len)"
  def at(x: String, i: String) = s"element_at($x, CAST($i AS INT))"
  def intDiv(a: String, b: String) = s"($a div $b)"
  def xor(a: String, b: String) = s"($a ^ $b)"
  def bitCount(x: String) = s"bit_count($x)"
  def countIn(x: String, set: Seq[String]) =
    s"size(filter($x, t -> t IN (${set.map(s => s"'$s'").mkString(", ")})))"
  def filterLambda(x: String, v: String, pred: String) = s"filter($x, $v -> $pred)"
  def emptyStrArray = "CAST(array() AS ARRAY<STRING>)"
  def toStr(x: String) = s"CAST($x AS STRING)"
  def arrSumD(x: String) = s"aggregate($x, CAST(0.0 AS DOUBLE), (sacc, sv) -> sacc + sv)"
  def dotD(a: String, b: String) =
    arrSumD(s"zip_with($a, $b, (zx, zy) -> CAST(zx AS DOUBLE) * CAST(zy AS DOUBLE))")
  def arrayLit(items: Seq[String]) = s"array(${items.mkString(", ")})"
  def explodeSelect(extra: String, arrCol: String, alias: String, table: String) =
    s"SELECT $extra, explode($arrCol) AS $alias FROM $table"
  def regexpAll(x: String, pattern: String) = s"regexp_extract_all($x, '$pattern', 0)"
  def utf8Len(x: String) = s"octet_length($x)"
  def posExplodeSelect(extra: String, arrCol: String, table: String) =
    s"SELECT $extra, pe_pos + 1 AS pos, pe_val AS val FROM $table LATERAL VIEW posexplode($arrCol) pe AS pe_pos, pe_val"

  /** Native codegen'd expression (graft.functions.Shingle3), registered by
    * the ext query runner; byte-identical output to the portable HOF form
    * the DuckDB dialect keeps. */
  override def shingle3(toks: String): String = s"shingle3($toks)"

  /** Native codegen'd fused cosine (graft.functions.CosineSimilarity):
    * recomputes the norms inside the fused loop — identical double
    * arithmetic to dotD(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b))), no
    * interpreted HOF and no intermediate arrays. */
  override def cosineSim(a: String, b: String, na: String, nb: String): String =
    s"cosine_sim($a, $b)"
}

object DuckSql extends Sql {
  def splitWs(x: String) = s"string_split($x, ' ')"
  def md5Long(x: String) = s"CAST(('0x' || substring(md5($x), 1, 15)) AS BIGINT)"
  def arrDistinct(x: String) = s"list_distinct($x)"
  def arrLen(x: String) = s"len($x)"
  def arrMin(x: String) = s"list_min($x)"
  def arrSum(x: String) = s"CAST(coalesce(list_sum($x), 0) AS BIGINT)"
  def arrJoin(x: String, sep: String) = s"array_to_string($x, '$sep')"
  def arrSlice(x: String, from1: Int, len: Int) = s"($x)[$from1:${from1 + len - 1}]"
  def arrSort(x: String) = s"list_sort($x)"
  def interLen(a: String, b: String) = s"len(list_intersect($a, $b))"
  def transform(x: String, v: String, body: String) = s"list_transform($x, $v -> $body)"
  def rangeIncl(lo: String, hi: String) = s"range(CAST($lo AS BIGINT), CAST($hi AS BIGINT) + 1)"
  def rangeStep(lo: String, hi: String, step: Int) =
    s"range(CAST($lo AS BIGINT), CAST($hi AS BIGINT) + 1, $step)"
  def arrSliceAt(x: String, from: String, len: Int) =
    s"($x)[$from:$from + ${len - 1}]"
  def at(x: String, i: String) = s"($x)[$i]"
  def intDiv(a: String, b: String) = s"($a // $b)"
  def xor(a: String, b: String) = s"xor($a, $b)"
  def bitCount(x: String) = s"bit_count($x)"
  def countIn(x: String, set: Seq[String]) =
    s"len(list_filter($x, t -> t IN (${set.map(s => s"'$s'").mkString(", ")})))"
  def filterLambda(x: String, v: String, pred: String) = s"list_filter($x, $v -> $pred)"
  def emptyStrArray = "CAST([] AS VARCHAR[])"
  def toStr(x: String) = s"CAST($x AS VARCHAR)"
  def arrSumD(x: String) = s"CAST(coalesce(list_sum($x), 0.0) AS DOUBLE)"
  def dotD(a: String, b: String) =
    arrSumD(s"list_transform(list_zip($a, $b), zp -> CAST(zp[1] AS DOUBLE) * CAST(zp[2] AS DOUBLE))")
  def arrayLit(items: Seq[String]) = s"[${items.mkString(", ")}]"
  def explodeSelect(extra: String, arrCol: String, alias: String, table: String) =
    s"SELECT $extra, unnest($arrCol) AS $alias FROM $table"
  def regexpAll(x: String, pattern: String) = s"regexp_extract_all($x, '$pattern')"
  def utf8Len(x: String) = s"octet_length(encode($x))"
  def posExplodeSelect(extra: String, arrCol: String, table: String) =
    s"SELECT $extra, generate_subscripts($arrCol, 1) AS pos, unnest($arrCol) AS val FROM $table"
}
