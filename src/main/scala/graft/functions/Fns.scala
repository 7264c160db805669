package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Cross-engine deterministic function pack.
  *
  * Every helper here exists twice: as a Spark `Column` builder (codegen'd
  * built-ins only — no UDFs, SURVEY §4) and as a DuckDB SQL fragment builder
  * used to author the oracle queries. Both derive from the same constants, so
  * the driver's exact value-hash comparison holds bit-for-bit.
  *
  * The shared primitive is `hash60`: the first 15 hex chars of md5 parsed as
  * a non-negative int64 (60 bits). md5 is identical everywhere; 15 hex chars
  * fit int64 without sign issues in either engine.
  */
object Fns {

  /** Mersenne prime 2^31-1 — all derived hashes live in [0, P). Keeps every
    * a*h+b term below 2^62, so int64 arithmetic never overflows in either
    * engine (DuckDB raises on overflow; Spark wraps silently — both avoided). */
  val P: Long = 2147483647L

  // ---- hash60 ------------------------------------------------------------
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)
  def hash60Sql(e: String): String =
    s"CAST('0x'||substr(md5($e),1,15) AS BIGINT)"

  /** hash60 reduced into [0, P). */
  def hashP(c: Column): Column = hash60(c) % P
  def hashPSql(e: String): String = s"(${hash60Sql(e)} % $P)"

  /** Driver-side hash60 (same md5, same 15 hex chars) for precomputing
    * literal constants (e.g. LSH hyperplane weights) at plan-build time. */
  def hash60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  // ---- MinHash family ----------------------------------------------------
  /** k-th universal-hash parameters, all in [1, P). */
  def hashA(k: Int): Long = (2654435761L * k + 1) % P
  def hashB(k: Int): Long = (40503L * k * k + 2246822519L) % P

  /** k-th minhash term for one shingle hash hp (already in [0,P)). */
  def minhashTerm(k: Int, hp: Column): Column = (hp * hashA(k) + hashB(k)) % P
  def minhashTermSql(k: Int, hpE: String): String =
    s"(($hpE * ${hashA(k)} + ${hashB(k)}) % $P)"

  // ---- shingles ----------------------------------------------------------
  /** Word w-gram shingles over whitespace-tokenized text. Word soup makes
    * char-grams collide across unrelated docs; word grams keep LSH candidate
    * sets sparse (vocab^w space). */
  def wordShingles(text: Column, w: Int): Column = {
    val words = split(trim(text), "\\s+")
    transform(
      sequence(lit(1), greatest(size(words) - (w - 1), lit(1))),
      i => concat_ws(" ", slice(words, i, lit(w))))
  }
  def wordShinglesSql(textE: String, w: Int): String = {
    val words = s"regexp_split_to_array(trim($textE), '\\s+')"
    s"[array_to_string(($words)[i:i+${w - 1}], ' ') FOR i IN generate_series(1, GREATEST(len($words)-${w - 1}, 1))]"
  }

  /** Character n-gram shingles (expression-level: substring needs a Column
    * position, cleanest via the SQL parser). */
  def charShinglesExpr(textCol: String, n: Int): Column =
    expr(s"transform(sequence(1, greatest(length($textCol)-${n - 1}, 1)), i -> substring($textCol, i, $n))")
  def charShinglesSql(textE: String, n: Int): String =
    s"[substr($textE, CAST(i AS INT), $n) FOR i IN generate_series(1, GREATEST(len($textE)-${n - 1}, 1))]"

  // ---- vector math (left folds — identical association both engines) ----
  /** Cast float array → double array (exact). */
  def vecD(c: Column): Column = transform(c, x => x.cast("double"))
  def vecDSql(e: String): String = s"list_transform($e, x -> CAST(x AS DOUBLE))"

  /** Left-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  def dotSql(aE: String, bE: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [($aE)[i]*($bE)[i] FOR i IN generate_series(1, len($aE))]), (acc, x) -> acc + x)"

  def norm2(a: Column): Column = dot(a, a)
  def norm2Sql(aE: String): String = dotSql(aE, aE)

  /** Cosine similarity, identical operation order in both engines:
    * dot / sqrt(norm2(a) * norm2(b)). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))
  def cosineSql(aE: String, bE: String): String =
    s"(${dotSql(aE, bE)} / sqrt(${norm2Sql(aE)} * ${norm2Sql(bE)}))"
}
