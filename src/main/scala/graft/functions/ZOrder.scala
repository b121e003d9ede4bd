package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleave of two 16-bit keys as a pure built-in
  * expression tree — `shiftleft`/`|`/`&` only, so the whole computation
  * stays inside whole-stage codegen (no UDF, no CodegenFallback).
  *
  * Why: min/max file skipping (core/Skipping) over a layout clustered by
  * ONE key prunes only predicates on that key. Clustering by the Morton
  * code of TWO keys gives every file a small axis-aligned rectangle of the
  * (a, b) domain, so range predicates on EITHER dimension prune files —
  * the standard lakehouse OPTIMIZE ZORDER BY layout. The bit-spread uses
  * the classic magic-number doubling steps (public-domain "Interleave bits
  * by Binary Magic Numbers" — Stanford Bit Twiddling Hacks), which both
  * Spark and DuckDB evaluate with identical 64-bit integer semantics, so
  * Z-codes are oracle-checkable bit-for-bit.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` so bit i lands at position 2i. */
  def spreadBits16(x: Column): Column = {
    val s1 = x.cast("long").bitwiseAND(lit(0x0000FFFFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s4 = s3.bitwiseOR(shiftleft(s3, 2)).bitwiseAND(lit(0x33333333L))
    s4.bitwiseOR(shiftleft(s4, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of (a, b), a in even bit positions, b in odd. Inputs are
    * masked to 16 bits; callers pre-scale (e.g. `col % 256`). */
  def interleave16(a: Column, b: Column): Column =
    spreadBits16(a).bitwiseOR(shiftleft(spreadBits16(b), 1)).as("zcode")

  /** The same computation as ANSI SQL (DuckDB-compatible) over expression
    * strings — the oracle twin of `interleave16`, generated from one
    * definition so engine and oracle cannot drift. */
  def spreadSql(x: String): String = {
    val s1 = s"(CAST($x AS BIGINT) & 65535)"
    val s2 = s"(($s1 | ($s1 << 8)) & 16711935)"
    val s3 = s"(($s2 | ($s2 << 4)) & 252645135)"
    val s4 = s"(($s3 | ($s3 << 2)) & 858993459)"
    s"(($s4 | ($s4 << 1)) & 1431655765)"
  }

  def interleaveSql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"
}
