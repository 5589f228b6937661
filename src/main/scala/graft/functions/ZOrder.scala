package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Z-order (Morton) interleave for multi-dimensional data layout — the
  * clustering key technique lakehouse table formats use so that a range
  * predicate on EITHER dimension prunes files (a single-column sort
  * gives perfect pruning on one dimension and none on the other; the
  * Z-curve bounds the bounding box of every contiguous key range in
  * both dimensions at once).
  *
  * The interleave is generated as one flat integer expression — 16 bits
  * per dimension, each bit masked, shifted to its interleaved position
  * and SUMMED (the bit positions are disjoint, so + ≡ |, and DuckDB
  * needs no bitwise-or) — producing IDENTICAL text for the Spark
  * `expr()` and the DuckDB oracle, so layouts built on the z-value are
  * hash-gateable (q257). Pure row-local arithmetic: the z-value costs
  * ~64 shift/mask/add ops inside whole-stage codegen, no shuffle.
  */
object ZOrder {

  val Bits = 16

  /** The interleave expression text over two integer column expressions
    * already normalized to [0, 2^bits): bit i of x lands at 2i, bit i of
    * y at 2i+1. Valid in Spark SQL and DuckDB verbatim.
    */
  def interleaveSql(x: String, y: String, bits: Int = Bits): String =
    // operands are parenthesized before `>>`: a compound argument like
    // "x & 3" must not re-associate as "x & (3 >> i)"
    (0 until bits).map { i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) + (((($y) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  def interleave(x: String, y: String, bits: Int = Bits): Column =
    expr(interleaveSql(x, y, bits))

  /** Inverse (for the round-trip property test): extract dimension
    * `dim` (0 = x, 1 = y) from a z-value.
    */
  def deinterleaveSql(z: String, dim: Int, bits: Int = Bits): String =
    (0 until bits).map { i =>
      s"(((($z) >> ${2 * i + dim}) & 1) << $i)"
    }.mkString("(", " + ", ")")

  def deinterleave(z: String, dim: Int, bits: Int = Bits): Column =
    expr(deinterleaveSql(z, dim, bits))
}
