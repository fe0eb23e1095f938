package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional write layouts —
  * the missing piece between `partitionBy` (one categorical dim) and
  * `repartitionByRange` (one ordered dim): sorting files by the
  * interleaved bits of TWO range-bucketed columns gives every file a
  * localized 2-D tile, so parquet min/max stats prune scans for boxes
  * selective in EITHER dimension (a linear sort prunes only its lead
  * column; the secondary column spans every file). The technique
  * behind Delta/Iceberg OPTIMIZE ZORDER, expressed as pure codegen'd
  * integer expressions — deterministic, DuckDB-twin-able (q129).
  *
  * Buckets are order-preserving right-shifts of (v - min): exact
  * integer math (never float division — floor((x:double)/(y:double))
  * can flip at boundaries for large longs), with the shift chosen so
  * at most 2^bits buckets exist: shift = bitlength(range-1) - bits,
  * which equals ceil(log2(range)) - bits (the oracle-side identity).
  */
object ZOrder {

  /** Right-shift putting `range` values into at most 2^bits buckets. */
  def shiftFor(range: Long, bits: Int): Int = {
    require(range >= 1, s"range must be >= 1, got $range")
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val bitLength = 64 - java.lang.Long.numberOfLeadingZeros(range - 1)
    math.max(0, bitLength - bits)
  }

  /** The interleaved z-value of two bucketed columns: bit i of each
    * bucket lands at positions 2i (a) and 2i+1 (b). A fold of
    * shift/and/or primitives — stays in whole-stage codegen. */
  def zValue(
      a: Column, aMin: Long, aShift: Int,
      b: Column, bMin: Long, bShift: Int, bits: Int): Column = {
    val ab = shiftright(a.cast("long") - lit(aMin), aShift)
    val bb = shiftright(b.cast("long") - lit(bMin), bShift)
    (0 until bits).map { i =>
      shiftleft(shiftright(ab, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }
}
