package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving as pure Column arithmetic — the
  * space-filling-curve key multi-dimensional clustering sorts by, so
  * per-file footer [min,max] stats become tight for EVERY clustered
  * column at once and a scan filtered on any subset of them skips
  * files (single-column sort gives that for the leading column only).
  *
  * Built entirely from codegen'd bit ops (shifts/and/or) — no UDF, no
  * custom Expression: the classic mask-spread doubles the gap between
  * a value's bits in five steps, then the dimensions' spread bits are
  * OR-merged at alternating positions. Values must already be bucket
  * indices in `[0, 2^bits)` — [[graft.Versioned.clusterBy]] produces
  * them with `width_bucket` over driver-computed min/max (documented
  * there; rank/quantile boundaries are the skew-hardened variant).
  */
object ZOrder {

  /** Max bits per dimension for 2-D interleave into a signed long. */
  val MaxBits = 31

  /** Spreads the low `bits` bits of `v` so bit i lands at bit 2i
    * (mask-doubling network, constant-folded masks).
    */
  private def spread(v: Column): Column = {
    val m = Seq(
      0x0000FFFF0000FFFFL -> 16,
      0x00FF00FF00FF00FFL -> 8,
      0x0F0F0F0F0F0F0F0FL -> 4,
      0x3333333333333333L -> 2,
      0x5555555555555555L -> 1)
    m.foldLeft(v) { case (x, (mask, s)) =>
      (x.bitwiseOR(shiftleft(x, s))).bitwiseAND(lit(mask))
    }
  }

  /** The 2-D Morton code of bucket indices `a`, `b` ∈ [0, 2^bits). */
  def zvalue2(a: Column, b: Column, bits: Int = 20): Column = {
    require(bits >= 1 && bits <= MaxBits, s"bits out of range: $bits")
    val mask = lit((1L << bits) - 1)
    spread(a.cast("long").bitwiseAND(mask))
      .bitwiseOR(shiftleft(spread(b.cast("long").bitwiseAND(mask)), 1))
  }
}
