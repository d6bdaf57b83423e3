package graft.sink

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-column data clustering.
  *
  * Sorting a file's rows by ts clusters ONE dimension; interleaving the
  * bits of two columns and sorting by the result gives BOTH columns
  * locality, so per-file min/max zone maps ([[graft.recovery.Recovery
  * .fileStats]]) prune selective predicates on either column — the
  * Delta/Iceberg OPTIMIZE ZORDER feature, as a plain sort key. Pure
  * shift/mask/or column arithmetic: codegen'd, no UDF, no per-row loop.
  */
object ZOrder {

  /** Spread the low 21 bits of `x` so bit i lands at position 3i·…
    * (classic Morton magic-number spreading, here 2D: bit i → 2i). */
  private def spread(c: Column): Column = {
    var x = c.bitwiseAND(lit(0x1fffffL))
    x = (x.bitwiseOR(shiftleft(x, 16))).bitwiseAND(lit(0x0000ffff0000ffffL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00ff00ff00ff00ffL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x3333333333333333L))
    x = (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x5555555555555555L))
    x
  }

  /** 42-bit Morton code of two non-negative long columns (each clamped
    * to its low 21 bits — rank/bucket the inputs first if they exceed
    * 2^21). Even bits carry `a`, odd bits carry `b`. */
  def zValue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
}
