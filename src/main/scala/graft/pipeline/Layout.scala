package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning — the write-side
  * organization that makes 100 TB reads cheap. A table sorted on one
  * column prunes on that column only; interleaving the bits of two
  * bucketed dimensions onto a Z-order (Morton) curve and range-splitting
  * on the curve gives every output file a tight min/max envelope in
  * BOTH dimensions, so a predicate on either prunes files (the
  * Delta/Iceberg `OPTIMIZE ZORDER BY` idea, here as plain Spark ops:
  * compute the curve key, `repartitionByRange` + sortWithinPartitions
  * on it at write time, and parquet row-group min/max stats do the
  * rest).
  *
  * Everything is per-row integer arithmetic (codegen'd, engine-exact):
  * no UDF, no shuffle beyond the intended range partitioning.
  */
object Layout {

  /** 16-bit Morton key: interleave the low 8 bits of two bucketed
    * dimensions (x in even positions, y in odd). Unrolled
    * shift-mask-add — identical integer math in any engine.
    */
  def zValue16(x: Column, y: Column): Column =
    (0 until 8).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** Clamp a non-negative value onto the 8-bit bucket grid `v/cell`,
    * saturating at 255 (outliers share the top bucket instead of
    * widening the curve).
    */
  def bucket8(v: Column, cell: Long): Column = {
    val lv = v.cast("long")
    // exact integer floor-division (all values non-negative)
    least(((lv - pmod(lv, lit(cell))) / lit(cell)).cast("long"), lit(255L))
  }

  /** Assign each row to one of `nFiles` equi-width Z-ranges — the file
    * boundaries a writer would feed to `repartitionByRange`. The
    * per-file (min, max) envelope of each dimension is what a reader's
    * predicate prunes against.
    */
  def zFile(z: Column, nFiles: Int): Column = {
    val p = z * lit(nFiles.toLong)
    ((p - pmod(p, lit(65536L))) / lit(65536L)).cast("long")
  }
}
