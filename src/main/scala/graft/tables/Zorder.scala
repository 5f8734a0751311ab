package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-dimensional file skipping, the
  * `OPTIMIZE ZORDER BY` analog for the snapshot tables.
  *
  * `clusterBy` on one column makes per-file min/max stats selective on
  * THAT column only; every other column's ranges span the whole domain in
  * every file. Interleaving the bits of several columns' rank codes and
  * range-clustering on the interleaved value gives every participating
  * column locality ∝ 2^(-bits/d) per file, so a [[SnapshotTable.readPruned]]
  * range probe on ANY of them skips most files — the property linear
  * sort order cannot provide for more than one column.
  *
  * Mechanics: each column is scaled to a 16-bit rank code from its
  * global [min,max] (one tiny agg job — two doubles per column to the
  * driver, never data), codes are bit-interleaved into the Morton value
  * with codegen'd shift/or expressions, and the write range-partitions +
  * sorts on that value. Everything else (stats manifest, pruned reads,
  * snapshot commit protocol) is unchanged composition.
  */
object Zorder {

  private val Bits = 16

  /** 16-bit rank code of `c` scaled from [lo, hi] (doubles). */
  private def code(c: Column, lo: Double, hi: Double): Column = {
    val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
    least(lit((1 << Bits) - 1), greatest(lit(0),
      floor((c.cast("double") - lit(lo)) / lit(span) * lit(1 << Bits)).cast("long")))
  }

  /** Interleave the bits of up to 4 16-bit codes: bit b of code i lands
    * at position b*d + i (LSB-first round-robin). Pure shift/or column
    * algebra — whole-stage codegen keeps this a narrow projection. */
  private def interleave(codes: Seq[Column]): Column = {
    val d = codes.size
    (0 until Bits).flatMap { b =>
      codes.zipWithIndex.map { case (c, i) =>
        shiftleft(c.bitwiseAND(lit(1L << b)), b * (d - 1) + i)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** The Morton value of `cols`, scaled by the data's own min/max (one
    * aggregate job; model parameters to the driver, not data). */
  def zvalue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty && cols.size <= 4, "zorder supports 1-4 columns")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    interleave(cols.zipWithIndex.map { case (c, i) =>
      code(col(c), row.getDouble(2 * i), row.getDouble(2 * i + 1))
    })
  }

  /** [[SnapshotTable.writeWithStats]] with Z-order clustering on
    * `zorderBy`: stats cover the z-ordered columns (plus any extras), so
    * range probes on each of them prune files. Returns the version. */
  def writeZordered(table: SnapshotTable, spark: org.apache.spark.sql.SparkSession,
      df: DataFrame, zorderBy: Seq[String], extraStats: Seq[String] = Nil,
      clusterPartitions: Int = 0): Int = {
    val z = df.withColumn("__z", zvalue(df, zorderBy))
    val v = table.writeWithStats(spark,
      (if (clusterPartitions > 0) z.repartitionByRange(clusterPartitions, col("__z"))
       else z.repartitionByRange(col("__z")))
        .sortWithinPartitions(col("__z"))
        .drop("__z"),
      (zorderBy ++ extraStats).distinct)
    v
  }
}
