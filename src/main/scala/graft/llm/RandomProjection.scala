package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Johnson–Lindenstrauss random projection — the dimensionality-reduction
  * leg of the embedding pipeline: project d-dim vectors onto dOut ≪ d
  * pseudo-random ±1 (Rademacher) directions, scaled by 1/√dOut, so
  * pairwise angles are approximately preserved (Achlioptas 2003 shows ±1
  * entries suffice for the JL guarantee). Downstream ANN / near-dup /
  * clustering then runs on vectors 4× smaller — at 100 TB the projection
  * pays for itself in shuffle bytes alone.
  *
  * The projection matrix is never materialized: entry (jIn, jOut) is a
  * closed-form LCG sign (portable integer arithmetic, the q244 rule — no
  * engine-private hash), so any SQL engine reproduces the projection
  * bit-for-bit and workers need no broadcast state.
  *
  * Scale shape: the whole operator is a row-local nested HOF (zero
  * shuffles, zero joins); components are 6-dp-quantized to DECIMAL before
  * the fold (the [[Similarity.labelCentroids]] rule) so the sum is
  * order-independent and oracle-replayable by a relational GROUP BY.
  */
object RandomProjection {

  /** Portable 32-bit integer mixer (xorshift-multiply finalizer, three
    * rounds). A plain LCG's PARITY mod 2^31 is LINEAR in its inputs — a
    * sign matrix built from it factorizes as a_ji·b_jo and every projected
    * vector collapses onto one line (cos = ±1 for all pairs; found the
    * hard way). The xor-shift rounds break that linearity; every op
    * (xor, >>, *, % 2^32) replays identically in any SQL engine. */
  private def mix(k: Column): Column = {
    val m32 = lit(4294967296L)
    def round(h: Column): Column = {
      val p = pmod(h * lit(73244475L), m32)
      p.bitwiseXOR(shiftright(p, 16))
    }
    round(round(k.bitwiseXOR(shiftright(k, 16))))
  }

  /** Rademacher sign for matrix entry (jIn, jOut) ∈ {+1, −1}. `dOut`
    * flattens the pair into the mixer key. */
  def radSign(jIn: Column, jOut: Column, dOut: Int): Column =
    when(pmod(mix(jIn * lit(dOut.toLong) + jOut + lit(1L)), lit(2L)) === 0,
      lit(1)).otherwise(lit(-1))

  /** Project `vecCol` (array of numerics) to `dOut` dims:
    * y[jo] = Σ_ji round(x[ji], 6) · sign(ji, jo) / √dOut.
    * Returns (`idCol`, y: array<double>). */
  /** [[mix]]/[[radSign]] on primitive longs — operation-for-operation the
    * Column form (wraparound long multiply, floorMod 2³², arithmetic
    * shifts), so kernel signs equal expression signs exactly. */
  private def radSignLocal(jIn: Long, jOut: Long, dOut: Int): Int = {
    val m32 = 4294967296L
    def round(h: Long): Long = {
      val p = java.lang.Math.floorMod(h * 73244475L, m32)
      p ^ (p >> 16)
    }
    val k = jIn * dOut + jOut + 1L
    if (java.lang.Math.floorMod(round(round(k ^ (k >> 16))), 2L) == 0L) 1 else -1
  }

  def project(df: DataFrame, idCol: String, vecCol: String, dOut: Int): DataFrame = {
    // r14 opt (guide §1.2 "per-task work"): the projection used to run as
    // dOut interpreted aggregate() HOFs per row, each folding the vector
    // through DECIMAL(38,6) accumulation — ~dIn·dOut BigDecimal
    // allocations per row through lambda dispatch (the dominant cost of
    // q255). The kernel computes the identical values on long numerators:
    // round(x, 6) is FixedPointMath.quantize (exact HALF_UP), the ±1 sums
    // are exact integer adds (order-free), and the DECIMAL(38,6)→double
    // cast is the correctly-rounded toDouble — bit-identical output,
    // still row-local (no shuffle, no broadcast state).
    val spark = df.sparkSession
    val in = df.select(col(idCol),
      transform(col(vecCol), _.cast("double")).as("__v"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      in.schema(idCol),
      org.apache.spark.sql.types.StructField("y",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = true))))
    val scale = math.sqrt(dOut.toDouble)
    val rdd = in.rdd.mapPartitions { it =>
      // sign matrix cache, grown to the longest vector seen in the task
      var signs: Array[Array[Int]] = Array.empty // [ji][jo]
      it.map { row =>
        // a NULL vector column yields an array of dOut nulls (the
        // expression form's aggregate-over-null per output slot)
        if (row.isNullAt(1))
          org.apache.spark.sql.Row(row.get(0),
            Seq.fill[Any](dOut)(null))
        else {
          val xs = row.getSeq[Any](1)
          val dIn = xs.length
          if (dIn > signs.length)
            signs = Array.tabulate(dIn, dOut)((ji, jo) =>
              radSignLocal(ji.toLong, jo.toLong, dOut))
          // a null element nulls every output (each y[jo] folds all ji) —
          // the aggregate() form's null propagation
          val anyNull = xs.exists(_ == null)
          val y = new Array[Any](dOut)
          if (!anyNull) {
            val q = new Array[Long](dIn)
            var ji = 0
            xs.foreach { x =>
              q(ji) = graft.functions.FixedPointMath.quantize(
                x.asInstanceOf[Double], 6)
              ji += 1
            }
            var jo = 0
            while (jo < dOut) {
              var s = 0L
              ji = 0
              while (ji < dIn) {
                if (signs(ji)(jo) > 0) s += q(ji) else s -= q(ji)
                ji += 1
              }
              y(jo) = graft.functions.FixedPointMath.toDouble(s, 6) / scale
              jo += 1
            }
          }
          org.apache.spark.sql.Row(row.get(0), y.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
