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
  def project(df: DataFrame, idCol: String, vecCol: String, dOut: Int): DataFrame = {
    val vec = transform(col(vecCol), _.cast("double"))
    val scale = math.sqrt(dOut.toDouble)
    val y = transform(sequence(lit(0), lit(dOut - 1)), jo =>
      aggregate(
        zip_with(vec, sequence(lit(0), size(col(vecCol)) - 1),
          (x, ji) => round(x, 6).cast(DecimalType(20, 6)) *
            radSign(ji, jo, dOut).cast(DecimalType(2, 0))),
        lit(BigDecimal(0)).cast(DecimalType(38, 6)),
        (acc, el) => acc + el
      ).cast("double") / lit(scale))
    df.select(col(idCol), y.as("y"))
  }
}
