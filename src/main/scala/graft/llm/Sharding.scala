package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle + shard assignment — the "training order"
  * step between curation and the trainer: every document gets a stable
  * pseudo-random position, independent of input file layout, partition
  * count, or execution order, so a re-run (or a resumed run on different
  * hardware) feeds the model the identical sequence.
  *
  * The permutation key is a closed-form LCG over the id — portable
  * arithmetic (`(id·1103515245 + 12345) mod 2³¹`), no engine hash
  * function, so any SQL engine reproduces the order bit-for-bit.
  *
  * Scale shape: shard = permKey mod nShards is a pure map (no global
  * sort, no driver state — the 100 TB path); the within-shard order is a
  * shard-partitioned window, so the only sort ever performed is per
  * shard. A global rank would need a range exchange over the full
  * corpus; sharding first makes each sort 1/nShards of that, in
  * parallel, which is why production layouts write ordered SHARDS rather
  * than one ordered stream.
  */
object Sharding {

  /** Portable LCG permutation key in [0, 2³¹). Seed shifts the whole
    * permutation; ids only collide modulo 2³¹ (tie-broken by id). */
  def permKey(id: Column, seed: Long = 0L): Column =
    pmod(id * lit(1103515245L) + lit(12345L + seed), lit(2147483648L))

  /** Per-document `(…, shard_id, pos_in_shard)`: hash-sharded by the
    * permutation key, ordered within each shard by (permKey, id). */
  def assignShards(docs: DataFrame, idCol: String, nShards: Int,
      seed: Long = 0L): DataFrame = {
    val pk = permKey(col(idCol), seed)
    val w = Window.partitionBy(col("shard_id")).orderBy(col("pk"), col(idCol))
    docs.withColumn("pk", pk)
      .withColumn("shard_id", pmod(col("pk"), lit(nShards.toLong)))
      .withColumn("pos_in_shard", row_number().over(w))
  }
}
