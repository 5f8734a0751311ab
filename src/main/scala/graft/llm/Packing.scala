package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Sequence packing: assign documents to fixed-token-budget training
  * examples (greedy first-fit in id order), the step between chunking and
  * batch assembly in an LLM data pipeline — packing short documents
  * together is what keeps padding waste low at training time.
  *
  * Scale design: packing is inherently sequential *within* a packing unit,
  * so the unit is a (groupCols, shard) slice — `shards` hash-shards bound
  * each unit's size, and units pack independently in parallel (the same
  * shard-local compromise production packers make; a global greedy order
  * would serialize the whole corpus through one worker). Determinism:
  * shard = hash(id) % shards and docs pack in ascending id order, so the
  * layout is a pure function of the input set — reruns and retries agree.
  *
  * A document longer than the budget becomes its own (overflowing) pack —
  * chunk oversized docs first (see [[TextChunker]]).
  */
object Packing {

  /** Pack each (groupCols, shard) slice greedily in ascending-id order.
    * Output columns: groupCols ++ (shard, pack_id, idCol, n_tokens);
    * pack_id is unique within its (group, shard) slice. `shardExpr`
    * overrides the default hash shard with a caller-supplied assignment
    * (any deterministic int expression over the row). */
  def packSequences(
      df: DataFrame, idCol: String, tokenCountCol: String,
      groupCols: Seq[String], budget: Int, shards: Int = 64,
      shardExpr: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val groupSchema = StructType(groupCols.map(c => df.schema(c)))
    val outSchema = StructType(groupSchema.fields ++ Seq(
      StructField("shard", IntegerType, nullable = false),
      StructField("pack_id", LongType, nullable = false),
      StructField(idCol, LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false)))

    val prepared = df.select(
      struct(groupCols.map(col): _*).as("__g"),
      shardExpr.getOrElse(pmod(xxhash64(col(idCol)), lit(shards.toLong)))
        .cast("int").as("__shard"),
      col(idCol).cast("long").as("__id"),
      col(tokenCountCol).cast("long").as("__t"))

    prepared
      .groupByKey { r =>
        // group key: shard + the group struct rendered to a stable string
        // (the typed group values travel in the rows themselves)
        r.getInt(1) + "\u0001" + r.getStruct(0).mkString("\u0001")
      }(Encoders.STRING)
      .flatMapGroups { (_, rows) =>
        // a slice is bounded by the shard fan-out — sort in memory for the
        // deterministic greedy order
        val buf = rows.toArray
        val g = buf.head.getStruct(0)
        val shard = buf.head.getInt(1)
        val docs = buf.map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
        var packId = -1L
        var acc = Long.MaxValue // forces a new pack on the first doc
        docs.iterator.map { case (id, t) =>
          if (acc > budget - t) { packId += 1; acc = 0L }
          acc += t
          // Seq[Any]: a plain Seq(Int, Long, …) unifies to Seq[Long] and
          // silently widens shard, breaking the Row↔schema type contract
          Row.fromSeq(g.toSeq ++ Seq[Any](shard, packId, id, t))
        }
      }(Encoders.row(outSchema))
      .toDF()
  }

  /** Globally-sorted packing: best-fit-decreasing over deterministic
    * rank-blocks of the global descending token-count order — the
    * low-waste variant of [[packSequences]].
    *
    * Hash-sharded greedy packing sees documents in random size order, so a
    * pack closes whenever the next random doc doesn't fit (next-fit waste).
    * Sorting the WHOLE corpus by descending size first (the classic
    * first-fit-decreasing setup) lets small documents backfill the gaps big
    * ones leave. Scale shape: a range-shuffle gives the distributed global
    * (tokens DESC, id) order; exact global row numbers come from
    * per-partition counts + offsets (no single-worker window); rows then
    * regroup into fixed `blockRows`-sized rank blocks, and each block packs
    * independently with best-fit (a TreeMap of open-pack remainders,
    * O(n log n) per block, streamed — state is open packs only, never the
    * rows). The only deviation from a true global FFD is at block
    * boundaries: each block starts fresh, so waste is bounded by one
    * partial pack per block — noise at 100 TB (millions of docs per block
    * with the default size).
    *
    * Determinism: the sort key (tokens DESC, id ASC) is total and the
    * block of a row is a pure function of its exact global rank — NOT of
    * sampled range boundaries — so the layout is a pure function of the
    * input set under any partitioning, and an oracle can replay it.
    * pack_id = block << 20 | block-local id.
    *
    * A document longer than the budget becomes its own overflowing pack,
    * same contract as [[packSequences]].
    */
  def packSequencesGlobal(
      df: DataFrame, idCol: String, tokenCountCol: String,
      budget: Int, numPartitions: Int = 32, blockRows: Int = 4096): DataFrame = {
    require(budget > 0 && numPartitions > 0, "budget and numPartitions must be positive")
    require(blockRows > 0 && blockRows <= (1 << 20), "blockRows must be in (0, 2^20]")
    val outSchema = StructType(Seq(
      StructField("pack_id", LongType, nullable = false),
      StructField(idCol, LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false)))

    val ranked = graft.ops.Relational.globalRowNumbers(
      df.select(col(idCol).cast("long").as("__id"),
          col(tokenCountCol).cast("long").as("__t"))
        .withColumn("__negt", -col("__t")),
      Seq("__negt", "__id"), numPartitions)
      .withColumn("__block", expr(s"CAST((rn - 1) DIV $blockRows AS BIGINT)"))
      .select(col("__block"), col("rn"), col("__id"), col("__t"))

    ranked
      .repartition(numPartitions, col("__block"))
      .sortWithinPartitions(col("__block"), col("rn"))
      .mapPartitions { rows =>
        // streaming best-fit; state (open-pack remainders) resets at each
        // rank-block edge — several blocks may share a task, never split
        var curBlock = Long.MinValue
        var open: java.util.TreeMap[Long, scala.collection.mutable.ArrayDeque[Long]] = null
        var nPacks = 0L
        def park(pack: Long, remaining: Long): Unit = {
          open.putIfAbsent(remaining, new scala.collection.mutable.ArrayDeque[Long]())
          open.get(remaining).append(pack)
        }
        rows.map { r =>
          val block = r.getLong(0); val id = r.getLong(2); val t = r.getLong(3)
          if (block != curBlock) {
            curBlock = block
            open = new java.util.TreeMap[Long, scala.collection.mutable.ArrayDeque[Long]]()
            nPacks = 0L
          }
          // best fit: the open pack with the SMALLEST remainder still >= t
          val fit = open.ceilingEntry(t)
          val packLocal =
            if (fit == null) {
              val p = nPacks; nPacks += 1
              park(p, math.max(0L, budget - t)) // oversized doc: its own full pack
              p
            } else {
              val rem = fit.getKey; val q = fit.getValue
              val p = q.removeHead()
              if (q.isEmpty) open.remove(rem)
              park(p, rem - t)
              p
            }
          Row((block << 20) | packLocal, id, t)
        }
      }(Encoders.row(outSchema))
      .toDF()
  }
}
