package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for training-data pipelines: split each document into
  * fixed-size token windows with overlap, preserving provenance
  * (doc id, chunk index, token span). The op every pretraining corpus
  * build runs once per document — shaped accordingly:
  *
  *  - tokenize with `split` (codegen), chunk starts via a per-doc
  *    `sequence` (tiny array) exploded to one row per chunk — a narrow
  *    flatMap, zero shuffles;
  *  - chunk text assembled with `slice` + `concat_ws` (codegen, non-HOF);
  *  - deterministic chunk count: `max(1, ceil((n − overlap) / stride))`
  *    with `stride = chunkSize − overlap`, so chunk i covers tokens
  *    `[i·stride, i·stride + chunkSize)` (the last chunk may be short,
  *    every token lands in ≥ 1 chunk, consecutive chunks share `overlap`
  *    tokens).
  */
object TextChunker {

  def chunk(
      df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")
    val n = size(toks)
    val nChunks = greatest(lit(1),
      ceil((n - lit(overlap)).cast("double") / stride).cast("int"))
    df.select(col(idCol), toks.as("__toks"), n.as("__n"), nChunks.as("__nc"))
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(sequence(lit(0), col("__nc") - 1)).as(Seq("chunk_idx", "__start0")))
      .select(
        col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx") * stride).cast("long").as("token_start"),
        least(col("chunk_idx") * stride + chunkSize, col("__n")).cast("long").as("token_end"),
        concat_ws(" ", slice(col("__toks"), col("chunk_idx") * stride + 1, lit(chunkSize)))
          .as("chunk_text"))
  }
}
